"""Execute docs/QUICKSTART.md verbatim: every ```python block (except those
tagged ``skip-test``) runs in order in one namespace, so the documented
library walkthrough can never go stale.  Uses a tiny model; the dataset is
the same synprez subset the rest of the suite uses."""

import re
from pathlib import Path

import pytest

DOC = Path(__file__).parent.parent / "docs" / "QUICKSTART.md"


def python_blocks():
    text = DOC.read_text()
    blocks = re.findall(r"```python([^\n]*)\n(.*?)```", text, flags=re.S)
    runnable = [code for tag, code in blocks if "skip-test" not in tag]
    skipped = [code for tag, code in blocks if "skip-test" in tag]
    return runnable, skipped


def test_quickstart_blocks_execute(tmp_path):
    runnable, skipped = python_blocks()
    assert len(runnable) >= 5, "quickstart lost its executable blocks"
    # the paths block plus the flagship block stay illustrative
    assert any("RAW_DIR =" in b for b in skipped)

    from dxvae_tpu.data.dataset import default_raw_dir

    ns = {"RAW_DIR": default_raw_dir(), "WORK": str(tmp_path)}
    for code in runnable:
        exec(compile(code, str(DOC), "exec"), ns)  # noqa: S102

    # spot-check the walkthrough's artifacts really exist
    assert (tmp_path / "tiny.npz").exists()
    assert (tmp_path / "bank.syx").stat().st_size == 4104
    assert (tmp_path / "tiny.bundle.npz").exists()


def test_skipped_blocks_reference_real_files():
    """The illustrative blocks must still name checkpoints that ship."""
    _, skipped = python_blocks()
    text = "\n".join(skipped)
    root = Path(__file__).parent.parent
    for m in re.findall(r"checkpoints/[\w.]+\.npz", text):
        assert (root / m).exists(), m
