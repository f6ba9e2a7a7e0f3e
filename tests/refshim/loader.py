"""Install the dgl/mido shims and import /root/reference modules VERBATIM."""

from __future__ import annotations

import importlib.util
import sys

REFERENCE_DIR = "/root/reference"


def install(adj_orientation: str = "src_dst") -> None:
    """Register the shims under the names the reference imports."""
    from refshim import shim_dgl, shim_mido

    shim_dgl.set_orientation(adj_orientation)
    sys.modules["dgl"] = shim_dgl
    sys.modules["mido"] = shim_mido


def load_reference(name: str):
    """Import ``/root/reference/<name>.py`` unmodified (fresh module object)."""
    spec = importlib.util.spec_from_file_location(
        f"reference_{name}", f"{REFERENCE_DIR}/{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
