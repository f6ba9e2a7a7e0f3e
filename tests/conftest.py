"""Test configuration.

All tests run on a virtual 8-device CPU platform so the multi-chip sharding
paths (data-parallel mesh, collectives) are exercised without TPU hardware
(standard JAX practice; the driver separately dry-run-compiles the multi-chip
path via __graft_entry__.dryrun_multichip).
"""

import os

# This image pins JAX_PLATFORMS=axon (a tunneled TPU) in the environment and
# registers the backend from sitecustomize, so env vars alone cannot redirect
# tests to CPU — override programmatically before any backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import sys

import numpy as np
import pytest

# repo root on sys.path regardless of how pytest was invoked: tests load
# measured-workflow scripts through the one shared loader (scripts._lib)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DATA = "/root/reference/DX_data"


def run_parity_subprocess(code: str):
    """Run a parity snippet in a fresh CPU-forced interpreter and assert it
    prints OK (shared by the f64 oracle test and the verbatim-reference
    tests — one place owns the subprocess environment contract)."""
    import os
    import subprocess
    import sys

    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"}
    env.update({k: v for k, v in os.environ.items() if k not in env})
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd="/root/repo", env=env,
    )
    assert r.returncode == 0 and "OK" in r.stdout, (r.stdout[-2000:], r.stderr[-4000:])
    return r.stdout


@pytest.fixture(scope="session")
def bank_files():
    from pathlib import Path

    files = sorted(Path(REFERENCE_DATA).rglob("*.syx"))
    if not files:
        pytest.skip("reference DX_data banks not available")
    return files


@pytest.fixture(scope="session")
def dataset(tmp_path_factory):
    from dxvae_tpu.data.dataset import DXDataset

    save = tmp_path_factory.mktemp("cache")
    return DXDataset(REFERENCE_DATA, save_dir=save)
