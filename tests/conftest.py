"""Test configuration.

All tests run on a virtual 8-device CPU platform so the multi-chip sharding
paths (data-parallel mesh, collectives) are exercised without TPU hardware
(standard JAX practice; the driver separately dry-run-compiles the multi-chip
path via __graft_entry__.dryrun_multichip).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest

REFERENCE_DATA = "/root/reference/DX_data"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


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
