"""Guard docs/API.md against drift: every name and keyword the reference
documents must exist with the documented signature.  Pure introspection —
no model builds, no JAX tracing beyond imports."""

import inspect

import pytest


def params_of(fn):
    return list(inspect.signature(fn).parameters)


def test_package_root_exports():
    import dxvae_tpu

    for name in ("DXVAE", "DXDataset", "graph_to_syx", "GraphBatch",
                 "ServedDXVAE", "export_bundle", "__version__"):
        assert hasattr(dxvae_tpu, name), name
    assert dxvae_tpu.__all__ == [
        "DXVAE", "DXDataset", "graph_to_syx", "GraphBatch",
        "ServedDXVAE", "export_bundle", "__version__"]


def test_dxvae_documented_signatures():
    from dxvae_tpu.api import DXVAE, Normal

    assert params_of(DXVAE.__init__)[1:] == [
        "n_nodes", "n_params", "size_X", "size_X0", "size_H", "size_Z",
        "checkpoint", "seed", "strict_parity", "unroll", "compute_dtype"]
    assert params_of(DXVAE.decode)[1:] == [
        "z", "project_topology", "alg", "topology", "alg_temperature"]
    assert params_of(DXVAE.generate)[1:] == [
        "n", "project_topology", "alg", "prior", "temperature",
        "valid_only", "max_rounds", "topology", "alg_temperature"]
    assert params_of(DXVAE.train)[1:] == [
        "G_true", "epochs", "size_batch", "lr", "checkpoint", "resume",
        "w_env", "w_frq", "w_kld", "metrics_csv", "metrics_append",
        "extra_epoch", "n_data", "n_model", "shuffle_seed", "save_every",
        "val_split", "val_every"]
    assert params_of(DXVAE.fit_prior)[1:] == [
        "G", "n_components", "samples_per_patch", "n_iters", "reg_covar"]
    # no-arg sample() is a documented reference-parity guarantee
    assert inspect.signature(Normal.sample).parameters["key"].default is None


def test_data_layer_documented_signatures():
    from dxvae_tpu.data.dataset import DXDataset
    from dxvae_tpu.data import sysex

    assert params_of(DXDataset.__init__)[1:] == [
        "raw_dir", "save_dir", "force_reload", "include"]
    assert params_of(sysex.read_syx) == ["path", "verify_checksum"]
    assert params_of(sysex.params_to_syx_file) == [
        "params", "path", "checksum", "names"]
    assert params_of(sysex.params_to_syx_bytes) == [
        "params", "checksum", "names"]

    from dxvae_tpu.data.algorithms import ALGO_ADJ, match_algorithm  # noqa: F401

    assert ALGO_ADJ.shape == (32, 7, 7)


def test_serving_documented_signatures():
    from dxvae_tpu import serving, serving_http

    assert params_of(serving.export_bundle) == [
        "model", "path", "batch_sizes", "functions", "platforms",
        "include_prior"]
    for m in ("load", "encode", "decode", "encode_decode", "generate"):
        assert hasattr(serving.ServedDXVAE, m), m
    assert params_of(serving.ServedDXVAE.generate)[1:] == [
        "n", "seed", "prior", "temperature", "valid_only", "max_rounds"]
    assert params_of(serving_http.make_server) == [
        "bundle_path", "host", "port", "verbose", "index_path",
        "batch_window_ms", "adaptive_window", "call_timeout_s",
        "read_timeout_s", "max_body_mb", "follower_timeout_s",
        "cold_timeout_s", "warmup"]
    assert params_of(serving_http.MicroBatcher.__init__)[1:] == [
        "fn", "slice_out", "call", "window_s", "max_batch", "buckets",
        "adaptive", "call_timeout_s", "follower_timeout_s", "cold_timeout_s",
        "hot_s", "name"]


def test_parallel_and_utils_documented_signatures():
    from dxvae_tpu.parallel.mesh import make_mesh, param_shardings  # noqa: F401
    from dxvae_tpu.parallel.train import make_train_step, make_eval_step  # noqa: F401
    from dxvae_tpu.utils.checkpoint import (  # noqa: F401
        save_checkpoint, load_checkpoint, convert_checkpoint, infer_sizes)
    from dxvae_tpu.utils.metrics import MetricsLogger
    from dxvae_tpu.utils.debug import checked, assert_all_finite  # noqa: F401
    from dxvae_tpu.utils.profiling import (  # noqa: F401
        trace, timeit, enable_persistent_cache)

    assert params_of(make_mesh) == ["n_data", "n_model", "devices"]
    assert params_of(make_train_step) == ["optimizer", "cfg", "weights", "donate"]
    assert params_of(MetricsLogger.__init__)[1:] == [
        "csv_path", "stdout", "append"]

    from dxvae_tpu.utils.doctor import probe_device, run_checks

    assert params_of(run_checks) == ["raw_dir", "probe_timeout", "cpu"]
    assert params_of(probe_device) == ["timeout_s", "cpu"]


def test_cli_subcommands_match_docs():
    from dxvae_tpu.cli import build_parser

    parser = build_parser()
    sub = next(a for a in parser._actions
               if isinstance(a, type(parser._subparsers._group_actions[0])))
    documented = {
        "print-data", "train-new", "train-on", "decode-test", "generate",
        "interpolate", "search", "forward-test", "export-serving", "serve",
        "convert-checkpoint"}
    assert documented <= set(sub.choices), sorted(documented - set(sub.choices))


def test_importing_api_does_not_initialize_backend():
    """Importing the library (and building the CLI parser) must never touch
    the device: `--help`/usage must work with the TPU unreachable.  Regression
    guard for the module-level _KeyStream PRNGKey (api.py:53)."""
    import subprocess
    import sys

    code = (
        "import dxvae_tpu.api\n"
        "from dxvae_tpu.cli import build_parser\n"
        "build_parser().format_help()\n"
        "from jax._src import xla_bridge\n"
        "assert not xla_bridge._backends, list(xla_bridge._backends)\n"
    )
    import pathlib
    repo = str(pathlib.Path(__file__).parent.parent)
    subprocess.run([sys.executable, "-c", code], check=True, timeout=300, cwd=repo)


def test_api_md_exists_and_mentions_every_subcommand():
    from pathlib import Path

    doc = (Path(__file__).parent.parent / "docs" / "API.md").read_text()
    from dxvae_tpu.cli import build_parser

    parser = build_parser()
    sub = next(a for a in parser._actions
               if isinstance(a, type(parser._subparsers._group_actions[0])))
    missing = [c for c in sub.choices if f"`{c}`" not in doc]
    assert not missing, f"docs/API.md missing CLI subcommands: {missing}"
