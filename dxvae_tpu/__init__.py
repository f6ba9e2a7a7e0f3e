"""dxvae_tpu — a TPU-native (JAX/XLA/Pallas) framework with the capabilities of
HotzingTone/DX-VAE.

The reference treats a Yamaha DX7 FM-synth patch as a small directed *cyclic*
graph (6 FM operators + 1 global/output root node, feedback self-loops allowed)
and learns a D-VAE-style variational autoencoder over those graphs
(reference README.md:3-13).

This framework re-designs that model TPU-first:

* graphs are dense, fixed-shape, masked tensors — ``X:(B,7,27) f32``,
  ``params:(B,7,21) i32``, ``adj:(B,7,7)`` — because the graph size is a
  compile-time constant (7 nodes), so no graph library is needed at all;
* the asynchronous message-passing recurrence becomes batched masked matmuls
  under ``jit`` (MXU-shaped), with the gated-sum aggregation restructured so
  per-node projections are cached (masks commute with the linear maps);
* training is a single jitted update step, data-parallel over a
  ``jax.sharding.Mesh`` with XLA collectives over ICI;
* the SysEx codec is pure NumPy (replaces mido + DGL), vectorized over whole
  banks.

Public API parity with the reference (model.py:11,200-391; dxdata.py:77,341;
main.py:12-47) is provided by :mod:`dxvae_tpu.api`.
"""

__version__ = "0.3.1"

from dxvae_tpu.graph import GraphBatch

__all__ = ["DXVAE", "DXDataset", "graph_to_syx", "GraphBatch",
           "ServedDXVAE", "export_bundle", "__version__"]


def __getattr__(name):
    # Lazy: importing dxvae_tpu must not pull in jax for data-only users.
    if name in ("DXVAE", "graph_to_syx"):
        from dxvae_tpu import api

        return getattr(api, name)
    if name == "DXDataset":
        from dxvae_tpu.data.dataset import DXDataset

        return DXDataset
    if name in ("ServedDXVAE", "export_bundle"):
        from dxvae_tpu import serving

        return getattr(serving, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
