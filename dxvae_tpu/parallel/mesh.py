"""Device mesh construction and sharding rules.

Mesh axes:

* ``data``  — data parallelism: the batch dimension of every input tensor is
  sharded here; per-step gradient all-reduce rides ICI (inserted by XLA from
  the sharding propagation of the batch-mean loss).
* ``model`` — optional tensor parallelism for the wide MLP heads
  (H -> 2H -> 2H and 2H -> 4H, model.py:40-63 equivalents): their first-layer
  output features / second-layer input features are sharded so the pair
  computes in a Megatron-style column/row split with a single psum at the end.
  At ~12M params this is never needed for capacity (SURVEY.md §2.5) but is
  provided so the framework exercises real 2D shardings.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh.  Defaults to all devices on the data axis;
    an explicit smaller n_data uses the first n_data * n_model local devices."""
    explicit = devices is not None
    devices = np.asarray(devices if explicit else jax.devices())
    if n_data is None:
        n_data = devices.size // n_model
    need = n_data * n_model
    if need > devices.size or (explicit and need != devices.size):
        raise ValueError(f"{devices.size} devices cannot form a {n_data}x{n_model} mesh")
    return Mesh(devices[:need].reshape(n_data, n_model), axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Inputs (B, ...) are sharded on the batch dimension over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(mesh: Mesh, params) -> dict:
    """Sharding pytree for the parameter pytree.

    With a non-trivial 'model' axis, the wide MLP heads are tensor-parallel:
    layer 0 weight (out, in) sharded on out-features ('model', None), its bias
    on ('model',), layer 1 weight sharded on in-features (None, 'model').
    Everything else (GRU cells, small heads, aggregator) is replicated — at
    H=512 they are far below the size where TP pays for its collectives.
    """
    n_model = mesh.shape["model"]

    def repl(tree):
        return jax.tree.map(lambda _: replicated(mesh), tree)

    shardings = repl(params)
    if n_model == 1:
        return shardings

    def tp_mlp(mlp_params):
        """Column-parallel first layer, row-parallel second layer."""
        sh = [dict(s) for s in repl(mlp_params)]
        sh[0]["w"] = NamedSharding(mesh, P("model", None))
        if "b" in mlp_params[0]:
            sh[0]["b"] = NamedSharding(mesh, P("model"))
        sh[1]["w"] = NamedSharding(mesh, P(None, "model"))
        return sh

    for head in ("h_to_x0", "h_to_x", "h_to_edge", "h_to_edge_self"):
        shardings[head] = tp_mlp(params[head])
    return shardings
