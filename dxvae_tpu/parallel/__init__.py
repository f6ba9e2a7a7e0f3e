"""Parallelism layer: device mesh, sharding rules, data-parallel training.

The reference is strictly single-process single-device (model.py:13,
SURVEY.md §2.5).  Here scaling is first-class: training runs under one ``jit``
over a ``jax.sharding.Mesh`` with the batch sharded on the ``data`` axis and
(optionally) the large MLP-head weights sharded on the ``model`` axis; XLA
inserts the gradient all-reduces / weight all-gathers as collectives over ICI.
"""

from dxvae_tpu.parallel.distributed import init_distributed, is_primary
from dxvae_tpu.parallel.mesh import make_mesh, batch_sharding, param_shardings
from dxvae_tpu.parallel.train import (
    TrainState,
    make_optimizer,
    make_train_step,
    init_train_state,
)

__all__ = [
    "init_distributed",
    "is_primary",
    "make_mesh",
    "batch_sharding",
    "param_shardings",
    "TrainState",
    "make_optimizer",
    "make_train_step",
    "init_train_state",
]
