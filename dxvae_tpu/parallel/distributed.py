"""Multi-process (multi-host) execution support.

The reference is strictly single-process, single-GPU (model.py:374-391
trains on whatever device the module was moved to).  TPU pods are
multi-HOST by construction — one process per host, each seeing only its
local chips — so a production framework needs the jax.distributed path:
after :func:`init_distributed`, ``jax.devices()`` is the GLOBAL device
list, :func:`dxvae_tpu.parallel.mesh.make_mesh` builds a global mesh over
ICI, and ``DXVAE.train`` runs unchanged SPMD — every process executes the
same program, XLA's collectives (gradient all-reduce) ride the fabric,
and host-side effects (stdout, CSV metrics, checkpoints) are emitted by
the primary process only.

Data feeding at this model's scale is deliberately simple: every process
holds the (small) full dataset and calls ``jax.device_put(batch,
global_sharding)``, which jax accepts in multi-process mode when every
process provides the identical host value — the put only transfers each
process's addressable shards.  A per-host sharded loader would add
complexity with no measurable win below ~10^7 patches.

Validated on this image by tests/test_distributed.py: 2 processes x 4
virtual CPU devices train the real model with gloo collectives and match
the single-process 8-device run.
"""

from __future__ import annotations

import jax

__all__ = ["init_distributed", "is_primary", "process_count"]


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> None:
    """Join (or form) a multi-process jax runtime.  Call BEFORE any other
    jax API touches the backend.

    On a real TPU pod slice every argument is auto-detected from the TPU
    metadata — call with no arguments on each host.  Off-pod (tests, CPU
    clusters) pass the coordinator's ``host:port``, the world size, and
    this process's rank.  Idempotent: a second call is a no-op, so library
    and CLI init can coexist (jax itself raises "should only be called
    once" on re-entry — we guard with is_initialized() instead of parsing
    that message).
    """
    if jax.distributed.is_initialized():
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """True on the process that owns host-side effects (rank 0).

    Checkpoints, metrics CSVs, and stdout logs are written by the primary
    only: on shared filesystems concurrent writers corrupt each other, and
    on pods the non-primary copies are redundant.
    """
    return jax.process_index() == 0
