"""Gated-sum message aggregation, restructured for the MXU.

The reference aggregates neighbor messages per propagate call as

    H_in = sum_x  gate(cat(F_x, B_x)) * mapper(cat(F_x, B_x))        (model.py:180-181)

where for each window node ``x``, ``F_x = mf[x] * h_x`` (predecessor mask) and
``B_x = mb[x] * h_x`` (successor mask), ``gate = sigmoid(Linear(2H -> H))`` and
``mapper = Linear(2H -> H, bias=False)`` — the bias is disabled precisely so
that fully-masked slots contribute zero (model.py:72).

Naively that is two ``(B*7, 2H) @ (2H, H)`` matmuls per propagate call — and
the forward pass makes 41 propagate calls (SURVEY.md §3.1).  Key algebraic
restructure: the masks are *scalars per (batch, node)*, so they commute with
the linear maps:

    Wg_f @ (mf * h) = mf * (Wg_f @ h)

Therefore we cache four projections of each node's hidden state — computed
once per hidden-state *write* as a single ``(B, H) @ (H, 4H)`` matmul — and
every aggregation becomes pure VPU work (mask-scale, sigmoid, multiply, sum
over the 7 node slots).  Hidden states are written 41 times per forward but
aggregations happen 40 times over full 7-slot windows; this cuts the matmul
FLOPs of message passing by ~7x and leaves clean MXU shapes.

Numerically identical to the reference formulation (zero slots: the gate is
sigmoid(bias) but the mapper output is exactly zero, so the product vanishes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dxvae_tpu.ops.matmul import matmul_wT


class PropState(NamedTuple):
    """Message-passing state carried through encode/decode.

    ``hidden``: (B, 7, H)   per-node hidden states
    ``proj``:   (B, 7, 4, H) cached projections of each hidden state through
                [gate_forth, gate_back, mapper_forth, mapper_back].
    """

    hidden: jnp.ndarray
    proj: jnp.ndarray

    @staticmethod
    def zeros(batch: int, n_nodes: int, size_h: int, dtype=jnp.float32) -> "PropState":
        return PropState(
            hidden=jnp.zeros((batch, n_nodes, size_h), dtype),
            proj=jnp.zeros((batch, n_nodes, 4, size_h), dtype),
        )

    def write(self, v: int, h: jnp.ndarray, w_pack: jnp.ndarray) -> "PropState":
        """Set node ``v``'s hidden state and refresh its cached projections.

        ``w_pack`` is the (4H, H) stacked projection matrix from
        :func:`pack_gate_mapper`; the refresh is one (B, H) @ (H, 4H) matmul.
        """
        # bf16 weights + f32 hidden = the bfloat16_mixed mode: bf16 matmul
        # with f32 accumulation/output (ops.matmul holds the one shared rule)
        p = matmul_wT(h, w_pack).reshape(h.shape[0], 4, -1)
        return PropState(
            hidden=self.hidden.at[:, v, :].set(h),
            proj=self.proj.at[:, v, :, :].set(p),
        )


def pack_gate_mapper(gate_w: jnp.ndarray, mapper_w: jnp.ndarray) -> jnp.ndarray:
    """Stack the four (H, H) blocks of gate (H, 2H) and mapper (H, 2H) into a
    single (4H, H) projection matrix: [gate_f; gate_b; mapper_f; mapper_b]."""
    size_h = gate_w.shape[0]
    return jnp.concatenate(
        [gate_w[:, :size_h], gate_w[:, size_h:], mapper_w[:, :size_h], mapper_w[:, size_h:]],
        axis=0,
    )


def slot_contribution(
    proj_x: jnp.ndarray, e_forth: jnp.ndarray, e_back: jnp.ndarray, gate_b: jnp.ndarray
) -> jnp.ndarray:
    """Gated-sum contribution of a single window slot x.

    ``proj_x (..., 4, H)``: slot x's cached projections; ``e_forth``/``e_back``
    ``(...)``: the x->target / target->x edge indicators (any leading batch
    dims, e.g. ``(B,)`` per-step or ``(B, S)`` for a whole batched cadence).
    Zero indicators give exactly zero (bias-free mapper), so adding
    contributions unconditionally is safe.

    This enables the decoder's *incremental aggregation*: during node vi's
    refresh cadence, the edge masks change one slot per step (NODE and SELF
    steps see no incident window edges at all, model.py:226-251), so H_in is a
    running sum of slot contributions — O(1) slots touched per propagate
    instead of re-reading all 7 slots' projections.
    """
    mf = e_forth[..., None]
    mb = e_back[..., None]
    g = jax.nn.sigmoid(mf * proj_x[..., 0, :] + mb * proj_x[..., 1, :] + gate_b)
    m = mf * proj_x[..., 2, :] + mb * proj_x[..., 3, :]
    return g * m


def gated_aggregate(
    state: PropState, mask_forth: jnp.ndarray, mask_back: jnp.ndarray, gate_b: jnp.ndarray
) -> jnp.ndarray:
    """Masked gated-sum over all node slots.

    ``mask_forth``/``mask_back``: (B, 7) — 1.0 where node x is a predecessor /
    successor of the target node *within its visibility window*, else 0.0.
    Returns H_in (B, H).
    """
    mf = mask_forth[..., None]
    mb = mask_back[..., None]
    g = jax.nn.sigmoid(mf * state.proj[:, :, 0, :] + mb * state.proj[:, :, 1, :] + gate_b)
    m = mf * state.proj[:, :, 2, :] + mb * state.proj[:, :, 3, :]
    # slots with both masks zero contribute sigmoid(bias) * 0 = 0, matching the
    # reference's zero-padded variable-width windows exactly.
    return (g * m).sum(axis=1)
