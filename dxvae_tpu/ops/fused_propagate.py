"""Pallas-fused decode propagate step.

The hottest repeated block in the model (33 executions per forward,
SURVEY.md §3.1) is the decode propagate: combiner GRU + self-loop GRU +
projection-cache update.  As separate XLA ops each GRU's six (B, 3H) gate
intermediates round-trip HBM; this kernel keeps everything in VMEM per batch
tile and issues the four matmuls back to back on the MXU:

    gi_c = x  @ Wic      gh_c = h_in @ Whc     -> gates -> h1
    gi_l = xl @ Wil      gh_l = h1   @ Whl     -> gates -> hv
    proj = hv @ Wpack                           (4H cache row)

Weight layouts are pre-transposed (in_features, out_features) and the 27-dim
feature inputs zero-padded to 32 lanes so every contraction is MXU-aligned.

Differentiability: the kernel is wrapped in ``jax.custom_vjp`` whose backward
re-runs the (numerically identical) jnp implementation under ``jax.vjp`` —
i.e. rematerialization: the forward saves only its small inputs, and training
through the fused op costs one extra forward in the backward pass.

Measured verdict (TPU v5e, B=1024, chained-step microbench): XLA's own fusion
of the jnp formulation runs this step in ~31 us f32 / ~30 us bf16, while this
kernel as written runs ~49/~41 us — the grid re-streams the ~10 MB of resident
weights per batch tile, which XLA avoids.  The kernel therefore stays OPT-IN
(``DXVAEConfig.use_pallas``), correctness-tested in both interpreter and
compiled modes; the default path is the XLA-fused jnp implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD_IN = 32  # feature dim 27 padded to one 32-lane tile


def _gru_gates(gi, gh, h, size_h):
    r = jax.nn.sigmoid(gi[:, :size_h] + gh[:, :size_h])
    z = jax.nn.sigmoid(gi[:, size_h : 2 * size_h] + gh[:, size_h : 2 * size_h])
    n = jnp.tanh(gi[:, 2 * size_h :] + r * gh[:, 2 * size_h :])
    return (1.0 - z) * n + z * h


def _kernel(x_ref, xl_ref, hin_ref, wic_ref, bic_ref, whc_ref, bhc_ref,
            wil_ref, bil_ref, whl_ref, bhl_ref, wpk_ref, hv_ref, proj_ref):
    size_h = hin_ref.shape[-1]
    f32 = jnp.float32
    h_in = hin_ref[:]
    gi_c = jnp.dot(x_ref[:], wic_ref[:], preferred_element_type=f32) + bic_ref[:]
    gh_c = jnp.dot(h_in, whc_ref[:], preferred_element_type=f32) + bhc_ref[:]
    h1 = _gru_gates(gi_c, gh_c, h_in.astype(f32), size_h)

    gi_l = jnp.dot(xl_ref[:], wil_ref[:], preferred_element_type=f32) + bil_ref[:]
    gh_l = jnp.dot(h1.astype(hin_ref.dtype), whl_ref[:], preferred_element_type=f32) + bhl_ref[:]
    hv = _gru_gates(gi_l, gh_l, h1, size_h)

    hv = hv.astype(hv_ref.dtype)
    hv_ref[:] = hv
    proj_ref[:] = jnp.dot(hv, wpk_ref[:], preferred_element_type=f32).astype(proj_ref.dtype)


def _pallas_impl(x, xl, h_in, weights, tile_b: int):
    wic, bic, whc, bhc, wil, bil, whl, bhl, wpk = weights
    b, size_h = h_in.shape
    grid = (b // tile_b,)
    dt = h_in.dtype
    # off-TPU (tests on the virtual CPU mesh) the kernel runs in interpreter
    # mode — same semantics, executed by XLA:CPU
    interpret = jax.default_backend() != "tpu"

    def tiled(shape):
        return pl.BlockSpec((tile_b,) + shape[1:], lambda i: (i,) + (0,) * (len(shape) - 1),
                            memory_space=pltpu.VMEM)

    def whole(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM)

    hv, proj = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            tiled(x.shape), tiled(xl.shape), tiled(h_in.shape),
            whole(wic), whole(bic), whole(whc), whole(bhc),
            whole(wil), whole(bil), whole(whl), whole(bhl), whole(wpk),
        ],
        out_specs=(tiled((b, size_h)), tiled((b, 4 * size_h))),
        out_shape=(
            jax.ShapeDtypeStruct((b, size_h), dt),
            jax.ShapeDtypeStruct((b, 4 * size_h), dt),
        ),
        interpret=interpret,
    )(x, xl, h_in, wic, bic, whc, bhc, wil, bil, whl, bhl, wpk)
    return hv, proj


def _jnp_impl(x, xl, h_in, weights):
    """Reference implementation (identical math) used for the backward pass."""
    wic, bic, whc, bhc, wil, bil, whl, bhl, wpk = weights
    size_h = h_in.shape[-1]
    f32 = jnp.float32
    gi_c = jnp.dot(x, wic, preferred_element_type=f32) + bic
    gh_c = jnp.dot(h_in, whc, preferred_element_type=f32) + bhc
    h1 = _gru_gates(gi_c, gh_c, h_in.astype(f32), size_h)
    gi_l = jnp.dot(xl, wil, preferred_element_type=f32) + bil
    gh_l = jnp.dot(h1.astype(h_in.dtype), whl, preferred_element_type=f32) + bhl
    hv = _gru_gates(gi_l, gh_l, h1, size_h).astype(h_in.dtype)
    proj = jnp.dot(hv, wpk, preferred_element_type=f32).astype(h_in.dtype)
    return hv, proj


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_propagate(x, xl, h_in, weights, tile_b):
    return _pallas_impl(x, xl, h_in, weights, tile_b)


def _fwd(x, xl, h_in, weights, tile_b):
    return _pallas_impl(x, xl, h_in, weights, tile_b), (x, xl, h_in, weights)


def _bwd(tile_b, res, g):
    x, xl, h_in, weights = res
    _, vjp = jax.vjp(lambda x, xl, h, w: _jnp_impl(x, xl, h, w), x, xl, h_in, weights)
    return vjp(g)


fused_propagate.defvjp(_fwd, _bwd)


def pack_propagate_weights(params, cdt=None):
    """Transpose + pad the decode GRU/aggregator weights into the kernel's
    (in, out) layouts: returns the 9-tuple consumed by fused_propagate."""
    from dxvae_tpu.ops.propagate import pack_gate_mapper

    c, l = params["dec_combiner"], params["dec_looper"]
    size_x = c["w_ih"].shape[1]

    def pad_in(w):  # (3H, in) -> (PAD_IN, 3H)
        wt = w.T
        return jnp.pad(wt, ((0, _PAD_IN - size_x), (0, 0)))

    wpk = pack_gate_mapper(params["gate"]["w"], params["mapper"]["w"]).T  # (H, 4H)
    out = (
        pad_in(c["w_ih"]), c["b_ih"][None, :], c["w_hh"].T, c["b_hh"][None, :],
        pad_in(l["w_ih"]), l["b_ih"][None, :], l["w_hh"].T, l["b_hh"][None, :],
        wpk,
    )
    if cdt is not None:
        out = tuple(a.astype(cdt) for a in out)
    return out


def propagate_step(x, h_in, self_loop, weights, tile_b: int = 128):
    """Fused decode propagate: pads inputs to the kernel's alignment and
    returns (hv (B,H), proj (B,4,H)).  ``x (B,27)`` raw node features,
    ``self_loop (B,)`` gates the looper GRU's input."""
    b, size_x = x.shape
    dt = h_in.dtype
    x = x.astype(dt)
    xp = jnp.pad(x, ((0, 0), (0, _PAD_IN - size_x)))
    xl = xp * self_loop.astype(dt)[:, None]
    pad_b = (-b) % tile_b
    if pad_b:
        xp = jnp.pad(xp, ((0, pad_b), (0, 0)))
        xl = jnp.pad(xl, ((0, pad_b), (0, 0)))
        h_in = jnp.pad(h_in, ((0, pad_b), (0, 0)))
    hv, proj = fused_propagate(xp, xl, h_in, weights, tile_b)
    if pad_b:
        hv, proj = hv[:b], proj[:b]
    return hv, proj.reshape(b, 4, -1)


# --------------------------------------------------------------------------- #
# weight-resident edge-cadence kernel
# --------------------------------------------------------------------------- #
# One kernel per decoded node covering its WHOLE edge cadence (model.py:
# 242-251): for each already-decoded vj, edge logits from (Hi, cached eh_vj),
# threshold decisions, gated-sum slot contribution, and the 2-GRU propagate —
# iterated vi times with the GRU + edge-head weights resident in VMEM.  This
# is the "middle point" VERDICT r1 #4 asked for: the per-step kernel above
# loses to XLA because it re-streams ~10 MB of weights per step; amortizing
# them over a node's 1..6 sequential steps removes that re-streaming while
# keeping VMEM within budget (weights ~5.8 MB + per-tile eh/proj data).

def _cadence_kernel(xi_ref, xl_ref, hv0_ref, ehs_ref, projs_ref,
                    wic_ref, bic_ref, whc_ref, bhc_ref,
                    wil_ref, bil_ref, whl_ref, bhl_ref,
                    w1a_ref, b1_ref, w2_ref, b2_ref, gate_b_ref,
                    hv_ref, logits_ref):
    size_h = hv0_ref.shape[-1]
    f32 = jnp.float32
    n_edges = ehs_ref.shape[0]
    cdt = hv0_ref.dtype

    # x-side GRU products are loop-invariant: computed once per tile
    gi_c = jnp.dot(xi_ref[:], wic_ref[:], preferred_element_type=f32) + bic_ref[:]
    gi_l = jnp.dot(xl_ref[:], wil_ref[:], preferred_element_type=f32) + bil_ref[:]
    h = hv0_ref[:].astype(f32)
    h_acc = jnp.zeros((h.shape[0], size_h), f32)
    gate_b = gate_b_ref[:].astype(f32)

    for k in range(n_edges):  # static unroll: n_edges = vi <= 6
        # edge logits vs vj = order[k]: cat(Hi, Hj) @ W1 split as
        # Hi @ W1a + (cached Hj @ W1b)
        l0 = (
            jnp.dot(h.astype(cdt), w1a_ref[:], preferred_element_type=f32)
            + ehs_ref[k].astype(f32)
            + b1_ref[:]
        )
        e = jnp.dot(jnp.maximum(l0, 0.0).astype(cdt), w2_ref[:],
                    preferred_element_type=f32) + b2_ref[:]  # (TB, 128); cols 0,1 = in/out
        logits_ref[k] = e.astype(logits_ref.dtype)
        e_in = (e[:, 0:1] > 0.0).astype(f32)   # sigmoid(x) > 0.5 <=> x > 0
        e_out = (e[:, 1:2] > 0.0).astype(f32)

        # gated-sum slot contribution of vj (bias-free mapper: zero masks
        # contribute exactly zero)
        pj = projs_ref[k].astype(f32)  # (TB, 4H): [gate_f, gate_b, map_f, map_b]
        g = jax.nn.sigmoid(
            e_in * pj[:, :size_h] + e_out * pj[:, size_h : 2 * size_h] + gate_b
        )
        m = e_in * pj[:, 2 * size_h : 3 * size_h] + e_out * pj[:, 3 * size_h :]
        h_acc = h_acc + g * m

        # 2-GRU propagate with H_in = h_acc (combiner's previous state)
        gh_c = jnp.dot(h_acc.astype(cdt), whc_ref[:], preferred_element_type=f32) + bhc_ref[:]
        h1 = _gru_gates(gi_c, gh_c, h_acc, size_h)
        gh_l = jnp.dot(h1.astype(cdt), whl_ref[:], preferred_element_type=f32) + bhl_ref[:]
        h = _gru_gates(gi_l, gh_l, h1, size_h)

    hv_ref[:] = h.astype(hv_ref.dtype)


def pack_cadence_weights(params, cdt=None):
    """Kernel-layout weights for :func:`edge_cadence`: GRU weights transposed
    to (in, out) with the 27-dim feature inputs padded to 32 lanes, the edge
    head split into its Hi half (H, 4H) + output layer (4H, 2) padded to 128
    output lanes, and the gated-sum parameters."""
    c, l = params["dec_combiner"], params["dec_looper"]
    size_x = c["w_ih"].shape[1]
    size_h = c["w_hh"].shape[1]

    def pad_in(w):
        return jnp.pad(w.T, ((0, _PAD_IN - size_x), (0, 0)))

    w1 = params["h_to_edge"][0]["w"]  # (4H, 2H)
    w1a_t = w1[:, :size_h].T          # (H, 4H)
    b1 = params["h_to_edge"][0]["b"][None, :]
    w2 = params["h_to_edge"][1]["w"]  # (2, 4H)
    w2_t = jnp.pad(w2.T, ((0, 0), (0, 128 - w2.shape[0])))  # (4H, 128)
    b2 = jnp.pad(params["h_to_edge"][1]["b"], (0, 128 - w2.shape[0]))[None, :]
    out = (
        pad_in(c["w_ih"]), c["b_ih"][None, :], c["w_hh"].T, c["b_hh"][None, :],
        pad_in(l["w_ih"]), l["b_ih"][None, :], l["w_hh"].T, l["b_hh"][None, :],
        w1a_t, b1, w2_t, b2, params["gate"]["b"][None, :],
    )
    if cdt is not None:
        out = tuple(a.astype(cdt) for a in out)
    return out


def edge_cadence(xi, self_loop, hv0, ehs, projs, weights, tile_b: int = 128):
    """Run one node's full edge cadence in a single weight-resident kernel.

    ``xi (B, size_x)`` node features; ``self_loop (B,)``; ``hv0 (B, H)`` the
    hidden state after the SELF refresh; ``ehs (n_edges, B, 4H)`` cached
    Hj @ W1b halves in vj order; ``projs (n_edges, B, 4H)`` cached projection
    rows (flattened).  Returns ``(hv (B, H), e_logits (n_edges, B, 2))``.
    """
    b, size_x = xi.shape
    n_edges = ehs.shape[0]
    dt = hv0.dtype
    xi = xi.astype(dt)
    xp = jnp.pad(xi, ((0, 0), (0, _PAD_IN - size_x)))
    xl = xp * self_loop.astype(dt)[:, None]
    pad_b = (-b) % tile_b
    if pad_b:
        pad2 = lambda a: jnp.pad(a, ((0, pad_b), (0, 0)))
        pad3 = lambda a: jnp.pad(a, ((0, 0), (0, pad_b), (0, 0)))
        xp, xl, hv0 = pad2(xp), pad2(xl), pad2(hv0)
        ehs, projs = pad3(ehs), pad3(projs)
    bp = b + pad_b
    size_h = hv0.shape[-1]
    grid = (bp // tile_b,)
    interpret = jax.default_backend() != "tpu"

    def tiled2(shape):
        return pl.BlockSpec((tile_b, shape[-1]), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def tiled3(shape):
        return pl.BlockSpec((shape[0], tile_b, shape[-1]), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    def whole(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    hv, logits = pl.pallas_call(
        _cadence_kernel,
        grid=grid,
        in_specs=[
            tiled2(xp.shape), tiled2(xl.shape), tiled2(hv0.shape),
            tiled3(ehs.shape), tiled3(projs.shape),
        ] + [whole(w) for w in weights],
        out_specs=(tiled2((bp, size_h)), tiled3((n_edges, bp, 128))),
        out_shape=(
            jax.ShapeDtypeStruct((bp, size_h), dt),
            jax.ShapeDtypeStruct((n_edges, bp, 128), dt),
        ),
        interpret=interpret,
    )(xp, xl, hv0, ehs, projs, *weights)
    return hv[:b], logits[:, :b, :2]
