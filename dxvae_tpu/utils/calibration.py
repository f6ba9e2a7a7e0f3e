"""Same-session hardware calibration + analytic FLOP accounting.

The axon-tunneled TPU shows ±10-30% run-to-run/session-to-session throughput
swings (docs/PERF.md), so a raw patches/sec headline cannot distinguish a code
regression from chip-session variance.  The fix: every benchmark run also
measures what *this* chip, in *this* session, delivers on a bare matmul chain
with the identical chained-fori / two-K-difference methodology, and reports
model throughput normalized by that calibration (``mfu_vs_session``).

Interpretation rule (docs/PERF.md): a throughput drop at constant
``mfu_vs_session`` is the chip/session, not the code; a drop in
``mfu_vs_session`` itself is a real regression.

Shared by ``bench.py`` (headline artifact) and ``scripts/mfu.py`` (full
three-way MFU reconciliation).
"""

from __future__ import annotations

import time

#: TPU v5e (lite) peak FLOP/s by compute dtype.
V5E_BF16_PEAK = 197e12
V5E_F32_PEAK = 98.5e12


def analytic_roundtrip_macs(cfg) -> dict:
    """Matmul MACs per patch for one encode+decode roundtrip, by category.

    Enumerates the cadence exactly as implemented (models/dxvae.py): encode
    visits 7 nodes (6 combiner+looper pairs + 1 rooter) and caches projections
    per node; decode runs 1 rooter + 33 combiner+looper propagates (SURVEY.md
    §3.1: node vi refreshed vi+2 times), per-node caches (projection pack +
    edge-head half) computed once per finalized node, 6 node heads, 6
    self-loop heads, 21 cached-split edge heads.
    """
    h, z, x, x0, n = cfg.size_h, cfg.size_z, cfg.size_x, cfg.size_x0, cfg.n_nodes
    gru = (x + h) * 3 * h          # combiner or looper: x@W_ih + h@W_hh
    gru_root = (x0 + h) * 3 * h
    proj_pack = h * 4 * h          # hidden -> [gate_f, gate_b, map_f, map_b]
    eh_half = h * 4 * h            # hidden -> edge-head W1b half (4H wide)
    n_ops = n - 1                  # 6 operator nodes
    n_props_dec = sum(vi + 2 for vi in range(1, n))  # 33
    n_edges = sum(vi for vi in range(1, n))          # 21

    enc = {
        "encode GRUs": n_ops * 2 * gru + gru_root,
        "encode projection caches": n * proj_pack,
        "posterior heads": 2 * h * z,
    }
    dec = {
        "z_to_h": z * h,
        "x0 head": h * 2 * h + 2 * h * 2 * h + 2 * h * (x0 + 32),
        "decode rooter": gru_root,
        "decode GRUs": n_props_dec * 2 * gru,
        "node caches (proj + edge half)": n_ops * (proj_pack + eh_half),
        "x head": n_ops * (h * 2 * h + 2 * h * 2 * h + 2 * h * x),
        "self-loop head": n_ops * (h * 2 * h + 2 * h * 1),
        "edge head (cached split)": n_edges * (h * 4 * h + 4 * h * 2),
    }
    out = {**enc, **dec}
    out["TOTAL"] = sum(out.values())
    return out


def analytic_roundtrip_flops(cfg) -> float:
    """FLOPs per patch (2 * MACs) for one encode+decode roundtrip."""
    return 2.0 * analytic_roundtrip_macs(cfg)["TOTAL"]


def matmul_calibration(batch: int, h: int, dtype: str = "bfloat16",
                       repeats: int = 4, ks=(512, 4096)) -> dict:
    """Measure achievable (batch, H) @ (H, 3H) matmul TFLOP/s this session.

    Two regimes, both with the chained-fori + two-K-difference methodology the
    model benchmarks use (fixed tunnel overheads cancel exactly):

    * ``independent`` — back-to-back matmuls with only a scalar reduction
      chain between iterations: the achievable matmul *throughput* bound for
      this shape, the session-variance yardstick;
    * ``dependent_chain`` — each matmul consumes the previous result: the
      single-stream *latency* bound (the model's sequential-depth regime).

    Returns ``{"independent": tflops, "dependent_chain": tflops}``.
    """
    import jax
    import jax.numpy as jnp

    dt = jnp.bfloat16 if dtype.startswith("bfloat16") else jnp.float32
    w = jax.random.normal(jax.random.PRNGKey(1), (h, 3 * h), dt)
    v = jax.random.normal(jax.random.PRNGKey(2), (batch, h), dt)

    @jax.jit
    def mm_chain(v, w, k):
        def body(_, carry):
            x, acc = carry
            y = x @ w
            xn = y[:, :h] * 1e-3 + x  # keep magnitude bounded, carry dependence
            return (xn, acc + y.sum())

        _, acc = jax.lax.fori_loop(0, k, body, (v, jnp.zeros((), jnp.float32)))
        return acc

    @jax.jit
    def mm_indep(v, w, k):
        def body(i, acc):
            # cast the feedback term back to v's dtype: a strongly-typed f32
            # acc would otherwise promote the whole matmul to f32 and the
            # bf16 calibration would silently measure f32 matmuls
            y = (v + (acc * 1e-20).astype(v.dtype)) @ w
            return acc + y.sum()

        return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

    mm_flops = 2.0 * batch * h * 3 * h
    out = {}
    for label, fn in (("independent", mm_indep), ("dependent_chain", mm_chain)):
        float(fn(v, w, 1))  # compile
        mts = []
        for k in ks:
            ts = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                float(fn(v, w, k))
                ts.append(time.perf_counter() - t0)
            mts.append(min(ts))
        mm_t = (mts[1] - mts[0]) / (ks[1] - ks[0])
        out[label] = round(mm_flops / mm_t / 1e12, 2) if mm_t > 0 else float("nan")
    return out
