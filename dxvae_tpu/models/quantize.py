"""Output quantizers: snap decoder head outputs to DX7 parameter grids.

JAX re-design of the reference quantizers (model.py:87-149).  Where the
reference loops over the batch in Python to branch per-sample on the
oscillator mode (model.py:141-147), here every branch is a ``jnp.where`` over
the whole batch — fully vectorized, jit/vmap-safe, and device-invariant (the
reference's CPU-tensor allocations made its generation path crash on CUDA;
that quirk is structurally impossible here).

Rounding uses round-half-to-even in both torch and jnp, so grids match
bit-for-bit.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def q_lin(x: jnp.ndarray, scale: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Linear grid: p = clamp(round(x * scale), 0, scale); x = p / scale (model.py:87-91)."""
    p = jnp.clip(jnp.round(x * scale), 0.0, float(scale))
    return p / scale, p


def q_log(x: jnp.ndarray, scale: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse-log grid: p = clamp(round(exp(x * log(scale+1)) - 1), 0, scale);
    x = log(p + 1) / log(scale + 1)  (model.py:93-98)."""
    log_scale = jnp.log(jnp.float32(scale + 1))
    p = jnp.clip(jnp.round(jnp.exp(x * log_scale) - 1.0), 0.0, float(scale))
    return jnp.log(p + 1.0) / log_scale, p


def q_bool(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Boolean: p = round(sigmoid(x)) (model.py:100-102)."""
    p = jnp.round(jax.nn.sigmoid(x))
    return p, p


def q_prob(x: jnp.ndarray, n_classes: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Categorical: argmax over the given logits slice, one-hot re-expansion
    to ``n_classes`` (model.py:104-107).  The slice may be narrower than
    ``n_classes`` (see the rc quirk in :func:`reg_xi`)."""
    p = jnp.argmax(x, axis=-1)
    return jax.nn.one_hot(p, n_classes, dtype=x.dtype), p


def reg_x0(x0_plus: jnp.ndarray, size_x: int = 27, n_params: int = 21):
    """Quantize the 55-wide global head output (23 X0 dims + 32 algorithm
    logits, model.py:45) into (X0 (B,27), p0 (B,21)) — mirrors model.py:109-125."""
    x_env, p_env = q_lin(x0_plus[:, 0:8], 99)
    x_tsp, p_tsp = q_lin(x0_plus[:, 8:9], 48)
    x_lfo, p_lfo = q_lin(x0_plus[:, 9:13], 99)
    x_fbs, p_fbs = q_lin(x0_plus[:, 13:15], 7)
    x_oks, p_oks = q_bool(x0_plus[:, 15:17])
    x_lfw, p_lfw = q_prob(x0_plus[:, 17:23], 6)
    p_alg = jnp.argmax(x0_plus[:, 23:], axis=-1)

    b = x0_plus.shape[0]
    dt = x0_plus.dtype
    x0 = jnp.concatenate(
        [x_env, x_tsp, x_lfo, x_fbs, x_oks, x_lfw, jnp.zeros((b, size_x - 23), dt)], axis=-1
    )
    p0 = jnp.concatenate(
        [
            p_env, p_tsp, p_lfo, p_fbs, p_oks,
            p_lfw[:, None].astype(dt),
            p_alg[:, None].astype(dt),
            jnp.zeros((b, n_params - 19), dt),
        ],
        axis=-1,
    )
    return x0, p0


def reg_xi(xi: jnp.ndarray, strict_parity: bool = True, n_params: int = 21):
    """Quantize a 27-wide operator head output into (Xi (B,27), pi (B,21)) —
    mirrors model.py:127-149.

    The fc/ff grids branch per sample on the predicted oscillator mode:
    ratio mode uses the log grids (31 / 99), fixed mode the linear grids
    (3 / 99) — vectorized with ``jnp.where``.

    Quirk ledger: the reference argmaxes rc over the 3-wide slice
    ``Xi[:, 23:26]`` against 4 classes (model.py:139), making rc=3 unreachable
    at generation; ``strict_parity=True`` (default) reproduces that,
    ``strict_parity=False`` uses the intended 4-wide slice.
    """
    x_lev, p_lev = q_lin(xi[:, 0:9], 99)      # lev + env
    x_det, p_det = q_lin(xi[:, 11:12], 14)
    x_bld, p_bld = q_lin(xi[:, 12:15], 99)    # bp, ld, rd
    x_ams, p_ams = q_lin(xi[:, 15:16], 3)
    x_kr, p_kr = q_lin(xi[:, 16:18], 7)       # kvs, rs
    x_mode, p_mode = q_bool(xi[:, 18:19])
    x_lc, p_lc = q_prob(xi[:, 19:23], 4)
    rc_slice = xi[:, 23:26] if strict_parity else xi[:, 23:27]
    x_rc, p_rc = q_prob(rc_slice, 4)

    ratio = p_mode == 0.0  # (B, 1)
    fc_log_x, fc_log_p = q_log(xi[:, 9:10], 31)
    fc_lin_x, fc_lin_p = q_lin(xi[:, 9:10], 3)
    ff_log_x, ff_log_p = q_log(xi[:, 10:11], 99)
    ff_lin_x, ff_lin_p = q_lin(xi[:, 10:11], 99)
    x_fc = jnp.where(ratio, fc_log_x, fc_lin_x)
    p_fc = jnp.where(ratio, fc_log_p, fc_lin_p)
    x_ff = jnp.where(ratio, ff_log_x, ff_lin_x)
    p_ff = jnp.where(ratio, ff_log_p, ff_lin_p)

    dt = xi.dtype
    xi_q = jnp.concatenate(
        [x_lev, x_fc, x_ff, x_det, x_bld, x_ams, x_kr, x_mode, x_lc, x_rc], axis=-1
    )
    pi = jnp.concatenate(
        [
            p_lev, p_fc, p_ff, p_det, p_bld, p_ams, p_kr, p_mode,
            p_lc[:, None].astype(dt),
            p_rc[:, None].astype(dt),
        ],
        axis=-1,
    )
    return xi_q, pi
