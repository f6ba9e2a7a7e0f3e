"""Mixed-precision matmul rule — the single source for the bfloat16_mixed
contract (bf16 weights on the MXU, f32 activation islands) and the int8
serving quantization (``QuantizedWeight``).

A leaf module (imports jax only) so both ``models.layers`` and
``ops.propagate`` share one implementation without an import cycle through
``models.__init__``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuantizedWeight(NamedTuple):
    """Per-output-channel symmetric int8 weight for ``matmul_wT``.

    ``q (out, in)`` int8, ``scale (out,)`` f32 — ``w ≈ q * scale[:, None]``.
    A pytree node: params trees may hold these in place of raw matrices and
    every ``matmul_wT`` consumer dispatches on the type (no flag threading).
    Built at trace time (``quantize_weight``), so in AOT-exported artifacts
    XLA constant-folds the quantization and bakes int8 constants.
    """

    q: jax.Array
    scale: jax.Array


def quantize_weight(w) -> QuantizedWeight:
    """Symmetric per-output-channel int8 quantization of a (out, in) matrix."""
    w32 = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w32), axis=1), 1e-12) / 127.0
    q = jnp.round(w32 / scale[:, None]).astype(jnp.int8)  # |w| <= 127*scale
    return QuantizedWeight(q=q, scale=scale)


def matmul_wT(x, w):
    """``x @ w.T`` with mixed-precision and int8 support.

    When the weight is bfloat16 but the activation is not (the
    ``bfloat16_mixed`` mode: bf16 weights/MXU flops, float32 activation
    islands), the activation is cast to bf16 for the matmul and the MXU
    accumulates/outputs in the activation's dtype via
    ``preferred_element_type`` — full-rate bf16 matmul, no precision loss in
    the elementwise chain between matmuls.

    A ``QuantizedWeight`` runs the int8 MXU path: the activation is
    dynamically quantized per row (symmetric, max-abs), the product
    accumulates in int32, and the result is dequantized by the two scales.
    """
    if isinstance(w, QuantizedWeight):
        x32 = x.astype(jnp.float32)
        s_x = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True), 1e-12) / 127.0
        xq = jnp.round(x32 / s_x).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq,
            w.q,
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (y.astype(jnp.float32) * s_x * w.scale).astype(x.dtype)
    if w.dtype == jnp.bfloat16 and x.dtype != jnp.bfloat16:
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16),
            w,
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=x.dtype,
        )
    return x @ w.T
