"""Mixed-precision matmul rule — the single source for the bfloat16_mixed
contract (bf16 weights on the MXU, f32 activation islands).

A leaf module (imports jax only) so both ``models.layers`` and
``ops.propagate`` share one implementation without an import cycle through
``models.__init__``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def matmul_wT(x, w):
    """``x @ w.T`` with mixed-precision support.

    When the weight is bfloat16 but the activation is not (the
    ``bfloat16_mixed`` mode: bf16 weights/MXU flops, float32 activation
    islands), the activation is cast to bf16 for the matmul and the MXU
    accumulates/outputs in the activation's dtype via
    ``preferred_element_type`` — full-rate bf16 matmul, no precision loss in
    the elementwise chain between matmuls.
    """
    if w.dtype == jnp.bfloat16 and x.dtype != jnp.bfloat16:
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16),
            w,
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=x.dtype,
        )
    return x @ w.T
