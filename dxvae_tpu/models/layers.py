"""Primitive layers as pure functions over parameter pytrees.

Initialization matches torch defaults so that (a) training-from-scratch runs
are statistically comparable to the reference and (b) torch checkpoints can be
imported weight-for-weight (same shapes, same layouts):

* ``Linear``: weight ``(out, in)`` and bias both ~ U(-1/sqrt(in), 1/sqrt(in))
  (torch's kaiming_uniform(a=sqrt(5)) reduces to exactly this bound);
* ``GRUCell``: ``w_ih (3H, in)``, ``w_hh (3H, H)``, ``b_ih``, ``b_hh`` all
  ~ U(-1/sqrt(H), 1/sqrt(H)), gate blocks ordered (reset, update, new) as in
  torch — the order a reference checkpoint stores them in.

Applies are written with the matmul shapes XLA tiles onto the MXU
(``x @ w.T``); everything runs in the dtype of the inputs.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------- #
# init
# --------------------------------------------------------------------------- #

def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def linear_init(key, in_features: int, out_features: int, bias: bool = True, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_features)
    p = {"w": _uniform(kw, (out_features, in_features), bound, dtype)}
    if bias:
        p["b"] = _uniform(kb, (out_features,), bound, dtype)
    return p


def gru_init(key, in_features: int, hidden: int, dtype=jnp.float32):
    k = jax.random.split(key, 4)
    bound = 1.0 / math.sqrt(hidden)
    return {
        "w_ih": _uniform(k[0], (3 * hidden, in_features), bound, dtype),
        "w_hh": _uniform(k[1], (3 * hidden, hidden), bound, dtype),
        "b_ih": _uniform(k[2], (3 * hidden,), bound, dtype),
        "b_hh": _uniform(k[3], (3 * hidden,), bound, dtype),
    }


def mlp_init(key, sizes: Sequence[int], dtype=jnp.float32):
    """Linear stack with ReLU between layers; ``sizes = [in, h1, ..., out]``."""
    keys = jax.random.split(key, len(sizes) - 1)
    return [linear_init(k, sizes[i], sizes[i + 1], dtype=dtype) for i, k in enumerate(keys)]


# --------------------------------------------------------------------------- #
# apply
# --------------------------------------------------------------------------- #

# one shared implementation (also used by ops.propagate's cached-projection
# refresh); lives in a leaf module to avoid the models <-> ops import cycle
from dxvae_tpu.ops.matmul import (  # noqa: E402  (re-export)
    QuantizedWeight,
    matmul_wT,
    quantize_weight,
)


def linear(p, x):
    y = matmul_wT(x, p["w"])
    if "b" in p:
        y = y + p["b"]
    return y


def dropout(x, rate: float, key):
    """Inverted dropout (torch semantics): zero with probability ``rate``,
    scale survivors by 1/(1-rate) so activations keep their expectation."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros((), x.dtype))


def mlp(layers, x, drop=None):
    """Linear stack with ReLU between layers.

    ``drop = (rate, key)`` applies dropout after every hidden ReLU (training
    -time head regularization; the key is split once per hidden layer).
    ``None`` (default) is the exact reference-parity path."""
    for i, p in enumerate(layers):
        x = linear(p, x)
        if i + 1 < len(layers):
            x = jax.nn.relu(x)
            if drop is not None:
                rate, key = drop
                key, sub = jax.random.split(key)
                drop = (rate, key)
                x = dropout(x, rate, sub)
    return x


def gru(p, x, h):
    """torch.nn.GRUCell semantics (gate order r, z, n):

    r = sigmoid(W_ir x + b_ir + W_hr h + b_hr)
    z = sigmoid(W_iz x + b_iz + W_hz h + b_hz)
    n = tanh   (W_in x + b_in + r * (W_hn h + b_hn))
    h' = (1 - z) * n + z * h
    """
    gi = matmul_wT(x, p["w_ih"]) + p["b_ih"]
    gh = matmul_wT(h, p["w_hh"]) + p["b_hh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


# --------------------------------------------------------------------------- #
# losses (torch-reduction-compatible primitives, reduction='none')
# --------------------------------------------------------------------------- #

def bce_with_logits(logits, targets):
    """Elementwise BCEWithLogitsLoss: max(x,0) - x*y + log1p(exp(-|x|))."""
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def cross_entropy(logits, labels):
    """Per-sample CrossEntropyLoss: logsumexp(logits) - logits[label]."""
    lse = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return lse - picked
