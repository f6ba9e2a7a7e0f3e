"""Dev-mode numerical checking (checkify wrapper + host-side finite checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxvae_tpu.utils.debug import assert_all_finite, checked


def test_checked_catches_nan():
    def f(x):
        return jnp.log(x).sum()  # NaN for negative inputs

    err, _ = jax.jit(checked(f))(jnp.array([-1.0, 2.0]))
    with pytest.raises(Exception):
        err.throw()


def test_checked_passes_clean_model_forward(dataset):
    from dxvae_tpu.models import DXVAEConfig, forward, init_params

    cfg = DXVAEConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    b = dataset[:2]

    def loss_fn(p):
        total, _ = forward(p, b.X, b.params, b.adj.astype(np.float32),
                           training=False, cfg=cfg)
        return total

    err, val = checked(loss_fn)(params)
    err.throw()  # no error on a healthy forward
    assert np.isfinite(float(val))


def test_assert_all_finite():
    assert_all_finite({"a": np.ones(3)}, "ok")
    with pytest.raises(FloatingPointError, match="bad"):
        assert_all_finite({"bad": np.array([1.0, np.nan])}, "params")
