"""Fused Pallas propagate kernel: correctness vs the jnp reference.

On the CPU test platform the kernel executes in Pallas interpreter mode
(same semantics); on TPU hardware it compiles to a Mosaic kernel — validated
separately on-device (see ops/fused_propagate.py docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxvae_tpu.models import DXVAEConfig, init_params
from dxvae_tpu.models import layers as L
from dxvae_tpu.ops.fused_propagate import pack_propagate_weights, propagate_step
from dxvae_tpu.ops.propagate import pack_gate_mapper

CFG = DXVAEConfig()


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), CFG)


def _reference(params, x, h_in, s):
    h1 = L.gru(params["dec_combiner"], x, h_in)
    hv = L.gru(params["dec_looper"], x * s[:, None], h1)
    wp = pack_gate_mapper(params["gate"]["w"], params["mapper"]["w"])
    proj = (hv @ wp.T).reshape(x.shape[0], 4, -1)
    return hv, proj


@pytest.mark.parametrize("batch", [8, 128, 200])
def test_fused_propagate_matches_reference(params, batch):
    pw = pack_propagate_weights(params)
    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, 27))
    h_in = jax.random.normal(jax.random.PRNGKey(2), (batch, 512)) * 0.1
    s = (jax.random.uniform(jax.random.PRNGKey(3), (batch,)) > 0.5).astype(jnp.float32)

    hv, proj = propagate_step(x, h_in, s, pw)  # pads batch to the tile size
    hv_ref, proj_ref = _reference(params, x, h_in, s)
    np.testing.assert_allclose(np.asarray(hv), np.asarray(hv_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(proj), np.asarray(proj_ref), rtol=1e-4, atol=1e-4)


def test_fused_propagate_grad_matches(params):
    pw = pack_propagate_weights(params)
    x = jax.random.uniform(jax.random.PRNGKey(4), (32, 27))
    s = jnp.ones((32,))
    h0 = jax.random.normal(jax.random.PRNGKey(5), (32, 512)) * 0.1

    def f(h):
        hv, proj = propagate_step(x, h, s, pw)
        return (hv**2).sum() + proj.sum()

    def f_ref(h):
        hv, proj = _reference(params, x, h, s)
        return (hv**2).sum() + proj.sum()

    g = jax.grad(f)(h0)
    g_ref = jax.grad(f_ref)(h0)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-3, atol=1e-3)


def test_model_with_use_pallas_matches(params, dataset):
    """Full forward/decode with cfg.use_pallas agrees with the jnp path
    (interpreter-mode kernel on CPU; small batch for speed)."""
    from dxvae_tpu.models import decode, forward

    b = dataset[:2]
    X, P, adj = b.X, b.params, b.adj.astype(np.float32)
    c0 = DXVAEConfig()
    c1 = DXVAEConfig(use_pallas=True)
    t0, _ = forward(params, X, P, adj, training=False, cfg=c0)
    t1, _ = forward(params, X, P, adj, training=False, cfg=c1)
    np.testing.assert_allclose(float(t0), float(t1), rtol=1e-5)
    z = jax.random.normal(jax.random.PRNGKey(7), (2, CFG.size_z))
    P0 = decode(params, z, c0)[1]
    P1 = decode(params, z, c1)[1]
    np.testing.assert_array_equal(np.asarray(P0), np.asarray(P1))
