"""Quantizer grid semantics (model.py:87-149 equivalents), SURVEY.md §4 unit tier."""

import jax.numpy as jnp
import numpy as np

from dxvae_tpu.models.quantize import q_bool, q_lin, q_log, q_prob, reg_x0, reg_xi


def test_q_lin():
    x = jnp.array([-0.2, 0.0, 0.004, 0.5, 0.996, 1.3])
    xq, p = q_lin(x, 99)
    np.testing.assert_array_equal(np.asarray(p), [0, 0, 0, 50, 99, 99])  # round + clamp
    np.testing.assert_allclose(np.asarray(xq), np.asarray(p) / 99.0)


def test_q_lin_round_half_even():
    # torch round_() rounds half to even; grids must match bit-for-bit
    x = jnp.array([0.5, 1.5, 2.5, 3.5]) / 7.0
    _, p = q_lin(x, 7)
    np.testing.assert_array_equal(np.asarray(p), [0, 2, 2, 4])


def test_q_log():
    # inverse-log grid: exact fixed points at x = log(k+1)/log(scale+1)
    for scale in (31, 99):
        k = np.arange(scale + 1, dtype=np.float32)
        x = np.log(k + 1) / np.log(np.float32(scale + 1))
        xq, p = q_log(jnp.asarray(x), scale)
        np.testing.assert_array_equal(np.asarray(p), k)
        np.testing.assert_allclose(np.asarray(xq), x, rtol=1e-4)  # f32 log/exp
    # out-of-range clamps
    _, p = q_log(jnp.array([-5.0, 5.0]), 31)
    np.testing.assert_array_equal(np.asarray(p), [0, 31])


def test_q_bool():
    x = jnp.array([-3.0, -0.1, 0.1, 3.0])
    p, _ = q_bool(x)
    np.testing.assert_array_equal(np.asarray(p), [0, 0, 1, 1])


def test_q_prob():
    x = jnp.array([[0.1, 0.9, 0.3], [0.7, 0.2, 0.1]])
    onehot, p = q_prob(x, 4)
    np.testing.assert_array_equal(np.asarray(p), [1, 0])
    assert onehot.shape == (2, 4)
    np.testing.assert_array_equal(np.asarray(onehot), [[0, 1, 0, 0], [1, 0, 0, 0]])


def test_reg_x0_layout():
    rng = np.random.default_rng(0)
    x0_plus = jnp.asarray(rng.normal(size=(5, 55)).astype(np.float32))
    x0, p0 = reg_x0(x0_plus)
    assert x0.shape == (5, 27) and p0.shape == (5, 21)
    x0, p0 = np.asarray(x0), np.asarray(p0)
    assert np.all(x0[:, 23:] == 0)       # padding dims zeroed
    assert np.all(p0[:, 19:] == 0)       # padding params zeroed
    assert np.all((p0[:, 17] >= 0) & (p0[:, 17] <= 5))    # lfw 6 classes
    assert np.all((p0[:, 18] >= 0) & (p0[:, 18] <= 31))   # alg 32 classes
    np.testing.assert_array_equal(x0[:, 17:23].sum(-1), 1.0)  # lfw one-hot
    assert np.all(np.isin(x0[:, 15:17], [0.0, 1.0]))      # oks/lks booleans


def test_reg_xi_mode_branch():
    # force both modes via dim 18 logit sign
    x = np.zeros((2, 27), np.float32)
    x[:, 9] = 0.8   # fc
    x[:, 10] = 0.5  # ff
    x[0, 18] = -5.0  # ratio mode
    x[1, 18] = +5.0  # fixed mode
    xi, pi = reg_xi(jnp.asarray(x))
    pi = np.asarray(pi)
    # ratio: log grid (scale 31): round(exp(0.8*log32)-1) = round(15.2) = 15
    assert pi[0, 9] == round(np.exp(0.8 * np.log(32)) - 1)
    # fixed: linear grid scale 3: round(0.8*3) = 2
    assert pi[1, 9] == 2
    # ff ratio: log grid 99: round(exp(0.5*log100)-1) = round(9.0) = 9
    assert pi[0, 10] == round(np.exp(0.5 * np.log(100)) - 1)
    # ff fixed: linear 99: round(0.5*99) = 50
    assert pi[1, 10] == 50


def test_reg_xi_rc_quirk():
    """strict_parity argmaxes rc over the 3-wide slice [23:26] (model.py:139)
    making rc=3 unreachable; non-strict uses the full 4-wide slice."""
    x = np.zeros((1, 27), np.float32)
    x[0, 23:27] = [0.1, 0.2, 0.3, 9.9]  # best logit is class 3
    _, pi_strict = reg_xi(jnp.asarray(x), strict_parity=True)
    _, pi_fixed = reg_xi(jnp.asarray(x), strict_parity=False)
    assert np.asarray(pi_strict)[0, 20] == 2   # class 3 invisible under parity
    assert np.asarray(pi_fixed)[0, 20] == 3


def test_reg_outputs_in_canonical_range():
    rng = np.random.default_rng(1)
    xi, pi = reg_xi(jnp.asarray(rng.normal(size=(64, 27)).astype(np.float32) * 2))
    pi = np.asarray(pi)
    highs = [99] * 9 + [31, 99, 14, 99, 99, 99, 3, 7, 7, 1, 3, 3]
    for d, hi in enumerate(highs):
        assert pi[:, d].min() >= 0 and pi[:, d].max() <= hi, f"param {d} out of [0,{hi}]"
