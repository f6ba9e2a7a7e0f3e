"""Model-level tests: parity vs the reference-semantics oracle, invariants.

The oracle (tests/oracle.py) implements the recurrence literally (per-sample
loops, explicit edge sets, torch numerics); the framework implements it as
dense masked tensor math under jit.  Agreement on random weights + real data
validates the dense reformulation end to end (SURVEY.md §4 model tier).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxvae_tpu.models import (
    DXVAEConfig,
    LossWeights,
    decode,
    elbo_loss,
    encode,
    forward,
    generate,
    init_params,
    param_count,
)

from oracle import TorchOracle

CFG = DXVAEConfig()


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def np_params(params):
    return jax.tree.map(np.asarray, params)


@pytest.fixture(scope="module")
def oracle(np_params):
    return TorchOracle(np_params)


@pytest.fixture(scope="module")
def real_batch(dataset):
    b = dataset[:4]
    return b.X, b.params, b.adj.astype(np.float32)


def test_param_count(params):
    # exact reference model size (BASELINE.md: 12,083,541 at H=512, Z=128)
    assert param_count(params) == 12_083_541


def test_encode_parity(params, oracle, real_batch):
    X, P, adj = real_batch
    mu, std, st = jax.jit(lambda p, x, a: encode(p, x, a, CFG))(params, X, adj)
    mu_o, std_o, hidden_o = oracle.encode(X, adj)
    np.testing.assert_allclose(np.asarray(mu), mu_o.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(std), std_o.numpy(), rtol=1e-3, atol=1e-3)
    # per-node hidden states agree too
    h_o = np.stack([np.stack([h.numpy() for h in row]) for row in hidden_o])  # (B,7,H)
    np.testing.assert_allclose(np.asarray(st.hidden), h_o, rtol=1e-3, atol=1e-3)
    assert std.min() > 0  # softplus positivity


def test_loss_parity(params, oracle, real_batch):
    X, P, adj = real_batch
    mu, std, st = encode(params, X, adj, CFG)
    z = np.asarray(mu)  # eval-mode z (deterministic, comparable)
    total, aux = jax.jit(
        lambda p, m, s, x, pp, a: elbo_loss(
            p, m, s, x, pp, a, training=False, weights=LossWeights(), cfg=CFG
        )
    )(params, mu, std, X, P, adj)
    total_o, aux_o, _ = oracle.loss(z, X, P, adj, mu=np.asarray(mu), std=np.asarray(std))
    np.testing.assert_allclose(float(total), float(total_o), rtol=2e-3)
    for a, b in zip(aux, aux_o):
        np.testing.assert_allclose(float(a), float(b), rtol=2e-3, atol=1e-4)


def test_decode_parity(params, oracle, real_batch):
    """f32 decode parity vs the oracle, tightened per the round-2 tracking
    note (VERDICT r3 #6a): at the f64-path z (posterior means of real data —
    the same z test_reference_exec.py asserts EXACT f64 parity at) both
    cadences must match the oracle exactly in f32 too (measured r4: zero
    mismatches for unroll and batched alike).  Thresholded/argmax tie flips
    from f32 summation-order noise are only tolerated at an arbitrary random
    z, and only for the batched cadence (the order that diverges from the
    oracle's sequential one); the unrolled cadence mirrors the oracle's
    order and stays exact there as well."""
    X, P, adj = real_batch
    mu, _, _ = encode(params, X, adj, CFG)
    z_mu = np.asarray(mu)
    z_rand = np.asarray(jax.random.normal(jax.random.PRNGKey(7), (6, CFG.size_z)))
    cfg_u, cfg_b = DXVAEConfig(unroll=True), DXVAEConfig(unroll=False)

    def mismatches(z, cfg):
        Xj, Pj, Aj = jax.jit(lambda p, zz: decode(p, zz, cfg))(params, jnp.asarray(z))
        Xo, Po, Ao = oracle.decode(z)
        return (int((np.asarray(Aj) != Ao).sum()),
                int((np.abs(np.asarray(Pj) - Po) > 1e-5).sum()))

    for cfg, name in ((cfg_u, "unroll"), (cfg_b, "batched")):
        am, pm = mismatches(z_mu, cfg)
        assert am == 0, f"{name} @ f64-path z: {am} adjacency mismatches (must be exact)"
        assert pm == 0, f"{name} @ f64-path z: {pm} param mismatches (must be exact)"
    am, pm = mismatches(z_rand, cfg_u)
    assert am == 0, f"unroll @ random z: {am} adjacency mismatches (must be exact)"
    assert pm == 0, f"unroll @ random z: {pm} param mismatches (must be exact)"
    # batched cadence at random z: the ONE place summation-order tie flips are
    # legitimate; exceeding the budget means an early flip cascaded through
    # the autoregressive feedback — investigate (f64 test is the exact gate).
    am, pm = mismatches(z_rand, cfg_b)
    assert am <= 2, f"batched @ random z: {am} adjacency mismatches (expect <=2 tie flips)"
    assert pm <= 8, f"batched @ random z: {pm} param mismatches (expect few tie flips)"


def test_decode_deterministic(params):
    z = jax.random.normal(jax.random.PRNGKey(3), (4, CFG.size_z))
    out1 = decode(params, z, CFG)
    out2 = decode(params, z, CFG)
    for a, b in zip(out1, out2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_decode_outputs_valid(params):
    """Generated params must be canonical DX7 values serializable to a bank."""
    from dxvae_tpu.data.sysex import pack_voices, unpack_voices

    X, P, adj = generate(params, jax.random.PRNGKey(11), 32, CFG)
    P = np.asarray(P).astype(np.int32)
    raw = pack_voices(P)  # raises if out of 7-bit range
    assert raw.shape == (32, 128)
    p2, _, _ = unpack_voices(raw)
    # alg byte round-trips; other params round-trip exactly (canonical grids)
    np.testing.assert_array_equal(p2[:, 0, 18], P[:, 0, 18])
    np.testing.assert_array_equal(p2, P)


def test_generated_adj_is_windowed(params):
    """Decode can only materialize edges within the autoregressive window
    (x <= vi), so the adjacency it reports must have no edges involving
    never-visited pairs — structurally guaranteed, sanity-checked here."""
    _, _, adj = generate(params, jax.random.PRNGKey(5), 8, CFG)
    assert np.asarray(adj).shape == (8, 7, 7)
    assert set(np.unique(np.asarray(adj))) <= {0.0, 1.0}


def test_loss_finite_and_grads_flow(params, real_batch):
    X, P, adj = real_batch

    def loss_fn(p):
        total, _ = forward(p, X, P, adj, key=jax.random.PRNGKey(0), training=True)
        return total

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    flat, _ = jax.tree_util.tree_flatten(grads)
    for g in flat:
        assert np.isfinite(np.asarray(g)).all()
    # every parameter receives gradient signal somewhere
    nonzero = [float(jnp.abs(g).max()) > 0 for g in flat]
    assert all(nonzero), f"{sum(not z for z in nonzero)} parameter tensors got zero grad"


def test_kld_closed_form(params, real_batch):
    """KL term matches the closed form for KL(N(0,1) || N(mu, std))."""
    X, P, adj = real_batch
    mu, std, _ = encode(params, X, adj, CFG)
    _, (_, _, _, kld_w) = elbo_loss(
        params, mu, std, X, P, adj, training=False, weights=LossWeights(w_kld=1.0), cfg=CFG
    )
    mu_n, std_n = np.asarray(mu, np.float64), np.asarray(std, np.float64)
    expected = (np.log(std_n) + (1 + mu_n**2) / (2 * std_n**2) - 0.5).mean(0).sum()
    np.testing.assert_allclose(float(kld_w), expected, rtol=1e-3)  # f32 vs f64 closed form


def test_training_rsample_differs_from_eval(params, real_batch):
    X, P, adj = real_batch
    t1, _ = forward(p_ := params, X_ := X, P, adj, key=jax.random.PRNGKey(1), training=True)
    t2, _ = forward(p_, X_, P, adj, training=False)
    assert float(t1) != float(t2)


def test_encode_batch_consistency(params, real_batch):
    """Encoding a concatenated batch equals encoding samples separately
    (no cross-sample leakage through the dense masks)."""
    X, P, adj = real_batch
    mu_all, std_all, _ = encode(params, X, adj, CFG)
    mu_one, std_one, _ = encode(params, X[3:4], adj[3:4], CFG)
    np.testing.assert_allclose(np.asarray(mu_all)[3:4], np.asarray(mu_one), rtol=1e-5, atol=1e-6)


def test_exact_parity_float64():
    """Authoritative parity gate: with x64 enabled, the dense JAX forward is
    *bitwise-level* identical (diffs ~1e-15, pure reassociation) to the
    literal-semantics oracle.  Run in a fresh process because jax_enable_x64 is
    a process-global flag."""

    code = """
import jax
jax.config.update("jax_platforms", "cpu")  # escape the pinned axon platform
jax.config.update("jax_enable_x64", True)
import numpy as np, torch, sys
sys.path.insert(0, "tests")
import oracle as om
om._t = lambda a: torch.from_numpy(np.asarray(a, np.float64).copy())
torch.set_default_dtype(torch.float64)
from dxvae_tpu.models import DXVAEConfig, encode, elbo_loss, init_params, LossWeights
from dxvae_tpu.data.dataset import DXDataset
from oracle import TorchOracle

cfg = DXVAEConfig()
params = jax.tree.map(lambda a: np.asarray(a, np.float64),
                      init_params(jax.random.PRNGKey(0), cfg))
b = DXDataset("/root/reference/DX_data", save_dir="/tmp/dx_par_cache")[:2]
X, P, adj = b.X.astype(np.float64), b.params, b.adj.astype(np.float64)
mu, std, st = encode(params, X, adj, cfg)
o = TorchOracle(params)
mu_o, std_o, _ = o.encode(X, adj)
assert np.abs(np.asarray(mu) - mu_o.numpy()).max() < 1e-12
assert np.abs(np.asarray(std) - std_o.numpy()).max() < 1e-12
total, aux = elbo_loss(params, mu, std, X, P.astype(np.float64), adj,
                       training=False, weights=LossWeights(), cfg=cfg)
total_o, aux_o, _ = o.loss(np.asarray(mu), X, P, adj, mu=np.asarray(mu), std=np.asarray(std))
assert abs(float(total) - float(total_o)) < 1e-10, (float(total), float(total_o))

from dxvae_tpu.models import decode
z = np.asarray(jax.random.normal(jax.random.PRNGKey(7), (3, cfg.size_z)), np.float64)
Xj, Pj, Aj = decode(params, z, cfg)
Xo, Po, Ao = o.decode(z)
assert np.array_equal(np.asarray(Aj), Ao)
assert np.abs(np.asarray(Pj) - Po).max() < 1e-9
assert np.abs(np.asarray(Xj) - Xo).max() < 1e-9
print("OK")
"""
    from conftest import run_parity_subprocess

    run_parity_subprocess(code)


def test_scan_equals_unrolled(params, real_batch):
    """The scan step-program execution must match the fully-unrolled path:
    encode to fusion-level noise, loss exactly, decode bitwise."""
    X, P, adj = real_batch
    cfg_s = DXVAEConfig(unroll=False)
    cfg_u = DXVAEConfig(unroll=True)
    mu_s, std_s, st_s = encode(params, X, adj, cfg_s)
    mu_u, std_u, st_u = encode(params, X, adj, cfg_u)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_u), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(st_s.hidden), np.asarray(st_u.hidden), rtol=1e-5, atol=1e-6
    )
    ts, _ = elbo_loss(params, mu_s, std_s, X, P, adj, training=False, cfg=cfg_s)
    tu, _ = elbo_loss(params, mu_s, std_s, X, P, adj, training=False, cfg=cfg_u)
    np.testing.assert_allclose(float(ts), float(tu), rtol=1e-6)
    z = jax.random.normal(jax.random.PRNGKey(9), (4, CFG.size_z))
    out_s = decode(params, z, cfg_s)
    out_u = decode(params, z, cfg_u)
    for a, b in zip(out_s, out_u):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_forced_adj_is_exact_cadence_mirror(params):
    """Teacher-forced topology decode: forcing the adjacency a FREE decode
    produced must reproduce that decode bitwise (X, params, adj) — proving the
    forced path's hidden-refresh cadence is identical to the free decode with
    the same decisions, on both execution strategies.  An arbitrary forced
    adjacency must come back verbatim."""
    z = jax.random.normal(jax.random.PRNGKey(17), (6, CFG.size_z))
    for cfg in (DXVAEConfig(unroll=True), DXVAEConfig(unroll=False)):
        Xf, Pf, Af = decode(params, z, cfg)
        Xg, Pg, Ag = decode(params, z, cfg, forced_adj=jnp.asarray(Af))
        np.testing.assert_array_equal(np.asarray(Xg), np.asarray(Xf))
        np.testing.assert_array_equal(np.asarray(Pg), np.asarray(Pf))
        np.testing.assert_array_equal(np.asarray(Ag), np.asarray(Af))
    # arbitrary topology round-trips through the forced decode unchanged
    rng = np.random.default_rng(3)
    arb = rng.integers(0, 2, size=(6, 7, 7)).astype(np.float32)
    _, _, Aa = decode(params, z, DXVAEConfig(unroll=True),
                      forced_adj=jnp.asarray(arb))
    np.testing.assert_array_equal(np.asarray(Aa), arb)


def test_forced_adj_unroll_paths_agree(params):
    """Both execution strategies must produce identical forced decodes."""
    from dxvae_tpu.data.algorithms import ALGO_ADJ

    z = jax.random.normal(jax.random.PRNGKey(21), (8, CFG.size_z))
    fa = jnp.asarray(ALGO_ADJ[np.arange(8) % 32], jnp.float32)
    out_u = decode(params, z, DXVAEConfig(unroll=True), forced_adj=fa)
    out_s = decode(params, z, DXVAEConfig(unroll=False), forced_adj=fa)
    for a, b in zip(out_u, out_s):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nondefault_sizes_work(real_batch):
    """The whole stack is size-generic: a small config (H=64, Z=16) must
    forward, decode, and take a gradient without shape errors."""
    X, P, adj = real_batch
    small = DXVAEConfig(size_h=64, size_z=16)
    params = init_params(jax.random.PRNGKey(0), small)
    total, _ = forward(params, X, P, adj, training=False, cfg=small)
    assert np.isfinite(float(total))
    z = jax.random.normal(jax.random.PRNGKey(1), (3, small.size_z))
    Xd, Pd, Ad = decode(params, z, small)
    assert Xd.shape == (3, 7, 27) and Pd.shape == (3, 7, 21) and Ad.shape == (3, 7, 7)
    g = jax.grad(lambda p: forward(p, X, P, adj, key=jax.random.PRNGKey(2),
                                   training=True, cfg=small)[0])(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_trained_weights_loss_parity(dataset):
    """ELBO parity on *trained* weights (BASELINE target: within 1%): our loss
    vs the literal-semantics oracle must agree far tighter than that."""
    import os

    ck = "/root/repo/checkpoints/dx_1024.npz"
    if not os.path.exists(ck):
        pytest.skip("trained checkpoint not present")
    from dxvae_tpu.utils.checkpoint import load_checkpoint

    trained = load_checkpoint(ck, jax.tree.map(np.asarray, init_params(jax.random.PRNGKey(0), CFG)))
    b = dataset[:2]
    X, P, adj = b.X, b.params, b.adj.astype(np.float32)
    mu, std, st = encode(trained, X, adj, CFG)
    total, _ = elbo_loss(trained, mu, std, X, P, adj, training=False, cfg=CFG, init_state=st)
    o = TorchOracle(trained)
    mu_o, std_o, _ = o.encode(X, adj)
    total_o, _, _ = o.loss(np.asarray(mu), X, P, adj, mu=np.asarray(mu), std=np.asarray(std))
    rel = abs(float(total) - float(total_o)) / abs(float(total_o))
    assert rel < 1e-3, f"trained-weights ELBO rel diff {rel}"


def test_unknown_compute_dtype_raises(params, real_batch):
    """A misspelled compute_dtype must fail loudly, not silently run f32."""
    X, P, adj = real_batch
    with pytest.raises(ValueError, match="compute_dtype"):
        forward(params, X, P, adj, training=False,
                cfg=DXVAEConfig(compute_dtype="bf16_mixed"))


def test_bfloat16_mixed_matches_f32_closely(params, real_batch):
    """bfloat16_mixed (bf16 matrices except GRU w_hh, f32 activations) must
    track the f32 forward closely — it exists to close the bf16 convergence
    gap (docs/PERF.md precision study: within ~1% of f32 final loss)."""
    X, P, adj = real_batch
    t32, _ = forward(params, X, P, adj, training=False, cfg=DXVAEConfig())
    tmx, _ = forward(params, X, P, adj, training=False,
                     cfg=DXVAEConfig(compute_dtype="bfloat16_mixed"))
    rel_mx = abs(float(tmx) - float(t32)) / abs(float(t32))
    assert rel_mx < 5e-3, rel_mx
    # (the convergence advantage over pure bf16 is a training-trajectory
    # property — measured in docs/PERF.md's 500-epoch study — not a
    # single-forward one, so only the f32 closeness is asserted here)
    # w_hh really stays f32 in the compute pytree
    from dxvae_tpu.models.dxvae import _compute_params

    cp = _compute_params(params, DXVAEConfig(compute_dtype="bfloat16_mixed"))
    assert cp["enc_combiner"]["w_hh"].dtype == np.asarray(params["enc_combiner"]["w_hh"]).dtype
    assert cp["enc_combiner"]["w_ih"].dtype == jnp.bfloat16
    assert cp["enc_combiner"]["b_ih"].dtype != jnp.bfloat16
    # gradients flow finitely through the mixed path
    g = jax.grad(lambda p: forward(p, X, P, adj, key=jax.random.PRNGKey(0), training=True,
                                   cfg=DXVAEConfig(compute_dtype="bfloat16_mixed"))[0])(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_head_dropout_training_only(params, real_batch):
    """head_dropout (DXVAEConfig) regularizes the four decoder MLP heads:
    training-mode losses change and differ across keys, eval-mode losses and
    decode are bit-identical to the dropout-free config, gradients stay
    finite, and rate=0 is exactly the reference-parity program."""
    X, P, adj = real_batch
    for unroll in (False, True):
        base = DXVAEConfig(unroll=unroll)
        drop = DXVAEConfig(unroll=unroll, head_dropout=0.3)
        k = jax.random.PRNGKey(5)
        t0, _ = forward(params, X, P, adj, key=k, training=True, cfg=base)
        t1, _ = forward(params, X, P, adj, key=k, training=True, cfg=drop)
        t2, _ = forward(params, X, P, adj, key=jax.random.PRNGKey(6),
                        training=True, cfg=drop)
        assert float(t0) != float(t1)  # dropout actually fired
        assert float(t1) != float(t2)  # mask depends on the key
        # eval mode never drops: identical to the dropout-free config
        e0, _ = forward(params, X, P, adj, training=False, cfg=base)
        e1, _ = forward(params, X, P, adj, training=False, cfg=drop)
        assert float(e0) == float(e1)
        # decode is inference-only: unaffected by the flag
        z = jax.random.normal(jax.random.PRNGKey(2), (3, base.size_z))
        for a, b in zip(decode(params, z, base), decode(params, z, drop)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # gradients flow finitely through the dropout path (batched strategy)
    g = jax.grad(lambda p: forward(p, X, P, adj, key=jax.random.PRNGKey(3),
                                   training=True,
                                   cfg=DXVAEConfig(head_dropout=0.3))[0])(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_head_dropout_remat_consistent(params, real_batch):
    """remat must replay identical dropout masks on the recompute: the
    remat'd and plain losses/gradients agree exactly for the same key."""
    X, P, adj = real_batch
    cfg_p = DXVAEConfig(head_dropout=0.3)
    cfg_r = DXVAEConfig(head_dropout=0.3, remat=True)
    k = jax.random.PRNGKey(9)
    f = lambda p, cfg: forward(p, X, P, adj, key=k, training=True, cfg=cfg)[0]
    tp, gp = jax.value_and_grad(f)(params, cfg_p)
    tr, gr = jax.value_and_grad(f)(params, cfg_r)
    np.testing.assert_allclose(float(tp), float(tr), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_quantize_decode_int8(real_batch):
    """int8 decode (cfg.quantize_decode): every decode-side matmul runs
    int8xint8->int32 with per-channel weight scales and dynamic per-row
    activation scales (ops/matmul.QuantizedWeight).  Non-parity serving
    mode — gate: decisions and features must track the exact path closely,
    and an unknown value must fail loudly."""
    from dxvae_tpu.models import decode

    cfg = DXVAEConfig(size_h=64, size_z=16, unroll=False)
    p = init_params(jax.random.PRNGKey(3), cfg)
    z = np.asarray(jax.random.normal(jax.random.PRNGKey(4), (32, 16)))
    X0, P0, A0 = decode(p, jnp.asarray(z), cfg)
    Xq, Pq, Aq = decode(p, jnp.asarray(z), cfg._replace(quantize_decode="int8"))
    assert np.isfinite(np.asarray(Xq)).all()
    assert float(np.abs(np.asarray(X0) - np.asarray(Xq)).mean()) < 0.05
    assert float((np.asarray(A0) == np.asarray(Aq)).mean()) > 0.95
    assert float((np.asarray(P0) == np.asarray(Pq)).mean()) > 0.9
    # deterministic: the quantized path has no sampling
    Xq2, _, Aq2 = decode(p, jnp.asarray(z), cfg._replace(quantize_decode="int8"))
    np.testing.assert_array_equal(np.asarray(Xq), np.asarray(Xq2))
    # the unrolled cadence (the DXVAE/CLI default and the path the published
    # A/B ran on) must agree with the scan path under quantization exactly,
    # mirroring test_scan_equals_unrolled for the exact path
    Xu, Pu, Au = decode(p, jnp.asarray(z),
                        cfg._replace(quantize_decode="int8", unroll=True))
    np.testing.assert_array_equal(np.asarray(Xq), np.asarray(Xu))
    np.testing.assert_array_equal(np.asarray(Pq), np.asarray(Pu))
    np.testing.assert_array_equal(np.asarray(Aq), np.asarray(Au))
    # pre-quantized trees pass through idempotently (the bench hoist path)
    from dxvae_tpu.models.dxvae import _compute_params, _quantize_decode_params

    pq = _quantize_decode_params(_compute_params(p, cfg))
    Xp, Pp, Ap = decode(pq, jnp.asarray(z), cfg._replace(quantize_decode="int8"))
    np.testing.assert_array_equal(np.asarray(Xq), np.asarray(Xp))
    with pytest.raises(ValueError, match="quantize_decode"):
        decode(p, jnp.asarray(z), cfg._replace(quantize_decode="int4"))


def test_quantize_decode_int8_exports(tmp_path):
    """The int8 decode path survives AOT export (jax.export const-folds the
    weight quantization into baked int8 tensors) and the served artifact
    matches the live quantized decode bit-for-bit."""
    from dxvae_tpu.api import DXVAE
    from dxvae_tpu.models import decode
    from dxvae_tpu.serving import ServedDXVAE, export_bundle

    model = DXVAE(size_H=64, size_Z=16, seed=5, unroll=False)
    model.cfg = model.cfg._replace(quantize_decode="int8")
    path = tmp_path / "q.npz"
    export_bundle(model, path, batch_sizes=(8,), functions=("decode",),
                  platforms=("cpu",))
    srv = ServedDXVAE.load(path)
    z = np.asarray(jax.random.normal(jax.random.PRNGKey(6), (8, 16)), np.float32)
    Xs, Ps, As = srv.decode(z)
    Xl, Pl, Al = decode(model.params, jnp.asarray(z), model.cfg)
    np.testing.assert_array_equal(np.asarray(Xs), np.asarray(Xl))
    np.testing.assert_array_equal(np.asarray(Ps), np.asarray(Pl))
    np.testing.assert_array_equal(np.asarray(As), np.asarray(Al))


def test_ab_int8_script_micro(tmp_path):
    """scripts/ab_int8_decode.py CPU micro: runs, reports sane fidelity, and
    appends a JSON line (the measured-workflow harness for the int8 serving
    quantization A/B)."""
    from scripts._lib import load_sibling

    ab = load_sibling("ab_int8_decode")
    out = tmp_path / "ab.jsonl"
    rep = ab.main(["--size-h", "32", "--no-unroll", "--n", "32",
                   "--skip-serving", "--dtype", "float32",
                   "--out", str(out)])
    assert rep["adj_agreement"] > 0.9
    assert rep["param_agreement"] > 0.9
    assert rep["x_mae"] < 0.05
    import json

    assert json.loads(out.read_text())["experiment"] == "int8_quantized_decode"
