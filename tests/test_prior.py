"""Ex-post fitted latent prior: GMM EM correctness + DXVAE surface.

The feature (models/prior.py, api.DXVAE.fit_prior/generate(prior='fitted'))
samples generation latents from a mixture fitted to the aggregate posterior
instead of N(0, I) — measured ~4x valid-topology rate (docs/PERF.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dxvae_tpu.api import DXVAE
from dxvae_tpu.models.prior import (
    GMMPrior,
    fit_gmm,
    load_prior,
    log_prob,
    sample_gmm,
    save_prior,
)


def _two_cluster_cloud(n=400, d=6, sep=8.0, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n // 2, d)) * 0.5 + sep
    b = rng.standard_normal((n // 2, d)) * 0.5 - sep
    return np.concatenate([a, b]).astype(np.float32)


def test_fit_gmm_recovers_separated_clusters():
    cloud = _two_cluster_cloud()
    prior = fit_gmm(cloud, n_components=2, n_iters=50, key=jax.random.PRNGKey(1))
    means = np.sort(np.asarray(prior.means)[:, 0])
    # one component per cluster, means near +-8, weights near 1/2
    assert abs(means[0] - (-8.0)) < 0.5 and abs(means[1] - 8.0) < 0.5
    w = np.exp(np.asarray(prior.log_weights))
    np.testing.assert_allclose(w, [0.5, 0.5], atol=0.05)
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-5)


def test_fit_gmm_likelihood_beats_standard_normal_on_offset_data():
    cloud = _two_cluster_cloud()
    prior = fit_gmm(cloud, n_components=2, n_iters=50)
    lp_fit = float(log_prob(prior, cloud).mean())
    # standard normal log-density of the same cloud
    lp_n01 = float(
        (-0.5 * (cloud**2).sum(axis=1) - 0.5 * cloud.shape[1] * np.log(2 * np.pi)).mean()
    )
    assert lp_fit > lp_n01 + 10.0  # decisively better fit, not noise


def test_sample_gmm_matches_fitted_density():
    cloud = _two_cluster_cloud()
    prior = fit_gmm(cloud, n_components=2, n_iters=50)
    z = np.asarray(sample_gmm(prior, jax.random.PRNGKey(3), 512))
    assert z.shape == (512, cloud.shape[1]) and z.dtype == np.float32
    # samples land in the clusters: every |first coord| near 8, both signs hit
    assert (np.abs(np.abs(z[:, 0]) - 8.0) < 3.0).mean() > 0.99
    assert (z[:, 0] > 0).any() and (z[:, 0] < 0).any()
    # deterministic under the same key
    z2 = np.asarray(sample_gmm(prior, jax.random.PRNGKey(3), 512))
    np.testing.assert_array_equal(z, z2)


def test_sample_gmm_temperature():
    cloud = _two_cluster_cloud()
    prior = fit_gmm(cloud, n_components=2, n_iters=50)
    # T=0 collapses every draw onto its component's mean (coverage survives:
    # both components are still drawn); T=1 is the plain fitted sample
    z0 = np.asarray(sample_gmm(prior, jax.random.PRNGKey(5), 256, temperature=0.0))
    means = np.asarray(prior.means)
    rows = {m.tobytes() for m in means}
    assert all(z.tobytes() in rows for z in z0)
    assert len({z.tobytes() for z in z0}) == 2
    # same key: T scales the offset from the mean linearly
    z1 = np.asarray(sample_gmm(prior, jax.random.PRNGKey(5), 256, temperature=1.0))
    zh = np.asarray(sample_gmm(prior, jax.random.PRNGKey(5), 256, temperature=0.5))
    np.testing.assert_allclose(zh - z0, 0.5 * (z1 - z0), rtol=1e-5, atol=1e-6)


def test_generate_temperature_surface(model):
    """temperature=0 with the standard prior decodes z=0 — every sample
    identical; the knob composes with the fitted prior."""
    G = model.generate(4, temperature=0.0)
    for i in range(1, 4):
        np.testing.assert_array_equal(G.params[0], G.params[i])
        np.testing.assert_array_equal(G.adj[0], G.adj[i])
    Gf = model.generate(4, prior="fitted", temperature=0.5)
    assert Gf.X.shape == (4, 7, 27)


def test_fit_gmm_rejects_more_components_than_samples():
    with pytest.raises(ValueError, match="exceeds"):
        fit_gmm(np.zeros((4, 3), np.float32), n_components=8)


@pytest.fixture(scope="module")
def model(dataset):
    m = DXVAE(seed=0)
    m.fit_prior(dataset[:64], n_components=4, samples_per_patch=2, n_iters=10)
    return m


def test_fit_prior_generate_surface(model):
    assert isinstance(model.prior, GMMPrior) and model.prior.n_components == 4
    G = model.generate(8, prior="fitted")
    assert G.X.shape == (8, 7, 27) and G.adj.shape == (8, 7, 7)
    # composes with topology projection: every adjacency a valid algorithm
    from dxvae_tpu.data.algorithms import ALGO_ADJ

    Gp = model.generate(8, prior="fitted", project_topology=True)
    rows = {a.tobytes() for a in ALGO_ADJ.astype(np.uint8)}
    assert all(a.tobytes() in rows for a in Gp.adj.astype(np.uint8))


def test_generate_fitted_requires_fit():
    m = DXVAE(seed=0)
    with pytest.raises(ValueError, match="fit_prior"):
        m.generate(4, prior="fitted")
    with pytest.raises(ValueError, match="unknown prior"):
        m.generate(4, prior="gaussian")


def test_prior_save_load_roundtrip(model, tmp_path):
    p = tmp_path / "prior.npz"
    model.save_prior(p)
    m2 = DXVAE(seed=0)
    loaded = m2.load_prior(p)
    for a, b in zip(loaded, model.prior):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # wrong-latent-size prior is rejected before being installed
    m3 = DXVAE(seed=0, size_Z=64)
    with pytest.raises(ValueError, match="64"):
        m3.load_prior(p)
    assert m3.prior is None


def test_fitted_prior_tracks_aggregate_posterior(model, dataset):
    """The fitted density scores aggregate-posterior samples far above what
    N(0,I) would, and above its own score of N(0,I) draws — i.e. it actually
    moved toward the encoder's latent cloud."""
    mu, std = model.encode(dataset[:64])
    mu = np.asarray(mu)
    lp_cloud = float(log_prob(model.prior, mu).mean())
    z01 = np.asarray(jax.random.normal(jax.random.PRNGKey(7), mu.shape))
    lp_n01_draws = float(log_prob(model.prior, z01).mean())
    assert lp_cloud > lp_n01_draws


def test_cli_prior_save_load_surface(model, dataset, tmp_path):
    """CLI wiring: --fitted-prior --save-prior persists the fit; later
    --prior runs load it (no dataset) and are deterministic per seed (the
    fit run itself consumes extra PRNG keys, so it is not expected to match
    the load run sample-for-sample); --save-prior without a fresh fit is
    rejected."""
    from dxvae_tpu import cli
    from dxvae_tpu.models.prior import load_prior

    p = tmp_path / "cli_prior.npz"
    G16 = dataset[:16]
    cli.generate_test(n=4, printout=False, seed=3, fit_from=G16,
                      n_components=4, save_prior_path=str(p))
    assert p.exists() and load_prior(str(p)).n_components == 4
    b = cli.generate_test(n=4, printout=False, seed=3, prior_path=str(p))
    c = cli.generate_test(n=4, printout=False, seed=3, prior_path=str(p))
    np.testing.assert_array_equal(b.params, c.params)
    np.testing.assert_array_equal(b.adj, c.adj)
    with pytest.raises(SystemExit, match="--fitted-prior"):
        cli.main(["generate", "--n", "1", "--quiet", "--save-prior", str(p)])


def test_prior_save_load_extensionless_path(tmp_path):
    """save_prior normalizes the path to .npz BEFORE saving, so a round trip
    through an extension-less path works (np.savez would otherwise write a
    different file than load_prior opens)."""
    from dxvae_tpu.models.prior import fit_gmm, load_prior, save_prior

    z = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (64, 16)))
    prior = fit_gmm(z, n_components=4, n_iters=5)
    save_prior(str(tmp_path / "gmm_noext"), prior)
    got = load_prior(str(tmp_path / "gmm_noext"))
    np.testing.assert_array_equal(np.asarray(got.means), np.asarray(prior.means))


# ---------------------------------------------------------------------------
# scripts/ab_flow_prior.py — flow-matching prior A/B harness
# ---------------------------------------------------------------------------

def _load_script(name):
    from scripts._lib import load_sibling

    return load_sibling(name)


def test_flow_fit_learns_an_offset_gaussian():
    """On a shifted Gaussian cloud the rectified flow must beat untrained
    (val MSE well under the raw target variance) and its samples must land
    on the cloud, not at N(0, I)."""
    mod = _load_script("ab_flow_prior")
    rng = np.random.default_rng(0)
    cloud = (rng.standard_normal((2048, 4)) * 0.5 + 3.0).astype(np.float32)
    flow, diag = mod.fit_flow(cloud, jax.random.PRNGKey(0), steps=400,
                              batch=256, hidden=64, depth=2, t_feats=8)
    # the FM regression target (x - eps) has variance 2/dim under whitening
    # and, for a Gaussian cloud, a LARGE irreducible conditional variance
    # (many (x, eps) pairs share each z_t) — so the val MSE floor sits near
    # ~1.6, not 0.  The learning signal is (a) beating the untrained v≡0
    # field's exact MSE of 2.0 and (b) the samples landing on the cloud.
    assert diag["val_mse"] < 1.9
    assert diag["train_mse_last"] < diag["train_mse_first"]
    z = np.asarray(mod.sample_flow(flow, jax.random.PRNGKey(1), 512,
                                   ode_steps=32))
    assert z.shape == (512, 4)
    np.testing.assert_allclose(z.mean(0), np.full(4, 3.0), atol=0.25)
    np.testing.assert_allclose(z.std(0), np.full(4, 0.5), atol=0.2)


def test_ab_flow_prior_script_micro_run(tmp_path):
    """End to end at micro scale: all three arms share one posterior cloud,
    each appends a JSON line with the generation metrics, and the aggregate
    covers every arm."""
    import json

    from dxvae_tpu.utils.checkpoint import save_checkpoint

    mod = _load_script("ab_flow_prior")
    m = DXVAE(size_H=32, size_Z=8, seed=0, unroll=False)
    ck = tmp_path / "tiny.npz"
    save_checkpoint(ck, m.params, params_only=True)
    out = tmp_path / "ab.jsonl"
    rows, agg = mod.main([
        "--checkpoint", str(ck), "--no-unroll", "--n", "16", "--spp", "1",
        "--flow-steps", "30", "--flow-batch", "64", "--flow-hidden", "32",
        "--flow-depth", "2", "--ode-steps", "8", "--gmm-k", "4",
        "--out", str(out)])
    recs = [json.loads(l) for l in out.read_text().splitlines()]
    assert [r["arm"] for r in recs] == ["standard", "gmm", "flow"]
    for r in recs:
        assert r["n"] == 16
        for col in ("valid_topology_rate", "unique_topologies",
                    "mean_nn_param_disagreement",
                    "roundtrip_topology_retained"):
            assert np.isfinite(r[col]), col
    assert np.isfinite(recs[2]["val_mse"])  # the flow's overfit guard
    assert set(agg) == {"standard", "gmm", "flow"}
    assert agg["flow"]["n_runs"] == 1


# ---------------------------------------------------------------------------
# scripts/latent_edit.py — latent attribute-direction editing harness
# ---------------------------------------------------------------------------

def test_latent_edit_direction_math():
    """Centroid-difference direction: unit norm, points low->high, and the
    projection std matches the corpus spread along it."""
    mod = _load_script("latent_edit")
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 8, size=200).astype(np.float64)
    # latents whose first coordinate carries the attribute exactly
    mu = rng.standard_normal((200, 8)) * 0.1
    mu[:, 0] = vals
    d, sigma = mod.direction(mu, vals)
    assert abs(np.linalg.norm(d) - 1.0) < 1e-9
    assert d[0] > 0.99  # recovered the attribute axis
    assert abs(sigma - (mu @ d).std()) < 1e-9
    with pytest.raises(ValueError):
        mod.direction(np.zeros((10, 4)), np.zeros(10))


def test_latent_edit_script_micro_run(tmp_path, dataset):
    """End to end at micro scale on CPU: one JSON line per attribute with
    the per-alpha rows and the verdict fields, churn anchored at alpha=0."""
    import json

    from dxvae_tpu.utils.checkpoint import save_checkpoint

    mod = _load_script("latent_edit")
    m = DXVAE(size_H=32, size_Z=8, seed=0, unroll=False)
    ck = tmp_path / "tiny.npz"
    save_checkpoint(ck, m.params, params_only=True)
    out = tmp_path / "edit.jsonl"
    reports = mod.main([
        "--checkpoint", str(ck), "--no-unroll", "--n", "8",
        "--alphas=-1,0,1", "--out", str(out)])
    rows = [json.loads(l) for l in out.read_text().splitlines()]
    assert [r["attr"] for r in rows] == ["feedback", "op_level"]
    for r in rows:
        assert r["n"] == 8 and r["sigma"] > 0
        assert [s["alpha"] for s in r["steps"]] == [-1.0, 0.0, 1.0]
        zero = r["steps"][1]
        assert zero["off_target_churn"] == 0.0
        assert zero["topology_retained"] == 1.0
        for s in r["steps"]:
            assert np.isfinite(s["target_mean"])
        assert isinstance(r["monotonic"], bool)
        assert isinstance(r["directional"], bool)
        assert r["endpoint_delta"] == pytest.approx(
            r["steps"][-1]["target_mean"] - r["steps"][0]["target_mean"],
            abs=2e-3)
    assert reports[0]["attr"] == "feedback"


def test_latent_edit_orthogonalize(tmp_path):
    """--orthogonalize removes the other attributes' directions: the report
    records the raw cosine and the edit still anchors churn at alpha=0."""
    import json

    from dxvae_tpu.utils.checkpoint import save_checkpoint

    mod = _load_script("latent_edit")
    m = DXVAE(size_H=32, size_Z=8, seed=0, unroll=False)
    ck = tmp_path / "tiny.npz"
    save_checkpoint(ck, m.params, params_only=True)
    out = tmp_path / "edit.jsonl"
    (rep,) = mod.main([
        "--checkpoint", str(ck), "--no-unroll", "--n", "4",
        "--attrs", "feedback", "--alphas=-1,0,1", "--orthogonalize",
        "--out", str(out)])
    assert rep["orthogonalized"] is True
    assert set(rep["cos_vs_others"]) == {"op_level"}
    assert abs(rep["cos_vs_others"]["op_level"]) <= 1.0
    assert rep["steps"][1]["off_target_churn"] == 0.0
    assert json.loads(out.read_text().splitlines()[0])["attr"] == "feedback"


def test_latent_edit_export_syx(tmp_path):
    """--export-syx writes one playable padded 32-voice bank per alpha step,
    framing-valid under the requested real checksum, and the report lists
    the paths."""
    from dxvae_tpu.data.sysex import read_syx
    from dxvae_tpu.utils.checkpoint import save_checkpoint

    mod = _load_script("latent_edit")
    m = DXVAE(size_H=32, size_Z=8, seed=0, unroll=False)
    ck = tmp_path / "tiny.npz"
    save_checkpoint(ck, m.params, params_only=True)
    banks = tmp_path / "banks"
    (rep,) = mod.main([
        "--checkpoint", str(ck), "--no-unroll", "--n", "4",
        "--attrs", "feedback", "--alphas=-1,0,1",
        "--export-syx", str(banks), "--checksum", "computed",
        "--out", str(tmp_path / "edit.jsonl")])
    names = sorted(p.name for p in banks.iterdir())
    assert names == ["feedback_+0.0.syx", "feedback_+1.0.syx",
                     "feedback_-1.0.syx"]
    assert rep["exported"] and len(rep["exported"]) == 3
    for p in banks.iterdir():
        assert p.stat().st_size == 4104
        voices = read_syx(p, verify_checksum=True)  # computed checksum holds
        assert voices.shape == (32, 128)
        # n=4 < 32: the pad repeats the last patch
        assert (voices[4:] == voices[3]).all()
