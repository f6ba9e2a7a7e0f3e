"""Training integration tests (SURVEY.md §4 integration tier): loss decreases,
optimizer semantics, checkpoint save/resume."""

import jax
import numpy as np

from dxvae_tpu.models import DXVAEConfig, LossWeights
from dxvae_tpu.parallel.train import (
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

CFG = DXVAEConfig()


def _batch(dataset, n=32):
    b = dataset[:n]
    return (
        np.asarray(b.X, np.float32),
        np.asarray(b.params, np.int32),
        np.asarray(b.adj, np.float32),
    )


def test_loss_decreases(dataset):
    X, P, adj = _batch(dataset, 32)
    opt = make_optimizer(1e-3)
    state = init_train_state(jax.random.PRNGKey(0), opt, CFG)
    step = make_train_step(opt, CFG, LossWeights(), donate=False)
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(8):
        key, sub = jax.random.split(key)
        state, metrics = step(state, X, P, adj, sub)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.8, f"loss did not decrease: {losses}"
    assert all(np.isfinite(l) for l in losses)
    assert int(state.step) == 8


def test_adamw_matches_torch_step(dataset):
    """One AdamW step from identical weights/grads must match torch.optim.AdamW
    (lr 1e-3, betas (0.9, 0.999), eps 1e-8, wd 0.01 — reference model.py:375)."""
    import torch

    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(16, 8)).astype(np.float32)
    g = rng.normal(size=(16, 8)).astype(np.float32)

    # torch side
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt_t = torch.optim.AdamW([wt], lr=1e-3)
    wt.grad = torch.from_numpy(g.copy())
    opt_t.step()

    # optax side
    opt_j = make_optimizer(1e-3)
    params = {"w": np.asarray(w0)}
    st = opt_j.init(params)
    upd, _ = opt_j.update({"w": np.asarray(g)}, st, params)
    import optax

    new = optax.apply_updates(params, upd)
    np.testing.assert_allclose(np.asarray(new["w"]), wt.detach().numpy(), rtol=1e-5, atol=1e-7)


def test_eval_step_deterministic(dataset):
    X, P, adj = _batch(dataset, 8)
    opt = make_optimizer(1e-3)
    state = init_train_state(jax.random.PRNGKey(0), opt, CFG)
    ev = make_eval_step(CFG)
    m1 = ev(state.params, X, P, adj)
    m2 = ev(state.params, X, P, adj)
    assert float(m1["loss"]) == float(m2["loss"])


def test_checkpoint_roundtrip(tmp_path, dataset):
    from dxvae_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    X, P, adj = _batch(dataset, 8)
    opt = make_optimizer(1e-3)
    state = init_train_state(jax.random.PRNGKey(0), opt, CFG)
    step = make_train_step(opt, CFG, donate=False)
    state, _ = step(state, X, P, adj, jax.random.PRNGKey(1))

    ck = tmp_path / "state.npz"
    save_checkpoint(ck, state)
    template = init_train_state(jax.random.PRNGKey(42), opt, CFG)
    restored = load_checkpoint(ck, template)
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(restored.opt_state), jax.tree.leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resumed training continues identically from the restored state
    s1, m1 = step(state, X, P, adj, jax.random.PRNGKey(2))
    s2, m2 = step(restored, X, P, adj, jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)


def test_checkpoint_params_only_mode(tmp_path):
    """Reference-parity mode: weights-only checkpoints resume with fresh AdamW
    moments (model.py:388 saves state_dict only)."""
    from dxvae_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from dxvae_tpu.models import init_params

    params = init_params(jax.random.PRNGKey(3), CFG)
    ck = tmp_path / "weights.npz"
    save_checkpoint(ck, params, params_only=True)

    opt = make_optimizer(1e-3)
    template = init_train_state(jax.random.PRNGKey(4), opt, CFG)
    restored = load_checkpoint(ck, template)
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # moments untouched (zeros from fresh init)
    assert int(restored.step) == 0


def test_torch_state_dict_roundtrip():
    """export -> import across the torch naming scheme is the identity."""
    from dxvae_tpu.models import init_params
    from dxvae_tpu.utils.checkpoint import export_torch_state_dict, import_torch_state_dict

    params = jax.tree.map(np.asarray, init_params(jax.random.PRNGKey(5), CFG))
    sd = export_torch_state_dict(params)
    # 6 GRU cells x 4 tensors + 15 linear weights + 14 biases (mapper has none)
    assert len(sd) == 6 * 4 + 15 + 14
    back = import_torch_state_dict(sd, params)
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
