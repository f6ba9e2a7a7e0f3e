"""Jit-compiled, mesh-sharded training step.

One training step = forward (encode + teacher-forced ELBO) + grad + AdamW
update, compiled as a single XLA program.  The reference's optimizer loop
(model.py:374-391) semantics are preserved: AdamW with torch defaults
(betas 0.9/0.999, eps 1e-8, weight_decay 0.01 applied to every parameter),
shuffle each epoch, remainder batches dropped.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from dxvae_tpu.models import DXVAEConfig, LossWeights, forward, init_params


class TrainState(NamedTuple):
    params: dict
    opt_state: tuple
    step: jnp.ndarray  # () int32


def make_optimizer(lr: float = 1e-3, weight_decay: float = 0.01) -> optax.GradientTransformation:
    """AdamW matching torch.optim.AdamW defaults (model.py:375): decoupled
    weight decay applied to all parameters, betas (0.9, 0.999), eps 1e-8."""
    return optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay)


def init_train_state(key, optimizer, cfg: DXVAEConfig = DXVAEConfig(), params=None) -> TrainState:
    if params is None:
        params = init_params(key, cfg)
    return TrainState(params=params, opt_state=optimizer.init(params), step=jnp.zeros((), jnp.int32))


def opt_state_shardings(opt_state, param_sh, replicated_sh):
    """Sharding pytree mirroring an optax chain state: the AdamW moment
    subtrees (``mu``/``nu``) have the params' tree structure, so they inherit
    the params' shardings; every other leaf (step counts, empty states) is
    replicated.  Used to ``device_put`` a RESTORED optimizer state onto a
    tensor-parallel mesh — re-running ``optimizer.init`` there would zero the
    moments and reset the bias-correction count (the round-4 resume bug)."""

    def one(s):
        if isinstance(s, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(count=replicated_sh, mu=param_sh, nu=param_sh)
        return jax.tree.map(lambda _: replicated_sh, s)

    return tuple(one(s) for s in opt_state)


def make_train_step(
    optimizer,
    cfg: DXVAEConfig = DXVAEConfig(),
    weights: LossWeights = LossWeights(),
    donate: bool = True,
):
    """Build the jitted update: (state, X, P, adj, key) -> (state, metrics).

    The batch arrays arrive sharded on the mesh 'data' axis; all loss
    reductions are global batch means, so XLA's sharding propagation inserts
    the gradient all-reduce over ICI automatically — no explicit pmap/psum.

    The step also accepts an optional trailing ``w_kld`` — a traced scalar
    overriding ``weights.w_kld`` — so KL schedules (e.g. warmup annealing,
    docs/PERF.md "KL warmup annealing") run with zero retraces.  Omitting it
    keeps the constant-weight program.
    """

    def step_fn(state: TrainState, X, P, adj, key, w_kld=None):
        w = weights if w_kld is None else LossWeights(weights.w_env, weights.w_frq, w_kld)

        def loss_fn(params):
            total, aux = forward(
                params, X, P, adj, key=key, training=True, weights=w, cfg=cfg
            )
            return total, aux

        (total, (lx0, lxi, le, kld)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": total,
            "x0": lx0,
            "xi": lxi,
            "e": le,
            "kld": kld,
            "grad_norm": optax.global_norm(grads),
        }
        return TrainState(params, opt_state, state.step + 1), metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(cfg: DXVAEConfig = DXVAEConfig(), weights: LossWeights = LossWeights()):
    """Jitted eval-mode forward (z = posterior mean): (params, X, P, adj) -> metrics."""

    @jax.jit
    def eval_fn(params, X, P, adj):
        total, (lx0, lxi, le, kld) = forward(
            params, X, P, adj, training=False, weights=weights, cfg=cfg
        )
        return {"loss": total, "x0": lx0, "xi": lxi, "e": le, "kld": kld}

    return eval_fn
