"""DX-VAE core model: pure-function JAX implementation.

Re-design of the reference ``DXVAE(nn.Module)`` (model.py:10-391) for TPU:

* **No graph objects, no mutable state.**  The reference's per-sample DGL
  queries and Python list-of-lists hidden container (model.py:20,83-85,
  164-196) become dense masked tensor math over ``(B, 7, H)`` arrays — legal
  because the graph size is a compile-time constant (7 nodes).
* **Static unroll.**  The forward pass is a fixed cadence of 41 propagate
  steps (7 encode + 34 decode, SURVEY.md §3.1); each is a handful of fused
  matmuls + VPU work under one ``jit``, instead of 41 Python-dispatched
  GRU calls.
* **Identical numerics.**  Gate order, window masking, the gated-sum
  aggregator, quantizer grids, loss reductions and the KL(p||q) direction all
  match the reference so a torch checkpoint imports weight-for-weight.

Model recurrence (matching model.py:151-198):
  - encode visits nodes 6 -> 0; node v aggregates messages from already-visited
    nodes x > v that are its predecessors (forth) / successors (back);
  - decode visits nodes 1 -> 6 autoregressively; node vi's hidden state is
    refreshed after the node is added, after its self-loop decision, and after
    each edge-pair decision against vj = vi-1 .. 0 (vi + 2 refreshes total);
  - the root node uses a separate GRU on the first 23 feature dims; every
    non-root update applies a combiner GRU then a self-loop GRU whose input is
    the node features iff the node currently has a feedback self-loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dxvae_tpu.models import layers as L
from dxvae_tpu.models.quantize import reg_x0, reg_xi
from dxvae_tpu.ops.propagate import (
    PropState,
    gated_aggregate,
    pack_gate_mapper,
    slot_contribution,
)


class DXVAEConfig(NamedTuple):
    """Hyperparameters (reference ctor defaults, model.py:11).

    ``unroll``: execution strategy for the decoder's edge cadence (the 6-node
    loop is always Python-unrolled with list-of-arrays state).  False
    (default) runs each node's edge steps as a branch-free ``lax.scan`` —
    smaller XLA graph, faster compiles, and a standard scan VJP.  True inlines
    the 21 edge steps too, letting XLA see the whole graph (best step fusion,
    slowest compile).  Both paths are tested to agree exactly.
    """

    n_nodes: int = 7
    n_params: int = 21
    size_x: int = 27
    size_x0: int = 23
    size_h: int = 512
    size_z: int = 128
    strict_parity: bool = True
    unroll: bool = False
    # rematerialize the loss scan body on the backward pass (jax.checkpoint):
    # trades one extra forward per step for not storing per-step activations —
    # relevant for very large batches
    remat: bool = False
    # dropout rate on the four decoder MLP heads (h_to_x0 / h_to_x /
    # h_to_edge_self / h_to_edge), applied after each hidden ReLU during
    # training-mode loss only (decode/generate and eval-mode losses never
    # drop).  0.0 (default) is the exact reference-parity path.  NOTE: the
    # two execution strategies draw different dropout masks, so
    # test_scan_equals_unrolled only holds at 0.0 — this is a training
    # regularizer, not a parity path.
    head_dropout: float = 0.0
    # "float32" (reference-parity numerics); "bfloat16" (everything in the
    # recurrence — weights, state, gates — runs bf16 on the MXU; quantizer
    # grids, thresholds, losses, posterior stay f32); or "bfloat16_mixed"
    # (bf16 weights/matmul flops but float32 activation islands — the GRU
    # hidden state, gates and aggregations accumulate in f32 — closing the
    # bf16 convergence gap at most of its speed, docs/PERF.md)
    compute_dtype: str = "float32"
    # "int8" quantizes every DECODE-side matmul (weights per-output-channel
    # symmetric int8, activations dynamically per-row; int32 MXU
    # accumulation — ops/matmul.QuantizedWeight).  Non-parity, inference/
    # serving only: encode and the training loss never quantize.  In AOT
    # bundles the weight quantization constant-folds to baked int8 tensors.
    # None (default) = exact decode path.  Measured A/B: docs/PERF.md
    # "int8 quantized decode".
    quantize_decode: str | None = None


class LossWeights(NamedTuple):
    """Loss weights (reference defaults, model.py:270)."""

    w_env: float = 2.0
    w_frq: float = 5.0
    w_kld: float = 0.01


# --------------------------------------------------------------------------- #
# parameters
# --------------------------------------------------------------------------- #

def init_params(key, cfg: DXVAEConfig = DXVAEConfig()) -> dict:
    """Initialize the full parameter pytree (12,083,541 params at defaults,
    matching the reference layer dims, model.py:23-72)."""
    h, z, x, x0 = cfg.size_h, cfg.size_z, cfg.size_x, cfg.size_x0
    k = iter(jax.random.split(key, 16))
    return {
        # encoder (model.py:24-30)
        "enc_combiner": L.gru_init(next(k), x, h),
        "enc_looper": L.gru_init(next(k), x, h),
        "enc_rooter": L.gru_init(next(k), x0, h),
        "h_to_mu": L.linear_init(next(k), h, z),
        "h_to_std": L.linear_init(next(k), h, z),  # + softplus at apply time
        # decoder (model.py:33-63)
        "dec_combiner": L.gru_init(next(k), x, h),
        "dec_looper": L.gru_init(next(k), x, h),
        "dec_rooter": L.gru_init(next(k), x0, h),
        "z_to_h": L.linear_init(next(k), z, h),  # + tanh
        "h_to_x0": L.mlp_init(next(k), [h, 2 * h, 2 * h, x0 + 32]),
        "h_to_x": L.mlp_init(next(k), [h, 2 * h, 2 * h, x]),
        "h_to_edge_self": L.mlp_init(next(k), [h, 2 * h, 1]),
        "h_to_edge": L.mlp_init(next(k), [2 * h, 4 * h, 2]),
        # gated-sum aggregator (model.py:66-72); mapper bias disabled so
        # zero-padded window slots map to zero
        "gate": L.linear_init(next(k), 2 * h, h),
        "mapper": L.linear_init(next(k), 2 * h, h, bias=False),
    }


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def _w_pack(params):
    return pack_gate_mapper(params["gate"]["w"], params["mapper"]["w"])


def _dtypes(cfg: DXVAEConfig, ref_dtype):
    """(compute dtype, output/loss dtype) for this run.

    float32 mode preserves the caller's dtype (so float64 parity runs stay
    float64 end to end); bfloat16 mode computes the recurrence in bf16 and
    keeps outputs/losses in float32; bfloat16_mixed keeps all *activations*
    (GRU state, gates, aggregations) in the caller's dtype and only the
    weights/matmuls in bf16 (see :func:`layers.matmul_wT`) — near-f32
    convergence at bf16 matmul rates.
    """
    if cfg.compute_dtype == "bfloat16":
        return jnp.bfloat16, jnp.float32
    if cfg.compute_dtype not in ("float32", "bfloat16_mixed"):
        raise ValueError(
            f"unknown compute_dtype {cfg.compute_dtype!r}; expected 'float32', "
            "'bfloat16', or 'bfloat16_mixed'"
        )
    return ref_dtype, ref_dtype


def _compute_params(params, cfg: DXVAEConfig):
    """Cast the parameter pytree to the compute dtype (no-op in f32 mode).
    Master params keep their dtype; under autodiff the cast transposes to a
    cast-back, giving full-precision gradients — standard mixed precision.

    bfloat16_mixed casts the matrices except the GRU recurrence matrices
    ``w_hh``; biases stay full precision too.  Measured (docs/PERF.md
    precision study): w_hh rounding is essentially the *entire* bf16
    convergence gap — keeping just those six (H, 3H) matrices f32 trains to
    within ~1% of full f32 at ~1.3x its speed, while rounding them costs 27%+
    final loss."""
    # pre-quantized int8 nodes pass through untouched (their int8/scale
    # leaves must never be cast; quantization already fixed their precision)
    _is_q = lambda a: isinstance(a, L.QuantizedWeight)
    if cfg.compute_dtype == "bfloat16":
        return jax.tree.map(
            lambda a: a if _is_q(a) else a.astype(jnp.bfloat16),
            params, is_leaf=_is_q)
    if cfg.compute_dtype == "bfloat16_mixed":

        def cast(path, a):
            if _is_q(a):
                return a
            name = getattr(path[-1], "key", None)
            if a.ndim >= 2 and name != "w_hh":
                return a.astype(jnp.bfloat16)
            return a

        return jax.tree_util.tree_map_with_path(cast, params, is_leaf=_is_q)
    return params


# --------------------------------------------------------------------------- #
# execution strategies
# --------------------------------------------------------------------------- #
# The decoder's 33 refreshes are a static cadence: for vi in 1..6 —
#   NODE(vi): predict/teacher-force node vi's features, propagate
#   SELF(vi): self-loop decision, propagate
#   EDGE(vi, vj = vi-1..0): in/out edge pair decision, propagate
# Both execution strategies Python-unroll the 6-node loop (NODE/SELF inline,
# list-of-arrays state: static indexing, no dynamic-update-slice traffic) and
# differ only in the uniform EDGE cadence: ``unroll=True`` inlines the 21 edge
# steps (maximum fusion, slowest compile); ``unroll=False`` runs each node's
# edge steps as one lax.scan with the per-step inputs (cached projections,
# edge-head halves, targets) pre-stacked as scan xs — a branch-free body with
# a standard scan VJP.  (An earlier design ran all 33 steps as one scan with
# lax.switch over the step type; its backward serialized pathologically —
# 6.7x slower training — because every branch contributes residuals at every
# step.  docs/PERF.md "Scan-path restructure".)


def _edge_head_split(params):
    """Split the edge head's first layer for the cached-Hj optimization.

    ``h_to_edge`` scores ``cat(Hi, Hj) @ W1.T + b1`` (model.py:59-63); since
    ``Hj`` is frozen once node j's cadence finishes, its half of the layer-0
    product is precomputed once per node (6 matmuls) instead of at every edge
    step (21): cat(Hi,Hj) @ W1.T == Hi @ W1a.T + Hj @ W1b.T.
    """
    w1 = params["h_to_edge"][0]["w"]  # (4H, 2H)
    size_h = w1.shape[1] // 2
    return w1[:, :size_h], w1[:, size_h:], params["h_to_edge"][0]["b"]


def _quantize_decode_params(params):
    """int8-wrap every decode-side matmul weight (``cfg.quantize_decode``).

    Encoder cells, the posterior heads and the aggregator's gate/mapper (only
    consumed through the packed ``wp``, quantized by the caller) are left
    untouched; ``h_to_edge[0]`` is consumed via the w1a/w1b split, also
    quantized at the split site.  Biases stay f32 — dequantized activations
    add them at full precision.
    """

    def q(w):
        # idempotent: callers may pre-quantize the tree OUTSIDE a loop/jit
        # (bench.py hoists it off the per-iteration path) and decode re-runs
        # this transform harmlessly
        return w if isinstance(w, L.QuantizedWeight) else L.quantize_weight(w)

    def qlin(lin):
        lin = dict(lin)
        lin["w"] = q(lin["w"])
        return lin

    p = dict(params)
    for cell in ("dec_combiner", "dec_looper", "dec_rooter"):
        c = dict(p[cell])
        c["w_ih"] = q(c["w_ih"])
        c["w_hh"] = q(c["w_hh"])
        p[cell] = c
    p["z_to_h"] = qlin(p["z_to_h"])
    for head in ("h_to_x0", "h_to_x", "h_to_edge_self"):
        p[head] = [qlin(layer) for layer in p[head]]
    p["h_to_edge"] = [p["h_to_edge"][0], qlin(p["h_to_edge"][1])]
    return p


def _edge_logits(params, h_vi, eh_vj, w1a, b1, drop=None):
    l0 = jax.nn.relu(L.matmul_wT(h_vi, w1a) + eh_vj + b1)
    if drop is not None:
        l0 = L.dropout(l0, *drop)
    return L.linear(params["h_to_edge"][1], l0)


# --------------------------------------------------------------------------- #
# encoder
# --------------------------------------------------------------------------- #

def encode(params, X, adj, cfg: DXVAEConfig = DXVAEConfig()):
    """Asynchronous message-passing encoder (model.py:200-212).

    ``X (B,7,27)``, ``adj (B,7,7)`` -> posterior ``(mu, std)`` each ``(B, Z)``.
    Visits nodes 6 -> 0; message windows are restricted to already-visited
    (higher-index) nodes.  Returns the final PropState too, because the
    reference's ``loss()`` relies on ``encode`` having populated the hidden
    container (model.py:200-201 precondition; harmless here — decode windows
    only read nodes it has already overwritten).
    """
    n, h = cfg.n_nodes, cfg.size_h
    b = X.shape[0]
    cdt, odt = _dtypes(cfg, X.dtype)
    full = params
    params = _compute_params(params, cfg)
    X = X.astype(cdt)
    adj = adj.astype(cdt)
    st = PropState.zeros(b, n, h, X.dtype)
    wp = _w_pack(params)
    gate_b = params["gate"]["b"]
    node_ids = np.arange(n)

    if cfg.unroll:
        # list-of-arrays state: node indices are static, so reads/writes are
        # plain Python indexing — zero dynamic-update-slice / copy ops
        hid = [None] * n
        proj = [None] * n
        for v in range(n - 1, -1, -1):
            if v == n - 1:
                # leaf starts from zero H_init (model.py:203-204); the window
                # above it is empty either way
                h_in = jnp.zeros((b, h), X.dtype)
            else:
                # gated sum over the visited window x > v, one slot at a time
                # (identical math to the stacked form; zero-indicator slots
                # contribute exactly zero through the bias-free mapper)
                h_in = sum(
                    slot_contribution(proj[x], adj[:, x, v], adj[:, v, x], gate_b)
                    for x in range(v + 1, n)
                )
            if v == 0:
                hv = L.gru(params["enc_rooter"], X[:, 0, : cfg.size_x0], h_in)
            else:
                hv = L.gru(params["enc_combiner"], X[:, v], h_in)
                x_loop = X[:, v] * adj[:, v, v][:, None]  # features iff self-loop
                hv = L.gru(params["enc_looper"], x_loop, hv)
            hid[v] = hv
            proj[v] = L.matmul_wT(hv, wp).reshape(b, 4, h)
        st = PropState(
            hidden=jnp.stack(hid, axis=1), proj=jnp.stack(proj, axis=1)
        )
    else:
        # scan over v = n-1 .. 1.  The leaf's "given zero H_init" is the
        # generic path: its window mask (ids > n-1) is empty and the bias-free
        # mapper maps all-zero slots to zero, so H_in == 0 exactly.
        ids = jnp.asarray(node_ids)

        def body(st, v):
            win = (ids > v).astype(X.dtype)
            col = jax.lax.dynamic_index_in_dim(adj, v, axis=2, keepdims=False)  # in-edges x->v
            row = jax.lax.dynamic_index_in_dim(adj, v, axis=1, keepdims=False)  # out-edges v->x
            xv = jax.lax.dynamic_index_in_dim(X, v, axis=1, keepdims=False)
            s = jax.lax.dynamic_index_in_dim(row, v, axis=1, keepdims=False)  # adj[:, v, v]
            h_in = gated_aggregate(st, col * win, row * win, gate_b)
            hv = L.gru(params["enc_combiner"], xv, h_in)
            hv = L.gru(params["enc_looper"], xv * s[:, None], hv)
            return st.write(v, hv, wp), None

        vs = jnp.arange(n - 1, 0, -1, dtype=jnp.int32)
        st, _ = jax.lax.scan(body, st, vs)
        # root (v = 0): separate GRU on the first size_x0 feature dims
        win0 = jnp.asarray((node_ids > 0).astype(np.float32)).astype(X.dtype)
        h_in = gated_aggregate(st, adj[:, :, 0] * win0, adj[:, 0, :] * win0, gate_b)
        hv = L.gru(params["enc_rooter"], X[:, 0, : cfg.size_x0], h_in)
        st = st.write(0, hv, wp)

    # posterior head in full precision regardless of compute dtype (KL /
    # rsample precision matters)
    h0 = st.hidden[:, 0].astype(odt)
    mu = L.linear(full["h_to_mu"], h0)
    std = jax.nn.softplus(L.linear(full["h_to_std"], h0))
    return mu, std, st


def _propagate_list(params, x_vi, h_in, self_loop, cdt):
    """List-state decode propagate: returns the refreshed hidden state only.

    Projection-cache rows are NOT computed here: a node's cached projections
    (and its edge-head half) are only ever read after the node's whole refresh
    cadence finishes, so callers compute them lazily — once per node instead
    of at all 33 refreshes — via :func:`_node_caches`."""
    x_vi = x_vi.astype(cdt)
    hv = L.gru(params["dec_combiner"], x_vi, h_in.astype(cdt))
    hv = L.gru(params["dec_looper"], x_vi * self_loop.astype(cdt)[:, None], hv)
    return hv


def _node_caches(h, w1b, wp):
    """Per-node cache computation for a *finalized* hidden state:
    (edge-head half, projection rows).  Computed once per node — a node's
    caches are only ever read after its whole refresh cadence finishes."""
    return L.matmul_wT(h, w1b), L.matmul_wT(h, wp).reshape(h.shape[0], 4, -1)


# --------------------------------------------------------------------------- #
# autoregressive generation decoder
# --------------------------------------------------------------------------- #

def decode(params, z, cfg: DXVAEConfig = DXVAEConfig(), init_state: PropState | None = None,
           forced_adj=None):
    """Autoregressive node-and-edge decoder (model.py:214-253).

    ``z (B, Z)`` -> ``(X (B,7,27), params_int (B,7,21), adj (B,7,7))``.
    Deterministic given z (threshold/argmax decisions).  Generated edges feed
    back into message passing within the same step: the adjacency is carried
    as a dense mask and every edge decision is a masked update.

    ``forced_adj (B,7,7)`` (beyond-reference): teacher-force the topology —
    every self-loop/edge decision is read from ``forced_adj`` instead of the
    edge heads (whose matmuls are skipped entirely), while node features stay
    autoregressive.  Intermediate hidden refreshes are skipped too — they are
    only ever read by the skipped edge heads, so one refresh per node with
    the fully-accumulated window H_in produces byte-identical output to the
    free decode's full vi+2 cadence with the same decisions: forcing the
    adjacency a free decode would have produced returns exactly that decode's
    output (tested).  This is the decode-side mirror of the loss path's
    teacher forcing (model.py:330-363) and powers algorithm-conditional
    generation (``DXVAE.generate(alg=...)``).
    """
    n, h = cfg.n_nodes, cfg.size_h
    b = z.shape[0]
    cdt, dt = _dtypes(cfg, z.dtype)  # generated X/params/adj in full precision
    params = _compute_params(params, cfg)
    wp = _w_pack(params)
    w1a, w1b, b1 = _edge_head_split(params)
    if cfg.quantize_decode == "int8":
        # wrap every decode-side matmul weight (incl. the derived packed
        # aggregator and split edge-head matrices) as int8; matmul_wT
        # dispatches on the type.  Biases, grids, thresholds stay f32.
        params = _quantize_decode_params(params)
        wp, w1a, w1b = map(L.quantize_weight, (wp, w1a, w1b))
    elif cfg.quantize_decode is not None:
        raise ValueError(f"unknown quantize_decode {cfg.quantize_decode!r}")

    del init_state  # decode never reads pre-existing node state (windows only
    # cover nodes it has already rewritten), so a fresh zero state is identical

    h_init = jnp.tanh(L.linear(params["z_to_h"], z.astype(cdt)))
    x0_plus = L.mlp(params["h_to_x0"], h_init).astype(dt)
    x0, p0 = reg_x0(x0_plus, cfg.size_x, cfg.n_params)
    h0 = L.gru(params["dec_rooter"], x0[:, : cfg.size_x0].astype(cdt), h_init)

    zero_hin = jnp.zeros((b, h), cdt)
    no_loop = jnp.zeros((b,), dt)
    gate_b = params["gate"]["b"]
    forced = forced_adj is not None
    if forced:
        forced_adj = forced_adj.astype(dt)

    # list-of-arrays state (static node indices, no dynamic-update-slice);
    # per-node caches (edge-head half + projections) computed lazily —
    # once per finalized node, fused into one matmul (_node_caches)
    hid_prev = h0
    ehl: list = []
    projl: list = []
    Xl = [x0]
    Pl = [p0]
    adj_self = [forced_adj[:, 0, 0] if forced else jnp.zeros((b,), dt)]
    adj_in = [[None] * n for _ in range(n)]   # adj_in[j][i] = edge j -> i
    for vi in range(1, n):
        # node vi-1's hidden is now final: compute its caches once
        # (the edge-head half is only read by the skipped edge heads when
        # the topology is forced — don't compute it then)
        if forced:
            proj_row = L.matmul_wT(hid_prev, wp).reshape(b, 4, -1)
            eh_row = None
        else:
            eh_row, proj_row = _node_caches(hid_prev, w1b, wp)
        ehl.append(eh_row)
        projl.append(proj_row)
        # predict node vi's features from node vi-1's (final) hidden state
        xi_raw = L.mlp(params["h_to_x"], hid_prev).astype(dt)
        xi, pi = reg_xi(xi_raw, cfg.strict_parity, cfg.n_params)
        Xl.append(xi)
        Pl.append(pi)

        if forced:
            # every intermediate refresh of the cadence is DEAD here: an
            # intermediate hidden is only ever read by the edge heads, which
            # forced mode skips — so accumulate the whole window's H_in
            # (same vi-1..0 float order as the free path) and refresh ONCE.
            # Byte-identical to running the full cadence with the same
            # decisions (the equivalence test pins it) at ~1/(vi+2) of the
            # GRU matmuls.
            s = forced_adj[:, vi, vi]
            adj_self.append(s)
            h_acc = zero_hin
            for vj in range(vi - 1, -1, -1):
                e_in = forced_adj[:, vj, vi]   # edge vj -> vi
                e_out = forced_adj[:, vi, vj]  # edge vi -> vj
                adj_in[vj][vi] = e_in
                adj_in[vi][vj] = e_out
                h_acc = h_acc + slot_contribution(
                    projl[vj], e_in.astype(cdt), e_out.astype(cdt), gate_b
                )
            hid_prev = _propagate_list(params, xi, h_acc, s, cdt)
            continue

        # propagate with no incident edges yet (H_in = 0)
        hv = _propagate_list(params, xi, zero_hin, no_loop, cdt)

        # self-loop decision, then re-propagate (model.py:236-240);
        # window edges still absent, so H_in stays 0
        s_logit = L.mlp(params["h_to_edge_self"], hv).astype(dt)
        s = (jax.nn.sigmoid(s_logit)[:, 0] > 0.5).astype(dt)
        adj_self.append(s)
        hv = _propagate_list(params, xi, zero_hin, s, cdt)

        # in/out edge decisions vs vj = vi-1 .. 0; each decision enables
        # exactly one window slot, so H_in accumulates incrementally
        order = list(range(vi - 1, -1, -1))
        if cfg.unroll:
            h_acc = zero_hin
            for vj in order:
                e = _edge_logits(params, hv, ehl[vj], w1a, b1).astype(dt)
                e_in = (jax.nn.sigmoid(e[:, 0]) > 0.5).astype(dt)
                e_out = (jax.nn.sigmoid(e[:, 1]) > 0.5).astype(dt)
                adj_in[vj][vi] = e_in
                adj_in[vi][vj] = e_out
                h_acc = h_acc + slot_contribution(
                    projl[vj], e_in.astype(cdt), e_out.astype(cdt), gate_b
                )
                hv = _propagate_list(params, xi, h_acc, s, cdt)
        else:
            # branch-free edge scan: per-step inputs pre-stacked as xs
            xs = (
                jnp.stack([ehl[j] for j in order]),
                jnp.stack([projl[j] for j in order]),
            )

            def edge_body(carry, x, xi=xi, s=s):
                hv, h_acc = carry
                eh_vj, proj_vj = x
                e = _edge_logits(params, hv, eh_vj, w1a, b1).astype(dt)
                e_in = (jax.nn.sigmoid(e[:, 0]) > 0.5).astype(dt)
                e_out = (jax.nn.sigmoid(e[:, 1]) > 0.5).astype(dt)
                h_acc = h_acc + slot_contribution(
                    proj_vj, e_in.astype(cdt), e_out.astype(cdt), gate_b
                )
                hv = _propagate_list(params, xi, h_acc, s, cdt)
                return (hv, h_acc), (e_in, e_out)

            (hv, _), (e_ins, e_outs) = jax.lax.scan(edge_body, (hv, zero_hin), xs)
            for k, vj in enumerate(order):
                adj_in[vj][vi] = e_ins[k]
                adj_in[vi][vj] = e_outs[k]
        hid_prev = hv

    # assemble dense outputs once
    X = jnp.stack(Xl, axis=1)
    P = jnp.stack(Pl, axis=1)
    rows = []
    for i in range(n):
        # every off-diagonal pair {a,b} was written exactly once (both
        # directions) at vi=max(a,b), so the matrix is fully populated
        cols = [adj_self[i] if j == i else adj_in[i][j] for j in range(n)]
        rows.append(jnp.stack(cols, axis=1))
    adj = jnp.stack(rows, axis=1)
    return X, P, adj


def generate(params, key, n: int, cfg: DXVAEConfig = DXVAEConfig()):
    """Prior sampling: z ~ N(0, I) -> decode (model.py:264-268)."""
    z = jax.random.normal(key, (n, cfg.size_z), jnp.float32)
    return decode(params, z, cfg)


def alg_head_logits(params, z, cfg: DXVAEConfig = DXVAEConfig()):
    """Raw 32-wide algorithm logits of the global head for latents ``z``.

    Recomputes exactly the slice ``reg_x0`` argmaxes over (quantize.py:59,
    the last 32 dims of the x0 head) — used as tie-break scores for
    topology projection (data/algorithms.py:project_topology) without
    changing ``decode``'s parity-critical return signature."""
    cdt, dt = _dtypes(cfg, z.dtype)
    params = _compute_params(params, cfg)
    h_init = jnp.tanh(L.linear(params["z_to_h"], z.astype(cdt)))
    return L.mlp(params["h_to_x0"], h_init).astype(dt)[:, cfg.size_x0:]


# --------------------------------------------------------------------------- #
# teacher-forced ELBO loss
# --------------------------------------------------------------------------- #

def elbo_loss(
    params,
    mu,
    std,
    X_true,
    params_true,
    adj_true,
    key=None,
    training: bool = True,
    weights: LossWeights = LossWeights(),
    cfg: DXVAEConfig = DXVAEConfig(),
    init_state: PropState | None = None,
):
    """Teacher-forced ELBO (model.py:270-367), identical decomposition:

    loss = loss_X0 + loss_Xi + loss_E + w_kld * KL(p || q)

    with the reference's (deliberate) reduction mix — feature-summed
    batch-means for MSE/BCE slices, plain batch-means for CE and scalar BCEs —
    and the reversed KL direction KL(p||q) (model.py:365, quirk kept because
    it affects trained loss values).

    Mirrors the decoder's propagate cadence exactly: the staged edge masks at
    each refresh are closed-form slices of ``adj_true`` (no graph mutation
    needed): after the self-loop refresh, node vi sees edges to x in [vj, vi)
    after each vj step.
    """
    n = cfg.n_nodes
    b = X_true.shape[0]
    cdt, dt = _dtypes(cfg, X_true.dtype)  # losses/targets in full precision
    X_true = X_true.astype(dt)
    w_env, w_frq, w_kld = weights.w_env, weights.w_frq, weights.w_kld
    params = _compute_params(params, cfg)
    wp = _w_pack(params)

    _drop = lambda: None  # head-dropout site: None = reference-parity path
    if training:
        if key is None:
            raise ValueError("training=True requires a PRNG key for the reparameterized sample")
        if cfg.head_dropout > 0.0:
            # one subkey per head call-site (34 = the unrolled cadence's
            # count; the batched path consumes a prefix).  Split BEFORE the
            # rsample so dropout != 0 is a distinct-but-deterministic stream
            key, dkey = jax.random.split(key)
            _dkeys = iter(jax.random.split(dkey, 34))
            _drop = lambda: (cfg.head_dropout, next(_dkeys))
        z = mu + std * jax.random.normal(key, mu.shape, mu.dtype)
    else:
        z = mu

    h_init = jnp.tanh(L.linear(params["z_to_h"], z.astype(cdt)))
    x0_pred = L.mlp(params["h_to_x0"], h_init, drop=_drop()).astype(dt)  # (B, 55) raw head output

    del init_state  # the cadence never reads pre-existing node state; fresh
    # zero state is identical (and lets encode's stacked state be DCE'd)
    # teacher-force X0_true, compute H0 with given H_in = h_init (model.py:291-297)
    x0_true = X_true[:, 0, :]
    h0 = L.gru(params["dec_rooter"], x0_true[:, : cfg.size_x0].astype(cdt), h_init)

    p0_true = params_true[:, 0, :]
    mse = lambda a, t: (a - t) ** 2

    # ---- loss_X0 (model.py:300-308)
    loss_x0 = (
        mse(x0_pred[:, :8] * w_env, x0_true[:, :8] * w_env).mean(0).sum()
        + mse(x0_pred[:, 8] * w_frq, x0_true[:, 8] * w_frq).mean()
        + mse(x0_pred[:, 9:15], x0_true[:, 9:15]).mean(0).sum()
        + L.bce_with_logits(x0_pred[:, 15:17], x0_true[:, 15:17]).mean(0).sum()
        + L.cross_entropy(x0_pred[:, 17:23], p0_true[:, 17]).mean()
        + L.cross_entropy(x0_pred[:, 23:], p0_true[:, 18]).mean()
    )

    loss_xi = jnp.zeros((), dt)
    loss_e = jnp.zeros((), dt)

    # Teacher forcing breaks the decoder's recurrence WITHIN a node's refresh
    # cadence: every refresh of node vi consumes H_in built purely from
    # teacher-forced edges and the (frozen) cached projections of earlier
    # nodes — never from vi's own evolving hidden state.  So (unroll=False,
    # the default) the vi+2 refreshes are computed as ONE batched GRU
    # evaluation over a (B, vi+2) step axis (H_in per refresh = a prefix sum
    # of slot contributions), and all vi edge logits batch likewise —
    # sequential matmul depth per forward drops from 40 propagates to
    # 7 encode steps + 6 batched node groups.  (An earlier lax.scan-with-
    # lax.switch formulation trained at 26k patches/sec because of its
    # pathological backward; the batched form measures 127k.)
    #
    # unroll=True instead inlines the sequential 33-step cadence — measured
    # fastest for training (185k patches/sec at batch 1024 bf16): XLA
    # pipelines the small steps and CSEs the per-node xi @ W_ih products,
    # while the batched form pays for its (B, S, H) intermediates.  Both are
    # tested equal (test_scan_equals_unrolled) and f64-verified against the
    # reference executing verbatim.  docs/PERF.md "Loss execution strategies".
    w1a, w1b, b1 = _edge_head_split(params)
    hid_prev = h0
    ehl: list = []
    projl: list = []
    gate_b = params["gate"]["b"]
    no_loop = jnp.zeros((b,), dt)
    zero_hin = jnp.zeros((b, cfg.size_h), cdt)

    def node_cadence(xi_true, s_true, tins, touts, projs, ehs, dks=None):
        """All vi+2 refreshes + self/edge logits of one node, batched.

        Refresh r=0 (NODE) and r=1 (SELF) see no incident window edges
        (H_in = 0); refresh r=2+k sees the teacher-forced edges vs
        vj = vi-1 .. vi-1-k (a prefix sum).  The self logit reads refresh 0;
        the edge logit vs the k-th vj reads refresh k+1; refresh vi+1 is the
        node's final hidden state (model.py:311-363 cadence).

        ``dks``: optional pair of dropout keys (self head, edge head) —
        passed as traced args so a remat'd recompute replays the same masks.
        """
        b_, v = tins.shape
        s = v + 2
        c = slot_contribution(projs, tins.astype(cdt), touts.astype(cdt), gate_b)
        h_acc = jnp.cumsum(c, axis=1)                                  # (B, vi, H)
        h_in = jnp.concatenate(
            [jnp.zeros((b_, 2, cfg.size_h), cdt), h_acc], axis=1
        )                                                              # (B, S, H)
        s_seq = jnp.concatenate(
            [jnp.zeros((b_, 1), dt), jnp.broadcast_to(s_true[:, None], (b_, s - 1))],
            axis=1,
        )
        x_seq = jnp.broadcast_to(xi_true[:, None, :], (b_, s, xi_true.shape[-1]))
        hv_all = _propagate_list(
            params,
            x_seq.reshape(b_ * s, -1),
            h_in.reshape(b_ * s, -1),
            s_seq.reshape(b_ * s),
            cdt,
        ).reshape(b_, s, cfg.size_h)
        d_self = d_edge = None
        if dks is not None:
            d_self = (cfg.head_dropout, dks[0])
            d_edge = (cfg.head_dropout, dks[1])
        self_logit = L.mlp(params["h_to_edge_self"], hv_all[:, 0], drop=d_self).astype(dt)
        d_le = L.bce_with_logits(self_logit, s_true[:, None]).mean()
        e_logit = _edge_logits(
            params, hv_all[:, 1 : s - 1], ehs, w1a, b1, drop=d_edge
        ).astype(dt)
        e_true = jnp.stack([tins, touts], axis=-1)                     # (B, vi, 2)
        d_le = d_le + L.bce_with_logits(e_logit, e_true).mean(0).sum()
        return hv_all[:, -1], d_le

    if cfg.remat:
        node_cadence = jax.checkpoint(node_cadence)

    for vi in range(1, n):
        eh_row, proj_row = _node_caches(hid_prev, w1b, wp)
        ehl.append(eh_row)
        projl.append(proj_row)
        xi_pred = L.mlp(params["h_to_x"], hid_prev, drop=_drop()).astype(dt)
        xi_true = X_true[:, vi, :]
        pi_true = params_true[:, vi, :]

        # parameter loss (model.py:323-328)
        loss_xi = loss_xi + (
            mse(xi_pred[:, :9] * w_env, xi_true[:, :9] * w_env).mean(0).sum()
            + mse(xi_pred[:, 9] * w_frq, xi_true[:, 9] * w_frq).mean()
            + mse(xi_pred[:, 10:18], xi_true[:, 10:18]).mean(0).sum()
            + L.bce_with_logits(xi_pred[:, 18], xi_true[:, 18]).mean()
            + L.cross_entropy(xi_pred[:, 19:23], pi_true[:, 19]).mean()
            + L.cross_entropy(xi_pred[:, 23:27], pi_true[:, 20]).mean()
        )

        order = list(range(vi - 1, -1, -1))
        s_true = adj_true[:, vi, vi]
        if cfg.unroll:
            # sequential cadence: teacher-force node vi, propagate with no
            # incident edges, self-loop decision + re-propagate, then one
            # propagate per teacher-forced edge pair (H_in accumulates one
            # window slot at a time)
            hv = _propagate_list(params, xi_true, zero_hin, no_loop, cdt)
            self_logit = L.mlp(params["h_to_edge_self"], hv, drop=_drop()).astype(dt)
            loss_e = loss_e + L.bce_with_logits(self_logit, s_true[:, None]).mean()
            hv = _propagate_list(params, xi_true, zero_hin, s_true, cdt)
            h_acc = zero_hin
            for vj in order:
                e_logit = _edge_logits(params, hv, ehl[vj], w1a, b1, drop=_drop()).astype(dt)
                e_true = jnp.stack([adj_true[:, vj, vi], adj_true[:, vi, vj]], axis=-1)
                loss_e = loss_e + L.bce_with_logits(e_logit, e_true).mean(0).sum()
                h_acc = h_acc + slot_contribution(
                    projl[vj],
                    adj_true[:, vj, vi].astype(cdt),
                    adj_true[:, vi, vj].astype(cdt),
                    gate_b,
                )
                hv = _propagate_list(params, xi_true, h_acc, s_true, cdt)
            hid_prev = hv
        else:
            d = _drop()
            dks = None if d is None else (d[1], _drop()[1])
            hid_prev, d_le = node_cadence(
                xi_true,
                s_true,
                jnp.stack([adj_true[:, j, vi] for j in order], axis=1),
                jnp.stack([adj_true[:, vi, j] for j in order], axis=1),
                jnp.stack([projl[j] for j in order], axis=1),
                jnp.stack([ehl[j] for j in order], axis=1),
                dks,
            )
            loss_e = loss_e + d_le

    # KL(p || q) with p = N(0, 1) — reversed direction kept (model.py:365)
    kld_w = _kld(mu, std) * w_kld
    total = loss_x0 + loss_xi + loss_e + kld_w
    return total, (loss_x0, loss_xi, loss_e, kld_w)


def _kld(mu, std):
    """KL(N(0,1) || N(mu, std)), batch-mean / latent-sum (model.py:365)."""
    return (jnp.log(std) + (1.0 + mu**2) / (2.0 * std**2) - 0.5).mean(0).sum()


def forward(
    params,
    X_true,
    params_true,
    adj_true,
    key=None,
    training: bool = True,
    weights: LossWeights = LossWeights(),
    cfg: DXVAEConfig = DXVAEConfig(),
):
    """encode -> loss (model.py:369-372). Returns (loss, (lx0, lxi, le, kld))."""
    mu, std, st = encode(params, X_true, adj_true, cfg)
    return elbo_loss(
        params, mu, std, X_true, params_true, adj_true,
        key=key, training=training, weights=weights, cfg=cfg, init_state=st,
    )
