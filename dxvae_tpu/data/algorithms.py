"""DX7 algorithm topology table.

The Yamaha DX7 routes its 6 FM operators through one of 32 fixed "algorithms".
We model a patch as a 7-node directed graph: node 0 is the global/output root,
nodes 1..6 are the operators.  An edge ``i -> j`` means operator *i* modulates
*j* (or, for ``j = 0``, that *i* is a carrier feeding the output).  Each
algorithm has exactly one feedback operator, encoded as a self-edge ``(k, k)``.

This is hardware-spec data (the same routing table the reference encodes as
src/dst lists, dxdata.py:140-171); here every algorithm is a list of
``(src, dst)`` edges, compiled once into a static ``(32, 7, 7)`` boolean
adjacency tensor ``ALGO_ADJ`` with ``ALGO_ADJ[a, i, j] = 1`` iff algorithm
``a`` has edge ``i -> j``.  The dense tensor is the TPU-native form: building a
batch of graphs is a single gather ``ALGO_ADJ[alg_bytes]``.
"""

from __future__ import annotations

import itertools
from functools import lru_cache

import numpy as np

N_NODES = 7
N_ALGORITHMS = 32

# fmt: off
ALGO_EDGES: tuple[tuple[tuple[int, int], ...], ...] = (
    ((1, 0), (2, 1), (3, 0), (4, 3), (5, 4), (6, 5), (6, 6)),                    # 1
    ((1, 0), (2, 1), (2, 2), (3, 0), (4, 3), (5, 4), (6, 5)),                    # 2
    ((1, 0), (2, 1), (3, 2), (4, 0), (5, 4), (6, 5), (6, 6)),                    # 3
    ((1, 0), (2, 1), (3, 2), (4, 0), (4, 6), (5, 4), (6, 5)),                    # 4
    ((1, 0), (2, 1), (3, 0), (4, 3), (5, 0), (6, 5), (6, 6)),                    # 5
    ((1, 0), (2, 1), (3, 0), (4, 3), (5, 0), (5, 6), (6, 5)),                    # 6
    ((1, 0), (2, 1), (3, 0), (4, 3), (5, 3), (6, 5), (6, 6)),                    # 7
    ((1, 0), (2, 1), (3, 0), (4, 3), (4, 4), (5, 3), (6, 5)),                    # 8
    ((1, 0), (2, 1), (2, 2), (3, 0), (4, 3), (5, 3), (6, 5)),                    # 9
    ((1, 0), (2, 1), (3, 2), (3, 3), (4, 0), (5, 4), (6, 4)),                    # 10
    ((1, 0), (2, 1), (3, 2), (4, 0), (5, 4), (6, 4), (6, 6)),                    # 11
    ((1, 0), (2, 1), (2, 2), (3, 0), (4, 3), (5, 3), (6, 3)),                    # 12
    ((1, 0), (2, 1), (3, 0), (4, 3), (5, 3), (6, 3), (6, 6)),                    # 13
    ((1, 0), (2, 1), (3, 0), (4, 3), (5, 4), (6, 4), (6, 6)),                    # 14
    ((1, 0), (2, 1), (2, 2), (3, 0), (4, 3), (5, 4), (6, 4)),                    # 15
    ((1, 0), (2, 1), (3, 1), (4, 3), (5, 1), (6, 5), (6, 6)),                    # 16
    ((1, 0), (2, 1), (2, 2), (3, 1), (4, 3), (5, 1), (6, 5)),                    # 17
    ((1, 0), (2, 1), (3, 1), (3, 3), (4, 1), (5, 4), (6, 5)),                    # 18
    ((1, 0), (2, 1), (3, 2), (4, 0), (5, 0), (6, 4), (6, 5), (6, 6)),            # 19
    ((1, 0), (2, 0), (3, 1), (3, 2), (3, 3), (4, 0), (5, 4), (6, 4)),            # 20
    ((1, 0), (2, 0), (3, 1), (3, 2), (3, 3), (4, 0), (5, 0), (6, 4), (6, 5)),    # 21
    ((1, 0), (2, 1), (3, 0), (4, 0), (5, 0), (6, 3), (6, 4), (6, 5), (6, 6)),    # 22
    ((1, 0), (2, 0), (3, 2), (4, 0), (5, 0), (6, 4), (6, 5), (6, 6)),            # 23
    ((1, 0), (2, 0), (3, 0), (4, 0), (5, 0), (6, 3), (6, 4), (6, 5), (6, 6)),    # 24
    ((1, 0), (2, 0), (3, 0), (4, 0), (5, 0), (6, 4), (6, 5), (6, 6)),            # 25
    ((1, 0), (2, 0), (4, 0), (3, 2), (5, 4), (6, 4), (6, 6)),                    # 26
    ((1, 0), (2, 0), (3, 2), (3, 3), (4, 0), (5, 4), (6, 4)),                    # 27
    ((1, 0), (2, 1), (3, 0), (4, 3), (5, 4), (5, 5), (6, 0)),                    # 28
    ((1, 0), (2, 0), (3, 0), (4, 3), (5, 0), (6, 5), (6, 6)),                    # 29
    ((1, 0), (2, 0), (3, 0), (4, 3), (5, 4), (5, 5), (6, 0)),                    # 30
    ((1, 0), (2, 0), (3, 0), (4, 0), (5, 0), (6, 5), (6, 6)),                    # 31
    ((1, 0), (2, 0), (3, 0), (4, 0), (5, 0), (6, 0), (6, 6)),                    # 32
)
# fmt: on


def _build_adj() -> np.ndarray:
    adj = np.zeros((N_ALGORITHMS, N_NODES, N_NODES), dtype=np.bool_)
    for a, edges in enumerate(ALGO_EDGES):
        for src, dst in edges:
            adj[a, src, dst] = True
    return adj


#: (32, 7, 7) bool — ALGO_ADJ[a, i, j] == True iff algorithm a has edge i -> j.
ALGO_ADJ: np.ndarray = _build_adj()
ALGO_ADJ.setflags(write=False)


def match_algorithm(adj: np.ndarray) -> np.ndarray:
    """Exact-match each adjacency against the 32 hardware routings.

    Returns ``(B,) int64``: the algorithm index whose topology equals
    ``adj[b]`` exactly, or ``-1`` if ``adj[b]`` is not a valid DX7 routing.
    (Algorithm topologies are distinct, so the match is unique when it
    exists.)  The mask form is ``match_algorithm(adj) >= 0``.
    """
    adj = np.asarray(adj)
    table = ALGO_ADJ.astype(adj.dtype)  # (32, 7, 7)
    eq = (adj[:, None] == table[None]).all(axis=(2, 3))  # (B, 32)
    return np.where(eq.any(axis=1), eq.argmax(axis=1), -1).astype(np.int64)


def project_topology(adj: np.ndarray, alg_scores: np.ndarray | None = None):
    """Snap each adjacency to the nearest valid DX7 algorithm topology.

    Beyond-reference constrained-generation capability: the decoder's 21
    independent edge decisions rarely land exactly on one of the 32 hardware
    algorithms (9.6–17.6% measured across model scales, docs/PERF.md), yet
    only those 32 routings are realizable on a DX7.  This projects each
    sampled ``adj (B, 7, 7)`` to the algorithm with minimum Hamming distance;
    ties are broken by the decoder's own algorithm-head scores ``alg_scores
    (B, 32)`` when given (higher wins), else by the lowest algorithm index.

    Returns ``(proj_adj (B, 7, 7) float like adj, proj_alg (B,) int64)``.
    """
    adj = np.asarray(adj)
    table = ALGO_ADJ.astype(adj.dtype)  # (32, 7, 7)
    d = np.abs(adj[:, None] - table[None]).sum(axis=(2, 3))  # (B, 32) Hamming
    if alg_scores is not None:
        s = np.asarray(alg_scores, np.float64)
        # rank-based tie term (scale-free, unlike a softmax, which saturates
        # for extreme logits): pos 0 = best score per row, stable sort so
        # equal scores prefer the lower algorithm index
        pos = np.empty_like(d, dtype=np.int64)
        order = np.argsort(-s, axis=-1, kind="stable")
        np.put_along_axis(
            pos, order, np.broadcast_to(np.arange(s.shape[-1]), s.shape).copy(), axis=-1
        )
        # Hamming distances are integers >= 1 apart, so subtracting a (0,1]
        # -bounded term breaks ties by head score without reordering distinct
        # distances
        score = d.astype(np.float64) - (s.shape[-1] - pos) / (s.shape[-1] + 2)
    else:
        score = d
    k = np.argmin(score, axis=-1)
    return table[k], k.astype(np.int64)


@lru_cache(maxsize=None)
def automorphisms(alg: int) -> np.ndarray:
    """All operator permutations under which algorithm ``alg``'s routing is
    invariant: ``(n_auto, 7) int64``, each row a node permutation ``p`` with
    ``p[0] == 0`` (the global node is fixed) and ``adj[p][:, p] == adj``.

    Row 0 is always the identity (enumeration is lexicographic).  These are
    the graph automorphisms of the hardware routing: relabeling operators
    along one yields a patch that synthesizes *identical audio* (every per-op
    parameter travels with its operator; the DX7's six operators are
    interchangeable hardware), yet presents differently to an
    order-sensitive model.  19 of the 32 algorithms have a non-trivial
    group — sizes 2..120, e.g. algorithm 32's five interchangeable parallel
    carriers give 5! = 120 (beyond-reference; the reference never exploits
    this symmetry).
    """
    adj = ALGO_ADJ[alg]
    perms = [
        (0,) + p
        for p in itertools.permutations(range(1, N_NODES))
        if np.array_equal(adj[np.ix_((0,) + p, (0,) + p)], adj)
    ]
    out = np.array(perms, dtype=np.int64)
    out.setflags(write=False)
    return out


def orbit_augment(G, max_per_patch: int | None = None, seed: int = 0,
                  include_original: bool = True, return_index: bool = False):
    """Expand a batch with operator-permuted copies along each patch's
    algorithm automorphism group (beyond-reference data augmentation).

    Each copy gathers the node rows of ``X``/``params`` by an automorphism of
    the patch's routing, so its adjacency — and hence its algorithm — is
    EXACTLY unchanged while the operator order differs: an acoustically
    identical presentation the encoder/decoder (which process nodes in a
    fixed index order) see as a new training example.  Patches whose
    topology matches no DX7 algorithm contribute no copies.

    ``max_per_patch`` caps copies per patch (sampled per-patch without
    replacement; the orbit sizes are highly skewed — algorithm 32 alone has
    119 non-identity automorphisms); ``None`` emits the full orbit.
    Returns a :class:`GraphBatch` of the originals (when
    ``include_original``) followed by the copies, grouped by algorithm.
    With ``return_index`` also returns the ``(len(out),) int64`` row index
    into ``G`` each output row was gathered from (originals map to
    themselves), so callers can pair each permuted copy with its source —
    e.g. the encoder-invariance metric in scripts/evaluate.py.
    """
    from dxvae_tpu.graph import GraphBatch

    X = np.asarray(G.X)
    P = np.asarray(G.params)
    A = np.asarray(G.adj)
    if max_per_patch is not None and max_per_patch < 0:
        raise ValueError(f"max_per_patch must be >= 0, got {max_per_patch}")
    match = match_algorithm(A)
    rng = np.random.default_rng(seed)
    xs = [X] if include_original else []
    ps = [P] if include_original else []
    adjs = [A] if include_original else []
    srcs = [np.arange(len(X), dtype=np.int64)] if include_original else []
    for alg in np.unique(match[match >= 0]):
        autos = automorphisms(int(alg))[1:]  # identity dropped
        rows = np.flatnonzero(match == alg)
        n_p, n_a = len(rows), len(autos)
        c = n_a if max_per_patch is None else min(max_per_patch, n_a)
        if c == 0:
            continue
        # per-patch independent subsets of the orbit (argsort of uniforms =
        # a random c-permutation prefix per row, no replacement)
        choice = np.argsort(rng.random((n_p, n_a)), axis=1)[:, :c]  # (n_p, c)
        perms = autos[choice]  # (n_p, c, 7)
        bi = np.arange(n_p)[:, None, None]
        xs.append(X[rows][bi, perms].reshape(n_p * c, *X.shape[1:]))
        ps.append(P[rows][bi, perms].reshape(n_p * c, *P.shape[1:]))
        adjs.append(np.repeat(A[rows], c, axis=0))  # invariant by construction
        srcs.append(np.repeat(rows.astype(np.int64), c))
    if not xs:
        out = GraphBatch(X=X[:0], params=P[:0], adj=A[:0])
        return (out, np.zeros(0, dtype=np.int64)) if return_index else out
    out = GraphBatch(X=np.concatenate(xs), params=np.concatenate(ps),
                     adj=np.concatenate(adjs))
    return (out, np.concatenate(srcs)) if return_index else out


def canonicalize_orbit(G):
    """Map every patch to ONE canonical presentation of its automorphism
    orbit: the permutation (over ``automorphisms`` of its routing) whose
    param matrix is lexicographically smallest, applied to ``X`` and
    ``params`` together (adjacency is invariant by construction).

    The complement of :func:`orbit_augment`: with a permutation-invariant
    encoder all presentations of a patch share one latent, so augmentation
    hands the decoder one-to-many targets while canonicalization collapses
    them to exactly one — acoustically the same dataset (operator
    relabelings synthesize identical audio), but a deterministic
    presentation per sound.  Idempotent; patches with trivial orbits (or
    non-DX7 topologies) pass through unchanged.  Row order is preserved.
    """
    from dxvae_tpu.graph import GraphBatch

    X = np.asarray(G.X).copy()
    P = np.asarray(G.params).copy()
    A = np.asarray(G.adj)
    match = match_algorithm(A)
    for alg in np.unique(match[match >= 0]):
        autos = automorphisms(int(alg))
        if len(autos) == 1:
            continue
        rows = np.flatnonzero(match == alg)
        per = P[rows][:, autos]  # (n, n_auto, 7, P)
        # lexicographic argmin over the flattened param matrix: params are
        # 7-bit, so a uint8 view compares in value order byte-by-byte
        keys = np.ascontiguousarray(per.astype(np.uint8)).reshape(
            len(rows), len(autos), -1)
        best = np.array([min(range(len(autos)), key=lambda a: k[a].tobytes())
                         for k in keys])
        sel = autos[best]  # (n, 7)
        bi = np.arange(len(rows))[:, None]
        P[rows] = P[rows][bi, sel]
        X[rows] = X[rows][bi, sel]
    return GraphBatch(X=X, params=P, adj=A.copy())


def rejection_sample_valid(n, m, decode_round, max_rounds, hint):
    """Shared core of ``valid_only`` generation (DXVAE.generate and
    ServedDXVAE.generate): call ``decode_round(r)`` (a GraphBatch of ``m``
    prior samples for round ``r``), keep only rows whose topology exactly IS
    a valid DX7 algorithm, sync the alg param byte to the matched routing
    (it is what a DX7 reads), and stop once ``n`` survivors accumulated.

    Raises RuntimeError after ``max_rounds`` rounds, appending ``hint``
    (caller-specific advice) to the message.
    """
    from dxvae_tpu.graph import GraphBatch

    kept: list[GraphBatch] = []
    n_kept = n_tried = 0
    for r in range(max_rounds):
        G = decode_round(r)
        match = match_algorithm(G.adj)
        sel = np.flatnonzero(match >= 0)
        n_tried += m
        if len(sel):
            sub = G[sel]
            P = sub.params.copy()
            P[:, 0, 18] = match[sel].astype(P.dtype)
            # NOT sub._replace(): GraphBatch.__len__ is the batch size,
            # which trips namedtuple._make's arity check
            kept.append(GraphBatch(X=sub.X, params=P, adj=sub.adj))
            n_kept += len(sel)
        if n_kept >= n:
            return GraphBatch.concat(kept)[:n]
    raise RuntimeError(
        f"valid_only: only {n_kept}/{n} valid samples after {n_tried} "
        f"decodes ({max_rounds} rounds); the model's validity rate is too "
        f"low — {hint}")
