"""Fake ``dgl`` module: the exact surface the reference uses.

model.py uses: dgl.graph(([], [])), g.to(device), g.add_nodes(n, data),
g.add_edges(u, v), g.predecessors(v), g.successors(v), g.ndata[...],
g.adj().to_dense().
dxdata.py additionally uses: dgl.data.DGLDataset (lifecycle), dgl.graph(
(src_list, dst_list)), g.ndata[...] assignment, dgl.save_graphs/load_graphs.
"""

from __future__ import annotations

import os
from types import SimpleNamespace

import torch

#: "src_dst" -> adj[s, d] = 1 for edge s->d (DGL >= 0.5 semantics);
#: "dst_src" -> the pre-0.5 transpose, for the orientation experiment.
_ADJ_ORIENTATION = "src_dst"


def set_orientation(orient: str) -> None:
    global _ADJ_ORIENTATION
    if orient not in ("src_dst", "dst_src"):
        raise ValueError(orient)
    _ADJ_ORIENTATION = orient


class _DenseAdj:
    """Stands in for the sparse matrix returned by DGLGraph.adj()."""

    def __init__(self, dense: torch.Tensor):
        self._dense = dense

    def to_dense(self) -> torch.Tensor:
        return self._dense


class ShimGraph:
    def __init__(self, edges=((), ())):
        src, dst = edges
        self._src = [int(s) for s in src]
        self._dst = [int(d) for d in dst]
        self._n = max(self._src + self._dst) + 1 if (self._src or self._dst) else 0
        self.ndata: dict[str, torch.Tensor] = {}

    # -- device plumbing (CPU-only shim) --------------------------------------
    def to(self, device):
        return self

    # -- mutation --------------------------------------------------------------
    def add_nodes(self, num: int, data: dict | None = None):
        self._n += int(num)
        if data:
            for k, v in data.items():
                if k in self.ndata:
                    self.ndata[k] = torch.cat([self.ndata[k], v])
                else:
                    self.ndata[k] = v

    def add_edges(self, u, v):
        us = [int(u)] if not hasattr(u, "__len__") else [int(x) for x in u]
        vs = [int(v)] if not hasattr(v, "__len__") else [int(x) for x in v]
        self._src.extend(us)
        self._dst.extend(vs)

    # -- queries ---------------------------------------------------------------
    def predecessors(self, v: int) -> torch.Tensor:
        v = int(v)
        return torch.tensor(
            [s for s, d in zip(self._src, self._dst) if d == v], dtype=torch.int64
        )

    def successors(self, v: int) -> torch.Tensor:
        v = int(v)
        return torch.tensor(
            [d for s, d in zip(self._src, self._dst) if s == v], dtype=torch.int64
        )

    def edges(self):
        return (
            torch.tensor(self._src, dtype=torch.int64),
            torch.tensor(self._dst, dtype=torch.int64),
        )

    def num_nodes(self) -> int:
        return self._n

    number_of_nodes = num_nodes

    def adj(self) -> _DenseAdj:
        a = torch.zeros(self._n, self._n)
        for s, d in zip(self._src, self._dst):
            if _ADJ_ORIENTATION == "src_dst":
                a[s, d] += 1
            else:
                a[d, s] += 1
        return _DenseAdj(a)


def graph(edges) -> ShimGraph:
    return ShimGraph(edges)


def save_graphs(path, graphs) -> None:
    torch.save(
        [
            {"src": g._src, "dst": g._dst, "n": g._n, "ndata": g.ndata}
            for g in graphs
        ],
        path,
    )


def load_graphs(path):
    """Returns (graphs, labels) — the tuple shape responsible for the
    reference's dataset[0] asymmetry (dxdata.py:325-335, SURVEY.md §3.4)."""
    out = []
    for rec in torch.load(path, weights_only=False):
        g = ShimGraph((rec["src"], rec["dst"]))
        g._n = rec["n"]
        g.ndata = rec["ndata"]
        out.append(g)
    return out, {}


class DGLDataset:
    """Minimal DGLDataset lifecycle: has_cache ? load : (process; save)."""

    def __init__(
        self,
        name=None,
        url=None,
        raw_dir=None,
        save_dir=None,
        hash_key=(),
        force_reload=False,
        verbose=False,
    ):
        self._name = name
        self._raw_dir = raw_dir if raw_dir is not None else "."
        self._save_dir = save_dir if save_dir is not None else self._raw_dir
        if self.has_cache() and not force_reload:
            self.load()
        else:
            self.process()
            self.save()

    @property
    def name(self):
        return self._name

    @property
    def raw_dir(self):
        return self._raw_dir

    @property
    def save_dir(self):
        return self._save_dir

    @property
    def save_path(self):
        return os.path.join(self._save_dir, self._name)

    # subclass hooks
    def has_cache(self):
        return False

    def process(self):
        raise NotImplementedError

    def save(self):
        pass

    def load(self):
        raise NotImplementedError


#: dxdata.py accesses dgl.data.DGLDataset via plain ``import dgl``
data = SimpleNamespace(DGLDataset=DGLDataset)
