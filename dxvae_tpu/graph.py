"""Dense graph-batch container.

The reference carries each patch as a mutable ``DGLGraph`` with
``ndata['X']``/``ndata['params']`` (dxdata.py:308-312).  TPU-natively a batch
of B patches is three fixed-shape arrays — no graph objects, no pointers:

* ``X``      ``(B, 7, 27) float32`` — normalized node features for training
             (row 0 = global node, rows 1..6 = operators; feature layout per
             dxdata.py:226-242 / 283-298),
* ``params`` ``(B, 7, 21) int32``   — integer DX7 parameters "for viewing" and
             for SysEx serialization (dxdata.py:208-224 / 264-281),
* ``adj``    ``(B, 7, 7)  float32`` — adjacency, ``adj[b, i, j] = 1`` iff edge
             ``i -> j`` (feedback self-loops on the diagonal).

Everything downstream (encoder scan, decoder, loss) consumes these arrays
directly; a batch of graphs is constructed with a single table gather
``ALGO_ADJ[alg]``.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class GraphBatch(NamedTuple):
    """A batch of DX7 patch graphs as dense tensors."""

    X: np.ndarray        # (B, 7, 27) float32
    params: np.ndarray   # (B, 7, 21) int32
    adj: np.ndarray      # (B, 7, 7)  float32

    def __len__(self) -> int:
        return int(self.X.shape[0])

    def take(self, idx) -> "GraphBatch":
        """Gather a sub-batch by integer indices (host-side, NumPy)."""
        idx = np.asarray(idx)
        return GraphBatch(self.X[idx], self.params[idx], self.adj[idx])

    def __getitem__(self, idx) -> "GraphBatch":
        """Sub-batch indexing mirroring the reference's list-of-graphs idiom
        (main.py:55,67: ``G[12:13]`` / ``G[12]``): an int yields a length-1
        batch, a slice or index array the corresponding sub-batch.  This
        deliberately shadows NamedTuple positional indexing — access the
        fields by name (``.X`` / ``.params`` / ``.adj``)."""
        if isinstance(idx, (int, np.integer)):
            idx = int(idx)
            n = len(self)
            if not -n <= idx < n:  # match the reference's list IndexError
                raise IndexError(f"patch index {idx} out of range for a batch of {n}")
            idx = slice(idx, idx + 1) if idx != -1 else slice(-1, None)
        if isinstance(idx, slice):
            return GraphBatch(self.X[idx], self.params[idx], self.adj[idx])
        return self.take(idx)

    def slice(self, start: int, stop: int) -> "GraphBatch":
        return GraphBatch(self.X[start:stop], self.params[start:stop], self.adj[start:stop])

    @staticmethod
    def concat(batches: "list[GraphBatch]") -> "GraphBatch":
        return GraphBatch(
            np.concatenate([b.X for b in batches]),
            np.concatenate([b.params for b in batches]),
            np.concatenate([b.adj for b in batches]),
        )

    def tile_to(self, n: int) -> "GraphBatch":
        """Cycle the batch up (or slice it down) to exactly ``n`` patches —
        the benchmark idiom for running an arbitrary batch size over a
        fixed-size corpus.  Adjacency is returned as float32 (what the model
        consumes)."""
        reps = -(-n // len(self))
        return GraphBatch(
            X=np.tile(np.asarray(self.X), (reps, 1, 1))[:n],
            params=np.tile(np.asarray(self.params), (reps, 1, 1))[:n],
            adj=np.tile(np.asarray(self.adj, np.float32), (reps, 1, 1))[:n],
        )


# namedtuple's default _make validates ``len(result) == 3``, but
# ``GraphBatch.__len__`` is the BATCH size — without this override
# ``_replace`` raises "Expected 3 arguments, got <B>".  typing.NamedTuple
# forbids defining _make in the class body, so it is attached here.
GraphBatch._make = classmethod(lambda cls, iterable: tuple.__new__(cls, iterable))
