"""Minimal DGL / mido shims for executing /root/reference VERBATIM.

The reference depends on ``dgl`` and ``mido``, neither of which is installed.
These shims implement exactly the API surface the reference uses (graph
construction/mutation, predecessors/successors queries, ``adj().to_dense()``,
the DGLDataset lifecycle, SysEx file IO) so that ``model.py`` and ``dxdata.py``
can be imported and run unmodified — turning every parity claim in this repo
from "matches a transcription" into "matches the reference code executing".

The one semantically ambiguous point is ``DGLGraph.adj()``'s orientation
(model.py:279): 2021-era DGL (0.5+) returns A[src, dst] (rows = edge sources)
after the 0.4->0.5 breaking change that flipped the pre-0.5 A[dst, src]
default.  ``install(adj_orientation=...)`` makes the shim parameterizable so
tests can demonstrate which orientation the reference's own slicing
(model.py:343-345 ``adj[:, :vi, vi]`` named ``adj_in_true``) is consistent
with, and that the other orientation produces a different loss.
"""
