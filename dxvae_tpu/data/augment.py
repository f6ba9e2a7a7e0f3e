"""Within-quantization-bin feature jitter (data augmentation).

Beyond-reference capability (the reference has no augmentation at all;
its corpus handling is dxdata.py:320-323).  Every scalar feature in ``X``
is a normalized point on a DX7 quantization grid (model.py:87-98 semantics,
re-implemented in models/quantize.py): linear grids ``x = p / scale`` and,
for the oscillator frequencies in ratio mode, inverse-log grids
``x = log(p + 1) / log(scale + 1)``.  The synth hardware only ever sees the
integer ``p``, so any x WITHIN the same quantization bin is acoustically
identical — jittering inside the bin yields new training inputs for free,
without the label ambiguity of orbit permutation (which measured negative at
flagship scale, docs/PERF.md "Orbit augmentation").

The jittered X is used everywhere the true X is (encoder input, teacher
forcing, regression targets): the quantizer snaps any within-bin value back
to the same integer parameters, so a reconstruction matching the jittered
target quantizes identically to one matching the clean target.

Categorical one-hots (lc / rc / lfw), booleans (mode / oks / lks) and the
zero padding dims are never touched.  Bin membership under round-half-even
is guaranteed by a 2% margin off the bin boundary (the tests re-quantize).
"""

from __future__ import annotations

import numpy as np

# (feature slice, linear grid scale) — global node / operator nodes
# (dims per models/quantize.py:reg_x0 / reg_xi and the data layer's
# normalization, sysex.py; fc/ff handled separately below, mode-dependent)
_LIN_X0 = [(slice(0, 8), 99), (slice(8, 9), 48), (slice(9, 13), 99), (slice(13, 15), 7)]
_LIN_OP = [(slice(0, 9), 99), (slice(11, 12), 14), (slice(12, 15), 99),
           (slice(15, 16), 3), (slice(16, 18), 7)]
# fc / ff: (dim, log-grid scale in ratio mode, linear scale in fixed mode)
_FRQ = [(9, 31, 3), (10, 99, 99)]


def jitter_within_bin(X, P, rng: np.random.Generator, amount: float = 1.0):
    """Return a copy of ``X (B,7,27)`` with every scalar feature jittered
    uniformly inside its quantization bin.

    ``amount`` in (0, 1] scales the jitter range as a fraction of the bin
    (1.0 = the full bin, minus a 2% boundary margin).  ``P (B,7,21)`` supplies
    the integer grid points (and the per-op oscillator mode that selects the
    fc/ff grid).  Pure NumPy, meant as a cheap per-batch host-side transform.
    """
    if not 0.0 < amount <= 1.0:
        raise ValueError(f"amount must be in (0, 1], got {amount}")
    X = np.array(X, np.float32, copy=True)
    P = np.asarray(P)
    a = 0.49 * float(amount)  # linear half-bin is 0.5/scale; 2% margin

    def u(shape):
        return rng.uniform(-1.0, 1.0, shape).astype(np.float32)

    for sl, s in _LIN_X0:
        x = X[:, 0, sl]
        X[:, 0, sl] = np.clip(x + u(x.shape) * (a / s), 0.0, 1.0)
    for sl, s in _LIN_OP:
        x = X[:, 1:, sl]
        X[:, 1:, sl] = np.clip(x + u(x.shape) * (a / s), 0.0, 1.0)

    # oscillator frequencies: grid branches per sample on the predicted mode
    # (ratio -> inverse-log grid, fixed -> linear; model.py:141-147)
    ratio = P[:, 1:, 18] == 0
    for d, s_log, s_lin in _FRQ:
        p = P[:, 1:, d].astype(np.float64)
        log_s = np.log(s_log + 1.0)
        # ratio-mode bin [lo, hi) in x-space: exp(x*L)-1 rounds to p iff
        # x in [log(p+.5)/L, log(p+1.5)/L); clamp to the feature range [0, 1]
        lo = np.log(np.maximum(p + 0.5, 1.0)) / log_s
        hi = np.log(np.minimum(p + 1.5, s_log + 1.0)) / log_s
        x = X[:, 1:, d].astype(np.float64)
        r = u(x.shape).astype(np.float64)
        scale = np.where(r >= 0.0, hi - x, x - lo) * (0.98 * amount)
        x_log = x + r * scale
        x_lin = np.clip(x + r * (a / s_lin), 0.0, 1.0)
        X[:, 1:, d] = np.where(ratio, x_log, x_lin).astype(np.float32)
    return X
