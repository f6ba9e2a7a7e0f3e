"""Dev-mode numerical checking (SURVEY.md §5 sanitizer tier).

The reference has no sanitizers; its only shared-mutable-state hazard
(``self.hidden``) is gone by construction here (functional state).  What can
still go wrong numerically — NaN/Inf from a bad checkpoint, divergent LR, or
a corrupted bank — is caught by wrapping any model function with
:func:`checked`, which uses ``jax.experimental.checkify`` to instrument every
primitive with NaN/div checks and returns the error alongside the value.
"""

from __future__ import annotations

import jax
from jax.experimental import checkify

CHECKS = checkify.float_checks  # == nan_checks | div_checks already


def checked(fn, checks=CHECKS):
    """Wrap ``fn`` so calls return ``(err, value)``; ``err.throw()`` raises a
    descriptive error at the first NaN/Inf/div-by-zero. jit-compatible:

        err, loss = jax.jit(checked(loss_fn))(params, batch)
        err.throw()
    """
    return checkify.checkify(fn, errors=checks)


def assert_all_finite(tree, name: str = "pytree") -> None:
    """Host-side finiteness check over a pytree (e.g. params after a resume)."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        a = np.asarray(leaf)
        if not np.isfinite(a).all():
            key = "/".join(str(getattr(p, "key", p)) for p in path)
            bad = int((~np.isfinite(a)).sum())
            raise FloatingPointError(f"{name}.{key}: {bad}/{a.size} non-finite values")
