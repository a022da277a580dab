"""Trace-time context for padded-bucket UV programs (SURVEY.md §7 hard-part
5; VERDICT round-2 next #3).

A bucket program runs on a reflect-101-padded (BH, BW) frame but must
reproduce the exact-path output for the real (h, w) interior. Two families
of ops are shape-dependent and need help:

- **Global statistics** (``core.stats.percentile``): the padding duplicates
  border-region values, shifting order statistics. With a context active,
  ``percentile`` counts only the real region (exact: the masked value set
  equals the exact program's value set).
- **Coordinate-derived masks** (radial peripheral-blur masks, vertical
  priors): ``np.linspace`` over the BUCKET dims would stretch the geometry.
  The context provides *reflected* real-frame coordinates — row i maps to
  ``i`` inside the frame and to ``2(h-1)-i`` in the padding — so masks are
  mirror-consistent with the frame content and downstream reflect-101 convs
  keep reading exactly what the exact program's internal border handling
  would produce.

The context is installed while *tracing* a bucket program (the traced
``h``/``w`` scalars it holds are operands of that program), so no runtime
flag is consulted on the hot path.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax.numpy as jnp

_CTX: list = [None]


class BucketCtx:
    """Traced real-frame dims + static bucket dims for an active trace.

    ``hr``/``wr`` are traced int32 scalars (the real frame size); ``bh``/
    ``bw`` the static bucket dims. ``small`` optionally carries the same
    for the HSI-downsample space: (hsr, wsr, hs_b, ws_b).
    """

    def __init__(self, hr, wr, bh: int, bw: int, small=None):
        self.hr = hr
        self.wr = wr
        self.bh = int(bh)
        self.bw = int(bw)
        self.small = small  # (hsr, wsr, hs_b, ws_b) or None

    # -- reflected real-frame coordinates ---------------------------------
    def refl_rows(self) -> jnp.ndarray:
        """(BH,) float32: row index inside the real frame, reflect-101 into
        the padding (i -> 2(h-1)-i for i >= h)."""
        i = jnp.arange(self.bh, dtype=jnp.int32)
        h = self.hr.astype(jnp.int32)
        return jnp.where(i < h, i, 2 * (h - 1) - i).astype(jnp.float32)

    def refl_cols(self) -> jnp.ndarray:
        j = jnp.arange(self.bw, dtype=jnp.int32)
        w = self.wr.astype(jnp.int32)
        return jnp.where(j < w, j, 2 * (w - 1) - j).astype(jnp.float32)

    def norm_rows(self) -> jnp.ndarray:
        """(BH,) float32 in [-1, 1]: np.linspace(-1, 1, h) at the reflected
        row coordinate (linspace(-1,1,h)[i] == 2*i/(h-1) - 1)."""
        h = self.hr.astype(jnp.float32)
        return 2.0 * self.refl_rows() / jnp.maximum(h - 1.0, 1.0) - 1.0

    def norm_cols(self) -> jnp.ndarray:
        w = self.wr.astype(jnp.float32)
        return 2.0 * self.refl_cols() / jnp.maximum(w - 1.0, 1.0) - 1.0

    # -- validity for global stats ----------------------------------------
    def valid_for(self, shape) -> jnp.ndarray | None:
        """(d0, d1) bool validity mask if the leading dims of ``shape``
        match the bucket (or bucket-small) dims, else None."""
        d0, d1 = int(shape[0]), int(shape[1])
        if (d0, d1) == (self.bh, self.bw):
            hr, wr = self.hr, self.wr
        elif self.small is not None and (d0, d1) == (self.small[2], self.small[3]):
            hr, wr = self.small[0], self.small[1]
        else:
            return None
        rows = jnp.arange(d0, dtype=jnp.int32)[:, None] < hr
        cols = jnp.arange(d1, dtype=jnp.int32)[None, :] < wr
        return rows & cols

    def n_valid_for(self, shape):
        d0, d1 = int(shape[0]), int(shape[1])
        if (d0, d1) == (self.bh, self.bw):
            return self.hr * self.wr
        if self.small is not None and (d0, d1) == (self.small[2], self.small[3]):
            return self.small[0] * self.small[1]
        return None


def current() -> BucketCtx | None:
    return _CTX[0]


@contextmanager
def active(ctx: BucketCtx):
    prev = _CTX[0]
    _CTX[0] = ctx
    try:
        yield ctx
    finally:
        _CTX[0] = prev
