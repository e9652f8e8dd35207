"""Separable 2D/3D drivers and complex bridging.

Reference: jwave/transforms/BasicTransform.java — 2D = per-row then
per-column 1D transforms (:361-399), 3D = per-slice 2D then per-pillar 1D
(:509-566), complex = interleave re/im into a length-2N real array
(:257-322). The reference's row/column Java loops (and their ForkJoinPool
decorator, ParallelTransform.java:70-126) collapse here into batched
transforms along the last axis plus transposes — XLA turns each axis pass
into one fused kernel over all rows at once.
"""
from __future__ import annotations

import jax.numpy as jnp


def forward_2d(fn1d, mat, level_rows: int | None = None, level_cols: int | None = None):
    """2D separable forward: rows (last axis) then columns (second-to-last).

    ``fn1d(x, level)`` must transform the last axis. ``level_rows`` bounds
    the transform applied along columns-direction (length = #rows) and
    ``level_cols`` the one along each row (length = #cols), matching
    BasicTransform.forward(matTime, lvlM, lvlN) (BasicTransform.java:361-399).
    """
    y = fn1d(mat, level_cols)
    y = jnp.swapaxes(y, -1, -2)
    y = fn1d(y, level_rows)
    return jnp.swapaxes(y, -1, -2)


def reverse_2d(fn1d_rev, mat, level_rows: int | None = None, level_cols: int | None = None):
    """2D separable inverse (BasicTransform.java:412-474)."""
    y = fn1d_rev(mat, level_cols)
    y = jnp.swapaxes(y, -1, -2)
    y = fn1d_rev(y, level_rows)
    return jnp.swapaxes(y, -1, -2)


def forward_3d(fn1d, spc, level_p: int | None = None, level_q: int | None = None, level_r: int | None = None):
    """3D separable forward over the last three axes
    (BasicTransform.java:487-566): rows, columns, then pillars."""
    y = fn1d(spc, level_r)
    y = jnp.swapaxes(y, -1, -2)
    y = fn1d(y, level_q)
    y = jnp.swapaxes(y, -1, -2)
    y = jnp.moveaxis(y, -3, -1)
    y = fn1d(y, level_p)
    return jnp.moveaxis(y, -1, -3)


def reverse_3d(fn1d_rev, spc, level_p: int | None = None, level_q: int | None = None, level_r: int | None = None):
    """3D separable inverse."""
    y = fn1d_rev(spc, level_r)
    y = jnp.swapaxes(y, -1, -2)
    y = fn1d_rev(y, level_q)
    y = jnp.swapaxes(y, -1, -2)
    y = jnp.moveaxis(y, -3, -1)
    y = fn1d_rev(y, level_p)
    return jnp.moveaxis(y, -1, -3)


def interleave(z):
    """complex (..., N) -> real (..., 2N) as [re0, im0, re1, im1, ...]
    (BasicTransform.java:257-276)."""
    re = jnp.real(z)
    im = jnp.imag(z)
    return jnp.stack([re, im], axis=-1).reshape(z.shape[:-1] + (2 * z.shape[-1],))


def deinterleave(x):
    """real (..., 2N) -> complex (..., N)."""
    n = x.shape[-1] // 2
    pairs = x.reshape(x.shape[:-1] + (n, 2))
    return pairs[..., 0] + 1j * pairs[..., 1]


def forward_complex(fn1d_real, z, level: int | None = None):
    """Complex 1D via the interleaved-real bridge (BasicTransform.java:257-292)."""
    return deinterleave(fn1d_real(interleave(z), level))


def reverse_complex(fn1d_real_rev, z, level: int | None = None):
    """Inverse complex bridge (BasicTransform.java:294-322)."""
    return deinterleave(fn1d_real_rev(interleave(z), level))
