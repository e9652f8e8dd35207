"""Ancient Egyptian Decomposition — arbitrary lengths for pow-2 transforms.

Reference: jwave/transforms/AncientEgyptianDecomposition.java:97-185 — the
signal is split (host-side) into power-of-two chunks by binary
decomposition of N; each chunk is transformed independently. Chunk shapes
are static at trace time, so each chunk size compiles once and is cached by
jit like any other shape.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.numerics import ancient_egyptian_decompose


def _chunks(n: int):
    offs, sizes, off = [], [], 0
    for p in ancient_egyptian_decompose(n):
        size = 1 << p
        offs.append(off)
        sizes.append(size)
        off += size
    return offs, sizes


def aed_forward(x, transform_fn):
    """Apply ``transform_fn`` to each power-of-two chunk along the last axis.

    ``transform_fn(chunk)`` must transform the last axis and preserve shape
    (e.g. ``lambda c: fwt(c, "db4")``).
    """
    offs, sizes = _chunks(x.shape[-1])
    parts = [transform_fn(x[..., o : o + s]) for o, s in zip(offs, sizes)]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


def aed_reverse(y, inverse_fn):
    """Inverse of :func:`aed_forward` with the matching inverse transform."""
    offs, sizes = _chunks(y.shape[-1])
    parts = [inverse_fn(y[..., o : o + s]) for o, s in zip(offs, sizes)]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
