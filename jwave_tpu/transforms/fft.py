"""DFT / FFT with the reference's conventions.

Reference: jwave/transforms/FastFourierTransform.java — Cooley-Tukey
radix-2 plus Bluestein chirp-z for arbitrary N, NumPy normalization
(forward unscaled, inverse 1/N, FastFourierTransform.java:205-211), and an
interleaved [re0, im0, re1, im1, ...] real-array API
(FastFourierTransform.java:55-103); jwave/transforms/
DiscreteFourierTransform.java:73-117 is the naive O(N^2) variant.

TPU design: ``jnp.fft`` is XLA-native for any N (Bluestein handled inside
XLA), so both radix-2 and chirp-z collapse to one primitive. The naive DFT
is kept for parity testing, formulated as a dense matmul — which on TPU
runs on the MXU and is genuinely fast for small N.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .ndim import deinterleave, interleave


def fft(z, axis: int = -1):
    """Forward FFT on complex input (forward unscaled — NumPy convention)."""
    return jnp.fft.fft(z, axis=axis)


def ifft(z, axis: int = -1):
    """Inverse FFT on complex input (scaled by 1/N)."""
    return jnp.fft.ifft(z, axis=axis)


def fft_interleaved(x):
    """FFT on the reference's interleaved real format
    (FastFourierTransform.java:55-103): (..., 2N) -> (..., 2N)."""
    return interleave(fft(deinterleave(x)))


def ifft_interleaved(x):
    """Inverse of :func:`fft_interleaved`."""
    return interleave(ifft(deinterleave(x)))


def _dft_matrix(n: int, sign: float) -> np.ndarray:
    k = np.arange(n)
    return np.exp(sign * 2j * np.pi * np.outer(k, k) / n)


def dft(z):
    """Naive O(N^2) DFT as a dense matmul (DiscreteFourierTransform.java:73-117).

    Kept for parity with the reference's DiscreteFourierTransform; on TPU the
    matmul form maps onto the MXU.
    """
    n = z.shape[-1]
    w = jnp.asarray(_dft_matrix(n, -1.0), dtype=jnp.result_type(z, np.complex64))
    return z @ w.T


def idft(z):
    """Inverse naive DFT (scaled by 1/N)."""
    n = z.shape[-1]
    w = jnp.asarray(_dft_matrix(n, +1.0), dtype=jnp.result_type(z, np.complex64))
    return (z @ w.T) / n


def dft_interleaved(x):
    """Naive DFT on interleaved real format (DiscreteFourierTransform.java:73-117)."""
    return interleave(dft(deinterleave(x)))


def idft_interleaved(x):
    """Inverse naive DFT on interleaved real format."""
    return interleave(idft(deinterleave(x)))
