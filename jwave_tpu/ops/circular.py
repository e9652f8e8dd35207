"""Circular convolution primitives for MODWT (direct and FFT paths).

Semantics (reference MODWTTransform.java):

    conv:    out[n] = sum_m f[m] * x[(n-m) mod N]     (:677-690)
    adjoint: out[n] = sum_m f[m] * x[(n+m) mod N]     (:703-716)
    FFT:     irfft(rfft(x) * rfft(wrap(f, N)))        (:752-786)
    FFT adj: irfft(rfft(x) * conj(rfft(wrap(f, N)))) (:798-837)

Filters longer than the signal are wrapped (accumulated modulo N) first
(:729-741). Filters are host-side numpy constants; everything else is
batched, statically shaped jnp — the FFT filter spectra become trace-time
constants folded into the compiled program (the reference's runtime filter
cache, MODWTTransform.java:452-593, disappears by construction).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from .butterfly import ensure_float
from .. import config as _config


def wrap_filter(f: np.ndarray, n: int) -> np.ndarray:
    """Accumulate filter taps modulo ``n`` (MODWTTransform.java:729-741)."""
    f = np.asarray(f, dtype=np.float64)
    if f.shape[0] <= n:
        return f
    out = np.zeros(n, dtype=np.float64)
    np.add.at(out, np.arange(f.shape[0]) % n, f)
    return out


def _conv_valid(flat, kernel, dtype):
    """(B, L) x (M,) -> (B, L-M+1) cross-correlation via XLA conv."""
    out = lax.conv_general_dilated(
        flat[:, None, :],
        jnp.asarray(kernel, dtype=dtype)[None, None, :],
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=dtype,
        precision=_config.conv_precision(),
    )
    return out[:, 0, :]


def _conv_valid_bank(flat, kernels, dtype):
    """(B, L) x (K, M) -> (B, K, L-M+1): one conv program applies a whole
    bank of same-length kernels (K output channels) to every row."""
    out = lax.conv_general_dilated(
        flat[:, None, :],
        jnp.asarray(kernels, dtype=dtype)[:, None, :],
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=dtype,
        precision=_config.conv_precision(),
    )
    return out


def circular_conv(x, f: np.ndarray):
    """Direct circular convolution, batched over leading dims of ``x``."""
    x = ensure_float(x)
    n = x.shape[-1]
    fw = wrap_filter(f, n)
    m = fw.shape[0]
    lead = x.shape[:-1]
    # out[n] = sum_j x_ext[n + j] * fw[M-1-j] with x_ext prepending last M-1
    pad = m - 1
    if pad:
        ext = jnp.concatenate([x[..., n - pad:], x], axis=-1)
    else:
        ext = x
    flat = ext.reshape((-1, n + pad))
    out = _conv_valid(flat, fw[::-1], x.dtype)
    return out.reshape(lead + (n,))


def circular_conv_adjoint(x, f: np.ndarray):
    """Direct adjoint circular convolution (transpose of :func:`circular_conv`)."""
    x = ensure_float(x)
    n = x.shape[-1]
    fw = wrap_filter(f, n)
    m = fw.shape[0]
    lead = x.shape[:-1]
    pad = m - 1
    if pad:
        ext = jnp.concatenate([x, x[..., :pad]], axis=-1)
    else:
        ext = x
    flat = ext.reshape((-1, n + pad))
    out = _conv_valid(flat, fw, x.dtype)
    return out.reshape(lead + (n,))


def filter_spectrum(f: np.ndarray, n: int) -> np.ndarray:
    """rfft of the length-``n`` wrapped filter (host-side, float64)."""
    fw = wrap_filter(f, n)
    if fw.shape[0] < n:
        fw = np.pad(fw, (0, n - fw.shape[0]))
    return np.fft.rfft(fw)


def circular_conv_fft(x, f: np.ndarray, f_hat=None):
    """FFT-path circular convolution. ``f_hat`` may be precomputed."""
    x = ensure_float(x)
    n = x.shape[-1]
    if f_hat is None:
        f_hat = filter_spectrum(f, n)
    spec = jnp.fft.rfft(x, axis=-1) * jnp.asarray(f_hat)
    return jnp.fft.irfft(spec, n=n, axis=-1).astype(x.dtype)


def circular_conv_adjoint_fft(x, f: np.ndarray, f_hat=None):
    """FFT-path adjoint circular convolution (conjugate filter spectrum)."""
    x = ensure_float(x)
    n = x.shape[-1]
    if f_hat is None:
        f_hat = filter_spectrum(f, n)
    spec = jnp.fft.rfft(x, axis=-1) * jnp.asarray(np.conj(f_hat) if isinstance(f_hat, np.ndarray) else jnp.conj(f_hat))
    return jnp.fft.irfft(spec, n=n, axis=-1).astype(x.dtype)
