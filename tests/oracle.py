"""Naive NumPy oracle implementations mirroring the reference semantics.

These are deliberately slow, loop-based transcriptions of the reference's
*mathematical definitions* (cited per function) used only to cross-validate
the TPU-native kernels — the same role the reference's PyWavelets golden
vectors play for it (reference scripts/generate_reference_data.py).
"""
from __future__ import annotations

import numpy as np


def butterfly_forward(x: np.ndarray, dec_lo, dec_hi) -> np.ndarray:
    """Wavelet.java:236-260."""
    h = x.shape[0]
    half = h // 2
    out = np.zeros(h)
    for i in range(half):
        for j in range(len(dec_lo)):
            k = (2 * i + j) % h
            out[i] += x[k] * dec_lo[j]
            out[i + half] += x[k] * dec_hi[j]
    return out


def butterfly_reverse(y: np.ndarray, rec_lo, rec_hi, recon_gain=1.0) -> np.ndarray:
    """Wavelet.java:277-303 (+ Haar1Orthogonal.java:160-203 gain)."""
    h = y.shape[0]
    half = h // 2
    out = np.zeros(h)
    for i in range(half):
        for j in range(len(rec_lo)):
            k = (2 * i + j) % h
            out[k] += recon_gain * (y[i] * rec_lo[j] + y[i + half] * rec_hi[j])
    return out


def fwt(x: np.ndarray, fb, level: int) -> np.ndarray:
    """FastWaveletTransform.java:71-101."""
    arr = x.copy()
    h = arr.shape[0]
    l = 0
    while h >= fb.transform_wavelength and l < level:
        arr[:h] = butterfly_forward(arr[:h], fb.dec_lo, fb.dec_hi)
        h >>= 1
        l += 1
    return arr


def ifwt(y: np.ndarray, fb, level: int) -> np.ndarray:
    """FastWaveletTransform.java:119-153."""
    arr = y.copy()
    n = arr.shape[0]
    steps = n.bit_length() - 1
    h = fb.transform_wavelength << (steps - level)
    while h <= n and h >= fb.transform_wavelength:
        arr[:h] = butterfly_reverse(arr[:h], fb.rec_lo, fb.rec_hi, fb.recon_gain)
        h <<= 1
    return arr


def wpt(x: np.ndarray, fb, level: int) -> np.ndarray:
    """WaveletPacketTransform.java:96-124."""
    arr = x.copy()
    n = arr.shape[0]
    h = n
    l = 0
    while h >= fb.transform_wavelength and l < level:
        g = n // h
        for p in range(g):
            arr[p * h : (p + 1) * h] = butterfly_forward(arr[p * h : (p + 1) * h], fb.dec_lo, fb.dec_hi)
        h >>= 1
        l += 1
    return arr


def modwt_base_filters(fb):
    """MODWTTransform.java:469-475."""
    g = np.array(fb.dec_lo, dtype=np.float64)
    h = np.array(fb.dec_hi, dtype=np.float64)
    g = g / np.linalg.norm(g) / np.sqrt(2.0)
    h = h / np.linalg.norm(h) / np.sqrt(2.0)
    return g, h


def upsample(f: np.ndarray, level: int) -> np.ndarray:
    """MODWTTransform.java:618-630."""
    if level <= 1:
        return f
    gap = (1 << (level - 1)) - 1
    out = np.zeros(len(f) + (len(f) - 1) * gap)
    out[:: gap + 1] = f
    return out


def circular_convolve(x: np.ndarray, f: np.ndarray) -> np.ndarray:
    """MODWTTransform.java:677-690."""
    n = len(x)
    out = np.zeros(n)
    for i in range(n):
        for m in range(len(f)):
            out[i] += x[(i - m) % n] * f[m]
    return out


def circular_convolve_adjoint(x: np.ndarray, f: np.ndarray) -> np.ndarray:
    """MODWTTransform.java:703-716."""
    n = len(x)
    out = np.zeros(n)
    for i in range(n):
        for m in range(len(f)):
            out[i] += x[(i + m) % n] * f[m]
    return out


def modwt(x: np.ndarray, fb, level: int) -> np.ndarray:
    """MODWTTransform.java:256-306 (direct convolution path)."""
    g0, h0 = modwt_base_filters(fb)
    rows = []
    v = x.astype(np.float64).copy()
    for j in range(1, level + 1):
        gj = upsample(g0, j)
        hj = upsample(h0, j)
        rows.append(circular_convolve(v, hj))
        v = circular_convolve(v, gj)
    rows.append(v)
    return np.stack(rows)


def imodwt(coeffs: np.ndarray, fb) -> np.ndarray:
    """MODWTTransform.java:337-375 (direct adjoint path)."""
    level = coeffs.shape[0] - 1
    g0, h0 = modwt_base_filters(fb)
    v = coeffs[level].copy()
    for j in range(level, 0, -1):
        gj = upsample(g0, j)
        hj = upsample(h0, j)
        v = circular_convolve_adjoint(v, gj) + circular_convolve_adjoint(coeffs[j - 1], hj)
    return v


def cwt_direct(signal: np.ndarray, scales, wav, fs: float = 1.0) -> np.ndarray:
    """ContinuousWaveletTransform.java:146-172, :240-260 — per-coefficient
    direct numerical integration using the wavelet's effective support."""
    n = len(signal)
    dt = 1.0 / fs
    lo_s, hi_s = wav.effective_support()
    out = np.zeros((len(scales), n), dtype=np.complex128)
    for si, a in enumerate(scales):
        for t in range(n):
            lo = max(0, t + int(lo_s * a * fs))
            hi = min(n - 1, t + int(hi_s * a * fs))
            s = 0.0 + 0.0j
            for i in range(lo, hi + 1):
                tt = (i - t) * dt
                s += np.conj(complex(np.asarray(wav.psi(tt / a)))) / np.sqrt(a) * signal[i]
            out[si, t] = s * dt
    return out
