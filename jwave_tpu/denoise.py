"""Wavelet denoising (shrinkage) — practical superset of the reference's
threshold-to-zero compressors (jwave/compressions/*).

Implements the standard MODWT-based shrinkage pipeline: decompose, estimate
the noise scale from the finest detail band (MAD), threshold the detail
coefficients (soft or hard, universal/VisuShrink threshold by default),
reconstruct. Shift-invariant by construction (MODWT), batched over leading
axes, jittable.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from .exceptions import JWaveFailure
from .transforms.modwt import imodwt, modwt


def soft_threshold(c, tau):
    """sign(c) * max(|c| - tau, 0)."""
    return jnp.sign(c) * jnp.maximum(jnp.abs(c) - tau, 0.0)


def hard_threshold(c, tau):
    """c if |c| > tau else 0."""
    return jnp.where(jnp.abs(c) > tau, c, 0.0)


def mad_sigma(detail):
    """Noise scale estimate: median(|W_1|) / 0.6745 (Donoho-Johnstone)."""
    return jnp.median(jnp.abs(detail), axis=-1) / 0.6745


def denoise(x, wavelet="db4", level: int = 4, mode: str = "soft", threshold=None):
    """MODWT wavelet shrinkage along the last axis.

    ``threshold=None`` uses the universal threshold sigma*sqrt(2 ln N) with
    sigma estimated per level-1 detail band via MAD. ``mode`` is 'soft' or
    'hard'. Returns the denoised signal (same shape/dtype as ``x``).
    """
    if mode not in ("soft", "hard"):
        raise JWaveFailure(f"denoise - unknown mode {mode!r} (use 'soft' or 'hard')")
    coeffs = modwt(x, wavelet, level)  # (..., J+1, N)
    n = coeffs.shape[-1]
    if threshold is None:
        sigma = mad_sigma(coeffs[..., 0, :])  # finest detail band
        tau = sigma * math.sqrt(2.0 * math.log(max(n, 2)))
    else:
        tau = jnp.asarray(threshold)
    tau = jnp.asarray(tau)[..., None, None]
    shrink = soft_threshold if mode == "soft" else hard_threshold
    details = shrink(coeffs[..., :level, :], tau)
    kept = jnp.concatenate([details, coeffs[..., level:, :]], axis=-2)  # V_J untouched
    return imodwt(kept, wavelet)
