"""Coefficient compression (threshold-to-zero).

Reference: jwave/compressions/Compressor.java:97-191,
CompressorMagnitude.java:73-134, CompressorPeaksAverage.java:66-125.
All variants reduce to one fused ``jnp.where`` over the whole array.
"""
from __future__ import annotations

import jax.numpy as jnp

from .exceptions import JWaveFailure


class Compressor:
    """Keep coefficients with |c| >= magnitude * threshold, zero the rest
    (Compressor.java:97-170). ``magnitude`` is supplied by subclasses."""

    def __init__(self, threshold: float = 1.0):
        if threshold <= 0.0:
            raise JWaveFailure("Compressor - given threshold should be larger than zero!")
        self.threshold = float(threshold)
        self.magnitude = 0.0

    def _magnitude(self, data) -> jnp.ndarray:
        raise NotImplementedError

    def compress(self, data):
        """Threshold any-rank coefficient array (1D/2D/3D in the reference)."""
        mag = self._magnitude(data)
        self.magnitude = mag
        return jnp.where(jnp.abs(data) >= mag * self.threshold, data, 0.0)

    @staticmethod
    def compression_rate(data) -> jnp.ndarray:
        """Percentage of exact zeros (Compressor.java:182-191)."""
        return jnp.mean((data == 0.0).astype(jnp.float64 if data.dtype == jnp.float64 else jnp.float32)) * 100.0


class CompressorMagnitude(Compressor):
    """magnitude = mean(|c|) (CompressorMagnitude.java:73-134)."""

    def _magnitude(self, data):
        return jnp.mean(jnp.abs(data))


class CompressorPeaksAverage(Compressor):
    """magnitude = (max(|c|) - min_peak)/2 with the reference's min_peak
    semantics: it starts at 0 and |c| can never go below it, so min_peak is
    always 0 and magnitude = max(|c|)/2 (CompressorPeaksAverage.java:66-125)."""

    def _magnitude(self, data):
        return 0.5 * jnp.max(jnp.abs(data))
