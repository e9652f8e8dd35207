"""Continuous wavelet base class.

Reference: jwave/transforms/wavelets/continuous/ContinuousWavelet.java.
Subclasses implement vectorized :meth:`psi` and :meth:`psi_hat`; the scaled
and translated variants are provided here via the standard identities
(ContinuousWavelet.java:90-141).
"""
from __future__ import annotations

import jax.numpy as jnp


def to_complex(val):
    """float array -> matching-precision complex array."""
    return val.astype(jnp.complex128 if val.dtype == jnp.float64 else jnp.complex64)



class ContinuousWavelet:
    name: str = "continuous"
    center_frequency: float = 0.0
    #: True when psi_hat is (numerically) supported on positive frequencies
    #: only — required by synchrosqueezing's instantaneous-frequency estimate.
    is_analytic: bool = False

    def psi(self, t):
        """Mother wavelet psi(t); accepts/returns jnp arrays (complex)."""
        raise NotImplementedError

    def psi_hat(self, omega):
        """Fourier transform of psi at angular frequency omega (complex)."""
        raise NotImplementedError

    def psi_scaled(self, t, scale, translation=0.0):
        """psi_{a,b}(t) = psi((t-b)/a)/sqrt(a) (ContinuousWavelet.java:90-102)."""
        return self.psi((t - translation) / scale) / jnp.sqrt(scale)

    def psi_hat_scaled(self, omega, scale, translation=0.0):
        """F[psi_{a,b}](w) = sqrt(a)*exp(-iwb)*psi_hat(a*w)
        (ContinuousWavelet.java:111-141)."""
        ft = self.psi_hat(scale * omega) * jnp.sqrt(scale)
        if translation != 0.0:
            ft = ft * jnp.exp(-1j * omega * translation)
        return ft

    def admissibility_constant(self) -> float:
        raise NotImplementedError

    def effective_support(self) -> tuple[float, float]:
        """[min_t, max_t] where the wavelet is significant."""
        raise NotImplementedError

    def bandwidth(self) -> tuple[float, float]:
        """[min_f, max_f] (ordinary frequency) of significant response."""
        raise NotImplementedError
