"""Continuous (CWT) mother wavelets as jittable function pairs.

Each wavelet provides vectorized ``psi(t)`` (time domain) and
``psi_hat(omega)`` (analytic Fourier transform) evaluations, plus the
scale/translation identities of the reference base class
(jwave/transforms/wavelets/continuous/ContinuousWavelet.java:90-141):

    psi_{a,b}(t)       = psi((t-b)/a) / sqrt(a)
    psi_hat_{a,b}(w)   = sqrt(a) * exp(-i*w*b) * psi_hat(a*w)
"""
from .base import ContinuousWavelet
from .morlet import MorletWavelet
from .mexhat import MexicanHatWavelet
from .paul import PaulWavelet
from .dog import DOGWavelet
from .meyer import MeyerWavelet
from .morse import MorseWavelet

__all__ = [
    "ContinuousWavelet",
    "MorletWavelet",
    "MexicanHatWavelet",
    "PaulWavelet",
    "DOGWavelet",
    "MeyerWavelet",
    "MorseWavelet",
    "get_continuous_wavelet",
]

_FACTORIES = {
    "morlet": MorletWavelet,
    "mexicanhat": MexicanHatWavelet,
    "mexican hat": MexicanHatWavelet,
    "ricker": MexicanHatWavelet,
    "paul": PaulWavelet,
    "dog": DOGWavelet,
    "meyer": MeyerWavelet,
    "morse": MorseWavelet,
}


def get_continuous_wavelet(name, *args, **kwargs) -> ContinuousWavelet:
    """Create a continuous wavelet by name (case-insensitive)."""
    if isinstance(name, ContinuousWavelet):
        return name
    key = str(name).lower().strip()
    if key not in _FACTORIES:
        from ..exceptions import JWaveNotKnown

        raise JWaveNotKnown(f"unknown continuous wavelet {name!r}; available: {sorted(set(_FACTORIES))}")
    return _FACTORIES[key](*args, **kwargs)
