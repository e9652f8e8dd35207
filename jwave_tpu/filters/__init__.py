"""Discrete wavelet filter-bank registry.

The reference models filter banks as 67 Java classes (jwave/transforms/
wavelets/*/*.java) built by quadrature-mirror construction
(Wavelet.java:104-122) or biorthogonal cross-flip (BiOrthogonal.java:43-66).
Here every bank is a plain data record of four float64 coefficient vectors —
trace-time constants that XLA folds into compiled programs (HBM-resident
const tables; no runtime construction or caching is needed).

Names match the reference's WaveletBuilder strings exactly ("Haar",
"Daubechies 4", "Symlet 8", "BiOrthogonal 3/5", ...); short PyWavelets-style
aliases ("haar", "db4", "sym8", "bior3.5", "coif2") are also accepted.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..exceptions import JWaveNotKnown
from .data import FILTERS


@dataclass(frozen=True)
class FilterBank:
    """One discrete wavelet filter bank (analysis + synthesis filters).

    ``dec_lo[j]`` multiplies ``x[(2i+j) mod h]`` in the analysis butterfly
    (reference Wavelet.java:236-260); ``rec_lo``/``rec_hi`` drive the adjoint
    synthesis butterfly (Wavelet.java:277-303). ``recon_gain`` is a per-level
    energy correction applied in synthesis (1.0 for all banks except
    "Haar orthogonal", which uses 0.5 — Haar1Orthogonal.java:160-203).
    """

    name: str
    family: str
    dec_lo: np.ndarray
    dec_hi: np.ndarray
    rec_lo: np.ndarray
    rec_hi: np.ndarray
    transform_wavelength: int = 2
    recon_gain: float = 1.0
    in_builder: bool = True
    junit_passing: bool = True

    @property
    def length(self) -> int:
        """Filter length (the reference's ``_motherWavelength``)."""
        return int(self.dec_lo.shape[0])

    def __post_init__(self):
        for f in ("dec_lo", "dec_hi", "rec_lo", "rec_hi"):
            object.__setattr__(self, f, np.asarray(getattr(self, f), dtype=np.float64))


def _build_registry() -> dict[str, FilterBank]:
    reg = {}
    for name, e in FILTERS.items():
        reg[name] = FilterBank(
            name=name,
            family=e["family"],
            dec_lo=np.array(e["dec_lo"]),
            dec_hi=np.array(e["dec_hi"]),
            rec_lo=np.array(e["rec_lo"]),
            rec_hi=np.array(e["rec_hi"]),
            transform_wavelength=e["transform_wavelength"],
            recon_gain=e["recon_gain"],
            in_builder=e["in_builder"],
            junit_passing=e["junit_passing"],
        )
    return reg


_REGISTRY = _build_registry()


def _aliases() -> dict[str, str]:
    al = {}
    for name, e in FILTERS.items():
        fam = e["family"]
        if name == "Haar":
            al["haar"] = al["haar1"] = al["db1"] = name
        elif name == "Haar orthogonal":
            al["haarorthogonal"] = name
        elif fam == "daubechies":
            al["db" + name.split()[-1]] = name
        elif fam == "symlets":
            al["sym" + name.split()[-1]] = name
        elif fam == "coiflet":
            al["coif" + name.split()[-1]] = name
        elif fam == "legendre":
            al["legendre" + name.split()[-1]] = name
        elif fam == "biorthogonal":
            a, b = name.split()[-1].split("/")
            al[f"bior{a}.{b}"] = name
        elif name == "Discrete Meyer":
            al["dmey"] = name
        elif name == "CDF 5/3":
            al["cdf5.3"] = name
        elif name == "CDF 9/7":
            al["cdf9.7"] = name
        elif name == "Battle 23":
            al["battle23"] = name
    return al


_ALIASES = _aliases()


def get_filter(name) -> FilterBank:
    """Look up a filter bank by reference name or PyWavelets-style alias.

    Replaces the reference's WaveletBuilder.create string factory
    (WaveletBuilder.java:107-379) — here *all* 67 banks are creatable,
    including the ones the reference's builder refuses (Battle 23, CDF 5/3,
    CDF 9/7); their ``in_builder=False`` flag records that parity fact.
    """
    if isinstance(name, FilterBank):
        return name
    if name in _REGISTRY:
        return _REGISTRY[name]
    key = str(name).lower().replace(" ", "").replace("_", "")
    if key in _ALIASES:
        return _REGISTRY[_ALIASES[key]]
    raise JWaveNotKnown(
        f"unknown wavelet {name!r}; available: {sorted(_REGISTRY)} "
        f"or aliases like 'db4', 'sym8', 'coif2', 'bior3.5'"
    )


def available_filters() -> list[str]:
    """All registered filter-bank names (reference order-independent)."""
    return sorted(_REGISTRY)


def junit_passing_filters() -> list[FilterBank]:
    """The banks the reference's create2arr() exposes to its JUnit sweep
    (WaveletBuilder.java:430-504) — the perfect-reconstruction set."""
    return [fb for fb in _REGISTRY.values() if fb.junit_passing]
