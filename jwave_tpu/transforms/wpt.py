"""Wavelet Packet Transform — packets as a free batch axis.

Reference: jwave/transforms/WaveletPacketTransform.java:96-189 — at level l
the butterfly is applied to all ``g = N/h`` packets of length ``h``. The
reference parallelizes this with a ForkJoinPool
(ParallelWaveletPacketTransform.java:197-233, thresholds packet>=64 and
count>=8); on TPU the packet axis is simply a reshape into a leading batch
dimension of one fused conv kernel — every packet is processed by the same
instruction stream with no thresholds, task trees, or pools.
"""
from __future__ import annotations

from ..exceptions import JWaveFailure
from ..filters import get_filter
from ..ops.butterfly import butterfly_forward, butterfly_reverse
from ..utils.numerics import exponent_of_two, is_power_of_two


def wpt(x, wavelet, level: int | None = None):
    """Forward WPT along the last axis (length 2^p), batched over the rest."""
    fb = get_filter(wavelet)
    n = x.shape[-1]
    if not is_power_of_two(n):
        raise JWaveFailure(f"wpt - length {n} is not 2^p; use AED for arbitrary lengths")
    steps = exponent_of_two(n)
    if level is None:
        level = steps
    if level < 0 or level > steps:
        raise JWaveFailure(f"wpt - level {level} out of range [0, {steps}]")
    lead = x.shape[:-1]
    h = n
    l = 0
    while h >= fb.transform_wavelength and l < level:
        g = n // h
        packets = x.reshape(lead + (g, h))
        packets = butterfly_forward(packets, fb.dec_lo, fb.dec_hi)
        x = packets.reshape(lead + (n,))
        h >>= 1
        l += 1
    return x


def iwpt(y, wavelet, level: int | None = None):
    """Inverse WPT along the last axis (WaveletPacketTransform.java:141-189)."""
    fb = get_filter(wavelet)
    n = y.shape[-1]
    if not is_power_of_two(n):
        raise JWaveFailure(f"iwpt - length {n} is not 2^p; use AED for arbitrary lengths")
    steps = exponent_of_two(n)
    if level is None:
        level = steps
    if level < 0 or level > steps:
        raise JWaveFailure(f"iwpt - level {level} out of range [0, {steps}]")
    lead = y.shape[:-1]
    h = fb.transform_wavelength << (steps - level)
    while h <= n and h >= fb.transform_wavelength:
        g = n // h
        packets = y.reshape(lead + (g, h))
        packets = butterfly_reverse(packets, fb.rec_lo, fb.rec_hi, fb.recon_gain)
        y = packets.reshape(lead + (n,))
        h <<= 1
    return y
