"""Wavelet Packet Transform — packets as a free batch axis, levels fused.

Reference: jwave/transforms/WaveletPacketTransform.java:96-189 — at level l
the butterfly is applied to all ``g = N/h`` packets of length ``h``. The
reference parallelizes this with a ForkJoinPool
(ParallelWaveletPacketTransform.java:197-233, thresholds packet>=64 and
count>=8); on TPU the packet axis is simply a reshape into a leading batch
dimension — and, further, up to 6 consecutive levels are fused into ONE
strided circular convolution with a composite (noble-identity) filter bank
(see jwave_tpu.ops.composite), cutting HBM traffic by the fusion factor.
"""
from __future__ import annotations

from ..exceptions import JWaveFailure
from ..filters import get_filter
from ..ops.butterfly import butterfly_forward, butterfly_reverse
from ..ops.composite import wpt_fused_forward, wpt_fused_inverse
from ..utils.numerics import exponent_of_two, is_power_of_two

#: max levels fused into one composite conv (2^6 = 64 output channels)
FUSE_MAX_LEVELS = 6
#: cap on composite filter length (keeps the conv arithmetic reasonable)
FUSE_MAX_TAPS = 512


def _chunk_schedule(n: int, level: int, fb) -> list[tuple[int, int]]:
    """[(packet_size_h, fused_levels_c), ...] covering `level` levels.

    Mirrors the sequential loop's stopping rule: the c-th fused level
    operates on blocks of size h >> (c-1), which must be >= the bank's
    transform wavelength (WaveletPacketTransform.java:100).
    """
    m = fb.length
    sched = []
    h = n
    l = 0
    while h >= fb.transform_wavelength and l < level:
        c = min(FUSE_MAX_LEVELS, level - l)
        while c > 1 and (h >> (c - 1)) < fb.transform_wavelength:
            c -= 1
        while c > 1 and (m - 1) * ((1 << c) - 1) + 1 > FUSE_MAX_TAPS:
            c -= 1
        sched.append((h, c))
        h >>= c
        l += c
    return sched


def wpt(x, wavelet, level: int | None = None, fused: bool = True):
    """Forward WPT along the last axis (length 2^p), batched over the rest."""
    import jax.numpy as jnp

    fb = get_filter(wavelet)
    x = jnp.asarray(x)
    n = x.shape[-1]
    if not is_power_of_two(n):
        raise JWaveFailure(f"wpt - length {n} is not 2^p; use AED for arbitrary lengths")
    steps = exponent_of_two(n)
    if level is None:
        level = steps
    if level < 0 or level > steps:
        raise JWaveFailure(f"wpt - level {level} out of range [0, {steps}]")
    lead = x.shape[:-1]
    for h, c in _chunk_schedule(n, level, fb):
        g = n // h
        packets = x.reshape(lead + (g, h))
        if fused and c > 1:
            packets = wpt_fused_forward(packets, fb.dec_lo, fb.dec_hi, c)
        else:
            for l in range(c):
                hh = h >> l
                sub = packets.reshape(lead + (n // hh, hh))
                packets = butterfly_forward(sub, fb.dec_lo, fb.dec_hi)
            packets = packets.reshape(lead + (g, h))
        x = packets.reshape(lead + (n,))
    return x


def iwpt(y, wavelet, level: int | None = None, fused: bool = True):
    """Inverse WPT along the last axis (WaveletPacketTransform.java:141-189)."""
    import jax.numpy as jnp

    fb = get_filter(wavelet)
    y = jnp.asarray(y)
    n = y.shape[-1]
    if not is_power_of_two(n):
        raise JWaveFailure(f"iwpt - length {n} is not 2^p; use AED for arbitrary lengths")
    steps = exponent_of_two(n)
    if level is None:
        level = steps
    if level < 0 or level > steps:
        raise JWaveFailure(f"iwpt - level {level} out of range [0, {steps}]")
    lead = y.shape[:-1]
    for h, c in reversed(_chunk_schedule(n, level, fb)):
        g = n // h
        packets = y.reshape(lead + (g, h))
        if fused and c > 1:
            packets = wpt_fused_inverse(packets, fb.rec_lo, fb.rec_hi, c, fb.recon_gain)
        else:
            for l in range(c - 1, -1, -1):
                hh = h >> l
                sub = packets.reshape(lead + (n // hh, hh))
                packets = butterfly_reverse(sub, fb.rec_lo, fb.rec_hi, fb.recon_gain)
            packets = packets.reshape(lead + (g, h))
        y = packets.reshape(lead + (n,))
    return y
