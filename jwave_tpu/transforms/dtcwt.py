"""Dual-tree complex wavelet transform (Kingsbury 1998-2001; Selesnick,
Baraniuk & Kingsbury 2005) — capability superset.

Two parallel orthonormal DWT trees whose wavelets form an approximate
Hilbert pair: complex coefficients ``w = (d_a + i d_b)/sqrt(2)`` whose
MAGNITUDE is nearly shift-invariant (the classic DWT's aliasing-driven
energy shuffling under 1-sample shifts mostly cancels), at 2x (1D) / 4x
(2D) redundancy, with perfect reconstruction and — in 2D — six
direction-selective oriented subbands (+-15, +-45, +-75 degrees), which a
separable real DWT fundamentally cannot produce (its HH band mixes +45
and -45).

Tree construction:
- Level 1: one orthonormal bank (default sym4) for tree A; tree B is the
  SAME bank applied to the signal advanced by one sample (the standard
  one-sample-delay offset).
- Levels >= 2: the q-shift pair from :mod:`jwave_tpu.filters.qshift` —
  one designed length-14 orthonormal lowpass for tree A and its time
  reverse for tree B, so the trees stay half a sample apart at every
  scale (the Hilbert-pair condition).

TPU formulation: each tree level is the SAME batched stride-2
circular-convolution butterfly the FWT uses (ops/butterfly.py — single
``lax.conv_general_dilated`` per level, MXU-eligible); the two trees (four
in 2D) ride the same compiled program as extra batch rows. Level loops
unroll at trace time; everything is jit/vmap/grad-compatible and batches
over leading axes. Inverse = each tree's exact adjoint synthesis,
averaged (each tree alone reconstructs perfectly; the average keeps the
coefficient-domain processing consistent between trees).
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..exceptions import JWaveFailure
from ..filters import get_filter
from ..filters.qshift import qshift_filters
from ..ops.butterfly import butterfly_forward, butterfly_reverse, ensure_float

_SQRT2 = math.sqrt(2.0)


def _check_args(n: int, levels: int, who: str, axis: str = "last-axis"):
    if levels < 1:
        raise JWaveFailure(f"{who} - levels must be >= 1")
    if n % (1 << levels) != 0:
        raise JWaveFailure(
            f"{who} - {axis} length {n} must be divisible by 2^levels = "
            f"{1 << levels}"
        )
    if n >> levels < 1:
        raise JWaveFailure(f"{who} - {levels} levels exhaust {axis} length {n}")


# --------------------------------------------------------------------------
# 1D
# --------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclass
class DTCWTResult:
    """1D dual-tree coefficients as a jax pytree.

    ``highpasses``: tuple over levels 1..J of complex (..., N/2^j) arrays
    ``(d_a + i d_b)/sqrt(2)``; ``lowpasses``: (..., 2, N/2^J) — both
    trees' final smooth bands (needed for inversion).
    """

    highpasses: tuple
    lowpasses: jnp.ndarray
    level1_wavelet: str

    def tree_flatten(self):
        return (self.highpasses, self.lowpasses), (self.level1_wavelet,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])

    @property
    def levels(self) -> int:
        return len(self.highpasses)

    def magnitudes(self):
        """Per-level |w| — the (nearly) shift-invariant envelopes."""
        return tuple(jnp.abs(h) for h in self.highpasses)


def dtcwt(signal, levels: int, level1_wavelet: str = "sym4") -> DTCWTResult:
    """Forward 1D DTCWT of (..., N) real signals (N divisible by 2^levels).

    Returns a :class:`DTCWTResult`; ``idtcwt`` inverts it exactly.
    """
    x = ensure_float(jnp.asarray(signal))
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        raise JWaveFailure("dtcwt - expected a real signal")
    _check_args(x.shape[-1], levels, "dtcwt")
    fb = get_filter(level1_wavelet)
    (h0a, h1a), (h0b, h1b) = qshift_filters()

    # level 1: tree B sees the signal advanced one sample
    ya = butterfly_forward(x, fb.dec_lo, fb.dec_hi)
    yb = butterfly_forward(jnp.roll(x, -1, axis=-1), fb.dec_lo, fb.dec_hi)
    half = x.shape[-1] // 2
    la, da = ya[..., :half], ya[..., half:]
    lb, db = yb[..., :half], yb[..., half:]
    highs = [jax.lax.complex(da, db) / _SQRT2]
    for _ in range(1, levels):
        ya = butterfly_forward(la, h0a, h1a)
        yb = butterfly_forward(lb, h0b, h1b)
        half //= 2
        la, da = ya[..., :half], ya[..., half:]
        lb, db = yb[..., :half], yb[..., half:]
        highs.append(jax.lax.complex(da, db) / _SQRT2)
    low = jnp.stack([la, lb], axis=-2)
    return DTCWTResult(tuple(highs), low, level1_wavelet)


def idtcwt(result: DTCWTResult) -> jnp.ndarray:
    """Inverse 1D DTCWT (exact; each tree reconstructs independently and
    the two reconstructions are averaged)."""
    fb = get_filter(result.level1_wavelet)
    (h0a, h1a), (h0b, h1b) = qshift_filters()
    la = result.lowpasses[..., 0, :]
    lb = result.lowpasses[..., 1, :]
    for j in range(result.levels - 1, 0, -1):
        w = result.highpasses[j] * _SQRT2
        la = butterfly_reverse(jnp.concatenate([la, w.real], axis=-1), h0a, h1a, 1.0)
        lb = butterfly_reverse(jnp.concatenate([lb, w.imag], axis=-1), h0b, h1b, 1.0)
    w = result.highpasses[0] * _SQRT2
    xa = butterfly_reverse(jnp.concatenate([la, w.real], axis=-1),
                           fb.rec_lo, fb.rec_hi, fb.recon_gain)
    xb = butterfly_reverse(jnp.concatenate([lb, w.imag], axis=-1),
                           fb.rec_lo, fb.rec_hi, fb.recon_gain)
    return 0.5 * (xa + jnp.roll(xb, 1, axis=-1))


# --------------------------------------------------------------------------
# 2D
# --------------------------------------------------------------------------

def _butterfly_axis(x, lo, hi, axis):
    """Analysis butterfly along ``axis`` (batched everywhere else)."""
    x = jnp.swapaxes(x, axis, -1)
    y = butterfly_forward(x, lo, hi)
    return jnp.swapaxes(y, axis, -1)


def _ibutterfly_axis(y, lo, hi, axis):
    y = jnp.swapaxes(y, axis, -1)
    x = butterfly_reverse(y, lo, hi, 1.0)
    return jnp.swapaxes(x, axis, -1)


@jax.tree_util.register_pytree_node_class
@dataclass
class DTCWT2DResult:
    """2D dual-tree coefficients as a jax pytree.

    ``highpasses``: tuple over levels of complex (..., 6, H/2^j, W/2^j)
    oriented subbands, ordered [+15, +45, +75, -75, -45, -15] degrees
    (angle measured from the horizontal axis of the image).
    ``lowpasses``: (..., 2, 2, H/2^J, W/2^J) — [row-tree, col-tree] final
    smooth bands.
    """

    highpasses: tuple
    lowpasses: jnp.ndarray
    level1_wavelet: str

    def tree_flatten(self):
        return (self.highpasses, self.lowpasses), (self.level1_wavelet,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])

    @property
    def levels(self) -> int:
        return len(self.highpasses)


_INV_SQRT2 = 1.0 / _SQRT2


def _combine(s_aa, s_ab, s_ba, s_bb):
    """Four real tree subbands -> two oriented complex subbands
    (Kingsbury's q2c: p = (s_aa + i s_ab)/sqrt2, q = (s_bb - i s_ba)/sqrt2,
    z = p -+ q). Unitary: |z_p|^2 + |z_m|^2 == sum of the tree energies.

    z_p responds to one diagonal direction, z_m to its mirror: the
    quadrature (Hilbert) structure across trees suppresses the opposite
    orientation that a separable real transform would mix in.
    """
    z_p = ((s_aa - s_bb) + 1j * (s_ab + s_ba)) * _INV_SQRT2
    z_m = ((s_aa + s_bb) + 1j * (s_ab - s_ba)) * _INV_SQRT2
    return z_p, z_m


def _split_quads(y2, h, w):
    """[[LL, LH], [HL, HH]] quadrants of a row+col butterflied image whose
    layout is [L | H] along each transformed axis."""
    return (y2[..., :h, :w], y2[..., :h, w:],
            y2[..., h:, :w], y2[..., h:, w:])


def dtcwt2d(image, levels: int, level1_wavelet: str = "sym4") -> DTCWT2DResult:
    """Forward 2D DTCWT of (..., H, W) real images (H, W divisible by
    2^levels). Six oriented complex subbands per level."""
    x = ensure_float(jnp.asarray(image))
    if x.ndim < 2:
        raise JWaveFailure("dtcwt2d - image must have at least 2 axes")
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        raise JWaveFailure("dtcwt2d - expected a real image")
    _check_args(x.shape[-1], levels, "dtcwt2d", "width")
    _check_args(x.shape[-2], levels, "dtcwt2d", "height")
    fb = get_filter(level1_wavelet)
    (h0a, h1a), (h0b, h1b) = qshift_filters()
    qa, qb = (h0a, h1a), (h0b, h1b)

    # ll[r][c]: lowpass image of (row-tree r, col-tree c)
    x_b_rows = jnp.roll(x, -1, axis=-2)
    highs = []
    h, w = x.shape[-2] // 2, x.shape[-1] // 2
    subs = {}
    for r, base_r in (("a", x), ("b", x_b_rows)):
        rowt = _butterfly_axis(base_r, fb.dec_lo, fb.dec_hi, -2)
        for c in ("a", "b"):
            base = rowt if c == "a" else jnp.roll(rowt, -1, axis=-1)
            y2 = _butterfly_axis(base, fb.dec_lo, fb.dec_hi, -1)
            subs[r + c] = _split_quads(y2, h, w)
    highs.append(_orient_stack(subs))
    ll = {rc: q[0] for rc, q in subs.items()}

    for _ in range(1, levels):
        h, w = h // 2, w // 2
        subs = {}
        for rc in ("aa", "ab", "ba", "bb"):
            lo_r, hi_r = qa if rc[0] == "a" else qb
            lo_c, hi_c = qa if rc[1] == "a" else qb
            y2 = _butterfly_axis(_butterfly_axis(ll[rc], lo_r, hi_r, -2),
                                 lo_c, hi_c, -1)
            subs[rc] = _split_quads(y2, h, w)
        highs.append(_orient_stack(subs))
        ll = {rc: q[0] for rc, q in subs.items()}

    low = jnp.stack([
        jnp.stack([ll["aa"], ll["ab"]], axis=-3),
        jnp.stack([ll["ba"], ll["bb"]], axis=-3),
    ], axis=-4)
    return DTCWT2DResult(tuple(highs), low, level1_wavelet)


def _orient_stack(subs):
    """(LH, HL, HH) x 4 trees -> (..., 6, h, w) oriented complex stack."""
    bands = []
    for qi in (1, 2, 3):  # LH (horizontal-ish), HL (vertical-ish), HH (diag)
        z_p, z_m = _combine(subs["aa"][qi], subs["ab"][qi],
                            subs["ba"][qi], subs["bb"][qi])
        bands.append((z_p, z_m))
    (lh_p, lh_m), (hl_p, hl_m), (hh_p, hh_m) = bands
    return jnp.stack([lh_p, hh_p, hl_p, hl_m, hh_m, lh_m], axis=-3)


def _unorient(stack):
    """Inverse of :func:`_orient_stack`."""
    lh_p, hh_p, hl_p, hl_m, hh_m, lh_m = (stack[..., i, :, :] for i in range(6))
    out = {}
    for name, (z_p, z_m) in (("lh", (lh_p, lh_m)), ("hl", (hl_p, hl_m)),
                             ("hh", (hh_p, hh_m))):
        out[name] = {
            "aa": (z_p.real + z_m.real) * _INV_SQRT2,
            "bb": (z_m.real - z_p.real) * _INV_SQRT2,
            "ab": (z_p.imag + z_m.imag) * _INV_SQRT2,
            "ba": (z_p.imag - z_m.imag) * _INV_SQRT2,
        }
    return out


def idtcwt2d(result: DTCWT2DResult) -> jnp.ndarray:
    """Inverse 2D DTCWT (exact; the four tree reconstructions averaged)."""
    fb = get_filter(result.level1_wavelet)
    (h0a, h1a), (h0b, h1b) = qshift_filters()
    qa, qb = (h0a, h1a), (h0b, h1b)
    ll = {
        "aa": result.lowpasses[..., 0, 0, :, :],
        "ab": result.lowpasses[..., 0, 1, :, :],
        "ba": result.lowpasses[..., 1, 0, :, :],
        "bb": result.lowpasses[..., 1, 1, :, :],
    }
    for j in range(result.levels - 1, 0, -1):
        quads = _unorient(result.highpasses[j])
        nxt = {}
        for rc in ("aa", "ab", "ba", "bb"):
            lo_r, hi_r = qa if rc[0] == "a" else qb
            lo_c, hi_c = qa if rc[1] == "a" else qb
            top = jnp.concatenate([ll[rc], quads["lh"][rc]], axis=-1)
            bot = jnp.concatenate([quads["hl"][rc], quads["hh"][rc]], axis=-1)
            y2 = jnp.concatenate([top, bot], axis=-2)
            nxt[rc] = _ibutterfly_axis(_ibutterfly_axis(y2, lo_c, hi_c, -1),
                                       lo_r, hi_r, -2)
        ll = nxt
    quads = _unorient(result.highpasses[0])
    recons = []
    for rc in ("aa", "ab", "ba", "bb"):
        top = jnp.concatenate([ll[rc], quads["lh"][rc]], axis=-1)
        bot = jnp.concatenate([quads["hl"][rc], quads["hh"][rc]], axis=-1)
        y2 = jnp.concatenate([top, bot], axis=-2)
        img = _ibutterfly_axis(
            _ibutterfly_axis(y2, fb.rec_lo, fb.rec_hi, -1),
            fb.rec_lo, fb.rec_hi, -2)
        if rc[1] == "b":
            img = jnp.roll(img, 1, axis=-1)
        if rc[0] == "b":
            img = jnp.roll(img, 1, axis=-2)
        recons.append(img)
    return 0.25 * sum(recons)
