"""Fused whole-transform 2D FWT as TWO Pallas passes — one read, one
write of HBM per axis.

Reference semantics: BasicTransform.java:361-399 — the 2D FWT is the full
multi-level 1D transform along every row, then along every column
("standard decomposition"). The XLA path (ops.mxu_pyramid via
transforms.ndim) is MXU-compute-bound at HIGHEST precision but pays
per-level HBM round trips on the shrinking head plus two transposes;
docs/PERFORMANCE.md's roofline puts its slack at ~0.17 ms of the 0.50 ms
at the 2048^2 L6 bench shape.

This kernel runs the ENTIRE level pyramid for a block of rows inside
VMEM:

- grid over row blocks (br <= 256 rows, shrunk per width by
  ``_pick_br2d`` under the probed VMEM/compile envelope); each program
  DMAs its (br, N) block in, runs every level, and writes the block out
  TRANSPOSED (br >= 128) — so the second, identical pass transforms the
  other axis and restores the orientation. 4 HBM passes total = the
  algorithmic minimum for a separable transform with full-length axes.
  Narrow blocks (br < 128, widths > 4096 rows) write straight and the
  caller transposes outside the kernel (~free).
- levels with head > DENSE_HEAD use the pair-tile matmuls of
  ops.mxu_butterfly (same constants, E <= 3 for every shipped bank);
  the rest collapse into ops.mxu_pyramid's composed dense tail — all as
  in-kernel ``dot_general`` calls on VMEM values, MXU-issued.
- gradients: the transform is linear, so the VJP is the linear transpose
  of the XLA reference path (jax.linear_transpose) — exact, and the
  backward pass reuses the battle-tested route.

Eligibility (``pyramid2d_eligible``): TPU backend, f32, both extents
powers of two in [512, MAX_2D_EXTENT] with a row block fitting the VMEM
envelope. Everything else falls back to the separable XLA path in
transforms.ndim.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .. import config as _config
from .mxu_common import LANES, TPU_BACKENDS
from .mxu_butterfly import _bank_for
from .mxu_pyramid import DENSE_HEAD, _fb_bytes, _levels_done, _tail_matrix_fwd

BR = 256  # preferred rows per grid program (shrinks for wide blocks)


#: VMEM budget for one (br, n) f32 row block of the 2D kernels — the
#: known-good compile envelope on this relay toolchain is 2 MB
#: (256 rows x 2048 f32); wider rows shrink br instead of growing the
#: block (round 5 — previously both extents were hard-capped at 2048).
_VMEM_2D_BLOCK_BYTES = 2 * 1024 * 1024

#: widest extent the adaptive-br kernel has been validated at on real
#: hardware (round-5 probes, both with 1 MB non-transposing blocks and
#: exact vs the XLA path to 1e-6: 4096^2 at br=64 — 1.85 vs 3.29 ms,
#: 1.8x; 8192^2 at br=32 — 10.6 vs 23.8 ms, 2.2x. A (128, 4096) 2 MB
#: transposed block crashes the compile helper, see
#: docs/TPU_BACKEND_NOTES.md). Both extents are bounded because each
#: becomes the block width in one of the two passes.
MAX_2D_EXTENT = 8192


def _pick_br2d(r: int, n: int) -> int | None:
    """Largest row-block size (<= BR, >= 8) dividing ``r`` whose (br, n)
    f32 block fits the 2D VMEM budget; None when even 8 rows don't.

    The budget is width-sensitive: 2 MB blocks are proven at widths
    <= 2048 but the compile helper crashes on a 2 MB (128, 4096) block
    (round-5 probe), while 1 MB blocks compile at every probed width —
    so wide rows drop to the 1 MB envelope."""
    budget = _VMEM_2D_BLOCK_BYTES if n <= 2048 else _VMEM_2D_BLOCK_BYTES // 2
    br = min(BR, r)
    while br >= 8:
        if r % br == 0 and br * n * 4 <= budget:
            return br
        br //= 2
    return None


def _bank_ok(fb, inverse: bool = False) -> bool:
    """The split-level kernels bake E <= 3 butterfly tile banks (every
    shipped filter: M <= 76 taps). A longer custom bank must route to the
    XLA path instead of tripping the in-kernel assert (round-5 advice)."""
    lo, hi = (fb.rec_lo, fb.rec_hi) if inverse else (fb.dec_lo, fb.dec_hi)
    return _bank_for(lo, hi).shape[0] <= 3


def pyramid2d_eligible(x, fb=None) -> bool:
    if _config.mxu_butterfly() == "off":
        return False
    if x.ndim != 2 or x.dtype != jnp.float32:
        return False
    r, n = x.shape
    ok_dim = lambda a, b: (512 <= a <= MAX_2D_EXTENT and (a & (a - 1)) == 0
                           and _pick_br2d(a, b) is not None)
    if not (ok_dim(r, n) and ok_dim(n, r)):
        return False
    if fb is not None and not _bank_ok(fb):
        return False
    import jax as _jax

    return _jax.default_backend() in TPU_BACKENDS


def _level_weights(fb, n: int, done: int, dtype):
    """Per-level constants: [(W_pair (256,256), W_tail (128,256)), ...]
    for split levels, then the composed dense-tail matrix (h, h)."""
    bank = _bank_for(fb.dec_lo, fb.dec_hi)  # (E, 128, 256) [a|d] columns
    e_count = bank.shape[0]
    assert e_count <= 3, "shipped banks have E <= 3"
    w_pair = np.concatenate([bank[0], bank[1]]) if e_count >= 2 else np.concatenate(
        [bank[0], np.zeros_like(bank[0])]
    )
    w_tail = bank[2] if e_count == 3 else np.zeros((LANES, 2 * LANES))
    split = []
    h, l = n, 0
    while l < done and h > DENSE_HEAD:
        split.append(h)
        h >>= 1
        l += 1
    dense = None
    if l < done:
        dense = _tail_matrix_fwd(
            _fb_bytes(fb.dec_lo), _fb_bytes(fb.dec_hi), h, done - l
        )
    return (
        jnp.asarray(w_pair, dtype),
        jnp.asarray(w_tail, dtype),
        split,
        None if dense is None else jnp.asarray(dense, dtype),
        h,
    )


def _pyramid_rows_kernel(x_ref, wp_ref, wt_ref, wd_ref, out_ref, *, split,
                         dense_h, prec, br):
    """Full pyramid along the last axis of one (br, N) block; output
    written transposed (N, br)."""
    buf = x_ref[:]  # (br, N) VMEM value
    n = buf.shape[-1]
    wp = wp_ref[:]  # (256, 256): [a|d] columns for the e=(0,1) pair term
    wt = wt_ref[:]  # (128, 256): tail e=2 term
    for h in split:
        to = h // (2 * LANES)
        head = buf[:, :h]
        z = head.reshape(br * to, 2 * LANES)
        y = lax.dot_general(z, wp, (((1,), (0,)), ((), ())),
                            precision=prec, preferred_element_type=jnp.float32)
        # tail term: pair array rolled by one, first half of each pair
        z3 = head.reshape(br, to, 2 * LANES)
        zt = pltpu_roll(z3, -1, 1)[:, :, :LANES].reshape(br * to, LANES)
        y = y + lax.dot_general(zt, wt, (((1,), (0,)), ((), ())),
                                precision=prec, preferred_element_type=jnp.float32)
        y3 = y.reshape(br, to, 2 * LANES)
        a = y3[:, :, :LANES].reshape(br, h // 2)
        d = y3[:, :, LANES:].reshape(br, h // 2)
        tail_cols = buf[:, h:]
        buf = jnp.concatenate([a, d, tail_cols], axis=-1) if h < n else jnp.concatenate(
            [a, d], axis=-1
        )
    if wd_ref is not None:
        wd = wd_ref[:]
        hd = dense_h
        head = lax.dot_general(buf[:, :hd], wd, (((1,), (0,)), ((), ())),
                               precision=prec, preferred_element_type=jnp.float32)
        # hd == n when the whole width folds densely: a zero-width slice
        # in the concat is an "Invalid type" Mosaic error (probed)
        buf = head if hd == buf.shape[-1] else jnp.concatenate(
            [head, buf[:, hd:]], axis=-1)
    # transposed store only when the (n, br) output block is lowerable
    # (br >= 128 lanes); narrow blocks write straight and the caller
    # transposes outside the kernel (measured ~free on TPU)
    if out_ref.shape[0] == buf.shape[-1]:
        out_ref[:, :] = buf.T
    else:
        out_ref[:, :] = buf


def pltpu_roll(x, shift, axis):
    """Static circular roll (jnp.roll with static shift lowers fine)."""
    return jnp.roll(x, shift, axis=axis)


def _axis_pass(x, fb, level):
    """One transposing pyramid pass over the last axis of (R, N) f32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r, n = x.shape
    done = _levels_done(n, fb.transform_wavelength,
                        10**9 if level is None else level)
    prec = _config.conv_precision()
    wp, wt, split, wd, dense_h = _level_weights(fb, n, done, x.dtype)
    if done == 0:
        return x.T
    br = _pick_br2d(r, n)
    kernel = partial(
        _pyramid_rows_kernel if wd is not None else _pyramid_rows_kernel_nodense,
        split=split,
        dense_h=dense_h,
        prec=prec,
        br=br,
    )
    grid = (r // br,)
    in_specs = [
        pl.BlockSpec((br, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * LANES, 2 * LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((LANES, 2 * LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, wp, wt]
    if wd is not None:
        in_specs.append(
            pl.BlockSpec((dense_h, dense_h), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(wd)
    # narrow row blocks (br < 128) cannot be a transposed (n, br) output
    # block (lane dim must be 128-divisible): write straight, transpose
    # outside the kernel (~free — see docs/PERFORMANCE.md dead-end table)
    if br >= LANES:
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, r), x.dtype),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((n, br), lambda i: (0, i), memory_space=pltpu.VMEM),
        )(*args)
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((r, n), x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((br, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(*args)
    return y.T


def _pyramid_rows_kernel_nodense(x_ref, wp_ref, wt_ref, out_ref, *, split,
                                 dense_h, prec, br):
    _pyramid_rows_kernel(x_ref, wp_ref, wt_ref, None, out_ref,
                         split=split, dense_h=dense_h, prec=prec, br=br)


def _xla_reference(x, fb, level_rows, level_cols):
    """The separable XLA path (for the linear-transpose VJP). Must stay on
    plain XLA ops end to end — jax.linear_transpose cannot see through a
    custom_vjp, so this bypasses transforms.fwt (which routes to the
    Pallas 1D kernel) and calls the mxu_pyramid composition directly."""
    from ..transforms.ndim import forward_2d
    from .mxu_pyramid import fwt_forward_fused

    big = 10**9

    return forward_2d(
        lambda v, lvl: fwt_forward_fused(v, fb, big if lvl is None else lvl),
        x, level_rows, level_cols,
    )


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def fwt2d_fused(x, wavelet_name: str, level_rows, level_cols):
    """Fused 2D FWT (standard decomposition) via two Pallas pyramid
    passes. Same output as transforms.ndim.forward_2d over transforms.fwt."""
    from ..filters import get_filter

    fb = get_filter(wavelet_name)
    y = _axis_pass(x, fb, level_cols)   # rows pass (transforms last axis)
    return _axis_pass(y, fb, level_rows).astype(x.dtype)


def _fused_fwd(x, wavelet_name, level_rows, level_cols):
    return fwt2d_fused(x, wavelet_name, level_rows, level_cols), x.shape


def _fused_bwd(wavelet_name, level_rows, level_cols, shape, g):
    from ..filters import get_filter

    fb = get_filter(wavelet_name)
    lin = jax.linear_transpose(
        lambda v: _xla_reference(v, fb, level_rows, level_cols),
        jax.ShapeDtypeStruct(shape, g.dtype),
    )
    (dx,) = lin(g)
    return (dx,)


fwt2d_fused.defvjp(_fused_fwd, _fused_bwd)


# --------------------------------------------------------------------------
# 1D batched variant — same kernel, output NOT transposed
# --------------------------------------------------------------------------

def _pyramid_rows_kernel_flat(x_ref, wp_ref, wt_ref, wd_ref, out_ref, *, split,
                              dense_h, prec, br):
    """In-place variant: subbands are STORED into out_ref slices and the
    next level reads its shrinking head back from out_ref — full-width
    value concatenates per level (the 2D kernel's style) blew the Mosaic
    compile helper past n = 8192."""
    n = x_ref.shape[-1]
    out_ref[:, :] = x_ref[:]
    wp = wp_ref[:]
    wt = wt_ref[:]
    for h in split:
        to = h // (2 * LANES)
        head = out_ref[:, :h]
        z = head.reshape(br * to, 2 * LANES)
        y = lax.dot_general(z, wp, (((1,), (0,)), ((), ())),
                            precision=prec, preferred_element_type=jnp.float32)
        z3 = head.reshape(br, to, 2 * LANES)
        zt = pltpu_roll(z3, -1, 1)[:, :, :LANES].reshape(br * to, LANES)
        y = y + lax.dot_general(zt, wt, (((1,), (0,)), ((), ())),
                                precision=prec, preferred_element_type=jnp.float32)
        y3 = y.reshape(br, to, 2 * LANES)
        out_ref[:, : h // 2] = y3[:, :, :LANES].reshape(br, h // 2)
        out_ref[:, h // 2 : h] = y3[:, :, LANES:].reshape(br, h // 2)
    if wd_ref is not None:
        wd = wd_ref[:]
        hd = dense_h
        out_ref[:, :hd] = lax.dot_general(
            out_ref[:, :hd], wd, (((1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32)


def _pyramid_rows_kernel_flat_nodense(x_ref, wp_ref, wt_ref, out_ref, **kw):
    _pyramid_rows_kernel_flat(x_ref, wp_ref, wt_ref, None, out_ref, **kw)


#: VMEM budget for one row block. Probed on the v5e relay: 1 MB blocks
#: compile at every width (8192 @ br=32, 16384 @ br=16); 2 MB blocks blow
#: the Mosaic compile helper (the kernel's in+out+temporaries multiply the
#: block ~6-8x against ~16 MB of VMEM). At 1 MB the widest eligible row is
#: n = 32768 (br floor is the f32 sublane tile, 8) — longer rows fall back
#: to the XLA pyramid.
_VMEM_BLOCK_BYTES = 1024 * 1024


def _pick_br(r: int, n: int) -> int | None:
    """Largest row-block size dividing r whose (br, n) f32 block fits the
    VMEM budget; None when even 8 rows don't fit."""
    br = min(256, r)
    while br >= 8:
        if r % br == 0 and br * n * 4 <= _VMEM_BLOCK_BYTES:
            return br
        br //= 2
    return None


def pyramid1d_eligible(x, fb=None) -> bool:
    """Routing gate for the batched-rows fused pyramid: TPU, f32, pow-2
    last axis >= 1024 (smaller pyramids are already one dense matmul in
    ops.mxu_pyramid), and a batch that tiles into VMEM blocks."""
    if _config.mxu_butterfly() == "off":
        return False
    if x.ndim < 2 or x.dtype != jnp.float32:
        return False
    n = x.shape[-1]
    r = 1
    for d in x.shape[:-1]:
        r *= d
    if n < 1024 or (n & (n - 1)) != 0 or _pick_br(r, n) is None:
        return False
    if fb is not None and not _bank_ok(fb):
        return False
    import jax as _jax

    return _jax.default_backend() in TPU_BACKENDS


def peel_levels_for_vmem(x, fb=None) -> int | None:
    """Rows too wide for the VMEM block budget: number of leading pyramid
    levels (1 or 2) to run on the XLA butterfly so the shrinking head
    becomes :func:`pyramid1d_eligible` — the remaining levels then run
    fused in VMEM (round 5; previously a 64x65536 headline row silently
    fell back to the all-XLA pyramid). None when no small peel helps."""
    if _config.mxu_butterfly() == "off":
        return None
    if x.ndim < 2 or x.dtype != jnp.float32:
        return None
    n = x.shape[-1]
    if (n & (n - 1)) != 0:
        return None
    if fb is not None and not _bank_ok(fb):
        return None
    r = 1
    for d in x.shape[:-1]:
        r *= d
    if _pick_br(r, n) is not None:
        return None  # already eligible — no peel needed
    import jax as _jax

    if _jax.default_backend() not in TPU_BACKENDS:
        return None
    for p in (1, 2):
        h = n >> p
        if h >= 1024 and _pick_br(r, h) is not None:
            return p
    return None


def _rows_pass_flat(x2, fb, level):
    """Fused pyramid over the last axis of (R, N) f32, output (R, N)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r, n = x2.shape
    done = _levels_done(n, fb.transform_wavelength, level)
    if done == 0:
        return x2
    prec = _config.conv_precision()
    wp, wt, split, wd, dense_h = _level_weights(fb, n, done, x2.dtype)
    br = _pick_br(r, n)
    kernel = partial(
        _pyramid_rows_kernel_flat if wd is not None
        else _pyramid_rows_kernel_flat_nodense,
        split=split, dense_h=dense_h, prec=prec, br=br,
    )
    in_specs = [
        pl.BlockSpec((br, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * LANES, 2 * LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((LANES, 2 * LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x2, wp, wt]
    if wd is not None:
        in_specs.append(
            pl.BlockSpec((dense_h, dense_h), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(wd)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((r, n), x2.dtype),
        grid=(r // br,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((br, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(*args)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fwt1d_fused(x, wavelet_name: str, level):
    """Fused multi-level FWT along the last axis of a batched (…, N) f32
    array — the whole pyramid in VMEM, one HBM read + one write. Same
    output as transforms.fwt.fwt (which routes here on eligible shapes)."""
    from ..filters import get_filter

    fb = get_filter(wavelet_name)
    lead = x.shape[:-1]
    y = _rows_pass_flat(x.reshape((-1, x.shape[-1])), fb, level)
    return y.reshape(lead + (x.shape[-1],))


def _f1_fwd(x, wavelet_name, level):
    return fwt1d_fused(x, wavelet_name, level), x.shape


def _f1_bwd(wavelet_name, level, shape, g):
    from ..ops.mxu_pyramid import fwt_forward_fused
    from ..filters import get_filter

    fb = get_filter(wavelet_name)
    lin = jax.linear_transpose(
        lambda v: fwt_forward_fused(v, fb, 10**9 if level is None else level),
        jax.ShapeDtypeStruct(shape, g.dtype),
    )
    (dx,) = lin(g)
    return (dx,)


fwt1d_fused.defvjp(_f1_fwd, _f1_bwd)


# --------------------------------------------------------------------------
# Inverse 2D — C(y) = P^-1(y^T) applied twice (C o C == (T o P)^-2)
# --------------------------------------------------------------------------

def _inv_level_weights(fb, n: int, done: int, dtype):
    """Inverse constants: (V_pair (256,256), V_tail (256,128), dense
    (hd, hd) folded-inverse matrix, hd, split_heads ascending)."""
    from .mxu_pyramid import _tail_matrix_inv

    bank = _bank_for(fb.rec_lo, fb.rec_hi)
    e_count = bank.shape[0]
    assert e_count <= 3
    v_pair = (
        np.concatenate([bank[0].T, bank[1].T], axis=1)
        if e_count >= 2
        else np.concatenate([bank[0].T, np.zeros_like(bank[0].T)], axis=1)
    )
    v_tail = bank[2].T if e_count == 3 else np.zeros((2 * LANES, LANES))
    h0 = n >> (done - 1)
    hd = h0
    folded = 1
    while hd < min(DENSE_HEAD, n) and folded < done:
        hd <<= 1
        folded += 1
    dense = _tail_matrix_inv(
        _fb_bytes(fb.rec_lo), _fb_bytes(fb.rec_hi), hd, folded, float(fb.recon_gain)
    )
    heads = []
    h = hd << 1
    while h <= n:
        heads.append(h)
        h <<= 1
    return (
        jnp.asarray(v_pair, dtype),
        jnp.asarray(v_tail, dtype),
        jnp.asarray(dense, dtype),
        hd,
        heads,
    )


def _dot_chunked_k(x, w, prec):
    """dot_general with the contraction split into 128-wide chunks.

    The round-4 micro-bisect of the inverse kernel's opaque
    tpu_compile_helper crash found that structurally identical variants
    with 128-wide contractions compile while >=256-wide ones fail in
    certain surroundings (docs/TPU_BACKEND_NOTES.md); the chunked sum is
    the same operator (f32 accumulation reassociated per 128 taps)."""
    k = x.shape[-1]
    if k <= LANES:
        return lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                               precision=prec, preferred_element_type=jnp.float32)
    acc = None
    for s in range(0, k, LANES):
        t = lax.dot_general(x[:, s:s + LANES], w[s:s + LANES],
                            (((1,), (0,)), ((), ())),
                            precision=prec, preferred_element_type=jnp.float32)
        acc = t if acc is None else acc + t
    return acc


def _ipyramid_rows_kernel(y_ref, vp_ref, vt_ref, vd_ref, out_ref, *, heads, hd,
                          gain, prec, br):
    """Inverse pyramid over one (br, N) block, output written TRANSPOSED —
    the mirror of the forward kernel. (A read-side-transposing variant
    crashed the Mosaic compile helper; because the two axes' 1D operators
    commute, transpose-on-write composes to the same 2D inverse.) All
    contractions are issued 128 wide (_dot_chunked_k) — the round-5
    formulation change aimed at the round-4 compile-helper crash."""
    buf = y_ref[:]  # (br, N)
    vp = vp_ref[:]
    vt = vt_ref[:]
    head = _dot_chunked_k(buf[:, :hd], vd_ref[:], prec)
    buf = head if hd == buf.shape[-1] else jnp.concatenate(
        [head, buf[:, hd:]], axis=-1)
    for h in heads:
        half = h // 2
        to = h // (2 * LANES)
        # split the interleaved z @ V into per-subband matmuls — no
        # minor-axis interleave of VMEM values (3D lane concats crashed
        # the Mosaic compile helper)
        a2 = buf[:, :half].reshape(br * to, LANES)
        d2 = buf[:, half:h].reshape(br * to, LANES)
        u = (
            lax.dot_general(a2, vp[:LANES], (((1,), (0,)), ((), ())),
                            precision=prec, preferred_element_type=jnp.float32)
            + lax.dot_general(d2, vp[LANES:], (((1,), (0,)), ((), ())),
                              precision=prec, preferred_element_type=jnp.float32)
        )
        head2 = u.reshape(br, h)
        ut = (
            lax.dot_general(a2, vt[:LANES], (((1,), (0,)), ((), ())),
                            precision=prec, preferred_element_type=jnp.float32)
            + lax.dot_general(d2, vt[LANES:], (((1,), (0,)), ((), ())),
                              precision=prec, preferred_element_type=jnp.float32)
        )
        # tail lands in the FIRST half of the NEXT pair block: pad each
        # q-row to a full 256 block, flatten, and circular-shift by one
        # block (256 lanes) — a flat 2D roll, no 3D concat
        exp3 = jnp.pad(ut.reshape(br, to, LANES), ((0, 0), (0, 0), (0, LANES)))
        head2 = head2 + pltpu_roll(exp3.reshape(br, h), 2 * LANES, -1)
        if gain != 1.0:
            head2 = head2 * jnp.float32(gain)
        buf = jnp.concatenate([head2, buf[:, h:]], axis=-1) \
            if h < buf.shape[-1] else head2
    if out_ref.shape[0] == buf.shape[-1]:
        out_ref[:, :] = buf.T
    else:
        out_ref[:, :] = buf


def _inv_axis_pass(y, fb, level):
    """One write-transposing inverse pass over the last axis of (R, N)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r, n = y.shape
    done = _levels_done(n, fb.transform_wavelength,
                        10**9 if level is None else level)
    if done == 0:
        return y.T
    prec = _config.conv_precision()
    vp, vt, vd, hd, heads = _inv_level_weights(fb, n, done, y.dtype)
    br = _pick_br2d(r, n)
    kernel = partial(
        _ipyramid_rows_kernel, heads=heads, hd=hd,
        gain=float(fb.recon_gain), prec=prec, br=br,
    )
    in_specs = [
        pl.BlockSpec((br, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * LANES, 2 * LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * LANES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((hd, hd), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    # ALWAYS write straight and transpose outside: the round-4 opaque
    # tpu_compile_helper crash was the inverse kernel's transposed store —
    # the identical kernel with a straight (br, n) store compiles and
    # round-trips at 1e-6 (round-5 probe). The external XLA transpose is
    # ~free (docs/PERFORMANCE.md dead-end table).
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((r, n), y.dtype),
        grid=(r // br,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((br, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(y, vp, vt, vd)
    return out.T


def _xla_reference_inv(y, fb, level_rows, level_cols):
    """Plain-XLA inverse (for the linear-transpose VJP)."""
    from ..transforms.ndim import reverse_2d
    from .mxu_pyramid import fwt_inverse_fused

    big = 10**9

    return reverse_2d(
        lambda v, lvl: fwt_inverse_fused(v, fb, big if lvl is None else lvl),
        y, level_rows, level_cols,
    )


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def ifwt2d_fused(y, wavelet_name: str, level_rows, level_cols):
    """Inverse of :func:`fwt2d_fused`: two inverse pyramid passes.

    MEASURED DEAD END — correct but NOT ROUTED (round 5). The round-4
    transposed-store variant crashed the relay's tpu_compile_helper
    opaquely; the round-5 straight-store + external-transpose variant
    (this code) compiles and round-trips at 1e-6 on hardware, but loses
    the A/B at every compilable block size: 0.386 ms (br=64), 0.514 ms
    (br=128) vs 0.285 ms for the separable XLA synthesis path at 2048^2
    db4 L6 — the inverse's split per-subband matmuls + tail-roll adds
    issue ~2x the forward kernel's work per level, and the synthesis
    direction lacks the forward's shrinking-head locality win. Public
    ``ifwt2d`` therefore uses the XLA path; this kernel stays as the
    tested reference formulation and the record of the probe data."""
    from ..filters import get_filter

    fb = get_filter(wavelet_name)
    x = _inv_axis_pass(y, fb, level_cols)   # last axis first (= cols), then
    return _inv_axis_pass(x, fb, level_rows).astype(y.dtype)  # rows


def _inv_fwd(y, wavelet_name, level_rows, level_cols):
    return ifwt2d_fused(y, wavelet_name, level_rows, level_cols), y.shape


def _inv_bwd(wavelet_name, level_rows, level_cols, shape, g):
    from ..filters import get_filter

    fb = get_filter(wavelet_name)
    lin = jax.linear_transpose(
        lambda v: _xla_reference_inv(v, fb, level_rows, level_cols),
        jax.ShapeDtypeStruct(shape, g.dtype),
    )
    (dy,) = lin(g)
    return (dy,)


ifwt2d_fused.defvjp(_inv_fwd, _inv_bwd)
