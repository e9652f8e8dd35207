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

- grid over row blocks (BR = 256 rows); each program DMAs its (BR, N)
  block in, runs every level, writes the block out TRANSPOSED — so the
  second, identical pass transforms the other axis and restores the
  orientation. 4 HBM passes total = the algorithmic minimum for a
  separable transform with full-length axes.
- levels with head > DENSE_HEAD use the pair-tile matmuls of
  ops.mxu_butterfly (same constants, E <= 3 for every shipped bank);
  the rest collapse into ops.mxu_pyramid's composed dense tail — all as
  in-kernel ``dot_general`` calls on VMEM values, MXU-issued.
- gradients: the transform is linear, so the VJP is the linear transpose
  of the XLA reference path (jax.linear_transpose) — exact, and the
  backward pass reuses the battle-tested route.

Eligibility (``pyramid2d_eligible``): TPU backend, f32, both extents
multiples of 256 and powers of two. Everything else falls back to the
separable XLA path in transforms.ndim.
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

BR = 256  # rows per grid program


def pyramid2d_eligible(x) -> bool:
    if _config.mxu_butterfly() == "off":
        return False
    if x.ndim != 2 or x.dtype != jnp.float32:
        return False
    r, n = x.shape
    ok_dim = lambda d: d >= 2 * BR and d % BR == 0 and (d & (d - 1)) == 0
    if not (ok_dim(r) and ok_dim(n)):
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


def _pyramid_rows_kernel(x_ref, wp_ref, wt_ref, wd_ref, out_ref, *, split, dense_h, prec):
    """Full pyramid along the last axis of one (BR, N) block; output
    written transposed (N, BR)."""
    buf = x_ref[:]  # (BR, N) VMEM value
    n = buf.shape[-1]
    wp = wp_ref[:]  # (256, 256): [a|d] columns for the e=(0,1) pair term
    wt = wt_ref[:]  # (128, 256): tail e=2 term
    for h in split:
        to = h // (2 * LANES)
        head = buf[:, :h]
        z = head.reshape(BR * to, 2 * LANES)
        y = lax.dot_general(z, wp, (((1,), (0,)), ((), ())),
                            precision=prec, preferred_element_type=jnp.float32)
        # tail term: pair array rolled by one, first half of each pair
        z3 = head.reshape(BR, to, 2 * LANES)
        zt = pltpu_roll(z3, -1, 1)[:, :, :LANES].reshape(BR * to, LANES)
        y = y + lax.dot_general(zt, wt, (((1,), (0,)), ((), ())),
                                precision=prec, preferred_element_type=jnp.float32)
        y3 = y.reshape(BR, to, 2 * LANES)
        a = y3[:, :, :LANES].reshape(BR, h // 2)
        d = y3[:, :, LANES:].reshape(BR, h // 2)
        tail_cols = buf[:, h:]
        buf = jnp.concatenate([a, d, tail_cols], axis=-1) if h < n else jnp.concatenate(
            [a, d], axis=-1
        )
    if wd_ref is not None:
        wd = wd_ref[:]
        hd = dense_h
        head = lax.dot_general(buf[:, :hd], wd, (((1,), (0,)), ((), ())),
                               precision=prec, preferred_element_type=jnp.float32)
        buf = jnp.concatenate([head, buf[:, hd:]], axis=-1)
    out_ref[:, :] = buf.T


def pltpu_roll(x, shift, axis):
    """Static circular roll (jnp.roll with static shift lowers fine)."""
    return jnp.roll(x, shift, axis=axis)


def _axis_pass(x, fb, level):
    """One transposing pyramid pass over the last axis of (R, N) f32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r, n = x.shape
    done = _levels_done(n, fb.transform_wavelength, level)
    prec = _config.conv_precision()
    wp, wt, split, wd, dense_h = _level_weights(fb, n, done, x.dtype)
    if done == 0:
        return x.T
    kernel = partial(
        _pyramid_rows_kernel if wd is not None else _pyramid_rows_kernel_nodense,
        split=split,
        dense_h=dense_h,
        prec=prec,
    )
    grid = (r // BR,)
    in_specs = [
        pl.BlockSpec((BR, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * LANES, 2 * LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((LANES, 2 * LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, wp, wt]
    if wd is not None:
        in_specs.append(
            pl.BlockSpec((dense_h, dense_h), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(wd)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, r), x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n, BR), lambda i: (0, i), memory_space=pltpu.VMEM),
    )(*args)


def _pyramid_rows_kernel_nodense(x_ref, wp_ref, wt_ref, out_ref, *, split, dense_h, prec):
    _pyramid_rows_kernel(x_ref, wp_ref, wt_ref, None, out_ref,
                         split=split, dense_h=dense_h, prec=prec)


def _xla_reference(x, fb, level_rows, level_cols):
    """The separable XLA path (for the linear-transpose VJP)."""
    from ..transforms.fwt import fwt as _fwt
    from ..transforms.ndim import forward_2d

    return forward_2d(
        lambda v, lvl: _fwt(v, fb.name, lvl), x, level_rows, level_cols
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
