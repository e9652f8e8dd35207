"""Pallas TPU kernel: fused MODWT cascade, VMEM-resident working set.

MODWT has no downsampling, so every level is a circular convolution with a
sparse upsampled filter — only M nonzero taps at spacing 2^(j-1):

    W_j[t] = sum_m h[m] * V[(t - m * 2^(j-1)) mod N]
           = sum_m h[m] * roll(V, m * 2^(j-1))[t]

Pure lane-rolls + FMAs: exactly what the TPU VPU is good at, with no
gathers, reshapes, or strided access. The running approximation V lives in
VMEM across ALL J levels; each level's detail row is DMA'd straight to the
HBM output as soon as it is computed (double-buffered scratch), so HBM
traffic collapses to one read of the input block plus one write per output
row — the minimum possible. The circular wrap needs no filter wrapping
because ``roll`` is mod-N by construction.

Same linear operator as ConvolutionMethod.DIRECT (and, up to rounding,
FFT). The XLA conv-based DIRECT path on TPU MXUs additionally needed
``precision=HIGHEST`` to avoid bf16 rounding — this kernel runs in full
float32 on the VPU by construction.

ROLE (round 4, measured): a **compatibility fallback and cross-validation
formulation**, not the fast path — the VPU roll/FMA cascade reaches ~7%
of its HBM bound and is ~4x slower than the MXU composite-tile default at
the headline shape (docs/PERFORMANCE.md roofline). AUTO never selects it;
request it explicitly via ``ConvolutionMethod.PALLAS`` when you want an
independent kernel to check the tile paths against, or a formulation with
no MXU dependence.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _block_rows(dtype) -> int:
    """Sublane tiling: (8, 128) for f32, (16, 128) for bf16 — DMA row slices
    must be tile-aligned."""
    return 16 if dtype == jnp.bfloat16 else 8


def _roll(x, shift, n):
    s = shift % n
    if s == 0:
        return x
    return pltpu.roll(x, s, axis=1)


def _modwt_kernel(x_ref, o_any, scratch, sem, *, g0, h0, levels, n, rb):
    i = pl.program_id(0)
    # compute in f32 regardless of storage dtype (TPU rotate is 32-bit only,
    # and f32 accumulation is better numerics for bf16 inputs anyway)
    v = x_ref[:].astype(jnp.float32)  # (rb, N) in VMEM
    m = len(g0)

    def emit(row_idx, values):
        scratch[0] = values.astype(scratch.dtype)
        # flat (B, (J+1)*N) output: row slice at lane offset row_idx*n keeps
        # the (8, 128) tiling aligned (n is a multiple of 128)
        cp = pltpu.make_async_copy(
            scratch.at[0],
            o_any.at[pl.ds(i * rb, rb), pl.ds(row_idx * n, n)],
            sem,
        )
        cp.start()
        return cp

    # one tap loop per level: each roll feeds BOTH the detail and the next
    # approximation (half the rolls of a split formulation; measured 1.58x
    # faster). The working set needs the raised vmem_limit_bytes below.
    pending = None
    for j in range(1, levels + 1):
        gap = 1 << (j - 1)
        w = jnp.zeros_like(v)
        vn = jnp.zeros_like(v)
        for t in range(m):
            r = _roll(v, t * gap, n)
            w = w + h0[t] * r
            vn = vn + g0[t] * r
        if pending is not None:
            pending.wait()
        pending = emit(j - 1, w)
        v = vn
    if pending is not None:
        pending.wait()
    emit(levels, v).wait()


def _imodwt_kernel(c_any, o_ref, buf, sem, *, g0, h0, levels, n, rb):
    i = pl.program_id(0)
    m = len(g0)

    def load(row_idx, slot):
        cp = pltpu.make_async_copy(
            c_any.at[pl.ds(i * rb, rb), pl.ds(row_idx * n, n)], buf.at[slot], sem.at[slot]
        )
        cp.start()
        return cp

    # prefetch V_J and W_J
    load(levels, 0).wait()
    v = buf[0].astype(jnp.float32)
    nxt = load(levels - 1, 1)
    for j in range(levels, 0, -1):
        nxt.wait()
        w = buf[(levels - j + 1) % 2].astype(jnp.float32)
        if j > 1:  # prefetch the next detail row while computing
            nxt = load(j - 2, (levels - j) % 2)
        gap = 1 << (j - 1)
        acc = jnp.zeros_like(v)
        for t in range(m):
            acc = acc + g0[t] * _roll(v, -t * gap, n) + h0[t] * _roll(w, -t * gap, n)
        v = acc
    o_ref[:] = v.astype(o_ref.dtype)


def _base_filters(wavelet):
    from ..transforms.modwt import _modwt_base_filters

    g0, h0 = _modwt_base_filters(wavelet)
    return tuple(float(v) for v in g0), tuple(float(v) for v in h0)


def vmem_bytes_needed(n, dtype) -> int:
    """VMEM working set estimate for one row block: double-buffered input and
    scratch in the storage dtype, plus ~4 float32 working arrays (v, w, vn,
    roll temp) — the kernel always computes in f32."""
    rows = _block_rows(dtype)
    itemsize = jnp.dtype(dtype).itemsize
    return rows * n * (3 * itemsize + 4 * 4)


def modwt_pallas(x, wavelet, level: int):
    """Forward MODWT (B, N) -> (B, level+1, N), cascade fused in VMEM."""
    g0, h0 = _base_filters(wavelet)
    b, n = x.shape
    rb = _block_rows(x.dtype)  # tile-aligned row blocks; batch padded below
    # manual HBM DMA slices must not overrun: pad the batch to a block multiple
    bp = -(-b // rb) * rb
    if bp != b:
        x = jnp.concatenate([x, jnp.zeros((bp - b, n), dtype=x.dtype)], axis=0)
    kern = functools.partial(_modwt_kernel, g0=g0, h0=h0, levels=level, n=n, rb=rb)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bp, (level + 1) * n), x.dtype),
        grid=(-(-b // rb),),
        in_specs=[pl.BlockSpec((rb, n), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((1, rb, n), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True, vmem_limit_bytes=64 * 2**20),
    )(x)
    return out[:b].reshape(b, level + 1, n)


def imodwt_pallas(coeffs, wavelet):
    """Inverse MODWT (B, J+1, N) -> (B, N), cascade fused in VMEM."""
    g0, h0 = _base_filters(wavelet)
    b, jp1, n = coeffs.shape
    level = jp1 - 1
    rb = _block_rows(coeffs.dtype)  # tile-aligned row blocks; batch padded below
    bp = -(-b // rb) * rb
    coeffs = coeffs.reshape(b, jp1 * n)
    if bp != b:
        coeffs = jnp.concatenate(
            [coeffs, jnp.zeros((bp - b, jp1 * n), dtype=coeffs.dtype)], axis=0
        )
    kern = functools.partial(_imodwt_kernel, g0=g0, h0=h0, levels=level, n=n, rb=rb)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bp, n), coeffs.dtype),
        grid=(-(-b // rb),),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((rb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, rb, n), coeffs.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(coeffs)
    return out[:b]
