"""Pallas TPU kernel: synchrosqueezing reassignment, VMEM-resident tiles.

The reassignment T[k, t] = sum_{s : k_idx[s,t] == k} c[s, t] is a weighted
histogram per time column. Data-dependent scatters serialize on the TPU
(measured 2.7 s at 8x64x65536), and the XLA dense masked-reduce
(transforms/ssq.py, reassign="dense") re-reads the contribution block once
per bin row from HBM (~8.6 ms). This kernel loads each (scales, time-tile)
block into VMEM ONCE and runs the whole bin loop against the resident
tile — HBM traffic drops to one read of the contributions plus one write of
the squeezed plane, with the compare-select-reduce work on the VPU.

No gathers, no reshapes, no lane-dim tricks: per bin row it is one int
compare, two selects and two sublane-axis reductions — all natively
vectorizable. The bin loop is unrolled at trace time (n_bins is static).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _reassign_kernel(k_ref, re_ref, im_ref, ore_ref, oim_ref, *, n_bins, k_pad):
    k = k_ref[0]  # (S, TN) int32
    pr = re_ref[0]  # (S, TN) f32
    pi = im_ref[0]
    zero = jnp.zeros_like(pr)
    zrow = jnp.zeros_like(pr[0])
    for kk in range(k_pad):
        if kk < n_bins:
            m = k == kk
            ore_ref[0, kk, :] = jnp.sum(jnp.where(m, pr, zero), axis=0)
            oim_ref[0, kk, :] = jnp.sum(jnp.where(m, pi, zero), axis=0)
        else:
            # sublane padding rows; kk == n_bins is the caller's drop
            # sentinel in k, so these must NOT be masked sums
            ore_ref[0, kk, :] = zrow
            oim_ref[0, kk, :] = zrow


def reassign_pallas(contrib, k_idx, n_bins: int, *, time_tile: int = 512):
    """(…, S, N) complex contributions + (…, S, N) int32 bin indices ->
    (…, n_bins, N) complex squeezed plane. Indices outside [0, n_bins) are
    dropped (the ssq drop-sentinel convention). N and S are padded to tile
    multiples internally; any leading dims are batched through the grid.

    Computes in float32 (the TPU VPU's native width) — 64-bit inputs are
    rejected rather than silently downcast; use the dense/scatter paths for
    float64 validation runs. Differentiable: the map is linear in the
    contributions, so the custom VJP is one gather along the bin axis.
    """
    if jnp.dtype(contrib.dtype) in (jnp.dtype("complex128"), jnp.dtype("float64")):
        from ..exceptions import JWaveFailure

        raise JWaveFailure(
            "reassign_pallas - the Pallas kernel computes in float32; use "
            "reassign='dense' or 'scatter' for 64-bit inputs"
        )
    return _reassign_cv(contrib, k_idx, n_bins, time_tile)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _reassign_cv(contrib, k_idx, n_bins, time_tile):
    return _reassign_impl(contrib, k_idx, n_bins, time_tile)


def _reassign_cv_fwd(contrib, k_idx, n_bins, time_tile):
    return _reassign_impl(contrib, k_idx, n_bins, time_tile), k_idx


def _reassign_cv_bwd(n_bins, time_tile, k_idx, ct):
    # out[k, t] = sum_{s : k_idx[s,t]==k} c[s, t] is c @ a 0/1 matrix, so the
    # cotangent w.r.t. c is the gather ct[k_idx[s,t], t] (0 when dropped)
    valid = (k_idx >= 0) & (k_idx < n_bins)
    kc = jnp.clip(k_idx, 0, n_bins - 1)
    g = jnp.take_along_axis(ct, kc, axis=-2)
    g = jnp.where(valid, g, 0)
    import numpy as _np

    return g, _np.zeros(k_idx.shape, dtype=jax.dtypes.float0)


_reassign_cv.defvjp(_reassign_cv_fwd, _reassign_cv_bwd)


def _reassign_impl(contrib, k_idx, n_bins: int, time_tile: int = 512):
    lead = contrib.shape[:-2]
    s, n = contrib.shape[-2:]
    g = 1
    for d in lead:
        g *= d
    cre = jnp.real(contrib).reshape(g, s, n).astype(jnp.float32)
    cim = jnp.imag(contrib).reshape(g, s, n).astype(jnp.float32)
    k = k_idx.reshape(g, s, n).astype(jnp.int32)

    tn = min(time_tile, max(LANES, -(-n // LANES) * LANES))
    n_pad = -(-n // tn) * tn
    s_pad = -(-s // 8) * 8
    k_pad_bins = -(-n_bins // 8) * 8
    if n_pad != n or s_pad != s:
        # padded entries carry the drop sentinel, so they land nowhere
        cre = jnp.pad(cre, ((0, 0), (0, s_pad - s), (0, n_pad - n)))
        cim = jnp.pad(cim, ((0, 0), (0, s_pad - s), (0, n_pad - n)))
        k = jnp.pad(k, ((0, 0), (0, s_pad - s), (0, n_pad - n)),
                    constant_values=n_bins)

    kern = functools.partial(_reassign_kernel, n_bins=n_bins, k_pad=k_pad_bins)
    grid = (g, n_pad // tn)
    block_in = pl.BlockSpec((1, s_pad, tn), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)
    block_out = pl.BlockSpec((1, k_pad_bins, tn), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)
    out_re, out_im = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((g, k_pad_bins, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((g, k_pad_bins, n_pad), jnp.float32),
        ),
        grid=grid,
        in_specs=[block_in, block_in, block_in],
        out_specs=(block_out, block_out),
    )(k, cre, cim)
    out = jax.lax.complex(out_re[:, :n_bins, :n], out_im[:, :n_bins, :n])
    return out.reshape(lead + (n_bins, n)).astype(contrib.dtype)
