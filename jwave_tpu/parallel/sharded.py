"""SPMD sharded transforms over a device mesh.

Communication patterns (all expressed as XLA collectives so they lower to
ICI ops, not host transfers):

  * ``all_to_all`` — distributed transpose for separable 2D transforms
    (the scalable analog of the reference's row/column ForkJoinPool
    decorator, ParallelTransform.java:70-126);
  * ``ppermute`` — neighbor halo exchange of filter-support samples for
    time-sharded MODWT (SURVEY.md §5.7: same structure as ring attention
    but with tiny, fixed halos because wavelet filters have compact
    support);
  * none at all — CWT scales and signal batches shard embarrassingly
    (the reference's parallel-stream-over-scales,
    ContinuousWaveletTransform.java:511-565, with zero synchronization).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from .. import config as _config
from ..exceptions import JWaveFailure
from ..cwavelets import get_continuous_wavelet
from ..transforms.cwt import CWTResult, PaddingType, _omega_axis, pad_signal
from ..transforms.fwt import fwt, ifwt
from ..transforms.wpt import wpt, iwpt
from ..transforms.modwt import _level_filters, _validate_level
from ..utils.numerics import next_power_of_two


# --------------------------------------------------------------------------
# batch sharding (pure data parallelism)
# --------------------------------------------------------------------------

def batch_sharded(fn, mesh: Mesh, axis_name: str | None = None):
    """Wrap ``fn(x)`` so the leading axis of input/output shards across the
    mesh. Zero communication — each chip transforms its own signals."""
    axis_name = axis_name or mesh.axis_names[0]
    sharding = NamedSharding(mesh, P(axis_name))

    @jax.jit
    def run(x):
        x = lax.with_sharding_constraint(x, sharding)
        return lax.with_sharding_constraint(fn(x), sharding)

    return run


# --------------------------------------------------------------------------
# CWT: scales sharded across chips (embarrassing)
# --------------------------------------------------------------------------

def cwt_scale_sharded(
    signal,
    scales,
    wavelet,
    mesh: Mesh,
    sampling_rate: float = 1.0,
    padding: PaddingType = PaddingType.SYMMETRIC,
    axis_name: str | None = None,
) -> CWTResult:
    """FFT-based CWT with the scales axis sharded over the mesh.

    The signal FFT is computed once and replicated; each chip evaluates its
    own block of wavelet spectra and inverse FFTs — the TPU analog of the
    reference's parallel stream over scales with a shared signal FFT
    (ContinuousWaveletTransform.java:511-565), but with the scale loop as a
    sharded tensor axis instead of a thread pool.
    """
    axis_name = axis_name or mesh.axis_names[0]
    n_dev = mesh.shape[axis_name]
    wav = get_continuous_wavelet(wavelet)
    scales = np.atleast_1d(np.asarray(scales, dtype=np.float64))
    if scales.shape[0] % n_dev != 0:
        raise JWaveFailure(
            f"cwt_scale_sharded - number of scales {scales.shape[0]} must divide "
            f"evenly over {n_dev} devices"
        )
    n = signal.shape[-1]
    padded_len = next_power_of_two(n)
    omega = jnp.asarray(_omega_axis(padded_len, sampling_rate))
    lead = signal.ndim - 1

    def _local(sig_fft, scales_loc):
        a = scales_loc[:, None]
        w_hat = jnp.conj(wav.psi_hat_scaled(omega[None, :], a))
        return jnp.fft.ifft(sig_fft[..., None, :] * w_hat, axis=-1)[..., :n]

    out_spec = P(*([None] * lead), axis_name, None)
    mapped = shard_map(
        _local, mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=out_spec,
    )

    @jax.jit
    def run(sig, sc):
        sig_fft = jnp.fft.fft(pad_signal(sig, padded_len, padding), axis=-1)
        return mapped(sig_fft, sc)

    coeffs = run(jnp.asarray(signal), jnp.asarray(scales))
    time_axis = jnp.arange(n) / sampling_rate
    return CWTResult(coeffs, jnp.asarray(scales), time_axis, float(sampling_rate), wav.name)


# --------------------------------------------------------------------------
# separable 2D transforms: row shards + all_to_all distributed transpose
# --------------------------------------------------------------------------

def _sharded_separable_2d(fn_rows, fn_cols, mesh: Mesh, axis_name: str | None = None):
    """rows-local transform -> all_to_all transpose -> columns-local
    transform -> all_to_all back. Both collectives move each element twice
    in total — the bandwidth-optimal pattern used by distributed FFTs."""
    axis_name = axis_name or mesh.axis_names[0]
    n_dev = mesh.shape[axis_name]

    def _local(block):  # block: (R/D, C)
        y = fn_rows(block)
        r, c_full = y.shape
        c = c_full // n_dev
        y = y.reshape(r, n_dev, c)
        y = lax.all_to_all(y, axis_name, split_axis=1, concat_axis=0)  # (D, r, c)
        y = y.reshape(n_dev * r, c)  # (R, c): this chip now owns a column chunk
        y = jnp.swapaxes(y, 0, 1)  # (c, R)
        y = fn_cols(y)
        y = jnp.swapaxes(y, 0, 1)  # (R, c)
        y = y.reshape(n_dev, r, c)
        y = lax.all_to_all(y, axis_name, split_axis=0, concat_axis=1)  # (r, D, c)
        return y.reshape(r, c_full)

    mapped = shard_map(_local, mesh=mesh, in_specs=P(axis_name, None), out_specs=P(axis_name, None))

    @jax.jit
    def run(mat):
        return mapped(mat)

    def wrapper(mat):
        rows, cols = mat.shape
        if rows % n_dev or cols % n_dev:
            raise JWaveFailure(
                f"sharded 2D transform - matrix {rows}x{cols} must tile evenly "
                f"over {n_dev} devices on both axes"
            )
        return run(mat)

    return wrapper


def fwt2d_sharded(mat, wavelet, mesh: Mesh, level_rows=None, level_cols=None, axis_name=None):
    """2D FWT sharded across the mesh (BASELINE config #4)."""
    f = _sharded_separable_2d(
        lambda b: fwt(b, wavelet, level_cols), lambda b: fwt(b, wavelet, level_rows), mesh, axis_name
    )
    return f(jnp.asarray(mat))


def ifwt2d_sharded(mat, wavelet, mesh: Mesh, level_rows=None, level_cols=None, axis_name=None):
    f = _sharded_separable_2d(
        lambda b: ifwt(b, wavelet, level_cols), lambda b: ifwt(b, wavelet, level_rows), mesh, axis_name
    )
    return f(jnp.asarray(mat))


def wpt2d_sharded(mat, wavelet, mesh: Mesh, level_rows=None, level_cols=None, axis_name=None):
    f = _sharded_separable_2d(
        lambda b: wpt(b, wavelet, level_cols), lambda b: wpt(b, wavelet, level_rows), mesh, axis_name
    )
    return f(jnp.asarray(mat))


def iwpt2d_sharded(mat, wavelet, mesh: Mesh, level_rows=None, level_cols=None, axis_name=None):
    f = _sharded_separable_2d(
        lambda b: iwpt(b, wavelet, level_cols), lambda b: iwpt(b, wavelet, level_rows), mesh, axis_name
    )
    return f(jnp.asarray(mat))


# --------------------------------------------------------------------------
# MODWT: time axis sharded with ppermute halo exchange
# --------------------------------------------------------------------------

def _halo_left(v, halo, axis_name, n_dev):
    """Fetch the left neighbor's tail (circular): each chip sends its last
    ``halo`` samples one step to the right."""
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    return lax.ppermute(v[..., -halo:], axis_name, perm)


def _halo_right(v, halo, axis_name, n_dev):
    """Fetch the right neighbor's head (circular)."""
    perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    return lax.ppermute(v[..., :halo], axis_name, perm)


def _conv_valid_1d(x, kernel):
    out = lax.conv_general_dilated(
        x[None, None, :],
        jnp.asarray(kernel, dtype=x.dtype)[None, None, :],
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=x.dtype,
        precision=_config.conv_precision(),
    )
    return out[0, 0, :]


def modwt_halo_sharded(signal, wavelet, level: int, mesh: Mesh, axis_name: str | None = None):
    """Forward MODWT with the time axis sharded across the mesh.

    Per level each chip convolves its local chunk after a single
    ``ppermute`` halo exchange of the level filter's support (L_j - 1
    samples) from its left neighbor — the compact-support analog of ring
    attention (SURVEY.md §5.7). Requires halo <= local chunk length, i.e.
    level J <~ log2(N / (D * M)); use the FFT path on gathered data beyond
    that.
    """
    axis_name = axis_name or mesh.axis_names[0]
    n_dev = mesh.shape[axis_name]
    n = signal.shape[-1]
    if signal.ndim != 1:
        raise JWaveFailure("modwt_halo_sharded - expects a 1D signal (use batch_sharded for batches)")
    if n % n_dev:
        raise JWaveFailure(f"modwt_halo_sharded - length {n} must divide over {n_dev} devices")
    _validate_level(n, level, "modwt_halo_sharded")
    n_loc = n // n_dev
    filters = _level_filters(wavelet, level, n)
    for gj, hj in filters:
        if gj.shape[0] - 1 > n_loc:
            raise JWaveFailure(
                f"modwt_halo_sharded - level filter support {gj.shape[0]} exceeds local "
                f"chunk {n_loc}; lower the level or use fewer devices"
            )

    def _local(v):  # v: (n_loc,)
        rows = []
        for gj, hj in filters:
            lg = gj.shape[0]
            halo = lg - 1
            if halo > 0:
                ext = jnp.concatenate([_halo_left(v, halo, axis_name, n_dev), v])
            else:
                ext = v
            w = _conv_valid_1d(ext, np.ascontiguousarray(hj[::-1]))
            v = _conv_valid_1d(ext, np.ascontiguousarray(gj[::-1]))
            rows.append(w)
        rows.append(v)
        return jnp.stack(rows)  # (J+1, n_loc)

    mapped = shard_map(_local, mesh=mesh, in_specs=P(axis_name), out_specs=P(None, axis_name))
    return jax.jit(mapped)(jnp.asarray(signal))


def imodwt_halo_sharded(coeffs, wavelet, mesh: Mesh, axis_name: str | None = None):
    """Inverse MODWT with time-sharded coefficients ((J+1, N) layout).

    The adjoint convolution needs the *right* neighbor's head instead of
    the left neighbor's tail — one ppermute per level in the opposite ring
    direction."""
    axis_name = axis_name or mesh.axis_names[0]
    n_dev = mesh.shape[axis_name]
    level = coeffs.shape[-2] - 1
    n = coeffs.shape[-1]
    if n % n_dev:
        raise JWaveFailure(f"imodwt_halo_sharded - length {n} must divide over {n_dev} devices")
    n_loc = n // n_dev
    filters = _level_filters(wavelet, level, n)
    for gj, _ in filters:
        if gj.shape[0] - 1 > n_loc:
            raise JWaveFailure(
                f"imodwt_halo_sharded - level filter support {gj.shape[0]} exceeds local chunk {n_loc}"
            )

    def _local(c):  # c: (J+1, n_loc)
        v = c[level]
        for j in range(level, 0, -1):
            gj, hj = filters[j - 1]
            halo = gj.shape[0] - 1
            w = c[j - 1]
            if halo > 0:
                ev = jnp.concatenate([v, _halo_right(v, halo, axis_name, n_dev)])
                ew = jnp.concatenate([w, _halo_right(w, halo, axis_name, n_dev)])
            else:
                ev, ew = v, w
            v = _conv_valid_1d(ev, gj) + _conv_valid_1d(ew, hj)
        return v

    mapped = shard_map(_local, mesh=mesh, in_specs=P(None, axis_name), out_specs=P(axis_name))
    return jax.jit(mapped)(jnp.asarray(coeffs))
