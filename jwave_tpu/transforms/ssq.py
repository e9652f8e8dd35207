"""Synchrosqueezed CWT (Daubechies, Lu & Wu 2011) — capability superset.

The reference library has no time-frequency reassignment of any kind; this
module adds the standard synchrosqueezing transform on top of the fused CWT,
designed TPU-first:

- The CWT and its exact time derivative come out of ONE batched program: the
  filter bank ``[psi_hat(a w), i w psi_hat(a w)]`` is stacked on the scale
  axis, so a single (2*scales, freq) multiply + one batched inverse FFT
  yields both (no finite differences, no second pass over the signal FFT).
- The phase transform (instantaneous frequency) is elementwise on the
  (scales, time) grid.
- Frequency reassignment is one batched ``scatter-add`` into log-spaced
  frequency bins with invalid entries routed to an out-of-bounds row and
  dropped in-kernel (``mode="drop"``) — no host round trips, jit/vmap/grad
  compatible.

Reconstruction (``issq_cwt``) uses the one-integral formula
``x(b) = 2 Re[ (1/C) sum_k Tx(f_k, b) ]`` with the wavelet constant
``C = integral_0^inf conj(psi_hat(u))/u du`` computed numerically from the
same ``psi_hat`` the forward used, so the library's wavelet normalization
quirks (e.g. the reference's Morlet psi_hat scaling,
MorletWavelet.java:114-124) cancel exactly.

Synchrosqueezing requires an analytic wavelet (Morlet, Paul, Morse): for a real
signal the instantaneous-frequency estimate Im[dW/W]/2pi is only meaningful
when the wavelet suppresses negative frequencies.
"""
from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..cwavelets import ContinuousWavelet, get_continuous_wavelet
from ..exceptions import JWaveFailure
from ..utils.numerics import next_power_of_two
from .cwt import PaddingType, _omega_axis, pad_signal
from .fft import fft as _fft_any, ifft as _ifft_any


@jax.tree_util.register_pytree_node_class
@dataclass
class SSQResult:
    """Synchrosqueezed-CWT output as a jax pytree.

    ``Tx`` has shape (..., n_freqs, n_time), complex: the CWT energy of each
    time column reassigned onto the ``frequencies`` grid (Hz, increasing).
    """

    Tx: jnp.ndarray
    frequencies: jnp.ndarray
    scales: jnp.ndarray
    time_axis: jnp.ndarray
    sampling_rate: float
    wavelet_name: str

    def tree_flatten(self):
        return (self.Tx, self.frequencies, self.scales, self.time_axis), (
            self.sampling_rate,
            self.wavelet_name,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def magnitude(self):
        return jnp.abs(self.Tx)

    def ridge(self):
        """Dominant instantaneous frequency per time step (Hz): the
        frequency bin with maximal |Tx| in each time column."""
        return self.frequencies[jnp.argmax(jnp.abs(self.Tx), axis=-2)]

    @property
    def n_freqs(self) -> int:
        return self.Tx.shape[-2]

    @property
    def n_time(self) -> int:
        return self.Tx.shape[-1]


def _log_measure(scales: np.ndarray) -> np.ndarray:
    """d(ln a) per scale for a monotone grid (central differences; exact for
    log-spaced grids). This is the integration measure of the one-integral
    inverse ``integral W(a,b) a^{-3/2} da = sum_j W_j a_j^{-1/2} dln(a_j)``."""
    v = np.log(scales)
    if v.shape[0] == 1:
        return np.ones(1)
    return np.abs(np.gradient(v))


_ONE_INTEGRAL_CACHE: dict = {}


def one_integral_constant(wavelet: ContinuousWavelet) -> complex:
    """``C = integral_0^inf conj(psi_hat(u))/u du`` evaluated numerically.

    Substituting u = e^v turns it into a plain trapezoid over
    ``conj(psi_hat(e^v))``. The grid spans [1e-4, 50] x the wavelet's peak
    angular frequency — beyond that both Morlet's Gaussian and Paul's
    ``w^m e^-w`` are numerically zero (Morlet's tiny psi_hat(0) > 0 makes the
    true integral log-divergent, but its contribution below the cutoff is
    ~1e-7 of C; see module docstring).

    The integrand runs under ``jax.jit`` with real/imag fetched separately:
    some TPU backends implement neither eager complex ops nor complex
    device->host transfers. Cached per wavelet configuration (the jit would
    otherwise recompile on every inverse call).
    """
    key = (type(wavelet).__name__,
           tuple(sorted((k, v) for k, v in vars(wavelet).items()
                        if isinstance(v, (bool, int, float, str)))))
    hit = _ONE_INTEGRAL_CACHE.get(key)
    if hit is not None:
        return hit
    w_peak = 2.0 * math.pi * max(wavelet.center_frequency, 1e-3)
    v = np.linspace(math.log(w_peak * 1e-4), math.log(w_peak * 50.0), 4096)

    @jax.jit
    def _integrand(u):
        vals = jnp.conj(wavelet.psi_hat(u))
        return jnp.real(vals), jnp.imag(vals)

    re, im = _integrand(jnp.asarray(np.exp(v)))
    vals = np.asarray(re) + 1j * np.asarray(im)
    trapezoid = getattr(np, "trapezoid", np.trapz)
    c = complex(trapezoid(vals, v))
    _ONE_INTEGRAL_CACHE[key] = c
    return c


def _bin_index(f_inst, freqs_np: np.ndarray):
    """Nearest-bin index (in log-frequency distance) for positive ``f_inst``.

    Log-uniform grids (the default) use the closed-form affine map; arbitrary
    increasing grids fall back to a searchsorted against the geometric
    midpoints between neighboring bins — both are exact nearest-in-log.
    Caller is responsible for masking non-positive frequencies first.
    """
    log_f = np.log(freqs_np)
    diffs = np.diff(log_f)
    if np.allclose(diffs, diffs[0], rtol=1e-9, atol=0.0):
        dlf = (log_f[-1] - log_f[0]) / (freqs_np.shape[0] - 1)
        return jnp.round((jnp.log(f_inst) - log_f[0]) / dlf).astype(jnp.int32)
    # K+1 edges (outer edges extrapolate the end spacings) so indices keep
    # the affine path's out-of-range convention: -1 below the grid, K above
    edges = np.exp(np.concatenate([
        [log_f[0] - diffs[0] / 2.0],
        (log_f[:-1] + log_f[1:]) / 2.0,
        [log_f[-1] + diffs[-1] / 2.0],
    ]))
    return (jnp.searchsorted(jnp.asarray(edges), f_inst) - 1).astype(jnp.int32)


def _squeeze_plane(W, dW, wgt, freqs_np: np.ndarray, gamma_abs, out_of_range: str,
                   reassign: str = "auto"):
    """Phase transform + weighted reassignment of a (…, S, N) coefficient
    block into the (…, K, N) bin grid. ``wgt`` is the per-scale measure
    ``a^{-1/2} dln(a)`` (shape (S,)); ``gamma_abs`` the absolute |W|
    threshold (broadcastable). Shared by the single-device and the
    scale-sharded paths — a sharded caller squeezes its local scale block
    with the full grid and psums the planes.

    ``reassign``: "scatter" (one scatter-add; fast on CPU), "dense" (masked
    compare-and-reduce over the bin axis; the TPU path — data-dependent
    scatters serialize on the TPU and measured 310x slower than the fused
    dense reduction at the bench shape), "pallas" (VMEM-tiled kernel,
    ops/pallas_reassign.py — reads the contributions once instead of once
    per bin row), or "auto" (dense on accelerators, scatter on CPU).
    """
    n_scales, n = W.shape[-2:]
    n_bins = freqs_np.shape[0]

    mag2 = jnp.real(W) ** 2 + jnp.imag(W) ** 2
    f_inst = jnp.imag(dW * jnp.conj(W)) / jnp.where(mag2 > 0, mag2, 1.0) / (2.0 * math.pi)

    keep = mag2 > gamma_abs * gamma_abs
    if out_of_range not in ("clip", "drop"):
        raise JWaveFailure(f"ssq_cwt - out_of_range must be 'clip' or 'drop', got {out_of_range!r}")
    if out_of_range == "drop":
        keep = keep & (f_inst > 0)

    contrib = W * jnp.asarray(wgt, W.real.dtype)[:, None]
    safe_f = jnp.where(keep & (f_inst > 0), f_inst, freqs_np[0])
    k_idx = _bin_index(safe_f, freqs_np)
    if out_of_range == "clip":
        k_idx = jnp.clip(k_idx, 0, n_bins - 1)
        k_idx = jnp.where(keep, k_idx, n_bins)
    else:
        k_idx = jnp.where(keep & (k_idx >= 0) & (k_idx < n_bins), k_idx, n_bins)

    if reassign == "auto":
        reassign = "scatter" if jax.default_backend() == "cpu" else "dense"
    if reassign == "pallas":
        # VMEM-tiled kernel: reads the contributions once instead of once
        # per bin row (ops/pallas_reassign.py); opt-in pending hardware
        # benchmarking against the dense XLA form. The kernel computes in
        # float32 (the VPU's width) — passing it here is an explicit opt-in,
        # and the complex64 result dtype makes the precision visible
        from ..ops.pallas_reassign import reassign_pallas

        return reassign_pallas(contrib.astype(jnp.complex64), k_idx, n_bins)
    if reassign == "dense":
        # one fused compare-select-reduce per bin row: no data-dependent
        # addressing anywhere, so XLA tiles it onto the VPU (8.6 ms vs the
        # scatter's 2.7 s at 8x64x65536 on a v5e)
        ar = jnp.arange(n_bins, dtype=k_idx.dtype)[:, None, None]  # (K, 1, 1)
        mask = k_idx[..., None, :, :] == ar  # (..., K, S, N), fused
        re = jnp.sum(jnp.where(mask, jnp.real(contrib)[..., None, :, :], 0), axis=-2)
        im = jnp.sum(jnp.where(mask, jnp.imag(contrib)[..., None, :, :], 0), axis=-2)
        return jax.lax.complex(re, im)
    if reassign != "scatter":
        raise JWaveFailure(
            f"ssq_cwt - reassign must be 'auto', 'dense', 'scatter' or 'pallas', got {reassign!r}"
        )

    b_idx = jnp.broadcast_to(jnp.arange(n), (n_scales, n))

    def _reassign_one(c, k):
        return jnp.zeros((n_bins, n), c.dtype).at[k, b_idx].add(c, mode="drop")

    # complex scatter-add is UNIMPLEMENTED on some TPU backends — reassign
    # the real/imag planes as one extra vmapped REAL scatter (same math)
    fn = _reassign_one
    for _ in range(W.ndim - 1):  # leading batch dims + the (re, im) axis
        fn = jax.vmap(fn)
    parts = jnp.stack([jnp.real(contrib), jnp.imag(contrib)], axis=-3)
    k2 = jnp.broadcast_to(k_idx[..., None, :, :], parts.shape).astype(k_idx.dtype)
    tx2 = fn(parts, k2)  # (..., 2, K, N)
    return jax.lax.complex(tx2[..., 0, :, :], tx2[..., 1, :, :])


def _default_bins(scales_np: np.ndarray, fc: float, frequencies) -> np.ndarray:
    """Resolve the frequencies argument into an increasing Hz grid."""
    if frequencies is None or isinstance(frequencies, int):
        k = scales_np.shape[0] if frequencies is None else int(frequencies)
        if k < 2:
            raise JWaveFailure(f"ssq_cwt - need at least 2 frequency bins, got {k}")
        f_lo = fc / scales_np.max()
        f_hi = fc / scales_np.min()
        return np.exp(np.linspace(math.log(f_lo), math.log(f_hi), k))
    freqs_np = np.asarray(frequencies, dtype=np.float64)
    if freqs_np.ndim != 1 or freqs_np.shape[0] < 2 or np.any(np.diff(freqs_np) <= 0):
        raise JWaveFailure("ssq_cwt - frequencies must be a 1D increasing grid")
    return freqs_np


def ssq_cwt(
    signal,
    scales,
    wavelet: ContinuousWavelet | str = "morlet",
    sampling_rate: float = 1.0,
    padding: PaddingType = PaddingType.SYMMETRIC,
    frequencies=None,
    gamma: float | None = None,
    out_of_range: str = "clip",
    reassign: str = "auto",
) -> SSQResult:
    """Synchrosqueezed CWT of a real signal.

    Args:
      signal: (..., N) real; batched over leading axes.
      scales: monotone scale grid in seconds (log-spaced recommended; see
        :func:`jwave_tpu.generate_log_scales`).
      wavelet: an *analytic* continuous wavelet (Morlet, Paul, or Morse).
      frequencies: target bin grid — None (log-spaced, one bin per scale,
        spanning the scale grid's own frequency range), an int (that many
        log-spaced bins over the same range), or an explicit increasing
        array in Hz.
      gamma: |W| threshold below which coefficients are not reassigned
        (phase is noise there). Default: 10*sqrt(eps(dtype)) * max|W| per
        signal.
      out_of_range: what to do with above-threshold coefficients whose
        instantaneous frequency falls outside the bin grid — "clip"
        (default) reassigns them to the nearest edge bin (non-positive
        estimates go to the lowest bin), preserving the coefficient sum
        exactly; multi-component interference beats routinely swing f_inst
        off the grid or negative, and dropping that mass costs ~1%
        reconstruction error on two-tone signals. "drop" discards it for a
        cleaner display.
      reassign: reassignment kernel — "auto" (default; dense masked
        reduction on accelerators, scatter-add on CPU), "dense", "scatter",
        or "pallas" (VMEM-tiled TPU kernel, float32 only). See
        :func:`_squeeze_plane`.

    Returns an :class:`SSQResult`; ``sum_k Tx[k, b]`` over bins equals the
    weighted scale sum ``sum_j W(a_j, b) a_j^{-1/2} dln(a_j)`` of the kept
    coefficients, which is what :func:`issq_cwt` inverts.
    """
    wav = get_continuous_wavelet(wavelet)
    if not wav.is_analytic:
        raise JWaveFailure(
            f"ssq_cwt - synchrosqueezing needs an analytic wavelet (Morlet, "
            f"Paul, Morse); {wav.name!r} has negative-frequency support, so the "
            f"instantaneous-frequency estimate of a real signal is meaningless"
        )
    scales_np = np.atleast_1d(np.asarray(scales, dtype=np.float64))
    if scales_np.ndim != 1 or scales_np.shape[0] < 2:
        raise JWaveFailure("ssq_cwt - need a 1D grid of at least 2 scales")
    fs = float(sampling_rate)
    n = signal.shape[-1]
    n_scales = scales_np.shape[0]
    freqs_np = _default_bins(scales_np, wav.center_frequency, frequencies)

    # -- one fused pass: W and dW/db from a stacked filter bank -------------
    padded_len = next_power_of_two(n)
    padded = pad_signal(signal, padded_len, padding)
    sig_fft = _fft_any(padded)  # (..., P)
    omega = _omega_axis(padded_len, fs)  # (P,) angular, negative fold
    a = jnp.asarray(scales_np)[:, None]  # (S, 1)
    w_hat = jnp.conj(wav.psi_hat_scaled(jnp.asarray(omega)[None, :], a))  # (S, P)
    bank = jnp.concatenate([w_hat, w_hat * (1j * jnp.asarray(omega))[None, :]], axis=0)
    out = _ifft_any(sig_fft[..., None, :] * bank)[..., :n]  # (..., 2S, N)
    W = out[..., :n_scales, :]
    dW = out[..., n_scales:, :]

    if gamma is None:
        mag2 = jnp.real(W) ** 2 + jnp.imag(W) ** 2
        eps = jnp.finfo(W.real.dtype).eps
        gamma_abs = 10.0 * jnp.sqrt(eps) * jnp.sqrt(
            jnp.max(mag2, axis=(-2, -1), keepdims=True)
        )
    else:
        gamma_abs = jnp.asarray(gamma, dtype=W.real.dtype)

    wgt = scales_np ** -0.5 * _log_measure(scales_np)
    tx = _squeeze_plane(W, dW, wgt, freqs_np, gamma_abs, out_of_range, reassign)

    time_axis = jnp.arange(n) / fs
    return SSQResult(tx, jnp.asarray(freqs_np), jnp.asarray(scales_np), time_axis, fs, wav.name)


def _ridge_dp_one(energy, penalty: float):
    """Viterbi ridge on one (K, N) log-energy plane: the path k(t) maximizing
    sum_t E[k(t), t] - penalty * (k(t) - k(t-1))^2. Returns (N,) int32.

    Forward pass is a ``lax.scan`` over time carrying the (K,) running score
    (the K x K transition candidates are one broadcast subtract — no
    data-dependent control flow); backtracking is a second reversed scan
    over the stored argmax pointers. jit/vmap/TPU friendly throughout.
    """
    k_bins = energy.shape[0]
    ar = jnp.arange(k_bins)
    pen = penalty * (ar[:, None] - ar[None, :]).astype(energy.dtype) ** 2  # (to, from)

    def fwd(score, e_t):
        cand = score[None, :] - pen  # (K_to, K_from)
        best = jnp.argmax(cand, axis=1)
        return e_t + jnp.take_along_axis(cand, best[:, None], axis=1)[:, 0], best

    score, ptrs = jax.lax.scan(fwd, energy[:, 0], energy[:, 1:].T)  # ptrs (N-1, K)
    end = jnp.argmax(score)

    def back(k, ptr_t):
        k_prev = ptr_t[k]
        return k_prev, k_prev

    _, rest = jax.lax.scan(back, end, ptrs, reverse=True)
    return jnp.concatenate([rest, end[None]]).astype(jnp.int32)


def extract_ridge(result: SSQResult, n_ridges: int = 1, penalty: float = 2.0,
                  tube_width: int = 2):
    """Penalized multi-ridge extraction from the squeezed plane (Carmona et
    al. 1999-style dynamic programming; no reference counterpart).

    Returns ``(indices, frequencies)`` of shape (..., n_ridges, N): per
    ridge, the frequency-bin path through ``|Tx|^2`` that maximizes energy
    minus ``penalty * (bin step)^2`` smoothness cost. Ridges are peeled
    greedily: after each extraction a ``tube_width``-bin tube around the
    ridge is suppressed before the next pass. Use
    :func:`ridge_tube_mask` + ``issq_cwt(..., band=mask)`` to reconstruct
    the mode under a ridge.
    """
    if n_ridges < 1:
        raise JWaveFailure(f"extract_ridge - n_ridges must be >= 1, got {n_ridges}")
    tx = result.Tx
    k_bins, n = tx.shape[-2:]
    mag2 = jnp.real(tx) ** 2 + jnp.imag(tx) ** 2
    tiny = jnp.finfo(mag2.dtype).tiny
    energy = jnp.log(mag2 + tiny)

    fn = functools.partial(_ridge_dp_one, penalty=penalty)
    for _ in range(tx.ndim - 2):
        fn = jax.vmap(fn)

    ridges = []
    floor = jnp.min(energy) - 1.0
    for _ in range(n_ridges):
        idx = fn(energy)  # (..., N)
        ridges.append(idx)
        dist = jnp.abs(jnp.arange(k_bins)[:, None] - idx[..., None, :])  # (..., K, N)
        energy = jnp.where(dist <= tube_width, floor, energy)
    indices = jnp.stack(ridges, axis=-2)  # (..., R, N)
    return indices, result.frequencies[indices]


def ridge_tube_mask(result: SSQResult, indices, tube_width: int = 2):
    """Boolean (..., K, N) mask selecting a ``tube_width``-bin tube around a
    ridge index path (..., N) — feed to ``issq_cwt(..., band=mask)`` to
    reconstruct that mode alone."""
    k_bins = result.Tx.shape[-2]
    dist = jnp.abs(jnp.arange(k_bins)[:, None] - jnp.asarray(indices)[..., None, :])
    return dist <= tube_width


def issq_cwt(result: SSQResult, wavelet: ContinuousWavelet | str | None = None,
             band=None):
    """Reconstruct the real signal from its synchrosqueezed transform:
    ``x(b) = 2 Re[ (1/C) sum_k Tx(f_k, b) ]`` (Daubechies-Lu-Wu eq. 2.5,
    discretized over the forward's log-scale measure).

    Accuracy is set by the scale grid: the grid must cover the wavelet's
    response around every signal frequency, and density controls how well
    ``sum_j psi_hat(a_j w) dln(a_j)`` approximates the constant C (32+
    scales per octave reconstructs to ~1e-3 relative).

    ``band`` restricts the sum to part of the squeezed plane — the mode
    extraction synchrosqueezing exists for: a ``(f_lo, f_hi)`` tuple in Hz
    keeps only bins inside the band, or a boolean array broadcastable to
    ``Tx``'s (..., K, N) selects per (bin, time) — e.g. a ridge tube from
    :func:`extract_ridge`. None (default) reconstructs the full signal.
    """
    if wavelet is None:
        from .cwt import _resolve_wavelet_by_name

        wav = _resolve_wavelet_by_name(result.wavelet_name, caller="issq_cwt")
    else:
        wav = get_continuous_wavelet(wavelet)
    c = one_integral_constant(wav)
    tx = result.Tx
    if band is not None:
        if isinstance(band, tuple) and len(band) == 2:
            f_lo, f_hi = band
            sel = (result.frequencies >= f_lo) & (result.frequencies <= f_hi)
            # empty-band validation needs concrete values; under jit/vmap the
            # frequencies are tracers, so the check is skipped (an empty band
            # then reconstructs zeros, which is at least well-defined)
            if not isinstance(sel, jax.core.Tracer) and not bool(jnp.any(sel)):
                freqs = np.asarray(result.frequencies)
                raise JWaveFailure(
                    f"issq_cwt - band ({f_lo}, {f_hi}) Hz contains no frequency "
                    f"bins (grid spans {freqs[0]:g}..{freqs[-1]:g} Hz)"
                )
            tx = tx * sel[:, None].astype(tx.real.dtype)
        else:
            tx = tx * jnp.asarray(band).astype(tx.real.dtype)
    total = jnp.sum(tx, axis=-2)
    return 2.0 * jnp.real(total / jnp.asarray(c))
