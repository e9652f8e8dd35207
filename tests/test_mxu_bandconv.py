"""ops.mxu_bandconv — circular strided band convolutions as tile matmuls.

Gates: both tile forms (lane / block) against the FFT convolution theorem
reference at f64, tap-window extraction, and the planning predicate.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from jwave_tpu.ops.mxu_bandconv import conv_taps, plan, strided_band_conv

RNG = np.random.default_rng(20260820)


def _gauss_filter(m, xi, sig):
    f = np.arange(m) / m
    f[f > 0.5] -= 1.0
    return np.exp(-((f - xi) ** 2) / (2.0 * sig**2))


@pytest.mark.parametrize(
    "m,S,xi,sig",
    [
        (4096, 1, 0.2, 0.05),    # lane form
        (4096, 2, 0.2, 0.05),    # block form, small stride
        (8192, 4, 0.1, 0.03),
        (8192, 64, 0.01, 0.004),  # block form, large stride / long taps
        (2048, 2, 0.45, 0.002),   # near-Nyquist bump, very long taps
    ],
)
def test_matches_fft_convolution(m, S, xi, sig):
    fh = _gauss_filter(m, xi, sig)
    u = RNG.standard_normal((3, m))
    ref = np.fft.ifft(np.fft.fft(u, axis=-1) * fh, axis=-1)[..., ::S]
    out = strided_band_conv(jnp.asarray(u), fh, S)
    assert out is not None, "plan unexpectedly refused this shape"
    yr, yi = np.asarray(out[0]), np.asarray(out[1])
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(yr - ref.real)) < 1e-6 * scale
    assert np.max(np.abs(yi - ref.imag)) < 1e-6 * scale


def test_real_filter_zero_imag():
    m = 2048
    fh = _gauss_filter(m, 0.0, 0.01)  # symmetric about 0 -> real taps
    fh = fh + fh[::-1][np.r_[0, np.arange(m - 1, 0, -1) * 0 + 0]] * 0  # keep symmetric
    u = RNG.standard_normal((2, m))
    out = strided_band_conv(jnp.asarray(u), fh, 8)
    assert out is not None
    assert float(jnp.max(jnp.abs(out[1]))) == 0.0


def test_tap_window_wraps():
    m = 1024
    fh = _gauss_filter(m, 0.0, 0.02)  # lowpass -> taps centered at t=0 (wraps)
    taps, t0 = conv_taps(fh)
    assert 0 < len(taps) < m
    # window must cover every above-eps coefficient
    h = np.fft.ifft(fh.astype(np.complex128))
    mask = np.abs(h) > 1e-7 * np.abs(h).max()
    covered = np.zeros(m, dtype=bool)
    covered[(t0 + np.arange(len(taps))) % m] = True
    assert not np.any(mask & ~covered)


def test_plan_rejects_hopeless_shapes():
    # taps nearly as long as the grid at stride 1: no matmul form wins
    assert plan(4096, 1, 4000) is None
