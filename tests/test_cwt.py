"""CWT: FFT path vs direct path, wavelet math properties, result container,
padding modes, scale generators."""
import numpy as np
import jax.numpy as jnp
import pytest

import jwave_tpu as jw
from jwave_tpu.transforms.cwt import PaddingType, _omega_axis, pad_signal

import oracle


def test_scale_generators():
    s = jw.generate_log_scales(1.0, 100.0, 5)
    np.testing.assert_allclose(s, np.exp(np.linspace(0, np.log(100), 5)), rtol=1e-12)
    s = jw.generate_linear_scales(1.0, 9.0, 5)
    np.testing.assert_allclose(s, [1, 3, 5, 7, 9], atol=1e-12)
    with pytest.raises(ValueError):
        jw.generate_log_scales(-1.0, 10.0, 5)
    with pytest.raises(ValueError):
        jw.generate_linear_scales(5.0, 1.0, 3)
    with pytest.raises(ValueError):
        jw.generate_log_scales(1.0, 10.0, 1)


def test_omega_axis_matches_reference_convention():
    """Negative-frequency fold with index P/2 kept positive
    (ContinuousWaveletTransform.java:450-459)."""
    omega = _omega_axis(8, 2.0)
    fs = 2.0
    assert omega[0] == 0.0
    assert omega[4] == pytest.approx(2 * np.pi * 4 * fs / 8)  # stays positive
    assert omega[5] == pytest.approx(2 * np.pi * 5 * fs / 8 - 2 * np.pi * fs)


def test_padding_modes(rng):
    x = jnp.asarray(np.arange(1.0, 6.0))  # [1..5] -> pad to 8
    np.testing.assert_allclose(np.asarray(pad_signal(x, 8, PaddingType.ZERO)), [1, 2, 3, 4, 5, 0, 0, 0])
    np.testing.assert_allclose(np.asarray(pad_signal(x, 8, PaddingType.CONSTANT)), [1, 2, 3, 4, 5, 5, 5, 5])
    np.testing.assert_allclose(np.asarray(pad_signal(x, 8, PaddingType.PERIODIC)), [1, 2, 3, 4, 5, 1, 2, 3])
    # reference mirror: padded[i] = signal[2N-i-2] => 4,3,2
    np.testing.assert_allclose(np.asarray(pad_signal(x, 8, PaddingType.SYMMETRIC)), [1, 2, 3, 4, 5, 4, 3, 2])


def test_morlet_values():
    w = jw.MorletWavelet(1.0, 1.0)
    # psi(0) = 1/sqrt(2 pi fb)
    assert complex(np.asarray(w.psi(0.0))) == pytest.approx(1 / np.sqrt(2 * np.pi), abs=1e-12)
    # psi_hat peaks at w = 2 pi fc with value sqrt(2 pi fb)
    assert complex(np.asarray(w.psi_hat(2 * np.pi))) == pytest.approx(np.sqrt(2 * np.pi), abs=1e-12)


def test_mexican_hat_values():
    w = jw.MexicanHatWavelet(1.0)
    norm = 2.0 / (np.sqrt(3.0) * np.pi**0.25)
    assert complex(np.asarray(w.psi(0.0))) == pytest.approx(norm, abs=1e-12)
    assert complex(np.asarray(w.psi(1.0))) == pytest.approx(0.0, abs=1e-12)  # zero crossing at t=sigma


def test_paul_analytic():
    w = jw.PaulWavelet(4)
    assert complex(np.asarray(w.psi_hat(-1.0))) == 0.0
    assert complex(np.asarray(w.psi_hat(0.0))) == 0.0
    assert abs(complex(np.asarray(w.psi_hat(4.0)))) > 0.0  # peak at omega=m


def test_dog2_matches_hermite():
    w = jw.DOGWavelet(2, 1.0)
    # H_2(x) = 4x^2 - 2 -> psi(0) = -2 * norm
    assert complex(np.asarray(w.psi(0.0))).real == pytest.approx(-2.0 * w.norm, abs=1e-12)


def test_meyer_spectrum_support():
    w = jw.MeyerWavelet()
    lo, hi = 2 * np.pi / 3, 8 * np.pi / 3
    assert abs(complex(np.asarray(w.psi_hat(lo * 0.9)))) == 0.0
    assert abs(complex(np.asarray(w.psi_hat(hi * 1.1)))) == 0.0
    assert abs(complex(np.asarray(w.psi_hat(np.pi)))) > 0.0
    # partition: |psi_hat|^2 at matching sin/cos points is smooth
    assert abs(complex(np.asarray(w.psi_hat(2 * np.pi)))) > 0.0


def test_cwt_fft_matches_freq_domain_oracle(rng):
    """FFT path against an independent NumPy transcription of the reference
    formula (ContinuousWaveletTransform.java:183-229): one signal FFT, per
    scale multiply by conj(sqrt(a)*psi_hat(a*omega)), inverse FFT.

    (Note: the reference's Morlet psi_hat is sqrt(2*pi*fb) times the true
    Fourier transform of its psi, so the reference's FFT and direct paths
    differ by that constant amplitude factor — a reference semantic we
    preserve; each path is validated against its own oracle.)
    """
    n = 96  # non-pow2 -> exercises padding
    sig = rng.standard_normal(n)
    scales = np.array([2.0, 5.0, 11.0])
    wav = jw.MorletWavelet(1.0, 1.0)
    fs = 2.0
    got = np.asarray(jw.cwt(jnp.asarray(sig), scales, wav, fs, jw.PaddingType.ZERO).coefficients)

    p = 128
    padded = np.concatenate([sig, np.zeros(p - n)])
    x_hat = np.fft.fft(padded)
    i = np.arange(p, dtype=np.float64)
    omega = 2 * np.pi * i * fs / p
    omega[i > p // 2] -= 2 * np.pi * fs
    want = np.zeros((3, n), dtype=complex)
    for si, a in enumerate(scales):
        w_hat = np.sqrt(a) * np.conj(np.asarray(wav.psi_hat(jnp.asarray(a * omega))))
        want[si] = np.fft.ifft(x_hat * w_hat)[:n]
    np.testing.assert_allclose(got, want, atol=1e-10)


@pytest.mark.slow
def test_cwt_fft_vs_direct_shape(rng):
    """Both paths localize the same tone at the same scale (amplitudes
    differ by the reference's psi/psi_hat normalization quirk)."""
    n = 128
    t = np.arange(n)
    sig = np.sin(2 * np.pi * (16.0 / n) * t)
    scales = np.array([4.0, 8.0, 16.0])
    wav = jw.MorletWavelet(1.0, 1.0)
    fftc = np.asarray(jw.cwt(jnp.asarray(sig), scales, wav, 1.0, jw.PaddingType.PERIODIC).coefficients)
    direct = oracle.cwt_direct(sig, scales, wav, 1.0)
    f_energy = np.sum(np.abs(fftc[:, 40:90]) ** 2, axis=1)
    d_energy = np.sum(np.abs(direct[:, 40:90]) ** 2, axis=1)
    assert np.argmax(f_energy) == np.argmax(d_energy) == 1  # scale 8 wins in both


def test_cwt_direct_api_matches_oracle(rng):
    n = 64
    sig = rng.standard_normal(n)
    scales = np.array([1.5, 3.0])
    wav = jw.MexicanHatWavelet(1.0)
    got = np.asarray(jw.cwt_direct(jnp.asarray(sig), scales, wav, 1.0).coefficients)
    want = oracle.cwt_direct(sig, scales, wav, 1.0)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_cwt_detects_oscillation_scale():
    """A pure tone's scalogram peaks at scale a = fc/f0 — the reference's
    FFT path evaluates psi_hat(a*omega) on a physical rad/s axis
    (ContinuousWaveletTransform.java:450-459), so scale is in seconds."""
    fs, f0, n = 100.0, 5.0, 1024
    t = np.arange(n) / fs
    sig = np.sin(2 * np.pi * f0 * t)
    wav = jw.MorletWavelet(1.0, 1.0)
    scales = jw.generate_log_scales(0.02, 2.0, 64)
    res = jw.cwt(jnp.asarray(sig), scales, wav, fs)
    peak_scale = scales[int(np.argmax(np.asarray(res.scalogram())))]
    expected = wav.center_frequency / f0  # = 0.2 s
    assert peak_scale == pytest.approx(expected, rel=0.1)


def test_scale_to_frequency_formula():
    """Container method preserves the reference's fc*fs/a mapping
    (CWTResult.java:scaleToFrequency)."""
    res = jw.cwt(jnp.zeros(16), [2.0, 4.0], "morlet", 10.0)
    np.testing.assert_allclose(np.asarray(res.scale_to_frequency(1.5)), [1.5 * 10 / 2, 1.5 * 10 / 4])


def test_result_container(rng):
    sig = rng.standard_normal(64)
    res = jw.cwt(jnp.asarray(sig), [1.0, 2.0, 4.0], "morlet", 10.0)
    assert res.n_scales == 3 and res.n_time == 64
    assert res.magnitude().shape == (3, 64)
    assert res.phase().shape == (3, 64)
    np.testing.assert_allclose(
        np.asarray(res.magnitude()) ** 2,
        np.asarray(res.real()) ** 2 + np.asarray(res.imaginary()) ** 2,
        atol=1e-10,
    )
    np.testing.assert_allclose(np.asarray(res.time_axis), np.arange(64) / 10.0, atol=1e-12)
    assert res.wavelet_name == "Morlet"


def test_cwt_batched(rng):
    sigs = rng.standard_normal((4, 128))
    res = jw.cwt(jnp.asarray(sigs), [2.0, 4.0], "mexican hat", 1.0)
    assert res.coefficients.shape == (4, 2, 128)
    single = jw.cwt(jnp.asarray(sigs[2]), [2.0, 4.0], "mexican hat", 1.0)
    np.testing.assert_allclose(
        np.asarray(res.coefficients[2]), np.asarray(single.coefficients), atol=1e-10
    )


def test_facade(rng):
    tr = jw.ContinuousWaveletTransform("morlet")
    res = tr.transform_fft(rng.standard_normal(256), [1.0, 2.0], 1.0)
    assert res.coefficients.shape == (2, 256)
    with pytest.raises(jw.JWaveFailure):
        tr.forward(np.zeros(8))
    with pytest.raises(jw.JWaveFailure):
        tr.reverse(np.zeros(8))


def test_icwt_reconstruction():
    """Inverse CWT (superset — the reference raises): frequency-domain least
    squares with Hermitian pooling is in-band exact for pow-2 lengths."""
    fs, n = 100.0, 1024
    t = np.arange(n) / fs
    sig = np.sin(2 * np.pi * (51 * fs / n) * t) + 0.5 * np.cos(2 * np.pi * (113 * fs / n) * t)
    scales = jw.generate_log_scales(0.005, 0.5, 48)
    for wav in (jw.MorletWavelet(1.0, 1.0), jw.MexicanHatWavelet(1.0), jw.PaulWavelet(4)):
        res = jw.cwt(sig, scales, wav, fs, jw.PaddingType.PERIODIC)
        rec = np.asarray(jw.icwt(res, wav))
        np.testing.assert_allclose(rec, sig, atol=1e-8)


def test_icwt_default_wavelet_lookup():
    sig = np.sin(2 * np.pi * 0.05 * np.arange(256))
    res = jw.cwt(sig, [2.0, 4.0, 8.0, 16.0], "morlet", 1.0, jw.PaddingType.PERIODIC)
    # name-based lookup silently uses default wavelet parameters -> must warn
    with pytest.warns(UserWarning, match="default parameters"):
        rec = np.asarray(jw.icwt(res))
    assert rec.shape == sig.shape


def test_cwt_chunked_matches_full(rng):
    sig = rng.standard_normal(256)
    scales = jw.generate_log_scales(1.0, 32.0, 10)
    full = jw.cwt(jnp.asarray(sig), scales, "morlet", 2.0)
    chunked = jw.cwt_chunked(jnp.asarray(sig), scales, "morlet", 2.0, scale_chunk=3)
    np.testing.assert_allclose(
        np.asarray(chunked.coefficients), np.asarray(full.coefficients), atol=1e-12
    )
    assert chunked.n_scales == 10


# --------------------------------------------------------------------------
# Cross-wavelet transform + coherence (superset)
# --------------------------------------------------------------------------

class TestCrossWavelet:
    def test_xwt_self_is_power(self, rng):
        sig = jnp.asarray(rng.standard_normal(512))
        scales = jw.generate_log_scales(1e-2, 1e-1, 8)
        xr = jw.xwt(sig, sig, scales, jw.MorletWavelet(1.0, 1.0), 100.0)
        auto = jw.cwt(sig, scales, jw.MorletWavelet(1.0, 1.0), 100.0)
        np.testing.assert_allclose(
            np.asarray(xr.magnitude()), np.asarray(jnp.abs(auto.coefficients) ** 2), rtol=1e-6
        )
        # self cross-spectrum has zero phase
        assert float(jnp.max(jnp.abs(xr.phase()))) < 1e-6

    def test_coherence_detects_shared_band_and_phase(self, rng):
        n, fs = 2048, 1000.0
        t = np.arange(n) / fs
        a = np.sin(2 * np.pi * 50 * t) + 0.5 * rng.standard_normal(n)
        b = np.sin(2 * np.pi * 50 * t - np.pi / 4) + 0.5 * rng.standard_normal(n)
        scales = jw.generate_log_scales(2e-3, 2e-1, 32)
        r2, xr = jw.wavelet_coherence(jnp.asarray(a), jnp.asarray(b), scales,
                                      jw.MorletWavelet(1.0, 1.0), fs)
        assert float(r2.min()) >= 0.0 and float(r2.max()) <= 1.0
        sc = np.asarray(scales)
        shared = np.argmin(abs(sc - 1.0 / 50.0))
        far = np.argmin(abs(sc - 1.0 / 400.0))
        mid = slice(n // 4, 3 * n // 4)
        assert float(jnp.mean(r2[shared, mid])) > 0.8
        assert float(jnp.mean(r2[shared, mid])) > float(jnp.mean(r2[far, mid])) + 0.3
        phase = float(jnp.angle(jnp.mean(xr.coefficients[shared, mid])))
        assert abs(phase - np.pi / 4) < 0.15

    def test_coherence_of_identical_signals_is_one(self, rng):
        sig = jnp.asarray(rng.standard_normal(1024))
        scales = jw.generate_log_scales(1e-2, 1e-1, 8)
        r2, _ = jw.wavelet_coherence(sig, sig, scales, jw.MorletWavelet(1.0, 1.0), 100.0)
        assert float(r2.min()) > 0.999
