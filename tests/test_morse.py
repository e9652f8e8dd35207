"""Generalized Morse wavelets (superset — reference has 5 continuous
families, SURVEY.md §2.4; Morse is the modern analytic standard)."""
import numpy as np
import pytest
import jax.numpy as jnp

import jwave_tpu as jw


class TestMorseWavelet:
    def test_peak_normalization_and_location(self):
        w = jw.MorseWavelet(20.0, 3.0)
        om = np.linspace(0.1, 5.0, 20000)
        mag = np.abs(np.asarray(w.psi_hat(jnp.asarray(om))))
        assert abs(om[mag.argmax()] - w.omega_peak) < 1e-3
        assert abs(mag.max() - 2.0) < 1e-5
        assert w.is_analytic
        # exactly zero at and below zero frequency
        neg = np.asarray(w.psi_hat(jnp.asarray([-2.0, -0.5, 0.0])))
        np.testing.assert_array_equal(neg, 0.0)

    @pytest.mark.slow
    def test_time_domain_synthesis_parseval(self):
        # psi(t) from numerical Fourier inversion must carry the same energy
        # as the closed-form spectrum: ||psi||^2 = (1/2pi) ||psi_hat||^2
        w = jw.MorseWavelet(20.0, 3.0)
        t = np.linspace(-6 * w._duration, 6 * w._duration, 8192)
        pt = np.asarray(w.psi(jnp.asarray(t)))
        e_time = np.trapezoid(np.abs(pt) ** 2, t)
        wq = w._quad_nodes()
        spec = np.abs(np.asarray(w.psi_hat(jnp.asarray(wq)))) ** 2
        e_freq = np.trapezoid(spec, wq) / (2.0 * np.pi)
        np.testing.assert_allclose(e_time, e_freq, rtol=1e-6)

    def test_paul_is_morse_gamma_1(self):
        # psi_hat of Paul(m) is proportional to Morse(beta=m, gamma=1):
        # both are w^m e^-w on w > 0 up to normalization
        p = jw.PaulWavelet(4)
        m = jw.MorseWavelet(4.0, 1.0)
        om = jnp.asarray(np.linspace(0.01, 30.0, 500))
        rp = np.abs(np.asarray(p.psi_hat(om)))
        rm = np.abs(np.asarray(m.psi_hat(om)))
        keep = rm > 1e-12
        ratio = rp[keep] / rm[keep]
        np.testing.assert_allclose(ratio, ratio[0], rtol=1e-10)

    def test_admissibility_closed_form(self):
        # C = a^2 Gamma(2 beta/gamma) / (gamma 2^(2 beta/gamma)) vs quadrature
        w = jw.MorseWavelet(6.0, 2.0)
        om = np.linspace(1e-6, 30.0, 400000)
        mag2 = np.abs(np.asarray(w.psi_hat(jnp.asarray(om)))) ** 2
        numeric = np.trapezoid(mag2 / om, om)
        np.testing.assert_allclose(w.admissibility_constant(), numeric, rtol=1e-4)

    @pytest.mark.slow
    def test_cwt_and_ssq_localize_a_tone(self):
        fs, n = 1000.0, 2048
        x = jnp.asarray(np.cos(2 * np.pi * 50.0 * np.arange(n) / fs))
        w = jw.MorseWavelet()
        fc = w.center_frequency
        scales = jw.generate_log_scales(fc / 400.0, fc / 5.0, 96)
        res = jw.cwt(x, scales, w, fs)
        sg = np.asarray(res.scalogram())
        peak_f = fc / float(np.asarray(res.scales)[sg.argmax()])
        assert abs(peak_f - 50.0) / 50.0 < 0.05
        sq = jw.ssq_cwt(x, scales, w, fs)
        energy = np.asarray(jnp.abs(sq.Tx) ** 2)[:, n // 4 : 3 * n // 4].sum(axis=1)
        assert abs(float(sq.frequencies[energy.argmax()]) - 50.0) / 50.0 < 0.05
        xr = np.asarray(jw.issq_cwt(sq, w))
        assert np.abs(xr - np.asarray(x))[n // 8 : -n // 8].max() < 2e-2

    def test_registry_and_validation(self):
        assert isinstance(jw.get_continuous_wavelet("morse"), jw.MorseWavelet)
        w = jw.get_continuous_wavelet("morse", 8.0, 2.0)
        assert w.beta == 8.0 and w.gamma == 2.0
        with pytest.raises(ValueError):
            jw.MorseWavelet(-1.0, 3.0)
        with pytest.raises(ValueError):
            jw.MorseWavelet(20.0, 0.0)

    @pytest.mark.slow
    def test_direct_cwt_path_uses_numeric_psi(self):
        fs = 1000.0
        x = jnp.asarray(np.cos(2 * np.pi * 50.0 * np.arange(512) / fs))
        w = jw.MorseWavelet()
        scales = jw.generate_log_scales(w.center_frequency / 100.0,
                                        w.center_frequency / 20.0, 6)
        direct = jw.cwt_direct(x, scales, w, fs)
        fft = jw.cwt(x, scales, w, fs, padding=jw.PaddingType.ZERO)
        # interior agreement between the two formulations (the direct path
        # truncates to the effective support, so coarse agreement only)
        a = np.asarray(direct.coefficients)[:, 128:384]
        b = np.asarray(fft.coefficients)[:, 128:384]
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-2 * np.abs(b).max())


def test_large_beta_no_overflow():
    # jLab-range parameters: each factor of a * w^beta * e^{-w^gamma}
    # overflows float32 alone; the log-space evaluation must not
    w = jw.MorseWavelet(120.0, 3.0)
    om = np.linspace(0.1, 2.0 * w.omega_peak, 4000)
    mag = np.abs(np.asarray(w.psi_hat(jnp.asarray(om, dtype=jnp.float32))))
    assert np.all(np.isfinite(mag))
    assert abs(mag.max() - 2.0) < 1e-3
    assert np.isfinite(w.admissibility_constant())
