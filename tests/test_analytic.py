"""Analytic-signal utilities (superset — the reference has no Hilbert
machinery). Gates: exact real-part identity, quadrature accuracy on
tones, AM/FM demodulation, and composability."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import jwave_tpu as jw

FS = 1000.0
N = 2048
T = np.arange(N) / FS


class TestAnalyticSignal:
    def test_real_part_identity_and_quadrature(self):
        f0 = 164 * FS / N  # exact FFT bin: no leakage in the DFT Hilbert
        x = jnp.asarray(np.cos(2 * np.pi * f0 * T))
        z = jw.analytic_signal(x)
        np.testing.assert_allclose(np.asarray(z.real), np.asarray(x), atol=1e-12)
        # imaginary part is the Hilbert transform: cos -> sin
        np.testing.assert_allclose(np.asarray(z.imag),
                                   np.sin(2 * np.pi * f0 * T), atol=1e-10)

    def test_am_fm_demodulation(self):
        env_true = 1 + 0.5 * np.sin(2 * np.pi * 3 * T)
        f_true = 100 + 30 * np.sin(2 * np.pi * 2 * T)
        phase = 2 * np.pi * np.cumsum(f_true) / FS
        x = jnp.asarray(env_true * np.cos(phase))
        interior = slice(100, -100)
        env = np.asarray(jw.envelope(x))
        assert np.max(np.abs(env - env_true)[interior]) < 0.02
        fi = np.asarray(jw.instantaneous_frequency(x, FS))
        assert np.max(np.abs(fi - f_true)[interior]) < 2.0

    def test_odd_and_arbitrary_lengths(self):
        for n in (1001, 1500):
            x = jnp.asarray(np.cos(2 * np.pi * 50 * T[:n]))
            z = jw.analytic_signal(x)
            assert z.shape == (n,)
            np.testing.assert_allclose(np.asarray(z.real), np.asarray(x), atol=1e-10)

    def test_batch_jit_grad(self, rng):
        xb = jnp.asarray(rng.standard_normal((3, 512)))
        zb = jw.analytic_signal(xb)
        np.testing.assert_allclose(np.asarray(zb[1]),
                                   np.asarray(jw.analytic_signal(xb[1])), atol=1e-12)
        f = jax.jit(jw.envelope)
        np.testing.assert_allclose(np.asarray(f(xb)), np.asarray(jw.envelope(xb)),
                                   atol=1e-12)
        g = jax.grad(lambda s: jnp.sum(jw.envelope(s) ** 2))(xb[0])
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_guards_and_promotion(self):
        with pytest.raises(jw.JWaveFailure):
            jw.analytic_signal(jnp.ones(64, dtype=jnp.complex64))
        with pytest.raises(jw.JWaveFailure):
            jw.analytic_signal(jnp.ones(1))
        z = jw.analytic_signal(jnp.arange(64))
        assert jnp.issubdtype(z.dtype, jnp.complexfloating)

    def test_vmd_pipeline(self):
        # the intended workflow: demodulate a VMD mode
        x = jnp.asarray((1 + 0.4 * np.cos(2 * np.pi * 5 * T))
                        * np.cos(2 * np.pi * 120 * T))
        mode = jw.vmd(x, 1, alpha=500.0).modes[0]
        fi = np.asarray(jw.instantaneous_frequency(mode, FS))
        assert abs(np.median(fi[100:-100]) - 120.0) < 2.0
