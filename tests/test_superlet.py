"""Adaptive superlet transform (superset — the reference has no
super-resolution analysis). Gates: the paper's defining property (close
tone pairs resolved where a fixed-Q CWT smears), calibrated matched-tone
gain, burst localization, and composability."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # big banks / sweeps; fast smoke lives in test_analysis_smoke.py
import jax
import jax.numpy as jnp

import jwave_tpu as jw

FS = 1000.0
N = 4096
T = np.arange(N) / FS


def _peaks(profile, thresh=0.3):
    m = profile.max()
    return [i for i in range(1, len(profile) - 1)
            if profile[i] > profile[i - 1] and profile[i] > profile[i + 1]
            and profile[i] > thresh * m]


class TestSuperResolution:
    def test_resolves_close_tone_pair(self):
        x = jnp.asarray(np.cos(2 * np.pi * 45 * T) + np.cos(2 * np.pi * 55 * T))
        freqs = np.linspace(20.0, 100.0, 81)
        slt = jw.superlet(x, freqs, FS, base_cycles=3, order_min=2, order_max=16)
        prof = np.asarray(slt[:, N // 2 - 500: N // 2 + 500].mean(axis=-1))
        pks = [freqs[i] for i in _peaks(prof)]
        assert len(pks) == 2
        assert abs(pks[0] - 45.0) <= 1.0 and abs(pks[1] - 55.0) <= 1.0
        # ...which the 3-cycle CWT alone cannot do
        w = jw.cwt(x, 1.0 / freqs, jw.MorletWavelet((3 / 5.0) ** 2, 1.0), FS)
        prof_c = np.abs(np.asarray(w.coefficients))[:, N // 2 - 500: N // 2 + 500].mean(axis=-1)
        assert len(_peaks(prof_c)) < 2

    def test_matched_tone_calibration(self):
        for f0 in (30.0, 50.0, 120.0):
            x = jnp.asarray(np.cos(2 * np.pi * f0 * T))
            s = jw.superlet(x, np.asarray([f0]), FS, order_min=3, order_max=3)
            assert float(s[0, N // 2]) == pytest.approx(0.5, abs=1e-3)

    def test_burst_localization(self):
        burst = np.exp(-((T - 2.0) ** 2) / (2 * 0.01**2)) * np.cos(2 * np.pi * 80 * T)
        s = jw.superlet(jnp.asarray(burst), np.asarray([80.0]), FS,
                        order_min=5, order_max=5)
        assert abs(T[int(np.asarray(s[0]).argmax())] - 2.0) < 0.005

    def test_additive_ladder_runs(self):
        x = jnp.asarray(np.cos(2 * np.pi * 50 * T[:1024]))
        s = jw.superlet(x, np.linspace(30, 70, 9), FS, multiplicative=False)
        assert s.shape == (9, 1024)
        assert bool(jnp.all(s >= 0))


class TestComposability:
    def test_batch_and_jit(self, rng):
        freqs = np.linspace(20, 80, 13)
        xb = jnp.asarray(rng.standard_normal((2, 1024)))
        sb = jw.superlet(xb, freqs, FS)
        s0 = jw.superlet(xb[0], freqs, FS)
        np.testing.assert_allclose(np.asarray(sb[0]), np.asarray(s0), atol=1e-10)
        f = jax.jit(lambda s: jw.superlet(s, freqs, FS))
        np.testing.assert_allclose(np.asarray(f(xb[0])), np.asarray(s0), atol=1e-8)

    def test_grad_finite(self, rng):
        x = jnp.asarray(rng.standard_normal(512))
        g = jax.grad(lambda s: jnp.sum(jw.superlet(s, np.asarray([40.0, 60.0]),
                                                   FS, order_max=4) ** 2))(x)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_guards(self):
        x = jnp.asarray(np.zeros(256))
        with pytest.raises(jw.JWaveFailure):
            jw.superlet(x, np.asarray([-5.0]), FS)
        with pytest.raises(jw.JWaveFailure):
            jw.superlet(x, np.asarray([10.0]), FS, order_min=0)
        with pytest.raises(jw.JWaveFailure):
            jw.superlet(x, np.asarray([10.0]), FS, order_min=5, order_max=2)
        with pytest.raises(jw.JWaveFailure):
            jw.superlet(x, np.asarray([10.0]), FS, base_cycles=0.0)
