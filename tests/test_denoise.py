"""Wavelet shrinkage denoising (superset of the reference's compressors)."""
import jax
import numpy as np
import jax.numpy as jnp
import pytest

import jwave_tpu as jw
from jwave_tpu.denoise import denoise, hard_threshold, mad_sigma, soft_threshold


def test_thresholds():
    c = jnp.asarray([-3.0, -0.5, 0.0, 0.5, 3.0])
    np.testing.assert_allclose(np.asarray(soft_threshold(c, 1.0)), [-2, 0, 0, 0, 2], atol=1e-12)
    np.testing.assert_allclose(np.asarray(hard_threshold(c, 1.0)), [-3, 0, 0, 0, 3], atol=1e-12)


def test_mad_sigma_gaussian(rng):
    noise = rng.standard_normal(100000) * 2.5
    est = float(mad_sigma(jnp.asarray(noise)))
    assert est == pytest.approx(2.5, rel=0.05)


@pytest.mark.parametrize("mode", ["soft", "hard"])
def test_denoise_improves_mse(mode, rng):
    n = 1024
    t = np.linspace(0, 4 * np.pi, n)
    clean = np.sin(t) + 0.5 * np.sin(3 * t)
    noisy = clean + 0.3 * rng.standard_normal(n)
    den = np.asarray(denoise(jnp.asarray(noisy), "db4", 4, mode))
    assert np.mean((den - clean) ** 2) < 0.5 * np.mean((noisy - clean) ** 2)


def test_denoise_batched(rng):
    xs = rng.standard_normal((5, 256))
    out = np.asarray(denoise(jnp.asarray(xs), "Haar", 3))
    assert out.shape == (5, 256)
    single = np.asarray(denoise(jnp.asarray(xs[2]), "Haar", 3))
    np.testing.assert_allclose(out[2], single, atol=1e-10)


def test_denoise_explicit_threshold_zero_is_identity(rng):
    x = rng.standard_normal(128)
    out = np.asarray(denoise(jnp.asarray(x), "db2", 3, "soft", threshold=0.0))
    np.testing.assert_allclose(out, x, atol=1e-8)


def test_denoise_bad_mode():
    with pytest.raises(jw.JWaveFailure):
        denoise(jnp.zeros(64), "Haar", 2, mode="medium")


def test_denoise_bad_method():
    with pytest.raises(jw.JWaveFailure):
        denoise(jnp.zeros(64), "Haar", 2, method="magic")


@pytest.mark.parametrize("method", ["sure", "bayes"])
def test_adaptive_methods_improve_mse(method, rng):
    n = 2048
    t = np.linspace(0, 4 * np.pi, n)
    clean = np.sin(t) + 0.5 * np.sin(3 * t)
    noisy = clean + 0.3 * rng.standard_normal(n)
    den = np.asarray(denoise(jnp.asarray(noisy), "db4", 4, method=method))
    assert np.mean((den - clean) ** 2) < 0.5 * np.mean((noisy - clean) ** 2)


def test_sure_beats_universal_on_dense_signal(rng):
    # a dense, high-energy signal: the universal threshold oversmooths,
    # SURE adapts the per-band threshold down (Donoho-Johnstone's motivation)
    n = 4096
    t = np.arange(n) / n
    clean = np.sign(np.sin(2 * np.pi * 30 * t)) + np.sin(2 * np.pi * 7 * t)
    noisy = clean + 0.4 * rng.standard_normal(n)
    mse = {m: np.mean((np.asarray(denoise(jnp.asarray(noisy), "sym8", 5, method=m)) - clean) ** 2)
           for m in ("universal", "sure")}
    assert mse["sure"] < mse["universal"]


def test_sure_threshold_pure_noise_goes_universal(rng):
    from jwave_tpu.denoise import sure_threshold

    band = jnp.asarray(rng.standard_normal((3, 1024)))
    tau = np.asarray(sure_threshold(band, jnp.ones(3)))
    univ = np.sqrt(2 * np.log(1024))
    # sparse-energy hybrid test must kick in: tau == universal for pure noise
    np.testing.assert_allclose(tau, univ, rtol=1e-6)


def test_bayes_threshold_kills_pure_noise_band(rng):
    from jwave_tpu.denoise import bayes_threshold

    band = jnp.asarray(rng.standard_normal(1024))
    tau = float(bayes_threshold(band, jnp.asarray(1.0)))
    assert tau > float(jnp.max(jnp.abs(band)))  # everything thresholded away


@pytest.mark.parametrize("method", ["universal", "sure", "bayes"])
def test_denoise_2d_improves_mse(method, rng):
    n = 128
    yy, xx = np.mgrid[0:n, 0:n] / n
    clean = np.sin(4 * np.pi * xx) * np.cos(2 * np.pi * yy) + (xx > 0.5)
    noisy = clean + 0.3 * rng.standard_normal((n, n))
    from jwave_tpu.denoise import denoise_2d

    out = np.asarray(denoise_2d(jnp.asarray(noisy), "db4", 3, method=method))
    assert np.mean((out - clean) ** 2) < 0.25 * np.mean((noisy - clean) ** 2)


@pytest.mark.slow
def test_denoise_2d_batched_and_errors(rng):
    from jwave_tpu.denoise import denoise_2d

    imgs = jnp.asarray(rng.standard_normal((2, 64, 64)))
    out = np.asarray(denoise_2d(imgs, "Haar", 2))
    assert out.shape == (2, 64, 64)
    single = np.asarray(denoise_2d(imgs[1], "Haar", 2))
    np.testing.assert_allclose(out[1], single, atol=1e-10)
    with pytest.raises(jw.JWaveFailure):
        denoise_2d(imgs, "Haar", 2, mode="medium")
    with pytest.raises(jw.JWaveFailure):
        denoise_2d(imgs, "Haar", 2, method="magic")


def test_adaptive_methods_jit(rng):
    import jax

    x = jnp.asarray(rng.standard_normal(512))
    for method in ("sure", "bayes"):
        out = jax.jit(lambda a, m=method: denoise(a, "db2", 3, method=m))(x)
        assert out.shape == x.shape and bool(jnp.all(jnp.isfinite(out)))


class TestDTCWTDenoise:
    @staticmethod
    def _scene(rng):
        h = w = 128
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        clean = (np.where((xx + yy) > 128, 1.0, 0.0)
                 + 0.5 * np.sin(2 * np.pi * 0.08 * (0.97 * xx - 0.26 * yy)))
        return clean, clean + 0.3 * rng.standard_normal((h, w))

    @pytest.mark.slow
    def test_improves_psnr_competitively(self, rng):
        clean, noisy = self._scene(rng)
        def psnr(a):
            return 10 * np.log10(np.ptp(clean) ** 2 / np.mean((np.asarray(a) - clean) ** 2))
        den = jw.denoise_dtcwt(jnp.asarray(noisy), levels=4)
        assert psnr(den) > psnr(noisy) + 6.0
        # competitive with the MODWT BayesShrink path on oriented content
        assert psnr(den) > psnr(jw.denoise_2d(jnp.asarray(noisy), "db4", 3,
                                              method="bayes")) - 0.5

    def test_explicit_sigma_batch_jit(self, rng):
        _, noisy = self._scene(rng)
        b = jnp.stack([jnp.asarray(noisy)] * 2)
        f = jax.jit(lambda a: jw.denoise_dtcwt(a, levels=3, sigma=0.3))
        out = f(b)
        assert out.shape == b.shape
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]), atol=1e-12)

    def test_guards(self):
        with pytest.raises(jw.JWaveFailure):
            jw.denoise_dtcwt(jnp.ones((64, 64)), levels=3, window=4)
