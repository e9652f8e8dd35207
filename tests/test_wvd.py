"""Wigner-Ville distribution (superset). Gates: the WVD's defining
properties — near-bin-width tone/chirp localization, marginal energy,
cross-term suppression under smoothing — plus composability."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import jwave_tpu as jw

FS = 1000.0
N = 1024
T = np.arange(N) / FS


class TestWVD:
    def test_tone_localization(self):
        tfr, freqs = jw.wigner_ville(jnp.asarray(np.cos(2 * np.pi * 100 * T)),
                                     FS, n_bins=256)
        assert tfr.shape == (256, N)
        col = np.asarray(tfr[:, N // 2])
        assert abs(float(freqs[int(col.argmax())]) - 100.0) < 2.5
        # energy concentrated within +-2 bins (the WVD's razor sharpness)
        k = int(col.argmax())
        assert col[max(0, k - 2): k + 3].sum() > 0.9 * np.abs(col).sum()

    def test_chirp_ridge(self):
        phase = 2 * np.pi * (50 * T + (200 / (2 * T[-1])) * T**2)
        tfr, freqs = jw.wigner_ville(jnp.asarray(np.cos(phase)), FS, n_bins=256)
        ridge = np.asarray(freqs)[np.asarray(tfr).argmax(axis=0)]
        f_true = 50 + 200 * T / T[-1]
        assert np.median(np.abs(ridge[N // 8: -N // 8]
                                - f_true[N // 8: -N // 8])) < 2.0

    def test_smoothing_kills_cross_terms(self):
        x = jnp.asarray(np.cos(2 * np.pi * 80 * T) + np.cos(2 * np.pi * 240 * T))
        raw, freqs = jw.wigner_ville(x, FS, n_bins=256)
        smo, _ = jw.wigner_ville(x, FS, n_bins=256, time_window=31, lag_window=61)
        mid = np.abs(np.asarray(freqs) - 160.0).argmin()
        r = float(np.abs(np.asarray(raw)[mid]).mean() / np.abs(np.asarray(raw)).max())
        s = float(np.abs(np.asarray(smo)[mid]).mean() / np.abs(np.asarray(smo)).max())
        assert s < 0.1 * r
        # the auto-terms survive the smoothing
        for f0 in (80.0, 240.0):
            kk = np.abs(np.asarray(freqs) - f0).argmin()
            assert np.asarray(smo)[kk].mean() > 5.0 * np.abs(np.asarray(smo)[mid]).mean()

    @pytest.mark.slow
    def test_batch_jit_grad(self, rng):
        xb = jnp.asarray(rng.standard_normal((2, 512)))
        f = jax.jit(lambda s: jw.wigner_ville(s, FS, n_bins=128)[0])
        out = f(xb)
        assert out.shape == (2, 128, 512)
        np.testing.assert_allclose(
            np.asarray(out[0]),
            np.asarray(jw.wigner_ville(xb[0], FS, n_bins=128)[0]), atol=1e-10)
        g = jax.grad(lambda s: jnp.sum(jw.wigner_ville(s, FS, n_bins=64)[0] ** 2))(xb[0][:256])
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_guards(self):
        x = jnp.asarray(np.cos(2 * np.pi * 50 * T))
        with pytest.raises(jw.JWaveFailure):
            jw.wigner_ville(x.astype(jnp.complex64))
        with pytest.raises(jw.JWaveFailure):
            jw.wigner_ville(jnp.ones(4))
        with pytest.raises(jw.JWaveFailure):
            jw.wigner_ville(x, time_window=10)
        with pytest.raises(jw.JWaveFailure):
            jw.wigner_ville(x, n_bins=4)
