"""Dual-tree complex wavelet transform (superset — the reference has only
critically-sampled real DWTs). Gates: the q-shift filter design invariants
(orthonormality, quarter-sample delay split, Hilbert-pair analyticity),
perfect reconstruction in 1D/2D, the shift-invariance advantage over the
DWT it exists for, 2D orientation selectivity, and composability."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import jwave_tpu as jw
from jwave_tpu.filters.qshift import QSHIFT_14, altflip, qshift_filters


class TestQShiftDesign:
    def test_orthonormality_and_pr(self):
        h = QSHIFT_14
        # unit norm + orthogonal to its even shifts (CQF condition)
        assert np.sum(h * h) == pytest.approx(1.0, abs=1e-12)
        for k in range(1, 7):
            assert abs(np.sum(h[2 * k:] * h[:-2 * k])) < 1e-12
        assert h.sum() == pytest.approx(np.sqrt(2.0), abs=2e-5)

    def test_quarter_sample_delay_split(self):
        # group delay of tree A ~ K - 3/4, tree B (reverse) ~ K - 1/4
        h = QSHIFT_14
        om = np.linspace(0.05, 0.4 * np.pi, 64)
        n = np.arange(h.shape[0])
        for filt, tau in ((h, 6.25), (h[::-1], 6.75)):
            H = np.exp(-1j * np.outer(om, n)) @ filt
            N = np.exp(-1j * np.outer(om, n)) @ (n * filt)
            gd = np.real(N / H)
            assert np.max(np.abs(gd - tau)) < 0.15

    def test_hilbert_pair_analyticity(self):
        # cascaded complex wavelet psi_a + i psi_b: negative-frequency
        # energy at least 25 dB below positive (design achieved -29 dB)
        n = 1 << 14
        (h0a, h1a), (h0b, h1b) = qshift_filters()
        def pad(f):
            z = np.zeros(n)
            z[: f.shape[0]] = f
            return np.fft.fft(z)
        Fa, Fb, Pa, Pb = pad(h0a), pad(h0b), pad(h1a), pad(h1b)
        idx = lambda j: (np.arange(n) << j) % n
        psi_a = Fa * Fa[idx(1)] * Fa[idx(2)] * Fa[idx(3)] * Pa[idx(4)]
        psi_b = Fb * Fb[idx(1)] * Fb[idx(2)] * Fb[idx(3)] * Pb[idx(4)]
        z = psi_a + 1j * psi_b
        half = n // 2
        ratio = np.sum(np.abs(z[half + 1:]) ** 2) / np.sum(np.abs(z[1:half]) ** 2)
        assert 10 * np.log10(ratio) < -25.0

    def test_altflip_is_cqf_partner(self):
        h = QSHIFT_14
        g = altflip(h)
        assert abs(np.sum(h * g)) < 1e-12
        assert abs(g.sum()) < 2e-5  # highpass kills DC


class TestDTCWT1D:
    def test_perfect_reconstruction(self, rng):
        x = jnp.asarray(rng.standard_normal((3, 256)))
        res = jw.dtcwt(x, 4)
        np.testing.assert_allclose(np.asarray(jw.idtcwt(res)), np.asarray(x),
                                   atol=1e-10)
        assert [h.shape for h in res.highpasses] == [(3, 128), (3, 64), (3, 32), (3, 16)]
        assert res.lowpasses.shape == (3, 2, 16)

    def test_non_pow2_divisible_length(self, rng):
        x = jnp.asarray(rng.standard_normal(192))  # 192 = 3 * 64
        res = jw.dtcwt(x, 4)
        np.testing.assert_allclose(np.asarray(jw.idtcwt(res)), np.asarray(x),
                                   atol=1e-10)

    def test_shift_invariance_beats_dwt(self):
        # per-level energy of an impulse under shifts: the complex
        # magnitude is far more shift-stable than the real DWT's
        n = 256
        def e_dtcwt(s):
            r = jw.dtcwt(jnp.asarray(s), 4)
            return np.array([float(jnp.sum(jnp.abs(h) ** 2)) for h in r.highpasses])
        def e_dwt(s):
            y = np.asarray(jw.fwt(jnp.asarray(s), "sym4", 4))
            out, h = [], n
            for _ in range(4):
                out.append(float(np.sum(y[h // 2:h] ** 2)))
                h //= 2
            return np.array(out)
        sig = np.zeros(n)
        sig[n // 2] = 1.0
        e_dt = np.stack([e_dtcwt(np.roll(sig, k)) for k in range(8)])
        e_dw = np.stack([e_dwt(np.roll(sig, k)) for k in range(8)])
        v_dt = (e_dt.std(0) / (e_dt.mean(0) + 1e-30)).max()
        v_dw = (e_dw.std(0) / (e_dw.mean(0) + 1e-30)).max()
        assert v_dt < 0.2
        assert v_dt < 0.4 * v_dw

    def test_energy_preserved(self, rng):
        # each tree is orthonormal, so total coefficient energy (2 trees,
        # unitary complex packing) equals signal energy
        x = jnp.asarray(rng.standard_normal(128))
        res = jw.dtcwt(x, 3)
        e = sum(float(jnp.sum(jnp.abs(h) ** 2)) for h in res.highpasses)
        e += 0.5 * float(jnp.sum(res.lowpasses ** 2))
        assert e == pytest.approx(float(jnp.sum(x ** 2)), rel=1e-10)

    def test_guards(self):
        with pytest.raises(jw.JWaveFailure):
            jw.dtcwt(jnp.ones(100), 3)  # 100 not divisible by 8
        with pytest.raises(jw.JWaveFailure):
            jw.dtcwt(jnp.ones(64), 0)
        with pytest.raises(jw.JWaveFailure):
            jw.dtcwt(jnp.ones(64, dtype=jnp.complex64), 2)


class TestDTCWT2D:
    @pytest.mark.slow
    def test_perfect_reconstruction(self, rng):
        img = jnp.asarray(rng.standard_normal((2, 64, 64)))
        res = jw.dtcwt2d(img, 3)
        np.testing.assert_allclose(np.asarray(jw.idtcwt2d(res)), np.asarray(img),
                                   atol=1e-10)
        assert res.highpasses[0].shape == (2, 6, 32, 32)
        assert res.lowpasses.shape == (2, 2, 2, 8, 8)

    @pytest.mark.parametrize("deg,band", [(15, 0), (75, 2), (-75, 3), (-15, 5)])
    def test_orientation_dominant_band(self, deg, band):
        h = w = 128
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        th = np.radians(deg)
        g = np.cos(2 * np.pi * 0.2 * (np.cos(th) * xx + np.sin(th) * yy))
        r = jw.dtcwt2d(jnp.asarray(g), 2)
        e = np.asarray(jnp.sum(jnp.abs(r.highpasses[0]) ** 2, axis=(-2, -1)))
        assert int(e.argmax()) == band

    def test_diagonal_disambiguation(self):
        # a separable real DWT cannot tell +45 from -45 (one mixed HH
        # band); the dual tree must put most diagonal energy in the
        # matching oriented band
        h = w = 128
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        for sgn, band in ((1.0, 1), (-1.0, 4)):
            g = np.cos(2 * np.pi * 0.25 * (xx + sgn * yy))
            r = jw.dtcwt2d(jnp.asarray(g), 1)
            e = np.asarray(jnp.sum(jnp.abs(r.highpasses[0]) ** 2, axis=(-2, -1)))
            assert int(e.argmax()) == band
            other = e[4 if band == 1 else 1]
            assert e[band] > 5.0 * other

    @pytest.mark.slow
    def test_shift_invariance_2d(self, rng):
        img = np.zeros((64, 64))
        img[32, 32] = 1.0
        def energies(im):
            r = jw.dtcwt2d(jnp.asarray(im), 3)
            return np.array([float(jnp.sum(jnp.abs(h) ** 2)) for h in r.highpasses])
        e = np.stack([energies(np.roll(np.roll(img, i, 0), j, 1))
                      for i in range(2) for j in range(4)])
        assert (e.std(0) / (e.mean(0) + 1e-30)).max() < 0.25

    @pytest.mark.slow
    def test_jit_vmap_grad(self, rng):
        img = jnp.asarray(rng.standard_normal((2, 32, 32)))
        f = jax.jit(lambda a: jw.idtcwt2d(jw.dtcwt2d(a, 2)))
        np.testing.assert_allclose(np.asarray(f(img)), np.asarray(img), atol=1e-10)
        vm = jax.vmap(lambda a: jw.dtcwt2d(a, 2).highpasses[0])(img)
        eager = jw.dtcwt2d(img, 2).highpasses[0]
        np.testing.assert_allclose(np.asarray(vm), np.asarray(eager), atol=1e-10)
        g = jax.grad(lambda a: float(0.0) + jnp.sum(jnp.abs(jw.dtcwt2d(a, 2).highpasses[0]) ** 2))(img[0])
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_pytree_roundtrip(self, rng):
        res = jw.dtcwt(jnp.asarray(rng.standard_normal(64)), 2)
        leaves, treedef = jax.tree_util.tree_flatten(res)
        back = jax.tree_util.tree_unflatten(treedef, leaves)
        np.testing.assert_allclose(np.asarray(jw.idtcwt(back)),
                                   np.asarray(jw.idtcwt(res)))
