"""Wavelet scattering transform (superset — the reference has nothing like
it; validated against the defining properties of Mallat 2012 / Andén &
Mallat 2014: translation invariance, AM demodulation at order 2, frame
coverage, and transform-composability gates)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # big banks / sweeps; fast smoke lives in test_analysis_smoke.py
import jax
import jax.numpy as jnp

import jwave_tpu as jw
from jwave_tpu.transforms.scattering import XI_MAX, scattering_filter_bank

FS = 8000.0
N = 4096


def am_tone(fc=1000.0, fm=40.0, depth=0.8, n=N, fs=FS):
    t = np.arange(n) / fs
    return (1 + depth * np.cos(2 * np.pi * fm * t)) * np.cos(2 * np.pi * fc * t)


class TestShapesAndMetadata:
    def test_output_shapes(self):
        res = jw.scattering1d(jnp.asarray(am_tone()), J=8, Q=8, sampling_rate=FS)
        k1 = 8 * 8 + 1
        t = N // 2**8
        assert res.S0.shape == (t,)
        assert res.S1.shape == (k1, t)
        assert res.S2.shape == (res.n_paths, t)
        assert res.paths.shape == (res.n_paths, 2)
        # paths obey the frequency-decreasing rule
        assert np.all(res.xi2[res.paths[:, 1]] < res.xi1[res.paths[:, 0]])
        # features() stacks everything on one band axis
        assert res.features().shape == (1 + k1 + res.n_paths, t)

    def test_oversampling_doubles_frames(self):
        x = jnp.asarray(am_tone())
        r0 = jw.scattering1d(x, J=6, Q=4)
        r1 = jw.scattering1d(x, J=6, Q=4, oversampling=1)
        assert r1.S1.shape[-1] == 2 * r0.S1.shape[-1]

    def test_frequencies_scale_with_fs(self):
        x = jnp.asarray(am_tone())
        r = jw.scattering1d(x, J=4, Q=2, sampling_rate=100.0)
        np.testing.assert_allclose(r.frequencies1, r.xi1 * 100.0)
        assert r.xi1[0] == XI_MAX

    def test_guards(self):
        x = jnp.asarray(am_tone())
        with pytest.raises(jw.JWaveFailure):
            jw.scattering1d(x.astype(jnp.complex128), J=4)
        with pytest.raises(jw.JWaveFailure):
            jw.scattering1d(x, J=0)
        with pytest.raises(jw.JWaveFailure):
            jw.scattering1d(x, J=4, Q=0)
        with pytest.raises(jw.JWaveFailure):
            jw.scattering1d(jnp.ones(16), J=5)  # 2^5 > 16


class TestRepresentation:
    def test_s1_locates_carrier(self):
        res = jw.scattering1d(jnp.asarray(am_tone(fc=1000.0)), J=8, Q=8,
                              sampling_rate=FS)
        k = int(np.asarray(res.S1.mean(axis=-1)).argmax())
        assert abs(res.frequencies1[k] - 1000.0) / 1000.0 < 0.1

    def test_s2_demodulates_am(self):
        res = jw.scattering1d(jnp.asarray(am_tone(fc=1000.0, fm=40.0)), J=8,
                              Q=8, sampling_rate=FS)
        k = int(np.asarray(res.S1.mean(axis=-1)).argmax())
        mask = res.paths[:, 0] == k
        e2 = np.asarray(res.S2.mean(axis=-1))[mask]
        f2 = res.xi2[res.paths[mask, 1]] * FS
        f_peak = f2[int(e2.argmax())]
        assert abs(f_peak - 40.0) / 40.0 < 0.5  # Q2=1: half-octave bins

    def test_pure_tone_has_weak_second_order(self):
        # constant envelope -> order-2 energy far below order-1
        t = np.arange(N) / FS
        res = jw.scattering1d(jnp.asarray(np.cos(2 * np.pi * 1000 * t)), J=8,
                              Q=8, sampling_rate=FS)
        e1 = float(jnp.sum(res.S1**2))
        e2 = float(jnp.sum(res.S2**2))
        assert e2 < 0.05 * e1

    def test_translation_invariance(self):
        x = jnp.asarray(am_tone())
        res = jw.scattering1d(x, J=8, Q=8, sampling_rate=FS)
        xs = jnp.roll(x, 16)  # 16 samples << 2^8 invariance scale
        rs = jw.scattering1d(xs, J=8, Q=8, sampling_rate=FS)
        feat_rel = float(jnp.linalg.norm(rs.features() - res.features())
                         / jnp.linalg.norm(res.features()))
        raw_rel = float(jnp.linalg.norm(xs - x) / jnp.linalg.norm(x))
        assert feat_rel < 0.05
        assert feat_rel < 0.25 * raw_rel

    def test_littlewood_paley_coverage(self):
        # combined frame response has no deep gaps across the covered band
        bank = scattering_filter_bank(8192, J=8, Q1=8)
        freqs = np.arange(8192) / 8192.0
        lp = (bank.psi1_hat**2).sum(axis=0) + bank.phi_hat**2
        band = (freqs >= bank.xi1[-1]) & (freqs <= bank.xi1[0])
        assert lp[band].min() > 0.3
        assert lp[band].max() < 2.5
        # analyticity: negligible response at negative frequencies
        neg = freqs > 0.5
        assert np.abs(bank.psi1_hat[:, neg]).max() < 1e-4
        # exact zero mean per wavelet
        np.testing.assert_allclose(bank.psi1_hat[:, 0], 0.0, atol=1e-15)


class TestComposability:
    def test_batch_parity(self, rng):
        xb = jnp.asarray(rng.standard_normal((3, 1024)))
        rb = jw.scattering1d(xb, J=5, Q=4)
        for i in range(3):
            ri = jw.scattering1d(xb[i], J=5, Q=4)
            np.testing.assert_allclose(np.asarray(rb.S1[i]), np.asarray(ri.S1),
                                       atol=1e-12)
            np.testing.assert_allclose(np.asarray(rb.S2[i]), np.asarray(ri.S2),
                                       atol=1e-12)

    def test_jit_and_vmap(self, rng):
        xb = jnp.asarray(rng.standard_normal((2, 512)))
        f = jax.jit(lambda s: jw.scattering1d(s, J=4, Q=2).features())
        eager = jw.scattering1d(xb, J=4, Q=2).features()
        np.testing.assert_allclose(np.asarray(f(xb)), np.asarray(eager), atol=1e-12)
        vm = jax.vmap(lambda s: jw.scattering1d(s, J=4, Q=2).features())(xb)
        np.testing.assert_allclose(np.asarray(vm), np.asarray(eager), atol=1e-12)

    def test_grad_finite(self, rng):
        x = jnp.asarray(rng.standard_normal(512))
        g = jax.grad(lambda s: jnp.sum(jw.scattering1d(s, J=4, Q=2).features() ** 2))(x)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_float32_roundtrip_dtype(self, rng):
        x = jnp.asarray(rng.standard_normal(512), dtype=jnp.float32)
        res = jw.scattering1d(x, J=4, Q=2)
        assert res.S1.dtype == jnp.float32

    def test_pytree_flatten(self):
        res = jw.scattering1d(jnp.asarray(am_tone(n=512)), J=4, Q=2,
                              sampling_rate=FS)
        leaves, treedef = jax.tree_util.tree_flatten(res)
        back = jax.tree_util.tree_unflatten(treedef, leaves)
        np.testing.assert_allclose(np.asarray(back.S2), np.asarray(res.S2))
        assert back.sampling_rate == res.sampling_rate
        assert np.array_equal(back.paths, res.paths)

    def test_batch_sharded_composes(self, rng):
        from jwave_tpu.parallel import batch_sharded, make_mesh
        mesh = make_mesh()
        xb = jnp.asarray(rng.standard_normal((8, 512)))
        run = batch_sharded(lambda s: jw.scattering1d(s, J=4, Q=2).features(), mesh)
        np.testing.assert_allclose(
            np.asarray(run(xb)),
            np.asarray(jw.scattering1d(xb, J=4, Q=2).features()),
            atol=1e-12,
        )


def grating(theta_deg, xi=0.1, h=128, w=128):
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    th = np.radians(theta_deg)
    return np.cos(2 * np.pi * xi * (np.cos(th) * xx + np.sin(th) * yy))


class TestScattering2D:
    def test_shapes_and_paths(self):
        res = jw.scattering2d(jnp.asarray(grating(45.0)), J=3, L=8)
        assert res.S0.shape == (16, 16)
        assert res.S1.shape == (24, 16, 16)
        assert res.S2.shape == (res.n_paths, 16, 16)
        # paths are scale-increasing (j2 > j1) across all orientation pairs
        j1 = res.paths[:, 0] // 8
        j2 = res.paths[:, 1] // 8
        assert np.all(j2 > j1)
        assert res.n_paths == 8 * 8 * 3  # L^2 * J(J-1)/2
        assert res.features().shape == (1 + 24 + res.n_paths, 16, 16)

    @pytest.mark.parametrize("theta", [0.0, 45.0, 90.0, 112.5])
    def test_orientation_selectivity(self, theta):
        res = jw.scattering2d(jnp.asarray(grating(theta)), J=3, L=8)
        e1 = np.asarray(res.S1.mean(axis=(-2, -1)))
        k = int(e1.argmax())
        got = np.degrees(res.thetas[k % 8])
        # orientation is mod 180; allow the adjacent bin (22.5 deg)
        d = min(abs(got - theta) % 180.0, 180.0 - abs(got - theta) % 180.0)
        assert d <= 22.5 + 1e-9

    def test_scale_selectivity(self):
        res = jw.scattering2d(jnp.asarray(grating(0.0, xi=0.32)), J=3, L=8)
        k = int(np.asarray(res.S1.mean(axis=(-2, -1))).argmax())
        assert k // 8 == 0  # finest scale (xi_0 = 0.35)

    def test_translation_invariance(self):
        img = jnp.asarray(grating(45.0))
        res = jw.scattering2d(img, J=3, L=8)
        sh = jnp.roll(img, (3, 3), axis=(0, 1))
        rs = jw.scattering2d(sh, J=3, L=8)
        rel = float(jnp.linalg.norm(rs.features() - res.features())
                    / jnp.linalg.norm(res.features()))
        raw = float(jnp.linalg.norm(sh - img) / jnp.linalg.norm(img))
        assert rel < 0.2 * raw

    def test_batch_jit_grad_nonpow2(self, rng):
        imgs = jnp.asarray(rng.standard_normal((2, 96, 96)))
        rb = jw.scattering2d(imgs, J=2, L=4)
        r0 = jw.scattering2d(imgs[0], J=2, L=4)
        np.testing.assert_allclose(np.asarray(rb.S2[0]), np.asarray(r0.S2), atol=1e-12)
        f = jax.jit(lambda a: jw.scattering2d(a, J=2, L=4).features())
        np.testing.assert_allclose(np.asarray(f(imgs[0])),
                                   np.asarray(r0.features()), atol=1e-12)
        g = jax.grad(lambda a: jnp.sum(jw.scattering2d(a, J=2, L=4).features() ** 2))(imgs[0])
        assert bool(jnp.all(jnp.isfinite(g)))
        r_np2 = jw.scattering2d(jnp.asarray(rng.standard_normal((100, 120))), J=3, L=4)
        assert r_np2.S1.shape == (12, 13, 15)

    def test_pytree_and_guards(self):
        res = jw.scattering2d(jnp.asarray(grating(0.0, h=64, w=64)), J=2, L=4)
        leaves, treedef = jax.tree_util.tree_flatten(res)
        back = jax.tree_util.tree_unflatten(treedef, leaves)
        assert np.array_equal(back.paths, res.paths)
        with pytest.raises(jw.JWaveFailure):
            jw.scattering2d(jnp.ones(16), J=2)
        with pytest.raises(jw.JWaveFailure):
            jw.scattering2d(jnp.ones((8, 8)), J=4)  # 2^4 > 8
        with pytest.raises(jw.JWaveFailure):
            jw.scattering2d(jnp.ones((64, 64), dtype=jnp.complex64), J=2)


class TestIntermediateDecimation:
    """Round-3 reformulation: per-band decimation (order 1: exact spectral
    periodization; order 2: ideal-lowpass truncation per path rate) must
    stay within the envelope-tail error budget of the full-rate transform
    (oversampling=J disables every decimation => the exact reference)."""

    @pytest.mark.parametrize("make", [
        lambda rng: rng.standard_normal(4096),           # worst case: noise
        lambda rng: am_tone(n=4096),                     # narrowband
    ])
    def test_matches_full_rate_within_tail_budget(self, rng, make):
        x = jnp.asarray(make(rng))
        fast = jw.scattering1d(x, J=8, Q=8)
        full = jw.scattering1d(x, J=8, Q=8, oversampling=8)
        for name, tol in (("S0", 1e-12), ("S1", 1e-4), ("S2", 2e-3)):
            a = np.asarray(getattr(fast, name))
            b = np.asarray(getattr(full, name))[..., ::256]
            assert a.shape == b.shape
            scale = np.abs(b).max()
            assert np.abs(a - b).max() <= tol * scale, (name, np.abs(a - b).max() / scale)

    def test_oversampling_one_still_decimates_consistently(self, rng):
        x = jnp.asarray(rng.standard_normal(2048))
        r0 = jw.scattering1d(x, J=6, Q=4)
        r1 = jw.scattering1d(x, J=6, Q=4, oversampling=1)
        # the oversampled run's even frames must agree with the critical one
        np.testing.assert_allclose(np.asarray(r1.S1[..., ::2]),
                                   np.asarray(r0.S1), atol=1e-3 * float(jnp.abs(r0.S1).max()))
