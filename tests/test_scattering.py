"""Wavelet scattering transform (superset — the reference has nothing like
it; validated against the defining properties of Mallat 2012 / Andén &
Mallat 2014: translation invariance, AM demodulation at order 2, frame
coverage, and transform-composability gates)."""
import numpy as np
import pytest
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
