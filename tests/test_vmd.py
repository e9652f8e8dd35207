"""Variational mode decomposition (superset — the reference has no
adaptive decomposition). Gates: multi-tone separation with learned center
frequencies, reconstruction tightness under dual ascent, DC-mode trend
capture, noise robustness, and jit/vmap/batch/grad composability."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import jwave_tpu as jw

FS = 1000.0
N = 2048
T = np.arange(N) / FS
TONES = [(30.0, 1.0), (120.0, 0.7), (290.0, 0.4)]


def three_tone():
    return sum(a * np.cos(2 * np.pi * f * T) for f, a in TONES)


class TestDecomposition:
    def test_recovers_tone_frequencies_and_shapes(self):
        res = jw.vmd(jnp.asarray(three_tone()), 3, alpha=2000.0)
        assert res.modes.shape == (3, N)
        assert res.omegas.shape == (3,)
        f = np.asarray(res.frequencies(FS))
        for (f0, _), fe in zip(TONES, f):
            assert abs(fe - f0) < 2.0
        # omegas come out sorted
        assert np.all(np.diff(f) > 0)

    def test_modes_match_tones(self):
        res = jw.vmd(jnp.asarray(three_tone()), 3, alpha=2000.0)
        for i, (f0, _) in enumerate(TONES):
            tone = np.cos(2 * np.pi * f0 * T)
            c = np.corrcoef(np.asarray(res.modes[i]), tone)[0, 1]
            assert c > 0.99

    def test_reconstruction_tightens_with_tau(self):
        x = jnp.asarray(three_tone())
        e0 = float(jnp.linalg.norm(jw.vmd(x, 3, tau=0.0).modes.sum(-2) - x))
        e1 = float(jnp.linalg.norm(jw.vmd(x, 3, tau=0.5).modes.sum(-2) - x))
        assert e1 < e0
        assert e1 / float(jnp.linalg.norm(x)) < 1e-3

    def test_noise_robust_with_log_init(self, rng):
        xn = three_tone() + 0.2 * rng.standard_normal(N)
        res = jw.vmd(jnp.asarray(xn), 3, alpha=2000.0, init="log")
        f = np.asarray(res.frequencies(FS))
        for (f0, _), fe in zip(TONES, f):
            assert abs(fe - f0) < 5.0

    def test_dc_mode_captures_trend(self):
        res = jw.vmd(jnp.asarray(three_tone() + 5.0), 2, dc=True)
        assert float(res.omegas[0]) == 0.0
        assert abs(float(res.modes[0].mean()) - 5.0) < 0.1

    def test_convergence_trace_decreases(self):
        res = jw.vmd(jnp.asarray(three_tone()), 3, n_iter=200)
        conv = np.asarray(res.convergence)
        assert conv.shape == (200,)
        assert conv[-1] < 1e-10


class TestComposability:
    @pytest.mark.slow
    def test_batch_and_vmap_parity(self, rng):
        xb = jnp.asarray(rng.standard_normal((3, 512)))
        rb = jw.vmd(xb, 2, n_iter=80)
        r1 = jw.vmd(xb[1], 2, n_iter=80)
        np.testing.assert_allclose(np.asarray(rb.modes[1]), np.asarray(r1.modes),
                                   atol=1e-10)
        vm = jax.vmap(lambda s: jw.vmd(s, 2, n_iter=80).modes)(xb)
        np.testing.assert_allclose(np.asarray(vm), np.asarray(rb.modes), atol=1e-10)

    def test_jit_parity_and_pytree(self):
        x = jnp.asarray(three_tone()[:512])
        f = jax.jit(lambda s: jw.vmd(s, 2, n_iter=80))
        eager = jw.vmd(x, 2, n_iter=80)
        jitted = f(x)
        np.testing.assert_allclose(np.asarray(jitted.modes), np.asarray(eager.modes),
                                   atol=1e-10)
        leaves, treedef = jax.tree_util.tree_flatten(eager)
        back = jax.tree_util.tree_unflatten(treedef, leaves)
        assert back.n_modes == 2

    @pytest.mark.slow
    def test_grad_finite(self, rng):
        x = jnp.asarray(rng.standard_normal(256))
        g = jax.grad(lambda s: jnp.sum(jw.vmd(s, 2, n_iter=30).modes ** 2))(x)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_odd_length_and_int_input(self, rng):
        res = jw.vmd(jnp.asarray(rng.standard_normal(501)), 2, n_iter=50)
        assert res.modes.shape == (2, 501)
        ri = jw.vmd(jnp.arange(64), 1, n_iter=20)
        assert jnp.issubdtype(ri.modes.dtype, jnp.floating)

    def test_guards(self):
        x = jnp.asarray(three_tone())
        with pytest.raises(jw.JWaveFailure):
            jw.vmd(x.astype(jnp.complex128), 2)
        with pytest.raises(jw.JWaveFailure):
            jw.vmd(x, 0)
        with pytest.raises(jw.JWaveFailure):
            jw.vmd(x, 2, init="random")
        with pytest.raises(jw.JWaveFailure):
            jw.vmd(jnp.ones(2), 1)
        with pytest.raises(jw.JWaveFailure):
            jw.vmd(x, 2, n_iter=0)
