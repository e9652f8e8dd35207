"""Empirical wavelet transform (superset — the reference has no adaptive
filter banks). Gates: tight-frame identity, exact reconstruction,
spectrum-adaptive mode separation, and the host/jit API split."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import jwave_tpu as jw
from jwave_tpu.transforms.ewt import ewt_filter_bank

FS = 1000.0
N = 2048
T = np.arange(N) / FS


def three_tone():
    return (np.cos(2 * np.pi * 30 * T) + 0.7 * np.cos(2 * np.pi * 120 * T)
            + 0.4 * np.cos(2 * np.pi * 290 * T))


class TestEWT:
    def test_tight_frame(self):
        for bounds in ([0.5], [0.5, 1.5], [0.3, 0.9, 2.2]):
            bank = ewt_filter_bank(512, bounds)
            lp = (bank**2).sum(axis=0)
            np.testing.assert_allclose(lp, 1.0, atol=1e-12)

    def test_separates_tones_and_reconstructs(self):
        x = jnp.asarray(three_tone())
        res = jw.ewt(x, n_modes=3)
        assert res.modes.shape == (3, N)
        for i, f0 in enumerate([30, 120, 290]):
            c = np.corrcoef(np.asarray(res.modes[i]),
                            np.cos(2 * np.pi * f0 * T))[0, 1]
            assert c > 0.99
        np.testing.assert_allclose(np.asarray(jw.iewt(res)), np.asarray(x),
                                   atol=1e-12)

    def test_boundaries_between_peaks(self):
        b_hz = jw.ewt_boundaries(three_tone(), 3) * FS / (2 * np.pi)
        assert 30 < b_hz[0] < 120 and 120 < b_hz[1] < 290

    def test_single_mode_identity(self):
        x = jnp.asarray(three_tone())
        res = jw.ewt(x, n_modes=1)
        np.testing.assert_allclose(np.asarray(res.modes[0]), np.asarray(x),
                                   atol=1e-12)

    def test_jit_with_static_boundaries_and_guard(self):
        x = jnp.asarray(three_tone())
        b = jw.ewt_boundaries(np.asarray(x), 3)
        f = jax.jit(lambda s: jw.ewt(s, boundaries=b).modes)
        np.testing.assert_allclose(np.asarray(f(x)),
                                   np.asarray(jw.ewt(x, boundaries=b).modes),
                                   atol=1e-12)
        with pytest.raises(jw.JWaveFailure):
            jax.jit(lambda s: jw.ewt(s, n_modes=3).modes)(x)

    def test_batch_and_grad(self, rng):
        xb = jnp.asarray(rng.standard_normal((3, 512)))
        b = [0.4, 1.2]
        rb = jw.ewt(xb, boundaries=b)
        r1 = jw.ewt(xb[1], boundaries=b)
        np.testing.assert_allclose(np.asarray(rb.modes[1]), np.asarray(r1.modes),
                                   atol=1e-12)
        g = jax.grad(lambda s: jnp.sum(jw.ewt(s, boundaries=b).modes ** 2))(xb[0])
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_pytree_roundtrip(self):
        res = jw.ewt(jnp.asarray(three_tone()), n_modes=2)
        leaves, treedef = jax.tree_util.tree_flatten(res)
        back = jax.tree_util.tree_unflatten(treedef, leaves)
        assert np.array_equal(back.boundaries, res.boundaries)
        np.testing.assert_allclose(np.asarray(jw.iewt(back)),
                                   np.asarray(jw.iewt(res)))

    def test_guards(self):
        x = jnp.asarray(three_tone())
        with pytest.raises(jw.JWaveFailure):
            jw.ewt(x)  # neither n_modes nor boundaries
        with pytest.raises(jw.JWaveFailure):
            jw.ewt(x, boundaries=[4.0])  # outside (0, pi)
        with pytest.raises(jw.JWaveFailure):
            jw.ewt(x.astype(jnp.complex128), n_modes=2)
        with pytest.raises(jw.JWaveFailure):
            jw.ewt_boundaries(np.zeros(64), 0)
        with pytest.raises(jw.JWaveFailure):
            # flat-ish spectrum cannot support 40 separated peaks
            jw.ewt_boundaries(np.ones(64), 40)


class TestReviewRegressions:
    def test_batched_boundaries_pool_magnitudes(self):
        # phase-opposed components must POOL across the batch, not cancel
        t = T
        x0 = np.cos(2 * np.pi * 30 * t) + np.cos(2 * np.pi * 120 * t)
        x1 = np.cos(2 * np.pi * 30 * t) - np.cos(2 * np.pi * 120 * t)
        b_hz = jw.ewt_boundaries(np.stack([x0, x1]), 2) * FS / (2 * np.pi)
        assert 30 < b_hz[0] < 120

    def test_hand_built_result_crosses_jit(self):
        x = jnp.asarray(three_tone())
        res = jw.ewt(x, boundaries=[0.5, 1.5])
        hand = jw.EWTResult(res.modes, [0.5, 1.5])  # list, not ndarray
        out = jax.jit(jw.iewt)(hand)
        np.testing.assert_allclose(np.asarray(out), np.asarray(jw.iewt(res)),
                                   atol=1e-12)
