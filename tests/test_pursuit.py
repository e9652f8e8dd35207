"""Matching pursuit (superset — the reference has no sparse decomposition).
Gates: the defining MP invariants (exact residual bookkeeping, monotone
energy decay), component identification on a Gabor + tone mix, and
jit/vmap/batch/grad composability."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import jwave_tpu as jw
from jwave_tpu.transforms.pursuit import gabor_dictionary

FS = 1000.0
N = 1024
T = np.arange(N) / FS


def mix():
    return (np.exp(-((T - 0.3) ** 2) / (2 * 0.02**2)) * np.cos(2 * np.pi * 150 * (T - 0.3))
            + 0.7 * np.exp(-((T - 0.7) ** 2) / (2 * 0.05**2)) * np.cos(2 * np.pi * 60 * (T - 0.7))
            + 0.3 * np.cos(2 * np.pi * 20 * T))


class TestInvariants:
    def test_exact_bookkeeping_and_monotone_energy(self):
        x = jnp.asarray(mix())
        res = jw.matching_pursuit(x, n_atoms=20)
        np.testing.assert_allclose(
            np.asarray(res.reconstruct() + res.residual), np.asarray(x), atol=1e-12)
        e = np.asarray(res.energies)
        assert np.all(np.diff(e) <= 1e-9)
        assert float(e[-1]) == pytest.approx(float(jnp.sum(res.residual**2)), rel=1e-10)

    def test_energy_capture(self):
        x = jnp.asarray(mix())
        res = jw.matching_pursuit(x, n_atoms=20)
        rel = float(jnp.linalg.norm(x - res.reconstruct()) / jnp.linalg.norm(x))
        assert rel < 0.15

    def test_identifies_components(self):
        res = jw.matching_pursuit(jnp.asarray(mix()), n_atoms=6)
        f = np.asarray(res.atom_frequencies(FS)[:3])
        # the three components (20, 60, 150 Hz) each appear among the
        # first picks, within the dictionary's frequency resolution
        for f0 in (20.0, 60.0, 150.0):
            assert np.min(np.abs(f - f0)) / f0 < 0.2

    def test_single_atom_recovers_itself(self):
        # a dictionary atom in noise-free isolation is captured in one pick
        bank = gabor_dictionary(N)
        k = 200
        g = np.roll(bank.cos_atoms[k], 300)
        res = jw.matching_pursuit(jnp.asarray(2.5 * g), n_atoms=1, dictionary=bank)
        assert float(res.energies[0]) < 1e-12 * 6.25
        assert int(res.atom_idx[0]) == k
        assert int(res.positions[0]) == 300
        assert float(res.alphas[0]) == pytest.approx(2.5, abs=1e-8)

    def test_reconstruct_partial(self):
        res = jw.matching_pursuit(jnp.asarray(mix()), n_atoms=10)
        r3 = res.reconstruct(3)
        r10 = res.reconstruct()
        x = jnp.asarray(mix())
        assert float(jnp.linalg.norm(x - r3)) > float(jnp.linalg.norm(x - r10))


class TestComposability:
    def test_batch_and_jit_parity(self):
        x = jnp.asarray(mix())
        xb = jnp.stack([x, jnp.roll(x, 100)])
        rb = jw.matching_pursuit(xb, n_atoms=6)
        r0 = jw.matching_pursuit(x, n_atoms=6)
        np.testing.assert_allclose(np.asarray(rb.alphas[0]), np.asarray(r0.alphas),
                                   atol=1e-10)
        f = jax.jit(lambda s: jw.matching_pursuit(s, n_atoms=6).reconstruct())
        np.testing.assert_allclose(np.asarray(f(x)), np.asarray(r0.reconstruct()),
                                   atol=1e-10)

    def test_grad_finite(self):
        x = jnp.asarray(mix())
        g = jax.grad(lambda s: jnp.sum(jw.matching_pursuit(s, n_atoms=4).residual**2))(x)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_pytree_roundtrip(self):
        res = jw.matching_pursuit(jnp.asarray(mix()), n_atoms=4)
        leaves, treedef = jax.tree_util.tree_flatten(res)
        back = jax.tree_util.tree_unflatten(treedef, leaves)
        assert back.n_atoms == 4
        np.testing.assert_allclose(np.asarray(back.reconstruct()),
                                   np.asarray(res.reconstruct()))

    def test_int_promotes_and_guards(self):
        r = jw.matching_pursuit(jnp.arange(64), n_atoms=2)
        assert jnp.issubdtype(r.residual.dtype, jnp.floating)
        with pytest.raises(jw.JWaveFailure):
            jw.matching_pursuit(jnp.ones(64, dtype=jnp.complex64), n_atoms=2)
        with pytest.raises(jw.JWaveFailure):
            jw.matching_pursuit(jnp.ones(8), n_atoms=2)
        with pytest.raises(jw.JWaveFailure):
            jw.matching_pursuit(jnp.ones(64), n_atoms=0)
        with pytest.raises(jw.JWaveFailure):
            jw.matching_pursuit(jnp.ones(64), n_atoms=2,
                                dictionary=gabor_dictionary(128))

    def test_vmap_over_signals(self):
        # regression: the dictionary rides aux_data, so vmap must not
        # try to batch the (P, N) atom tables
        x = jnp.asarray(mix())
        xb = jnp.stack([x, jnp.roll(x, 50)])
        rb = jax.vmap(lambda s: jw.matching_pursuit(s, n_atoms=3))(xb)
        r0 = jw.matching_pursuit(x, n_atoms=3)
        np.testing.assert_allclose(np.asarray(rb.alphas[0]), np.asarray(r0.alphas),
                                   atol=1e-10)
        rec = rb.reconstruct()
        assert rec.shape == (2, N)
