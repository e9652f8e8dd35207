"""WPT correctness: oracle parity, round-trips, batching (the reference's
parallel==sequential equivalence tests, ParallelWPTPerformanceTest.java:87-95,
are subsumed: the packet axis is one batched kernel by construction)."""
import numpy as np
import jax.numpy as jnp
import pytest

import jwave_tpu as jw
from jwave_tpu.filters import get_filter

import oracle


@pytest.mark.parametrize("name", ["Haar", "Daubechies 4", "Symlet 8"])
def test_matches_oracle(name, rng):
    fb = get_filter(name)
    x = rng.standard_normal(64)
    for level in (1, 2, 6):
        got = np.asarray(jw.wpt(jnp.asarray(x), name, level))
        np.testing.assert_allclose(got, oracle.wpt(x, fb, level), atol=1e-12)


@pytest.mark.parametrize("name", ["Haar", "Daubechies 4", "Coiflet 2", "BiOrthogonal 3/5"])
def test_roundtrip(name, rng):
    x = rng.standard_normal(512)
    for level in (1, 3, None):
        y = jw.wpt(jnp.asarray(x), name, level)
        np.testing.assert_allclose(np.asarray(jw.iwpt(y, name, level)), x, atol=1e-6)


def test_wpt_level1_equals_fwt_level1(rng):
    x = rng.standard_normal(128)
    np.testing.assert_allclose(
        np.asarray(jw.wpt(jnp.asarray(x), "db4", 1)),
        np.asarray(jw.fwt(jnp.asarray(x), "db4", 1)),
        atol=1e-12,
    )


def test_batched(rng):
    xs = rng.standard_normal((8, 256))
    batched = np.asarray(jw.wpt(jnp.asarray(xs), "db2"))
    for i in range(8):
        np.testing.assert_allclose(batched[i], np.asarray(jw.wpt(jnp.asarray(xs[i]), "db2")), atol=1e-12)


def test_non_pow2_raises():
    with pytest.raises(jw.JWaveFailure):
        jw.wpt(jnp.zeros(100), "Haar")


@pytest.mark.parametrize("fb", __import__("jwave_tpu").junit_passing_filters(), ids=lambda f: f.name)
def test_roundtrip_all_wavelets_wpt(fb, rng):
    """WPT round-trip across the reference's full JUnit wavelet set."""
    x = rng.standard_normal(64)
    y = jw.wpt(jnp.asarray(x), fb.name, 3)
    np.testing.assert_allclose(np.asarray(jw.iwpt(y, fb.name, 3)), x, atol=1e-6)


# --------------------------------------------------------------------------
# Best-basis selection (Coifman-Wickerhauser superset)
# --------------------------------------------------------------------------

@pytest.mark.slow
class TestBestBasis:
    def test_cover_and_exact_reconstruction(self, rng):
        from jwave_tpu.transforms.wpt import best_basis, best_basis_reconstruct

        x = jnp.asarray(rng.standard_normal(512))
        bb = best_basis(x, "db4", 5)
        assert sum(512 >> l for l, _ in bb.nodes) == 512  # disjoint dyadic cover
        rec = best_basis_reconstruct(bb)
        np.testing.assert_allclose(rec, x, atol=1e-10)

    def test_beats_every_flat_basis(self, rng):
        from jwave_tpu.transforms.wpt import _node_costs, best_basis

        t = np.arange(1024) / 1024
        x = jnp.asarray(np.sin(2 * np.pi * 150 * t) * np.exp(-((t - 0.5) / 0.08) ** 2))
        bb = best_basis(x, "sym5", 6)
        for level in range(7):
            flat = float(_node_costs(jw.wpt(x, "sym5", level), level, "shannon", 0.0).sum())
            assert bb.cost <= flat + 1e-9

    def test_localized_tone_selects_deep_nodes(self, rng):
        from jwave_tpu.transforms.wpt import best_basis

        t = np.arange(1024) / 1024
        x = jnp.asarray(np.sin(2 * np.pi * 200 * t))
        bb = best_basis(x, "db4", 6)
        # a pure tone concentrates in a frequency band: some splitting wins
        assert max(l for l, _ in bb.nodes) >= 2

    def test_costs_and_errors(self, rng):
        from jwave_tpu.transforms.wpt import best_basis, best_basis_reconstruct

        x = jnp.asarray(rng.standard_normal(256))
        for cost in ("shannon", "threshold", "l1"):
            bb = best_basis(x, "Haar", 4, cost=cost, threshold=0.5)
            np.testing.assert_allclose(best_basis_reconstruct(bb), x, atol=1e-10)
        with pytest.raises(jw.JWaveFailure):
            best_basis(x, "Haar", 3, cost="entropy9000")
        with pytest.raises(jw.JWaveFailure):
            best_basis(jnp.zeros(100), "Haar", 3)

    def test_batched_shared_basis(self, rng):
        from jwave_tpu.transforms.wpt import best_basis, best_basis_reconstruct

        xb = jnp.asarray(rng.standard_normal((4, 256)))
        bb = best_basis(xb, "db2", 4)
        assert bb.coefficients[0].shape[:-1] == (4,)
        np.testing.assert_allclose(best_basis_reconstruct(bb), xb, atol=1e-10)

    def test_white_noise_prefers_shallow(self, rng):
        from jwave_tpu.transforms.wpt import best_basis

        # iid noise has no structure to exploit: cost gains from splitting
        # are marginal, so the tree stays shallower than for a pure tone
        x = jnp.asarray(rng.standard_normal(1024))
        t = np.arange(1024) / 1024
        tone = jnp.asarray(np.sin(2 * np.pi * 200 * t))
        bb_noise = best_basis(x, "db4", 6)
        bb_tone = best_basis(tone, "db4", 6)
        assert len(bb_noise.nodes) <= len(bb_tone.nodes) * 2


@pytest.mark.slow
class TestBestBasis2D:
    @staticmethod
    def _scene():
        h = w = 64
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        return jnp.asarray(np.where((yy < 32) & (xx < 32),
                                    np.sin(2 * np.pi * 0.25 * xx), 0.05 * xx / 64))

    def test_perfect_reconstruction(self):
        x = self._scene()
        bb = jw.best_basis_2d(x, "db4", max_level=3)
        np.testing.assert_allclose(np.asarray(jw.best_basis_2d_reconstruct(bb)),
                                   np.asarray(x), atol=1e-10)
        # nodes form a disjoint cover of the plane
        area = sum((64 >> l) * (64 >> l) for l, _, _ in bb.nodes)
        assert area == 64 * 64

    def test_cost_beats_or_matches_root(self):
        x = self._scene()
        from jwave_tpu.transforms.wpt import _node_costs_2d
        bb = jw.best_basis_2d(x, "db4", max_level=3)
        root = _node_costs_2d(x[..., None, None, :, :], "shannon", 0.0)[0, 0]
        assert bb.cost <= root + 1e-9

    def test_adaptive_split(self):
        # textured quadrant forces deeper splits than max_level-0 cover
        bb = jw.best_basis_2d(self._scene(), "db4", max_level=3)
        levels = {l for l, _, _ in bb.nodes}
        assert max(levels) >= 2

    @pytest.mark.parametrize("wav,cost", [("Haar", "shannon"), ("sym4", "l1"),
                                          ("db4", "threshold")])
    def test_random_roundtrip(self, wav, cost, rng):
        x = jnp.asarray(rng.standard_normal((2, 32, 32)))
        bb = jw.best_basis_2d(x, wav, max_level=3, cost=cost, threshold=0.5)
        np.testing.assert_allclose(np.asarray(jw.best_basis_2d_reconstruct(bb)),
                                   np.asarray(x), atol=1e-10)

    def test_guards(self):
        with pytest.raises(jw.JWaveFailure):
            jw.best_basis_2d(jnp.ones((60, 64)), "db4")
        with pytest.raises(jw.JWaveFailure):
            jw.best_basis_2d(jnp.ones(64), "db4")
        with pytest.raises(jw.JWaveFailure):
            jw.best_basis_2d(jnp.ones((32, 32)), "db4", cost="gini")
