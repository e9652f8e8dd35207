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
