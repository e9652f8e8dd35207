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
