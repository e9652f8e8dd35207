"""2D/3D separable transforms, complex bridging, AED, shifting."""
import numpy as np
import jax.numpy as jnp
import pytest

import jwave_tpu as jw
from jwave_tpu.filters import get_filter

import oracle


def test_2d_matches_rowcol_oracle(rng):
    """BasicTransform.java:361-399: rows then columns."""
    fb = get_filter("db2")
    m = rng.standard_normal((8, 16))
    t = jw.TransformBuilder.create("Fast Wavelet Transform", "db2")
    got = np.asarray(t.forward(m))
    want = m.copy()
    for i in range(8):
        want[i] = oracle.fwt(want[i], fb, 4)
    for j in range(16):
        want[:, j] = oracle.fwt(want[:, j].copy(), fb, 3)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_2d_roundtrip_levels(rng):
    t = jw.TransformBuilder.create("Fast Wavelet Transform", "sym4")
    m = rng.standard_normal((32, 64))
    for levels in [(), (2, 3), (1, 1)]:
        y = t.forward(m, *levels)
        np.testing.assert_allclose(np.asarray(t.reverse(y, *levels)), m, atol=1e-6)


def test_3d_roundtrip(rng):
    t = jw.TransformBuilder.create("Fast Wavelet Transform", "Haar")
    v = rng.standard_normal((8, 16, 32))
    np.testing.assert_allclose(np.asarray(t.reverse(t.forward(v))), v, atol=1e-8)


def test_3d_wpt_roundtrip(rng):
    t = jw.TransformBuilder.create("Wavelet Packet Transform", "db2")
    v = rng.standard_normal((8, 8, 16))
    np.testing.assert_allclose(np.asarray(t.reverse(t.forward(v))), v, atol=1e-8)


def test_complex_bridge(rng):
    """BasicTransform.java:257-322: interleaved re/im through the real path."""
    t = jw.TransformBuilder.create("Fast Wavelet Transform", "db4")
    z = rng.standard_normal(64) + 1j * rng.standard_normal(64)
    y = t.forward(z)
    assert np.iscomplexobj(np.asarray(y))
    np.testing.assert_allclose(np.asarray(t.reverse(y)), z, atol=1e-8)
    # equals the real transform on the interleaved layout
    inter = np.zeros(128)
    inter[0::2], inter[1::2] = z.real, z.imag
    yr = np.asarray(jw.fwt(jnp.asarray(inter), "db4"))
    np.testing.assert_allclose(np.asarray(y), yr[0::2] + 1j * yr[1::2], atol=1e-10)


def test_aed_decompose_numbers():
    from jwave_tpu.utils import ancient_egyptian_decompose, ancient_egyptian_compose

    assert ancient_egyptian_decompose(42) == [5, 3, 1]  # 32+8+2
    assert ancient_egyptian_decompose(1000) == [9, 8, 7, 6, 5, 3]
    assert ancient_egyptian_compose([5, 3, 1]) == 42
    assert ancient_egyptian_decompose(1) == [0]


@pytest.mark.parametrize("n", [3, 42, 100, 1000])
def test_aed_roundtrip(n, rng):
    x = rng.standard_normal(n)
    t = jw.TransformBuilder.create("Ancient Egyptian Decomposition Fast Wavelet Transform", "Haar")
    np.testing.assert_allclose(np.asarray(t.reverse(t.forward(x))), x, atol=1e-8)


def test_aed_chunks_match_direct(rng):
    """Each pow-2 chunk transforms independently (AncientEgyptianDecomposition.java:97-129)."""
    x = rng.standard_normal(42)  # 32 + 8 + 2
    y = np.asarray(jw.aed_forward(jnp.asarray(x), lambda c: jw.fwt(c, "Haar")))
    np.testing.assert_allclose(y[:32], np.asarray(jw.fwt(jnp.asarray(x[:32]), "Haar")), atol=1e-12)
    np.testing.assert_allclose(y[32:40], np.asarray(jw.fwt(jnp.asarray(x[32:40]), "Haar")), atol=1e-12)
    np.testing.assert_allclose(y[40:], np.asarray(jw.fwt(jnp.asarray(x[40:]), "Haar")), atol=1e-12)


@pytest.mark.parametrize("n", [16, 24, 37, 1024])
@pytest.mark.slow
def test_shifting_roundtrip(n, rng):
    x = rng.standard_normal(n)
    y = jw.shifting_forward(jnp.asarray(x), "Haar")
    np.testing.assert_allclose(np.asarray(jw.shifting_reverse(y, "Haar")), x, atol=1e-8)


def test_shifting_odd_tail_passthrough(rng):
    x = rng.standard_normal(13)
    y = np.asarray(jw.shifting_forward(jnp.asarray(x), "Haar"))
    assert y[-1] == pytest.approx(x[-1], abs=0)
