"""Lifting-scheme FWT: structural perfect reconstruction + external anchors.

External evidence: the lifting outputs are pinned against circular
cross-correlation with the reference's OWN stored constants
(CDF97.java / CDF53.java `_scalingDeCom`, via jwave_tpu.filters.data) at
the derived phase/shift/scale correspondences, and Haar lifting must equal
the existing orthonormal Haar FWT exactly. Vanishing moments pin the
highpass conventions the reference's (disabled, non-PR) stored banks
cannot: CDF 5/3 annihilates linears, CDF 9/7 annihilates cubics.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jwave_tpu as jw
from jwave_tpu.filters import get_filter
from jwave_tpu.transforms.lifting import _K97

SCHEMES = ["Haar lifting", "CDF 5/3", "CDF 9/7"]


def _conv_butterfly(x, lo, hi):
    """Reference Wavelet.java:236-260 analysis butterfly (NumPy oracle)."""
    h = len(x)
    half = h // 2
    a = np.zeros(half)
    d = np.zeros(half)
    for i in range(half):
        for j in range(len(lo)):
            k = (2 * i + j) % h
            a[i] += x[k] * lo[j]
            d[i] += x[k] * hi[j]
    return a, d


@pytest.mark.parametrize("scheme", SCHEMES)
@pytest.mark.parametrize("n", [2, 4, 8, 64, 256])
def test_roundtrip_single_level(scheme, n, rng):
    x = rng.standard_normal((3, n))
    a, d = jw.lifting_dwt(x, scheme)
    assert a.shape == d.shape == (3, n // 2)
    y = jw.lifting_idwt(a, d, scheme)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-12)


@pytest.mark.parametrize("scheme", SCHEMES)
@pytest.mark.parametrize("n,level", [(64, 1), (64, 3), (256, None), (1024, 10)])
def test_roundtrip_pyramid(scheme, n, level, rng):
    x = rng.standard_normal((2, n))
    y = jw.lifting_fwt(x, scheme, level)
    assert y.shape == x.shape
    back = jw.lifting_ifwt(y, scheme, level)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-11)


@pytest.mark.parametrize("level", [1, 2, 5])
def test_haar_lifting_equals_haar_fwt(level, rng):
    """Haar lifting is the orthonormal Haar 1 butterfly, exactly."""
    x = rng.standard_normal((4, 64))
    np.testing.assert_allclose(
        np.asarray(jw.lifting_fwt(x, "haar", level)),
        np.asarray(jw.fwt(x, "Haar 1", level)),
        atol=1e-13,
    )


def test_cdf97_lowpass_matches_reference_constants(rng):
    """One lifting level reproduces circular cross-correlation with
    CDF97.java _scalingDeCom: a_conv[i] == a_lift[(i+2) % half], up to the
    12-digit truncation of the stored reference constants."""
    x = rng.standard_normal(64)
    fb = get_filter("CDF 9/7")
    a_conv, _ = _conv_butterfly(x, np.asarray(fb.dec_lo), np.asarray(fb.dec_hi))
    a_lift, _ = jw.lifting_dwt(x, "CDF 9/7")
    np.testing.assert_allclose(a_conv, np.roll(np.asarray(a_lift), -2), rtol=2e-7, atol=1e-9)


def test_cdf97_highpass_matches_reference_constants(rng):
    """The stored CDF97.java _waveletDeCom is centered on the EVEN phase
    (why the bank is not PR under the reference's even-stride butterfly);
    on the one-sample-shifted input it equals the lifting detail:
    d_conv(roll(x,1))[i] == d_lift(x)[(i+1) % half]."""
    x = rng.standard_normal(64)
    fb = get_filter("CDF 9/7")
    _, d_conv = _conv_butterfly(np.roll(x, 1), np.asarray(fb.dec_lo), np.asarray(fb.dec_hi))
    _, d_lift = jw.lifting_dwt(x, "CDF 9/7")
    np.testing.assert_allclose(d_conv, np.roll(np.asarray(d_lift), -1), rtol=2e-7, atol=1e-9)


def test_cdf53_lowpass_matches_reference_constants(rng):
    """CDF53.java _scalingDeCom = [-1/8, 1/4, 3/4, 1/4, -1/8] (exact
    dyadics): a_conv[i] == a_lift[(i+1) % half] at scale 1.0, exactly."""
    x = rng.standard_normal(64)
    fb = get_filter("CDF 5/3")
    a_conv, _ = _conv_butterfly(x, np.asarray(fb.dec_lo), np.asarray(fb.dec_hi))
    a_lift, _ = jw.lifting_dwt(x, "CDF 5/3")
    np.testing.assert_allclose(a_conv, np.roll(np.asarray(a_lift), -1), atol=1e-13)


def test_cdf53_annihilates_linears():
    """LeGall 5/3 analysis highpass has 2 vanishing moments: detail of a
    linear ramp vanishes away from the periodic wrap seam."""
    t = np.arange(128, dtype=np.float64)
    x = 3.0 + 0.25 * t
    _, d = jw.lifting_dwt(x, "CDF 5/3")
    assert np.max(np.abs(np.asarray(d)[1:-2])) < 1e-12


def test_cdf97_annihilates_cubics():
    """CDF 9/7 analysis highpass has 4 vanishing moments: detail of a cubic
    vanishes in the interior."""
    t = np.linspace(-1.0, 1.0, 256)
    x = 0.3 - 1.2 * t + 0.8 * t**2 + 2.1 * t**3
    _, d = jw.lifting_dwt(x, "CDF 9/7")
    assert np.max(np.abs(np.asarray(d)[3:-4])) < 1e-10


def test_cdf53_dc_gain():
    """Constant input: lowpass passes DC at gain 1 (reference-constant
    normalization), highpass is exactly zero."""
    x = np.full(64, 5.0)
    a, d = jw.lifting_dwt(x, "CDF 5/3")
    np.testing.assert_allclose(np.asarray(a), 5.0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-13)


def test_cdf97_dc_gain():
    x = np.full(64, 5.0)
    a, d = jw.lifting_dwt(x, "CDF 9/7")
    # stored reference dec_lo sums to 1 only to its 12 printed digits
    np.testing.assert_allclose(np.asarray(a), 5.0 * _K97 / _K97, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-12)


def test_shift_by_two_equivariance(rng):
    """Periodic lifting commutes with even shifts of the input."""
    x = rng.standard_normal(128)
    a1, d1 = jw.lifting_dwt(np.roll(x, 2), "CDF 9/7")
    a0, d0 = jw.lifting_dwt(x, "CDF 9/7")
    np.testing.assert_allclose(np.asarray(a1), np.roll(np.asarray(a0), 1), atol=1e-12)
    np.testing.assert_allclose(np.asarray(d1), np.roll(np.asarray(d0), 1), atol=1e-12)


def test_linearity(rng):
    x = rng.standard_normal(64)
    y = rng.standard_normal(64)
    lhs = jw.lifting_fwt(2.5 * x - 1.5 * y, "CDF 9/7", 3)
    rhs = 2.5 * jw.lifting_fwt(x, "CDF 9/7", 3) - 1.5 * jw.lifting_fwt(y, "CDF 9/7", 3)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-11)


@pytest.mark.slow
def test_facade_2d_3d_roundtrip(rng):
    t = jw.Transform(jw.LiftingWaveletTransform("cdf97"))
    mat = rng.standard_normal((32, 64))
    rec = t.reverse(t.forward(mat))
    np.testing.assert_allclose(np.asarray(rec), mat, atol=1e-10)
    spc = rng.standard_normal((16, 16, 16))
    rec3 = t.reverse(t.forward(spc))
    np.testing.assert_allclose(np.asarray(rec3), spc, atol=1e-10)


def test_facade_decompose_recompose(rng):
    t = jw.Transform(jw.LiftingWaveletTransform("CDF 5/3"))
    x = rng.standard_normal(64)
    bundle = t.decompose(x)
    assert bundle.shape == (7, 64)
    for lvl in (1, 3, 6):
        np.testing.assert_allclose(np.asarray(t.recompose(bundle, lvl)), x, atol=1e-11)


def test_builder_creates_lifting():
    t = jw.TransformBuilder.create("Lifting Wavelet Transform", "cdf9/7")
    assert jw.TransformBuilder.identify(t) == "Lifting Wavelet Transform"
    x = np.arange(16, dtype=np.float64)
    np.testing.assert_allclose(np.asarray(t.reverse(t.forward(x))), x, atol=1e-12)


def test_jit_vmap_grad(rng):
    x = rng.standard_normal((5, 64))
    f = jax.jit(lambda a: jw.lifting_fwt(a, "CDF 9/7", 3))
    np.testing.assert_allclose(
        np.asarray(jax.vmap(lambda r: f(r[None])[0])(jnp.asarray(x))),
        np.asarray(f(x)),
        atol=1e-12,
    )
    # the transform is linear, so the gradient of sum(fwt(x)) is constant in x
    g = jax.grad(lambda a: jw.lifting_fwt(a, "CDF 5/3", 2).sum())(jnp.asarray(x[0]))
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.parametrize("scheme", SCHEMES)
@pytest.mark.parametrize("n,level", [(16, 1), (256, 4), (64, None)])
def test_symmetric_roundtrip(scheme, n, level, rng):
    """Structural PR holds for the symmetric boundary too."""
    x = rng.standard_normal((2, n))
    y = jw.lifting_fwt(x, scheme, level, boundary="symmetric")
    back = jw.lifting_ifwt(y, scheme, level, boundary="symmetric")
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-11)


@pytest.mark.parametrize("scheme", ["CDF 5/3", "CDF 9/7"])
def test_symmetric_equals_whole_sample_extension(scheme, rng):
    """symmetric mode == periodic lifting on the whole-sample symmetric
    extension (period 2N-2), restricted to the first half — the JPEG2000
    boundary, bit-exact."""
    n = 32
    x = rng.standard_normal(n)
    ext = np.concatenate([x, x[-2:0:-1]])  # length 2n-2, even
    a_e, d_e = jw.lifting_dwt(ext, scheme, boundary="periodic")
    a_s, d_s = jw.lifting_dwt(x, scheme, boundary="symmetric")
    np.testing.assert_allclose(np.asarray(a_s), np.asarray(a_e)[: n // 2], atol=1e-14)
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_e)[: n // 2], atol=1e-14)


def test_symmetric_cdf53_annihilates_linears_everywhere():
    """Whole-sample symmetric extension folds a ramp smoothly at the left
    edge; the interior AND left-edge details vanish (unlike periodic,
    whose wrap seam leaks)."""
    t = np.arange(128, dtype=np.float64)
    x = 3.0 + 0.25 * t
    _, d = jw.lifting_dwt(x, "CDF 5/3", boundary="symmetric")
    assert np.max(np.abs(np.asarray(d)[:-2])) < 1e-12


def test_unknown_boundary():
    with pytest.raises(jw.JWaveFailure):
        jw.lifting_fwt(np.zeros(16), "CDF 9/7", boundary="reflect")


def test_bad_inputs():
    with pytest.raises(jw.JWaveFailure):
        jw.lifting_dwt(np.zeros(7), "CDF 9/7")
    with pytest.raises(jw.JWaveFailure):
        jw.lifting_fwt(np.zeros(48), "CDF 9/7")
    with pytest.raises(jw.JWaveNotKnown):
        jw.lifting_fwt(np.zeros(16), "no-such-scheme")
    with pytest.raises(jw.JWaveFailure):
        jw.lifting_fwt(np.zeros(16), "CDF 9/7", 9)
