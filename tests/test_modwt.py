"""MODWT correctness: oracle parity, FFT==direct, perfect reconstruction on
arbitrary lengths, level limits, flattened 1D interface."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import jwave_tpu as jw
from jwave_tpu.filters import get_filter
from jwave_tpu.transforms.modwt import MAX_DECOMPOSITION_LEVEL

import oracle


@pytest.mark.parametrize("name", ["Haar", "Daubechies 4", "Daubechies 8"])
def test_matches_oracle(name, rng):
    fb = get_filter(name)
    x = rng.standard_normal(37)  # arbitrary length
    for level in (1, 3):
        got = np.asarray(jw.modwt(jnp.asarray(x), name, level, method=jw.ConvolutionMethod.DIRECT))
        np.testing.assert_allclose(got, oracle.modwt(x, fb, level), atol=1e-12)


def test_fft_equals_direct(rng):
    """The AUTO threshold decision must not change values
    (MODWTFFTAdjointVerificationTest analog)."""
    x = rng.standard_normal(100)
    for name in ["Haar", "db4", "db20"]:
        d = np.asarray(jw.modwt(jnp.asarray(x), name, 4, method=jw.ConvolutionMethod.DIRECT))
        f = np.asarray(jw.modwt(jnp.asarray(x), name, 4, method=jw.ConvolutionMethod.FFT))
        np.testing.assert_allclose(d, f, atol=1e-10)


@pytest.mark.parametrize("n", [32, 100, 333, 1024])
@pytest.mark.parametrize("name", ["Haar", "db4"])
def test_perfect_reconstruction(n, name, rng):
    x = rng.standard_normal(n)
    level = min(5, n.bit_length() - 1)
    c = jw.modwt(jnp.asarray(x), name, level)
    xr = np.asarray(jw.imodwt(c, name))
    np.testing.assert_allclose(xr, x, atol=1e-8)


def test_inverse_adjoint_consistency(rng):
    """inverse uses adjoint convolution; FFT and direct inverses agree."""
    x = rng.standard_normal(64)
    c = jw.modwt(jnp.asarray(x), "db4", 3)
    xa = np.asarray(jw.imodwt(c, "db4", method=jw.ConvolutionMethod.DIRECT))
    xb = np.asarray(jw.imodwt(c, "db4", method=jw.ConvolutionMethod.FFT))
    np.testing.assert_allclose(xa, xb, atol=1e-10)


def test_shift_invariance(rng):
    """MODWT of a circularly shifted signal == circularly shifted MODWT."""
    x = rng.standard_normal(64)
    c = np.asarray(jw.modwt(jnp.asarray(x), "db4", 3))
    cs = np.asarray(jw.modwt(jnp.asarray(np.roll(x, 5)), "db4", 3))
    np.testing.assert_allclose(np.roll(c, 5, axis=-1), cs, atol=1e-10)


def test_level_limits():
    with pytest.raises(jw.JWaveFailure):
        jw.modwt(jnp.zeros(64), "Haar", 0)
    with pytest.raises(jw.JWaveFailure):
        jw.modwt(jnp.zeros(64), "Haar", 7)  # > log2(64)
    with pytest.raises(jw.JWaveFailure):
        jw.modwt(jnp.zeros(1 << 20), "Haar", MAX_DECOMPOSITION_LEVEL + 1)
    # exactly at the theoretical limit is fine
    jw.modwt(jnp.ones(64), "Haar", 6)


def test_energy_preservation(rng):
    """MODWT is an isometry for orthonormal banks: sum of coefficient
    energies equals signal energy (Percival & Walden eq. 171)."""
    x = rng.standard_normal(128)
    c = np.asarray(jw.modwt(jnp.asarray(x), "db4", 4))
    assert np.sum(c**2) == pytest.approx(np.sum(x**2), rel=1e-8)


def test_flat_1d_interface(rng):
    """MODWT1DInterfaceTest analog: flatten layout [W_1..W_J, V_J]."""
    x = rng.standard_normal(64)
    flat = np.asarray(jw.modwt_1d(jnp.asarray(x), "db2", 3))
    assert flat.shape == (4 * 64,)
    stack = np.asarray(jw.modwt(jnp.asarray(x), "db2", 3))
    np.testing.assert_allclose(flat.reshape(4, 64), stack, atol=0)
    # reverse with explicit level and with inference
    np.testing.assert_allclose(np.asarray(jw.imodwt_1d(jnp.asarray(flat), "db2", 3)), x, atol=1e-8)
    np.testing.assert_allclose(np.asarray(jw.imodwt_1d(jnp.asarray(flat), "db2")), x, atol=1e-8)


def test_batched(rng):
    xs = rng.standard_normal((6, 50))
    batched = np.asarray(jw.modwt(jnp.asarray(xs), "db4", 3))
    assert batched.shape == (6, 4, 50)
    for i in range(6):
        np.testing.assert_allclose(
            batched[i], np.asarray(jw.modwt(jnp.asarray(xs[i]), "db4", 3)), atol=1e-12
        )


def test_denoising_pattern(rng):
    """The documented use: zero a detail level, reconstruct
    (MODWTTransform.java inverseMODWT example)."""
    x = rng.standard_normal(128)
    c = np.array(jw.modwt(jnp.asarray(x), "db4", 4))
    c[0] = 0.0
    den = np.asarray(jw.imodwt(jnp.asarray(c), "db4"))
    assert den.shape == x.shape
    assert not np.allclose(den, x)


def test_circular_fft_helpers_match_direct(rng):
    """ops.circular FFT-convolution helpers (public API) vs direct paths."""
    from jwave_tpu.ops.circular import (
        circular_conv,
        circular_conv_adjoint,
        circular_conv_fft,
        circular_conv_adjoint_fft,
    )

    x = jnp.asarray(rng.standard_normal(40))
    f = rng.standard_normal(7)
    np.testing.assert_allclose(
        np.asarray(circular_conv_fft(x, f)), np.asarray(circular_conv(x, f)), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(circular_conv_adjoint_fft(x, f)), np.asarray(circular_conv_adjoint(x, f)), atol=1e-10
    )
    # wrapped case: filter longer than the signal
    flong = rng.standard_normal(100)
    np.testing.assert_allclose(
        np.asarray(circular_conv_fft(x, flong)), np.asarray(circular_conv(x, flong)), atol=1e-10
    )


@pytest.mark.slow
def test_modwt_2d_separable(rng):
    """2D MODWT subband (jr, jc) == columns-level-jr applied to the
    rows-level-jc coefficients; perfect reconstruction."""
    m = rng.standard_normal((16, 20))
    c = np.asarray(jw.modwt_2d(jnp.asarray(m), "Haar", 2))
    assert c.shape == (3, 3, 16, 20)
    rowsc = np.asarray(jw.modwt(jnp.asarray(m), "Haar", 2))  # (16, 3, 20)
    for jc in range(3):
        sub = rowsc[:, jc, :]  # rows filtered at level jc
        colsc = np.asarray(jw.modwt(jnp.asarray(sub.T), "Haar", 2))  # (20, 3, 16)
        for jr in range(3):
            np.testing.assert_allclose(c[jr, jc], colsc[:, jr, :].T, atol=1e-12)
    back = np.asarray(jw.imodwt_2d(jnp.asarray(c), "Haar"))
    np.testing.assert_allclose(back, m, atol=1e-10)


def test_modwt_2d_facade(rng):
    m = rng.standard_normal((16, 16))
    t = jw.MODWTTransform("Haar")
    c = t.forward_modwt_2d(m, 2)
    assert np.asarray(c).shape == (3, 3, 16, 16)
    np.testing.assert_allclose(np.asarray(t.inverse_modwt_2d(c)), m, atol=1e-8)


def test_thread_safety_stress(rng):
    """MODWTThreadSafetyTest.java:23-91 analog: hammer one shared transform
    object from a thread pool; results must match the single-thread answer
    (the functional core is pure; the facade's jit cache is the only shared
    state)."""
    import concurrent.futures

    t = jw.MODWTTransform("db4")
    x = rng.standard_normal(256)
    want = np.asarray(t.forward_modwt(jnp.asarray(x), 3))

    def worker(_):
        return np.asarray(t.forward_modwt(jnp.asarray(x), 3))

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(worker, range(32)))
    for r in results:
        np.testing.assert_array_equal(r, want)


def test_empty_input_parity():
    """Reference returns the (level+1, 0) structure for empty input
    (MODWTTransform.java:267-274) instead of raising."""
    out = np.asarray(jw.modwt(jnp.zeros(0), "Haar", 3))
    assert out.shape == (4, 0)


# --------------------------------------------------------------------------
# MRA + wavelet variance (wmtsa-style supersets)
# --------------------------------------------------------------------------

class TestMRAandVariance:
    @pytest.mark.slow
    def test_mra_additivity_any_length(self, rng):
        for n in (500, 512, 1000):
            x = jnp.asarray(rng.standard_normal((2, n)))
            mra = jw.modwt_mra(x, "db4", 4)
            assert mra.shape == (2, 5, n)
            np.testing.assert_allclose(np.asarray(mra.sum(axis=-2)), np.asarray(x), atol=1e-10)

    def test_mra_rows_are_isolated_bands(self, rng):
        x = jnp.asarray(rng.standard_normal(256))
        coeffs = jw.modwt(x, "Haar", 3)
        mra = jw.modwt_mra(x, "Haar", 3)
        for j in range(4):
            iso = jnp.zeros_like(coeffs).at[j].set(coeffs[j])
            np.testing.assert_allclose(
                np.asarray(mra[j]), np.asarray(jw.imodwt(iso, "Haar")), atol=1e-11
            )

    def test_variance_matches_white_noise_theory(self, rng):
        sig = 1.5
        x = jnp.asarray(sig * rng.standard_normal(60000))
        v = np.asarray(jw.modwt_variance(x, "db4", 4))
        expect = np.array([sig**2 / 2**j for j in range(1, 5)])
        np.testing.assert_allclose(v, expect, rtol=0.08)

    def test_reflection_boundary(self, rng):
        # a ramp has a big jump under circular wrap; reflection removes it
        n = 256
        ramp = jnp.asarray(np.linspace(0.0, 10.0, n))
        per = np.asarray(jw.modwt(ramp, "db4", 3))
        ref = np.asarray(jw.modwt(ramp, "db4", 3, boundary="reflection"))
        assert ref.shape == per.shape == (4, n)
        # the filters look backward (x[n - m]), so the circular wrap hits the
        # FIRST L_j - 1 coefficients; reflection leaves only the ramp's slope
        assert np.abs(ref[0, :4]).max() < 0.1 * np.abs(per[0, :4]).max()
        # interior coefficients agree (boundary only affects the edges)
        np.testing.assert_allclose(ref[:, 64:192], per[:, 64:192], atol=1e-10)
        # full (2N) reflection transform inverts exactly
        full = jw.modwt(ramp, "db4", 3, boundary="reflection", truncate=False)
        assert full.shape == (4, 2 * n)
        np.testing.assert_allclose(
            np.asarray(jw.imodwt(full, "db4"))[:n], np.asarray(ramp), atol=1e-11
        )
        # MRA stays exactly additive under reflection
        mra = np.asarray(jw.modwt_mra(ramp, "db4", 3, boundary="reflection"))
        np.testing.assert_allclose(mra.sum(axis=0), np.asarray(ramp), atol=1e-10)
        with pytest.raises(jw.JWaveFailure):
            jw.modwt(ramp, "db4", 3, boundary="mirror")

    @pytest.mark.slow
    def test_mra_2d_additivity(self, rng):
        img = jnp.asarray(rng.standard_normal((2, 32, 48)))
        comp = jw.modwt_mra_2d(img, "db2", 2)
        assert comp.shape == (2, 3, 3, 32, 48)
        np.testing.assert_allclose(
            np.asarray(comp.sum(axis=(-4, -3))), np.asarray(img), atol=1e-10
        )
        # each component is the inverse of the isolated (jr, jc) subband
        coeffs = jw.modwt_2d(img, "db2", 2)
        iso = jnp.zeros_like(coeffs).at[:, 1, 2].set(coeffs[:, 1, 2])
        np.testing.assert_allclose(
            np.asarray(comp[:, 1, 2]), np.asarray(jw.imodwt_2d(iso, "db2")), atol=1e-11
        )
        # reflection stays additive too
        ref = jw.modwt_mra_2d(img, "db2", 2, boundary="reflection")
        np.testing.assert_allclose(
            np.asarray(ref.sum(axis=(-4, -3))), np.asarray(img), atol=1e-10
        )
        with pytest.raises(jw.JWaveFailure):
            jw.modwt_mra_2d(img, "db2", 2, boundary="mirror")
        with pytest.raises(jw.JWaveFailure):
            jw.modwt_mra_2d(img, "db2", 2, truncate=False)

    @pytest.mark.slow
    def test_review_regressions(self, rng):
        # plain-sequence inputs (no .shape before asarray)
        mra = np.asarray(jw.modwt_mra([0.0, 1.0, 2.0, 3.0], "Haar", 1))
        assert mra.shape == (2, 4)
        seq = list(np.linspace(0.0, 1.0, 64))
        assert np.asarray(jw.modwt_covariance(seq, seq, "Haar", 2)).shape == (2,)
        assert np.asarray(jw.modwt_correlation(seq, seq, "Haar", 2)).shape == (2,)
        v, lo, hi = jw.modwt_variance_ci(seq, "Haar", 2)
        assert np.asarray(v).shape == (2,)
        x = jnp.asarray(rng.standard_normal(256))
        # explicit truncate into mra / the statistics raises cleanly
        with pytest.raises(jw.JWaveFailure):
            jw.modwt_mra(x, "db4", 3, boundary="reflection", truncate=True)
        with pytest.raises(jw.JWaveFailure):
            jw.modwt_variance(x, "db4", 3, boundary="reflection", truncate=False)
        with pytest.raises(jw.JWaveFailure):
            jw.modwt_covariance(x, x, "db2", 3, truncate=False)
        with pytest.raises(jw.JWaveFailure):
            jw.modwt_correlation(x, x, "db2", 3, truncate=False)
        # reflection validates the level against the USER's length, not 2N
        with pytest.raises(jw.JWaveFailure, match="length 256"):
            jw.modwt(x, "Haar", 9, boundary="reflection")

    def test_variance_ci_brackets_white_noise_theory(self, rng):
        sig = 2.0
        x = jnp.asarray(sig * rng.standard_normal(2**15))
        var, lo, hi = jw.modwt_variance_ci(x, "db4", 4, confidence=0.99)
        expect = np.array([sig**2 / 2**j for j in range(1, 5)])
        assert np.all(np.asarray(lo) < np.asarray(var))
        assert np.all(np.asarray(var) < np.asarray(hi))
        assert np.all(np.asarray(lo) < expect) and np.all(expect < np.asarray(hi))
        # deeper levels have fewer equivalent degrees of freedom -> wider CI
        rel_width = (np.asarray(hi) - np.asarray(lo)) / np.asarray(var)
        assert np.all(np.diff(rel_width) > 0)
        with pytest.raises(jw.JWaveFailure):
            jw.modwt_variance_ci(x, "db4", 4, confidence=1.5)

    def test_covariance_and_correlation(self, rng):
        n = 8192
        x = jnp.asarray(rng.standard_normal(n))
        z = jnp.asarray(rng.standard_normal(n))
        # cov(x, x) == var(x); corr(x, x) == 1; corr(x, -x) == -1
        np.testing.assert_allclose(
            np.asarray(jw.modwt_covariance(x, x, "db2", 3)),
            np.asarray(jw.modwt_variance(x, "db2", 3)), atol=1e-12,
        )
        np.testing.assert_allclose(np.asarray(jw.modwt_correlation(x, x, "db2", 3)), 1.0)
        np.testing.assert_allclose(np.asarray(jw.modwt_correlation(x, -x, "db2", 3)), -1.0)
        # independent noise decorrelates at every scale
        assert np.abs(np.asarray(jw.modwt_correlation(x, z, "db2", 3))).max() < 0.1
        # y = x + noise: correlated at every scale, strictly between 0 and 1
        y = x + 0.5 * z
        corr = np.asarray(jw.modwt_correlation(x, y, "db2", 3))
        assert np.all((corr > 0.5) & (corr < 1.0))
        with pytest.raises(jw.JWaveFailure):
            jw.modwt_covariance(x, z[:100], "db2", 3)

    def test_variance_biased_vs_unbiased_and_guard(self, rng):
        x = jnp.asarray(rng.standard_normal((3, 300)))
        vb = jw.modwt_variance(x, "db2", 3, unbiased=False)
        vu = jw.modwt_variance(x, "db2", 3, unbiased=True)
        assert vb.shape == vu.shape == (3, 3)
        with pytest.raises(jw.JWaveFailure):
            jw.modwt_variance(jnp.zeros(16), "db20", 4)


def test_mra_2d_reflection_level_limit():
    # reflection must validate the level against the user's image, not 2Rx2C
    img = jnp.ones((4, 4))
    with pytest.raises(jw.JWaveFailure, match="length 4"):
        jw.modwt_mra_2d(img, "Haar", 3, boundary="reflection")


class TestLongMemoryEstimators:
    @staticmethod
    def _fgn(H, n, rng):
        """Davies-Harte circulant embedding: exact fractional Gaussian noise."""
        k = np.arange(n + 1)
        g = 0.5 * (np.abs(k - 1)**(2*H) - 2*np.abs(k)**(2*H) + np.abs(k + 1)**(2*H))
        row = np.concatenate([g, g[-2:0:-1]])
        lam = np.fft.fft(row).real
        lam[lam < 0] = 0.0
        z = rng.standard_normal(2*n) + 1j * rng.standard_normal(2*n)
        return np.fft.fft(z * np.sqrt(lam / (4*n)))[:n].real

    @pytest.mark.parametrize("H", [0.2, 0.5, 0.7, 0.9])
    def test_recovers_fgn_hurst(self, H, rng):
        x = jnp.asarray(self._fgn(H, 1 << 15, rng))
        h = float(jw.hurst_exponent(x, "db4"))
        assert abs(h - H) < 0.1

    @pytest.mark.parametrize("H", [0.3, 0.7])
    def test_recovers_fbm_hurst(self, H, rng):
        x = jnp.asarray(np.cumsum(self._fgn(H, 1 << 15, rng)))
        h = float(jw.hurst_exponent(x, "db4", kind="fbm"))
        assert abs(h - H) < 0.1

    @pytest.mark.slow
    def test_white_noise_is_half(self, rng):
        xb = jnp.asarray(rng.standard_normal((4, 1 << 14)))
        h = np.asarray(jw.hurst_exponent(xb))
        assert h.shape == (4,)
        assert np.all(np.abs(h - 0.5) < 0.1)

    def test_log_spectrum_shapes_and_fit(self, rng):
        xb = jnp.asarray(rng.standard_normal((3, 4096)))
        y, s, b = jw.wavelet_log_spectrum(xb, "db4", 6)
        assert y.shape == (3, 6) and s.shape == (3,) and b.shape == (3,)
        # white noise: each octave holds half the bandwidth, so the MODWT
        # logscale diagram has slope -1 (H = -1/2 + 1 = 0.5)
        assert np.all(np.abs(np.asarray(s) + 1.0) < 0.3)

    def test_jit_and_guards(self, rng):
        x = jnp.asarray(rng.standard_normal(4096))
        f = jax.jit(lambda a: jw.hurst_exponent(a, "db4", level=6))
        assert abs(float(f(x)) - float(jw.hurst_exponent(x, "db4", level=6))) < 1e-12
        with pytest.raises(jw.JWaveFailure):
            jw.hurst_exponent(x, "db4", kind="arfima")
        with pytest.raises(jw.JWaveFailure):
            jw.hurst_exponent(jnp.ones(32), "db20")  # too short for level 2
        with pytest.raises(jw.JWaveFailure):
            jw.wavelet_log_spectrum(x, "db4", 1)


class TestPerLevelAutoRouting:
    """Per-level AUTO convolution-method selection
    (MODWTTransform.java:640-664): AUTO must route each level by N*M_j,
    giving a direct prefix + FFT tail that agrees with both pure methods."""

    def test_prefix_matches_reference_rule(self):
        from jwave_tpu.transforms.modwt import (
            _direct_prefix_levels, _upsample_len, DEFAULT_FFT_THRESHOLD)

        # the reference's published break-evens (MODWTTransform.java:122-127)
        # fall out of the N*M_j > 4096 rule per level
        for n, name, want in [
            (256, "db4", 2),   # M_j = 8,15,29,.. -> 2048,3840,7424: k=2
            (64, "haar", 6),   # M_j = 2^(j-1)+1: 64*33 = 2112 <= 4096 at j=6
            (512, "db20", 0),  # M_1 = 40 -> 512*40 > 4096 immediately
        ]:
            level = min(6, (n.bit_length() - 1))
            k = _direct_prefix_levels(
                name, level, n, jw.ConvolutionMethod.AUTO, DEFAULT_FFT_THRESHOLD)
            assert k == min(want, level), (n, name, k)
            for j in range(1, level + 1):
                cheap = n * _upsample_len(name, j) <= DEFAULT_FFT_THRESHOLD
                assert (j <= k) == cheap

    def test_hybrid_agrees_with_pure_methods(self, rng):
        # n=256 db4 level 5: AUTO runs levels 1-2 direct, 3-5 as one FFT
        # cascade; all three methods are the same linear operator
        x = jnp.asarray(rng.standard_normal((2, 256)))
        a = np.asarray(jw.modwt(x, "db4", 5, method=jw.ConvolutionMethod.AUTO))
        d = np.asarray(jw.modwt(x, "db4", 5, method=jw.ConvolutionMethod.DIRECT))
        f = np.asarray(jw.modwt(x, "db4", 5, method=jw.ConvolutionMethod.FFT))
        np.testing.assert_allclose(a, d, atol=1e-11)
        np.testing.assert_allclose(a, f, atol=1e-11)

    def test_hybrid_inverse_roundtrip(self, rng):
        x = jnp.asarray(rng.standard_normal(256))
        for method in (jw.ConvolutionMethod.AUTO, jw.ConvolutionMethod.DIRECT,
                       jw.ConvolutionMethod.FFT):
            c = jw.modwt(x, "db4", 5, method=method)
            r = jw.imodwt(c, "db4", method=method)
            np.testing.assert_allclose(np.asarray(r), np.asarray(x), atol=1e-11)
        # cross: forward AUTO (hybrid), inverse FFT — same operator either way
        c = jw.modwt(x, "db4", 5, method=jw.ConvolutionMethod.AUTO)
        r = jw.imodwt(c, "db4", method=jw.ConvolutionMethod.FFT)
        np.testing.assert_allclose(np.asarray(r), np.asarray(x), atol=1e-11)

    def test_threshold_dial(self, rng):
        # a huge threshold forces all-direct through AUTO; zero forces
        # all-FFT — both still exactly invert
        x = jnp.asarray(rng.standard_normal(128))
        hi = jw.modwt(x, "db4", 4, fft_threshold=1 << 30)
        lo = jw.modwt(x, "db4", 4, fft_threshold=0)
        np.testing.assert_allclose(np.asarray(hi), np.asarray(lo), atol=1e-11)
