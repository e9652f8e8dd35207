"""Facade + builder + compressor tests."""
import numpy as np
import jax.numpy as jnp
import pytest

import jwave_tpu as jw


def test_builder_reference_trio():
    """The three names the reference builder knows (TransformBuilder.java:40-94)."""
    for name, cls in [
        ("Fast Wavelet Transform", jw.FastWaveletTransform),
        ("Wavelet Packet Transform", jw.WaveletPacketTransform),
        ("Discrete Fourier Transform", jw.DiscreteFourierTransform),
    ]:
        t = jw.TransformBuilder.create(name, "Haar")
        assert isinstance(t.get_basic_transform(), cls)
        assert jw.TransformBuilder.identify(t) == name


def test_builder_extended_registry():
    """All transforms registered — unlike the reference's stale builder."""
    for name, wav in [
        ("Fast Fourier Transform", "Haar"),
        ("MODWT", "Haar"),
        ("Maximal Overlap Discrete Wavelet Transform", "db4"),
        ("Continuous Wavelet Transform", "morlet"),
        ("Shifting Wavelet Transform", "Haar"),
        ("Ancient Egyptian Decomposition Wavelet Packet Transform", "Haar"),
    ]:
        assert jw.TransformBuilder.create(name, wav) is not None


def test_builder_unknown_raises():
    with pytest.raises(jw.JWaveNotKnown):
        jw.TransformBuilder.create("Nope Transform")
    with pytest.raises(jw.JWaveNotKnown):
        jw.TransformBuilder.create("Fast Wavelet Transform", "Nope Wavelet")


def test_facade_accessors():
    t = jw.TransformBuilder.create("Fast Wavelet Transform", "db4")
    assert t.get_wavelet().name == "Daubechies 4"
    assert t.get_basic_transform().name == "Fast Wavelet Transform"


def test_cli_demo_path(rng):
    """The JWave.main demo flow (JWave.java:62-123): constant length-16."""
    t = jw.TransformBuilder.create("Fast Wavelet Transform", "Haar")
    x = np.ones(16)
    y = np.asarray(t.forward(x))
    assert y[0] == pytest.approx(4.0, abs=1e-12)  # sqrt(16)*1
    np.testing.assert_allclose(y[1:], 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(t.reverse(y)), x, atol=1e-10)


def test_modwt_facade_flat(rng):
    t = jw.TransformBuilder.create("MODWT", "db2")
    x = rng.standard_normal(64)
    flat = t.forward(x, 3)
    assert np.asarray(flat).shape == (256,)
    np.testing.assert_allclose(np.asarray(t.reverse(flat, 3)), x, atol=1e-8)
    basic = t.get_basic_transform()
    stack = basic.forward_modwt(jnp.asarray(x), 3)
    np.testing.assert_allclose(np.asarray(basic.inverse_modwt(stack)), x, atol=1e-8)


def test_compressor_magnitude(rng):
    c = jw.CompressorMagnitude(1.0)
    arr = jnp.asarray([1.0, -0.1, 5.0, 0.05, -3.0])
    out = np.asarray(c.compress(arr))
    mag = np.mean(np.abs(np.asarray(arr)))
    want = np.where(np.abs(np.asarray(arr)) >= mag, np.asarray(arr), 0.0)
    np.testing.assert_allclose(out, want, atol=0)
    rate = float(jw.Compressor.compression_rate(jnp.asarray(out)))
    assert rate == pytest.approx(100.0 * np.mean(want == 0.0))


def test_compressor_peaks_average():
    c = jw.CompressorPeaksAverage(1.0)
    arr = jnp.asarray([4.0, -1.0, 0.5, 2.5])
    out = np.asarray(c.compress(arr))
    # magnitude = max/2 = 2.0 (reference peak-min stays 0)
    np.testing.assert_allclose(out, [4.0, 0.0, 0.0, 2.5], atol=0)


def test_compressor_invalid_threshold():
    with pytest.raises(jw.JWaveFailure):
        jw.Compressor(0.0)


def test_compressor_2d_3d(rng):
    c = jw.CompressorMagnitude()
    m = rng.standard_normal((8, 8))
    out = np.asarray(c.compress(jnp.asarray(m)))
    mag = np.mean(np.abs(m))
    np.testing.assert_allclose(out, np.where(np.abs(m) >= mag, m, 0.0), atol=0)
    v = rng.standard_normal((4, 4, 4))
    out = np.asarray(c.compress(jnp.asarray(v)))
    mag = np.mean(np.abs(v))
    np.testing.assert_allclose(out, np.where(np.abs(v) >= mag, v, 0.0), atol=0)


def test_compress_transform_pipeline(rng):
    """CompressorTest.java flow: transform -> compress -> reverse."""
    t = jw.TransformBuilder.create("Fast Wavelet Transform", "db2")
    x = np.sin(2 * np.pi * np.arange(64) / 64)
    y = t.forward(x)
    yc = jw.CompressorMagnitude(1.0).compress(y)
    xr = np.asarray(t.reverse(yc))
    assert np.mean((xr - x) ** 2) < 0.1  # lossy but close


def test_exception_hierarchy():
    assert issubclass(jw.JWaveFailure, jw.JWaveException)
    assert issubclass(jw.JWaveError, jw.JWaveException)
    for e in (jw.JWaveNotAllocated, jw.JWaveNotFound, jw.JWaveNotImplemented,
              jw.JWaveNotKnown, jw.JWaveNotValid):
        assert issubclass(e, jw.JWaveFailure)


def test_generic_decompose_wpt(rng):
    """WaveletTransform.decompose is generic (WaveletTransform.java:136-146):
    row l = forward at level l, reconstruction from any row."""
    x = rng.standard_normal(64)
    t = jw.WaveletPacketTransform("db2")
    d = np.asarray(t.decompose(x))
    assert d.shape == (7, 64)
    for l in (0, 3, 6):
        np.testing.assert_allclose(d[l], np.asarray(jw.wpt(jnp.asarray(x), "db2", l)), atol=1e-12)
        np.testing.assert_allclose(np.asarray(t.recompose(jnp.asarray(d), l)), x, atol=1e-8)


def test_modwt_decompose_guarded():
    with pytest.raises(jw.JWaveFailure):
        jw.MODWTTransform("Haar").decompose(np.zeros(16))


def test_aed_blocked_decompose():
    from jwave_tpu.utils.numerics import ancient_egyptian_decompose_blocked

    assert ancient_egyptian_decompose_blocked(127, 32) == [32, 32, 32, 16, 8, 4, 2, 1]
    assert ancient_egyptian_decompose_blocked(64, 32) == [32, 32]
    with pytest.raises(jw.JWaveFailure):
        ancient_egyptian_decompose_blocked(16, 12)
    with pytest.raises(jw.JWaveFailure):
        ancient_egyptian_decompose_blocked(8, 16)


def test_aed_parity_constructor():
    t = jw.AncientEgyptianDecomposition(jw.FastWaveletTransform("Haar"), 4)
    assert t.initial_wavelet_space_size == 4  # stored-but-unused, as in the reference


def test_generic_decompose_shape_cache(rng):
    """Regression: decompose must retrace per signal length (the jit cache
    key once froze `steps` from the first call)."""
    t = jw.WaveletPacketTransform("Haar")
    d8 = np.asarray(t.decompose(np.ones(8)))
    d16 = np.asarray(t.decompose(np.ones(16)))
    assert d8.shape == (4, 8)
    assert d16.shape == (5, 16)


def test_builder_cwt_default_wavelet():
    t = jw.TransformBuilder.create("Continuous Wavelet Transform")
    assert t.get_basic_transform().cwavelet.name == "Morlet"


def test_inverse_modwt_accepts_lists(rng):
    m = jw.MODWTTransform("Haar")
    x = rng.standard_normal(32)
    stack = np.asarray(m.forward_modwt(jnp.asarray(x), 2)).tolist()
    back = np.asarray(m.inverse_modwt(stack))
    np.testing.assert_allclose(back, x, atol=1e-8)


def test_cwt_direct_int_input():
    res = jw.cwt_direct(np.arange(32), [2.0], "mexican hat")
    assert float(np.max(np.abs(np.asarray(res.coefficients)))) > 0.0
