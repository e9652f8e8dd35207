"""Performance-variant facades, datatypes containers, profiling helpers."""
import numpy as np
import jax.numpy as jnp
import pytest

import jwave_tpu as jw
from jwave_tpu.datatypes import (
    BlockFull,
    BlockHash,
    LineFull,
    LineHash,
    SpaceFull,
    SpaceHash,
    complex_to_interleaved,
    interleaved_to_complex,
)
from jwave_tpu.variants import (
    EfficientMODWTTransform,
    InPlaceFastWaveletTransform,
    ParallelDiscreteFourierTransform,
    ParallelTransform,
    ParallelWaveletPacketTransform,
    PooledFastFourierTransform,
    PooledMODWTTransform,
    PooledWaveletPacketTransform,
)


def test_inplace_fwt_donation(rng):
    x = rng.standard_normal(256)
    t = InPlaceFastWaveletTransform("db4")
    y = t.forward_in_place(jnp.asarray(x))
    want = np.asarray(jw.fwt(jnp.asarray(x), "db4"))
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-12)
    np.testing.assert_allclose(np.asarray(t.reverse_in_place(y)), x, atol=1e-8)


def test_pooled_aliases_behave_identically(rng):
    x = rng.standard_normal(128)
    np.testing.assert_allclose(
        np.asarray(PooledWaveletPacketTransform("db2").forward(x)),
        np.asarray(jw.WaveletPacketTransform("db2").forward(x)),
        atol=0,
    )
    z = rng.standard_normal(32) + 1j * rng.standard_normal(32)
    np.testing.assert_allclose(
        np.asarray(PooledFastFourierTransform().forward(z)), np.fft.fft(z), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(PooledMODWTTransform("db2").forward_modwt(jnp.asarray(x), 3)),
        np.asarray(jw.modwt(jnp.asarray(x), "db2", 3)),
        atol=0,
    )


def test_parallel_aliases(rng):
    x = rng.standard_normal(512)
    p = ParallelWaveletPacketTransform("db4")
    np.testing.assert_allclose(
        np.asarray(p.forward(x)), np.asarray(jw.wpt(jnp.asarray(x), "db4")), atol=0
    )
    p.shutdown()  # reference lifecycle no-op
    z = rng.standard_normal(16) + 1j * rng.standard_normal(16)
    np.testing.assert_allclose(
        np.asarray(ParallelDiscreteFourierTransform().forward(z)), np.fft.fft(z), atol=1e-9
    )
    mat = rng.standard_normal((16, 32))
    pt = ParallelTransform(jw.FastWaveletTransform("Haar"))
    st = jw.Transform(jw.FastWaveletTransform("Haar"))
    np.testing.assert_allclose(np.asarray(pt.forward(mat)), np.asarray(st.forward(mat)), atol=0)


def test_efficient_modwt_streaming(rng):
    x = rng.standard_normal(1024)
    t = EfficientMODWTTransform("db2")
    full = np.asarray(t.forward_modwt(jnp.asarray(x), 3))
    streamed = np.asarray(t.forward_streaming(jnp.asarray(x), 3, chunk=100))
    np.testing.assert_allclose(streamed, full, atol=1e-10)


def test_efficient_modwt_streaming_short_signal(rng):
    x = rng.standard_normal(32)
    t = EfficientMODWTTransform("db4")
    full = np.asarray(t.forward_modwt(jnp.asarray(x), 2))
    streamed = np.asarray(t.forward_streaming(jnp.asarray(x), 2, chunk=8))
    np.testing.assert_allclose(streamed, full, atol=1e-10)


def test_dense_containers():
    b = BlockFull(4, 5).alloc()
    b.set(2, 3, 7.5)
    assert b.get(2, 3) == 7.5
    assert b.get(0, 0) == 0.0
    assert b.to_numpy().shape == (4, 5)
    assert b.to_jax().shape == (4, 5)
    with pytest.raises(jw.JWaveNotValid):
        b.get(4, 0)
    b.erase()
    with pytest.raises(jw.JWaveNotAllocated):
        b.get(0, 0)
    l = LineFull(8, offset=4).alloc()
    l.set(11, 1.0)  # offset-indexed like reference SuperLine
    assert l.get(11) == 1.0
    with pytest.raises(jw.JWaveNotValid):
        l.get(3)
    s = SpaceFull(2, 3, 4).alloc()
    s.set(1, 2, 3, -1.0)
    assert s.get(1, 2, 3) == -1.0


def test_sparse_containers():
    h = BlockHash(1000, 1000).alloc()
    h.set(500, 500, 2.0)
    assert h.stored == 1
    assert h.get(500, 500) == 2.0
    assert h.get(0, 0) == 0.0
    h.set(500, 500, 0.0)  # zeroing removes the entry
    assert h.stored == 0
    lh = LineHash(10).alloc()
    lh.set(3, 1.5)
    assert lh.to_numpy()[3] == 1.5
    sh = SpaceHash(5, 5, 5).alloc()
    sh.set(1, 1, 1, 9.0)
    assert sh.get(1, 1, 1) == 9.0


def test_complex_interleave_roundtrip(rng):
    z = rng.standard_normal(16) + 1j * rng.standard_normal(16)
    inter = complex_to_interleaved(z)
    assert inter.shape == (32,)
    assert inter[0] == z[0].real and inter[1] == z[0].imag
    np.testing.assert_allclose(interleaved_to_complex(inter), z, atol=0)


def test_profiling_helpers(rng):
    from jwave_tpu.utils.profiling import throughput, time_fn

    x = jnp.asarray(rng.standard_normal(1024))
    dt = time_fn(lambda a: jw.fwt(a, "Haar"), x, warmup=1, iters=2)
    assert dt > 0
    assert throughput(lambda a: jw.fwt(a, "Haar"), x, samples=1024, warmup=1, iters=2) > 0
