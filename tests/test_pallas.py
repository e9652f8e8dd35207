"""Pallas MODWT kernel correctness (interpreter mode on the CPU backend;
compiled-mode correctness is exercised on real TPU by bench.py and was
validated against the CPU float64 oracle)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import jwave_tpu as jw
from jwave_tpu.ops import pallas_modwt as pm

from jax.experimental import pallas as pl


def _run_interpret(kernel_builder, *args):
    with jax.disable_jit():
        return kernel_builder(*args)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **kw):
        kw.setdefault("interpret", True)
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", patched)
    monkeypatch.setattr(pm.pl, "pallas_call", patched)
    yield


@pytest.mark.parametrize("name", ["Haar", "db4"])
def test_pallas_modwt_matches_direct(name, rng):
    x = jnp.asarray(rng.standard_normal((4, 256)), dtype=jnp.float32)
    got = np.asarray(pm.modwt_pallas(x, name, 4))
    want = np.asarray(jw.modwt(x, name, 4, method=jw.ConvolutionMethod.DIRECT))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pallas_modwt_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 128)), dtype=jnp.float32)
    c = pm.modwt_pallas(x, "db4", 3)
    back = np.asarray(pm.imodwt_pallas(c, "db4"))
    np.testing.assert_allclose(back, np.asarray(x), atol=1e-5)


def test_pallas_modwt_odd_batch(rng):
    """Grid padding: batch not divisible by the row block."""
    x = jnp.asarray(rng.standard_normal((3, 128)), dtype=jnp.float32)
    got = np.asarray(pm.modwt_pallas(x, "Haar", 2))
    want = np.asarray(jw.modwt(x, "Haar", 2, method=jw.ConvolutionMethod.DIRECT))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pallas_modwt_non_pow2_lane_aligned(rng):
    """MODWT supports arbitrary N; the Pallas cascade only needs lane
    alignment (N % 128 == 0), not powers of two — rolls are mod-N."""
    x = jnp.asarray(rng.standard_normal((8, 384)), dtype=jnp.float32)
    got = np.asarray(pm.modwt_pallas(x, "db4", 3))
    want = np.asarray(jw.modwt(x, "db4", 3, method=jw.ConvolutionMethod.DIRECT))
    np.testing.assert_allclose(got, want, atol=1e-5)
