"""JAX transformation compatibility: grad / vmap / jit compose with every
transform — capabilities the reference (plain Java) cannot express, and a
prerequisite for using the transforms inside larger TPU training programs."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import jwave_tpu as jw


def test_grad_through_fwt(rng):
    """d/dx ||FWT(x)||^2 = 2x for orthonormal banks (Parseval)."""
    x = jnp.asarray(rng.standard_normal(64))
    g = jax.grad(lambda a: jnp.sum(jw.fwt(a, "db4") ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(x), atol=1e-8)


def test_grad_through_modwt(rng):
    x = jnp.asarray(rng.standard_normal(50))
    loss = lambda a: jnp.sum(jw.modwt(a, "Haar", 3) ** 2)
    g = np.asarray(jax.grad(loss)(x))
    # finite-difference check on a few coordinates
    eps = 1e-6
    for i in (0, 17, 49):
        xp = x.at[i].add(eps)
        xm = x.at[i].add(-eps)
        fd = (float(loss(xp)) - float(loss(xm))) / (2 * eps)
        assert g[i] == pytest.approx(fd, rel=1e-4)


def test_grad_through_cwt(rng):
    x = jnp.asarray(rng.standard_normal(64))
    loss = lambda a: jnp.sum(jnp.abs(jw.cwt(a, [2.0, 4.0], "mexican hat").coefficients) ** 2)
    g = np.asarray(jax.grad(loss)(x))
    assert np.all(np.isfinite(g)) and np.any(g != 0)


def test_vmap_fwt(rng):
    xs = jnp.asarray(rng.standard_normal((6, 128)))
    vm = np.asarray(jax.vmap(lambda a: jw.fwt(a, "sym4"))(xs))
    batched = np.asarray(jw.fwt(xs, "sym4"))
    np.testing.assert_allclose(vm, batched, atol=1e-12)


def test_vmap_wpt_fused(rng):
    xs = jnp.asarray(rng.standard_normal((4, 64)))
    vm = np.asarray(jax.vmap(lambda a: jw.wpt(a, "db2", 4))(xs))
    batched = np.asarray(jw.wpt(xs, "db2", 4))
    np.testing.assert_allclose(vm, batched, atol=1e-12)


def test_jit_cache_reuse(rng):
    f = jax.jit(lambda a: jw.ifwt(jw.fwt(a, "db4"), "db4"))
    x1 = jnp.asarray(rng.standard_normal(256))
    x2 = jnp.asarray(rng.standard_normal(256))
    np.testing.assert_allclose(np.asarray(f(x1)), np.asarray(x1), atol=1e-8)
    np.testing.assert_allclose(np.asarray(f(x2)), np.asarray(x2), atol=1e-8)


def test_sliding_window_pattern(rng):
    """The reference's sliding-window MODWT analysis
    (MODWTSlidingWindowTest.java:17-98) as one batched call: windows are a
    leading axis, not a loop."""
    x = rng.standard_normal(512)
    window, step = 128, 64
    starts = np.arange(0, len(x) - window + 1, step)
    windows = jnp.asarray(np.stack([x[s : s + window] for s in starts]))
    coeffs = jw.modwt(windows, "db4", 3)  # (n_windows, 4, 128) in one kernel
    assert coeffs.shape == (len(starts), 4, window)
    for k in (0, len(starts) - 1):
        np.testing.assert_allclose(
            np.asarray(coeffs[k]),
            np.asarray(jw.modwt(jnp.asarray(x[starts[k] : starts[k] + window]), "db4", 3)),
            atol=1e-12,
        )
