"""Fast smoke coverage for the analysis modules whose full test modules are
marked ``slow`` (test_scattering.py, test_superlet.py): tiny shapes keep the
bank construction + trace under a couple of seconds so the default
``pytest -q`` still exercises every public analysis entry point end to end.
"""
import numpy as np
import jax.numpy as jnp

import jwave_tpu as jw

RNG = np.random.default_rng(7)


def test_scattering1d_smoke():
    x = jnp.asarray(RNG.standard_normal((2, 256)))
    r = jw.scattering1d(x, J=3, Q=2)
    assert r.S0.shape[:-1] == (2,)
    assert r.S1.shape[-2] == 3 * 2 + 1
    assert r.S2.shape[-2] == r.n_paths
    f = r.features()
    assert f.shape[-2] == 1 + r.S1.shape[-2] + r.n_paths
    assert np.all(np.isfinite(np.asarray(f)))


def test_scattering2d_smoke():
    img = jnp.asarray(RNG.standard_normal((32, 32)))
    r = jw.scattering2d(img, J=2, L=2)
    assert r.S1.shape[-3] == 2 * 2
    assert r.S2.shape[-3] == r.n_paths
    assert np.all(np.isfinite(np.asarray(r.features())))


def test_superlet_smoke():
    x = jnp.asarray(RNG.standard_normal((2, 512)))
    freqs = np.linspace(10.0, 50.0, 8)
    s = jw.superlet(x, freqs, 1000.0, order_max=4)
    assert s.shape == (2, 8, 512)
    assert np.all(np.isfinite(np.asarray(s)))
