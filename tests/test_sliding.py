"""Incremental sliding-window MODWT (transforms/sliding.py).

The reference slides a window and recomputes forwardMODWT per window
(MODWTSlidingWindowTest.java:17-98); the incremental API must agree with
that recompute on every interior column (t >= L_j - 1, where the circular
window transform never wraps), for any slide step, chunking, and wavelet.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from jwave_tpu import (
    SlidingMODWT,
    modwt,
    sliding_modwt_init,
    sliding_modwt_update,
)
from jwave_tpu.exceptions import JWaveFailure
from jwave_tpu.filters import get_filter


def interior_start(wavelet: str, j: int) -> int:
    """First circular-wrap-free column at level j: L_j - 1."""
    m = get_filter(wavelet).length
    return (m - 1) * ((1 << j) - 1)


def check_interior(state, window_sig, wavelet, level):
    """state.coeffs == modwt(window) on every wrap-free column."""
    ref = np.asarray(modwt(jnp.asarray(window_sig), wavelet, level))
    got = np.asarray(state.coeffs)
    w = window_sig.shape[-1]
    for j in range(1, level + 1):
        s = interior_start(wavelet, j)
        assert s < w, f"no interior at level {j}"
        np.testing.assert_allclose(
            got[..., j - 1, s:], ref[..., j - 1, s:], atol=1e-11,
            err_msg=f"W_{j} interior mismatch",
        )
    # the smooth row V_J has the same support as level J
    s = interior_start(wavelet, level)
    np.testing.assert_allclose(got[..., level, s:], ref[..., level, s:], atol=1e-11)


@pytest.mark.parametrize("wavelet,level", [("haar", 4), ("db4", 3), ("sym8", 2)])
def test_init_matches_recompute_interior(rng, wavelet, level):
    x0 = rng.standard_normal(256)
    st = sliding_modwt_init(jnp.asarray(x0), wavelet, level)
    check_interior(st, x0, wavelet, level)


@pytest.mark.parametrize("step", [1, 7, 64])
@pytest.mark.parametrize("wavelet,level", [("haar", 5), ("db4", 3)])
def test_slide_matches_recompute_per_window(rng, wavelet, level, step):
    wlen = 256
    total = wlen + 5 * step
    sig = rng.standard_normal(total)
    sl = SlidingMODWT(wavelet, level, wlen)
    st = sl.init(sig[:wlen])
    pos = wlen
    while pos + step <= total:
        st = sl.update(st, sig[pos : pos + step])
        pos += step
        window_sig = sig[pos - wlen : pos]
        np.testing.assert_allclose(np.asarray(st.window), window_sig, atol=0)
        check_interior(st, window_sig, wavelet, level)


def test_reference_sliding_pattern(rng):
    """The reference test's exact configuration: 512-sample window, 8
    levels, slide 64 (MODWTSlidingWindowTest.java:14-17), db4."""
    wlen, level, step = 512, 8, 64
    sig = rng.standard_normal(wlen + 4 * step)
    sl = SlidingMODWT("db4", level, wlen)
    st = sl.init(sig[:wlen])
    for pos in range(wlen, sig.shape[0], step):
        st = sl.update(st, sig[pos : pos + step])
    # db4 L_8 - 1 = 3*255 = 765 > 512: at depth 8 no window column is
    # wrap-free, so compare the causal stream against a causal oracle
    # instead — modwt of the FULL past returns the same causal interior
    full = np.asarray(modwt(jnp.asarray(sig), "db4", level))
    got = np.asarray(st.coeffs)
    n = sig.shape[0]
    for j in range(1, level + 1):
        s = interior_start("db4", j)
        if s >= n:
            continue
        cols = min(wlen, n - s)  # window columns whose full-signal twin is wrap-free
        np.testing.assert_allclose(
            got[j - 1, -cols:], full[j - 1, n - cols :], atol=1e-11,
            err_msg=f"W_{j} causal stream mismatch",
        )
    s = interior_start("db4", level)
    cols = min(wlen, n - s)
    np.testing.assert_allclose(got[level, -cols:], full[level, n - cols :], atol=1e-11)


def test_chunking_invariance(rng):
    """Feeding 96 samples as 96x1, 3x32, or 1x96 gives identical state."""
    wlen, level = 128, 3
    sig = rng.standard_normal(wlen + 96)
    base = sliding_modwt_init(jnp.asarray(sig[:wlen]), "db4", level)
    tail = sig[wlen:]
    variants = []
    for sizes in ([1] * 96, [32] * 3, [96]):
        st = base
        pos = 0
        for s in sizes:
            st = sliding_modwt_update(st, jnp.asarray(tail[pos : pos + s]), "db4", level)
            pos += s
        variants.append(st)
    for st in variants[1:]:
        np.testing.assert_allclose(
            np.asarray(st.coeffs), np.asarray(variants[0].coeffs), atol=1e-12
        )
        for a, b in zip(st.hist, variants[0].hist):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


@pytest.mark.slow
def test_batched_leading_axes(rng):
    sig = rng.standard_normal((4, 2, 200))
    st = sliding_modwt_init(jnp.asarray(sig[..., :128]), "haar", 4)
    st = sliding_modwt_update(st, jnp.asarray(sig[..., 128:]), "haar", 4)
    assert st.coeffs.shape == (4, 2, 5, 128)
    # spot-check one batch element against the unbatched path
    solo = sliding_modwt_init(jnp.asarray(sig[2, 1, :128]), "haar", 4)
    solo = sliding_modwt_update(solo, jnp.asarray(sig[2, 1, 128:]), "haar", 4)
    np.testing.assert_allclose(
        np.asarray(st.coeffs[2, 1]), np.asarray(solo.coeffs), atol=1e-12
    )


def test_chunk_larger_than_window(rng):
    wlen, level = 64, 3
    sig = rng.standard_normal(wlen + 200)
    st = sliding_modwt_init(jnp.asarray(sig[:wlen]), "db4", level)
    st = sliding_modwt_update(st, jnp.asarray(sig[wlen:]), "db4", level)
    assert st.coeffs.shape == (level + 1, wlen)
    check_interior(st, sig[-wlen:], "db4", level)


def test_validation_errors():
    with pytest.raises(JWaveFailure):
        sliding_modwt_init(jnp.zeros(16), "db4", 9)  # level > log2(16)
    with pytest.raises(JWaveFailure):
        SlidingMODWT("db4", 0, 64)
    sl = SlidingMODWT("db4", 3, 64)
    with pytest.raises(JWaveFailure):
        sl.init(jnp.zeros(32))  # wrong window length
