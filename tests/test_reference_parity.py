"""Golden-vector parity against the reference's PyWavelets-generated test
data (reference src/test/resources/testdata/, produced by
scripts/generate_reference_data.py and generate_basic_reference.py).

These tests are skipped when the reference checkout is not present.
"""
import pathlib

import numpy as np
import jax.numpy as jnp
import pytest

import jwave_tpu as jw
from jwave_tpu.filters import get_filter

TESTDATA = pathlib.Path("/root/reference/src/test/resources/testdata")

pytestmark = pytest.mark.skipif(not TESTDATA.exists(), reason="reference testdata not available")


def load(fn):
    return np.array(
        [float(l) for l in (TESTDATA / fn).read_text().splitlines() if l.strip() and not l.startswith("#")]
    )


def test_haar_filters_bitexact():
    fb = get_filter("Haar")
    np.testing.assert_array_equal(fb.dec_lo, load("filter_haar_dec_lo.txt"))
    np.testing.assert_array_equal(fb.rec_lo, load("filter_haar_rec_lo.txt"))
    # high-pass: JWave's QMF convention (Wavelet.java:104-122) yields [s, -s];
    # PyWavelets' is the time-reversed negation [-s, s] — same subspace
    np.testing.assert_array_equal(fb.dec_hi, -load("filter_haar_dec_hi.txt")[::-1])
    np.testing.assert_array_equal(np.abs(fb.rec_hi), np.abs(load("filter_haar_rec_hi.txt")))


def test_daubechies_filters_bitexact():
    # the reference's generator labels pywt db1 as "db2" and db2 as "db4"
    # (generate_reference_data.py names by tap count)
    np.testing.assert_allclose(get_filter("Haar").dec_lo, load("filter_db2_dec_lo.txt"), atol=0)
    np.testing.assert_allclose(get_filter("Daubechies 2").dec_lo, load("filter_db4_dec_lo.txt"), atol=0)


def test_haar_level1_manual_vectors():
    """generate_basic_reference.py: analytic level-1 Haar on a simple input."""
    x = load("haar_simple_input.txt")
    approx = load("haar_level1_approx_manual.txt")
    detail = load("haar_level1_detail_manual.txt")
    y = np.asarray(jw.fwt(jnp.asarray(x), "Haar", 1))
    h = len(x) // 2
    np.testing.assert_allclose(y[:h], approx, atol=1e-10)
    np.testing.assert_allclose(y[h:], detail, atol=1e-10)


def test_haar_constant_input_roundtrip():
    x = load("haar_constant_input.txt")
    y = np.asarray(jw.fwt(jnp.asarray(x), "Haar"))
    np.testing.assert_allclose(np.asarray(jw.ifwt(jnp.asarray(y), "Haar")), x, atol=1e-10)


def test_fft_impulse_golden():
    x = load("fft_impulse_input.txt")
    want = load("fft_impulse_output_real.txt") + 1j * load("fft_impulse_output_imag.txt")
    got = np.asarray(jw.fft(jnp.asarray(x + 0j)))
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_fft_dc_golden():
    x = load("fft_dc_input.txt")
    want = load("fft_dc_output_real.txt") + 1j * load("fft_dc_output_imag.txt")
    got = np.asarray(jw.fft(jnp.asarray(x + 0j)))
    np.testing.assert_allclose(got, want, atol=1e-10)
