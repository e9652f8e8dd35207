"""Filter-bank registry tests (reference parity: WaveletBuilder + filter math)."""
import numpy as np
import pytest

import jwave_tpu as jw
from jwave_tpu.filters import available_filters, get_filter, junit_passing_filters


def test_registry_counts():
    names = available_filters()
    assert len(names) == 67
    fams = {}
    for n in names:
        fams.setdefault(get_filter(n).family, []).append(n)
    assert len(fams["daubechies"]) == 19  # Daubechies 2..20
    assert len(fams["symlets"]) == 19
    assert len(fams["coiflet"]) == 5
    assert len(fams["biorthogonal"]) == 15
    assert len(fams["legendre"]) == 3
    assert len(fams["haar"]) == 2
    assert len(fams["other"]) == 4


def test_junit_passing_subset_matches_reference():
    # reference create2arr registers 52 banks (WaveletBuilder.java:430-504)
    assert len(junit_passing_filters()) == 52


def test_builder_disabled_banks_still_creatable():
    # Battle 23 / CDF 5/3 / CDF 9/7 throw in the reference builder
    # (WaveletBuilder.java:363-385) but their tables ship here
    for name in ["Battle 23", "CDF 5/3", "CDF 9/7"]:
        fb = get_filter(name)
        assert not fb.in_builder
        assert fb.length % 2 == 1  # the odd lengths that break the reference


def test_aliases():
    assert get_filter("db4").name == "Daubechies 4"
    assert get_filter("haar").name == "Haar"
    assert get_filter("sym8").name == "Symlet 8"
    assert get_filter("coif2").name == "Coiflet 2"
    assert get_filter("bior3.5").name == "BiOrthogonal 3/5"
    assert get_filter("dmey").name == "Discrete Meyer"


def test_unknown_raises():
    with pytest.raises(jw.JWaveNotKnown):
        get_filter("not-a-wavelet")


def test_orthonormal_qmf_construction():
    """QMF relation from Wavelet.java:104-122: hi[i] = ±lo[M-1-i]."""
    for name in ["Haar", "Daubechies 4", "Symlet 8", "Coiflet 3"]:
        fb = get_filter(name)
        m = fb.length
        for i in range(m):
            expect = fb.dec_lo[m - 1 - i] * (1 if i % 2 == 0 else -1)
            assert fb.dec_hi[i] == pytest.approx(expect, abs=0)
        np.testing.assert_array_equal(fb.rec_lo, fb.dec_lo)
        np.testing.assert_array_equal(fb.rec_hi, fb.dec_hi)


def test_orthonormal_unit_energy():
    for fb in junit_passing_filters():
        if fb.family in ("haar", "daubechies", "symlets", "coiflet") and fb.name != "Haar orthogonal":
            assert np.sum(fb.dec_lo**2) == pytest.approx(1.0, abs=1e-8)
            assert np.sum(fb.dec_lo * fb.dec_hi) == pytest.approx(0.0, abs=1e-10)


def test_haar_exact_values():
    fb = get_filter("Haar")
    s = 1.0 / np.sqrt(2.0)
    np.testing.assert_allclose(fb.dec_lo, [s, s], atol=0)
    np.testing.assert_allclose(fb.dec_hi, [s, -s], atol=0)


def test_haar_orthogonal_recon_gain():
    fb = get_filter("Haar orthogonal")
    assert fb.recon_gain == 0.5
    np.testing.assert_array_equal(fb.dec_lo, [1.0, 1.0])


def test_db4_known_constants():
    """pywt db4 dec_lo values, which the reference's Daubechies4 class pins
    (daubechies/Daubechies4.java:48-62)."""
    fb = get_filter("Daubechies 4")
    assert fb.length == 8
    assert fb.dec_lo[0] == pytest.approx(-0.010597401784997278, abs=0)
    assert fb.dec_lo[7] == pytest.approx(0.23037781330885523, abs=0)
