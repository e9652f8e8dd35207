"""Tour of the continuous wavelet families (Paul, DOG, Meyer).

Equivalent of reference examples/{PaulWaveletDemo,DOGWaveletExample,
MeyerWaveletExample}.java — evaluate each mother wavelet in time and
frequency and run a small CWT with each.
"""
import numpy as np

import jwave_tpu as jw


def main():
    fs, n = 100.0, 512
    t = np.arange(n) / fs
    sig = np.sin(2 * np.pi * 5.0 * t) * np.exp(-((t - 2.5) ** 2))

    for wav in [jw.PaulWavelet(4), jw.DOGWavelet(2), jw.DOGWavelet(6), jw.MeyerWavelet(),
                jw.MexicanHatWavelet(1.0)]:
        lo, hi = wav.effective_support()
        blo, bhi = wav.bandwidth()
        tt = np.linspace(lo, hi, 7)
        vals = np.asarray(wav.psi(tt))
        res = jw.cwt(sig, jw.generate_log_scales(0.01, 1.0, 16), wav, fs)
        peak = float(np.max(np.asarray(res.magnitude())))
        print(f"{wav.name:<16} support=[{lo:6.2f},{hi:6.2f}] band=[{blo:.3f},{bhi:.3f}] Hz "
              f"fc={wav.center_frequency:.3f} |psi(0)|={abs(vals[3]):.3f} cwt_peak={peak:.3f}")


if __name__ == "__main__":
    main()
