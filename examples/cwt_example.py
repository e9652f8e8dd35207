"""CWT scalogram of a two-tone signal with the Morlet wavelet.

Equivalent of reference examples/CWTExample.java — identify two
oscillation frequencies from the scalogram ridge scales.
"""
import numpy as np

import jwave_tpu as jw


def main():
    fs = 1000.0
    n = 4096
    t = np.arange(n) / fs
    sig = np.sin(2 * np.pi * 25.0 * t) + 0.7 * np.sin(2 * np.pi * 120.0 * t)

    wav = jw.MorletWavelet(1.0, 1.0)
    scales = jw.generate_log_scales(1e-3, 0.2, 96)
    res = jw.cwt(sig, scales, wav, fs)

    sca = np.asarray(res.scalogram())
    # two ridges: scale a = fc / f
    order = np.argsort(sca)[::-1]
    found = []
    for idx in order:
        f = wav.center_frequency / scales[idx]
        if all(abs(f - g) > 10 for g in found):
            found.append(f)
        if len(found) == 2:
            break
    print(f"scalogram shape: {res.coefficients.shape}")
    print(f"detected frequencies: {sorted(round(f, 1) for f in found)} Hz (true: [25, 120])")
    print(f"magnitude range: [{float(np.min(res.magnitude())):.3f}, {float(np.max(res.magnitude())):.3f}]")


def inverse_demo():
    """Round-trip: scalogram back to the signal (superset — the reference
    cannot invert its CWT)."""
    fs, n = 1000.0, 4096
    t = np.arange(n) / fs
    sig = np.sin(2 * np.pi * 25.0 * t) + 0.7 * np.sin(2 * np.pi * 120.0 * t)
    wav = jw.MorletWavelet(1.0, 1.0)
    scales = jw.generate_log_scales(1e-3, 0.2, 96)
    res = jw.cwt(sig, scales, wav, fs, jw.PaddingType.PERIODIC)
    rec = np.asarray(jw.icwt(res, wav))
    print(f"icwt reconstruction max error: {np.max(np.abs(rec - sig)):.2e}")


if __name__ == "__main__":
    main()
    inverse_demo()
