#!/usr/bin/env python3
"""Generate golden regression vectors (float64, CPU backend) into
tests/golden.npz.

These pin the *current, reference-validated* outputs of every transform on
fixed inputs so that future optimization rounds cannot silently change
numerics. (The reference does the same with PyWavelets-generated files,
scripts/generate_reference_data.py.)  Regenerate ONLY after an intentional
semantic change, and say so in the commit.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jwave_tpu as jw


def main():
    rng = np.random.default_rng(20260817)
    x64 = rng.standard_normal(64)
    x100 = rng.standard_normal(100)
    img = rng.standard_normal((16, 32))

    out = {"x64": x64, "x100": x100, "img": img}
    for name in ["Haar", "Daubechies 4", "Symlet 8", "Coiflet 3", "BiOrthogonal 3/5"]:
        key = name.replace(" ", "_").replace("/", "_")
        out[f"fwt_{key}"] = np.asarray(jw.fwt(x64, name))
        out[f"wpt_{key}"] = np.asarray(jw.wpt(x64, name, 3))
    out["modwt_db4_L3"] = np.asarray(jw.modwt(x100, "db4", 3))
    out["modwt_haar_L4_direct"] = np.asarray(
        jw.modwt(x100, "Haar", 4, method=jw.ConvolutionMethod.DIRECT)
    )
    out["shifting_haar"] = np.asarray(jw.shifting_forward(x100, "Haar"))
    out["aed_db2"] = np.asarray(jw.aed_forward(x100, lambda c: jw.fwt(c, "db2")))
    res = jw.cwt(x64, [2.0, 4.0, 8.0], jw.MorletWavelet(1.0, 1.0), 1.0)
    out["cwt_morlet_re"] = np.asarray(res.coefficients.real)
    out["cwt_morlet_im"] = np.asarray(res.coefficients.imag)
    out["fwt2d_db2"] = np.asarray(
        jw.TransformBuilder.create("Fast Wavelet Transform", "db2").forward(img)
    )
    out["dft_x64"] = np.asarray(jw.fft(x64 + 0j)).view(np.float64)

    path = os.path.join(os.path.dirname(__file__), "..", "tests", "golden.npz")
    np.savez_compressed(os.path.abspath(path), **out)
    print(f"wrote {len(out)} arrays -> {os.path.abspath(path)}")


if __name__ == "__main__":
    main()
