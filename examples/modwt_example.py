"""MODWT multi-resolution analysis and denoising.

Equivalent of reference examples/MODWTExample.java:33 — decompose a noisy
signal, inspect per-level energies, zero the finest detail level, and
reconstruct.
"""
import numpy as np

import jwave_tpu as jw


def main():
    rng = np.random.default_rng(7)
    n = 777  # arbitrary length — MODWT does not need powers of two
    t = np.linspace(0, 4 * np.pi, n)
    clean = np.sin(t) + 0.5 * np.sin(5 * t)
    noisy = clean + 0.35 * rng.standard_normal(n)

    m = jw.MODWTTransform("Daubechies 4")
    level = 5
    coeffs = np.array(m.forward_modwt(noisy, level))  # (J+1, N): [W_1..W_J, V_J]

    print(f"MODWT db4, {level} levels on N={n}")
    for j in range(level):
        print(f"  W_{j+1} energy: {np.sum(coeffs[j]**2):8.2f}")
    print(f"  V_{level} energy: {np.sum(coeffs[level]**2):8.2f}")

    # denoise: zero the two finest detail levels
    coeffs[0] = 0.0
    coeffs[1] = 0.0
    denoised = np.asarray(m.inverse_modwt(coeffs))
    print(f"noisy  MSE vs clean: {np.mean((noisy - clean) ** 2):.4f}")
    print(f"denoise MSE vs clean: {np.mean((denoised - clean) ** 2):.4f}")

    # perfect reconstruction check
    full = m.forward_modwt(noisy, level)
    rec = np.asarray(m.inverse_modwt(full))
    print(f"perfect reconstruction error: {np.max(np.abs(rec - noisy)):.2e}")


if __name__ == "__main__":
    main()
