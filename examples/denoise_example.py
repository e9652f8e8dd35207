"""Wavelet shrinkage denoising: universal vs SureShrink vs BayesShrink.

A practical superset of the reference's compressors (jwave/compressions/*):
MODWT decompose -> per-band threshold -> reconstruct, shift-invariant and
batched. Run anywhere:

    JAX_PLATFORMS=cpu python examples/denoise_example.py
"""
import numpy as np
import jax.numpy as jnp

from jwave_tpu.denoise import denoise


def main():
    rng = np.random.default_rng(0)
    n = 4096
    t = np.arange(n) / n

    # piecewise signal with sharp edges (where adaptive thresholds shine)
    clean = np.sign(np.sin(2 * np.pi * 20 * t)) + np.sin(2 * np.pi * 5 * t)
    noisy = clean + 0.4 * rng.standard_normal(n)
    print(f"noisy MSE: {np.mean((noisy - clean) ** 2):.4f}")

    for method in ("universal", "sure", "bayes"):
        for mode in ("soft", "hard"):
            out = np.asarray(denoise(jnp.asarray(noisy), "sym8", 5,
                                     mode=mode, method=method))
            mse = np.mean((out - clean) ** 2)
            print(f"  {method:9s}/{mode:4s}: MSE {mse:.4f}")

    # batched: denoise 8 channels at once (one compiled kernel)
    batch = clean + 0.4 * rng.standard_normal((8, n))
    out = np.asarray(denoise(jnp.asarray(batch), "sym8", 5, method="bayes"))
    print(f"batched (8, {n}) -> {out.shape}, "
          f"mean MSE {np.mean((out - clean) ** 2):.4f}")

    # 2D: shift-invariant image denoising over the separable MODWT grid
    from jwave_tpu.denoise import denoise_2d

    m = 128
    yy, xx = np.mgrid[0:m, 0:m] / m
    img = np.sin(4 * np.pi * xx) * np.cos(2 * np.pi * yy) + (xx > 0.5)
    noisy_img = img + 0.3 * rng.standard_normal((m, m))
    den = np.asarray(denoise_2d(jnp.asarray(noisy_img), "db4", 3, method="sure"))
    print(f"2D image: noisy MSE {np.mean((noisy_img - img) ** 2):.4f} -> "
          f"denoised {np.mean((den - img) ** 2):.4f}")


if __name__ == "__main__":
    main()
