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


if __name__ == "__main__":
    main()
