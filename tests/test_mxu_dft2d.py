"""ops.mxu_dft2d — support-restricted 2D inverse-DFT magnitude as matmuls.

Gates: circular box extraction (incl. wrap-around), and exactness of
|E0y @ S @ E0x|/(PyPx) against |ifft2| when the spectrum truly lives on
the box (f64 CPU backend).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from jwave_tpu.ops.mxu_dft2d import (
    box_ifft2_mag,
    circular_box,
    filter_box,
    roll_box,
)

RNG = np.random.default_rng(20260820)


class TestCircularBox:
    def test_plain_interval(self):
        m = np.zeros(16, dtype=bool)
        m[5:9] = True
        assert circular_box(m) == (5, 4)

    def test_wraparound_interval(self):
        m = np.zeros(16, dtype=bool)
        m[14:] = True
        m[:3] = True
        assert circular_box(m) == (14, 5)

    def test_all_true_and_single(self):
        assert circular_box(np.ones(8, dtype=bool)) == (0, 8)
        m = np.zeros(8, dtype=bool)
        m[3] = True
        assert circular_box(m) == (3, 1)

    def test_filter_box_covers_support(self):
        # Gaussian bump near the wrap corner: box must cover > eps support
        py, px = 64, 64
        fy, fx = np.meshgrid(np.arange(py), np.arange(px), indexing="ij")
        g = np.exp(-(((fy - 62) % py - 0) ** 2 + ((fx - 1) % px) ** 2) / 8.0)
        # recentre distances circularly
        dy = np.minimum((fy - 62) % py, (62 - fy) % py)
        dx = np.minimum((fx - 1) % px, (1 - fx) % px)
        g = np.exp(-(dy**2 + dx**2) / 8.0)
        r0, dyy, c0, dxx = filter_box(g, eps=1e-6)
        mask = g > 1e-6 * g.max()
        rows = ((np.arange(py) - r0) % py) < dyy
        cols = ((np.arange(px) - c0) % px) < dxx
        assert mask[~rows, :].max(initial=0) == 0
        assert mask[:, ~cols].max(initial=0) == 0


class TestBoxIfft2Mag:
    @pytest.mark.parametrize("box", [(0, 8, 0, 8), (28, 8, 60, 8), (10, 5, 3, 7)])
    def test_matches_full_ifft2(self, box):
        py, px = 32, 64
        r0, dy, c0, dx = box
        spec = np.zeros((2, py, px), dtype=np.complex128)
        blk = RNG.standard_normal((2, dy, dx)) + 1j * RNG.standard_normal((2, dy, dx))
        for i in range(dy):
            for j in range(dx):
                spec[:, (r0 + i) % py, (c0 + j) % px] = blk[:, i, j]
        want = np.abs(np.fft.ifft2(spec))
        S = roll_box(jnp.asarray(spec), box)
        got = np.asarray(
            box_ifft2_mag(jnp.real(S), jnp.imag(S), py, px)
        )
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_batched_leading_axes(self):
        py = px = 16
        spec = RNG.standard_normal((3, 2, py, px)) + 1j * RNG.standard_normal((3, 2, py, px))
        box = (0, py, 0, px)  # full-grid box degenerates to the plain iDFT
        S = jnp.asarray(spec)
        got = np.asarray(box_ifft2_mag(jnp.real(S), jnp.imag(S), py, px))
        np.testing.assert_allclose(got, np.abs(np.fft.ifft2(spec)), atol=1e-12)
