"""Pallas MODWT kernel correctness (interpreter mode on the CPU backend;
compiled-mode correctness is exercised on real TPU by bench.py and was
validated against the CPU float64 oracle)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import jwave_tpu as jw
from jwave_tpu.ops import pallas_modwt as pm

from jax.experimental import pallas as pl


def _run_interpret(kernel_builder, *args):
    with jax.disable_jit():
        return kernel_builder(*args)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **kw):
        kw.setdefault("interpret", True)
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", patched)
    monkeypatch.setattr(pm.pl, "pallas_call", patched)
    yield


@pytest.mark.parametrize("name", ["Haar", "db4"])
def test_pallas_modwt_matches_direct(name, rng):
    x = jnp.asarray(rng.standard_normal((4, 256)), dtype=jnp.float32)
    got = np.asarray(pm.modwt_pallas(x, name, 4))
    want = np.asarray(jw.modwt(x, name, 4, method=jw.ConvolutionMethod.DIRECT))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pallas_modwt_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 128)), dtype=jnp.float32)
    c = pm.modwt_pallas(x, "db4", 3)
    back = np.asarray(pm.imodwt_pallas(c, "db4"))
    np.testing.assert_allclose(back, np.asarray(x), atol=1e-5)


def test_pallas_modwt_odd_batch(rng):
    """Grid padding: batch not divisible by the row block."""
    x = jnp.asarray(rng.standard_normal((3, 128)), dtype=jnp.float32)
    got = np.asarray(pm.modwt_pallas(x, "Haar", 2))
    want = np.asarray(jw.modwt(x, "Haar", 2, method=jw.ConvolutionMethod.DIRECT))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pallas_modwt_non_pow2_lane_aligned(rng):
    """MODWT supports arbitrary N; the Pallas cascade only needs lane
    alignment (N % 128 == 0), not powers of two — rolls are mod-N."""
    x = jnp.asarray(rng.standard_normal((8, 384)), dtype=jnp.float32)
    got = np.asarray(pm.modwt_pallas(x, "db4", 3))
    want = np.asarray(jw.modwt(x, "db4", 3, method=jw.ConvolutionMethod.DIRECT))
    np.testing.assert_allclose(got, want, atol=1e-5)


# --------------------------------------------------------------------------
# synchrosqueezing reassignment kernel (ops/pallas_reassign.py)
# --------------------------------------------------------------------------

def test_pallas_reassign_matches_scatter(rng):
    from jwave_tpu.ops import pallas_reassign as pr

    # patch this module's pallas_call too (the autouse fixture patches pl)
    s, n, k_bins = 12, 300, 20  # deliberately unaligned: exercises padding
    contrib = jnp.asarray(
        rng.standard_normal((2, s, n)) + 1j * rng.standard_normal((2, s, n))
    ).astype(jnp.complex64)
    k_idx = jnp.asarray(rng.integers(0, k_bins + 1, (2, s, n)), dtype=jnp.int32)
    got = np.asarray(pr.reassign_pallas(contrib, k_idx, k_bins))
    want = np.zeros((2, k_bins, n), dtype=np.complex64)
    kn = np.asarray(k_idx)
    cn = np.asarray(contrib)
    for b in range(2):
        for si in range(s):
            for t in range(n):
                if kn[b, si, t] < k_bins:
                    want[b, kn[b, si, t], t] += cn[b, si, t]
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_pallas_reassign_in_ssq(rng):
    import jwave_tpu as jw

    fs, n = 1000.0, 512
    x = jnp.asarray(np.cos(2 * np.pi * 50.0 * np.arange(n) / fs), dtype=jnp.float32)
    scales = jw.generate_log_scales(0.002, 0.2, 32)
    a = jw.ssq_cwt(x, scales, "morlet", fs, reassign="scatter")
    b = jw.ssq_cwt(x, scales, "morlet", fs, reassign="pallas")
    np.testing.assert_allclose(np.asarray(b.Tx), np.asarray(a.Tx), atol=1e-5)


class TestFusedPyramid2D:
    """ops.pallas_pyramid — the fused two-pass 2D FWT (interpreter mode;
    compiled-mode numbers are recorded per round by bench.py on real TPU)."""

    @pytest.mark.parametrize("wavelet,levels", [("Haar", 3), ("db4", 4), ("sym8", 2)])
    def test_matches_separable_path(self, wavelet, levels, rng):
        from jax.experimental.pallas import tpu as pltpu

        from jwave_tpu.ops.pallas_pyramid import fwt2d_fused
        from jwave_tpu.transforms.fwt import fwt
        from jwave_tpu.transforms.ndim import forward_2d

        x = jnp.asarray(rng.standard_normal((512, 1024)), dtype=jnp.float32)
        ref = forward_2d(lambda v, l: fwt(v, wavelet, l), x, levels, levels)
        with pltpu.force_tpu_interpret_mode():
            got = fwt2d_fused(x, wavelet, levels, levels)
        scale = float(jnp.max(jnp.abs(ref)))
        assert float(jnp.max(jnp.abs(got - ref))) < 2e-6 * scale

    @pytest.mark.slow
    def test_grad_is_linear_transpose(self, rng):
        from jax.experimental.pallas import tpu as pltpu

        from jwave_tpu.ops.pallas_pyramid import fwt2d_fused
        from jwave_tpu.transforms.fwt import fwt
        from jwave_tpu.transforms.ndim import forward_2d

        x = jnp.asarray(rng.standard_normal((512, 512)), dtype=jnp.float32)
        w = jnp.asarray(rng.standard_normal((512, 512)), dtype=jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            g = jax.grad(lambda m: jnp.sum(fwt2d_fused(m, "db4", 3, 3) * w))(x)
        g_ref = jax.grad(lambda m: jnp.sum(
            forward_2d(lambda v, l: fwt(v, "db4", l), m, 3, 3) * w))(x)
        assert float(jnp.max(jnp.abs(g - g_ref))) < 2e-5 * float(jnp.max(jnp.abs(g_ref)))

    def test_public_fwt2d_fallback_matches(self, rng):
        # CPU backend: public fwt2d routes to the separable path
        import jwave_tpu as jw

        x = jnp.asarray(rng.standard_normal((128, 256)))
        from jwave_tpu.transforms.fwt import fwt
        from jwave_tpu.transforms.ndim import forward_2d

        ref = forward_2d(lambda v, l: fwt(v, "db4", l), x, 2, 2)
        np.testing.assert_allclose(np.asarray(jw.fwt2d(x, "db4", 2, 2)),
                                   np.asarray(ref), atol=1e-12)
        back = jw.ifwt2d(ref, "db4", 2, 2)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-10)


class TestFusedPyramid1D:
    """ops.pallas_pyramid.fwt1d_fused — the batched-rows whole-pyramid
    kernel transforms.fwt routes to on TPU (interpreter mode here)."""

    @pytest.mark.parametrize("shape,lvl,wav", [
        ((16, 4096), 6, "db4"), ((4, 2, 2048), 5, "sym8"), ((16, 1024), 10, "Haar"),
    ])
    def test_matches_xla_pyramid(self, shape, lvl, wav, rng):
        from jax.experimental.pallas import tpu as pltpu

        from jwave_tpu.filters import get_filter
        from jwave_tpu.ops.mxu_pyramid import fwt_forward_fused
        from jwave_tpu.ops.pallas_pyramid import fwt1d_fused

        x = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)
        ref = fwt_forward_fused(x, get_filter(wav), lvl)
        with pltpu.force_tpu_interpret_mode():
            got = fwt1d_fused(x, wav, lvl)
        scale = float(jnp.max(jnp.abs(ref)))
        assert float(jnp.max(jnp.abs(got - ref))) < 2e-6 * scale

    def test_grad_matches(self, rng):
        from jax.experimental.pallas import tpu as pltpu

        from jwave_tpu.filters import get_filter
        from jwave_tpu.ops.mxu_pyramid import fwt_forward_fused
        from jwave_tpu.ops.pallas_pyramid import fwt1d_fused

        x = jnp.asarray(rng.standard_normal((8, 2048)), dtype=jnp.float32)
        w = jnp.asarray(rng.standard_normal((8, 2048)), dtype=jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            g = jax.grad(lambda m: jnp.sum(fwt1d_fused(m, "db4", 4) * w))(x)
        g_ref = jax.grad(lambda m: jnp.sum(
            fwt_forward_fused(m, get_filter("db4"), 4) * w))(x)
        scale = float(jnp.max(jnp.abs(g_ref)))
        assert float(jnp.max(jnp.abs(g - g_ref))) < 2e-6 * scale

    def test_inverse_fused_roundtrip(self, rng):
        from jax.experimental.pallas import tpu as pltpu

        from jwave_tpu.ops.pallas_pyramid import fwt2d_fused, ifwt2d_fused

        x = jnp.asarray(rng.standard_normal((512, 1024)), dtype=jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            y = fwt2d_fused(x, "Daubechies 4", 4, 4)
            back = ifwt2d_fused(y, "Daubechies 4", 4, 4)
        assert float(jnp.max(jnp.abs(back - x))) < 1e-4

    def test_adaptive_br_wide_rows_match(self, rng):
        """Round 5: rows wider than the old 2048 hard cap shrink the row
        block (br 256 -> 128) instead of falling back — the kernel must
        stay exact at a non-default br."""
        from jax.experimental.pallas import tpu as pltpu

        from jwave_tpu.ops.pallas_pyramid import _pick_br2d, fwt2d_fused
        from jwave_tpu.transforms.fwt import fwt
        from jwave_tpu.transforms.ndim import forward_2d

        # width > 2048 drops to the 1 MB envelope (2 MB blocks at width
        # 4096 crashed the compile helper — hardware probe, round 5) and
        # br = 64 < 128 exercises the non-transposing narrow-block store
        assert _pick_br2d(512, 4096) == 64
        x = jnp.asarray(rng.standard_normal((512, 4096)), dtype=jnp.float32)
        ref = forward_2d(lambda v, l: fwt(v, "db4", l), x, 3, 3)
        with pltpu.force_tpu_interpret_mode():
            got = fwt2d_fused(x, "db4", 3, 3)
        scale = float(jnp.max(jnp.abs(ref)))
        assert float(jnp.max(jnp.abs(got - ref))) < 2e-6 * scale

    def test_peeled_hybrid_matches_fwt(self, rng):
        """Round 5: the long-row hybrid (XLA butterfly level 1 + fused
        VMEM pyramid for the rest) is the same operator as the plain
        pyramid."""
        from jax.experimental.pallas import tpu as pltpu

        from jwave_tpu.filters import get_filter
        from jwave_tpu.ops.mxu_pyramid import fwt_forward_fused
        from jwave_tpu.transforms.fwt import _fwt_peeled

        fb = get_filter("db4")
        x = jnp.asarray(rng.standard_normal((8, 4096)), dtype=jnp.float32)
        ref = fwt_forward_fused(x, fb, 6)
        for peel in (1, 2):
            with pltpu.force_tpu_interpret_mode():
                got = _fwt_peeled(x, fb, 6, peel)
            scale = float(jnp.max(jnp.abs(ref)))
            assert float(jnp.max(jnp.abs(got - ref))) < 2e-6 * scale, peel

    def test_long_filter_bank_routes_to_xla(self, rng):
        """Round-5 advice: a hypothetical >3-tile filter bank must fail
        eligibility instead of tripping the kernel-weight assert."""
        import numpy as _np

        from jwave_tpu.filters import get_filter
        from jwave_tpu.ops.pallas_pyramid import _bank_ok, peel_levels_for_vmem, pyramid1d_eligible

        class FakeBank:
            dec_lo = _np.ones(200) / 200.0
            dec_hi = _np.ones(200) / 200.0
            rec_lo = dec_lo
            rec_hi = dec_hi

        assert _bank_ok(get_filter("db4"))
        assert not _bank_ok(FakeBank())
        x = jnp.zeros((16, 4096), dtype=jnp.float32)
        assert not pyramid1d_eligible(x, FakeBank())
        assert peel_levels_for_vmem(x, FakeBank()) is None

    def test_inverse_matches_separable(self, rng):
        from jax.experimental.pallas import tpu as pltpu

        from jwave_tpu.ops.pallas_pyramid import ifwt2d_fused
        from jwave_tpu.transforms.fwt import ifwt
        from jwave_tpu.transforms.ndim import reverse_2d

        y = jnp.asarray(rng.standard_normal((512, 512)), dtype=jnp.float32)
        ref = reverse_2d(lambda v, l: ifwt(v, "sym8", l), y, 3, 3)
        with pltpu.force_tpu_interpret_mode():
            got = ifwt2d_fused(y, "sym8", 3, 3)
        scale = float(jnp.max(jnp.abs(ref)))
        assert float(jnp.max(jnp.abs(got - ref))) < 2e-6 * scale
