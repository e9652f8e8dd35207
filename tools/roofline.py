#!/usr/bin/env python3
"""Speed-of-light accounting for the headline bench rows (docs/PERFORMANCE.md).

For every headline workload this derives, from the algorithm itself:

  * ``bytes``  — the *minimum* HBM traffic: read each input once, write each
    output once (f32). Intermediates that XLA keeps in VMEM/registers are
    not charged; if a path spills, achieved GB/s can exceed this estimate's
    implied utilisation (it never flatters the kernel).
  * ``flops``  — the FLOPs the chosen formulation actually issues (FMA = 2).
    For MXU tile formulations that includes the structural zeros in the
    banded weight tiles — the systolic array multiplies them regardless, so
    they are real issue slots, and charging them is what makes %peak honest.

and combines them with a measured per-application time into achieved GB/s /
TFLOP/s, percent of the engine peak, and the speed-of-light time

    t_SoL = max(bytes / BW_peak, flops / FLOPS_peak)

Peaks assumed (TPU v5e, public figures):
  HBM        819 GB/s
  MXU bf16   197 TFLOP/s; f32 via HIGHEST = 6-pass bf16 -> 197/6 = 32.8
  VPU f32    ~7.7 TFLOP/s (8x128 lanes x 4 ALUs x 2 FLOP/FMA @ 940 MHz)

Measured times default to the round-2 bench (python bench.py on the v5e);
pass ``--times file.json`` with ``{"workload": ms}`` or a BENCH_r*.json to
re-evaluate, and ``--markdown`` for the PERFORMANCE.md table.
"""
from __future__ import annotations

import argparse
import json
import math
import sys

HBM_BW = 819e9
MXU_F32_HIGHEST = 197e12 / 6.0
MXU_BF16 = 197e12
VPU_F32 = 7.7e12

PEAKS = {"mxu": MXU_F32_HIGHEST, "mxu-bf16": MXU_BF16, "vpu": VPU_F32}

B, N = 64, 65536  # the 1D bench config
F32 = 4


def _rfft_flops(n: int) -> float:
    # real-input FFT ~ half a complex FFT's 5 n log2 n
    return 2.5 * n * math.log2(n)


def _cfft_flops(n: int) -> float:
    return 5.0 * n * math.log2(n)


def modwt_mxu_model():
    from jwave_tpu.ops.mxu_modwt import mxu_tile_count

    tiles = mxu_tile_count("db4", 5, N)
    rows = B * N // 128
    return {
        "flops": rows * tiles * 128 * 128 * 2,
        "bytes": F32 * B * N * (1 + 6),
        "engine": "mxu",
        "note": f"{tiles} banded 128x128 tiles (structural zeros charged)",
    }


def modwt_pallas_model():
    m, j = 8, 5  # db4 taps, levels; 2 subbands per level, FMA=2
    return {
        "flops": B * N * 2 * m * j * 2,
        "bytes": F32 * B * N * (1 + 6),
        "engine": "vpu",
        "note": "J levels x 2 subbands x M roll/FMA taps",
    }


def modwt_fft_model():
    j = 5
    mults = (j + 1) * (N // 2 + 1) * 6  # spectra pointwise (complex mul)
    return {
        "flops": B * (_rfft_flops(N) + (j + 1) * _rfft_flops(N) + mults),
        "bytes": F32 * B * N * (1 + 6),
        "engine": "vpu",
        "note": "1 rfft + (J+1) irfft (telescoped) + pointwise spectra",
    }


def fwt1d_model():
    # conv butterfly: M MACs per output, level lengths N, N/2, ... (8 levels)
    m, levels = 8, 8
    h_total = sum(N >> l for l in range(levels))
    return {
        "flops": B * h_total * m * 2,
        "bytes": F32 * B * N * 2,
        "engine": "mxu",
        "note": "stride-2 conv form; level lengths sum to ~2N",
    }


def fwt1d_mxu_model():
    # pair-tile matmul butterfly (ops.mxu_butterfly): per level of length h,
    # (B*h/256, 256)@(256, 256) + (B*h/256, 128)@(128, 256)  [db4: E=3]
    levels = 8
    per_h = 2 * 256 * (256 + 128) / 256  # flops per input sample
    h_total = sum(N >> l for l in range(levels) if (N >> l) % 256 == 0)
    h_conv = sum(N >> l for l in range(levels)) - h_total
    return {
        "flops": B * (h_total * per_h + h_conv * 8 * 2),
        "bytes": F32 * B * N * 2,
        "engine": "mxu",
        "note": "banded pair-tile matmuls (structural zeros charged)",
    }


def fwt2d_model():
    # separable 2048x2048 rectangle decomposition (ndim.forward_2d): a full
    # 6-level 1D FWT along each axis, the other axis batched
    n = 2048
    m, levels = 8, 6
    samples = 2 * n * sum(n >> l for l in range(levels))
    return {
        "flops": samples * m * 2,
        "bytes": F32 * n * n * 2,
        "engine": "mxu",
        "note": "full multi-level FWT per axis (rectangle decomposition)",
    }


def fwt3d_model():
    n, m, levels = 256, 8, 4
    samples = 3 * n * n * sum(n >> l for l in range(levels))
    return {
        "flops": samples * m * 2,
        "bytes": F32 * n**3 * 2,
        "engine": "mxu",
        "note": "full multi-level FWT per axis + 2 transposes",
    }


def wpt_model():
    # fused composite bank: 2^L filters of length (M-1)(2^L-1)+1, one
    # stride-2^L conv -> N outputs per signal x M_L MACs
    m_l = (8 - 1) * (2**6 - 1) + 1
    return {
        "flops": B * N * m_l * 2,
        "bytes": F32 * B * N * 2,
        "engine": "mxu",
        "note": f"noble-identity composite bank, M_L={m_l}",
    }


def wpt_mxu_model():
    # banded 128x128 tile matmuls over the composite bank (ops.mxu_wpt)
    from jwave_tpu.filters import get_filter
    from jwave_tpu.ops.mxu_wpt import _bank_for

    fb = get_filter("db4")
    e = _bank_for(fb.dec_lo, fb.dec_hi, 6, N).shape[0]
    rows = B * N // 128
    return {
        "flops": rows * e * 128 * 128 * 2,
        "bytes": F32 * B * N * 2,
        "engine": "mxu",
        "note": f"{e} banded 128x128 tiles (structural zeros charged)",
    }


def cwt_model():
    n, s = 1 << 20, 64
    mults = s * (n // 2 + 1) * 6
    return {
        "flops": _rfft_flops(n) + mults + s * _cfft_flops(n),
        "bytes": F32 * n + 8 * s * n,  # complex64 coefficients out
        "engine": "vpu",
        "note": "1 rfft + 64 pointwise + 64 complex iffts",
    }


# measured per-application times (ms), python bench.py on the v5e (f32,
# conv precision HIGHEST) — round 2, 2026-08-17
MEASURED_MS = {
    "modwt_db4_L5 (MXU tiles)": (0.531, modwt_mxu_model),
    "modwt_db4_L5 (Pallas cascade)": (2.030, modwt_pallas_model),
    "modwt_db4_L5 (telescoped FFT)": (3.756, modwt_fft_model),
    "fwt1d_db4_L8 (conv)": (1.355, fwt1d_model),
    "fwt1d_db4_L8 (MXU tiles)": (0.295, fwt1d_mxu_model),
    "fwt2d_db4_L6_2048": (0.590, fwt2d_model),
    "fwt3d_db4_L4_256": (4.227, fwt3d_model),
    "wpt_db4_L6 (fused conv)": (1.202, wpt_model),
    "wpt_db4_L6 (MXU tiles)": (0.285, wpt_mxu_model),
    "cwt_morlet_64scales_1M": (13.37, cwt_model),
}

BENCH_KEY_MAP = {
    "modwt_db4_L5": "modwt_db4_L5 (MXU tiles)",
    "modwt_db4_L5_pallas": "modwt_db4_L5 (Pallas cascade)",
    "modwt_db4_L5_fft": "modwt_db4_L5 (telescoped FFT)",
    "fwt1d_db4_L8": "fwt1d_db4_L8 (MXU tiles)",
    "fwt1d_db4_L8_conv": "fwt1d_db4_L8 (conv)",
    "fwt2d_db4_L6_2048": "fwt2d_db4_L6_2048",
    "fwt3d_db4_L4_256": "fwt3d_db4_L4_256",
    "wpt_db4_L6": "wpt_db4_L6 (MXU tiles)",
    "wpt_db4_L6_conv": "wpt_db4_L6 (fused conv)",
    "cwt_morlet_64scales_1M": "cwt_morlet_64scales_1M",
}


def rows(times=None):
    out = []
    for name, (default_ms, model) in MEASURED_MS.items():
        ms = (times or {}).get(name, default_ms)
        if ms is None:
            continue
        spec = model()
        t = ms * 1e-3
        gbs = spec["bytes"] / t / 1e9
        tfs = spec["flops"] / t / 1e12
        peak = PEAKS[spec["engine"]]
        t_sol = max(spec["bytes"] / HBM_BW, spec["flops"] / peak)
        out.append({
            "workload": name,
            "engine": spec["engine"],
            "ms": ms,
            "MB_min": spec["bytes"] / 1e6,
            "GFLOP": spec["flops"] / 1e9,
            "GBps": gbs,
            "pct_hbm": 100 * gbs * 1e9 / HBM_BW,
            "TFLOPs": tfs,
            "pct_engine": 100 * tfs * 1e12 / peak,
            "sol_ms": t_sol * 1e3,
            "pct_sol": 100 * t_sol / t,
            "bound": "HBM" if spec["bytes"] / HBM_BW >= spec["flops"] / peak else spec["engine"].upper(),
            "note": spec["note"],
        })
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--times", help="JSON of {workload: ms} or a BENCH_r*.json")
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args()

    times = {}
    if args.times:
        raw = json.load(open(args.times))
        details = raw.get("details", raw)
        for k, v in details.items():
            mapped = BENCH_KEY_MAP.get(k, k)
            if isinstance(v, dict) and "ms" in v:
                times[mapped] = v["ms"]
            elif isinstance(v, (int, float)):
                times[mapped] = v

    table = rows(times)
    if args.markdown:
        print("| Workload | Engine | ms | min MB | GFLOP | GB/s (%HBM) | TFLOP/s (%peak) | SoL ms | % SoL | Bound |")
        print("|---|---|---|---|---|---|---|---|---|---|")
        for r in table:
            print(
                f"| {r['workload']} | {r['engine']} | {r['ms']:.2f} | {r['MB_min']:.0f} "
                f"| {r['GFLOP']:.1f} | {r['GBps']:.0f} ({r['pct_hbm']:.0f}%) "
                f"| {r['TFLOPs']:.1f} ({r['pct_engine']:.0f}%) | {r['sol_ms']:.2f} "
                f"| {r['pct_sol']:.0f}% | {r['bound']} |"
            )
    else:
        json.dump(table, sys.stdout, indent=1)
        print()


if __name__ == "__main__":
    main()
