"""Precision and platform policy.

The reference computes in Java ``double`` everywhere. On TPU the native
matmul/conv path is float32/bfloat16; float64 runs (for bit-level validation
against the reference's PyWavelets-derived golden vectors) use the CPU
backend or x64 emulation. Correctness gates in tests/ run in float64 on CPU;
throughput benchmarks run float32 on TPU — see SURVEY.md §7 "Hard parts".
"""
from __future__ import annotations

import jax


def enable_x64(enabled: bool = True):
    """Enable float64 semantics process-wide (call before tracing)."""
    jax.config.update("jax_enable_x64", enabled)


def default_real_dtype():
    import jax.numpy as jnp

    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def default_complex_dtype():
    import jax.numpy as jnp

    return jnp.complex128 if jax.config.jax_enable_x64 else jnp.complex64


_CONV_PRECISION = "highest"


def set_conv_precision(name: str):
    """Matmul/conv precision on TPU MXUs: 'highest' (true float32 via 6-pass
    bf16 — the default; perfect-reconstruction claims hold), 'high' (3-pass
    bf16, ~1e-4 error, ~2x faster), or 'default' (single-pass bf16, ~1e-2
    error, fastest). CPU is unaffected (always exact float32/float64)."""
    global _CONV_PRECISION
    if name not in ("default", "high", "highest"):
        raise ValueError(f"unknown precision {name!r}")
    _CONV_PRECISION = name


def conv_precision():
    import jax.lax as lax

    return {
        "default": lax.Precision.DEFAULT,
        "high": lax.Precision.HIGH,
        "highest": lax.Precision.HIGHEST,
    }[_CONV_PRECISION]


_MXU_DFT = "auto"


def set_mxu_dft(mode: str):
    """Route small fixed-length DFTs (Wigner-Ville lag transforms,
    scattering fft2 units) through dense MXU matmuls (ops.mxu_dft):
    'auto' (TPU backends, N <= 512, f32/c64 — the default; the matmul
    form measured faster than the XLA FFT engine there), 'on' (force on
    any backend/dtype — tests use this on the f64 CPU backend), or 'off'
    (always the XLA FFT form)."""
    global _MXU_DFT
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"unknown mxu_dft mode {mode!r}")
    _MXU_DFT = mode


def mxu_dft() -> str:
    return _MXU_DFT


_MXU_BUTTERFLY = "auto"


def set_mxu_butterfly(mode: str):
    """Route the FWT/WPT butterfly through MXU tile matmuls
    (ops.mxu_butterfly): 'auto' (TPU backends, f32/bf16, lane-aligned
    lengths — the default), 'on' (force on any backend/dtype — tests use
    this on the f64 CPU backend), or 'off' (always the XLA conv form)."""
    global _MXU_BUTTERFLY
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"unknown mxu_butterfly mode {mode!r}")
    _MXU_BUTTERFLY = mode


def mxu_butterfly() -> str:
    return _MXU_BUTTERFLY
