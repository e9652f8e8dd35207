"""Shared infrastructure for the banded MXU tile kernels
(``mxu_modwt`` / ``mxu_butterfly`` / ``mxu_wpt``): one dot policy, one lane
constant, one backend/dtype auto-routing gate — so a change to the
precision policy or the TPU platform list lands in exactly one place.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

LANES = 128

#: backends whose default device is a TPU (``axon`` is a relayed TPU)
TPU_BACKENDS = ("tpu", "axon")


def dot(a, w, precision):
    """Last-axis x first-axis matmul with f32 accumulation for narrow
    dtypes (f64 stays f64 — the CPU correctness gates run the tile paths
    in full double via the config dial)."""
    return lax.dot_general(
        a, w, (((a.ndim - 1,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=a.dtype if a.dtype == jnp.float64 else jnp.float32,
    )


def auto_backend_ok(x) -> bool:
    """'auto' routing half of every eligibility gate: only TPU backends
    profit from the tile formulations, and only for MXU-native dtypes —
    keeping CPU f64 on the conv/FFT forms preserves golden numerics."""
    import jax

    return jax.default_backend() in TPU_BACKENDS and x.dtype in (
        jnp.float32,
        jnp.bfloat16,
    )
