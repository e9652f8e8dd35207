"""Incremental sliding-window MODWT analysis.

The reference exercises sliding-window analysis by recomputing
forwardMODWT per window (MODWTSlidingWindowTest.java:17-98). Here the
window advances incrementally: each new chunk costs O(S*M*J) work
regardless of the window length, and the state's coefficient matrix is
always the current window's causal MODWT (exact on every wrap-free
column).

Scenario: monitor the per-band energy of a nonstationary signal — a tone
whose frequency jumps mid-stream — and watch the energy migrate between
detail levels as the jump slides through the window.

Run: PYTHONPATH=. python examples/sliding_window_example.py
"""
import numpy as np
import jax.numpy as jnp

import jwave_tpu as jw

FS = 1024.0
WINDOW = 512
LEVEL = 6
STEP = 64


def main():
    # 4 seconds: 40 Hz for the first half, 160 Hz for the second
    n = int(4 * FS)
    t = np.arange(n) / FS
    sig = np.where(t < 2.0, np.sin(2 * np.pi * 40.0 * t),
                   np.sin(2 * np.pi * 160.0 * t))
    sig += 0.1 * np.random.default_rng(0).standard_normal(n)

    sl = jw.SlidingMODWT("db4", LEVEL, WINDOW)
    state = sl.init(jnp.asarray(sig[:WINDOW]))

    # level j covers ~[FS/2^(j+1), FS/2^j]: 40 Hz -> level 4, 160 Hz -> level 2
    print(f"{'t (s)':>6} | " + " | ".join(f"W{j:<2}" for j in range(1, LEVEL + 1)))
    for pos in range(WINDOW, n, STEP):
        state = sl.update(state, jnp.asarray(sig[pos : pos + STEP]))
        if (pos // STEP) % 8 == 0:
            # energy of each detail band over the current window
            e = np.mean(np.asarray(state.coeffs[:LEVEL]) ** 2, axis=-1)
            bars = " | ".join(f"{v:4.2f}" for v in e)
            print(f"{pos / FS:6.2f} | {bars}")

    # the final window is pure 160 Hz: its energy lives at level 2
    e = np.mean(np.asarray(state.coeffs[:LEVEL]) ** 2, axis=-1)
    assert e.argmax() == 1, e  # W2 (index 1) dominates
    print("\nfinal window dominated by W2 (160 Hz band) — as expected")


if __name__ == "__main__":
    main()
