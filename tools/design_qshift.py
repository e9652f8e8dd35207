"""Design q-shift filters for the dual-tree complex wavelet transform.

Kingsbury's q-shift DTCWT (levels >= 2) needs ONE even-length orthonormal
lowpass filter whose group delay is a quarter sample off center: tree A
uses h(n), tree B its time reverse h(L-1-n), so the two trees differ by
exactly half a sample of delay and the pair (psi_a, psi_b) forms an
approximate Hilbert pair.

Rather than transcribing published coefficient tables, this tool DESIGNS
the filter: an orthonormal length-2K lowpass is parametrized EXACTLY by K
paraunitary-lattice rotation angles (perfect reconstruction holds for any
angles, to machine precision), and the angles are optimized for

  J = w_gd * group-delay flatness around tau = K - 3/4, |H|^4-weighted
            through pass AND transition bands
    + w_sb * stopband energy (|H| above 0.6 pi)
    + 50   * second-moment penalty |H'(pi)|^2

on the exact-first-vanishing-moment manifold (the last lattice angle is
pinned to pi/4 - sum(rest), which makes H(pi) = 0 to machine precision),
with scipy BFGS from many random restarts. The winning angles/filters are
embedded in jwave_tpu/filters/qshift.py; tests/test_dtcwt.py re-verifies
orthonormality, the delay split, and the resulting Hilbert-pair
analyticity on every run.

Usage: python tools/design_qshift.py [K]   (default K = 7 -> 14 taps)
"""
import sys

import numpy as np
from scipy.optimize import minimize


def lattice_filters(thetas: np.ndarray):
    """Orthonormal 2-channel filter pair from K lattice rotations.

    Polyphase matrix E(z) = R(t0) L(z) R(t1) L(z) ... R(t_{K-1}) with
    L = diag(1, z^-1); paraunitary by construction, so (h0, h1) is an
    orthonormal PR pair of length 2K for ANY angles.
    """
    k = thetas.shape[0]
    # E entries as coefficient arrays in z^-1, degree k-1
    e = np.zeros((2, 2, k))
    c, s = np.cos(thetas[0]), np.sin(thetas[0])
    e[0, 0, 0], e[0, 1, 0] = c, s
    e[1, 0, 0], e[1, 1, 0] = -s, c
    for t in thetas[1:]:
        # E <- E * L(z): second column delayed one step
        e[:, 1, 1:] = e[:, 1, :-1]
        e[:, 1, 0] = 0.0
        # E <- E * R(t)
        c, s = np.cos(t), np.sin(t)
        col0 = e[:, 0].copy()
        col1 = e[:, 1].copy()
        e[:, 0] = c * col0 - s * col1
        e[:, 1] = s * col0 + c * col1
    h0 = np.zeros(2 * k)
    h1 = np.zeros(2 * k)
    h0[0::2], h0[1::2] = e[0, 0], e[0, 1]
    h1[0::2], h1[1::2] = e[1, 0], e[1, 1]
    return h0, h1


def _response(h, omega):
    n = np.arange(h.shape[0])
    ph = np.exp(-1j * np.outer(omega, n))
    H = ph @ h
    N = ph @ (n * h)
    return H, N


def analyticity_db(h0, levels=5):
    """Negative/positive frequency energy ratio (dB) of the complex wavelet
    psi_a + i psi_b built by cascading tree A (h0) and tree B (reversed)."""
    n = 1 << 14
    ha, hb = h0, h0[::-1]
    g_a = np.zeros(n); g_a[: ha.shape[0]] = ha
    g_b = np.zeros(n); g_b[: hb.shape[0]] = hb
    # high-pass partners by alternating-flip
    f_a = np.zeros(n); f_a[: ha.shape[0]] = _altflip(ha)
    f_b = np.zeros(n); f_b[: hb.shape[0]] = _altflip(hb)
    Fa, Fb = np.fft.fft(g_a), np.fft.fft(g_b)
    # cascade: psi_hat ~ H1(w 2^{L-1}) prod_{j<L-1} H0(w 2^j)
    Pa = np.fft.fft(f_a * 1.0)
    Pb = np.fft.fft(f_b * 1.0)
    psi_a = np.ones(n, dtype=complex)
    psi_b = np.ones(n, dtype=complex)
    for j in range(levels - 1):
        psi_a = psi_a * _dilate(Fa, n, j)
        psi_b = psi_b * _dilate(Fb, n, j)
    psi_a = psi_a * _dilate(Pa, n, levels - 1)
    psi_b = psi_b * _dilate(Pb, n, levels - 1)
    z = psi_a + 1j * psi_b
    half = n // 2
    e_neg = np.sum(np.abs(z[half + 1 :]) ** 2)
    e_pos = np.sum(np.abs(z[1:half]) ** 2)
    return 10.0 * np.log10(e_neg / e_pos)


def _altflip(h):
    g = h[::-1].copy()
    g[1::2] *= -1.0
    return g


def _dilate(F, n, j):
    return F[(np.arange(n) << j) % n]


def full_thetas(free: np.ndarray, k: int) -> np.ndarray:
    """Pin the first vanishing moment exactly: for this lattice
    |H(pi)| = sqrt(2) |sin(sum(thetas) - pi/4)| (verified numerically),
    so fixing the last angle to pi/4 - sum(rest) makes H(pi) = 0."""
    th = np.empty(k)
    th[:-1] = free
    th[-1] = np.pi / 4 - free.sum()
    return th


def objective_vm(free, k, w_gd=4.0, w_sb=3.0, pass_hi=0.70, stop_lo=0.60):
    """Production objective: optimize on the exact-VM manifold with
    |H|^4-weighted group-delay flatness through the transition band (the
    analyticity of the cascade cares about delay wherever |H| is large,
    including around pi/2)."""
    h0, _ = lattice_filters(full_thetas(free, k))
    if h0.sum() < 0:
        h0 = -h0
    tau = k - 0.75
    om_pass = np.linspace(0.0, pass_hi * np.pi, 256)
    om_stop = np.linspace(stop_lo * np.pi, np.pi, 200)
    Hp, Np = _response(h0, om_pass)
    gd = np.real(Np / (Hp + 1e-12))
    j_gd = np.mean((gd - tau) ** 2 * np.abs(Hp) ** 4)
    Hs, _ = _response(h0, om_stop)
    j_sb = np.mean(np.abs(Hs) ** 2)
    sgn = (-1.0) ** np.arange(h0.shape[0])
    j_vm2 = ((np.arange(h0.shape[0]) * h0) @ sgn) ** 2
    return w_gd * j_gd + w_sb * j_sb + 50.0 * j_vm2


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    rng = np.random.default_rng(11)
    best = None
    for trial in range(200):
        x0 = rng.uniform(-np.pi / 2, np.pi / 2, k - 1)
        r = minimize(objective_vm, x0, args=(k,), method="BFGS",
                     options={"maxiter": 2500, "gtol": 1e-13})
        th = full_thetas(r.x, k)
        h0, _ = lattice_filters(th)
        if h0.sum() < 0:
            h0 = -h0
        db = analyticity_db(h0)
        if best is None or db < best[0]:
            best = (db, r.fun, h0, th)
    db, fun, h0, th = best
    print(f"K={k} taps={2*k}: objective {fun:.3e}, analyticity {db:.1f} dB")
    print("sum", h0.sum(), "norm", np.sum(h0**2))
    tau_check = np.real(_response(h0, np.asarray([0.1]))[1]
                        / _response(h0, np.asarray([0.1]))[0])
    print(f"group delay at 0.1 rad: {float(tau_check):.4f} (target {k - 0.75})")
    np.set_printoptions(precision=17, floatmode="fixed")
    print("h0 =", repr(h0))


if __name__ == "__main__":
    main()
