"""Exact ΔF = ln(Z_B/Z_A) by direct quadrature — the oracle that exposed
the reference's inverted Hastings correction.

Computes the partition-function ratio of the all-in-B vs all-in-A states
(all three particles inside the classification disk of radius 1.1*r0) by
uniform Monte-Carlo integration over disk^3 with the full LJ + double-well
energy.  The disk volumes cancel, so

    dF = ln Z_B - ln Z_A,    ln Z_X = logmeanexp(-beta U) + const.

For the standard system (V0 = [-10, -10.5], identical well shapes) the
answer is essentially beta * 3 * 0.5 = 1.5 (measured 1.490 with M = 4e6).

The reference's ``nf_big_move`` (monte_carlo.py:264-268) computes the MH
ratio with the proposal correction inverted (q_new/q_old instead of
q_old/q_new); sampling with that ratio converges to dF ~ 0.66 on this
system, sampling with the corrected ratio converges to ~1.49.

Usage: python tools/exact_free_energy.py [--samples 4000000]
"""

from __future__ import annotations

import argparse

import numpy as np

L = 10.0
R0, K_STEEP = 1.2, 15.0
V0 = (-10.0, -10.5)
RADIUS = 1.1 * R0
CENTERS = {"A": np.array([L / 4, L / 2]), "B": np.array([3 * L / 4, L / 2])}
BETA = 1.0


def _wells(p: np.ndarray) -> np.ndarray:
    v = np.zeros(len(p))
    for w, c in enumerate([CENTERS["A"], CENTERS["B"]]):
        d = p - c
        d -= L * np.round(d / L)
        r = np.hypot(d[:, 0], d[:, 1])
        v += V0[w] * (1 - 0.5 * (1 + np.tanh(K_STEEP * (r - R0))))
    return v


def _lj(r: np.ndarray) -> np.ndarray:
    out = np.zeros_like(r)
    m = r <= 2.5
    sr6 = (1.0 / r[m]) ** 6
    shift = 4 * ((1 / 2.5) ** 12 - (1 / 2.5) ** 6)
    out[m] = 4 * (sr6 * sr6 - sr6) - shift
    out[r < 0.5] = np.inf
    return out


def log_partition(region: str, m: int, rng: np.random.Generator) -> float:
    """logmeanexp(-beta U) over disk^3 uniform samples (+const, cancels).

    ``region`` is either a single well name ("A"/"B": all three particles
    in that well) or a 3-letter assignment pattern like "AAB" (sector
    quadrature — used by ``exact_sector_probs``).
    """
    assign = region * 3 if region in CENTERS else region
    pts = []
    for a in assign:
        c = CENTERS[a]
        u = rng.random(m)
        th = rng.random(m) * 2 * np.pi
        rr = RADIUS * np.sqrt(u)
        pts.append(np.stack([c[0] + rr * np.cos(th),
                             c[1] + rr * np.sin(th)], 1))
    U = np.zeros(m)
    for i in range(3):
        U += _wells(pts[i])
        for j in range(i + 1, 3):
            d = pts[i] - pts[j]
            d -= L * np.round(d / L)
            U += _lj(np.hypot(d[:, 0], d[:, 1]))
    w = -BETA * U
    # hard-core overlaps contribute ZERO weight but must stay in the
    # denominator of the uniform average: dropping them (round-1 version)
    # shrinks the sample count and inflates crowded sectors, where close
    # pairs are more likely (3 pairs in a pure sector vs 1 in a split
    # sector -> ~20% vs ~7% overlap rate at this disk radius).  The
    # pure-sector RATIO ln(Z_B/Z_A) was unaffected (both have 3 pairs);
    # the SECTOR weights were off by ~20% until parallel tempering —
    # a flow-free, adaptation-free sampler — disagreed and exposed it.
    finite = np.isfinite(w)
    m0 = w[finite].max()
    vals = np.where(finite, np.exp(np.where(finite, w, m0) - m0), 0.0)
    return float(m0 + np.log(np.mean(vals)))


def exact_delta_f(samples: int = 4_000_000, seed: int = 0) -> float:
    rng = np.random.default_rng(seed)
    return log_partition("B", samples, rng) - log_partition("A", samples, rng)


def exact_sector_probs(samples: int = 2_000_000, seed: int = 0) -> dict:
    """Exact equilibrium probabilities of the four in-well SECTORS
    (AllA / 2A1B / 1A2B / AllB) by per-sector quadrature.

    Mixed sectors carry multiplicity 3 (choice of the singleton); the
    disk^3 volumes cancel.  Round-2 finding: at this system's parameters
    the split sectors hold ~79% of the equilibrium weight — plain MCMC
    and the A1 flow (trained on pure-sector data) never visit them, yet
    their PURE-sector ratio ln(Z_BBB/Z_AAA) = 1.490 is still unbiased;
    Algorithm 2's on-the-fly flow is the only sampler here that actually
    explores the full state space (RESULTS.md).
    """
    rng = np.random.default_rng(seed)
    lz = {}
    for pat, mult in [("AAA", 1), ("AAB", 3), ("ABB", 3), ("BBB", 1)]:
        lz[pat] = log_partition(pat, samples, rng) + np.log(mult)
    mx = max(lz.values())
    z = {k: np.exp(v - mx) for k, v in lz.items()}
    tot = sum(z.values())
    probs = {k: v / tot for k, v in z.items()}
    probs["dF_pure"] = lz["BBB"] - lz["AAA"]
    return probs


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--samples", type=int, default=4_000_000)
    parser.add_argument("--sectors", action="store_true",
                        help="also print the exact 4-sector probabilities")
    args = parser.parse_args()
    df = exact_delta_f(args.samples)
    print(f"EXACT dF = ln(Z_B/Z_A) = {df:.4f}")
    if args.sectors:
        p = exact_sector_probs(args.samples // 2)
        print("EXACT sector probabilities: "
              + ", ".join(f"{k}={p[k]:.4f}"
                          for k in ["AAA", "AAB", "ABB", "BBB"]))
