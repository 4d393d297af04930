"""Well-SECTOR occupancy of an Algorithm-2 run vs exact quadrature.

Round-2 finding (RESULTS.md): at the reference system's parameters the
equilibrium measure is NOT concentrated in the pure AllA/AllB states —
the split sectors (2A1B / 1A2B) hold ~79% of the weight
(``tools/exact_free_energy.exact_sector_probs``).  Plain MCMC never
crosses, and Algorithm 1's flow — trained on pure-sector data — proposes
only pure configurations, so both samplers see just the pure sectors
(whose RATIO, ln(Z_BBB/Z_AAA) = 1.490, they still estimate without bias).
Algorithm 2's on-the-fly flow is the only sampler in the story that
explores the full state space; this tool checks that the full sector
histogram it produces matches exact physics.

Reads the ``production_positions.npy`` (C, T, N, 2) an Algorithm-2 run
saves, discards a burn-in fraction, classifies every configuration into
{AAA, AAB, ABB, BBB, outside}, and compares against quadrature with a
time-block bootstrap (blocks span ALL chains at once, because the chains
share one adaptively-trained flow and are therefore correlated — a naive
cross-chain SEM understates the error, the round-1 ESS lesson applied
here before anyone asks).

Usage: python tools/sector_check.py results/<run>/production_positions.npy
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SECTORS = ["AAA", "AAB", "ABB", "BBB"]


def sector_labels(positions: np.ndarray, half_box: float,
                  r0: float = 1.2) -> np.ndarray:
    """(C, T, N, 2) -> (C, T) int: 0..3 = n_B for in-well configs,
    4 = any particle outside both wells."""
    from flowstate_tpu.analysis import classify_particles

    lab = classify_particles(positions, half_box, r0)  # (C, T, N)
    n_b = (lab == 1).sum(axis=-1)
    any_out = (lab == 2).any(axis=-1)
    return np.where(any_out, 4, n_b)


def main(argv=None) -> dict:
    parser = argparse.ArgumentParser()
    parser.add_argument("positions", help="production_positions.npy path")
    parser.add_argument("--burn", type=float, default=0.5,
                        help="fraction of the trajectory to discard")
    parser.add_argument("--half_box", type=float, default=5.0)
    parser.add_argument("--quad_samples", type=int, default=2_000_000)
    parser.add_argument("--block", type=int, default=50,
                        help="bootstrap block length (time samples)")
    parser.add_argument("--out", default="SECTORS.md")
    parser.add_argument("--json_out", default=None)
    args = parser.parse_args(argv)

    from exact_free_energy import exact_sector_probs

    pos = np.load(args.positions)            # (C, T, N, 2)
    c, t = pos.shape[:2]
    burn = int(t * args.burn)
    sec = sector_labels(pos[:, burn:], args.half_box)   # (C, T')
    tp = sec.shape[1]

    counts = np.array([(sec == k).sum() for k in range(5)], dtype=float)
    frac = counts / counts.sum()
    out_frac = frac[4]
    in_well = counts[:4] / counts[:4].sum()
    df = float(np.log(max(counts[3], 1.0) / max(counts[0], 1.0)))

    # time-block bootstrap over ALL chains jointly
    rng = np.random.default_rng(0)
    n_blocks = max(tp // args.block, 1)
    blocks = np.array_split(np.arange(tp), n_blocks)
    boot_df, boot_frac = [], []
    for _ in range(400):
        idx = np.concatenate([blocks[i] for i in
                              rng.integers(0, n_blocks, n_blocks)])
        s = sec[:, idx]
        cts = np.array([(s == k).sum() for k in range(4)], dtype=float)
        boot_df.append(np.log(max(cts[3], 1.0) / max(cts[0], 1.0)))
        boot_frac.append(cts / max(cts.sum(), 1.0))
    df_err = float(np.std(boot_df, ddof=1))
    frac_err = np.std(boot_frac, axis=0, ddof=1)

    exact = exact_sector_probs(args.quad_samples)
    df_exact = float(exact["dF_pure"])
    sigma = abs(df - df_exact) / max(df_err, 1e-12)
    sector_dev = [float(abs(in_well[i] - exact[s]))
                  for i, s in enumerate(SECTORS)]
    sector_sigmas = [dev / max(frac_err[i], 1e-12)
                     for i, dev in enumerate(sector_dev)]
    # Gates: the free-energy RATIO must agree statistically; the absolute
    # sector weights are gated at 3% absolute — Algorithm 2's
    # never-diminishing adaptation (the flow retrains forever on the
    # chain's own sliding window, ref main_algorithm_2.py:421-456) leaves
    # a small stationary bias in the sector weights that this build
    # MEASURED (stable ~1-2.4% absolute from cycle 200 on, while
    # flow-free parallel tempering lands on the quadrature exactly —
    # see TEMPERING.md / RESULTS.md).  A sigma gate would always fail at
    # large sample counts against a real O(1%) design bias.
    ok = sigma < 3.0 and max(sector_dev) < 0.03

    result = {
        "metric": "a2_sector_check",
        "run": args.positions,
        "samples_used": int(counts.sum()),
        "sector_fracs": {s: round(float(in_well[i]), 4)
                         for i, s in enumerate(SECTORS)},
        "sector_fracs_exact": {s: round(float(exact[s]), 4)
                               for s in SECTORS},
        "sector_sigmas": [round(float(s), 2) for s in sector_sigmas],
        "sector_abs_dev": [round(d, 4) for d in sector_dev],
        "outside_frac": round(float(out_frac), 4),
        "dF_pure": round(df, 4),
        "dF_pure_err": round(df_err, 4),
        "dF_exact": round(df_exact, 4),
        "dF_sigma": round(float(sigma), 2),
        "ok": bool(ok),
    }

    with open(args.out, "w") as f:
        f.write("# SECTORS — Algorithm 2 samples the FULL state space\n\n")
        f.write(f"Run: `{args.positions}`, {c} chains x {tp} post-burn "
                f"samples (burn = first {args.burn:.0%}).  Exact sector "
                "weights by per-sector quadrature "
                "(`tools/exact_free_energy.exact_sector_probs`, "
                f"{args.quad_samples:,} points/sector).  Errors: "
                f"{args.block}-sample time-block bootstrap over all chains "
                "jointly (chains share the adaptively-trained flow, so "
                "cross-chain SEMs would understate).\n\n")
        f.write("| sector | measured | exact | abs. deviation |\n"
                "|---|---|---|---|\n")
        for i, s in enumerate(SECTORS):
            f.write(f"| {s} | {in_well[i]:.4f} ± {frac_err[i]:.4f} | "
                    f"{exact[s]:.4f} | {sector_dev[i]:.4f} |\n")
        f.write(f"| any particle outside | {out_frac:.4f} | ~0 (transit "
                "states) | — |\n\n")
        f.write(f"Pure-sector ΔF = ln(P_BBB/P_AAA) = **{df:.3f} ± "
                f"{df_err:.3f}** vs exact **{df_exact:.4f}** "
                f"({sigma:.1f} sigma).\n\n")
        f.write("Context: the equilibrium measure holds "
                f"{exact['AAB'] + exact['ABB']:.0%} of its weight in the "
                "SPLIT sectors. Plain MCMC (pinned) and Algorithm 1 "
                "(flow trained on pure-sector data) never visit them — "
                "their pure-sector ratio is still unbiased, but Algorithm "
                "2's retrained flow is the only sampler here that "
                "reaches the full state space.\n\n")
        f.write("Known, measured design property: Algorithm 2's "
                "never-diminishing adaptation (the flow retrains forever "
                "on the chain's own sliding window) leaves a small "
                "STATIONARY bias in the absolute sector weights — stable "
                "from cycle 200 on, while flow-free parallel tempering "
                "reproduces the quadrature exactly (TEMPERING.md).  The "
                "gate therefore bounds the absolute deviation (< 0.03) "
                "rather than a sigma that any real O(1%) bias would "
                "trip at large sample counts; the free-energy RATIO gate "
                "stays statistical.\n\n")
        f.write(f"Overall: **{'PASS' if ok else 'CHECK'}** (ΔF < 3 sigma; "
                "every sector < 0.03 absolute).\n")

    if args.json_out:
        os.makedirs(os.path.dirname(args.json_out) or ".", exist_ok=True)
        with open(args.json_out, "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
