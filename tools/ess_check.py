"""ESS/s on the SLOW observable (well occupancy): hybrid vs plain MCMC.

bench.py's ESS/s is computed on the energy series — a *fast* observable
that plain Metropolis decorrelates fine.  The scientific reason this
framework exists is the slow observable: which well the configuration
occupies (wells ~10 k_BT deep; reference main_mcmc_only.py's whole point).
This tool measures, on the real TPU, the effective-sample-size rate of the
per-chain well-state label for

  (a) plain batched Metropolis (the reference's baseline, main_mcmc_only.py),
  (b) the NF-hybrid sampler (local moves + flow teleports,
      main_algorithm_1.py's testing schedule :375-422),

using identical chains, identical local-move budgets per recording round,
and the SAME Geyer estimator (analysis/ess.py).  Plain MCMC essentially
never crosses (PARITY.md: occupancies pinned at the init split), so its
well-state ESS is ~0 and the hybrid's ESS/s IS the capability, reported
alongside the ΔF sanity check vs the exact quadrature value 1.490.

Writes ESS.md and prints one JSON line.

Usage: python tools/ess_check.py [--chains 256] [--rounds 400]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from flowstate_tpu.analysis.ess import effective_sample_size
from flowstate_tpu.flows import build_circular_flow
from flowstate_tpu.mcmc import (
    init_alternating_wells, init_chain_state, nf_big_moves,
    run_equilibration, run_moves,
)
from flowstate_tpu.mcmc.hybrid import to_centered
from flowstate_tpu.ops import Box, SystemSpec
from flowstate_tpu.training import TrainConfig, train
from flowstate_tpu.utils.profiling import enable_compilation_cache

EXACT_DF = 1.490  # tools/exact_free_energy.py, M=4e6
WELL_RADIUS = 1.1 * 1.2  # classification circles (hybrid utils.py:104-141)


def well_counts(spec: SystemSpec, positions: jnp.ndarray):
    """(C, N, 2) -> per-chain particle counts (n_A, n_B) within the
    classification circles (hybrid utils.py:104-141 semantics)."""
    lx, ly = spec.box.size_x, spec.box.size_y
    sizes = jnp.asarray([lx, ly])

    def count_in(center):
        d = positions - center
        d = d - sizes * jnp.round(d / sizes)
        return jnp.sum(jnp.linalg.norm(d, axis=-1) <= WELL_RADIUS, axis=-1)

    n_a = count_in(jnp.asarray([lx / 4, ly / 2]))
    n_b = count_in(jnp.asarray([3 * lx / 4, ly / 2]))
    return n_a, n_b


def well_state(spec: SystemSpec, positions: jnp.ndarray) -> jnp.ndarray:
    """(C, N, 2) -> (C,) float: 1 if the majority of particles sit in well
    B, 0 if in well A (the binary slow variable; within-well jitter does
    not flip it, so its autocorrelation measures barrier crossings only)."""
    n_a, n_b = well_counts(spec, positions)
    return (n_b > n_a).astype(jnp.float32)


def main(argv=None) -> dict:
    parser = argparse.ArgumentParser()
    parser.add_argument("--chains", type=int, default=256)
    parser.add_argument("--rounds", type=int, default=400)
    parser.add_argument("--moves_per_round", type=int, default=150)
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--out", default="ESS.md")
    args = parser.parse_args(argv)

    try:
        enable_compilation_cache()
    except Exception:
        pass

    c = args.chains
    spec = SystemSpec.create(3, Box.from_density(3, 0.03, 1.0), num_wells=2,
                             V0_list=(-10.0, -10.5), r0=1.2, k=15.0)
    beta = 1.0
    half_box = float(spec.box.size_x) / 2

    positions, _ = init_alternating_wells(c, 3, 0.03)
    state0 = init_chain_state(spec, jnp.asarray(positions), jax.random.key(0),
                              0.65)
    equil = jax.jit(jax.vmap(
        lambda s: run_equilibration(spec, beta, s, 5000, 500)))
    state0 = equil(state0)
    jax.device_get(state0.positions)  # sync (tunnel-safe)
    print(f"equilibrated {c} chains", flush=True)

    # ---- (a) plain Metropolis: rounds of local moves, record well state --
    @jax.jit
    def plain_round(s):
        s = jax.vmap(lambda t: run_moves(spec, beta, t, args.moves_per_round))(s)
        return s, well_state(spec, s.positions), s.positions

    state = state0
    obs_plain, configs = [], []
    t0 = time.perf_counter()
    for _ in range(args.rounds):
        state, w, pos = plain_round(state)
        obs_plain.append(w)
        configs.append(pos)
    obs_plain = jax.device_get(jnp.stack(obs_plain, axis=1))  # (C, T)
    dt_plain = time.perf_counter() - t0
    moves_plain = args.rounds * args.moves_per_round * c
    ess_plain = effective_sample_size(obs_plain)
    crossings = int(np.sum(np.abs(np.diff(obs_plain, axis=1)) > 0.5))
    print(f"plain: {dt_plain:.1f}s, {crossings} crossings, "
          f"ESS {ess_plain:.2f}", flush=True)

    # ---- train the flow on the plain-production configs (both wells are
    # populated by the alternating init — the reference's A1 recipe) -------
    data = to_centered(jnp.concatenate(configs, axis=0), half_box)
    model = build_circular_flow(3, 2, half_box, K=15, hidden_units=256,
                                num_bins=32, num_blocks=2)
    params = model.init_params(jax.random.key(1))
    t0 = time.perf_counter()
    config = TrainConfig(batch_size=min(512, int(data.shape[0])),
                         epochs=args.epochs, lr=1e-4)
    params, _, _, loss_epoch = train(model, params, data, config,
                                     jax.random.key(2))
    dt_train = time.perf_counter() - t0
    print(f"trained on {data.shape[0]} configs: fKLD "
          f"{loss_epoch[0]:.2f} -> {loss_epoch[-1]:.2f} in {dt_train:.1f}s",
          flush=True)

    # ---- (b) hybrid: same local-move budget + one flow teleport/round ----
    @jax.jit
    def hybrid_round(s):
        s = jax.vmap(lambda t: run_moves(spec, beta, t, args.moves_per_round))(s)
        res = nf_big_moves(spec, beta, s, model, params, half_box)
        n_a, n_b = well_counts(spec, res.state.positions)
        return (res.state, well_state(spec, res.state.positions),
                res.accepted, n_a, n_b)

    state = state0
    obs_h, acc, cnt_a, cnt_b = [], [], [], []
    t0 = time.perf_counter()
    for _ in range(args.rounds):
        state, w, a, n_a, n_b = hybrid_round(state)
        obs_h.append(w)
        acc.append(a)
        cnt_a.append(n_a)
        cnt_b.append(n_b)
    obs_h = jax.device_get(jnp.stack(obs_h, axis=1))  # (C, T)
    dt_h = time.perf_counter() - t0
    acceptance = float(jnp.mean(jnp.stack(acc)))
    # discard the first third as hybrid burn-in (teleports re-equilibrate
    # the 50/50 init toward the true well ratio)
    burn = args.rounds // 3
    ess_h = effective_sample_size(obs_h[:, burn:])
    # ΔF = ln(P_B/P_A) from per-particle occupancy counts — the reference's
    # estimator (calculate_well_statistics, hybrid utils.py:61-101), the
    # quantity the exact quadrature value 1.490 refers to
    tot_a = float(jnp.sum(jnp.stack(cnt_a[burn:])))
    tot_b = float(jnp.sum(jnp.stack(cnt_b[burn:])))
    df = float(np.log(tot_b / max(tot_a, 1.0)))
    print(f"hybrid: {dt_h:.1f}s, acceptance {acceptance:.3f}, "
          f"ESS {ess_h:.1f}, dF {df:.3f}", flush=True)

    ess_per_s_h = ess_h / dt_h
    ess_per_s_p = ess_plain / dt_plain
    speedup = ess_per_s_h / ess_per_s_p if ess_per_s_p > 0 else float("inf")
    result = {
        "metric": "well_state_ess_per_s",
        "value": round(ess_per_s_h, 3),
        "unit": "ESS/s",
        "plain_ess_per_s": round(ess_per_s_p, 6),
        "plain_crossings": crossings,
        "hybrid_acceptance": round(acceptance, 4),
        "hybrid_delta_f": round(df, 4),
        "exact_delta_f": EXACT_DF,
        "ess_speedup_vs_plain": speedup,
        "chains": c,
        "rounds": args.rounds,
        "device": jax.devices()[0].device_kind,
    }

    with open(args.out, "w") as f:
        f.write("# ESS — well-state effective-sample-size rate "
                "(hybrid vs plain)\n\n")
        f.write("The slow observable is the per-chain well label "
                "(majority-in-B indicator).\nBoth samplers run the same "
                f"{c} chains, {args.rounds} rounds x "
                f"{args.moves_per_round} local moves; the hybrid adds one "
                "flow teleport per round\n(main_algorithm_1.py:375-422 "
                "schedule). ESS: Geyer initial-positive-sequence\n"
                "estimator (analysis/ess.py), hybrid burn-in = first "
                "quarter discarded.\n\n")
        plain_note = (" (UNRELIABLE: too few crossings for the "
                      "autocorrelation estimate)" if crossings < 20 else "")
        f.write("| quantity | plain Metropolis | NF-hybrid |\n|---|---|---|\n")
        f.write(f"| wall time | {dt_plain:.1f} s | {dt_h:.1f} s |\n")
        f.write(f"| well-state ESS | {ess_plain:.2f}{plain_note} | "
                f"{ess_h:.1f} |\n")
        f.write(f"| well-state ESS/s | {ess_per_s_p:.4f} | "
                f"{ess_per_s_h:.2f} |\n")
        f.write(f"| well crossings observed | {crossings} | — (teleports, "
                f"acceptance {acceptance:.3f}) |\n")
        f.write(f"| ΔF = ln(P_B/P_A), per-particle occupancy | "
                f"{'n/a' if crossings == 0 else 'pinned at init split'} | "
                f"{df:.3f} (exact {EXACT_DF}) |\n\n")
        f.write(f"ESS/s speedup: **{speedup if speedup != float('inf') else '∞'}"
                f"** — plain MCMC cannot measure this observable at all.\n\n")
        f.write(f"Flow: K=15 circular RQ-spline, trained {args.epochs} "
                f"epochs on the plain phase's {int(data.shape[0])} configs "
                f"({dt_train:.1f} s).\n")
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
