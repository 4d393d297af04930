"""Pallas move-kernel validation on real TPU hardware -> PALLAS.md.

The TPU interpreter's on-chip PRNG returns all-zero bits, so kernel
STATISTICS can only be validated on hardware (CLAUDE.md).  Round-1 VERDICT
flagged that those statistics lived only as docstring claims; this tool
records them as an artifact:

  1. acceptance rate vs the XLA scan engine (same system, same budget),
  2. tracked-energy drift vs full recompute after a long segment,
  3. equilibrium statistics: per-particle well occupancy and energy
     mean/std vs the XLA engine (two independent samplers of the same
     Boltzmann distribution — must agree within cross-run error),
  4. the auto-padded chain path (C not a multiple of 512) on hardware,
  5. the multi-sublane path (N = 12 > 8) drift check on hardware,
  6. the large-N dense path (N = 128, pure LJ) drift + acceptance,
  7. throughput of both engines at the bench shape.

Usage: python tools/pallas_check.py [--chains 16384] [--moves 4096]
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

from flowstate_tpu.mcmc import (
    init_alternating_wells, init_chain_state, resync_energy, run_equilibration,
    run_moves,
)
import functools

from flowstate_tpu.mcmc.pallas_metropolis import run_moves_pallas as _rmp

run_moves_pallas = _rmp
from flowstate_tpu.ops import Box, SystemSpec
from flowstate_tpu.utils.profiling import enable_compilation_cache

WELL_RADIUS = 1.1 * 1.2


def occupancy(spec, positions):
    """Per-particle well-A/B occupancy fractions over (C, N, 2)."""
    lx, ly = spec.box.size_x, spec.box.size_y
    sizes = jnp.asarray([lx, ly])

    def frac(center):
        d = positions - center
        d = d - sizes * jnp.round(d / sizes)
        return float(jnp.mean(jnp.linalg.norm(d, axis=-1) <= WELL_RADIUS))

    return frac(jnp.asarray([lx / 4, ly / 2])), \
        frac(jnp.asarray([3 * lx / 4, ly / 2]))


def main(argv=None) -> dict:
    parser = argparse.ArgumentParser()
    parser.add_argument("--chains", type=int, default=16384)
    parser.add_argument("--moves", type=int, default=4096)
    parser.add_argument("--out", default="PALLAS.md")
    parser.add_argument("--fast_math", action="store_true",
                        help="gate the rsqrt-based fast-math kernel variant "
                             "(same statistics requirements)")
    args = parser.parse_args(argv)
    global run_moves_pallas
    run_moves_pallas = functools.partial(_rmp, fast_math=args.fast_math)

    try:
        enable_compilation_cache()
    except Exception:
        pass

    if jax.devices()[0].platform != "tpu":
        print(json.dumps({"error": "requires real TPU hardware"}))
        return {}

    c, m = args.chains, args.moves
    spec = SystemSpec.create(3, Box.from_density(3, 0.03, 1.0), num_wells=2,
                             V0_list=(-10.0, -10.5), r0=1.2, k=15.0)
    beta = 1.0

    positions, _ = init_alternating_wells(c, 3, 0.03)
    state0 = init_chain_state(spec, jnp.asarray(positions),
                              jax.random.key(0), 0.65)
    state0 = jax.jit(jax.vmap(
        lambda s: run_equilibration(spec, beta, s, 5000, 500)))(state0)
    jax.device_get(state0.energy)

    # --- 1+2) pallas segment: acceptance + energy drift ------------------
    pallas_step = jax.jit(
        lambda s: run_moves_pallas(spec, beta, s, m))
    s = pallas_step(state0)
    jax.device_get(s.energy)                     # compile + warmup
    t0 = time.perf_counter()
    s = pallas_step(s)
    jax.device_get(s.energy)
    dt_pallas = time.perf_counter() - t0
    pallas_moves_per_s = c * m / dt_pallas

    acc_pallas = (float(jnp.sum(s.accepts - state0.accepts))
                  / float(jnp.sum(s.attempts - state0.attempts)))
    virial_poisoned = bool(jnp.all(jnp.isnan(s.virial)))
    resynced = resync_energy(spec, s)
    drift = np.asarray(jnp.abs(s.energy - resynced.energy))
    drift_max, drift_mean = float(drift.max()), float(drift.mean())
    occ_a_pallas, occ_b_pallas = occupancy(spec, s.positions)

    # --- 3) XLA engine on the same budget for cross-engine statistics ----
    xla_step = jax.jit(jax.vmap(lambda t: run_moves(spec, beta, t, m)))
    x = xla_step(state0)
    jax.device_get(x.energy)
    t0 = time.perf_counter()
    x = xla_step(x)
    jax.device_get(x.energy)
    dt_xla = time.perf_counter() - t0
    xla_moves_per_s = c * m / dt_xla
    acc_xla = (float(jnp.sum(x.accepts - state0.accepts))
               / float(jnp.sum(x.attempts - state0.attempts)))
    occ_a_xla, occ_b_xla = occupancy(spec, x.positions)

    e_p = np.asarray(s.energy) / 3.0
    e_x = np.asarray(x.energy) / 3.0
    # cross-engine comparison in units of the cross-chain SEM
    sem = float(np.sqrt(e_p.var() / c + e_x.var() / c))
    e_sigma = abs(float(e_p.mean() - e_x.mean())) / max(sem, 1e-12)

    # --- 4) auto-padded chain count on hardware ---------------------------
    c_odd = 1000
    pos_odd, _ = init_alternating_wells(c_odd, 3, 0.03)
    st_odd = init_chain_state(spec, jnp.asarray(pos_odd), jax.random.key(1),
                              0.65)
    out_odd = jax.jit(lambda t: run_moves_pallas(spec, beta, t, 256))(st_odd)
    rs_odd = resync_energy(spec, out_odd)
    pad_drift = float(jnp.max(jnp.abs(out_odd.energy - rs_odd.energy)))
    pad_ok = (out_odd.positions.shape == (c_odd, 3, 2)
              and pad_drift < 1e-2)

    # --- 5) multi-sublane (N=12) drift on hardware ------------------------
    n12 = 12
    spec12 = SystemSpec.create(n12, Box.from_density(n12, 0.03, 1.0),
                               num_wells=2, V0_list=(-10.0, -10.5),
                               r0=1.2, k=15.0)
    pos12, _ = init_alternating_wells(512, n12, 0.03)
    st12 = init_chain_state(spec12, jnp.asarray(pos12), jax.random.key(2),
                            0.65)
    out12 = jax.jit(lambda t: run_moves_pallas(spec12, beta, t, 256))(st12)
    rs12 = resync_energy(spec12, out12)
    drift12 = float(jnp.max(jnp.abs(out12.energy - rs12.energy)))
    acc12 = (float(jnp.sum(out12.accepts - st12.accepts))
             / float(jnp.sum(out12.attempts - st12.attempts)))

    # --- 6) large-N dense path (N=128, pure LJ) on hardware ----------------
    from flowstate_tpu.mcmc.initialise import initialise_fcc
    nbig = 128
    pos_big, box_big = initialise_fcc(nbig, 0.3, 1.0)
    spec_big = SystemSpec.create(nbig, box_big, num_wells=0)
    st_big = init_chain_state(
        spec_big, jnp.broadcast_to(jnp.asarray(pos_big), (512, nbig, 2)),
        jax.random.key(3), 0.3)
    st_big = jax.jit(jax.vmap(
        lambda s: run_moves(spec_big, beta, s, 512)))(st_big)
    st_big = resync_energy(spec_big, st_big)
    out_big = jax.jit(lambda t: run_moves_pallas(spec_big, beta, t, 1024))(
        st_big)
    rs_big = resync_energy(spec_big, out_big)
    # drift scales with N (the tracked total is a sum of ~N*moves fp32
    # deltas); gate on the per-particle drift
    drift_big = float(jnp.max(jnp.abs(out_big.energy - rs_big.energy))) / nbig
    acc_big = (float(jnp.sum(out_big.accepts - st_big.accepts))
               / float(jnp.sum(out_big.attempts - st_big.attempts)))

    result = {
        "metric": "pallas_kernel_checks",
        "chains": c,
        "moves_per_chain": 2 * m,
        "acceptance_pallas": round(acc_pallas, 4),
        "acceptance_xla": round(acc_xla, 4),
        "energy_drift_max": drift_max,
        "energy_drift_mean": drift_mean,
        "virial_poisoned": virial_poisoned,
        "occupancy_pallas": [round(occ_a_pallas, 4), round(occ_b_pallas, 4)],
        "occupancy_xla": [round(occ_a_xla, 4), round(occ_b_xla, 4)],
        "energy_mean_sigma_distance": round(e_sigma, 2),
        "autopad_ok": pad_ok,
        "n12_drift_max": drift12,
        "n12_acceptance": round(acc12, 4),
        "n128_drift_per_particle": drift_big,
        "n128_acceptance": round(acc_big, 4),
        "pallas_moves_per_s": round(pallas_moves_per_s, 1),
        "xla_moves_per_s": round(xla_moves_per_s, 1),
        "device": jax.devices()[0].device_kind,
        "ok": bool(abs(acc_pallas - acc_xla) < 0.02
                   and drift_max < 1e-2 and e_sigma < 4.0
                   and virial_poisoned and pad_ok and drift12 < 1e-2
                   and drift_big < 1e-2 and 0.05 < acc_big < 0.95),
    }

    with open(args.out, "w") as f:
        f.write("# PALLAS — on-hardware validation of the Pallas move "
                "kernel\n\n")
        f.write(f"`mcmc/pallas_metropolis.py` vs the XLA scan engine "
                f"(`mcmc/metropolis.py`) on {result['device']}: "
                f"{c} chains x {2 * m} moves each, after 5000-step "
                "equilibration.  The interpreter cannot check any of this "
                "(its PRNG returns zero bits), so these numbers are the "
                "kernel's statistical evidence.\n\n")
        f.write("| check | pallas | xla scan | verdict |\n|---|---|---|---|\n")
        f.write(f"| acceptance rate (target 0.5 via adaptive disp) | "
                f"{acc_pallas:.4f} | {acc_xla:.4f} | "
                f"{'PASS' if abs(acc_pallas - acc_xla) < 0.02 else 'FAIL'} "
                f"(|diff| < 0.02) |\n")
        f.write(f"| tracked-energy drift after {2*m} moves (max / mean) | "
                f"{drift_max:.2e} / {drift_mean:.2e} | exact by "
                f"construction | {'PASS' if drift_max < 1e-2 else 'FAIL'} "
                "(< 1e-2) |\n")
        f.write(f"| per-particle well occupancy (A, B) | "
                f"({occ_a_pallas:.4f}, {occ_b_pallas:.4f}) | "
                f"({occ_a_xla:.4f}, {occ_b_xla:.4f}) | two samplers of the "
                "same Boltzmann measure |\n")
        f.write(f"| energy/particle mean, cross-engine distance | "
                f"{e_p.mean():.5f} | {e_x.mean():.5f} | "
                f"{e_sigma:.2f} sigma "
                f"{'PASS' if e_sigma < 4 else 'FAIL'} (< 4) |\n")
        f.write(f"| virial poisoned until resync_energy | "
                f"{virial_poisoned} | n/a (tracked exactly) | "
                f"{'PASS' if virial_poisoned else 'FAIL'} |\n")
        f.write(f"| auto-padded chains (C=1000) drift | {pad_drift:.2e} | "
                f"n/a | {'PASS' if pad_ok else 'FAIL'} |\n")
        f.write(f"| multi-sublane N=12 drift / acceptance | {drift12:.2e} "
                f"/ {acc12:.3f} | n/a | "
                f"{'PASS' if drift12 < 1e-2 else 'FAIL'} |\n")
        f.write(f"| large-N dense (N=128, pure LJ) drift/particle / "
                f"acceptance | {drift_big:.2e} / {acc_big:.3f} | n/a | "
                f"{'PASS' if drift_big < 1e-2 and 0.05 < acc_big < 0.95 else 'FAIL'} |\n")
        f.write(f"| throughput (moves/s) | {pallas_moves_per_s:,.0f} | "
                f"{xla_moves_per_s:,.0f} | — |\n\n")
        f.write(f"Overall: **{'PASS' if result['ok'] else 'FAIL'}**.\n")

    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
