"""Headline benchmark: Metropolis move throughput on the LJ double-well.

Prints ONE JSON line:
  {"metric": "mc_moves_per_s", "value": N, "unit": "moves/s",
   "vs_baseline": N / REFERENCE_CPU_MOVES_PER_S, ...}

The workload is the reference system (N=3 particles, rho=0.03, T=1.0,
V0=[-10, -10.5] double well — main_algorithm_1.py:32-53) advanced by the
batched engine: C chains vmapped on one chip, moves scanned within chains.

Baseline provenance: the reference's serial numpy engine
(/root/reference/MCMC/monte_carlo.py particle_displacement) measured on this
machine's CPU at 4312 moves/s (231.9 us/move, single chain, 3000-move timed
run after 200-move warmup, 2026-08-17).  BASELINE.md's north star is >=100x
that per chip.
"""

import json
import time

import jax
import jax.numpy as jnp

from flowstate_tpu.utils.profiling import enable_compilation_cache

try:
    enable_compilation_cache()
except Exception:
    pass

from flowstate_tpu.mcmc import init_alternating_wells, init_chain_state
from flowstate_tpu.mcmc.metropolis import run_moves
from flowstate_tpu.ops import Box, SystemSpec

REFERENCE_CPU_MOVES_PER_S = 4312.0

NUM_CHAINS = 16384
MOVES_PER_CALL = 1000
TIMED_CALLS = 5


def main() -> None:
    spec = SystemSpec.create(
        3, Box.from_density(3, 0.03, 1.0), num_wells=2,
        V0_list=(-10.0, -10.5), r0=1.2, k=15.0)
    beta = 1.0

    positions, _ = init_alternating_wells(NUM_CHAINS, 3, 0.03)
    state = init_chain_state(spec, jnp.asarray(positions), jax.random.key(0),
                             0.65)

    @jax.jit
    def advance(s):
        return jax.vmap(lambda x: run_moves(spec, beta, x, MOVES_PER_CALL))(s)

    # compile + warmup; sync via device_get (block_until_ready has been
    # observed returning early through the remote-TPU tunnel)
    state = advance(state)
    _ = jax.device_get(state.energy)

    t0 = time.perf_counter()
    for _ in range(TIMED_CALLS):
        state = advance(state)
    _ = jax.device_get(state.energy)
    dt = time.perf_counter() - t0

    total_moves = NUM_CHAINS * MOVES_PER_CALL * TIMED_CALLS
    moves_per_s = total_moves / dt

    acc = float(jnp.sum(state.accepts)) / float(jnp.sum(state.attempts))

    # ESS/s: timed production run with observable sampling (energy series)
    from flowstate_tpu.analysis import effective_sample_size
    from flowstate_tpu.mcmc import run_production_batch

    @jax.jit
    def produce(s):
        return run_production_batch(spec, beta, s, 64, 25)

    state2, obs = produce(state)
    _ = jax.device_get(state2.energy)
    t0 = time.perf_counter()
    state2, obs = produce(state2)
    energies = jax.device_get(obs.energy_per_particle)  # (C, T)
    dt_prod = time.perf_counter() - t0
    ess = effective_sample_size(energies[:256])  # subsample chains for speed
    ess_per_s = ess * (NUM_CHAINS / 256) / dt_prod

    print(json.dumps({
        "metric": "mc_moves_per_s",
        "value": round(moves_per_s, 1),
        "unit": "moves/s",
        "vs_baseline": round(moves_per_s / REFERENCE_CPU_MOVES_PER_S, 2),
        "chains": NUM_CHAINS,
        "moves_per_chain": MOVES_PER_CALL * (TIMED_CALLS + 1),
        "acceptance": round(acc, 4),
        "ess_per_s": round(ess_per_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
