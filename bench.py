"""Headline benchmark: Metropolis move throughput on the LJ double-well.

Prints ONE JSON line:
  {"metric": "mc_moves_per_s", "value": N, "unit": "moves/s",
   "vs_baseline": N / REFERENCE_CPU_MOVES_PER_S, ...}

The workload is the reference system (N=3 particles, rho=0.03, T=1.0,
V0=[-10, -10.5] double well — main_algorithm_1.py:32-53) advanced by the
batched engine: C chains vmapped on one chip, moves scanned within chains.
Both engines are timed — the XLA scan engine and the Pallas on-chip move
kernel (statistics validated on hardware; see mcmc/pallas_metropolis.py) —
and the faster one is the headline value.

Baseline provenance: the reference's serial numpy engine
(/root/reference/MCMC/monte_carlo.py particle_displacement) measured on this
machine's CPU at 4312 moves/s (231.9 us/move, single chain, 3000-move timed
run after 200-move warmup, 2026-08-17).  BASELINE.md's north star is >=100x
that per chip.
"""

import functools
import json
import sys
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

    def timed(step_fn, s):
        # compile + warmup; sync via device_get (block_until_ready has been
        # observed returning early through the remote-TPU tunnel)
        s = step_fn(s)
        _ = jax.device_get(s.energy)
        t0 = time.perf_counter()
        for _ in range(TIMED_CALLS):
            s = step_fn(s)
        _ = jax.device_get(s.energy)
        dt = time.perf_counter() - t0
        return NUM_CHAINS * MOVES_PER_CALL * TIMED_CALLS / dt, s

    xla_moves_per_s, state = timed(advance, state)

    pallas_moves_per_s = 0.0
    if jax.devices()[0].platform == "tpu":
        from flowstate_tpu.mcmc import resync_energy
        from flowstate_tpu.mcmc.pallas_metropolis import run_moves_pallas

        # seed=None: the kernel derives a fresh per-call seed from state.key
        pallas_step = jax.jit(functools.partial(
            run_moves_pallas, spec, beta, num_moves=MOVES_PER_CALL))
        try:
            pallas_moves_per_s, state = timed(pallas_step, state)
        except Exception as e:  # headline falls back to the scan engine
            print(f"pallas path failed: {e!r}", file=sys.stderr)
        else:
            # the kernel does not track virial move-by-move; restore the
            # cached totals before sampling observables below
            state = resync_energy(spec, state)

    if pallas_moves_per_s > xla_moves_per_s:
        moves_per_s, engine = pallas_moves_per_s, "pallas"
    else:
        moves_per_s, engine = xla_moves_per_s, "xla_scan"

    acc = float(jnp.sum(state.accepts)) / float(jnp.sum(state.attempts))

    # ESS/s: timed production run with observable sampling (energy series)
    from flowstate_tpu.analysis import effective_sample_size
    from flowstate_tpu.mcmc import run_production_batch

    # 256 samples/chain gives a stable Geyer IAT estimate (64-point series
    # produced a ~5x run-to-run spread in the reported ESS/s)
    @jax.jit
    def produce(s):
        return run_production_batch(spec, beta, s, 256, 25)

    state2, obs = produce(state)
    _ = jax.device_get(state2.energy)
    t0 = time.perf_counter()
    state2, obs = produce(state2)
    energies = jax.device_get(obs.energy_per_particle)  # (C, T)
    dt_prod = time.perf_counter() - t0
    ess = effective_sample_size(energies[:512])  # subsample chains for speed
    ess_per_s = ess * (NUM_CHAINS / 512) / dt_prod

    print(json.dumps({
        "metric": "mc_moves_per_s",
        "value": round(moves_per_s, 1),
        "unit": "moves/s",
        "vs_baseline": round(moves_per_s / REFERENCE_CPU_MOVES_PER_S, 2),
        "engine": engine,
        "xla_moves_per_s": round(xla_moves_per_s, 1),
        "pallas_moves_per_s": round(pallas_moves_per_s, 1),
        "chains": NUM_CHAINS,
        "acceptance": round(acc, 4),
        "ess_per_s": round(ess_per_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
