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
# >= ~0.5 s of timed device work per engine: shorter segments are
# dominated by the ~40 ms tunnel round-trip latency and understate
# throughput up to ~2x (measured while building tools/n_scaling.py)
TIMED_CALLS = 30


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
    from flowstate_tpu.mcmc import run_production_batch, run_production_pallas

    # 256 samples/chain gives a stable Geyer IAT estimate (64-point series
    # produced a ~5x run-to-run spread in the reported ESS/s)
    produce_fn = (run_production_pallas
                  if jax.devices()[0].platform == "tpu"
                  else run_production_batch)

    @jax.jit
    def produce(s):
        return produce_fn(spec, beta, s, 256, 25)

    state2, obs = produce(state)
    _ = jax.device_get(state2.energy)
    t0 = time.perf_counter()
    state2, obs = produce(state2)
    energies = jax.device_get(obs.energy_per_particle)  # (C, T)
    dt_prod = time.perf_counter() - t0
    ess = effective_sample_size(energies[:512])  # subsample chains for speed
    ess_per_s = ess * (NUM_CHAINS / 512) / dt_prod

    hybrid = hybrid_phase_bench(spec, beta, state)

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
        # the above is ENERGY-series ESS (a fast observable); the slow
        # well-state ESS capability number lives in ESS.md (ess_check.py)
        "ess_observable": "energy",
        **hybrid,
        "device": str(jax.devices()[0]),
    }))


def hybrid_phase_bench(spec, beta, state) -> dict:
    """Flow-phase throughput: batched big moves and training steps.

    The reference's structural bottleneck is one CPU<->GPU round trip per
    big-move proposal (monte_carlo.py:255-262, one config at a time); here
    one device batch proposes + judges for all chains at once, so the
    number to record is whole-ensemble big-move rounds/s.  Training is the
    A1 full-scale config (batch 512, K=15, hidden 256, 32 bins —
    main_algorithm_1.py:57-67).
    """
    import numpy as np

    from flowstate_tpu.flows import build_circular_flow
    from flowstate_tpu.mcmc.hybrid import nf_big_moves
    from flowstate_tpu.training import TrainConfig, make_optimizer
    from flowstate_tpu.training.train import TrainState, make_train_step

    HBM_ROOF = 819e9   # v5e: 819 GB/s

    half_box = float(spec.box.size_x) / 2
    model = build_circular_flow(3, 2, half_box, K=15, hidden_units=256,
                                num_bins=32, num_blocks=2)
    params = model.init_params(jax.random.key(7))

    # -- big moves: sample_and_log_prob + batched energies + MH, all chains
    @jax.jit
    def big_round(s):
        return nf_big_moves(spec, beta, s, model, params, half_box).state

    s = big_round(state)                       # compile + warmup
    _ = jax.device_get(s.energy)
    t0 = time.perf_counter()
    for _ in range(TIMED_CALLS):
        s = big_round(s)
    _ = jax.device_get(s.energy)
    dt_big = time.perf_counter() - t0
    big_moves_per_s = NUM_CHAINS * TIMED_CALLS / dt_big

    # -- training steps/s at the A1 config, one full jitted epoch ---------
    # (same structure as training.train: host-shuffled batch tensor passed
    # as the program argument — an in-program shuffle de-pipelines the
    # epoch scan 10-60x on v5e — and the TrainState carry donated)
    cfg = TrainConfig(batch_size=512, epochs=1, lr=1e-4)
    data = jax.random.uniform(jax.random.key(8), (102400, 6),
                              minval=-half_box, maxval=half_box)
    optimizer = make_optimizer(cfg)
    step = make_train_step(model, cfg, optimizer)
    p0 = jax.tree_util.tree_map(jnp.copy, params)
    tstate = TrainState(p0, optimizer.init(p0), jax.random.key(9))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_epoch(ts, batches):
        ts, losses = jax.lax.scan(step, ts, batches)
        return ts, losses

    from flowstate_tpu.training.data import epoch_batches
    shuffle = jax.jit(lambda k: epoch_batches(k, data, cfg.batch_size))
    n_steps = data.shape[0] // cfg.batch_size

    tstate, _ = run_epoch(tstate, shuffle(jax.random.key(10)))
    _ = jax.device_get(jax.tree_util.tree_leaves(tstate.params)[0])
    # >= ~5 s of timed work: the post-optimization step is ~1 ms, so a
    # 3-epoch segment was dominated by tunnel dispatch jitter (188-312
    # steps/s run-to-run); 8 epochs stabilizes it
    epochs_timed = 8
    batches = shuffle(jax.random.key(11))
    t0 = time.perf_counter()
    for i in range(epochs_timed):
        nxt = (shuffle(jax.random.key(12 + i))
               if i + 1 < epochs_timed else None)
        tstate, losses = run_epoch(tstate, batches)
        batches = nxt
    _ = jax.device_get(losses[-1])
    dt_train = time.perf_counter() - t0
    train_steps_per_s = n_steps * epochs_timed / dt_train

    # -- roofline accounting for both phases from the compiled programs'
    #    own cost model: the phases are HBM-bound, so the headline fraction
    #    is delivered bytes/s vs the v5e HBM roof (ARCHITECTURE.md §2) ----
    out = {
        "big_moves_per_s": round(big_moves_per_s, 1),
        "big_move_chains": NUM_CHAINS,
        "train_steps_per_s": round(train_steps_per_s, 2),
        "train_batch": cfg.batch_size,
    }
    try:
        p1 = jax.tree_util.tree_map(jnp.copy, params)
        cost = (jax.jit(step).lower(
            TrainState(p1, optimizer.init(p1), jax.random.key(9)),
            data[: cfg.batch_size]).compile()
            .cost_analysis())
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        nbytes = float(cost.get("bytes accessed", 0.0))
        if flops > 0:
            # v5e peak: 197 TFLOP/s bf16 (compute runs f32 here, so this
            # MFU is conservative w.r.t. the achievable f32 roof)
            out["train_step_gflops"] = round(flops / 1e9, 2)
            out["train_mfu_vs_bf16_peak"] = round(
                flops * train_steps_per_s / 197e12, 4)
            if nbytes > 0:
                out["train_arith_intensity"] = round(flops / nbytes, 2)
                out["train_hbm_frac"] = round(
                    nbytes * train_steps_per_s / HBM_ROOF, 3)
        bcost = (jax.jit(big_round).lower(s).compile().cost_analysis())
        if isinstance(bcost, (list, tuple)):
            bcost = bcost[0]
        bbytes = float(bcost.get("bytes accessed", 0.0))
        if bbytes > 0:
            rounds_per_s = big_moves_per_s / NUM_CHAINS
            out["big_move_gbytes_per_round"] = round(bbytes / 1e9, 3)
            out["big_move_hbm_frac"] = round(
                bbytes * rounds_per_s / HBM_ROOF, 3)
    except Exception as e:
        print(f"cost analysis unavailable: {e!r}", file=sys.stderr)
    return out


if __name__ == "__main__":
    main()
