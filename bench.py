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

    # FOUR production segments fused into ONE jitted program that returns
    # only the energy series: with 4 separate dispatches the r5 captures
    # still swung 5.0-15.8M — the attribution fields showed the ESS value
    # bit-identical (396,813.2) while the timed segment varied 0.23-0.64 s
    # because each dispatch carries only ~0.1 s of device work against
    # ~40-400 ms of tunnel latency.  One dispatch, ~0.4 s of device work,
    # and the dead position buffers never materialize (XLA DCE).
    prod_segments = 4

    @jax.jit
    def produce(s):
        es = []
        for _ in range(prod_segments):
            s, obs = produce_fn(spec, beta, s, 256, 25)
            es.append(obs.energy_per_particle)
        return s, jnp.concatenate(es, axis=1)

    state2, energies_d = produce(state)
    _ = jax.device_get(state2.energy)
    state2, energies_d = produce(state2)   # 2nd warmup (warmup trap)
    _ = jax.device_get(state2.energy)
    t0 = time.perf_counter()
    state2, energies_d = produce(state2)
    _ = jax.device_get(state2.energy)      # sync on a SMALL output —
    dt_prod = (time.perf_counter() - t0) / prod_segments
    # — the (C, 1024) series itself (67 MB) transfers outside the clock
    energies = jax.device_get(energies_d)
    # 2048-chain subsample: the r3/r4 512-chain estimate left ~2x
    # run-to-run spread in the IAT itself (BENCH_r04 5.3M vs the 13.1M
    # commit capture — VERDICT r4 weak item 1); quadrupling the chains
    # halves the estimator SEM and the capture now tracks the docs
    ess_chains = 2048
    ess = effective_sample_size(energies[:ess_chains, :256])
    ess_per_s = ess * (NUM_CHAINS / ess_chains) / dt_prod

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
        # well-state ESS capability number lives in ESS.md (ess_check.py).
        # The factors are recorded separately so a run-to-run swing in
        # the headline can be attributed to the IAT estimate vs the
        # timed segment (r5 saw a residual ~1.5x spread; README quotes
        # the range):
        "ess_value": round(float(ess), 1),
        "ess_chains_estimated": ess_chains,
        "prod_segment_s": round(dt_prod, 4),
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
    from flowstate_tpu.flows import build_circular_flow
    from flowstate_tpu.mcmc.hybrid import nf_big_moves
    from flowstate_tpu.training import TrainConfig, make_optimizer
    from flowstate_tpu.training.train import TrainState, make_train_step

    # shared calibrated rooflines (utils/roofs.py — reads the calibration
    # evidence files so a recalibration cannot desynchronize the headline
    # fractions, r4 advisor finding): VPU = measured max-ILP FMA plateau
    # (tools/n_scaling.py), MXU = measured fp32 matmul delivered flops
    # (roofs.calibrate_mxu_roof), HBM = 819 GB/s v5e.
    from flowstate_tpu.utils.roofs import (
        HBM_ROOF, combine_loop_cost, mxu_roof, split_cost, vpu_roof,
    )
    VPU_ROOF = vpu_roof()
    MXU_ROOF = mxu_roof()

    half_box = float(spec.box.size_x) / 2
    model = build_circular_flow(3, 2, half_box, K=15, hidden_units=256,
                                num_bins=32, num_blocks=2)
    params = model.init_params(jax.random.key(7))

    # -- big moves: sample_and_log_prob + batched energies + MH, all
    #    chains.  ROUNDS_PER_CALL rounds run inside ONE jitted scan so the
    #    measured time is device time (~0.6 s of work/call), not per-round
    #    tunnel dispatch (a 30x1-round loop only had ~0.27 s of device
    #    work against ~40 ms/dispatch — VERDICT r3 weak item 2)
    ROUNDS_PER_CALL = 64
    BIG_CALLS = 3

    @jax.jit
    def big_rounds(s):
        def body(carry, _):
            return nf_big_moves(spec, beta, carry, model, params,
                                half_box).state, None
        s2, _ = jax.lax.scan(body, s, None, length=ROUNDS_PER_CALL)
        return s2

    s = big_rounds(state)                       # compile + warmup
    s = big_rounds(s)                           # 2nd warmup (see train
    _ = jax.device_get(s.energy)                # note: first executions
    t0 = time.perf_counter()                    # of a program run slow)
    for _ in range(BIG_CALLS):
        s = big_rounds(s)
    _ = jax.device_get(s.energy)
    dt_big = time.perf_counter() - t0
    rounds_per_s = ROUNDS_PER_CALL * BIG_CALLS / dt_big
    big_moves_per_s = NUM_CHAINS * rounds_per_s

    # -- training steps/s at the A1 config ------------------------------
    # (same structure as training.train: host-shuffled batch tensor passed
    # as the program argument — an in-program shuffle de-pipelines the
    # epoch scan 10-60x on v5e — and the TrainState carry donated.  All
    # epochs_timed epochs run inside ONE jitted epoch-over-step scan, so
    # steps/s is device time: the 8x1-epoch loop of round 3 still showed
    # a 190-604 steps/s run-to-run spread from dispatch jitter)
    cfg = TrainConfig(batch_size=512, epochs=1, lr=1e-4)
    data = jax.random.uniform(jax.random.key(8), (102400, 6),
                              minval=-half_box, maxval=half_box)
    optimizer = make_optimizer(cfg)
    step = make_train_step(model, cfg, optimizer)
    p0 = jax.tree_util.tree_map(jnp.copy, params)
    tstate = TrainState(p0, optimizer.init(p0), jax.random.key(9))

    epochs_timed = 8
    n_steps = data.shape[0] // cfg.batch_size

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_epochs(ts, batches):            # (E * n_steps, B, D)
        # ONE flat scan whose xs is the program argument: a nested
        # epoch-over-step scan slices the inner xs out of the outer scan
        # inside the jit, which de-pipelines the step loop (measured:
        # 343 steps/s nested vs ~600 flat on v5e — the same trap as
        # computing the batch tensor in-program, CLAUDE.md)
        ts, losses = jax.lax.scan(step, ts, batches)
        return ts, losses

    from flowstate_tpu.training.data import epoch_batches

    @jax.jit
    def shuffle_all(key):
        keys = jax.random.split(key, epochs_timed)
        return jnp.concatenate([epoch_batches(k, data, cfg.batch_size)
                                for k in keys])

    # TWO warmup calls: the first 1-2 executions of a freshly compiled
    # program run ~2x slow (measured 542 then 1089-1119 steps/s over six
    # identical fused-scan segments, logs/train_variance_r4.log) — the
    # 450-677 steps/s spread earlier rounds chased was this warmup tail,
    # not dispatch jitter or chip contention.  Steady state is timed.
    batches = shuffle_all(jax.random.key(11))
    for _ in range(2):
        tstate, losses = run_epochs(tstate, batches)
    _ = jax.device_get(losses[-1])
    timed_calls = 4
    t0 = time.perf_counter()
    for i in range(timed_calls):
        tstate, losses = run_epochs(tstate, batches)
    _ = jax.device_get(losses[-1])
    dt_train = time.perf_counter() - t0
    train_steps_per_s = n_steps * epochs_timed * timed_calls / dt_train

    # -- two-roof accounting for both phases (VERDICT r4 item 4): the
    #    compiled program's flop count is split by op category — dot
    #    instructions (MXU) vs everything else (VPU) — and each side is
    #    reported against ITS OWN calibrated roof, so both fractions are
    #    <= 1 and the binding resource is readable directly.  (The r4
    #    single-roof big_move_vpu_frac = 1.0451 divided total flops by
    #    the VPU plateau and bounded nothing.)  The HBM fraction shows
    #    the memory roofline alongside. ------------------------------------
    out = {
        "big_moves_per_s": round(big_moves_per_s, 1),
        "big_move_chains": NUM_CHAINS,
        "train_steps_per_s": round(train_steps_per_s, 2),
        "train_batch": cfg.batch_size,
    }

    def two_roof(prefix: str, compiled, rate: float,
                 body=None, extra_trips: int = 0) -> None:
        # while-body-once caveat (utils/roofs.py split_cost docstring):
        # cost_analysis counts a lax.scan body ONCE, so a K-layer scanned
        # flow program reports ~1/K of its real flops — the r5 capture
        # read "no resource near roof" for the flow phases off exactly
        # that artifact.  When the program is scan-dominated the caller
        # passes the separately-lowered loop BODY cost and the missing
        # trip count, and the combined cost is reported.
        costs = split_cost(compiled)
        if costs is None:
            return
        if body is not None and extra_trips > 0:
            outer_bytes = costs["bytes"]
            costs = combine_loop_cost(costs, body, extra_trips)
            # bytes are NOT composed: cost_analysis counts instruction-
            # level operand bytes, which for the VMEM-resident isolated
            # bodies vastly exceeds their real HBM traffic (the composed
            # figure measured 2.2-5.7x the physical roof).  The HBM
            # fraction therefore stays the outer-program figure — a
            # body-once LOWER BOUND, flagged alongside.
            costs["bytes"] = outer_bytes
            out[f"{prefix}_loop_trips"] = extra_trips + 1
            out[f"{prefix}_hbm_is_body_once_lower_bound"] = True
        flops, dots, vpu = (costs["flops"], costs["dot_flops"],
                            costs["vpu_flops"])
        nbytes = costs["bytes"]
        out[f"{prefix}_gflops"] = round(flops / 1e9, 2)
        out[f"{prefix}_delivered_tflops"] = round(flops * rate / 1e12, 3)
        out[f"{prefix}_mxu_frac"] = round(dots * rate / MXU_ROOF, 4)
        out[f"{prefix}_vpu_frac"] = round(vpu * rate / VPU_ROOF, 4)
        out[f"{prefix}_dot_flop_share"] = round(dots / flops, 3)
        if nbytes > 0:
            out[f"{prefix}_hbm_frac"] = round(nbytes * rate / HBM_ROOF, 3)
            if body is None:   # AI with corrected flops over outer bytes
                out[f"{prefix}_arith_intensity"] = round(flops / nbytes, 2)

    # -- blocked conditional moves (mcmc/blocked.py) at the sampler's
    #    natural regime (N=8, k=1): identity-init conditional flow —
    #    throughput is training-independent — one move per chain per
    #    round, ROUNDS_PER_CALL rounds per dispatch.  K=6 is the measured
    #    production depth (tools/blocked_depth.py: acceptance 0.207 vs
    #    0.221 at K=10, best hybrid well-ESS/s, +35% throughput) ----------
    from flowstate_tpu.flows import build_conditional_circular_flow
    from flowstate_tpu.mcmc import (
        blocked_big_moves, fourier_context, fourier_context_dim,
        init_chain_state,
    )
    from flowstate_tpu.mcmc.initialise import init_split_wells
    from flowstate_tpu.ops import Box, SystemSpec

    n_blk = 8
    spec8 = SystemSpec.create(n_blk, Box.from_density(n_blk, 0.03, 1.0),
                              num_wells=2, V0_list=(-10.0, -10.5), r0=1.2,
                              k=15.0)
    hb8 = float(spec8.box.size_x) / 2
    k_depth = 6
    cmodel = build_conditional_circular_flow(
        1, 2, hb8, context_features=fourier_context_dim(3), K=k_depth,
        hidden_units=128, num_bins=16)
    cparams = cmodel.init_params(jax.random.key(21))
    ctx_fn = lambda r, p: fourier_context(r, p, hb8, m_max=3)  # noqa: E731
    pos8, _ = init_split_wells(NUM_CHAINS, n_blk, 0.03)
    st8 = init_chain_state(spec8, jnp.asarray(pos8), jax.random.key(22),
                           0.65)

    @jax.jit
    def blocked_rounds(s1):
        def body(carry, _):
            return blocked_big_moves(spec8, beta, carry, cmodel, cparams,
                                     hb8, 1, context_fn=ctx_fn).state, None
        s2, _ = jax.lax.scan(body, s1, None, length=ROUNDS_PER_CALL)
        return s2

    s8 = blocked_rounds(st8)
    s8 = blocked_rounds(s8)
    _ = jax.device_get(s8.energy)
    t0 = time.perf_counter()
    for _ in range(BIG_CALLS):
        s8 = blocked_rounds(s8)
    _ = jax.device_get(s8.energy)
    dt_blk = time.perf_counter() - t0
    blocked_rounds_per_s = ROUNDS_PER_CALL * BIG_CALLS / dt_blk
    out["blocked_moves_per_s"] = round(NUM_CHAINS * blocked_rounds_per_s, 1)
    out["blocked_move_system"] = f"N={n_blk} k=1 K={k_depth} hidden=128"

    try:
        # ---- loop-body costs (the while-body-once caveat): every flow
        # program scans over K couplings, and cost_analysis counts the
        # scan body ONCE, so the outer program reports ~1/K of its real
        # flow flops.  Lower each loop BODY as its own (small) program
        # and combine: cost = outer + (trips - 1) * body. -----------------
        def _sc(f, *args):
            return split_cost(jax.jit(f).lower(*args).compile())

        lay = model.layers[0].layer        # the 6-dim coupling (K=15)
        K_big = model.layers[0].K
        pl_f = jax.tree_util.tree_map(lambda a: a[0], params[0])
        pl_i = jax.tree_util.tree_map(lambda a: a[-1], params[0])
        zb = jnp.zeros((NUM_CHAINS, 6))
        body_big = _sc(
            lambda a, b, z2, x2: lay.paired_forward_inverse(a, b, z2, x2),
            pl_f, pl_i, zb, zb)

        clay = cmodel.layers[0].layer      # the 2-dim conditional coupling
        K_blk = cmodel.layers[0].K
        cp_f = jax.tree_util.tree_map(lambda a: a[0], cparams[0])
        zb2 = jnp.zeros((NUM_CHAINS, 2))
        ctxz = jnp.zeros((NUM_CHAINS, fourier_context_dim(3)))
        body_blk = _sc(
            lambda a, b, z2, x2, c2: clay.paired_forward_inverse(
                a, b, z2, x2, context=c2),
            cp_f, cp_f, zb2, zb2, ctxz)

        # train-step bodies: the loss's flow part is ScannedLayers.inverse
        # (fwd scan) plus its remat backward (recompute + VJP per layer)
        xb = jnp.zeros((cfg.batch_size, 6))
        body_tr_f = _sc(lambda p, x2: lay.inverse(p, x2), pl_f, xb)

        def _tr_bwd(p, x2, ct, ctl):
            _, vjp = jax.vjp(lambda pp, xx: lay.inverse(pp, xx), p, x2)
            return vjp((ct, ctl))

        body_tr_b = _sc(_tr_bwd, pl_f, xb, xb,
                        jnp.zeros((cfg.batch_size,)))
        body_tr = {k: body_tr_f[k] + body_tr_b[k] for k in body_tr_f}

        p1 = jax.tree_util.tree_map(jnp.copy, params)
        two_roof("train_step",
                 jax.jit(step).lower(
                     TrainState(p1, optimizer.init(p1), jax.random.key(9)),
                     data[: cfg.batch_size]).compile(),
                 train_steps_per_s, body=body_tr, extra_trips=K_big - 1)

        # cost of ONE round: lower the single-round program, not the
        # ROUNDS_PER_CALL scan
        @jax.jit
        def big_round(s1):
            return nf_big_moves(spec, beta, s1, model, params,
                                half_box).state
        two_roof("big_move", big_round.lower(s).compile(), rounds_per_s,
                 body=body_big, extra_trips=K_big - 1)

        @jax.jit
        def blocked_round(s1):
            return blocked_big_moves(spec8, beta, s1, cmodel, cparams,
                                     hb8, 1, context_fn=ctx_fn).state
        two_roof("blocked_move", blocked_round.lower(s8).compile(),
                 blocked_rounds_per_s, body=body_blk,
                 extra_trips=K_blk - 1)
    except Exception as e:
        print(f"cost analysis unavailable: {e!r}", file=sys.stderr)
    return out


if __name__ == "__main__":
    main()
