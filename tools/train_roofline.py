"""Roofline analysis of the two flow phases: training step and big moves.

VERDICT r2 items 2 & 4: the MC engine has a VPU-roof argument
(ARCHITECTURE.md §1); this tool builds the same story for the phases
BENCH_r02 only recorded — the A1 training step (batch 512, K=15,
hidden 256, 32 bins — main_algorithm_1.py:57-67) and the 16,384-chain
big-move round (monte_carlo.py:235-303 batched).

For each variant it measures steps/s on the real TPU, reads the compiled
program's own cost model (flops / bytes accessed), and reports

    hbm_frac = bytes_accessed * steps_per_s / HBM_ROOF
    mxu_frac = flops * steps_per_s / BF16_PEAK

hbm_frac ~ 1 means the phase is delivering the HBM roofline for the bytes
the compiled program actually moves; raising it further requires moving
fewer bytes (which is what the bf16 variant does).

Variants:
  * training: {f32, bf16 param-net} x batch {512, 2048, 8192} — bf16
    halves weight/activation bytes (flows/nets.py::_linear); batch grows
    arithmetic intensity (weight + optimizer traffic amortizes).
  * big moves: {f32, bf16 param-net} at 16,384 chains + a component
    breakdown (sample_and_log_prob / log_prob(old) / pair energies).

bf16 training quality gate: same data, same seeds, 10 epochs — final loss
must match f32 within 2%.

Writes results/evidence/roofline_data.json (committed evidence) and prints
one JSON line per measurement.

Run on the real TPU: python tools/train_roofline.py
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

HBM_ROOF = 819e9          # v5e HBM: 819 GB/s
BF16_PEAK = 197e12        # v5e MXU: 197 TFLOP/s bf16
F32_PEAK = BF16_PEAK / 4  # fp32 through the MXU

NUM_CHAINS = 16384
TRAIN_SET = 102400


def _sync(tree):
    jax.device_get(jax.tree_util.tree_leaves(tree)[0])


def _timeit(fn, state, min_s: float = 0.6, max_calls: int = 60):
    """Calls/s of fn(state)->state, >= min_s of timed device work."""
    state = fn(state)            # compile + warmup
    _sync(state)
    t0 = time.perf_counter()
    state = fn(state)
    _sync(state)
    dt1 = max(time.perf_counter() - t0, 1e-4)
    calls = min(max_calls, max(3, int(np.ceil(min_s / dt1))))
    t0 = time.perf_counter()
    for _ in range(calls):
        state = fn(state)
    _sync(state)
    dt = time.perf_counter() - t0
    return calls / dt, state


def _cost(lowerable, *args):
    cost = jax.jit(lowerable).lower(*args).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return (float(cost.get("flops", 0.0)),
            float(cost.get("bytes accessed", 0.0)))


def _roofline(flops, nbytes, per_s):
    out = {"gflops_per_call": round(flops / 1e9, 2),
           "gbytes_per_call": round(nbytes / 1e9, 3),
           "calls_per_s": round(per_s, 2),
           "delivered_gflops": round(flops * per_s / 1e9, 1),
           "delivered_gbytes": round(nbytes * per_s / 1e9, 1),
           "hbm_frac": round(nbytes * per_s / HBM_ROOF, 3),
           "mxu_frac_bf16peak": round(flops * per_s / BF16_PEAK, 4)}
    if nbytes > 0:
        out["arith_intensity"] = round(flops / nbytes, 2)
    return out


def train_phase(results: dict, batches, dtypes) -> None:
    from flowstate_tpu.flows import build_circular_flow
    from flowstate_tpu.training import TrainConfig, make_optimizer
    from flowstate_tpu.training.data import epoch_batches
    from flowstate_tpu.training.train import TrainState, make_train_step

    half_box = 5.0
    data = jax.random.uniform(jax.random.key(8), (TRAIN_SET, 6),
                              minval=-half_box, maxval=half_box)

    for compute_dtype in dtypes:
        model = build_circular_flow(3, 2, half_box, K=15, hidden_units=256,
                                    num_bins=32, num_blocks=2,
                                    compute_dtype=compute_dtype)
        params = model.init_params(jax.random.key(7))
        tag = compute_dtype or "f32"
        for batch in batches:
            cfg = TrainConfig(batch_size=batch, epochs=1, lr=1e-4)
            optimizer = make_optimizer(cfg)
            step = make_train_step(model, cfg, optimizer)
            n_steps = TRAIN_SET // batch

            @functools.partial(jax.jit, donate_argnums=(0,))
            def run_epoch(ts, shuffle_key, _step=step, _cfg=cfg):
                b = epoch_batches(shuffle_key, data, _cfg.batch_size)
                ts, losses = jax.lax.scan(_step, ts, b)
                return ts, losses

            # fresh param buffers per variant: run_epoch DONATES its carry,
            # so the shared `params` pytree must never enter it directly
            p0 = jax.tree_util.tree_map(jnp.copy, params)
            tstate = TrainState(p0, optimizer.init(p0), jax.random.key(9))

            def call(carry, _run=run_epoch):
                ts, i = carry
                ts, _ = _run(ts, jax.random.key(11 + i))
                return (ts, i + 1)

            epochs_per_s, _ = _timeit(call, (tstate, 0))
            steps_per_s = epochs_per_s * n_steps

            p1 = jax.tree_util.tree_map(jnp.copy, params)
            flops, nbytes = _cost(step, TrainState(
                p1, optimizer.init(p1), jax.random.key(9)),
                data[:batch])
            row = {"phase": "train", "dtype": tag, "batch": batch,
                   "steps_per_s": round(steps_per_s, 2),
                   **_roofline(flops, nbytes, steps_per_s)}
            results["train"].append(row)
            print(json.dumps(row), flush=True)

    # quality gate: bf16 vs f32 training trajectory, same data/seed
    if "bfloat16" in dtypes and None in dtypes:
        finals = {}
        for compute_dtype in (None, "bfloat16"):
            model = build_circular_flow(3, 2, half_box, K=15,
                                        hidden_units=256, num_bins=32,
                                        num_blocks=2,
                                        compute_dtype=compute_dtype)
            params = model.init_params(jax.random.key(7))
            from flowstate_tpu.training.train import train
            cfg = TrainConfig(batch_size=512, epochs=10, lr=1e-4)
            _, _, _, loss_epoch = train(model, params, data, cfg,
                                        jax.random.key(12))
            finals[compute_dtype or "f32"] = loss_epoch
        gate = {"phase": "train_quality_gate",
                "f32_final_loss": round(finals["f32"][-1], 5),
                "bf16_final_loss": round(finals["bfloat16"][-1], 5),
                "rel_diff": round(abs(finals["bfloat16"][-1]
                                      - finals["f32"][-1])
                                  / max(abs(finals["f32"][-1]), 1e-9), 5),
                "f32_loss_epochs": [round(x, 4) for x in finals["f32"]],
                "bf16_loss_epochs": [round(x, 4)
                                     for x in finals["bfloat16"]]}
        gate["ok"] = bool(gate["rel_diff"] < 0.02)
        results["train_quality_gate"] = gate
        print(json.dumps({k: v for k, v in gate.items()
                          if not k.endswith("epochs")}), flush=True)


def big_move_phase(results: dict, dtypes) -> None:
    from flowstate_tpu.flows import build_circular_flow
    from flowstate_tpu.mcmc import init_alternating_wells, init_chain_state
    from flowstate_tpu.mcmc.hybrid import nf_big_moves, to_centered
    from flowstate_tpu.ops import Box, SystemSpec
    from flowstate_tpu.ops.pair_energy import total_energy_virial

    spec = SystemSpec.create(3, Box.from_density(3, 0.03, 1.0), num_wells=2,
                             V0_list=(-10.0, -10.5), r0=1.2, k=15.0)
    beta, half_box = 1.0, 5.0
    positions, _ = init_alternating_wells(NUM_CHAINS, 3, 0.03)
    state = init_chain_state(spec, jnp.asarray(positions),
                             jax.random.key(0), 0.65)

    for compute_dtype in dtypes:
        tag = compute_dtype or "f32"
        model = build_circular_flow(3, 2, half_box, K=15, hidden_units=256,
                                    num_bins=32, num_blocks=2,
                                    compute_dtype=compute_dtype)
        params = model.init_params(jax.random.key(7))

        @jax.jit
        def big_round(s, _m=model, _p=params):
            return nf_big_moves(spec, beta, s, _m, _p, half_box).state

        rounds_per_s, state = _timeit(big_round, state)
        flops, nbytes = _cost(lambda s: nf_big_moves(
            spec, beta, s, model, params, half_box).state, state)
        row = {"phase": "big_move", "dtype": tag, "chains": NUM_CHAINS,
               "big_moves_per_s": round(rounds_per_s * NUM_CHAINS, 1),
               "rounds_per_s": round(rounds_per_s, 3),
               **_roofline(flops, nbytes, rounds_per_s)}
        results["big_move"].append(row)
        print(json.dumps(row), flush=True)

        # component breakdown (forward+logq / inverse logq / energies)
        comps = {}

        def c_sample(c):
            x, lq = model.sample_and_log_prob(params, c[1], NUM_CHAINS)
            return (x, jax.random.fold_in(c[1], 1))

        def c_logprob(c):
            lq = model.log_prob(params, to_centered(state.positions,
                                                    half_box) + 0.0 * c[0])
            return (c[0] + 0.0 * lq[:, None], c[1])

        def c_energy(c):
            e, v = jax.vmap(lambda p: total_energy_virial(
                spec, p))(state.positions + 0.0 * c[0][:, :1, None])
            return (c[0] + 0.0 * e[:, None], c[1])

        carry0 = (jnp.zeros((NUM_CHAINS, 6)), jax.random.key(3))
        for name, fn in (("sample_and_log_prob", c_sample),
                         ("log_prob_old", c_logprob),
                         ("pair_energies", c_energy)):
            per_s, _ = _timeit(jax.jit(fn), carry0)
            comps[name] = {"calls_per_s": round(per_s, 2),
                           "ms_per_call": round(1e3 / per_s, 2)}
            print(json.dumps({"phase": "big_move_component", "dtype": tag,
                              "component": name, **comps[name]}),
                  flush=True)
        results[f"big_move_components_{tag}"] = comps


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[512, 2048, 8192])
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--skip_big", action="store_true")
    ap.add_argument("--skip_gate", action="store_true")
    ap.add_argument("--f32_only", action="store_true")
    ap.add_argument("--out", default=os.path.join(
        "results", "evidence", "roofline_data.json"))
    args = ap.parse_args()

    from flowstate_tpu.utils.profiling import enable_compilation_cache
    try:
        enable_compilation_cache()
    except Exception:
        pass

    dtypes = [None] if args.f32_only else [None, "bfloat16"]
    results = {"device": str(jax.devices()[0]),
               "hbm_roof_gbps": HBM_ROOF / 1e9,
               "bf16_peak_tflops": BF16_PEAK / 1e12,
               "train": [], "big_move": []}
    if args.skip_gate:
        results["train_quality_gate"] = "skipped"
    if not args.skip_train:
        train_phase(results, args.batches,
                    dtypes if not args.skip_gate else dtypes)
    if not args.skip_big:
        big_move_phase(results, dtypes)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"written": args.out}))


if __name__ == "__main__":
    main()
