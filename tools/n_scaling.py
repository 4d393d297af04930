"""Particle-count scaling: XLA scan engine vs Pallas move kernel on TPU.

Measures Metropolis move throughput as N grows (the reference is fixed at
N=3; ``MCMC/energy_calculator.py:48-108`` is O(N) per move and the build's
scaling axes are chains and particle count, SURVEY.md §5).  Both engines
compute the same dense O(N) per-move energies; the Pallas kernel keeps the
whole move loop in VMEM, so it exposes how far the XLA path sits from the
VPU roof once N stops being tiny.

Writes results/n_scaling.json and prints a markdown table for RESULTS.md.

Run on the real chip: ``python tools/n_scaling.py``.
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

from flowstate_tpu.utils.profiling import enable_compilation_cache

try:
    enable_compilation_cache()
except Exception:
    pass

from flowstate_tpu.mcmc.initialise import initialise_fcc
from flowstate_tpu.mcmc.metropolis import run_moves_batch
from flowstate_tpu.mcmc.pallas_metropolis import (
    MAX_PARTICLES, _pick_c_blk, run_moves_pallas,
)
from flowstate_tpu.mcmc.state import init_chain_state, resync_energy
from flowstate_tpu.ops.pair_energy import SystemSpec

# VPU elementwise ops per (row, lane) element per chain-move, counted from
# the kernel body (pallas_metropolis._move_kernel): two pair sweeps of ~28
# ops each (PBC-wrapped distances 10, r2+floor 4, LJ 7, cutoff/overlap
# masks+reduces 7) + ~7 shared ops (one-hot row select, others mask).
# Divides/rsqrts counted as 1 — so the roof is OPTIMISTIC where divides
# dominate and frac_of_roof is a LOWER bound on achieved efficiency.
OPS_PER_ROW_ELEM = 63


def _sync(x):
    jax.device_get(x)   # tunnel-safe completion barrier (CLAUDE.md)


def calibrate_vpu_ops(iters: int = 65536, depth: int = 8,
                      widths=(16, 32, 64, 128)) -> float:
    """Empirical VPU elementwise roof: the fastest mul+add issue rate a
    Pallas kernel can sustain on register-resident data.

    Each accumulator is ONE (8, 128) fp32 tile — a single vector register
    group — so the measurement is pure ALU issue rate, not VMEM traffic.
    A single serial mul/add chain is pipeline-latency-bound and understates
    the roof ~4-6x (measured: 4 chains on spilling (512,128) tiles gave
    0.63 Tops/s, below the move kernel's own delivered model-op rate), so
    independent chains are swept and the max over ILP widths is returned.
    Returns elementwise ops/s counting each mul and each add as 1 op (an
    FMA = 2), the same convention as OPS_PER_ROW_ELEM."""
    from jax.experimental import pallas as pl

    rows, c_blk = 8, 128

    def make(n_acc):
        def kernel(x_ref, o_ref):
            def body(_, accs):
                new = []
                for i, a in enumerate(accs):
                    for _ in range(depth):
                        a = a * (1.0 + 1e-7 * (i + 1)) + 1e-7
                    new.append(a)
                return tuple(new)
            x = x_ref[:, :]
            accs = tuple(x + float(i) for i in range(n_acc))
            accs = jax.lax.fori_loop(0, iters, body, accs)
            out = accs[0]
            for a in accs[1:]:
                out = out + a
            o_ref[:, :] = out
        return jax.jit(pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, c_blk), jnp.float32)))

    best = 0.0
    x = jnp.ones((rows, c_blk), jnp.float32)
    for n_acc in widths:
        f = make(n_acc)
        y = f(x)
        _sync(y)
        reps = 2
        t0 = time.perf_counter()
        for _ in range(reps):
            y = f(y)
        _sync(y)
        dt = (time.perf_counter() - t0) / reps
        rate = 2 * n_acc * depth * iters * rows * c_blk / dt
        print(json.dumps({"calibrate_n_acc": n_acc, "ops_per_s": rate}))
        best = max(best, rate)
    return best


def time_engine(fn, state, repeats: int) -> float:
    out = fn(state)
    out = fn(out)                 # 2nd warm-up: the first 1-2 executions
    _sync(out.positions)          # of a fresh program run ~2x slow
    t0 = time.perf_counter()      # (logs/train_variance_r4.log)
    for _ in range(repeats):
        out = fn(out)
    _sync(out.positions)
    return (time.perf_counter() - t0) / repeats


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", type=int, nargs="+",
                    default=[8, 32, 128, 512, 1024])
    ap.add_argument("--rho", type=float, default=0.3)
    ap.add_argument("--moves", type=int, default=8192)
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--out",
                    default="results/evidence/n_scaling_data.json")
    ap.add_argument("--no_calibrate", action="store_true")
    ap.add_argument("--calibrate_only", action="store_true")
    args = ap.parse_args()

    vpu_ops_per_s = None
    if not args.no_calibrate:
        vpu_ops_per_s = calibrate_vpu_ops()
        print(json.dumps({"vpu_ops_per_s": vpu_ops_per_s}))
    if args.calibrate_only:
        return

    rows = []
    for n in args.ns:
        assert n <= MAX_PARTICLES
        pos, box = initialise_fcc(n, args.rho, 1.0)
        spec = SystemSpec.create(n, box, num_wells=0)
        n_rows = ((n + 7) // 8) * 8
        # >= 4 chain blocks per grid: a 1-block grid (what 49152/n alone
        # gives at N>=512) cannot pipeline VMEM copies against compute and
        # was ~2x under the kernel's own per-row rate at N=512 (r3)
        chains = max(4 * _pick_c_blk(n_rows),
                     (49152 // n + 127) // 128 * 128)
        positions = jnp.broadcast_to(jnp.asarray(pos), (chains, n, 2))
        state = init_chain_state(spec, positions, jax.random.key(0))
        # brief equilibration off the lattice (uses the XLA engine)
        state = run_moves_batch(spec, 1.0, state, 512)
        state = resync_energy(spec, state)
        _sync(state.positions)

        # keep each timed call >= ~100 ms so the ~40 ms tunnel round-trip
        # latency doesn't dominate (small-N calls are fast)
        moves = args.moves * max(1, 256 // n)
        t_xla = time_engine(
            jax.jit(lambda s: run_moves_batch(spec, 1.0, s, moves)),
            state, args.repeats)
        # jit the whole pallas step: called eagerly, its padding/reshapes/
        # resync dispatch as ~30 separate tunnel round-trips (~40 ms each)
        t_pal = time_engine(
            jax.jit(lambda s: resync_energy(spec, run_moves_pallas(
                spec, 1.0, s, moves))),
            state, args.repeats)
        t_fast = time_engine(
            jax.jit(lambda s: resync_energy(spec, run_moves_pallas(
                spec, 1.0, s, moves, fast_math=True))),
            state, args.repeats)
        total = chains * moves
        row = {
            "n": n, "chains": chains, "c_blk": _pick_c_blk(n_rows),
            "xla_moves_per_s": total / t_xla,
            "pallas_moves_per_s": total / t_pal,
            "pallas_fast_moves_per_s": total / t_fast,
            "speedup": t_xla / t_pal,
        }
        best = max(row["pallas_moves_per_s"],
                   row["pallas_fast_moves_per_s"])
        # pair-rows swept per second: the N-independent measure of kernel
        # efficiency (moves/s falls as 1/N because each move's energy is
        # O(N) physics — row rate separates that from real inefficiency)
        row["row_elems_per_s"] = n_rows * best
        if vpu_ops_per_s:
            # useful elementwise ops the kernel must issue per chain-move
            # (OPS_PER_ROW_ELEM x padded particle rows) vs the calibrated
            # elementwise roof of the same loop/tile structure
            row["frac_of_roof"] = (OPS_PER_ROW_ELEM * n_rows * best
                                   / vpu_ops_per_s)
        rows.append(row)
        print(json.dumps(row))

    with open(args.out, "w") as f:
        json.dump({"device": str(jax.devices()[0]),
                   "vpu_ops_per_s": vpu_ops_per_s,
                   "ops_per_row_elem_model": OPS_PER_ROW_ELEM,
                   "rows": rows}, f, indent=1)

    print("\n| N | chains | XLA moves/s | Pallas moves/s | fast-math | "
          "speedup | rows/s | frac of VPU roof |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['n']} | {r['chains']} | {r['xla_moves_per_s']:.3g} "
              f"| {r['pallas_moves_per_s']:.3g} "
              f"| {r['pallas_fast_moves_per_s']:.3g} "
              f"| {r['speedup']:.1f}x "
              f"| {r['row_elems_per_s']:.3g} "
              f"| {r.get('frac_of_roof', float('nan')):.2f} |")


if __name__ == "__main__":
    main()
