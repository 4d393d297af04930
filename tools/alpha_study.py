"""Mixed-loss (alpha < 1) Algorithm-2 training, driven for real.

VERDICT r3 missing item 2: the reverse-KLD (energy) loss term is
implemented and unit-tested but every A2 run uses the reference's
alpha=1 regime where it is dead weight (the reference even computes it
with weight 0, main_algorithm_2.py:52,319-321).  This tool runs the SAME
A2 schedule at alpha=1.0 and alpha=0.5 (same seeds, same budget) and
records what the energy term actually buys/costs:

  * big-move acceptance per cycle (does energy-supervised training help
    the flow propose acceptable configurations EARLIER?)
  * final ΔF vs the alpha=1 run and the exact quadrature
  * wall-clock per cycle (the reverse term costs flow forward passes +
    an energy batch per training step)

Writes results/evidence/alpha_study.json; summary lands in RESULTS.md.

Usage (real TPU): python tools/alpha_study.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from flowstate_tpu.utils.profiling import enable_compilation_cache

try:
    enable_compilation_cache()
except Exception:
    pass

from flowstate_tpu.experiments import algorithm2
from flowstate_tpu.utils.config import algorithm2_config


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=150)
    ap.add_argument("--chains", type=int, default=100)
    ap.add_argument("--alphas", default="1.0,0.5")
    ap.add_argument("--lr_list", default=None,
                    help="comma list of learning rates: runs every "
                         "(alpha, lr) pair and stores them under "
                         "'lr_sweep_runs' (the r4 alpha-study confound — "
                         "'per-alpha lr retuning could narrow the gap' — "
                         "was never tested; this closes it)")
    ap.add_argument("--output_dir", default="results/alpha_study")
    ap.add_argument("--json_out",
                    default="results/evidence/alpha_study.json")
    args = ap.parse_args(argv)

    lrs = ([float(x) for x in args.lr_list.split(",")]
           if args.lr_list else [None])
    runs = []
    for alpha in [float(a) for a in args.alphas.split(",")]:
      for lr in lrs:
        tag = (f"a2_alpha_{alpha:g}" if lr is None
               else f"a2_alpha_{alpha:g}_lr_{lr:g}")
        lr_kw = {} if lr is None else {"lr": lr}
        cfg = algorithm2_config(
            experiment_id=tag, output_dir=args.output_dir,
            num_chains=args.chains, num_training_cycles=args.cycles,
            checkpoint_interval=max(25, args.cycles // 4),
            alpha=alpha, **lr_kw)
        t0 = time.perf_counter()
        res = algorithm2.run(cfg)
        wall = time.perf_counter() - t0
        ev_path = os.path.join(args.output_dir, "evidence",
                               f"{tag}_data.json")
        ev = json.load(open(ev_path))
        runs.append({
            "alpha": alpha, "lr": lr if lr is not None else cfg.lr,
            "wall_s": round(wall, 1),
            "cycles": args.cycles, "chains": args.chains,
            "big_move_acceptance_final": res["big_move_acceptance"],
            "delta_f_mean": res.get("delta_f_mean"),
            "delta_f_sem": res.get("delta_f_sem"),
            "p_acc_history": ev["p_acc_history"],
            "loss_per_cycle": ev["loss_per_cycle"],
            "sector_counts": ev.get("sector_counts"),
        })
        print(f"alpha={alpha} lr={runs[-1]['lr']:g}: "
              f"p_acc={res['big_move_acceptance']:.4f} "
              f"dF={res.get('delta_f_mean')} wall={wall:.1f}s", flush=True)

    os.makedirs(os.path.dirname(args.json_out), exist_ok=True)
    if args.lr_list and os.path.exists(args.json_out):
        # lr-sweep mode appends to the existing study instead of
        # overwriting the full-budget alpha comparison
        out = json.load(open(args.json_out))
        out["lr_sweep_runs"] = out.get("lr_sweep_runs", []) + runs
    else:
        out = {"metric": "alpha_study", "device": str(jax.devices()[0]),
               "runs": runs}
    with open(args.json_out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"metric": "alpha_study",
                      "alphas": [r["alpha"] for r in runs],
                      "p_acc": [r["big_move_acceptance_final"]
                                for r in runs],
                      "wall_s": [r["wall_s"] for r in runs]}))
    return out


if __name__ == "__main__":
    main()
