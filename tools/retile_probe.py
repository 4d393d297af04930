"""Re-tiling probe for the deep-tile (N >= 512) Pallas move-kernel regime.

VERDICT r3 item 4: the move kernel sits at 50%/43% of the calibrated VPU
roof at N=512/1024 (vs 89% at N=32) and the residual was documented but
never attacked.  This probe runs the one recorded experiment: the fused
old+new chunked row sweep (``sweep_chunk`` in ``_move_kernel``), which
(a) shares each px/py chunk between the old- and new-position energy
sweeps and (b) bounds the live working set to O(chunk x c_blk) instead of
O(rows x c_blk), across a (sweep_chunk, c_blk) grid at N in {512, 1024}.

Timing discipline: >= ~0.5 s of device work per point, chained calls,
sync via device_get (CLAUDE.md tunnel rules).  Output:
results/evidence/retile_probe.json with moves/s and frac-of-roof per
configuration (roof convention: 63 VPU ops per row element, calibrated
plateau 2.6726 Tops/s — tools/n_scaling.py).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from flowstate_tpu.mcmc import init_chain_state
from flowstate_tpu.mcmc.pallas_metropolis import run_moves_pallas
from flowstate_tpu.ops import Box, SystemSpec
from flowstate_tpu.utils.profiling import enable_compilation_cache

try:
    enable_compilation_cache()
except Exception:
    pass

from flowstate_tpu.utils.roofs import vpu_roof

VPU_ROOF = vpu_roof()  # calibrated plateau (n_scaling_data.json)
OPS_PER_ROW_ELEM = 63  # per-move per-row-element op model (n_scaling.py)


def lattice_positions(key, c, n, box):
    """Safe non-overlapping start: jittered square lattice."""
    side = int(jnp.ceil(jnp.sqrt(n)))
    xs = (jnp.arange(side) + 0.5) * (box.size_x / side)
    ys = (jnp.arange(side) + 0.5) * (box.size_y / side)
    grid = jnp.stack(jnp.meshgrid(xs, ys), -1).reshape(-1, 2)[:n]
    jit = jax.random.uniform(key, (c, n, 2), minval=-0.05, maxval=0.05)
    return jnp.broadcast_to(grid, (c, n, 2)) + jit


def time_point(spec, state, *, sweep_chunk, c_blk_override, moves_per_call,
               calls):
    # fast_math=True matches the convention of n_scaling_data.json's
    # frac_of_roof column (the calibrated-roof comparison path)
    step = jax.jit(functools.partial(
        run_moves_pallas, spec, 1.0, num_moves=moves_per_call,
        fast_math=True, sweep_chunk=sweep_chunk,
        c_blk_override=c_blk_override))
    s = step(state)
    s = step(s)   # 2nd warm-up: first executions of a fresh program run slow
    _ = jax.device_get(s.energy)
    t0 = time.perf_counter()
    for _ in range(calls):
        s = step(s)
    _ = jax.device_get(s.energy)
    dt = time.perf_counter() - t0
    c = state.positions.shape[0]
    mps = c * moves_per_call * calls / dt
    acc = float(jnp.sum(s.accepts)) / float(jnp.sum(s.attempts))
    return mps, acc


def main():
    assert jax.devices()[0].platform == "tpu", "probe needs the real chip"
    out = {"device": str(jax.devices()[0]), "points": []}
    # moves_per_call matches tools/n_scaling.py (8192): 512 chains x 8192
    # moves x 4 calls = 16.8M moves/point, ~0.4-1 s of device work — the
    # first probe run used 25-60 moves/call and understated throughput
    # ~10x (tunnel latency dominated; the CLAUDE.md timing trap)
    for n, chains, moves, calls in ((512, 512, 8192, 4), (1024, 512, 8192, 4)):
        box = Box.from_density(n, 0.3, 1.0)
        spec = SystemSpec.create(n, box, num_wells=0)
        pos = lattice_positions(jax.random.key(0), chains, n, box)
        state = init_chain_state(spec, pos, jax.random.key(1), 0.12)
        rows = n  # already multiples of 8
        for c_blk in (128, 256):
            for chunk in (0, 32, 64, 128, 256):
                if chunk and (rows % chunk or rows <= chunk):
                    continue
                try:
                    mps, acc = time_point(
                        spec, state, sweep_chunk=chunk,
                        c_blk_override=c_blk, moves_per_call=moves,
                        calls=calls)
                except Exception as e:
                    print(f"N={n} c_blk={c_blk} chunk={chunk}: FAIL {e!r}",
                          flush=True)
                    continue
                frac = mps * n * OPS_PER_ROW_ELEM / VPU_ROOF
                row = {"n": n, "chains": chains, "c_blk": c_blk,
                       "sweep_chunk": chunk,
                       "moves_per_s": mps, "frac_of_roof": frac,
                       "acceptance": acc}
                out["points"].append(row)
                print(f"N={n} c_blk={c_blk} chunk={chunk}: "
                      f"{mps/1e6:.1f} Mmoves/s ({frac:.1%} of roof, "
                      f"acc {acc:.3f})", flush=True)
    with open("results/evidence/retile_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote results/evidence/retile_probe.json")


if __name__ == "__main__":
    main()
