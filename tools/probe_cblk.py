"""One-off probe: chain-block width at deep particle tiles, multi-block grid.

The r2 width rule (128 lanes for rows >= 64) was measured on grids with few
blocks; the r3 grid fix (>= 4 blocks so Mosaic pipelines VMEM copies against
compute) changes the trade-off.  Times N=512 and N=1024 at chains=2048 for
c_blk in {128, 256, 512}.
"""

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

from flowstate_tpu.mcmc import pallas_metropolis as pm
from flowstate_tpu.mcmc.initialise import initialise_fcc
from flowstate_tpu.mcmc.metropolis import run_moves_batch
from flowstate_tpu.mcmc.state import init_chain_state, resync_energy
from flowstate_tpu.ops.pair_energy import SystemSpec


def main():
    chains = 2048
    for n in (512, 1024):
        pos, box = initialise_fcc(n, 0.3, 1.0)
        spec = SystemSpec.create(n, box, num_wells=0)
        positions = jnp.broadcast_to(jnp.asarray(pos), (chains, n, 2))
        state = init_chain_state(spec, positions, jax.random.key(0))
        state = run_moves_batch(spec, 1.0, state, 256)
        state = resync_energy(spec, state)
        jax.device_get(state.positions)

        moves = 4096
        for c_blk in (128, 256, 512):
            pm._pick_c_blk = lambda rows, _c=c_blk: _c
            try:
                step = jax.jit(lambda s: resync_energy(
                    spec, pm.run_moves_pallas(spec, 1.0, s, moves)))
                out = step(state)
                jax.device_get(out.positions)
                t0 = time.perf_counter()
                reps = 3
                for _ in range(reps):
                    out = step(out)
                jax.device_get(out.positions)
                dt = (time.perf_counter() - t0) / reps
                print(json.dumps({
                    "n": n, "c_blk": c_blk,
                    "moves_per_s": chains * moves / dt}))
            except Exception as e:
                print(json.dumps({"n": n, "c_blk": c_blk,
                                  "error": repr(e)[:200]}))


if __name__ == "__main__":
    main()
