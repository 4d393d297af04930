"""Pallas move-kernel tests (TPU interpreter).

The TPU interpreter's on-chip PRNG returns all-zero bits, so interpret-mode
can only validate the deterministic bookkeeping: with zero random bits every
move picks particle 0, displaces by (-0.5, -0.5)*max_disp, and accepts iff
dE <= 0 (u = 0).  Statistics (acceptance ~0.5, well occupancies, energy
drift < 3e-4 over 67M moves) are validated on real TPU hardware — numbers
recorded in the module docstring.
"""

import jax
import jax.numpy as jnp
import numpy as np

from flowstate_tpu.mcmc import init_alternating_wells, init_chain_state, resync_energy
from flowstate_tpu.mcmc.pallas_metropolis import C_BLK, run_moves_pallas
from flowstate_tpu.ops import Box, SystemSpec


def test_interpret_bookkeeping_consistent():
    spec = SystemSpec.create(3, Box.from_density(3, 0.03, 1.0), num_wells=2,
                             V0_list=(-10.0, -10.5), r0=1.2, k=15.0)
    pos, _ = init_alternating_wells(C_BLK, 3, 0.03)
    state = init_chain_state(spec, jnp.asarray(pos), jax.random.key(0), 0.65)
    out = run_moves_pallas(spec, 1.0, state, 100, seed=3, interpret=True)
    # positions stay in the box
    assert np.all(np.asarray(out.positions) >= 0)
    assert np.all(np.asarray(out.positions) <= 10.0)
    # cached energy equals a full recompute
    res = resync_energy(spec, out)
    np.testing.assert_allclose(np.asarray(out.energy),
                               np.asarray(res.energy), atol=1e-3)
    # counters advanced
    assert np.all(np.asarray(out.attempts) - np.asarray(state.attempts)
                  == 100)
    # particles 1,2 never moved (zero-bit RNG always picks particle 0)
    np.testing.assert_allclose(np.asarray(out.positions[:, 1:]),
                               np.asarray(state.positions[:, 1:]), atol=1e-6)
