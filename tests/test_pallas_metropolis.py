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


def test_virial_is_poisoned_until_resync():
    """The kernel does not track the virial; the returned field must be
    NaN (visibly wrong, not silently stale) until resync_energy."""
    spec = SystemSpec.create(3, Box.from_density(3, 0.03, 1.0), num_wells=2,
                             V0_list=(-10.0, -10.5), r0=1.2, k=15.0)
    pos, _ = init_alternating_wells(C_BLK, 3, 0.03)
    state = init_chain_state(spec, jnp.asarray(pos), jax.random.key(0), 0.65)
    out = run_moves_pallas(spec, 1.0, state, 10, seed=1, interpret=True)
    assert np.all(np.isnan(np.asarray(out.virial)))
    res = resync_energy(spec, out)
    assert np.all(np.isfinite(np.asarray(res.virial)))


def test_auto_padding_of_chain_axis():
    """Chain counts that are not C_BLK multiples are padded and sliced
    back; results for the real chains must be identical to a padded run."""
    spec = SystemSpec.create(3, Box.from_density(3, 0.03, 1.0), num_wells=2,
                             V0_list=(-10.0, -10.5), r0=1.2, k=15.0)
    c = 100  # << C_BLK and not a multiple
    pos, _ = init_alternating_wells(c, 3, 0.03)
    state = init_chain_state(spec, jnp.asarray(pos), jax.random.key(0), 0.65)
    out = run_moves_pallas(spec, 1.0, state, 50, seed=7, interpret=True)
    assert out.positions.shape == (c, 3, 2)
    assert out.energy.shape == (c,)
    res = resync_energy(spec, out)
    np.testing.assert_allclose(np.asarray(out.energy),
                               np.asarray(res.energy), atol=1e-3)
    assert np.all(np.asarray(out.attempts) - np.asarray(state.attempts)
                  == 50)


def test_multi_sublane_particle_tiles():
    """N > 8 uses multi-row tiles; bookkeeping must stay exact (N=12 ->
    rows=16)."""
    n = 12
    spec = SystemSpec.create(n, Box.from_density(n, 0.03, 1.0), num_wells=2,
                             V0_list=(-10.0, -10.5), r0=1.2, k=15.0)
    pos, _ = init_alternating_wells(64, n, 0.03)
    state = init_chain_state(spec, jnp.asarray(pos), jax.random.key(0), 0.65)
    out = run_moves_pallas(spec, 1.0, state, 30, seed=5, interpret=True)
    assert out.positions.shape == (64, n, 2)
    box = float(spec.box.size_x)
    assert np.all(np.asarray(out.positions) >= 0)
    assert np.all(np.asarray(out.positions) <= box)
    res = resync_energy(spec, out)
    np.testing.assert_allclose(np.asarray(out.energy),
                               np.asarray(res.energy),
                               rtol=1e-5, atol=1e-3)
    # zero-bit interpreter RNG: only particle 0 ever moves
    np.testing.assert_allclose(np.asarray(out.positions[:, 1:]),
                               np.asarray(state.positions[:, 1:]), atol=1e-6)


def test_large_n_shrinks_chain_block():
    """Large N picks a smaller lanes block (VMEM budget) and keeps the
    bookkeeping exact; N=72 -> rows=72, and a chain count below the small-N
    block still pads and round-trips correctly."""
    from flowstate_tpu.mcmc.initialise import initialise_fcc
    from flowstate_tpu.mcmc.pallas_metropolis import _pick_c_blk

    assert _pick_c_blk(8) == 512
    assert _pick_c_blk(32) == 512
    assert _pick_c_blk(64) == 128
    assert _pick_c_blk(1024) == 128

    n = 72
    pos, box = initialise_fcc(n, 0.3, 1.0)
    spec = SystemSpec.create(n, box, num_wells=0)
    state = init_chain_state(
        spec, jnp.broadcast_to(jnp.asarray(pos), (3, n, 2)),
        jax.random.key(0), 0.3)
    out = run_moves_pallas(spec, 1.0, state, 16, seed=7, interpret=True)
    assert out.positions.shape == (3, n, 2)
    res = resync_energy(spec, out)
    np.testing.assert_allclose(np.asarray(out.energy),
                               np.asarray(res.energy),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.positions[:, 1:]),
                               np.asarray(state.positions[:, 1:]), atol=1e-6)


def test_too_many_particles_raises_and_auto_dispatches():
    import pytest

    from flowstate_tpu.mcmc.pallas_metropolis import (
        MAX_PARTICLES, run_moves_auto,
    )
    n = MAX_PARTICLES + 1
    spec = SystemSpec.create(n, Box.from_density(n, 0.03, 1.0), num_wells=0)
    # simple square lattice (the well-grid initialisers cap at 12/well)
    box = float(spec.box.size_x)
    side = int(np.ceil(np.sqrt(n)))
    xy = np.stack(np.meshgrid(np.arange(side), np.arange(side)),
                  -1).reshape(-1, 2)[:n] * (box / side) + box / (2 * side)
    pos = np.broadcast_to(xy, (4, n, 2)).copy()
    state = init_chain_state(spec, jnp.asarray(pos, dtype=jnp.float32),
                             jax.random.key(0), 0.65)
    with pytest.raises(ValueError, match="up to"):
        run_moves_pallas(spec, 1.0, state, 5, interpret=True)
    # the dispatcher falls back to the XLA engine (CPU backend here)
    out = run_moves_auto(spec, 1.0, state, 5)
    assert out.positions.shape == (4, n, 2)
    assert np.all(np.asarray(out.attempts) - np.asarray(state.attempts) == 5)


def test_production_pallas_shapes_and_observables():
    """run_production_pallas matches run_production_batch's observable
    layout and records exact (resynced) energies/virials."""
    from flowstate_tpu.mcmc import run_production_pallas

    spec = SystemSpec.create(3, Box.from_density(3, 0.03, 1.0), num_wells=2,
                             V0_list=(-10.0, -10.5), r0=1.2, k=15.0)
    c, t = 64, 5
    pos, _ = init_alternating_wells(c, 3, 0.03)
    state = init_chain_state(spec, jnp.asarray(pos), jax.random.key(0), 0.65)
    import functools

    import flowstate_tpu.mcmc.pallas_metropolis as pm
    orig = pm.run_moves_pallas
    pm.run_moves_pallas = functools.partial(orig, interpret=True)
    try:
        out, obs = run_production_pallas(spec, 1.0, state, t, 10)
    finally:
        pm.run_moves_pallas = orig
    assert obs.positions.shape == (c, t, 3, 2)
    assert obs.energy_per_particle.shape == (c, t)
    assert obs.cycle.shape == (c, t)
    np.testing.assert_array_equal(np.asarray(obs.cycle[0]),
                                  np.arange(1, t + 1) * 10)
    # virial resynced every block -> recorded pressure is finite
    assert np.all(np.isfinite(np.asarray(obs.pressure)))
    assert np.all(np.isfinite(np.asarray(out.virial)))
    # recorded energy is the exact recompute of the recorded positions
    from flowstate_tpu.ops import total_energy_virial
    e_last, _ = jax.vmap(lambda p: total_energy_virial(spec, p))(
        obs.positions[:, -1])
    np.testing.assert_allclose(np.asarray(obs.energy_per_particle[:, -1]),
                               np.asarray(e_last) / 3, rtol=1e-6)


def test_fast_math_matches_exact_bookkeeping():
    """fast_math=True (rsqrt-based 1/r2, shared 'others' mask) must keep
    the cached energy consistent with a full recompute and, with the
    interpreter's deterministic zero-bit RNG, produce the SAME trajectory
    as the exact-divide kernel to fp32 noise."""
    spec = SystemSpec.create(3, Box.from_density(3, 0.03, 1.0), num_wells=2,
                             V0_list=(-10.0, -10.5), r0=1.2, k=15.0)
    pos, _ = init_alternating_wells(64, 3, 0.03)
    state = init_chain_state(spec, jnp.asarray(pos), jax.random.key(0), 0.65)
    exact = run_moves_pallas(spec, 1.0, state, 100, seed=3, interpret=True)
    fast = run_moves_pallas(spec, 1.0, state, 100, seed=3, interpret=True,
                            fast_math=True)
    np.testing.assert_allclose(np.asarray(fast.positions),
                               np.asarray(exact.positions), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fast.energy),
                               np.asarray(exact.energy),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(fast.accepts),
                                  np.asarray(exact.accepts))
    # cached energy equals a full recompute
    res = resync_energy(spec, fast)
    np.testing.assert_allclose(np.asarray(fast.energy),
                               np.asarray(res.energy), atol=1e-3)


def test_fast_math_large_n():
    """fast_math at a multi-row particle tile (N=72, rows=72)."""
    from flowstate_tpu.mcmc.initialise import initialise_fcc

    n = 72
    pos, box = initialise_fcc(n, 0.3, 1.0)
    spec = SystemSpec.create(n, box, num_wells=0)
    state = init_chain_state(
        spec, jnp.broadcast_to(jnp.asarray(pos), (3, n, 2)),
        jax.random.key(0), 0.3)
    out = run_moves_pallas(spec, 1.0, state, 16, seed=7, interpret=True,
                           fast_math=True)
    res = resync_energy(spec, out)
    np.testing.assert_allclose(np.asarray(out.energy),
                               np.asarray(res.energy),
                               rtol=1e-5, atol=1e-3)


def test_sweep_chunk_matches_single_shot():
    """The fused chunked old+new sweep (sweep_chunk, the deep-tile
    re-tiling experiment) must produce the SAME trajectory as the
    single-shot sweeps: same RNG draws in the same order, identical
    accept decisions, energies to fp32 reduction-order noise."""
    from flowstate_tpu.mcmc.initialise import initialise_fcc

    n = 72  # rows = 72 -> chunks of 24 rows exercise 3 iterations
    pos, box = initialise_fcc(n, 0.3, 1.0)
    spec = SystemSpec.create(n, box, num_wells=0)
    state = init_chain_state(
        spec, jnp.broadcast_to(jnp.asarray(pos), (3, n, 2)),
        jax.random.key(0), 0.3)
    base = run_moves_pallas(spec, 1.0, state, 16, seed=7, interpret=True,
                            sweep_chunk=0)
    chunked = run_moves_pallas(spec, 1.0, state, 16, seed=7, interpret=True,
                               sweep_chunk=24)
    np.testing.assert_array_equal(np.asarray(chunked.accepts),
                                  np.asarray(base.accepts))
    np.testing.assert_allclose(np.asarray(chunked.positions),
                               np.asarray(base.positions), atol=1e-5)
    np.testing.assert_allclose(np.asarray(chunked.energy),
                               np.asarray(base.energy), rtol=1e-5, atol=1e-3)
    # cached energy equals a full recompute
    res = resync_energy(spec, chunked)
    np.testing.assert_allclose(np.asarray(chunked.energy),
                               np.asarray(res.energy), rtol=1e-5, atol=1e-3)


def test_sweep_chunk_auto_default():
    """The auto rule (sweep_chunk=-1, the default) picks the fused sweep
    for deep tiles and matches the forced single-shot trajectory."""
    from flowstate_tpu.mcmc.initialise import initialise_fcc
    from flowstate_tpu.mcmc.pallas_metropolis import _pick_sweep_chunk

    assert _pick_sweep_chunk(8) == 0 and _pick_sweep_chunk(32) == 0
    assert _pick_sweep_chunk(128) == 64
    assert _pick_sweep_chunk(512) == 128
    assert _pick_sweep_chunk(1024) == 128
    assert _pick_sweep_chunk(72) == 0  # no pow2 divisor <= 128 under rows

    n = 128
    pos, box = initialise_fcc(n, 0.3, 1.0)
    spec = SystemSpec.create(n, box, num_wells=0)
    state = init_chain_state(
        spec, jnp.broadcast_to(jnp.asarray(pos), (2, n, 2)),
        jax.random.key(0), 0.3)
    auto = run_moves_pallas(spec, 1.0, state, 8, seed=11, interpret=True)
    single = run_moves_pallas(spec, 1.0, state, 8, seed=11, interpret=True,
                              sweep_chunk=0)
    np.testing.assert_array_equal(np.asarray(auto.accepts),
                                  np.asarray(single.accepts))
    np.testing.assert_allclose(np.asarray(auto.positions),
                               np.asarray(single.positions), atol=1e-5)
