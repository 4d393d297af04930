"""Pallas TPU kernel: the entire Metropolis move loop on-chip.

The scan-based engine (``mcmc/metropolis.py``) pays XLA while-loop overhead
per move (~20 us/step on v5e regardless of chain count).  This kernel runs
the WHOLE segment inside one Mosaic program: chain state lives in VMEM
registers across moves, randomness comes from the on-chip PRNG
(``pltpu.prng_random_bits``), and every per-move quantity is an (8, LANES)
VPU tile — chains in lanes, particles in sublanes.

Semantics match ``metropolis.py`` exactly (single-particle displacement,
wrap PBC, truncated-shifted LJ + double well, hard-core rejection,
Metropolis rule); only the PRNG stream differs (counter-based on-chip
generator vs threefry tables), so agreement with the reference engine is
statistical — asserted by the Boltzmann quadrature test.

Layout: positions as two (rows, c_blk) planes (x and y), particle index in
sublanes (rows = N padded to a multiple of 8; rows >= N masked); c_blk
chains per grid program (512 lanes for small N, shrinking with N so the
per-program working set stays inside the ~16 MB VMEM — ``_pick_c_blk``);
the chain axis auto-pads to a c_blk multiple.

Measured on v5e: 1.07 Gmoves/s at N=3 (vs 0.80 G for the XLA scan engine —
both near the VPU roof for the tiny-N op mix), and at larger particle
counts the gap opens because the XLA path's scan overhead and one-hot
selects stop amortizing: N=128 220 Mmoves/s vs 15 M (14.4x), N=1024
17.5 M vs 5.3 M (3.3x) (tools/n_scaling.py -> results/n_scaling.json).  Dense
O(N) per-move energies remain the right algorithm on this hardware up to
MAX_PARTICLES: at rho*r_c^2 ~ 0.2-2 a neighbor list would average <10
entries, but its per-move dynamic gathers serialize on the VPU while the
dense row sweep runs 8x128 lanes wide.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flowstate_tpu.mcmc.state import ChainState
from flowstate_tpu.ops.pair_energy import SystemSpec

C_BLK = 512        # chains per grid program (lanes; multiple of 128) for
                   # small particle counts; shrinks as the particle axis
                   # grows so the per-program working set stays in VMEM
ROWS = 8           # fp32 sublane count: the particle axis is padded to a
                   # multiple of this (N <= 8 -> one sublane tile; larger N
                   # uses multi-sublane tiles up to MAX_PARTICLES)
MAX_PARTICLES = 1024  # dense per-move energy stays on the VPU up to here;
                      # the (rows, c_blk) tile budget below keeps the
                      # working set under the ~16 MB/core VMEM


def _pick_c_blk(rows: int) -> int:
    """Chains per grid program for a given particle-row count.

    Measured rule (v5e sweeps, 2026-08-19): wide blocks win while the
    particle axis is shallow (rows <= 32: 512 lanes, e.g. 2.79 vs 1.47
    Gmoves/s at N=8), but once per-move tiles are deep, narrow blocks
    pipeline better (rows >= 64: 128 lanes, e.g. N=128: 211 vs 159
    Mmoves/s; N=512: 39.5 vs 37.5; N=1024 equal).  The narrow choice also
    keeps the ~12 live (rows, c_blk) fp32 temporaries <= 6 MB of the
    ~16 MB VMEM at rows = 1024.
    """
    return C_BLK if rows <= 32 else 128


def _pick_sweep_chunk(rows: int) -> int:
    """Row-chunk size for the fused old+new energy sweep (0 = single shot).

    Measured rule (v5e, tools/retile_probe.py, 2026-08-20, evidence in
    results/evidence/retile_probe.json): for deep particle tiles the
    fused chunked sweep lifts the kernel from ~62% to 85-91% of the
    calibrated VPU roof (N=512: 51.5 -> 71.4 Mmoves/s at chunk=128;
    N=1024: 26.1 -> 37.0 M at chunk=128, 37.6 M best at chunk=64 with
    256 lanes) — the separate sweeps' (rows, c_blk) temporaries
    serialize scheduling, chunking bounds the live set and interleaves
    two independent chains per chunk.  Shallow tiles (rows <= 32) are
    fastest single-shot; chunks of 32-128 rows are within ~4% of each
    other, so take the largest power-of-two divisor <= 128.
    """
    if rows <= 32:
        return 0
    for c in (128, 64, 32):
        if rows % c == 0 and rows > c:
            return c
    return 0


HARD_CORE_E = 1e30  # finite stand-in for +inf inside the kernel


def _uniform_from_bits(bits):
    """uint32 -> float32 uniform in [0, 1): keep 24 high bits.

    Mosaic has no uint32->float32 cast; route through int32 (safe: the
    shifted value is < 2^24).
    """
    return (pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32)
            * (1.0 / 16777216.0))


def _move_kernel(seed_ref, px_ref, py_ref, e_ref, md_ref, acc_ref,
                 px_out, py_out, e_out, acc_out, *,
                 spec: SystemSpec, beta: float, num_moves: int,
                 rows: int = ROWS, c_blk: int = C_BLK,
                 fast_math: bool = False, sweep_chunk: int = 0):
    """One chain block: ``num_moves`` sequential Metropolis updates."""
    ROWS = rows  # particle-axis tile height (multiple of 8)
    C_BLK = c_blk  # chains per program (lanes)
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    n = spec.num_particles
    lx, ly = spec.box.size_x, spec.box.size_y
    inv_lx, inv_ly = 1.0 / lx, 1.0 / ly   # PBC via multiply (VPU divides
                                          # are multi-cycle; L is static)
    r_cut2 = spec.cutoff * spec.cutoff
    hc2 = spec.hard_core * spec.hard_core
    sr6_cut = (spec.sigma**2 / r_cut2) ** 3
    shift = 4.0 * spec.epsilon * (sr6_cut * sr6_cut - sr6_cut)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (ROWS, C_BLK), 0)
    valid_row = row_ids < n

    def well_energy(x, y):
        """External double-well energy of one (1, C_BLK) particle row."""
        if spec.num_wells == 0:
            return jnp.zeros_like(x)
        v = jnp.zeros_like(x)
        centers = [(lx / 4.0, ly / 2.0), (3.0 * lx / 4.0, ly / 2.0)]
        for w in range(spec.num_wells):
            cx, cy = centers[w]
            dx = x - cx
            dy = y - cy
            dx = dx - lx * jnp.round(dx * inv_lx)
            dy = dy - ly * jnp.round(dy * inv_ly)
            r = jnp.sqrt(dx * dx + dy * dy)
            t = 0.5 * (1.0 + jnp.tanh(spec.k * (r - spec.r0)))
            v = v + spec.V0_list[w] * (1.0 - t)
        return v

    def particle_energy(px, py, x0, y0, others):
        """LJ energy of the particle at (x0, y0) vs all other rows + well.

        px, py: (ROWS, C_BLK) all positions; x0, y0: (1, C_BLK); others:
        (ROWS, C_BLK) bool marking every valid row EXCEPT the moving
        particle's own (shared between the old- and new-position sweeps).
        Returns (1, C_BLK) energy with HARD_CORE_E on overlap.
        """
        dx = x0 - px
        dy = y0 - py
        dx = dx - lx * jnp.round(dx * inv_lx)
        dy = dy - ly * jnp.round(dy * inv_ly)
        r2 = dx * dx + dy * dy
        r2_safe = jnp.maximum(r2, 1e-12)
        if fast_math:
            # VPU divides are the single most expensive op in this sweep;
            # rsqrt + multiply computes 1/r2 in fewer cycles.  Relative
            # error ~1e-7 on e_pair — far below the fp32 drift the
            # per-segment resync_energy already clears, and the kernel's
            # statistics are gated on hardware either way (PALLAS.md).
            inv_r = jax.lax.rsqrt(r2_safe)
            sr6 = (spec.sigma**2 * (inv_r * inv_r)) ** 3
        else:
            sr6 = (spec.sigma**2 / r2_safe) ** 3
        sr12 = sr6 * sr6
        e_pair = 4.0 * spec.epsilon * (sr12 - sr6) - shift
        in_range = others & (r2 <= r_cut2)
        e = jnp.sum(jnp.where(in_range, e_pair, 0.0), axis=0, keepdims=True)
        overlap = jnp.any(others & (r2 < hc2), axis=0, keepdims=True)
        e = jnp.where(overlap, HARD_CORE_E, e)
        return e + well_energy(x0, y0)

    def both_energies(px, py, x0, y0, x1, y1, others):
        """Fused OLD+NEW energy sweep, chunked over the particle axis.

        Re-tiling experiment for the deep-tile (rows >= 64) regime
        (VERDICT r3 item 4): the separate old/new sweeps each materialize
        ~6 live (rows, C_BLK) fp32 temporaries — 3 MB per sweep at
        rows = 1024 — whose live ranges serialize scheduling.  Here both
        sweeps share each ``sweep_chunk``-row slice of (px, py) and run as
        two independent dependency chains per chunk, so the VPU pipeline
        interleaves them and the peak working set is
        O(sweep_chunk x C_BLK), not O(rows x C_BLK).  Returns
        (e_old, e_new), each (1, C_BLK) including the well term.
        """
        chunk = sweep_chunk
        e_o = jnp.zeros((1, C_BLK), jnp.float32)
        e_n = jnp.zeros((1, C_BLK), jnp.float32)
        ov_o = jnp.zeros((1, C_BLK), jnp.bool_)
        ov_n = jnp.zeros((1, C_BLK), jnp.bool_)
        for ci in range(rows // chunk):
            sl = slice(ci * chunk, (ci + 1) * chunk)
            pxc, pyc, oth = px[sl], py[sl], others[sl]

            def chunk_energy(xs, ys):
                dx = xs - pxc
                dy = ys - pyc
                dx = dx - lx * jnp.round(dx * inv_lx)
                dy = dy - ly * jnp.round(dy * inv_ly)
                r2 = dx * dx + dy * dy
                r2_safe = jnp.maximum(r2, 1e-12)
                if fast_math:
                    inv_r = jax.lax.rsqrt(r2_safe)
                    sr6 = (spec.sigma**2 * (inv_r * inv_r)) ** 3
                else:
                    sr6 = (spec.sigma**2 / r2_safe) ** 3
                e_pair = 4.0 * spec.epsilon * (sr6 * sr6 - sr6) - shift
                e = jnp.sum(jnp.where(oth & (r2 <= r_cut2), e_pair, 0.0),
                            axis=0, keepdims=True)
                ov = jnp.any(oth & (r2 < hc2), axis=0, keepdims=True)
                return e, ov

            eo_c, ovo_c = chunk_energy(x0, y0)
            en_c, ovn_c = chunk_energy(x1, y1)
            e_o, ov_o = e_o + eo_c, ov_o | ovo_c
            e_n, ov_n = e_n + en_c, ov_n | ovn_c
        e_o = jnp.where(ov_o, HARD_CORE_E, e_o) + well_energy(x0, y0)
        e_n = jnp.where(ov_n, HARD_CORE_E, e_n) + well_energy(x1, y1)
        return e_o, e_n

    def body(i, carry):
        px, py, e, acc = carry
        bits = pltpu.bitcast(pltpu.prng_random_bits((ROWS, C_BLK)),
                             jnp.uint32)
        p = pltpu.bitcast(bits[0:1] % jnp.uint32(n), jnp.int32)  # (1, C_BLK)
        u1 = _uniform_from_bits(bits[1:2])
        u2 = _uniform_from_bits(bits[2:3])
        ua = _uniform_from_bits(bits[3:4])

        p_sel = row_ids == p            # (ROWS, C_BLK) one-hot row mask
        others = valid_row & jnp.logical_not(p_sel)
        x0 = jnp.sum(jnp.where(p_sel, px, 0.0), axis=0, keepdims=True)
        y0 = jnp.sum(jnp.where(p_sel, py, 0.0), axis=0, keepdims=True)

        md = md_ref[0:1, :]
        x1 = x0 + (u1 - 0.5) * md
        y1 = y0 + (u2 - 0.5) * md
        x1 = x1 - lx * jnp.floor(x1 * inv_lx)   # wrap into [0, L)
        y1 = y1 - ly * jnp.floor(y1 * inv_ly)

        if sweep_chunk and rows % sweep_chunk == 0 and rows > sweep_chunk:
            e_old, e_new = both_energies(px, py, x0, y0, x1, y1, others)
        else:
            e_old = particle_energy(px, py, x0, y0, others)
            e_new = particle_energy(px, py, x1, y1, others)

        de = e_new - e_old
        accept = (de <= 0.0) | (ua < jnp.exp(-beta * de))   # (1, C_BLK)
        accept_rows = jnp.broadcast_to(accept, (ROWS, C_BLK)) & p_sel

        px = jnp.where(accept_rows, jnp.broadcast_to(x1, (ROWS, C_BLK)), px)
        py = jnp.where(accept_rows, jnp.broadcast_to(y1, (ROWS, C_BLK)), py)
        e = e + jnp.where(accept, de, 0.0)
        acc = acc + accept.astype(jnp.float32)
        return px, py, e, acc

    px = px_ref[:, :]
    py = py_ref[:, :]
    e = e_ref[0:1, :]
    acc = acc_ref[0:1, :]
    px, py, e, acc = jax.lax.fori_loop(0, num_moves, body,
                                       (px, py, e, acc))
    px_out[:, :] = px
    py_out[:, :] = py
    e_out[:, :] = jnp.broadcast_to(e, (ROWS, C_BLK))
    acc_out[:, :] = jnp.broadcast_to(acc, (ROWS, C_BLK))


def run_moves_pallas(spec: SystemSpec, beta: float, state: ChainState,
                     num_moves: int, seed=None,
                     interpret: bool = False,
                     fast_math: bool = False,
                     sweep_chunk: int = -1,
                     c_blk_override: int = 0) -> ChainState:
    """Advance a batched ChainState by ``num_moves`` with the on-chip kernel.

    Any chain count is accepted (the batch is padded on-device to the next
    multiple of C_BLK and the padding is dropped on return) and any
    particle count up to MAX_PARTICLES (the particle axis tiles over
    multiple sublane rows); above that, use ``run_moves_auto`` which falls
    back to the XLA scan engine.

    The virial is NOT tracked move-by-move (it is an observable, not
    needed for acceptance), so the returned state's ``virial`` field is
    POISONED with NaN: any pressure computed from it is visibly wrong
    instead of silently stale.  ``resync_energy`` restores it (and clears
    the accumulated fp32 energy drift) before observable sampling.
    """
    c = state.positions.shape[0]
    n = spec.num_particles
    if n > MAX_PARTICLES:
        raise ValueError(
            f"pallas move kernel supports up to {MAX_PARTICLES} particles "
            f"(got {n}); use run_moves_auto for automatic dispatch")
    rows = ((n + ROWS - 1) // ROWS) * ROWS
    c_blk = c_blk_override or _pick_c_blk(rows)
    if sweep_chunk < 0:  # -1 = auto (measured rule); 0 forces single-shot
        sweep_chunk = _pick_sweep_chunk(rows)
    elif sweep_chunk > 0 and (rows % sweep_chunk != 0
                              or rows <= sweep_chunk):
        # the kernel would silently fall back to the single-shot sweeps at
        # trace time — a caller sweeping chunk configs would then time the
        # wrong kernel believing it measured a fused-chunk one (r4 advisor)
        raise ValueError(
            f"sweep_chunk={sweep_chunk} is ignored by the kernel: it must "
            f"divide rows={rows} and be < rows (pass -1 for the measured "
            f"auto rule, 0 for single-shot sweeps)")

    # pad the chain axis to a c_blk multiple (edge-replicated padding:
    # padded chains run real physics on copies and are discarded)
    c_pad = ((c + c_blk - 1) // c_blk) * c_blk
    pad = c_pad - c
    positions = jnp.concatenate(
        [state.positions, jnp.broadcast_to(state.positions[-1:],
                                           (pad, n, 2))]) \
        if pad else state.positions
    energy = jnp.concatenate(
        [state.energy, jnp.broadcast_to(state.energy[-1:], (pad,))]) \
        if pad else state.energy
    max_disp = jnp.concatenate(
        [state.max_disp, jnp.broadcast_to(state.max_disp[-1:], (pad,))]) \
        if pad else state.max_disp
    blocks = c_pad // c_blk

    # (C_pad, N, 2) -> (blocks, rows, C_BLK) planes
    def to_planes(coord):
        arr = positions[..., coord]  # (C_pad, N)
        arr = jnp.pad(arr, ((0, 0), (0, rows - n)))
        return (arr.reshape(blocks, c_blk, rows)
                .transpose(0, 2, 1)
                .reshape(blocks * rows, c_blk))

    px = to_planes(0)
    py = to_planes(1)
    e_in = jnp.broadcast_to(
        energy.reshape(blocks, 1, c_blk),
        (blocks, rows, c_blk)).reshape(blocks * rows, c_blk)
    md_in = jnp.broadcast_to(
        max_disp.reshape(blocks, 1, c_blk),
        (blocks, rows, c_blk)).reshape(blocks * rows, c_blk)
    zeros = jnp.zeros_like(e_in)
    if seed is None:
        # derive from chain 0's PRNG stream so successive calls get fresh
        # on-chip randomness (a fixed default would replay the stream)
        seed = jax.random.randint(state.key[0], (), 0, 2**31 - 1)
    seed_arr = jnp.asarray(seed, dtype=jnp.int32).reshape(1)

    blk = pl.BlockSpec((rows, c_blk), lambda i, s: (i, 0),
                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(blocks,),
        in_specs=[blk] * 5,
        out_specs=[blk] * 4,
    )

    px_o, py_o, e_o, acc_o = pl.pallas_call(
        functools.partial(_move_kernel, spec=spec, beta=beta,
                          num_moves=num_moves, rows=rows, c_blk=c_blk,
                          fast_math=fast_math, sweep_chunk=sweep_chunk),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((blocks * rows, c_blk), jnp.float32)
                   for _ in range(4)],
        # TPU-semantics interpreter (supports pltpu.prng_*) for CPU testing
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed_arr, px, py, e_in, md_in, zeros)

    def from_planes(plane):
        arr = (plane.reshape(blocks, rows, c_blk)
               .transpose(0, 2, 1)
               .reshape(c_pad, rows))
        return arr[:c, :n]

    new_pos = jnp.stack([from_planes(px_o), from_planes(py_o)], axis=-1)
    new_e = e_o.reshape(blocks, rows, c_blk)[:, 0, :].reshape(c_pad)[:c]
    accepts = acc_o.reshape(blocks, rows, c_blk)[:, 0, :].reshape(c_pad)[:c]

    new_keys = jax.vmap(lambda k: jax.random.split(k, 2)[0])(state.key)
    return state._replace(
        positions=new_pos,
        energy=new_e,
        virial=jnp.full_like(state.virial, jnp.nan),  # poisoned; see above
        attempts=state.attempts + num_moves,
        accepts=state.accepts + accepts.astype(state.accepts.dtype),
        key=new_keys,
    )


def run_production_pallas(spec: SystemSpec, beta: float, state: ChainState,
                          num_samples: int, sampling_frequency: int,
                          start_cycle: int = 0):
    """Production with observable sampling, move segments on the Pallas
    kernel: scan over ``num_samples`` blocks of ``sampling_frequency``
    moves, resyncing energy/virial (the kernel poisons the virial) before
    each observable record.  Drop-in for ``run_production_batch`` —
    observables leaves come back shaped (C, num_samples, ...).

    The per-block resync is one O(N^2) batched recompute per
    ``sampling_frequency`` moves — noise at N=3 and amortized by the
    pair kernel at large N — and doubles as drift control: the recorded
    energies are exact, not fp32-accumulated.
    """
    from flowstate_tpu.mcmc.metropolis import sample_observables
    from flowstate_tpu.mcmc.state import resync_energy

    def block(carry, i):
        s = run_moves_pallas(spec, beta, carry, sampling_frequency)
        s = resync_energy(spec, s)
        obs = sample_observables(
            spec, beta, s, start_cycle + (i + 1) * sampling_frequency)
        return s, obs

    state, obs = jax.lax.scan(block, state, jnp.arange(num_samples))
    # scan stacks on axis 0 (time); match run_production_batch's (C, T, ...)
    c = state.positions.shape[0]
    obs = jax.tree_util.tree_map(
        lambda x: (jnp.moveaxis(x, 0, 1) if x.ndim > 1
                   else jnp.broadcast_to(x[None], (c, x.shape[0]))), obs)
    return state, obs


def run_moves_auto(spec: SystemSpec, beta: float, state: ChainState,
                   num_moves: int, seed=None) -> ChainState:
    """Dispatch a move segment to the best engine for this workload.

    Pallas kernel on TPU for N <= MAX_PARTICLES (the regime where the
    whole per-move working set fits one VPU tile stack); the XLA scan
    engine (``metropolis.run_moves``) otherwise and on non-TPU backends.
    The XLA path tracks the virial exactly; after the Pallas path the
    virial is NaN-poisoned until ``resync_energy``.
    """
    n = spec.num_particles
    if n <= MAX_PARTICLES and jax.devices()[0].platform == "tpu":
        return run_moves_pallas(spec, beta, state, num_moves, seed=seed)
    from flowstate_tpu.mcmc.metropolis import run_moves
    return jax.vmap(lambda s: run_moves(spec, beta, s, num_moves))(state)
