"""Pallas TPU kernel: tiled pair-energy for large particle counts.

For the reference's N=3 the fused jnp path (``ops/pair_energy.py``) is
optimal — XLA emits one tiny VPU expression.  This kernel is the scaling
story (SURVEY.md §5 long-context note: pair-energy tiling is this workload's
analogue of blockwise attention): at N in the thousands the O(N^2) distance
matrix no longer fits VMEM, so pairs are tiled over a 2-D grid; each
(TI, TJ) tile loads two position blocks into VMEM, computes min-image
LJ energies on the VPU in fp32, masks the upper triangle and padding, and
writes per-tile partial sums (energy, virial, overlap count) that a cheap
XLA reduction folds afterwards.

Semantics match ``total_energy_virial``: truncated-shifted LJ + external
double well; any pair inside the hard core makes the total ``+inf``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flowstate_tpu.ops.pair_energy import SystemSpec, _external_energy

TILE = 256  # particles per block: (256, 256) fp32 pair tile = 256 KB VMEM


def _pair_tile_kernel(pos_i_ref, pos_j_ref, out_ref, *, spec: SystemSpec,
                      n_particles: int):
    """One (TILE, TILE) pair tile -> partial (energy, virial, overlaps)."""
    ti = pl.program_id(0)
    tj = pl.program_id(1)

    xi = pos_i_ref[:, 0][:, None]  # (T, 1)
    yi = pos_i_ref[:, 1][:, None]
    xj = pos_j_ref[:, 0][None, :]  # (1, T)
    yj = pos_j_ref[:, 1][None, :]

    lx, ly = spec.box.size_x, spec.box.size_y
    dx = xi - xj
    dy = yi - yj
    dx = dx - lx * jnp.round(dx / lx)
    dy = dy - ly * jnp.round(dy / ly)
    r_sq = dx * dx + dy * dy

    # global indices for triangle + padding masks
    gi = ti * TILE + jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
    gj = tj * TILE + jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
    valid = (gi < gj) & (gi < n_particles) & (gj < n_particles)

    r = jnp.sqrt(jnp.maximum(r_sq, 1e-24))
    r_cut = spec.cutoff
    in_range = valid & (r <= r_cut)
    inv_r = 1.0 / jnp.maximum(r, 1e-12)
    sr6 = (spec.sigma * inv_r) ** 6
    sr12 = sr6 * sr6
    sr6_cut = (spec.sigma / r_cut) ** 6
    shift = 4.0 * spec.epsilon * (sr6_cut * sr6_cut - sr6_cut)
    e_pair = 4.0 * spec.epsilon * (sr12 - sr6) - shift
    w_pair = 48.0 * spec.epsilon * (sr12 - 0.5 * sr6)

    zero = jnp.zeros_like(e_pair)
    energy = jnp.sum(jnp.where(in_range, e_pair, zero))
    virial = jnp.sum(jnp.where(in_range, w_pair, zero))
    overlaps = jnp.sum(jnp.where(valid & (r < spec.hard_core), 1.0, 0.0))

    # Pack the three scalars into row 0 of an (8, 128)-aligned block (the
    # minimum fp32 VMEM tile; sub-tile scalar outputs are rejected by Mosaic).
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    block = jnp.where((r_ids == 0) & (c_ids == 0), energy, 0.0)
    block = jnp.where((r_ids == 0) & (c_ids == 1), virial, block)
    block = jnp.where((r_ids == 0) & (c_ids == 2), overlaps, block)
    out_ref[:, :] = block


def total_energy_virial_pallas(spec: SystemSpec, positions: jnp.ndarray,
                               interpret: bool = False
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tiled pair energy/virial of an (N, 2) configuration (large-N path).

    ``interpret=True`` runs the kernel in interpreter mode (CPU testing).
    """
    n = positions.shape[0]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    pos = jnp.pad(positions.astype(jnp.float32),
                  ((0, n_pad - n), (0, 0)))
    n_tiles = n_pad // TILE

    partials = pl.pallas_call(
        functools.partial(_pair_tile_kernel, spec=spec, n_particles=n),
        grid=(n_tiles, n_tiles),
        in_specs=[
            pl.BlockSpec((TILE, 2), lambda i, j: (i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((TILE, 2), lambda i, j: (j, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i, j: (i * n_tiles + j, 0),
                               memory_space=pl.ANY if interpret
                               else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * n_tiles * 8, 128),
                                       jnp.float32),
        interpret=interpret,
    )(pos, pos)

    scalars = partials.reshape(-1, 8, 128)[:, 0, :3]  # (tiles, 3)
    energy = jnp.sum(scalars[:, 0]) + _external_energy(spec, positions)
    virial = jnp.sum(scalars[:, 1])
    overlap = jnp.sum(scalars[:, 2]) > 0

    inf = jnp.asarray(jnp.inf, dtype=energy.dtype)
    return (jnp.where(overlap, inf, energy), jnp.where(overlap, inf, virial))
