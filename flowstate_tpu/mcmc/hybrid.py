"""Hybrid flow ↔ MCMC coupling: batched independence "big moves".

TPU-native re-design of the reference's ``nf_big_move``
(``MCMC/monte_carlo.py:235-303``) and the judge helpers (:305-370).

The reference crosses the CPU↔GPU boundary twice per proposal, one config at
a time (monte_carlo.py:255-262) — the single biggest structural inefficiency
of the reference (SURVEY.md §3.5).  Here one device batch proposes a flow
sample per chain, evaluates old/new flow log-probs and total energies for
all chains at once, and applies the per-chain Metropolis–Hastings rule:

    log ratio = -beta * (U_new - U_old) - (NLL_new - NLL_old)
              = -beta * dU + log q(x_new) - log q(x_old)     (:268)

Coordinate frames: the MC box is [0, L)^2; the flow lives on the centered
torus [-L/2, L/2)^2 (the reference shuttles ±HALF_BOX at
main_algorithm_1.py:253, 336 — here the shift happens once, on device).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from flowstate_tpu.mcmc.state import ChainState
from flowstate_tpu.ops.pair_energy import SystemSpec, total_energy_virial


class BigMoveResult(NamedTuple):
    state: ChainState
    accepted: jnp.ndarray        # (C,) bool
    ratio_log: jnp.ndarray       # (C,) the MH log-ratio per chain
    proposal_energy: jnp.ndarray  # (C,)


def to_centered(positions: jnp.ndarray, half_box: float) -> jnp.ndarray:
    """MC box frame [0, L)^2 -> NF centered frame, flattened (C, N*2)."""
    centered = positions - half_box
    return centered.reshape(*positions.shape[:-2], -1)


def to_box_frame(flat: jnp.ndarray, num_particles: int,
                 half_box: float) -> jnp.ndarray:
    """NF centered flat (C, N*2) -> MC box frame (C, N, 2)."""
    pos = flat.reshape(*flat.shape[:-1], num_particles, 2)
    return pos + half_box


def nf_big_moves(spec: SystemSpec, beta: float, state: ChainState,
                 model, params, half_box: float,
                 paired: bool = True) -> BigMoveResult:
    """One flow-proposed independence move per chain, batched.

    ``model`` / ``params``: a ``flowstate_tpu.flows.NormalizingFlow`` and its
    params; each chain consumes a unique proposal (the reference draws one
    fresh flow sample per chain per attempt, main_algorithm_1.py:393).
    """
    c = state.positions.shape[0]

    # Per-chain key streams: chain i's acceptance uniform comes from its
    # own stream; the batched proposal draw uses a key folded AWAY from any
    # chain's stream (reusing chain 0's key verbatim would correlate chain
    # 0's accept threshold with its own proposal coordinates).
    keys = jax.vmap(jax.random.split)(state.key)  # (C, 2) keys
    new_chain_keys = keys[:, 0]
    k_move = keys[:, 1]
    k_prop = jax.random.fold_in(k_move[0], 0x9E3779B9)
    u = jax.vmap(lambda k: jax.random.uniform(k, ()))(k_move)  # (C,)

    old_flat = to_centered(state.positions, half_box)
    if paired:
        # proposal sweep + old-point log_prob sweep in ONE K-step lockstep
        # scan (sample_and_log_prob_with_old): the two sweeps are
        # data-independent and the coupling conditioner is
        # direction-independent, so pairing halves the serial
        # coupling-chain depth (+10% measured round rate; the corrected
        # two-roof accounting, ARCHITECTURE.md §2, shows the round's
        # arithmetic already ~80% VPU / ~60% MXU busy)
        prop_flat, log_q_new, log_q_old = model.sample_and_log_prob_with_old(
            params, k_prop, c, old_flat)
    else:
        # Batched proposal + its log-prob in ONE forward pass (the
        # reference samples then calls log_prob separately — twice the
        # flow work), old log-prob as a second sweep.
        prop_flat, log_q_new = model.sample_and_log_prob(params, k_prop, c)
        log_q_old = None
    proposals = to_box_frame(prop_flat, spec.num_particles, half_box)

    return apply_big_moves(spec, beta,
                           state._replace(key=new_chain_keys),
                           proposals, log_q_new, model, params, half_box, u,
                           log_q_old=log_q_old)


def apply_big_moves(spec: SystemSpec, beta: float, state: ChainState,
                    proposals: jnp.ndarray, log_q_new: jnp.ndarray,
                    model, params, half_box: float,
                    u: jnp.ndarray,
                    log_q_old: jnp.ndarray = None) -> BigMoveResult:
    """MH accept/reject for externally supplied proposals (C, N, 2).

    Used both by ``nf_big_moves`` and by Algorithm 1's testing phase where
    proposals come from a pre-generated sample bank
    (main_algorithm_1.py:376-395).  ``log_q_old`` may be supplied when the
    caller already computed it (the paired lockstep pass); otherwise it is
    evaluated here with an inverse flow sweep.
    """
    eno = state.energy
    viro = state.virial
    enn, virn = jax.vmap(lambda p: total_energy_virial(spec, p))(proposals)

    if log_q_old is None:
        old_flat = to_centered(state.positions, half_box)
        log_q_old = model.log_prob(params, old_flat)

    delta_e = enn - eno
    # Independence-sampler MH ratio:
    #   A = min(1, pi(new) q(old) / (pi(old) q(new)))
    #     = exp(-beta dU + log q(old) - log q(new)).
    # NOTE (documented reference BUG, not replicated): monte_carlo.py:264-268
    # computes -beta dU - (NLL_new - NLL_old) = -beta dU + log q(new)
    # - log q(old) — the Hastings correction INVERTED — which makes the
    # stationary distribution proportional to pi * q^2 / ... instead of pi.
    # Verified against exact quadrature of the partition-function ratio:
    # with the reference's sign the sampled dF is 0.66, with the correct
    # sign 1.49 = the exact ln(Z_B/Z_A) (see tools/exact_free_energy.py).
    ratio_log = -beta * delta_e + (log_q_old - log_q_new)

    # accept if ratio >= 1 or u < ratio  (monte_carlo.py:284-287);
    # an inf proposal energy gives ratio_log = -inf -> exp 0 -> reject.
    accept = u < jnp.exp(ratio_log)

    def sel(new, old):
        bshape = (accept.shape[0],) + (1,) * (new.ndim - 1)
        return jnp.where(accept.reshape(bshape), new, old)

    new_state = state._replace(
        positions=sel(proposals, state.positions),
        energy=jnp.where(accept, enn, eno),
        virial=jnp.where(accept, virn, viro),
        attempts=state.attempts + 1,
        accepts=state.accepts + accept.astype(state.accepts.dtype),
    )
    return BigMoveResult(state=new_state, accepted=accept,
                         ratio_log=ratio_log, proposal_energy=enn)


def judge_flow(spec: SystemSpec, beta: float, state: ChainState,
               proposals: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Energy-only Metropolis verdict per chain, without accepting.

    Reference ``judge_normalizing_flow`` (monte_carlo.py:305-329).
    """
    enn, _ = jax.vmap(lambda p: total_energy_virial(spec, p))(proposals)
    delta_e = enn - state.energy
    u = jax.random.uniform(key, delta_e.shape)
    return (delta_e <= 0.0) | (u < jnp.exp(-beta * delta_e))


def bulk_judge_flow(spec: SystemSpec, beta: float, configs: jnp.ndarray,
                    ref_energy: jnp.ndarray,
                    key: jax.Array) -> Tuple[jnp.ndarray, int]:
    """Batch Metropolis verdicts vs a fixed reference energy.

    Reference ``bulk_judge_normalizing_flow`` (monte_carlo.py:331-370):
    returns (number accepted, number attempted).
    """
    enn, _ = jax.vmap(lambda p: total_energy_virial(spec, p))(configs)
    delta_e = enn - ref_energy
    u = jax.random.uniform(key, delta_e.shape)
    accepted = (delta_e <= 0.0) | (u < jnp.exp(-beta * delta_e))
    return jnp.sum(accepted), configs.shape[0]
