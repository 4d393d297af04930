"""MBAR — multistate Bennett acceptance ratio free-energy estimator.

Capability extension beyond the reference (whose only ΔF estimator is the
occupancy-ratio log, ``hybrid_NF_MCMC/utils.py:61-101``): MBAR (Shirts &
Chodera 2008) pools the samples of EVERY thermodynamic state — e.g. all
replicas of a parallel-tempering ladder (``mcmc/tempering.py``) — into one
statistically optimal estimate of the state free energies and of
expectations at any state, instead of discarding all but the cold replica.

Everything is fixed-shape jnp: the self-consistent iteration

    f_k = -logsumexp_n [ -u_k(x_n) - logsumexp_l (log N_l + f_l - u_l(x_n)) ]

runs as a ``lax.scan`` with a static iteration count (damped, monotone in
practice), so the whole estimator jits and differentiates.

Conventions: ``u_kn[k, n]`` is the REDUCED potential beta_k * U(x_n) of
pooled sample n evaluated in state k; ``n_k[k]`` is how many of the pooled
samples came from state k; returned ``f_k`` satisfies f_0 = 0 and
f_k = -ln(Z_k / Z_0).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp


def mbar_free_energies(u_kn: jnp.ndarray, n_k: jnp.ndarray,
                       num_iters: int = 500) -> jnp.ndarray:
    """Solve the MBAR equations; returns f_k with f[0] = 0."""
    u_kn = jnp.asarray(u_kn, dtype=jnp.float64)
    log_n = jnp.log(jnp.asarray(n_k, dtype=jnp.float64))

    def step(f, _):
        # (N,) log of the mixture denominator at every pooled sample
        log_denom = logsumexp(log_n[:, None] + f[:, None] - u_kn, axis=0)
        f_new = -logsumexp(-u_kn - log_denom[None, :], axis=1)
        f_new = f_new - f_new[0]
        return f_new, None

    f0 = jnp.zeros(u_kn.shape[0], dtype=jnp.float64)
    f, _ = jax.lax.scan(step, f0, None, length=num_iters)
    return f


def mbar_log_weights(u_kn: jnp.ndarray, n_k: jnp.ndarray,
                     f_k: jnp.ndarray, target_k: int) -> jnp.ndarray:
    """(N,) normalized log-weights of the pooled samples at state target_k."""
    u_kn = jnp.asarray(u_kn, dtype=jnp.float64)
    log_n = jnp.log(jnp.asarray(n_k, dtype=jnp.float64))
    log_denom = logsumexp(log_n[:, None] + f_k[:, None] - u_kn, axis=0)
    log_w = -u_kn[target_k] - log_denom
    return log_w - logsumexp(log_w)


def mbar_expectation(u_kn: jnp.ndarray, n_k: jnp.ndarray, f_k: jnp.ndarray,
                     observable_n: jnp.ndarray, target_k: int) -> jnp.ndarray:
    """<A>_target over the pooled samples (reweighted to state target_k)."""
    log_w = mbar_log_weights(u_kn, n_k, f_k, target_k)
    return jnp.sum(jnp.exp(log_w) * jnp.asarray(observable_n,
                                                dtype=jnp.float64))


def pt_well_delta_f(energies: jnp.ndarray, betas: jnp.ndarray,
                    all_a_n: jnp.ndarray, all_b_n: jnp.ndarray,
                    num_iters: int = 500) -> Tuple[float, jnp.ndarray]:
    """ΔF = ln P(all B)/P(all A) at the COLD state from ALL replicas.

    Args:
      energies: (R, M) potential energies of every replica's M recorded
        samples (``ReplicaExchangeResult`` with ``record='all'``).
      betas: (R,) the ladder.
      all_a_n / all_b_n: (R*M,) bool indicators of the pooled samples
        (row-major pooling: replica 0's samples first).
    Returns (delta_f, f_k).
    """
    r, m = energies.shape
    e_n = energies.reshape(-1)                       # pooled (N,)
    u_kn = betas[:, None] * e_n[None, :]             # (R, N)
    n_k = jnp.full((r,), m)
    f_k = mbar_free_energies(u_kn, n_k, num_iters)
    log_w = mbar_log_weights(u_kn, n_k, f_k, 0)      # cold state
    log_pb = logsumexp(jnp.where(all_b_n, log_w, -jnp.inf))
    log_pa = logsumexp(jnp.where(all_a_n, log_w, -jnp.inf))
    return float(log_pb - log_pa), f_k
