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
