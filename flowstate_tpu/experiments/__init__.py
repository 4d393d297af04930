"""Experiment drivers: baseline MCMC, hybrid algorithms, single runs, sweeps."""

from flowstate_tpu.experiments import (
    algorithm1,
    algorithm2,
    mcmc_only,
    single_run,
    sweep,
    train_npz,
)

__all__ = ["mcmc_only", "algorithm1", "algorithm2", "single_run", "sweep",
           "train_npz"]
