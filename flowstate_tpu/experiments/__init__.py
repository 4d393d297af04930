"""Experiment drivers: baseline MCMC, hybrid Algorithm 1, hybrid Algorithm 2."""

from flowstate_tpu.experiments import algorithm1, algorithm2, mcmc_only

__all__ = ["mcmc_only", "algorithm1", "algorithm2"]
