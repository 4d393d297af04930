"""Shared experiment plumbing: setup, equilibration, artifact dumps.

Factored from the common preamble of the three reference drivers
(``main_mcmc_only.py``, ``main_algorithm_1.py``, ``main_algorithm_2.py``):
directory layout, params.json provenance, per-run loggers, alternating-well
chain init, equilibration, and the CSV/NPY artifact dumps
(main_algorithm_1.py:499-548).
"""

from __future__ import annotations

import csv
import logging
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flowstate_tpu.analysis.plots import plot_potential
from flowstate_tpu.mcmc import (
    ChainState, init_alternating_wells, init_chain_state,
    run_equilibration_batch,
)
from flowstate_tpu.ops import Box, SystemSpec
from flowstate_tpu.utils.config import ExperimentConfig
from flowstate_tpu.utils.logging import MetricsWriter, setup_logger


def build_system(config: ExperimentConfig) -> SystemSpec:
    box = Box.from_density(config.num_particles, config.rho,
                           config.aspect_ratio)
    return SystemSpec.create(
        config.num_particles, box, num_wells=config.num_wells,
        V0_list=config.V0_list, r0=config.r0, k=config.k_val)


def setup_experiment(config: ExperimentConfig
                     ) -> Tuple[str, logging.Logger, MetricsWriter]:
    """Create the experiment directory tree + logger + metrics stream.

    Mirrors main_algorithm_1.py:80-134 (directory, experiment.log,
    params.json) with an added metrics.jsonl.  Also enables the persistent
    compilation cache so repeated runs skip device recompiles.
    """
    from flowstate_tpu.utils.profiling import enable_compilation_cache
    try:
        enable_compilation_cache()
    except Exception:
        pass
    directory = os.path.join(config.output_dir, config.experiment_id)
    os.makedirs(directory, exist_ok=True)
    os.makedirs(os.path.join(directory, "mc_runs"), exist_ok=True)
    os.makedirs(os.path.join(directory, "training_rounds"), exist_ok=True)
    logger = setup_logger("experiment",
                          os.path.join(directory, "experiment.log"),
                          stream_level=logging.INFO)
    config.save(os.path.join(directory, "params.json"))
    metrics = MetricsWriter(os.path.join(directory, "metrics.jsonl"))
    logger.info("half box is: %s", config.half_box)
    logger.info("Directory created at: %s", directory)
    return directory, logger, metrics


def init_and_equilibrate(config: ExperimentConfig, spec: SystemSpec,
                         logger: Optional[logging.Logger] = None
                         ) -> ChainState:
    """Alternating-well init + adaptive equilibration, fully jitted.

    Reference: per-run init loop main_algorithm_1.py:136-199 +
    equilibration main_algorithm_1.py:203-210.
    """
    positions, _ = init_alternating_wells(
        config.num_chains, config.num_particles, config.rho,
        config.aspect_ratio)
    state = init_chain_state(spec, jnp.asarray(positions),
                             jax.random.key(config.master_seed),
                             config.initial_max_displacement)
    if logger:
        logger.info("All %d chains initialised (alternating wells)",
                    config.num_chains)
    state = run_equilibration_batch(
        spec, config.beta, state, config.equilibration_steps,
        config.adjusting_frequency, config.target_acceptance)
    if logger:
        logger.info("Equilibration done: %d steps/chain",
                    config.equilibration_steps)
    return state


def plot_wells(config: ExperimentConfig, spec: SystemSpec,
               directory: str) -> None:
    plot_potential(spec.box.size_x, spec.box.size_y, list(config.V0_list),
                   config.r0, config.k_val, config.num_wells, directory)


def dump_run_artifacts(directory: str, run_idx: int,
                       observables, testing_configs: Optional[np.ndarray]
                       ) -> None:
    """Per-run sampled_data.csv + configs NPY; main_algorithm_1.py:499-548."""
    run_dir = os.path.join(directory, "mc_runs", f"run_{run_idx + 1:03d}")
    os.makedirs(run_dir, exist_ok=True)

    csv_path = os.path.join(run_dir, "sampled_data.csv")
    with open(csv_path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["cycle_number", "energy_per_particle", "density",
                         "pressure", "box_size_x", "box_size_y",
                         "particle_configuration"])
        t = len(observables.cycle)
        for i in range(t):
            writer.writerow([
                int(observables.cycle[i]),
                float(observables.energy_per_particle[i]),
                float(observables.density[i]),
                float(observables.pressure[i]),
                float(observables.box_size_x[i]),
                float(observables.box_size_y[i]),
                np.asarray(observables.positions[i]).flatten().tolist(),
            ])

    np.save(os.path.join(run_dir, "mc_run_configs.npy"),
            np.asarray(observables.positions))
    if testing_configs is not None:
        np.save(os.path.join(run_dir, "mc_run_testing_configs.npy"),
                np.asarray(testing_configs))
