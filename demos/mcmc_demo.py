"""MCMC demo — script equivalent of the reference's demos/MCMC_demo.ipynb.

A short baseline run of the batched engine on the 3-particle LJ double-well
system with plots of the sampled trajectory.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flowstate_tpu.experiments import mcmc_only
from flowstate_tpu.utils.config import mcmc_only_config


def main():
    config = mcmc_only_config(
        experiment_id="mcmc_demo", output_dir="demo_results",
        num_chains=10, equilibration_steps=5000,
        sampling_frequency=150, adjusting_frequency=5000)
    results = mcmc_only.run(config, total_production_steps=1_000_000)
    print("Demo finished:", results)


if __name__ == "__main__":
    main()
