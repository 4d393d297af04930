"""Pallas pair-energy kernel vs the fused jnp oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowstate_tpu.ops import Box, SystemSpec, total_energy_virial
from flowstate_tpu.ops.pallas_pair import total_energy_virial_pallas


def _spec(n, rho=0.3):
    box = Box.from_density(n, rho, 1.0)
    return SystemSpec.create(n, box, num_wells=2, V0_list=(-10.0, -10.5),
                             r0=1.2, k=15.0)


@pytest.mark.parametrize("n", [3, 100, 300])
def test_pallas_matches_oracle(rng, n):
    spec = _spec(n)
    # space particles out to avoid hard-core overlaps
    from flowstate_tpu.mcmc import initialise_fcc
    pos, box = initialise_fcc(n, 0.3, 1.0)
    spec = SystemSpec.create(n, box, num_wells=2, V0_list=(-10.0, -10.5),
                             r0=1.2, k=15.0)
    pos = jnp.asarray(pos + rng.uniform(-0.05, 0.05, size=pos.shape))

    e_ref, w_ref = total_energy_virial(spec, pos)
    e, w = total_energy_virial_pallas(spec, pos, interpret=True)
    np.testing.assert_allclose(float(e), float(e_ref), rtol=2e-4, atol=1e-2)
    np.testing.assert_allclose(float(w), float(w_ref), rtol=2e-4, atol=1e-2)


def test_pallas_hard_core_inf(rng):
    spec = _spec(10)
    pos = jnp.asarray(rng.uniform(1, 5, size=(10, 2)))
    pos = pos.at[1].set(pos[0] + 0.1)  # overlap
    e, w = total_energy_virial_pallas(spec, pos, interpret=True)
    assert np.isinf(float(e)) and np.isinf(float(w))
