"""Integrator physics: NVE energy conservation, Langevin thermostat."""

import numpy as np
import jax
import jax.numpy as jnp

from lammps_le_tpu.integrate import Simulation, run, setup, thermo_row
from lammps_le_tpu.fixes import NVE, Langevin
from lammps_le_tpu.state import init_state

from helpers import random_chain_system, relaxed_chain_system


def test_nve_energy_conservation():
    system, x = relaxed_chain_system(n_chains=2, chain_len=20, box_l=24.0,
                                     seed=1, dtype="float64")
    sim = Simulation(system=system, dt=0.002, fixes=(NVE(),))
    rng = np.random.default_rng(0)
    v0 = rng.normal(scale=0.3, size=x.shape)
    v0 -= v0.mean(axis=0)
    state = init_state(system, x, v=v0)
    state = jax.jit(lambda s: setup(sim, s))(state)
    e0 = float(thermo_row(state, system).etotal)
    state, rows = run(sim, state, 300, thermo_every=100)
    e1 = float(thermo_row(state, system).etotal)
    assert int(state.flags) == 0
    # symplectic energy wobble is bounded; no drift beyond it
    assert abs(e1 - e0) / max(abs(e0), 1.0) < 2e-4


def test_langevin_thermalizes():
    system, x = relaxed_chain_system(n_chains=4, chain_len=20, box_l=24.0,
                                     seed=2, dtype="float32")
    sim = Simulation(
        system=system,
        dt=0.012,
        fixes=(NVE(), Langevin(t_start=1.0, t_stop=1.0, damp=10.0, seed=7)),
    )
    state = init_state(system, x, seed=3)
    state, rows = run(sim, state, 2500, thermo_every=500)
    temps = [float(r.temp) for r in rows[2:]]
    tbar = np.mean(temps)
    assert 0.75 < tbar < 1.25, temps
    # velocities should be gaussian-ish, nonzero
    assert float(jnp.abs(state.v).max()) > 0.1
