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


def test_langevin_zero_conserves_momentum():
    """fix langevin ... zero yes: the random-force group sum is adjusted
    to zero each step (src/fix_langevin.cpp zeroflag), so with NVE +
    equal masses and zero initial momentum the COM never random-walks."""
    import jax.numpy as jnp
    import numpy as np

    from lammps_le_tpu.fixes import NVE, Langevin
    from lammps_le_tpu.integrate import Simulation, run
    from lammps_le_tpu.state import init_state
    from tests.helpers import relaxed_chain_system

    system, x = relaxed_chain_system(n_chains=2, chain_len=24, seed=2)
    state = init_state(system, x, seed=3)

    def com_drift(zero):
        sim = Simulation(
            system=system, dt=0.005,
            fixes=(NVE(), Langevin(1.0, 1.0, 2.0, seed=9, zero=zero)))
        st, _ = run(sim, state, 40)
        return float(jnp.max(jnp.abs(jnp.sum(st.v, axis=0))))

    # drag term still acts per-atom, but starting from v=0 the ONLY
    # momentum source is the noise: zeroed noise keeps total v at
    # rounding noise, unzeroed random-walks orders of magnitude higher
    dz = com_drift(True)
    dn = com_drift(False)
    assert dz < 1e-3, dz
    assert dn > 10 * dz, (dn, dz)
