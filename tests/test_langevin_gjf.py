"""fix langevin gjf/tally options (reference: src/fix_langevin.cpp:97-145).

The Gronbech-Jensen/Farago discretization's hallmark is exactness for
linear systems at ANY stable dt: free-particle kinetic temperature and
harmonic-bond configurational variance match kT with no timestep bias,
where the plain uniform-noise thermostat shows O(dt/damp) deviations.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lammps_le_tpu.fixes import NVE, Langevin
from lammps_le_tpu.integrate import Simulation, run
from lammps_le_tpu.state import init_state
from lammps_le_tpu.system import (
    BOND_HARMONIC,
    BondParams,
    build_system,
    chain_topology,
)


def _free_gas(n=512, box_l=40.0):
    """Non-interacting beads (no pair style, no bonds)."""
    nxt, prv, mol, btype = chain_topology([1] * n)
    system = build_system(
        n=n, n_types=1, box_lo=(0, 0, 0), box_hi=(box_l,) * 3,
        next_bead=nxt, prev_bead=prv, molecule=mol, backbone_type=btype,
        masses=np.ones(1), pair=None, bonds=None, dtype="float64",
    )
    rng = np.random.default_rng(11)
    x = rng.uniform(0, box_l, (n, 3))
    return system, x


def _dimer_gas(m=256, k_spring=1.0, box_l=60.0):
    """m two-bead molecules tethered by a harmonic bond with r0=0:
    the relative coordinate is linear (F = -2k d), so Boltzmann gives
    Var(d_x) = kT/(2k) per component, exactly."""
    nxt, prv, mol, btype = chain_topology([2] * m)
    bonds = BondParams(
        style=np.array([BOND_HARMONIC]),
        coeffs=np.array([[k_spring, 0.0, 0.0, 0.0]]),
    )
    system = build_system(
        n=2 * m, n_types=1, box_lo=(0, 0, 0), box_hi=(box_l,) * 3,
        next_bead=nxt, prev_bead=prv, molecule=mol, backbone_type=btype,
        masses=np.ones(1), pair=None, bonds=bonds, dtype="float64",
    )
    rng = np.random.default_rng(5)
    x = np.zeros((2 * m, 3))
    x[0::2] = rng.uniform(5, box_l - 5, (m, 3))
    x[1::2] = x[0::2] + rng.normal(scale=0.5, size=(m, 3))
    return system, x


def _mean_temp(system, x, fix, dt, nsteps=4000, thermo_every=100, skip=10):
    sim = Simulation(system=system, dt=dt, fixes=(NVE(), fix))
    state = init_state(system, x, seed=4)
    state, rows = run(sim, state, nsteps, thermo_every=thermo_every)
    assert int(state.flags) == 0
    return float(np.mean([float(r.temp) for r in rows[skip:]]))


@pytest.mark.parametrize("conv", ["vhalf", "vfull"])
def test_gjf_free_particle_temperature_exact(conv):
    """At dt/(2*damp) = 0.25 — a grotesquely large Langevin step — GJF
    holds the free-gas kinetic temperature at kT exactly (both the 2GJ
    half-step and the on-site velocity are exact for F=0)."""
    system, x = _free_gas()
    dt, damp = 0.5, 1.0
    t_gjf = _mean_temp(
        system, x, Langevin(1.0, 1.0, damp, seed=7, gjf=conv), dt)
    assert abs(t_gjf - 1.0) < 0.04, (conv, t_gjf)


def _dimer_bond_var(system, x, fix, dt):
    sim = Simulation(system=system, dt=dt, fixes=(NVE(), fix))
    state = init_state(system, x, seed=9)
    state, _ = run(sim, state, 1500)  # equilibrate
    samples = []
    for _ in range(60):
        state, _ = run(sim, state, 25)
        d = np.asarray(state.x[1::2] - state.x[0::2])
        L = np.asarray(system.box_size)
        samples.append(d - L * np.round(d / L))
    assert int(state.flags) == 0
    return float(np.var(np.concatenate(samples)))


def test_gjf_harmonic_configurational_sampling():
    """Configurational exactness (the GJF paper's headline result): the
    harmonic-dimer bond-vector variance matches kT/(2k) per component at
    a timestep a third of the stability limit, where the plain
    uniform-noise thermostat shows its O((omega dt)^2) bias."""
    system, x = _dimer_gas(k_spring=1.0)
    dt, damp = 0.3, 2.0  # omega = 2 -> stability at dt = 1
    var_gjf = _dimer_bond_var(
        system, x, Langevin(1.0, 1.0, damp, seed=3, gjf="vhalf"), dt)
    var_plain = _dimer_bond_var(
        system, x, Langevin(1.0, 1.0, damp, seed=3), dt)
    # kT/(2k) = 0.5; 256 dimers x 3 comps x 60 frames (correlated ~damp)
    assert abs(var_gjf - 0.5) < 0.035, var_gjf
    assert abs(var_plain - 0.5) > 2.0 * abs(var_gjf - 0.5), \
        (var_gjf, var_plain)


def test_langevin_tally_energy_bookkeeping():
    """tally yes: f_ID accumulates -sum(f_langevin . v) dt, so
    etotal + (-f_ID) is conserved up to integrator error — the energy
    the system gained is exactly what the reservoir lost."""
    system, x = _dimer_gas(m=64)
    dt = 0.01
    sim = Simulation(
        system=system, dt=dt,
        fixes=(NVE(), Langevin(1.0, 1.0, 5.0, seed=13, tally=True)))
    state = init_state(system, x, seed=2)  # v = 0: etotal rises to ~kT
    from lammps_le_tpu.integrate import setup, thermo_row

    import jax

    state = jax.jit(lambda s: setup(sim, s))(state)  # evaluate e0 energies
    e0 = float(thermo_row(state, system).etotal)
    state, _ = run(sim, state, 1200)
    e1 = float(thermo_row(state, system).etotal)
    gained = e1 - e0
    paid = -float(state.therm_e)  # reservoir's ledger
    assert gained > 50.0  # the run really did heat up from v=0
    # the ledger samples f_langevin . v at the post-kick velocity (the
    # reference's end_of_step convention), whose per-step bias is
    # O(dt/damp) — shrinks linearly with dt
    assert abs(gained - paid) / gained < 0.05, (gained, paid)


def test_gjf_tally_energy_bookkeeping():
    """gjf vhalf + tally yes (fix_langevin.cpp post_force<GJF,TALLY>):
    the reservoir ledger balances the system's energy gain.  The
    reference dots flangevin with the gjf-scaled lv velocities; the
    gjfsib factors cancel, leaving (gamma1 v + fran_prev) . v at the
    stored velocities (see verlet.py)."""
    system, x = _dimer_gas(m=64)
    dt = 0.01
    sim = Simulation(
        system=system, dt=dt,
        fixes=(NVE(),
               Langevin(1.0, 1.0, 5.0, seed=13, gjf="vhalf", tally=True)))
    state = init_state(system, x, seed=2)  # v = 0: etotal rises to ~kT
    from lammps_le_tpu.integrate import setup, thermo_row

    import jax

    state = jax.jit(lambda s: setup(sim, s))(state)
    e0 = float(thermo_row(state, system).etotal)
    state, _ = run(sim, state, 1200)
    e1 = float(thermo_row(state, system).etotal)
    gained = e1 - e0
    paid = -float(state.therm_e)
    assert gained > 50.0
    assert abs(gained - paid) / gained < 0.05, (gained, paid)


def test_gjf_zero_conserves_group_momentum():
    """gjf + zero yes: the random force sums to zero over the group each
    step (fix_langevin.cpp Tp_ZERO), so a zero-momentum free gas stays at
    exactly zero total momentum (drag is proportional to the zero total)."""
    system, x = _free_gas(n=128)
    sim = Simulation(system=system, dt=0.05, fixes=(
        NVE(), Langevin(1.0, 1.0, 2.0, seed=21, gjf="vhalf", zero=True)))
    state = init_state(system, x, seed=6)  # v = 0
    state, _ = run(sim, state, 400)
    p = np.asarray(state.v).sum(axis=0)
    vrms = float(np.sqrt(np.mean(np.asarray(state.v) ** 2)))
    assert vrms > 0.5  # thermalized
    assert np.all(np.abs(p) < 1e-8 * 128 * vrms), p


def test_gjf_validation_errors():
    system, x = _free_gas(n=8, box_l=10.0)
    from lammps_le_tpu.integrate.verlet import make_step
    from lammps_le_tpu.fixes import NVELimit

    with pytest.raises(ValueError, match="exactly one group-all fix nve"):
        make_step(Simulation(system=system, dt=0.1, fixes=(
            NVELimit(xmax=0.1), Langevin(1.0, 1.0, 1.0, gjf="vfull"))))
    with pytest.raises(ValueError, match="vfull"):
        make_step(Simulation(system=system, dt=0.1, fixes=(
            NVE(), Langevin(1.0, 1.0, 1.0, gjf="bogus"))))


def test_deck_langevin_gjf_tally_surface(tmp_path):
    """Deck parsing: gjf/tally keywords reach the fix; bare f_ID thermo
    column reports the tally."""
    import os

    from lammps_le_tpu.deck import DeckRunner
    from lammps_le_tpu.io.data import write_data
    from lammps_le_tpu.scene import serpentine

    td = str(tmp_path)
    write_data(os.path.join(td, "sys.data"), serpentine(120, seed=3))
    base = """
units lj
atom_style bond
special_bonds fene
read_data sys.data
pair_style lj/cut 1.12246
pair_coeff * * 1.0 1.0
bond_style fene
bond_coeff * 30.0 1.5 1.0 1.0
velocity all create 1.0 4711
fix 1 all nve
fix 2 all langevin 1.0 1.0 10.0 77 {opts}
thermo 20
{extra}
run 40
"""
    with open(os.path.join(td, "in.tally"), "w") as fh:
        fh.write(base.format(opts="tally yes",
                             extra="thermo_style custom step temp f_2"))
    r = DeckRunner(dtype="float32", quiet=True)
    r.run_file(os.path.join(td, "in.tally"))
    assert r.fixes["2"].tally
    assert float(r.state.therm_e) != 0.0

    with open(os.path.join(td, "in.gjf"), "w") as fh:
        fh.write(base.format(opts="gjf vfull", extra=""))
    r2 = DeckRunner(dtype="float32", quiet=True)
    r2.run_file(os.path.join(td, "in.gjf"))
    assert r2.fixes["2"].gjf == "vfull"
    assert int(r2.state.flags) == 0
