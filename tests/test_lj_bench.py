"""Stock lj melt bench parity (bench/in.lj): lattice/region/create_box/
create_atoms build the exact fcc melt, and step-0 thermo matches the
committed reference log to ~1e-7 (reference: bench/in.lj,
bench/log.6Oct16.lj.fixed.icc.1; lattice.cpp lj-units spacing,
create_atoms.cpp box fill)."""

import numpy as np
import pytest

from lammps_le_tpu.deck import DeckRunner
from lammps_le_tpu.deck.runner import DeckError


def _setup(n_cells=20):
    r = DeckRunner(dtype="float64", quiet=True)
    for cmd in [
        "units lj", "atom_style atomic",
        "lattice fcc 0.8442",
        f"region box block 0 {n_cells} 0 {n_cells} 0 {n_cells}",
        "create_box 1 box",
        "create_atoms 1 box",
        "mass 1 1.0",
        "velocity all create 1.44 87287 loop geom",
        "pair_style lj/cut 2.5",
        "pair_coeff 1 1 1.0 1.0 2.5",
        "neighbor 0.3 bin",
        "neigh_modify delay 0 every 20 check no",
        "fix 1 all nve",
    ]:
        parts = cmd.split()
        r.command(parts[0], parts[1:])
    return r


def test_lj_melt_step0_golden():
    """32k-atom fcc melt: E_pair/atom, T, and P at step 0 equal the
    reference log (velocity seeds differ only in the kinetic sector, which
    the temperature rescale pins)."""
    r = _setup(20)
    r._build()
    assert r.system.n == 32000
    np.testing.assert_allclose(r.system.box_size, [33.59192382765015] * 3)

    from lammps_le_tpu.integrate.verlet import setup, thermo_row
    from lammps_le_tpu.observe.pressure import make_pressure_fn

    st = setup(r.sim, r.state)
    row = thermo_row(st, r.system)
    assert abs(float(row.epair) / r.system.n - (-6.7733681)) < 1e-6
    assert abs(float(row.temp) - 1.44) < 1e-12
    press = float(make_pressure_fn(r.system, -1)(st))
    assert abs(press - (-5.0197073)) < 1e-6


def test_lj_melt_short_run_conserves():
    """A short NVE run on a small melt stays finite and cools from the
    lattice start exactly like the reference (T drops toward ~0.75 as
    potential energy is released; log line 100)."""
    r = _setup(5)   # 500 atoms: fast on the CPU test host
    r.command("thermo", ["20"])
    r.command("timestep", ["0.005"])
    from lammps_le_tpu.integrate.verlet import setup, thermo_row

    r._build()
    row0 = thermo_row(setup(r.sim, r.state), r.system)
    etot0 = (float(row0.epair) + float(row0.ke)) / r.system.n
    r.command("run", ["40"])
    row = thermo_row(r.state, r.system)
    etot = (float(row.epair) + float(row.ke)) / r.system.n
    # the melt start is violent; the reference itself drifts ~9e-3/atom
    # over its first 100 steps (log TotEng -4.6134 -> -4.6224)
    assert abs(etot - etot0) < 2e-2
    assert 0.5 < float(row.temp) < 1.44


def test_region_requires_lattice_rules():
    r = DeckRunner(dtype="float64", quiet=True)
    r.command("units", ["lj"])
    with pytest.raises(DeckError):
        r.command("region", ["box", "cone", "x", "0", "0", "2", "5", "0",
                             "4"])  # style beyond block/sphere
    r.command("lattice", ["fcc", "0.8442"])
    r.command("region", ["box", "block", "0", "2", "0", "2", "0", "2"])
    with pytest.raises(DeckError):
        r.command("create_atoms", ["1", "box"])  # no create_box yet
