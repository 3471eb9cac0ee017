"""FIRE minimizer and CLI entry point."""

import os
import subprocess
import sys

import numpy as np

from lammps_le_tpu.fixes import NVE
from lammps_le_tpu.integrate import Simulation
from lammps_le_tpu.integrate.fire import minimize
from lammps_le_tpu.state import init_state

from helpers import relaxed_chain_system


def test_fire_relaxes_jittered_chain():
    system, x = relaxed_chain_system(n_chains=2, chain_len=15, box_l=24.0,
                                     jitter=0.15, dtype="float64")
    sim = Simulation(system=system, dt=0.002, fixes=(NVE(),))
    state = init_state(system, x)
    st, it, fmax = minimize(sim, state, ftol=1e-3, maxiter=2000)
    assert fmax < 1e-3
    assert it < 2000
    e0 = None  # energy decreased vs the start
    import jax

    from lammps_le_tpu.integrate.verlet import setup

    s0 = jax.jit(lambda s: setup(sim, s))(init_state(system, x))
    assert float(st.epair + st.ebond) < float(s0.epair + s0.ebond)


def test_cli_runs_deck(tmp_path):
    from lammps_le_tpu.io.data import write_data
    from lammps_le_tpu.scene import serpentine

    td = str(tmp_path)
    write_data(os.path.join(td, "d.data"), serpentine(150, seed=1))
    deck = """
units lj
special_bonds fene
read_data d.data
bond_style hybrid
bond_coeff 1 fene 30.0 1.5 1.0 1.0
bond_coeff 2 harmonic 3.0 1.1
pair_style lj/cut 1.12
pair_coeff * * 1.0 1.0 1.12
velocity all create $T 12345
fix 1 all nve
fix 2 all langevin $T $T 10.0 3
thermo 10
timestep 0.005
run 10
"""
    with open(os.path.join(td, "in.t"), "w") as fh:
        fh.write(deck)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; from lammps_le_tpu.__main__ import main;"
         f"sys.exit(main(['-in', r'{td}/in.t', '-var', 'T', '1.0']))"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Step" in out.stdout
    assert "Performance" in out.stdout


def test_cg_and_sd_relax_jittered_chain():
    """min_style cg / sd (src/min_cg.cpp, min_sd.cpp): Polak-Ribiere CG
    with energy-backtracking line search must relax the jittered chain
    and satisfy the reference's force-2-norm stopping criterion."""
    import jax

    from lammps_le_tpu.integrate.min_cg import minimize_cg
    from lammps_le_tpu.integrate.verlet import setup

    system, x = relaxed_chain_system(n_chains=2, chain_len=15, box_l=24.0,
                                     jitter=0.15, dtype="float64")
    sim = Simulation(system=system, dt=0.002, fixes=(NVE(),))
    s0 = jax.jit(lambda s: setup(sim, s))(init_state(system, x))
    e_start = float(s0.epair + s0.ebond)

    # reference-style usage: stop on relative energy change (decks pass
    # etol ~1e-4..1e-8; the 2-norm ftol rarely fires first, min_cg.cpp)
    st, it, fmax = minimize_cg(sim, init_state(system, x), etol=1e-8,
                               ftol=1e-3, maxiter=2000)
    assert it < 2000
    f2 = float(np.sqrt(np.sum(np.asarray(st.f) ** 2)))
    f2_0 = float(np.sqrt(np.sum(np.asarray(s0.f) ** 2)))
    assert f2 < 1e-2 * f2_0       # forces collapsed by >= 100x
    assert float(st.epair + st.ebond) < e_start

    st2, it2, _ = minimize_cg(sim, init_state(system, x), etol=1e-8,
                              ftol=1e-3, maxiter=4000, sd=True)
    f2sd = float(np.sqrt(np.sum(np.asarray(st2.f) ** 2)))
    assert f2sd < 1e-1 * f2_0
    assert float(st2.epair + st2.ebond) < e_start


def test_min_style_cg_deck(tmp_path):
    from lammps_le_tpu.deck import DeckRunner
    from lammps_le_tpu.io.data import write_data
    from lammps_le_tpu.scene import serpentine

    td = str(tmp_path)
    write_data(os.path.join(td, "d.data"), serpentine(150, seed=1))
    deck = """
units lj
atom_style bond
special_bonds fene
read_data d.data
neighbor 0.3 bin
bond_style fene
bond_coeff 1 30.0 1.5 1.0 1.0
pair_style lj/cut 1.12
pair_coeff * * 1.0 1.0 1.12
min_style cg
minimize 0.0 1.0e-3 200 1000
"""
    path = os.path.join(td, "in.min")
    with open(path, "w") as fh:
        fh.write(deck)
    r = DeckRunner(dtype="float64", quiet=True)
    r.run_file(path)
    f = np.asarray(r.state.f)
    assert np.isfinite(f).all()
