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
