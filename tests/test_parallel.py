"""Replica ensembles and multi-device sharding (8 virtual CPU devices)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from lammps_le_tpu.fixes import NVE, Langevin
from lammps_le_tpu.integrate import Simulation, thermo_row
from lammps_le_tpu.parallel import (
    make_replica_runner,
    replicate_state,
    sharded_replica_state,
)
from lammps_le_tpu.state import init_state

from helpers import relaxed_chain_system


def _sim(dtype="float32"):
    system, x = relaxed_chain_system(n_chains=2, chain_len=16, box_l=24.0,
                                     dtype=dtype)
    sim = Simulation(
        system=system, dt=0.005,
        fixes=(NVE(), Langevin(t_start=1.0, t_stop=1.0, damp=5.0, seed=3)),
    )
    return sim, init_state(system, x, seed=1)


def test_replicas_diverge_and_run():
    sim, state = _sim()
    setup, segment = make_replica_runner(sim)
    rstate = replicate_state(state, 4, seed=9)
    rstate = setup(rstate)
    rstate = segment(rstate, 30)
    assert rstate.x.shape[0] == 4
    x = np.asarray(rstate.x)
    # different PRNG keys -> different trajectories
    assert not np.allclose(x[0], x[1])
    temps = [float(thermo_row(jax.tree.map(lambda a: a[i], rstate),
                              sim.system).temp) for i in range(4)]
    assert all(np.isfinite(t) for t in temps)


def test_replicas_sharded_over_mesh():
    devices = jax.devices()
    if len(devices) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.asarray(devices).reshape(8), axis_names=("dp",))
    sim, state = _sim()
    with mesh:
        rstate = replicate_state(state, 8, seed=4)
        rstate = sharded_replica_state(rstate, mesh, axis="dp")
        setup, segment = make_replica_runner(sim, mesh=mesh, axis="dp")
        rstate = setup(rstate)
        rstate = segment(rstate, 10)
        out = jax.device_get(rstate.epair)
    assert out.shape == (8,)
    assert np.all(np.isfinite(out))


def test_graft_entry_dryrun():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert int(out.step) == int(args[0].step) + 1
    if len(jax.devices()) >= 8:
        ge.dryrun_multichip(8)
