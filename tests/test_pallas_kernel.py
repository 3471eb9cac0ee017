"""Pallas fused-kernel equality vs the XLA kernel (interpreter mode).

Runs the TPU kernel through the Pallas interpreter on CPU so the fast
engine's production compute path has CI coverage without TPU hardware
(the r1 review flagged the opposite situation — an untested opt-in kernel
— as debt)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lammps_le_tpu.fast.engine import fast_maps, make_kernel, to_fast
from lammps_le_tpu.fixes import NVE, Langevin
from lammps_le_tpu.integrate import Simulation, run as run_general
from lammps_le_tpu.io.data import system_from_data
from lammps_le_tpu.scene import serpentine
from lammps_le_tpu.state import init_state
from lammps_le_tpu.system import BondParams, PairLJCut, BOND_FENE, BOND_HARMONIC


def test_pallas_kernel_matches_xla_interpret():
    from lammps_le_tpu.fast.pallas_kernel import make_pallas_kernel

    n = 600
    data = serpentine(n, spacing=0.97, row_gap=1.1, seed=3,
                      barrier_fraction=0.01)
    ones = np.ones((4, 4))
    pair = PairLJCut(epsilon=ones, sigma=ones, cutoff=1.12 * ones,
                     shift=True)
    bonds = BondParams(
        style=np.array([BOND_FENE, BOND_HARMONIC]),
        coeffs=np.array([[30.0, 1.5, 1.0, 1.0], [3.0, 1.1, 0.0, 0.0]]),
    )
    system, _ = system_from_data(
        data, pair=pair, bonds=bonds, dtype="float32", ex_btype=2,
        max_extruders=8, skin=0.3, rebuild_every=2, cell_cap=8,
    )
    warm = Simulation(system=system, dt=0.006,
                      fixes=(NVE(), Langevin(1.0, 1.0, 1.0, seed=5)),
                      ex_btype=2)
    state = init_state(system, data.x, types=data.types, seed=11)
    state, _ = run_general(warm, state, 60)
    state = state.replace(
        ex_left=jnp.asarray([10, 200, -1, -1, -1, -1, -1, -1], jnp.int32),
        ex_right=jnp.asarray([14, 202, -1, -1, -1, -1, -1, -1], jnp.int32),
    )
    sim = Simulation(system=system, dt=0.006, fixes=(NVE(),), ex_btype=2)
    fs = to_fast(state, sim)

    maps = fast_maps(system)
    xla_k = make_kernel(system, maps, 2)
    pal_k = make_pallas_kernel(system, maps, 2, tile=256, interpret=True)

    for energy in (True, False):
        gf_x, el_x, eb_x, fl_x, cl_x = xla_k(fs.gx, fs.bid, fs.hn, fs.pid,
                                             energy)
        gf_p, el_p, eb_p, fl_p, cl_p = pal_k(fs.gx, fs.bid, fs.hn, fs.pid,
                                             energy)
        scale = float(jnp.max(jnp.abs(gf_x)))
        err = float(jnp.max(jnp.abs(gf_p - gf_x)))
        assert err < 2e-4 * max(scale, 1.0), (energy, err, scale)
        if energy:
            assert abs(float(el_p) - float(el_x)) < 5e-2 + 1e-4 * abs(float(el_x))
            assert abs(float(eb_p) - float(eb_x)) < 5e-2 + 1e-4 * abs(float(eb_x))
        assert int(cl_p) == int(cl_x)
        assert int(fl_p) == int(fl_x)
