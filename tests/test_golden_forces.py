"""Golden per-atom force fixtures — the regression net.

The analog of the reference's force-style YAML tests
(unittest/force-styles/tests/bond-fene.yaml, epsilon 2.5e-13;
runner unittest/force-styles/test_bond_style.cpp:372-399): a fixed 8-bead
configuration with pinned per-atom forces, asserted against BOTH engines.
The pinned values were generated from the independent numpy formula
implementations (tests/helpers.py), NOT from the engine, so they detect
regressions in either.

The configuration exercises: an LJ contact pair, a pair under the 0.75-sigma
evaluation floor across the periodic boundary, a stretched FENE bond, a
WCA-active short bond, a two-chain topology, and an extruder (harmonic)
bond whose LJ is excluded.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lammps_le_tpu.fast import fast_supported, from_fast, to_fast
from lammps_le_tpu.integrate import Simulation
from lammps_le_tpu.integrate.verlet import setup
from lammps_le_tpu.fixes import NVE
from lammps_le_tpu.state import init_state
from lammps_le_tpu.system import (
    BOND_FENE,
    BOND_HARMONIC,
    BondParams,
    PairLJCut,
    build_system,
    chain_topology,
)

BOX = 10.0
X = np.array([
    [0.50, 0.50, 0.50],
    [1.45, 0.55, 0.50],
    [2.30, 0.70, 0.55],
    [3.10, 0.30, 0.60],
    [4.40, 0.40, 0.55],
    [9.80, 0.50, 0.45],
    [0.75, 1.40, 0.50],
    [1.60, 1.50, 0.60],
])

E_PAIR = 111.0965652859359
E_BOND = 197.12908272326183
F = np.array([
    [1687.059905382849, -75.49026030917045, 122.70917950754007],
    [-201.79021082018815, -81.24170190252732, -16.653072884578688],
    [117.65497127891865, 80.32057672025827, 6.068157663986043],
    [252.4381385204564, -34.933341881285884, -0.39771000675550533],
    [-160.27397260273995, -12.328767123287689, 6.1643835616438345],
    [-1598.068700021448, 113.55140186915855, -116.40076829258682],
    [-322.73964695199095, -63.644970623859564, -32.51480538827368],
    [225.71951521414317, 73.76706325071407, 31.02463583902474],
])


def _system(mode):
    nxt, prv, mol, bt = chain_topology([5, 3])
    ones = np.ones((1, 1))
    return build_system(
        n=8, n_types=1, box_lo=(0, 0, 0), box_hi=(BOX, BOX, BOX),
        next_bead=nxt, prev_bead=prv, molecule=mol, backbone_type=bt,
        masses=np.ones(1),
        pair=PairLJCut(epsilon=ones, sigma=ones, cutoff=1.12 * ones,
                       shift=True),
        bonds=BondParams(style=np.array([BOND_FENE, BOND_HARMONIC]),
                         coeffs=np.array([[30.0, 1.5, 1.0, 1.0],
                                          [3.0, 1.1, 0.0, 0.0]])),
        dtype="float64", max_extruders=4, skin=0.3, cell_cap=8,
        neighbor_mode=mode,
    )


def _state(system):
    state = init_state(system, X, seed=0)
    return state.replace(
        ex_left=jnp.asarray([1, -1, -1, -1], jnp.int32),
        ex_right=jnp.asarray([3, -1, -1, -1], jnp.int32),
    )


@pytest.mark.parametrize("mode", ["grid", "verlet"])
def test_general_path_matches_golden(mode):
    system = _system(mode)
    sim = Simulation(system=system, dt=0.005, fixes=(NVE(),), ex_btype=2)
    st = jax.jit(lambda s: setup(sim, s))(_state(system))
    np.testing.assert_allclose(np.asarray(st.f), F, rtol=1e-10, atol=1e-9)
    assert abs(float(st.epair) - E_PAIR) < 1e-9
    assert abs(float(st.ebond) - E_BOND) < 1e-9


def test_fast_path_matches_golden():
    system = _system("grid")
    sim = Simulation(system=system, dt=0.005, fixes=(NVE(),), ex_btype=2)
    assert fast_supported(sim)
    fs = to_fast(_state(system), sim)
    st = from_fast(fs, system)
    np.testing.assert_allclose(np.asarray(st.f), F, rtol=1e-10, atol=1e-9)
    assert abs(float(fs.epair) - E_PAIR) < 1e-9
    assert abs(float(fs.ebond) - E_BOND) < 1e-9
    assert int(fs.flags) == 0
