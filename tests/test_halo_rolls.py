"""Masked-roll halo refresh == the src_cols gather, bit-exact.

Round 5 replaced the per-step (3, cap, P) halo column gather with six
masked rolls (engine._halo_refresh: 21.0 -> 1.45 ms at 1M on hardware,
probe_1m_components).  This pins exact equivalence on multiple grid
geometries: after one gather pass (which canonicalizes the lane-padding
tail), roll-refresh and gather-refresh agree on EVERY column, floats
and int planes both.
"""

import numpy as np

import jax
import jax.numpy as jnp

from lammps_le_tpu.fast.engine import (_halo_refresh, _halo_refresh_int,
                                       fast_maps)
from lammps_le_tpu.io.data import system_from_data
from lammps_le_tpu.scene import serpentine
from lammps_le_tpu.system import (BOND_FENE, BOND_HARMONIC, BondParams,
                                  PairLJCut)


def _system(n, skin, cap):
    data = serpentine(n, spacing=0.97, row_gap=1.1, seed=3)
    ones = np.ones((4, 4))
    pair = PairLJCut(epsilon=ones, sigma=ones, cutoff=1.12 * ones,
                     shift=True)
    bonds = BondParams(
        style=np.array([BOND_FENE, BOND_HARMONIC]),
        coeffs=np.array([[30.0, 1.5, 1.0, 1.0], [3.0, 1.1, 0.0, 0.0]]),
    )
    system, _ = system_from_data(
        data, pair=pair, bonds=bonds, dtype="float32", ex_btype=2,
        max_extruders=32, skin=skin, rebuild_every=4, cell_cap=cap,
    )
    return system


def _gather_ref(gx, maps):
    src = jnp.asarray(maps.src_cols)
    sh = jnp.asarray(maps.shifts.T, gx.dtype)[:, None, :]
    return gx[:, :, src] + sh


def test_roll_refresh_bit_exact_vs_gather():
    for n, skin, cap in [(1500, 0.3, 8), (4000, 0.5, 9), (900, 0.4, 10)]:
        system = _system(n, skin, cap)
        maps = fast_maps(system)
        key = jax.random.PRNGKey(n)
        gx = jax.random.uniform(
            key, (3, maps.cap, maps.P), jnp.float32,
            minval=0.0, maxval=float(min(system.box_size)))
        g1 = _gather_ref(gx, maps)          # canonicalize tail columns
        want = _gather_ref(g1, maps)
        got = _halo_refresh(g1, maps)
        assert np.array_equal(np.asarray(want), np.asarray(got)), (
            n, skin, cap,
            float(jnp.max(jnp.abs(want - got))))


def test_roll_refresh_int_matches_gather():
    system = _system(2000, 0.4, 9)
    maps = fast_maps(system)
    key = jax.random.PRNGKey(7)
    ints = jax.random.randint(key, (3, maps.cap, maps.P), -1, 2000,
                              jnp.int32)
    src = jnp.asarray(maps.src_cols)
    i1 = ints[:, :, src]
    want = i1[:, :, src]
    got = _halo_refresh_int(i1, maps)
    assert np.array_equal(np.asarray(want), np.asarray(got))
