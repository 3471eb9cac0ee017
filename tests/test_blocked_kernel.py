"""Layer-blocked Pallas force kernel vs the XLA kernel (interpreter mode).

The blocked kernel (fast/blocked_kernel.py) is the production stencil for
grids too large for whole-plane VMEM residency (1M-bead scale).  Pins
force/energy/flag parity against engine.make_kernel on small grids, with
block widths chosen to exercise NB=1, evenly-divided, and partial-last-
block window layouts (the margin fold-back paths differ per case).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lammps_le_tpu.fast.engine import fast_maps, make_kernel, to_fast
from lammps_le_tpu.fixes import NVE, Langevin
from lammps_le_tpu.integrate import Simulation, run as run_general
from lammps_le_tpu.io.data import system_from_data
from lammps_le_tpu.scene import serpentine
from lammps_le_tpu.state import init_state
from lammps_le_tpu.system import (BOND_FENE, BOND_HARMONIC, BondParams,
                                  PairLJCut)


def _make_case(n=600, seed=3):
    data = serpentine(n, spacing=0.97, row_gap=1.1, seed=seed,
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
    return system, fs


def test_pick_cl_per_cap_envelope():
    """pick_cl sizes chunks from MEASURED per-cap VMEM coefficients
    (cap-8 spills ~2.1x/lane more than cap-9, hardware 2026-08-19);
    uncalibrated caps extrapolate from the worst point."""
    from lammps_le_tpu.fast.blocked_kernel import (_BYTES_PER_LANE,
                                                   _VMEM_BUDGET, pick_cl)

    for cap in (7, 8, 9, 10, 12):
        M = 5952
        cl = pick_cl(10_000_000, M, cap)
        assert cl % 128 == 0 and cl >= 1024
        bpl = _BYTES_PER_LANE.get(cap, 3610.0 / 8.0 * cap)
        # the picked window (cl + 2M) stays within the budget envelope
        assert (cl + 2 * M) * bpl <= _VMEM_BUDGET + 128 * bpl
    # cap 8 must pick a smaller chunk than cap 9 (worse spill density)
    assert pick_cl(10_000_000, 5952, 8) < pick_cl(10_000_000, 5952, 9)
    # small grids: chunk never exceeds the (128-aligned) grid itself
    assert pick_cl(4096, 256, 9) == 4096


@pytest.mark.parametrize("cl_mode", ["nb1", "even", "partial"])
def test_blocked_kernel_matches_xla_interpret(cl_mode):
    from lammps_le_tpu.fast.blocked_kernel import make_blocked_kernel

    system, fs = _make_case()
    maps = fast_maps(system)
    P = maps.P
    if cl_mode == "nb1":
        cl = -(-P // 128) * 128              # one block covers all
    elif cl_mode == "even":
        cl = P // 2 if (P // 2) % 128 == 0 else 128 * (P // 256)
    else:
        cl = 384                             # partial last block
    xla_k = make_kernel(system, maps, 2)
    blk_k = make_blocked_kernel(system, maps, 2, interpret=True, cl=cl)
    assert blk_k.block_lanes % 128 == 0

    for energy in (True, False):
        gf_x, el_x, eb_x, fl_x, cl_x = xla_k(fs.gx, fs.bid, fs.hn, fs.pid,
                                             energy)
        gf_b, el_b, eb_b, fl_b, cl_b = blk_k(fs.gx, fs.bid, fs.hn, fs.pid,
                                             energy)
        scale = float(jnp.max(jnp.abs(gf_x)))
        err = float(jnp.max(jnp.abs(gf_b - gf_x)))
        assert err < 2e-4 * max(scale, 1.0), (w_mode, energy, err, scale)
        if energy:
            assert abs(float(el_b) - float(el_x)) < (
                5e-2 + 1e-4 * abs(float(el_x)))
            assert abs(float(eb_b) - float(eb_x)) < (
                5e-2 + 1e-4 * abs(float(eb_x)))
        assert int(cl_b) == int(cl_x)
        assert int(fl_b) == int(fl_x)


def test_blocked_kernel_ghost_fold_zeroes_ghost_columns():
    """All reactions fold onto owner columns: ghost columns of gf end up
    exactly zero (comm_brick.cpp:519 reverse_comm contract)."""
    from lammps_le_tpu.fast.blocked_kernel import make_blocked_kernel

    system, fs = _make_case(seed=4)
    maps = fast_maps(system)
    blk_k = make_blocked_kernel(system, maps, 2, interpret=True, cl=512)
    gf, *_ = blk_k(fs.gx, fs.bid, fs.hn, fs.pid, False)
    ghost = ~np.asarray(maps.interior)
    assert float(jnp.max(jnp.abs(gf[:, :, jnp.asarray(ghost)]))) == 0.0
