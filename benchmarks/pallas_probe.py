"""Subprocess kernel-health probe (run as __main__; prints PROBE_OK).

Executes ONE fused-kernel launch on a tiny system on the default
backend and syncs with a real device_get.  bench.py runs this in a
SUBPROCESS with a timeout before its own TPU init: a Mosaic kernel that
hangs on hardware (round 2's stencil kernel did, via a suspected DMA
deadlock) would otherwise take the whole benchmark down with it —
probe-then-fallback salvages the XLA-chain number instead.

Run nothing else against the TPU while this executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lammps_le_tpu.compile_cache import enable as _enable_cache

    _enable_cache()
    from lammps_le_tpu.fast import to_fast
    from lammps_le_tpu.fast.engine import make_fast_segment
    from lammps_le_tpu.fixes import NVE, Langevin
    from lammps_le_tpu.integrate import Simulation
    from lammps_le_tpu.io.data import system_from_data
    from lammps_le_tpu.scene import serpentine
    from lammps_le_tpu.state import init_state
    from lammps_le_tpu.system import (BOND_FENE, BOND_HARMONIC, BondParams,
                                      PairLJCut)

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
        max_extruders=16, skin=0.5, rebuild_every=40, cell_cap=9,
    )
    sim = Simulation(
        system=system, dt=0.005,
        fixes=(NVE(), Langevin(1.0, 1.0, 10.0, seed=9)), ex_btype=2)
    state = init_state(system, data.x, types=data.types, seed=11)
    left = np.full(16, -1, np.int32)
    right = np.full(16, -1, np.int32)
    left[:4] = np.arange(4) * 120 + 3
    right[:4] = left[:4] + 2
    state = state.replace(ex_left=jnp.asarray(left),
                          ex_right=jnp.asarray(right))
    segment, _ = make_fast_segment(sim, pallas=True)
    fs = to_fast(state, sim)
    b = jnp.zeros((), jnp.int32)
    fs = jax.jit(segment)(fs, b, 8, b, jnp.asarray(8, jnp.int32))
    step = int(jax.device_get(fs.step))
    assert step == 8, step
    print("PROBE_OK", flush=True)


if __name__ == "__main__":
    main()
