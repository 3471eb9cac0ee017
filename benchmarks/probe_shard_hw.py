"""Price the shard_map window kernel on REAL hardware (round-4 verdict
missing #2 / next #3).

Every prior shard_step artifact was interpret-mode on the virtual CPU
mesh; this probe Mosaic-compiles the EXACT production sharded path on
the single real TPU via a degenerate sp=1 mesh (same code: margin
ppermutes become identity permutes, the window kernel runs the shared
Newton-half offset loop over [M | C | M] lanes) and measures ms/step
against the unsharded engine at the same geometry.  The reference's
analog artifact is its committed multi-rank chain log
(/root/reference/bench/log.6Oct16.chain.fixed.icc.4:52); ours is the
single-rank bound of the sharded path.

The 100k bench geometry's sp=1 window (P=33664 -> Wp 34816 lanes) fails
the VMEM-envelope gate (shard_step.shardable) — which this probe also
demonstrates — so the priced geometry is 50k beads at the same density
and skin/cap, whose window fits.

Usage:  python benchmarks/probe_shard_hw.py [n_beads] [nsteps]
Writes a PERF_NOTES-ready summary to stdout.  TPU-serialized: never run
concurrently with another TPU process.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_beads=50_000, nsteps=200):
    from lammps_le_tpu.compile_cache import enable as _enable_cache

    _enable_cache()
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from lammps_le_tpu.fast import to_fast
    from lammps_le_tpu.fast.engine import (fast_maps, make_fast_segment,
                                           thermo_row_fast)
    from lammps_le_tpu.fixes import NVE, Langevin
    from lammps_le_tpu.integrate import Simulation
    from lammps_le_tpu.io.data import system_from_data
    from lammps_le_tpu.parallel.shard_step import shardable
    from lammps_le_tpu.parallel.spatial import (make_sharded_segment,
                                                shard_fast_state)
    from lammps_le_tpu.scene import serpentine
    from lammps_le_tpu.state import init_state
    from lammps_le_tpu.system import (BOND_FENE, BOND_HARMONIC, BondParams,
                                      PairLJCut)

    print(f"devices: {jax.devices()}", flush=True)
    data = serpentine(n_beads, spacing=0.97, row_gap=1.1, seed=2024,
                      barrier_fraction=0.003)
    ones = np.ones((4, 4))
    pair = PairLJCut(epsilon=ones, sigma=ones, cutoff=1.12 * ones,
                     shift=True)
    bonds = BondParams(
        style=np.array([BOND_FENE, BOND_HARMONIC]),
        coeffs=np.array([[30.0, 1.5, 1.0, 1.0], [3.0, 1.1, 0.0, 0.0]]),
    )
    system, _ = system_from_data(
        data, pair=pair, bonds=bonds, dtype="float32", ex_btype=2,
        max_extruders=1024, skin=0.50, rebuild_every=40, cell_cap=9,
    )
    maps = fast_maps(system)
    sim = Simulation(
        system=system, dt=0.006,
        fixes=(NVE(), Langevin(t_start=1.0, t_stop=1.0, damp=10.0,
                               seed=904297)),
        ex_btype=2,
    )
    mesh = Mesh(np.asarray(jax.devices()[:1]), axis_names=("sp",))
    reason = shardable(system, maps, mesh)
    print(f"geometry: n={n_beads} grid {system.neighbor.nx}^3 "
          f"P={maps.P} cap={maps.cap} -> shardable: {reason or 'yes'}",
          flush=True)
    if reason:
        print("refusing: gate blocked this geometry (expected for 100k)")
        return 1

    # thermalize on the unsharded path first (shared starting state)
    from lammps_le_tpu.fast import run_fast

    state = init_state(system, data.x, types=data.types, seed=11)
    t0 = time.perf_counter()
    state, _ = run_fast(sim, state, 300)
    print(f"thermalize 300 steps {time.perf_counter()-t0:.1f}s "
          f"flags={int(state.flags):#x}", flush=True)

    def price(name, seg, fs):
        b = int(jax.device_get(fs.step))
        args = (jnp.asarray(b, jnp.int32), jnp.asarray(nsteps, jnp.int32),
                jnp.asarray(b, jnp.int32),
                jnp.asarray(b + 2 * nsteps + 40, jnp.int32))
        t0 = time.perf_counter()
        out = seg(fs, *args)
        jax.device_get(out.step)
        compile_s = time.perf_counter() - t0
        args2 = (jnp.asarray(b + nsteps, jnp.int32),
                 jnp.asarray(nsteps, jnp.int32), args[2], args[3])
        t0 = time.perf_counter()
        out = seg(out, *args2)
        jax.device_get(out.step)
        wall = time.perf_counter() - t0
        row = thermo_row_fast(out, system)
        temp = float(jax.device_get(row.temp))
        fl = int(jax.device_get(out.flags))
        ms = wall / nsteps * 1e3
        print(f"{name}: {ms:.2f} ms/step "
              f"({n_beads / ms * 1e3 / 1e6:.2f} M bead-steps/s), "
              f"compile+warm {compile_s:.1f}s, T={temp:.3f}, "
              f"flags={fl:#x}", flush=True)
        return ms

    # 1) unsharded reference: the XLA-chain segment with the unsharded
    #    stencil kernel (the direct apples-to-apples twin of the sharded
    #    chain; the fused whole-step kernel is a different engine)
    seg_ref, _ = make_fast_segment(sim, pallas=False, reactive=True)
    ms_ref = price("unsharded XLA-chain stencil",
                   jax.jit(seg_ref), to_fast(state, sim))

    # 2) the sharded window kernel at sp=1 (real Mosaic compile)
    with mesh:
        fs_sh = shard_fast_state(to_fast(state, sim), mesh)
        seg_sh = make_sharded_segment(sim, mesh, interpret=False)
        ms_sh = price("shard_map window kernel sp=1", seg_sh, fs_sh)

    # 3) fused whole-step kernel (the single-chip production engine) for
    #    context
    seg_f, _ = make_fast_segment(sim)
    ms_f = price("fused whole-step kernel", jax.jit(seg_f),
                 to_fast(state, sim))

    print(f"summary: sharded/unsharded = {ms_sh / ms_ref:.2f}x, "
          f"sharded/fused = {ms_sh / ms_f:.2f}x", flush=True)
    return 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    sys.exit(main(n, k))
