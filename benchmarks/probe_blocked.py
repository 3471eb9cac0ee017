"""Hardware probe for the layer-blocked Pallas force kernel.

Two modes (NEVER run concurrently with another TPU process):

    python benchmarks/probe_blocked.py --parity [N]
        One force evaluation at N beads (default 200k) on the real TPU:
        blocked kernel vs the XLA-chain stencil (engine.make_kernel).
        Prints max |df| / scale, energies, flags.  This is the on-device
        twin of tests/test_blocked_kernel.py (interpret mode).

    python benchmarks/probe_blocked.py --bench [N] [steps]
        Time the fast-engine segment at N beads (default 1M).  The
        engine auto-selects: whole-plane fused kernel when it fits,
        XLA chain + blocked stencil past the residency cliff
        (LLE_BLOCKED=0 reverts the stencil to the XLA chain for A/B).

Timing chains device work and syncs with a true device_get
(block_until_ready does not sync through the axon tunnel).
"""

from __future__ import annotations

import sys
import time

import numpy as np


def build(n_beads: int, skin=0.5, cap=9, max_ex=1024):
    import jax.numpy as jnp

    from lammps_le_tpu.fast import run_fast
    from lammps_le_tpu.fixes import NVE, Langevin
    from lammps_le_tpu.integrate import Simulation
    from lammps_le_tpu.io.data import system_from_data
    from lammps_le_tpu.scene import serpentine
    from lammps_le_tpu.state import init_state
    from lammps_le_tpu.system import (BOND_FENE, BOND_HARMONIC, BondParams,
                                      PairLJCut)

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
        data, pair=pair, bonds=bonds, dtype="float32",
        ex_btype=2, max_extruders=max_ex, skin=skin, rebuild_every=40,
        cell_cap=cap,
    )
    warm = Simulation(
        system=system, dt=0.006,
        fixes=(NVE(), Langevin(t_start=1.0, t_stop=1.0, damp=1.0, seed=7)),
        ex_btype=2,
    )
    state = init_state(system, data.x, types=data.types, seed=11)
    state, _ = run_fast(warm, state, 120)
    state = state.replace(flags=jnp.zeros((), jnp.uint32),
                          step=jnp.zeros((), jnp.int32))
    return system, state, warm


def parity(n_beads: int):
    import jax
    import jax.numpy as jnp

    from lammps_le_tpu.compile_cache import enable as _enable_cache

    _enable_cache()
    from lammps_le_tpu.fast import to_fast
    from lammps_le_tpu.fast.blocked_kernel import make_blocked_kernel
    from lammps_le_tpu.fast.engine import fast_maps, make_kernel

    system, state, warm = build(n_beads)
    maps = fast_maps(system)
    fs = to_fast(state, warm)
    xla_k = make_kernel(system, maps, 2)
    blk_k = make_blocked_kernel(system, maps, 2)
    print(f"n={n_beads} nx={system.neighbor.nx} "
          f"block_lanes={blk_k.block_lanes} n_blocks={blk_k.n_blocks} "
          f"margin={blk_k.margin}", flush=True)
    for energy in (False, True):
        gx, bid, hn, pid = fs.gx, fs.bid, fs.hn, fs.pid
        fx, elx, ebx, flx, clx = jax.jit(
            xla_k, static_argnums=4)(gx, bid, hn, pid, energy)
        fb, elb, ebb, flb, clb = jax.jit(
            blk_k, static_argnums=4)(gx, bid, hn, pid, energy)
        fx, fb = jax.device_get((fx, fb))
        scale = float(np.max(np.abs(fx)))
        err = float(np.max(np.abs(fb - fx)))
        ok = err < 2e-4 * max(scale, 1.0)
        print(f"energy={energy} max|df|={err:.3e} scale={scale:.1f} "
              f"{'PASS' if ok else 'FAIL'}", flush=True)
        if energy:
            print(f"  e_lj xla={float(elx):.6g} blk={float(elb):.6g} "
                  f"e_b xla={float(ebx):.6g} blk={float(ebb):.6g}",
                  flush=True)
        print(f"  flags xla={int(jax.device_get(flx)):#x} "
              f"blk={int(jax.device_get(flb)):#x} clamps "
              f"{int(jax.device_get(clx))}/{int(jax.device_get(clb))}",
              flush=True)


def bench(n_beads: int, nmeas: int, n_springs: int = 0):
    """NVE+Langevin stepping cost; ``n_springs`` seeds that many live
    extruder springs (chain-adjacent sites, config6's pattern) WITHOUT
    any LE event fixes — isolates the steady-state spring-force +
    retable cost from the event machinery at scale."""
    import jax
    import jax.numpy as jnp

    from lammps_le_tpu.compile_cache import enable as _enable_cache

    _enable_cache()
    from lammps_le_tpu.fast import run_fast, to_fast
    from lammps_le_tpu.fast.engine import make_fast_segment
    from lammps_le_tpu.fixes import NVE, Langevin
    from lammps_le_tpu.integrate import Simulation

    system, state, _ = build(
        n_beads, max_ex=max(1024, 1 << (n_springs + 256).bit_length()))
    if n_springs:
        e = state.ex_left.shape[0]
        sites = np.arange(n_springs) * (n_beads // n_springs) + 1
        left = np.full(e, -1, np.int32)
        right = np.full(e, -1, np.int32)
        left[:n_springs] = sites
        right[:n_springs] = sites + 2
        state = state.replace(ex_left=jnp.asarray(left),
                              ex_right=jnp.asarray(right))
    sim = Simulation(
        system=system, dt=0.006, energy_every=max(nmeas, 100),
        fixes=(NVE(),
               Langevin(t_start=1.0, t_stop=1.0, damp=10.0, seed=904297)),
        ex_btype=2,
    )
    segment, _ = make_fast_segment(sim)
    seg = jax.jit(segment)
    fs = to_fast(state, sim)
    begin = int(jax.device_get(fs.step))
    b0 = jnp.asarray(begin, jnp.int32)
    nwarm = 20
    bend = jnp.asarray(begin + nwarm + nmeas, jnp.int32)
    t0 = time.perf_counter()
    fs = seg(fs, b0, nwarm, b0, bend)
    jax.device_get(fs.step)
    print(f"compile+warm {time.perf_counter() - t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    fs = seg(fs, b0 + nwarm, nmeas, b0, bend)
    jax.device_get(fs.step)
    wall = time.perf_counter() - t0
    ms = wall / nmeas * 1e3
    print(f"n={n_beads} ms/step={ms:.2f} "
          f"M={nmeas / wall * n_beads / 1e6:.2f} "
          f"flags={int(jax.device_get(fs.flags)):#x} "
          f"clamps={int(jax.device_get(fs.n_clamps))}", flush=True)


def main():
    args = [a for a in sys.argv[1:]]
    if "--parity" in args:
        i = args.index("--parity")
        n = int(float(args[i + 1])) if len(args) > i + 1 else 200_000
        parity(n)
    elif "--bench" in args:
        i = args.index("--bench")
        n = int(float(args[i + 1])) if len(args) > i + 1 else 1_000_000
        steps = int(args[i + 2]) if len(args) > i + 2 else 100
        ns = 0
        if "--springs" in args:
            ns = int(float(args[args.index("--springs") + 1]))
        bench(n, steps, n_springs=ns)
    else:
        print(__doc__)


if __name__ == "__main__":
    main()
