"""Hardware decomposition probe for the fused multi-step kernel.

Times the production 100k-bead LE step on the real TPU at several grid
geometries (skin/cap points) and with the extruder-spring block pass
active vs empty, to locate the remaining cost between:

    stencil tile work   (NOFF x [8-row block + tail rows] x P)
    spring block pass   (one-hot matmuls, EX_BLOCK per trip)
    launch floor + XLA glue (divided by steps/launch)

Usage: python benchmarks/kernel_probe.py [--points skin:cap,skin:cap,...]

Prints one line per point:
    skin cap P steps/launch ms/step Mbead*steps/s flags clamps

NEVER run concurrently with another TPU process (axon worker crashes).
All timing chains device work and syncs with a true device_get
(block_until_ready does not sync through the tunnel — PERF_NOTES).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

# spring-scaling knobs (VERDICT r3 #4): number of seeded extruders and
# the padded table capacity (EPAD = block-pass trip budget)
N_EX = int(os.environ.get("LLE_PROBE_NEX", "500"))
MAX_EX = int(os.environ.get("LLE_PROBE_MAXEX", "1024"))
# cadence knob (VERDICT r3 weak #4/#7): 0 = non-reactive scheduling
# (static cadence + post-event hot windows — what vmapped/GSPMD paths
# used to pay); 1 = the production reactive trigger
REACTIVE = os.environ.get("LLE_PROBE_REACTIVE", "1") == "1"
# static rebuild cadence backstop (reactive mode treats it as a cap;
# non-reactive mode rebuilds exactly every K steps)
REBUILD = int(os.environ.get("LLE_PROBE_REBUILD", "40"))


def measure(skin: float, cap: int, springs: bool, quick: bool):
    import jax
    import jax.numpy as jnp

    from lammps_le_tpu.compile_cache import enable as _enable_cache

    _enable_cache()
    from lammps_le_tpu.fast import run_fast, to_fast
    from lammps_le_tpu.fast.engine import make_fast_segment
    from lammps_le_tpu.fixes import (NVE, Extrusion, ExLoad, ExUnload,
                                     Langevin)
    from lammps_le_tpu.integrate import Simulation
    from lammps_le_tpu.io.data import system_from_data
    from lammps_le_tpu.scene import serpentine
    from lammps_le_tpu.state import init_state
    from lammps_le_tpu.system import (BOND_FENE, BOND_HARMONIC, BondParams,
                                      PairLJCut)

    n_beads = 100_000
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
        ex_btype=2, max_extruders=MAX_EX, skin=skin, rebuild_every=REBUILD,
        cell_cap=cap,
    )
    warm = Simulation(
        system=system, dt=0.006,
        fixes=(NVE(), Langevin(t_start=1.0, t_stop=1.0, damp=1.0, seed=7)),
        ex_btype=2,
    )
    state = init_state(system, data.x, types=data.types, seed=11)
    state, _ = run_fast(warm, state, 200 if quick else 1000)

    if springs:
        n_ex0 = N_EX
        spacing = n_beads // n_ex0
        left = np.full(MAX_EX, -1, np.int32)
        right = np.full(MAX_EX, -1, np.int32)
        sites = np.arange(n_ex0) * spacing + 1
        left[:n_ex0] = sites
        right[:n_ex0] = sites + 2
        state = state.replace(
            ex_left=jnp.asarray(left), ex_right=jnp.asarray(right))
    state = state.replace(flags=jnp.zeros((), jnp.uint32),
                          step=jnp.zeros((), jnp.int32))

    fixes = [NVE(),
             Langevin(t_start=1.0, t_stop=1.0, damp=10.0, seed=904297)]
    if springs:
        fixes += [
            Extrusion(nevery=1000, neutral_type=1, ctcf_left=2,
                      ctcf_right=3, through_prob=0.5, btype=2,
                      ctcf_left_right=4),
            ExLoad(nevery=700, iatomtype=1, jatomtype=1, cutoff=1.12,
                   btype=2, fraction=0.001, seed=684474, imaxbond=1,
                   inewtype=1, jmaxbond=1, jnewtype=1),
            ExUnload(nevery=700, btype=2, cutoff=0.5, fraction=0.001,
                     seed=456456),
        ]
    sim = Simulation(system=system, dt=0.006, energy_every=100,
                     fixes=tuple(fixes), ex_btype=2)
    if springs:
        settle = Simulation(system=system, dt=0.002, fixes=sim.fixes,
                            ex_btype=2)
        state, _ = run_fast(settle, state, 100 if quick else 400)
        state = state.replace(flags=jnp.zeros((), jnp.uint32))

    segment, info = make_fast_segment(sim, reactive=REACTIVE)
    seg = jax.jit(segment)
    fs = to_fast(state, sim)
    begin = int(jax.device_get(fs.step))
    b0 = jnp.asarray(begin, jnp.int32)
    nwarm, nmeas = 40, (300 if quick else 1000)
    bend = jnp.asarray(begin + nwarm + nmeas, jnp.int32)
    t0 = time.perf_counter()
    fs = seg(fs, b0, nwarm, b0, bend)
    jax.device_get(fs.step)
    compile_s = time.perf_counter() - t0
    warm_launches = (int(jax.device_get(fs.n_launches))
                     if getattr(fs, "n_launches", None) is not None else 0)
    t0 = time.perf_counter()
    done = 0
    while done < nmeas:
        this = min(250, nmeas - done)
        fs = seg(fs, b0 + nwarm + done, this, b0, bend)
        jax.device_get(fs.step)
        done += this
    wall = time.perf_counter() - t0
    ms = wall / nmeas * 1e3
    agg = nmeas / wall * n_beads
    launches = getattr(fs, "n_launches", None)
    spl = (nmeas / max(float(jax.device_get(launches)) - warm_launches, 1.0)
           if launches is not None else float("nan"))
    P = system.neighbor.nx  # report grid side; P in maps is private
    print(f"skin={skin} cap={cap} reactive={int(REACTIVE)} springs={int(springs)} E={N_EX if springs else 0}/{MAX_EX} nx={P} "
          f"ms/step={ms:.2f} M={agg/1e6:.2f} spl={spl:.2f} "
          f"flags={int(jax.device_get(fs.flags)):#x} "
          f"clamps={int(jax.device_get(fs.n_clamps))} "
          f"compile={compile_s:.0f}s", flush=True)
    return ms


def main():
    quick = "--quick" in sys.argv
    # Geometry axis is CLOSED (hardware, 2026-08-18): (0.5, 8) overflows
    # + slower; (0.7, 11) and (0.6, 10) both die in Mosaic compile with
    # a 149-204 MB register-allocator VMEM spill — cap rows past 9 push
    # the unrolled j-split stencil over the spill cliff.  cap=9 is the
    # ceiling; skin 0.5 / cap 9 is the production point.  The open axis
    # is the spring-pass cost: springs on/off at the production geometry.
    pts = [(0.5, 9, True), (0.5, 9, False)]
    for a in sys.argv[1:]:
        if a.startswith("--points"):
            pts = []
            for tok in a.split("=", 1)[1].split(","):
                s, c, sp = tok.split(":")
                pts.append((float(s), int(c), bool(int(sp))))
    for skin, cap, springs in pts:
        measure(skin, cap, springs, quick)


if __name__ == "__main__":
    main()
