"""Benchmark entry point (run by the driver on real TPU hardware).

Measures the BASELINE.json primary metric — bead*steps/sec per chip on a
100k-bead chromosome with active loop extrusion (extrusion + ex_load +
ex_unload fixes, hundreds of extruders) — and prints ONE JSON line.

``vs_baseline`` is relative to the only committed reference measurement:
the 32k-bead FENE chain bench at 102.286 steps/s = 3.273e6 bead*steps/s on
one 2016 CPU core (reference: bench/log.6Oct16.chain.fixed.icc.1:52).

Usage: python bench.py [--quick]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_BEAD_STEPS = 32000 * 102.286  # reference chain bench, 1 core


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    quick = "--quick" in sys.argv
    import jax
    import jax.numpy as jnp

    from lammps_le_tpu.fixes import NVE, Extrusion, ExLoad, ExUnload, Langevin
    from lammps_le_tpu.integrate import Simulation, run as run_loop
    from lammps_le_tpu.io.data import system_from_data
    from lammps_le_tpu.scene import serpentine
    from lammps_le_tpu.state import init_state
    from lammps_le_tpu.system import BondParams, PairLJCut, BOND_FENE, BOND_HARMONIC

    n_beads = 100_000
    n_ex0 = 500
    log(f"devices: {jax.devices()}")

    # overlap-free folded chain at melt-like density; CTCF barriers sprinkled
    data = serpentine(n_beads, spacing=0.97, row_gap=1.1, seed=2024,
                      barrier_fraction=0.003)
    ones = np.ones((4, 4))
    pair = PairLJCut(epsilon=ones, sigma=ones, cutoff=1.12 * ones, shift=True)
    bonds = BondParams(
        style=np.array([BOND_FENE, BOND_HARMONIC]),
        coeffs=np.array([[30.0, 1.5, 1.0, 1.0], [3.0, 1.1, 0.0, 0.0]]),
    )
    # TPU-native neighbor policy: rebuilds are ~free on the cell grid, so
    # rebuild EVERY step with a skin sized for the thermal velocity *tail*
    # (0.25 ~ 10 sigma_v * dt) — a static cadence with a tight skin lets
    # fast beads in a 100k ensemble slip past the half-skin bound, silently
    # losing pairs and heating the system until it blows up.
    system, _ = system_from_data(
        data, pair=pair, bonds=bonds, dtype="float32",
        ex_btype=2, max_extruders=4096, skin=0.25, rebuild_every=1,
        cell_cap=10,
    )

    # --- thermalize to T*=1 (no overlaps in the serpentine start) ---
    warm = Simulation(
        system=system, dt=0.006,
        fixes=(NVE(), Langevin(t_start=1.0, t_stop=1.0, damp=1.0, seed=7)),
        ex_btype=2,
    )
    state = init_state(system, data.x, types=data.types, seed=11)
    t0 = time.perf_counter()
    state, _ = run_loop(warm, state, 300 if quick else 1500)
    log(f"thermalization done in {time.perf_counter()-t0:.1f}s "
        f"(incl. compile), flags={int(state.flags):#x}")

    # --- seed extruders at regular (i, i+2) sites ---
    spacing = n_beads // n_ex0
    left = np.full(4096, -1, np.int32)
    right = np.full(4096, -1, np.int32)
    sites = np.arange(n_ex0) * spacing + 1
    left[:n_ex0] = sites
    right[:n_ex0] = sites + 2
    state = state.replace(
        ex_left=jnp.asarray(left), ex_right=jnp.asarray(right),
        flags=jnp.zeros((), jnp.uint32),
        v=state.v, step=jnp.zeros((), jnp.int32),
    )

    # --- production: full LE machinery.  nevery is ~20x faster than the
    #     README deck (17500/7000) so the rewiring path is exercised within
    #     the bench window, but not so fast that bond-snap energy injection
    #     outruns the thermostat (each move releases the stretched extruder
    #     spring; at nevery=100 the local heating drives deep LJ collisions
    #     past velocity-Verlet stability) ---
    # dt=0.006: the bench metric (bead*steps/s) is dt-independent, and the
    # smaller step doubles the velocity-Verlet stability margin against
    # rewiring-induced hot spots penetrating the WCA wall
    sim = Simulation(
        system=system, dt=0.006, energy_every=100,
        fixes=(
            NVE(),
            Langevin(t_start=1.0, t_stop=1.0, damp=10.0, seed=904297),
            Extrusion(nevery=1000, neutral_type=1, ctcf_left=2, ctcf_right=3,
                      through_prob=0.5, btype=2, ctcf_left_right=4),
            ExLoad(nevery=700, iatomtype=1, jatomtype=1, cutoff=1.12, btype=2,
                   fraction=0.001, seed=684474, imaxbond=1, inewtype=1,
                   jmaxbond=1, jnewtype=1),
            ExUnload(nevery=700, btype=2, cutoff=0.5, fraction=0.001,
                     seed=456456),
        ),
        ex_btype=2,
    )
    # settle: seeded extruder bonds inject elastic energy; let the
    # thermostat absorb it at a small timestep before measuring
    settle = Simulation(system=system, dt=0.002, fixes=sim.fixes, ex_btype=2)
    t0 = time.perf_counter()
    state, _ = run_loop(settle, state, 100 if quick else 400)
    jax.device_get(state.epair)
    log(f"settle {time.perf_counter()-t0:.1f}s, flags={int(state.flags):#x}")
    state = state.replace(flags=jnp.zeros((), jnp.uint32))

    # warmup (compiles the production step)
    t0 = time.perf_counter()
    state, _ = run_loop(sim, state, 50)
    jax.device_get(state.epair)
    log(f"warmup+compile {time.perf_counter()-t0:.1f}s")

    nsteps = 300 if quick else 3000
    t0 = time.perf_counter()
    state, _ = run_loop(sim, state, nsteps)
    jax.device_get(state.epair)
    wall = time.perf_counter() - t0
    steps_per_s = nsteps / wall
    bead_steps = steps_per_s * n_beads
    n_ex = int(jnp.sum(state.ex_left >= 0))
    moves = int(state.n_moves)
    events_per_s = moves / wall
    from lammps_le_tpu.integrate import thermo_row

    row = thermo_row(state, system)
    temp = float(row.temp)
    healthy = bool(np.isfinite(temp)) and 0.5 < temp < 2.0
    log(f"{steps_per_s:.1f} steps/s, {bead_steps/1e6:.1f} M bead-steps/s, "
        f"extruders={n_ex}, moves={moves}, T={temp:.3f}, "
        f"flags={int(state.flags):#x}")

    print(json.dumps({
        "metric": "bead_steps_per_sec_per_chip_100k_le",
        "value": round(bead_steps, 1),
        "unit": "bead*steps/s",
        "vs_baseline": round(bead_steps / BASELINE_BEAD_STEPS, 3),
        "detail": {
            "steps_per_s": round(steps_per_s, 2),
            "n_beads": n_beads,
            "extruders": n_ex,
            "extrusion_moves": moves,
            "extrusion_events_per_s": round(events_per_s, 2),
            "temp": round(temp, 4),
            "healthy": healthy,
            "flags": int(state.flags),
        },
    }))


if __name__ == "__main__":
    main()
