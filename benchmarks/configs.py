"""The five BASELINE.md benchmark configurations.

Usage: python benchmarks/configs.py <1|2|3|4|5|all> [--quick]

1. 32k-bead FENE melt, no extrusion (bench/in.chain parity + speed gate;
   uses the reference data file when /root/reference is mounted, else a
   generated melt with identical parameters).
2. 1k-bead chain + fix extrusion only (N1 scaled from 17500), no barriers.
3. 10k-bead chain + ex_load/ex_unload turnover (prob 0.001).
4. README deck: CTCF left/right barriers + roadblocks, pass prob 1.0->0.5,
   driven through the LAMMPS-deck front end.
5. Mach-2022 scale: 100k-bead chromosome, hundreds of extruders
   (bench.py measures this one for the driver).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lammps_le_tpu.compile_cache import enable as _enable_cache  # noqa: E402

_enable_cache()

REF = "/root/reference/bench"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _result(name, n, steps, wall, extra=None):
    out = {
        "config": name,
        "beads": n,
        "steps": steps,
        "wall_s": round(wall, 3),
        "steps_per_s": round(steps / wall, 3),
        "bead_steps_per_s": round(steps * n / wall, 1),
    }
    if extra:
        out.update(extra)
    print(json.dumps(out))
    return out


def _chain_system(n_chains, chain_len, seed=12345, **kw):
    from lammps_le_tpu.io.data import system_from_data
    from lammps_le_tpu.scene import fene_melt, serpentine
    from lammps_le_tpu.system import (
        BOND_FENE,
        BOND_HARMONIC,
        BondParams,
        PairLJCut,
    )

    gen = kw.pop("generator", "serpentine")
    n_types = kw.pop("n_types", 4)
    if gen == "melt":
        data = fene_melt(n_chains, chain_len, seed=seed,
                         n_atom_types=n_types, n_bond_types=2)
    else:
        assert n_chains == 1
        data = serpentine(chain_len, seed=seed, n_atom_types=n_types,
                          n_bond_types=2,
                          barrier_fraction=kw.pop("barrier_fraction", 0.0))
    ones = np.ones((n_types, n_types))
    pair = PairLJCut(epsilon=ones, sigma=ones, cutoff=1.12 * ones, shift=True)
    bonds = BondParams(
        style=np.array([BOND_FENE, BOND_HARMONIC]),
        coeffs=np.array([[30.0, 1.5, 1.0, 1.0], [10.0, 1.1, 0.0, 0.0]]),
    )
    from lammps_le_tpu.io.data import system_from_data

    system, ex = system_from_data(data, pair=pair, bonds=bonds,
                                  dtype="float32", ex_btype=2, **kw)
    return system, data


def config1(quick=False):
    """in.chain parity: thermo values + steps/s vs the committed CPU log."""
    from lammps_le_tpu.deck import DeckRunner

    path = os.path.join(REF, "in.chain")
    steps = 200 if quick else 1000
    if os.path.exists(path):
        r = DeckRunner(dtype="float32")
        r.run_file(path)           # runs the deck's own `run 100`
        r.command("run", [str(steps)])  # timed segment, compile warm
        perf = r.last_perf
        return _result("1_chain32k_reference_deck", 32000, steps,
                       perf["wall_s"])
    log("reference tree absent; generated 32k melt instead")
    from lammps_le_tpu.fixes import NVE, Langevin
    from lammps_le_tpu.integrate import Simulation, run
    from lammps_le_tpu.state import init_state

    system, data = _chain_system(320, 100, generator="melt", n_types=1,
                                 rebuild_every=4)
    sim = Simulation(system=system, dt=0.012,
                     fixes=(NVE(), Langevin(t_start=1.0, t_stop=1.0,
                                            damp=10.0, seed=904297)))
    state = init_state(system, data.x, types=data.types, seed=1)
    state, _ = run(sim, state, 50)
    t0 = time.perf_counter()
    state, _ = run(sim, state, steps)
    import jax

    jax.device_get(state.epair)
    return _result("1_chain32k_generated", 32000, steps,
                   time.perf_counter() - t0)


def _extrusion_run(name, n_beads, fixes, steps, seed_extruders=0,
                   spacing=None, rebuild_every=1, cell_cap=None):
    import jax
    import jax.numpy as jnp

    from lammps_le_tpu.fixes import NVE, Langevin
    from lammps_le_tpu.integrate import Simulation, run
    from lammps_le_tpu.state import init_state

    system, data = _chain_system(
        1, n_beads, rebuild_every=rebuild_every, skin=0.25,
        max_extruders=max(64, n_beads // 3),
        **({"cell_cap": cell_cap} if cell_cap else {}),
    )
    sim = Simulation(
        system=system, dt=0.006,
        fixes=(NVE(), Langevin(t_start=1.0, t_stop=1.0, damp=10.0,
                               seed=904297)) + tuple(fixes),
        ex_btype=2,
    )
    state = init_state(system, data.x, types=data.types, seed=3)
    # thermalize the serpentine start before any extruders exist
    warm = Simulation(system=system, dt=0.003,
                      fixes=(NVE(), Langevin(t_start=1.0, t_stop=1.0,
                                             damp=1.0, seed=7)), ex_btype=2)
    state, _ = run(warm, state, 300)
    state = state.replace(flags=jnp.zeros((), jnp.uint32))
    if seed_extruders:
        e = state.ex_left.shape[0]
        sp = spacing or max(4, n_beads // seed_extruders)
        sites = np.arange(seed_extruders) * sp + 1
        left = np.full(e, -1, np.int32)
        right = np.full(e, -1, np.int32)
        left[:seed_extruders] = sites
        right[:seed_extruders] = sites + 2
        state = state.replace(ex_left=jnp.asarray(left),
                              ex_right=jnp.asarray(right))
    state, _ = run(sim, state, 50)
    t0 = time.perf_counter()
    state, _ = run(sim, state, steps)
    jax.device_get(state.epair)
    wall = time.perf_counter() - t0
    extra = {
        "extruders": int(jnp.sum(state.ex_left >= 0)),
        "moves": int(state.n_moves),
        "loads": int(state.n_loads),
        "unloads": int(state.n_unloads),
        "flags": int(state.flags),
    }
    return _result(name, n_beads, steps, wall, extra)


def config2(quick=False):
    from lammps_le_tpu.fixes import Extrusion

    steps = 300 if quick else 2000
    return _extrusion_run(
        "2_1k_extrusion_only", 1000,
        [Extrusion(nevery=50, neutral_type=1, ctcf_left=2, ctcf_right=3,
                   through_prob=1.0, btype=2)],
        steps, seed_extruders=10,
    )


def config3(quick=False):
    from lammps_le_tpu.fixes import ExLoad, ExUnload

    steps = 300 if quick else 2000
    return _extrusion_run(
        "3_10k_turnover", 10000,
        [ExLoad(nevery=50, iatomtype=1, jatomtype=1, cutoff=1.12, btype=2,
                fraction=0.001, seed=684474, imaxbond=1, inewtype=1,
                jmaxbond=1, jnewtype=1),
         ExUnload(nevery=50, btype=2, cutoff=0.5, fraction=0.001,
                  seed=456456)],
        steps, seed_extruders=100,
    )


def config4(quick=False):
    """README deck (README.md:22-40) through the deck front end."""
    import tempfile

    from lammps_le_tpu.deck import DeckRunner
    from lammps_le_tpu.io.data import DataFile, write_data
    from lammps_le_tpu.scene import serpentine

    steps = 300 if quick else 2000
    data = serpentine(10000, seed=5, n_atom_types=4, n_bond_types=2,
                      barrier_fraction=0.01)
    with tempfile.TemporaryDirectory() as td:
        write_data(os.path.join(td, "data.le"), data)
        deck = f"""
units lj
atom_style bond
special_bonds fene
read_data data.le
neighbor 0.4 bin
bond_style hybrid
bond_coeff 1 fene 30.0 1.5 1.0 1.0
bond_coeff 2 harmonic 10.0 1.1
pair_style lj/cut 1.12
pair_modify shift yes
pair_coeff * * 1.0 1.0 1.12
velocity all create 1.0 87287
fix 1 all nve
fix 2 all langevin 1.0 1.0 10.0 904297
fix loop all extrusion 175 1 2 3 0.5 2 4
fix loading all ex_load 70 1 1 1.12 2 prob 0.001 684474 iparam 1 1 jparam 1 1
fix unloading all ex_unload 70 2 0.5 prob 0.001 456456
thermo {steps}
timestep 0.006
run 300
run {steps}
"""
        path = os.path.join(td, "in.le")
        with open(path, "w") as fh:
            fh.write(deck)
        r = DeckRunner(dtype="float32")
        r.run_file(path)
        perf = r.last_perf
        import jax.numpy as jnp

        extra = {
            "extruders": int(jnp.sum(r.state.ex_left >= 0)),
            "moves": int(r.state.n_moves),
            "flags": int(r.state.flags),
        }
        return _result("4_readme_deck_10k", 10000, steps, perf["wall_s"],
                       extra)


def config5(quick=False):
    from lammps_le_tpu.fixes import Extrusion, ExLoad, ExUnload

    steps = 300 if quick else 2000
    return _extrusion_run(
        "5_mach2022_100k", 100000,
        [Extrusion(nevery=100, neutral_type=1, ctcf_left=2, ctcf_right=3,
                   through_prob=0.5, btype=2, ctcf_left_right=4),
         ExLoad(nevery=100, iatomtype=1, jatomtype=1, cutoff=1.12, btype=2,
                fraction=0.001, seed=684474, imaxbond=1, inewtype=1,
                jmaxbond=1, jnewtype=1),
         ExUnload(nevery=100, btype=2, cutoff=0.5, fraction=0.001,
                  seed=456456)],
        steps, seed_extruders=500, cell_cap=14,
    )


def config6(quick=False):
    """Scale-out headroom: 1M-bead chromosome on ONE chip (SURVEY §7 stage
    7; the reference needs multi-rank comm_brick past ~1 node,
    src/comm_brick.cpp:150).  Reports memory/occupancy headroom alongside
    throughput; past the whole-plane VMEM cliff the XLA chain drives the
    step with its stencil on the layer-blocked Pallas kernel
    (engine.select_kernel -> fast/blocked_kernel.py)."""
    import jax
    import jax.numpy as jnp

    from lammps_le_tpu.fast import run_fast
    from lammps_le_tpu.fixes import NVE, Extrusion, ExLoad, ExUnload, Langevin
    from lammps_le_tpu.integrate import Simulation
    from lammps_le_tpu.state import init_state

    n_beads = 1_000_000
    steps = 100 if quick else 600
    # cap 9 + skin 0.5 is the blocked kernel's hardware-proven 1M
    # geometry (probe_blocked --bench): cap 8 spills ~2.1x more VMEM per
    # lane (blocked_kernel._BYTES_PER_LANE) and the skin-0.30 cap-9 grid
    # (67x83x83) crashed the TPU worker in BOTH stencil paths
    # (PERF_NOTES §config-6 r4)
    system, data = _chain_system(
        1, n_beads, rebuild_every=40, skin=0.5,
        max_extruders=8192, cell_cap=9,
    )
    nb = system.neighbor
    log(f"grid {nb.nx}x{nb.ny}x{nb.nz} cell {nb.cell_size:.3f} "
        f"cap {nb.cell_cap}")
    warm = Simulation(system=system, dt=0.006,
                      fixes=(NVE(), Langevin(t_start=1.0, t_stop=1.0,
                                             damp=1.0, seed=7)), ex_btype=2)
    state = init_state(system, data.x, types=data.types, seed=19)
    state, _ = run_fast(warm, state, 100 if quick else 400)
    state = state.replace(flags=jnp.zeros((), jnp.uint32))

    n_ex0 = 5000
    e = state.ex_left.shape[0]
    sites = np.arange(n_ex0) * (n_beads // n_ex0) + 1
    left = np.full(e, -1, np.int32)
    right = np.full(e, -1, np.int32)
    left[:n_ex0] = sites
    right[:n_ex0] = sites + 2
    state = state.replace(ex_left=jnp.asarray(left),
                          ex_right=jnp.asarray(right))
    sim = Simulation(
        system=system, dt=0.006, energy_every=100,
        fixes=(NVE(), Langevin(t_start=1.0, t_stop=1.0, damp=10.0,
                               seed=904297),
               Extrusion(nevery=1000, neutral_type=1, ctcf_left=2,
                         ctcf_right=3, through_prob=0.5, btype=2,
                         ctcf_left_right=4, release_r=3.0),
               ExLoad(nevery=700, iatomtype=1, jatomtype=1, cutoff=1.12,
                      btype=2, fraction=0.001, seed=684474, imaxbond=1,
                      inewtype=1, jmaxbond=1, jnewtype=1),
               ExUnload(nevery=700, btype=2, cutoff=0.5, fraction=0.001,
                        seed=456456)),
        ex_btype=2,
    )
    settle = Simulation(system=system, dt=0.002, fixes=sim.fixes, ex_btype=2)
    state, _ = run_fast(settle, state, 50 if quick else 200)
    state = state.replace(flags=jnp.zeros((), jnp.uint32))
    state, _ = run_fast(sim, state, 20)  # compile + warm
    t0 = time.perf_counter()
    # 100-step launches with a hard sync + progress line between them:
    # localizes worker faults to a window and bounds single-launch
    # device time (the 600-step single launch died 3x on hardware
    # 2026-08-19 — PERF_NOTES §config-6 crashes)
    done = 0
    while done < steps:
        chunk = min(100, steps - done)
        state, _ = run_fast(sim, state, chunk)
        jax.device_get(state.step)
        done += chunk
        log(f"  ..step {int(state.step)} flags={int(state.flags):#x} "
            f"{time.perf_counter() - t0:.0f}s")
    wall = time.perf_counter() - t0
    # headroom: live device bytes vs chip HBM
    mem = {}
    try:
        d = jax.devices()[0]
        ms = d.memory_stats()
        mem = {"hbm_bytes_in_use": int(ms.get("bytes_in_use", 0)),
               "hbm_bytes_limit": int(ms.get("bytes_limit", 0))}
    except Exception:
        pass
    extra = {
        "extruders": int(jnp.sum(state.ex_left >= 0)),
        "moves": int(state.n_moves),
        "flags": int(state.flags),
        "clamps": int(state.n_clamps) if hasattr(state, "n_clamps") else 0,
        **mem,
    }
    return _result("6_scaleout_1M", n_beads, steps, wall, extra)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    quick = "--quick" in sys.argv
    configs = {"1": config1, "2": config2, "3": config3, "4": config4,
               "5": config5, "6": config6}
    if which == "all":
        for k in sorted(configs):
            configs[k](quick)
    else:
        configs[which](quick)


if __name__ == "__main__":
    main()
