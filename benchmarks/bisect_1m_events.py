"""Localize the 1M-bead config-6 worker crash: force LE events early.

Stages (each followed by a hard device_get sync + print):
  1. build + warm 30 steps (proven: probe_blocked --bench path)
  2. seed 5000 extruders, to_fast sync
  3. 30 steps with Extrusion(nevery=10) only
  4. 30 steps with ExLoad(nevery=10) only
  5. 30 steps with ExUnload(nevery=10) only
  6. 30 steps with all three (config-6 fix set)
Usage: python benchmarks/bisect_1m_events.py [stage_max]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

from lammps_le_tpu.compile_cache import enable as _enable_cache

_enable_cache()

import jax
import jax.numpy as jnp

from probe_blocked import build
from lammps_le_tpu.fast import run_fast
from lammps_le_tpu.fixes import (NVE, Extrusion, ExLoad, ExUnload,
                                 Langevin)
from lammps_le_tpu.integrate import Simulation

stage_max = int(sys.argv[1]) if len(sys.argv) > 1 else 6
N = 1_000_000


def hbm():
    try:
        ms = jax.devices()[0].memory_stats()
        return (f"hbm={ms.get('bytes_in_use', 0) / 1e9:.2f}G"
                f"/{ms.get('bytes_limit', 0) / 1e9:.0f}G "
                f"peak={ms.get('peak_bytes_in_use', 0) / 1e9:.2f}G")
    except Exception:
        return "hbm=?"

t0 = time.perf_counter()
system, state, warm = build(N, max_ex=8192)
state, _ = run_fast(warm, state, 30)
print(f"stage1 warm ok step={int(jax.device_get(state.step))} "
      f"flags={int(jax.device_get(state.flags)):#x} {hbm()} "
      f"{time.perf_counter() - t0:.0f}s", flush=True)

n_ex0 = 5000
e = state.ex_left.shape[0]
sites = np.arange(n_ex0) * (N // n_ex0) + 1
left = np.full(e, -1, np.int32)
right = np.full(e, -1, np.int32)
left[:n_ex0] = sites
right[:n_ex0] = sites + 2
state = state.replace(ex_left=jnp.asarray(left),
                      ex_right=jnp.asarray(right))
print("stage2 seeded", flush=True)

base = (NVE(), Langevin(t_start=1.0, t_stop=1.0, damp=10.0, seed=904297))
ext = Extrusion(nevery=10, neutral_type=1, ctcf_left=2, ctcf_right=3,
                through_prob=0.5, btype=2, ctcf_left_right=4,
                release_r=3.0)
exl = ExLoad(nevery=10, iatomtype=1, jatomtype=1, cutoff=1.12, btype=2,
             fraction=0.001, seed=684474, imaxbond=1, inewtype=1,
             jmaxbond=1, jnewtype=1)
exu = ExUnload(nevery=10, btype=2, cutoff=0.5, fraction=0.001,
               seed=456456)

stages = [("extrusion", (ext,)), ("ex_load", (exl,)),
          ("ex_unload", (exu,)), ("all3", (ext, exl, exu))]
for k, (name, fixes) in enumerate(stages, start=3):
    if k > stage_max:
        break
    t0 = time.perf_counter()
    sim = Simulation(system=system, dt=0.006, fixes=base + fixes,
                     ex_btype=2)
    state, _ = run_fast(sim, state, 30)
    print(f"stage{k} {name} ok step={int(jax.device_get(state.step))} "
          f"flags={int(jax.device_get(state.flags)):#x} "
          f"ex={int(jax.device_get(jnp.sum(state.ex_left >= 0)))} "
          f"moves={int(jax.device_get(state.n_moves))} "
          f"loads={int(jax.device_get(state.n_loads))} {hbm()} "
          f"{time.perf_counter() - t0:.0f}s", flush=True)
print("ALL STAGES OK", flush=True)
