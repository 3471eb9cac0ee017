"""Section timing breakdown — the reference's Timer/Finish report analog
(reference: src/timer.h:25-28 PAIR/BOND/NEIGH/COMM/MODIFY categories;
src/finish.cpp:61-327 prints the per-section table and
"Performance: ... timesteps/s").

Whole-step timing comes from the fused scan; sections are measured by
compiling each component in isolation and timing it with chained
on-device loops (the only reliable method through remote transports —
see PERF_NOTES.md).  Section times therefore do not sum exactly to the
step time (fusion overlaps them); both are reported.
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp

from ..integrate.verlet import Simulation, make_step, setup
from ..ops import cells
from ..ops import grid as grid_ops
from ..ops.forces import compute_forces, special_pair_correction
from ..state import State, extruder_partner


def _timed(fn, x0, iters=50):
    @jax.jit
    def many(x):
        def it(i, a):
            out = fn(a)
            return a + 1e-12 * out
        return jax.lax.fori_loop(0, iters, it, x)

    r = many(x0)
    jax.device_get(r.ravel()[0])
    t0 = time.perf_counter()
    r = many(x0)
    jax.device_get(r.ravel()[0])
    return (time.perf_counter() - t0) / iters


def profile(sim: Simulation, state: State, iters: int = 50) -> Dict[str, float]:
    """Per-section seconds/step + whole-step time; prints a report."""
    system = sim.system
    state = jax.jit(lambda s: setup(sim, s))(state)
    x = state.x
    types = state.type
    nbr = state.nbr

    sections: Dict[str, float] = {}

    if system.pair is not None and system.neighbor.use_cells:
        sections["pair"] = _timed(
            lambda xa: grid_ops.grid_pair_force(xa, types, nbr, system)[0],
            x, iters,
        )
        sections["neigh"] = _timed(
            lambda xa: grid_ops.build_grid(xa, system)[0].slot_bead.sum()
            * jnp.ones_like(xa),
            x, max(iters // 5, 5),
        ) / max(system.neighbor.rebuild_every, 1)

    if system.bonds is not None:
        from ..ops import bond as bond_ops

        sections["bond"] = _timed(
            lambda xa: bond_ops.backbone_bond_force(xa, system)[0], x, iters
        )
        if sim.ex_btype > 0:
            sections["bond"] += _timed(
                lambda xa: bond_ops.extruder_bond_force(
                    xa, state.ex_left, state.ex_right, sim.ex_btype - 1, system
                )[0],
                x, iters,
            )
            sections["special"] = _timed(
                lambda xa: special_pair_correction(
                    xa, types, system, state.ex_left, state.ex_right
                )[0],
                x, iters,
            )

    step = make_step(sim)

    @jax.jit
    def whole(st, k):
        return jax.lax.fori_loop(0, k, lambda i, s: step(s), st)

    st = whole(state, 10)
    jax.device_get(st.epair)
    t0 = time.perf_counter()
    st = whole(st, iters)
    jax.device_get(st.epair)
    total = (time.perf_counter() - t0) / iters
    sections["total_step"] = total

    n = system.n
    print(f"\nPerformance: {1.0/total:.3f} timesteps/s, "
          f"{n/total/1e6:.3f} M bead-steps/s ({n} beads)")
    print(f"{'Section':<10} {'ms/step':>10} {'%step':>7}")
    print("-" * 30)
    for k, v in sections.items():
        if k == "total_step":
            continue
        print(f"{k:<10} {v*1e3:>10.3f} {100*v/total:>6.1f}%")
    print(f"{'whole step':<10} {total*1e3:>10.3f}")
    return sections
