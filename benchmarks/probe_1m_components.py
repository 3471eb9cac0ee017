"""Component-cost profile of the 1M-bead blocked-engine step (round-4
verdict next #7 decision probe).

The 1M step runs the blocked stencil kernel with springs, events,
integration and halo refresh in the XLA chain around it, at 1.6x the
per-bead cost of the 100k fused point.  Before attempting whole-step
blocked residency, measure where the gap actually lives:

  1. blocked stencil launch alone       (the Pallas kernel)
  2. halo refresh                       (the (3, cap, P) column gather)
  3. halo refresh, masked-roll variant  (6 masked rolls, no gather)
  4. integrate+Langevin elementwise     (the XLA passes residency would absorb)
  5. whole step springs-empty           (= the r4 11.65 M baseline)

Timing chains each op in a fori_loop and ends with a device_get
(CLAUDE.md: block_until_ready does not sync through the axon tunnel).

Usage: python benchmarks/probe_1m_components.py [n_beads] [reps]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(name, fn, x, reps, get=None):
    import jax

    f = jax.jit(lambda a: jax.lax.fori_loop(0, reps, lambda i, b: fn(b), a))
    t0 = time.perf_counter()
    out = f(x)
    jax.device_get((get or (lambda o: o))(out))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = f(out)
    jax.device_get((get or (lambda o: o))(out))
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name}: {ms:.2f} ms/iter (compile+warm {compile_s:.1f}s)",
          flush=True)
    return ms


def main(n_beads=1_000_000, reps=50):
    from lammps_le_tpu.compile_cache import enable as _enable_cache

    _enable_cache()
    import jax
    import jax.numpy as jnp

    from benchmarks.configs import _chain_system  # reuse the 1M builder
    from lammps_le_tpu.fast import run_fast, to_fast
    from lammps_le_tpu.fast.engine import (_halo_refresh, fast_maps,
                                           make_fast_segment)
    from lammps_le_tpu.fast.pallas_step import make_halo_consts
    from lammps_le_tpu.fixes import NVE, Langevin
    from lammps_le_tpu.integrate import Simulation
    from lammps_le_tpu.state import init_state

    print(f"devices: {jax.devices()}", flush=True)
    system, data = _chain_system(
        1, n_beads, rebuild_every=40, skin=0.5, max_extruders=8192,
        cell_cap=9,
    )
    maps = fast_maps(system)
    nb = system.neighbor
    print(f"grid {nb.nx}x{nb.ny}x{nb.nz} P={maps.P} cap={maps.cap}",
          flush=True)
    sim = Simulation(system=system, dt=0.006,
                     fixes=(NVE(), Langevin(t_start=1.0, t_stop=1.0,
                                            damp=10.0, seed=7)),
                     ex_btype=2)
    state = init_state(system, data.x, types=data.types, seed=19)
    state, _ = run_fast(sim, state, 50)   # place beads into grid residency
    fs = to_fast(state, sim)
    print(f"thermalized 50 steps, flags={int(state.flags):#x}", flush=True)

    # 1) full step, springs empty (the baseline this probe decomposes)
    segment, _ = make_fast_segment(sim, pallas=False, reactive=True)
    seg = jax.jit(segment)
    b = int(jax.device_get(fs.step))
    args = (jnp.asarray(b, jnp.int32), jnp.asarray(reps, jnp.int32),
            jnp.asarray(b, jnp.int32),
            jnp.asarray(b + 4 * reps, jnp.int32))
    t0 = time.perf_counter()
    out = seg(fs, *args)
    jax.device_get(out.step)
    print(f"full-step compile+warm {time.perf_counter()-t0:.1f}s",
          flush=True)
    args2 = (jnp.asarray(b + reps, jnp.int32), jnp.asarray(reps, jnp.int32),
             args[2], args[3])
    t0 = time.perf_counter()
    out = seg(out, *args2)
    jax.device_get(out.step)
    full_ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"full step (blocked stencil + XLA chain): {full_ms:.2f} ms/step "
          f"({n_beads/full_ms*1e3/1e6:.2f} M bead-steps/s)", flush=True)

    gx = fs.gx

    # 2) halo refresh as shipped (static column gather)
    timed("halo refresh (column gather)", lambda a: _halo_refresh(a, maps),
          gx, reps, get=lambda o: o[0, 0, :8])

    # 3) halo refresh, masked-roll candidate (no gather): per axis
    #    ghost = roll(plane) * mask + box shift, z -> y -> x fills
    #    edges/corners by composition
    aux_np, halo_shifts, _ = make_halo_consts(system, maps)
    aux = jnp.asarray(aux_np)
    box = np.asarray(system.box_size, np.float32)

    def refresh_rolls(a):
        for axis in (2, 1, 0):
            s_lo, s_hi = halo_shifts[axis]
            m_lo = aux[2 * axis, :]
            m_hi = aux[2 * axis + 1, :]
            keep = 1.0 - m_lo - m_hi
            sh = jnp.zeros((3, 1, 1), a.dtype).at[axis, 0, 0].set(
                box[axis])
            lo = (jnp.roll(a, s_lo, axis=-1) - sh) * m_lo
            hi = (jnp.roll(a, s_hi, axis=-1) + sh) * m_hi
            a = a * keep + lo + hi
        return a

    timed("halo refresh (masked rolls)", refresh_rolls, gx, reps,
          get=lambda o: o[0, 0, :8])

    # correctness cross-check of the roll variant against the gather
    ref = _halo_refresh(gx, maps)
    got = refresh_rolls(gx)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"roll-variant max|delta| vs gather: {err:.3e}", flush=True)

    # 4) the elementwise integrate+Langevin-shaped passes residency
    #    would absorb (kick+drift+kick ~ 3 fused passes over (3,cap,P))
    def integ(a):
        v = a * 0.999 + 0.006 * a
        return a + 0.006 * v

    timed("integrate-shaped elementwise x1", integ, gx, reps,
          get=lambda o: o[0, 0, :8])

    # 5) rebuild decomposition: the LE-window amortized cost lives here
    from lammps_le_tpu.fast.engine import _extract_beads, _place

    r2 = max(reps // 5, 5)

    def rb(fs_):
        x, v, f = _extract_beads(fs_, system)
        (gx2, gv2, gf2, bid, hn, pid, slot_of, exl, exr, _, img,
         ov) = _place(system, maps, x, v, f, fs_.types, fs_.ex_left,
                      fs_.ex_right, fs_.img)
        return fs_.replace(gx=gx2, gv=gv2, gf=gf2, bid=bid, hn=hn,
                           pid=pid, slot_of=slot_of, img=img)

    timed("rebuild (extract + place)", rb, fs, r2,
          get=lambda o: o.step)

    def ext(fs_):
        x, v, f = _extract_beads(fs_, system)
        return fs_.replace(ex_left=fs_.ex_left + (x[0, 0] * 0).astype(
            jnp.int32))

    timed("extract_beads alone (9-plane gather)", ext, fs, r2,
          get=lambda o: o.step)

    col0 = jnp.clip(fs.slot_of % maps.P, 0, maps.P - 1)

    def srt(c):
        o = jnp.argsort(c).astype(jnp.int32)
        return c + o[:1]

    timed("argsort 1M int32 alone", srt, col0, r2)

    return 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    sys.exit(main(n, r))
