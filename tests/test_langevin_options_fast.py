"""fix langevin zero/group on the fast path (r4 — VERDICT r3 weak #5).

The reference keeps every Langevin option in its one hot path
(src/fix_langevin.cpp:438-674); since r4 the fast engine does too for
``zero`` (in-kernel random-force mean subtract, zeroflag post_force end)
and ``group`` (a 0/1 membership plane rebuilt with the grid, groupbit).
Pins:

* zero semantics: switching ``zero`` on changes each group member's force
  by the SAME per-component constant (-the group's random-force mean) and
  leaves non-members untouched,
* XLA-chain vs fused-kernel (interpret) parity with zero+group active —
  the noise stream is counter-based and bit-identical, so trajectories
  must agree to f32 reassociation tolerance,
* group re-placement across rebuilds (membership is per bead, slots move).
"""

import numpy as np

import jax
import jax.numpy as jnp

from lammps_le_tpu.fast import to_fast
from lammps_le_tpu.fast.engine import fast_supported, make_fast_segment
from lammps_le_tpu.fixes import NVE, Langevin
from lammps_le_tpu.integrate import Simulation, run as run_general
from lammps_le_tpu.io.data import system_from_data
from lammps_le_tpu.scene import serpentine
from lammps_le_tpu.state import init_state
from lammps_le_tpu.system import (BOND_FENE, BOND_HARMONIC, BondParams,
                                  PairLJCut)


def _melt(n=400, seed=9):
    data = serpentine(n, spacing=0.97, row_gap=1.1, seed=seed)
    ones = np.ones((4, 4))
    pair = PairLJCut(epsilon=ones, sigma=ones, cutoff=1.12 * ones,
                     shift=True)
    bonds = BondParams(
        style=np.array([BOND_FENE, BOND_HARMONIC]),
        coeffs=np.array([[30.0, 1.5, 1.0, 1.0], [3.0, 1.1, 0.0, 0.0]]),
    )
    system, _ = system_from_data(
        data, pair=pair, bonds=bonds, dtype="float32", ex_btype=2,
        max_extruders=8, skin=0.3, rebuild_every=3, cell_cap=8,
    )
    warm = Simulation(system=system, dt=0.005,
                      fixes=(NVE(), Langevin(1.0, 1.0, 1.0, seed=5)),
                      ex_btype=2)
    state = init_state(system, data.x, types=data.types, seed=11)
    state, _ = run_general(warm, state, 40)
    state = state.replace(flags=jnp.zeros((), jnp.uint32))
    return system, state


def _advance(sim, state, nsteps, pallas, groups=None):
    segment, _ = make_fast_segment(sim, pallas=pallas)
    fs = to_fast(state, sim, groups=groups)
    b = int(jax.device_get(fs.step))
    return jax.jit(segment)(
        fs, jnp.asarray(b, jnp.int32), nsteps,
        jnp.asarray(b, jnp.int32), jnp.asarray(b + nsteps, jnp.int32))


def test_zero_group_now_fast_supported():
    system, _ = _melt()
    sim = Simulation(
        system=system, dt=0.005,
        fixes=(NVE(), Langevin(1.0, 1.0, 10.0, seed=3, zero=True,
                               group="half")),
        ex_btype=0)
    assert fast_supported(sim)
    # tally / gjf stay general-path
    for kw in (dict(tally=True), dict(gjf="vhalf")):
        sim_bad = Simulation(
            system=system, dt=0.005,
            fixes=(NVE(), Langevin(1.0, 1.0, 10.0, seed=3, **kw)),
            ex_btype=0)
        assert not fast_supported(sim_bad)


def test_zero_shifts_group_forces_uniformly():
    """One step with zero on vs off: members' force delta is one constant
    per component (the subtracted random-force mean), non-members' zero —
    exactly fix_langevin.cpp's zeroflag second pass."""
    system, state = _melt()
    n = system.n
    member = np.zeros(n, bool)
    member[: n // 2] = True
    groups = {"half": member}
    mk = lambda **kw: Simulation(
        system=system, dt=0.005,
        fixes=(NVE(), Langevin(1.0, 1.0, 10.0, seed=3, group="half", **kw)),
        ex_btype=0)
    fs_on = _advance(mk(zero=True), state, 1, False, groups)
    fs_off = _advance(mk(zero=False), state, 1, False, groups)

    # map per-bead deltas out of grid residency
    capP = fs_on.gf.shape[1] * fs_on.gf.shape[2]
    slot = np.clip(np.asarray(fs_on.slot_of), 0, capP - 1)
    df = (np.asarray(fs_on.gf).reshape(3, -1)[:, slot]
          - np.asarray(fs_off.gf).reshape(3, -1)[:, slot])  # (3, N)
    # non-members: untouched
    assert np.max(np.abs(df[:, ~member])) == 0.0
    # members: the same shift per component, and equal to -mean of the
    # random force over the group (so the shifted sum is ~0)
    for c in range(3):
        d = df[c, member]
        assert np.max(np.abs(d - d.mean())) < 1e-4 * max(
            1.0, np.abs(d.mean()))
        assert abs(d.mean()) > 0.0  # the option actually did something


def test_zero_group_chain_vs_fused_parity():
    """XLA chain vs fused kernel (interpret), zero+group active, across a
    rebuild: identical noise stream => trajectories agree to f32
    tolerance; membership plane survives re-placement."""
    system, state = _melt()
    n = system.n
    member = np.zeros(n, bool)
    member[::3] = True
    groups = {"third": member}
    sim = Simulation(
        system=system, dt=0.005,
        fixes=(NVE(), Langevin(1.0, 1.0, 10.0, seed=3, zero=True,
                               group="third")),
        ex_btype=0)
    steps = 8  # crosses the rebuild_every=3 cadence twice
    fx = _advance(sim, state, steps, False, groups)
    fp = _advance(sim, state, steps, "interpret", groups)
    scale = float(jnp.max(jnp.abs(fx.gf)))
    assert float(jnp.max(jnp.abs(fp.gf - fx.gf))) < 3e-5 * max(scale, 1.0)
    assert float(jnp.max(jnp.abs(fp.gx - fx.gx))) < 1e-5
    assert int(fp.flags) == int(fx.flags) == 0
    # the membership plane tracked the rebuilds: counts preserved
    assert float(jnp.sum(fx.lgm)) == float(member.sum())
    assert float(jnp.sum(fp.lgm)) == float(member.sum())


def test_group_only_thermostats_members():
    """With a tiny damp, thermostatted members get large friction forces;
    non-members' Langevin term must be exactly absent (chain engine)."""
    system, state = _melt()
    n = system.n
    member = np.zeros(n, bool)
    member[: n // 4] = True
    groups = {"q": member}
    sim_g = Simulation(
        system=system, dt=0.005,
        fixes=(NVE(), Langevin(1.0, 1.0, 10.0, seed=3, group="q")),
        ex_btype=0)
    sim_none = Simulation(
        system=system, dt=0.005, fixes=(NVE(),), ex_btype=0)
    fs_g = _advance(sim_g, state, 1, False, groups)
    fs_n = _advance(sim_none, state, 1, False)
    capP = fs_g.gf.shape[1] * fs_g.gf.shape[2]
    slot = np.clip(np.asarray(fs_g.slot_of), 0, capP - 1)
    df = (np.asarray(fs_g.gf).reshape(3, -1)[:, slot]
          - np.asarray(fs_n.gf).reshape(3, -1)[:, slot])
    assert np.max(np.abs(df[:, ~member])) == 0.0
    assert np.max(np.abs(df[:, member])) > 0.0
