"""Fused whole-step Pallas kernel vs the XLA step core.

The pallas core (fast/pallas_step.py) must be physics-identical to the XLA
chain in engine.make_fast_segment: same velocity-Verlet order, same halo
semantics, same fused LJ+FENE+exclusion stencil, same counter-based
threefry Langevin noise (bit-exact stream), same LE-event/rebuild gating.
Runs the kernel in interpreter mode on CPU (the hardware path is the same
jaxpr compiled by Mosaic).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lammps_le_tpu.fast import from_fast, to_fast
from lammps_le_tpu.fast.engine import make_fast_segment
from lammps_le_tpu.fixes import NVE, Extrusion, ExLoad, ExUnload, Langevin
from lammps_le_tpu.integrate import Simulation, run as run_general
from lammps_le_tpu.io.data import system_from_data
from lammps_le_tpu.scene import serpentine
from lammps_le_tpu.state import init_state
from lammps_le_tpu.system import BOND_FENE, BOND_HARMONIC, BondParams, PairLJCut


@pytest.fixture(scope="module")
def melt32():
    """Small thermalized f32 melt with seeded extruders."""
    n = 500
    data = serpentine(n, spacing=0.97, row_gap=1.1, seed=3,
                      barrier_fraction=0.01)
    ones = np.ones((4, 4))
    pair = PairLJCut(epsilon=ones, sigma=ones, cutoff=1.12 * ones, shift=True)
    bonds = BondParams(
        style=np.array([BOND_FENE, BOND_HARMONIC]),
        coeffs=np.array([[30.0, 1.5, 1.0, 1.0], [3.0, 1.1, 0.0, 0.0]]),
    )
    system, _ = system_from_data(
        data, pair=pair, bonds=bonds, dtype="float32", ex_btype=2,
        max_extruders=16, skin=0.3, rebuild_every=3, cell_cap=8,
    )
    warm = Simulation(system=system, dt=0.005,
                      fixes=(NVE(), Langevin(1.0, 1.0, 1.0, seed=5)),
                      ex_btype=2)
    state = init_state(system, data.x, types=data.types, seed=11)
    state, _ = run_general(warm, state, 60)
    left = np.full(16, -1, np.int32)
    right = np.full(16, -1, np.int32)
    sites = np.arange(6) * 80 + 3
    left[:6] = sites
    right[:6] = sites + 2
    state = state.replace(
        ex_left=jnp.asarray(left), ex_right=jnp.asarray(right),
        flags=jnp.zeros((), jnp.uint32),
    )
    return system, state


def _le_sim(system, energy_every=4):
    return Simulation(
        system=system, dt=0.005, energy_every=energy_every,
        fixes=(
            NVE(),
            Langevin(t_start=1.0, t_stop=1.0, damp=10.0, seed=904297),
            Extrusion(nevery=5, neutral_type=1, ctcf_left=2, ctcf_right=3,
                      through_prob=0.5, btype=2, ctcf_left_right=4),
            ExLoad(nevery=7, iatomtype=1, jatomtype=1, cutoff=1.12, btype=2,
                   fraction=0.05, seed=684474, imaxbond=1, inewtype=1,
                   jmaxbond=1, jnewtype=1),
            ExUnload(nevery=7, btype=2, cutoff=0.5, fraction=0.05,
                     seed=456456),
        ),
        ex_btype=2,
    )


def _run_core(sim, state, nsteps, pallas):
    segment, _ = make_fast_segment(sim, pallas=pallas)
    fs = to_fast(state, sim)
    begin = int(jax.device_get(fs.step))
    seg = jax.jit(segment, static_argnames=())
    fs = seg(fs, jnp.asarray(begin, jnp.int32), nsteps,
             jnp.asarray(begin, jnp.int32),
             jnp.asarray(begin + nsteps, jnp.int32))
    return fs


def test_one_step_parity(melt32):
    """Forces/positions/velocities after ONE fused-kernel step match the
    XLA chain to f32 reassociation tolerance."""
    system, state = melt32
    sim = _le_sim(system, energy_every=1)
    fx = _run_core(sim, state, 1, pallas=False)
    fp = _run_core(sim, state, 1, pallas="interpret")
    scale = float(jnp.max(jnp.abs(fx.gf)))
    assert float(jnp.max(jnp.abs(fp.gf - fx.gf))) < 3e-5 * max(scale, 1.0)
    assert float(jnp.max(jnp.abs(fp.gx - fx.gx))) < 1e-6
    assert float(jnp.max(jnp.abs(fp.gv - fx.gv))) < 3e-5 * max(scale, 1.0)
    assert abs(float(fp.epair) - float(fx.epair)) < 2e-2
    assert abs(float(fp.ebond) - float(fx.ebond)) < 2e-2
    assert int(fp.flags) == int(fx.flags) == 0


def test_trajectory_and_events_parity(melt32):
    """20 steps with the full LE machinery: same events, same counters,
    trajectories equal to amplified-f32 tolerance (identical noise stream,
    rebuilds, LE decisions)."""
    system, state = melt32
    sim = _le_sim(system, energy_every=4)
    n = 20
    fx = _run_core(sim, state, n, pallas=False)
    fp = _run_core(sim, state, n, pallas="interpret")
    np.testing.assert_array_equal(np.asarray(fx.ex_left),
                                  np.asarray(fp.ex_left))
    np.testing.assert_array_equal(np.asarray(fx.ex_right),
                                  np.asarray(fp.ex_right))
    assert int(fx.n_moves) == int(fp.n_moves)
    assert int(fx.n_loads) == int(fp.n_loads)
    assert int(fx.n_unloads) == int(fp.n_unloads)
    assert int(fx.step) == int(fp.step)
    sx = from_fast(fx, system)
    sp = from_fast(fp, system)
    err = float(jnp.max(jnp.abs(sx.x - sp.x)))
    assert err < 1e-3, err
    assert int(fx.flags) == int(fp.flags)
    # energies refreshed on the same cadence
    assert abs(float(fx.epair) - float(fp.epair)) < 0.1


def test_inkernel_spring_safe_mode(melt32):
    """When every spring is short at rebuild (ex_safe=1), the kernel
    computes extruder forces in the dense pass and the XLA exf pass is
    skipped — forces must still match the XLA chain's gather/scatter
    extruder pass (engine.ex_force_planes / make_extruder_pass)."""
    system, state = melt32
    # place extruders at (i, i+1)-adjacent-ish beads? extruder bonds are
    # (l, r) arbitrary; use (i, i+2) but SETTLE first so springs ~ r0
    sim_settle = Simulation(
        system=system, dt=0.004,
        fixes=(NVE(), Langevin(1.0, 1.0, 2.0, seed=6)), ex_btype=2)
    state2, _ = run_general(sim_settle, state, 120)
    state2 = state2.replace(flags=jnp.zeros((), jnp.uint32))
    # quiet sim: no extrusion moves, so settled springs STAY in adjacent
    # cells and ride the kernel (an extrusion event stretches every spring
    # ~2 beads outward — correctly classified far, covered by the
    # trajectory parity test above)
    sim = Simulation(
        system=system, dt=0.005, energy_every=1,
        fixes=(NVE(), Langevin(1.0, 1.0, 10.0, seed=904297),
               ExUnload(nevery=50, btype=2, cutoff=9.0, fraction=0.0,
                        seed=456456)),
        ex_btype=2,
    )

    fx = _run_core(sim, state2, 6, pallas=False)
    fp = _run_core(sim, state2, 6, pallas="interpret")
    # the cached block tables must cover the springs with the XLA
    # fallback OFF (no overflow-dropped anchors in this settled config)
    assert not bool(fp.ex_fb)
    assert int(fp.ex_nblk) > 0
    scale = float(jnp.max(jnp.abs(fx.gf)))
    assert float(jnp.max(jnp.abs(fp.gf - fx.gf))) < 1e-4 * max(scale, 1.0)
    assert float(jnp.max(jnp.abs(fp.gx - fx.gx))) < 1e-5
    assert abs(float(fp.ebond) - float(fx.ebond)) < 5e-2
    assert int(fp.flags) == int(fx.flags) == 0


def test_tail_row_parity():
    """cap > 8 exercises the sublane-tile j-split: the 8-row block pass
    plus broadcast tail rows must reproduce the XLA chain exactly (tail
    rows hold the 9th+ bead of dense cells — the globule case)."""
    n = 400
    data = serpentine(n, spacing=0.97, row_gap=1.0, seed=9,
                      barrier_fraction=0.01)
    ones = np.ones((4, 4))
    pair = PairLJCut(epsilon=ones, sigma=ones, cutoff=1.12 * ones,
                     shift=True)
    bonds = BondParams(
        style=np.array([BOND_FENE, BOND_HARMONIC]),
        coeffs=np.array([[30.0, 1.5, 1.0, 1.0], [3.0, 1.1, 0.0, 0.0]]),
    )
    # coarse cells (fat skin) force lambda high enough that real beads
    # occupy tail rows
    system, _ = system_from_data(
        data, pair=pair, bonds=bonds, dtype="float32", ex_btype=2,
        max_extruders=16, skin=0.9, rebuild_every=3, cell_cap=10,
    )
    warm = Simulation(system=system, dt=0.005,
                      fixes=(NVE(), Langevin(1.0, 1.0, 1.0, seed=5)),
                      ex_btype=2)
    state = init_state(system, data.x, types=data.types, seed=11)
    state, _ = run_general(warm, state, 40)
    state = state.replace(flags=jnp.zeros((), jnp.uint32))
    sim = _le_sim(system, energy_every=4)

    # occupancy must actually reach the tail rows for this test to bite
    fs0 = to_fast(state, sim)
    occ = np.asarray(fs0.bid < n).sum(axis=0)
    assert occ.max() > 8, f"max occupancy {occ.max()} — tail rows empty"

    # strict force parity at ONE step (longer windows only measure f32
    # reassociation chaos, not the tail path)
    fx = _run_core(sim, state, 1, pallas=False)
    fp = _run_core(sim, state, 1, pallas="interpret")
    scale = float(jnp.max(jnp.abs(fx.gf)))
    assert float(jnp.max(jnp.abs(fp.gf - fx.gf))) < 3e-5 * max(scale, 1.0)
    assert abs(float(fx.epair) - float(fp.epair)) < 0.05
    assert abs(float(fx.ebond) - float(fp.ebond)) < 0.05
    # multi-rebuild window: this deliberately overloaded config (the LE
    # events detonate it within a few steps) must FAIL IDENTICALLY on
    # both engines — same sticky flags, same event counters.  Positions
    # are not compared (f32 chaos; the physics-parity claim is the
    # 1-step check above).
    fx = _run_core(sim, state, 8, pallas=False)
    fp = _run_core(sim, state, 8, pallas="interpret")
    assert int(fx.flags) == int(fp.flags)
    assert int(fx.n_loads) == int(fp.n_loads)
    assert int(fx.n_moves) == int(fp.n_moves)


def test_kernel_cache_keys_spring_physics(melt32):
    """Two Simulations with identical geometry but different extruder
    spring constants must NOT share a compiled kernel (the cache key
    omitting spring coeffs silently reused the first run's springs —
    round-3 review finding)."""
    import dataclasses as _dc

    system, state = melt32
    k_soft = np.asarray(system.bonds.coeffs).copy()
    k_hard = k_soft.copy()
    k_hard[1, 0] = k_soft[1, 0] * 10.0  # extruder harmonic k
    sys_soft = system
    sys_hard = system.replace(
        bonds=_dc.replace(system.bonds, coeffs=k_hard))

    def spring_force(sys_):
        sim = Simulation(
            system=sys_, dt=0.005, energy_every=1,
            fixes=(NVE(), Langevin(1.0, 1.0, 10.0, seed=904297)),
            ex_btype=2)
        fs = _run_core(sim, state, 1, pallas="interpret")
        return float(jnp.max(jnp.abs(fs.gf))), float(fs.ebond)

    f_soft, eb_soft = spring_force(sys_soft)
    f_hard, eb_hard = spring_force(sys_hard)
    # 10x stiffer springs on stretched extruder bonds must change the
    # bond energy (stale-cache reuse would make these identical)
    assert abs(eb_hard - eb_soft) > 1e-3, (eb_soft, eb_hard)


def test_quiet_window_launch_segmentation(melt32):
    """Long quiet windows (no LE events) exercise LAUNCH_MAX chunking,
    the energy-step single-launch bracketing, and the cadence-40
    rebuild backstop — segmentation must be invisible to physics
    (trajectories equal XLA chain) and the launch counter must show
    real amortization (launches << steps)."""
    import dataclasses as _dc

    system, state = melt32
    sysq = system.replace(
        neighbor=_dc.replace(system.neighbor, rebuild_every=40))
    sim = Simulation(
        system=sysq, dt=0.005, energy_every=25,
        fixes=(NVE(), Langevin(1.0, 1.0, 10.0, seed=904297)),
        ex_btype=2)
    n = 50
    fx = _run_core(sim, state, n, pallas=False)
    fp = _run_core(sim, state, n, pallas="interpret")
    assert int(fp.step) == int(fx.step)
    sx = from_fast(fx, system)
    sp = from_fast(fp, system)
    assert float(jnp.max(jnp.abs(sx.x - sp.x))) < 1e-3
    assert int(fx.flags) == int(fp.flags) == 0
    # amortization: quiet windows must batch multiple steps per launch
    assert int(fp.n_launches) < n, int(fp.n_launches)
    assert abs(float(fx.epair) - float(fp.epair)) < 0.1


def test_near_spring_stencil_parity(melt32, monkeypatch):
    """LLE_NEAR_SPRINGS=1: harmonic extruder springs whose anchors sit in
    stencil-adjacent rebuild cells ride the fused pair chain
    (pallas_step near_ex) while the block table keeps only the
    stencil-invisible remainder — the SPLIT must be invisible to
    physics: forces, energies, trajectories, events all match the XLA
    chain (which always computes every spring via ex_force_planes)."""
    monkeypatch.setenv("LLE_NEAR_SPRINGS", "1")
    system, state = melt32
    from lammps_le_tpu.fast.pallas_step import near_springs_enabled

    assert near_springs_enabled(system, 2)

    # settle so springs relax toward r0 (anchors land in adjacent cells)
    sim_settle = Simulation(
        system=system, dt=0.004,
        fixes=(NVE(), Langevin(1.0, 1.0, 2.0, seed=6)), ex_btype=2)
    state2, _ = run_general(sim_settle, state, 120)
    state2 = state2.replace(flags=jnp.zeros((), jnp.uint32))

    # quiet sim: near springs stay near -> the whole table empties and
    # the stencil term carries ALL spring force
    sim = Simulation(
        system=system, dt=0.005, energy_every=1,
        fixes=(NVE(), Langevin(1.0, 1.0, 10.0, seed=904297)),
        ex_btype=2)
    fs0 = to_fast(state2, sim)
    n_springs = int(jnp.sum(fs0.ex_left >= 0))
    assert n_springs > 0
    assert int(fs0.ex_nblk) == 0, (
        "settled springs should all be stencil-visible (block table empty)")

    fx = _run_core(sim, state2, 6, pallas=False)
    fp = _run_core(sim, state2, 6, pallas="interpret")
    scale = float(jnp.max(jnp.abs(fx.gf)))
    assert float(jnp.max(jnp.abs(fp.gf - fx.gf))) < 1e-4 * max(scale, 1.0)
    assert float(jnp.max(jnp.abs(fp.gx - fx.gx))) < 1e-5
    assert abs(float(fp.ebond) - float(fx.ebond)) < 5e-2
    assert int(fp.flags) == int(fx.flags) == 0

    # full LE machinery across events/rebuilds: extrusion stretches
    # springs across cells, ex_load creates new near ones — the
    # near/far partition is refreshed at every retable/rebuild
    sim_le = _le_sim(system, energy_every=4)
    n = 20
    fx = _run_core(sim_le, state2, n, pallas=False)
    fp = _run_core(sim_le, state2, n, pallas="interpret")
    np.testing.assert_array_equal(np.asarray(fx.ex_left),
                                  np.asarray(fp.ex_left))
    assert int(fx.n_moves) == int(fp.n_moves)
    assert int(fx.n_loads) == int(fp.n_loads)
    assert int(fx.n_unloads) == int(fp.n_unloads)
    sx = from_fast(fx, system)
    sp = from_fast(fp, system)
    assert float(jnp.max(jnp.abs(sx.x - sp.x))) < 1e-3
    assert int(fx.flags) == int(fp.flags)
    assert abs(float(fx.ebond) - float(fp.ebond)) < 0.1


def test_near_spring_table_partition(melt32, monkeypatch):
    """The near/far table split is exactly complementary: far springs
    (anchors in non-adjacent cells) stay in the block table; near ones
    are dropped; backbone-adjacent anchor pairs always stay."""
    monkeypatch.setenv("LLE_NEAR_SPRINGS", "1")
    system, state = melt32
    from lammps_le_tpu.fast.engine import _near_spring_mask, fast_maps

    sim = Simulation(
        system=system, dt=0.005,
        fixes=(NVE(), Langevin(1.0, 1.0, 10.0, seed=904297)),
        ex_btype=2)
    # one deliberately FAR spring: beads at opposite ends of the chain
    left = np.asarray(state.ex_left).copy()
    right = np.asarray(state.ex_right).copy()
    left[6], right[6] = 3, 400          # far apart in the serpentine
    left[7], right[7] = 10, 11          # backbone-adjacent pair
    state = state.replace(ex_left=jnp.asarray(left),
                          ex_right=jnp.asarray(right))
    fs = to_fast(state, sim)
    maps = fast_maps(system)
    near = _near_spring_mask(system, 2, maps, fs.exl_slot, fs.exr_slot,
                             fs.ex_left, fs.ex_right)
    near = np.asarray(near)
    assert not near[6], "cross-box spring must be classified far"
    assert not near[7], "backbone-adjacent spring must stay in the table"
    # block table holds exactly the non-near active springs
    n_active = int(jnp.sum(fs.ex_left >= 0))
    n_far = int(np.sum(~near[np.asarray(fs.ex_left) >= 0]))
    assert n_far >= 2
    assert int(fs.ex_nblk) == -(-n_far // 32) or n_far == 0


@pytest.fixture(scope="module")
def melt2k():
    """Larger thermalized melt whose grid is wide enough (P >= 640) for
    the v5 windowed spring blocks under a monkeypatched EX_WN=512."""
    n = 2000
    data = serpentine(n, spacing=0.97, row_gap=1.1, seed=9,
                      barrier_fraction=0.01)
    ones = np.ones((4, 4))
    pair = PairLJCut(epsilon=ones, sigma=ones, cutoff=1.12 * ones, shift=True)
    bonds = BondParams(
        style=np.array([BOND_FENE, BOND_HARMONIC]),
        coeffs=np.array([[30.0, 1.5, 1.0, 1.0], [3.0, 1.1, 0.0, 0.0]]),
    )
    system, _ = system_from_data(
        data, pair=pair, bonds=bonds, dtype="float32", ex_btype=2,
        max_extruders=64, skin=0.4, rebuild_every=5, cell_cap=9,
    )
    warm = Simulation(system=system, dt=0.005,
                      fixes=(NVE(), Langevin(1.0, 1.0, 1.0, seed=5)),
                      ex_btype=2)
    state = init_state(system, data.x, types=data.types, seed=11)
    state, _ = run_general(warm, state, 40)
    # mix of LOCAL springs (chain-adjacent anchors -> windowable) and
    # FAR ones (opposite ends of the serpentine -> full-P blocks)
    left = np.full(64, -1, np.int32)
    right = np.full(64, -1, np.int32)
    sites = np.arange(36) * 50 + 3
    left[:36] = sites
    right[:36] = sites + 2
    left[36], right[36] = 5, 1900
    left[37], right[37] = 60, 1700
    state = state.replace(
        ex_left=jnp.asarray(left), ex_right=jnp.asarray(right),
        flags=jnp.zeros((), jnp.uint32),
    )
    return system, state


def test_windowed_block_table_invariants(melt2k, monkeypatch):
    """v5 table: windowed blocks store base-relative cols inside
    [0, WN); reconstructing absolute (row, col, active) anchors over
    windowed+full blocks gives EXACTLY the active input anchors."""
    from lammps_le_tpu.fast import pallas_step
    from lammps_le_tpu.fast.engine import _ex_block_table, fast_maps

    monkeypatch.setattr(pallas_step, "EX_WN", 512)
    system, state = melt2k
    sim = Simulation(
        system=system, dt=0.005,
        fixes=(NVE(), Langevin(1.0, 1.0, 10.0, seed=904297)),
        ex_btype=2)
    fs = to_fast(state, sim)
    maps = fast_maps(system)
    P, cap = maps.P, maps.cap
    assert pallas_step.ex_window(P) == 512
    W = pallas_step.EX_BLOCK
    tab = np.asarray(fs.ex_tab).reshape(-1, 2 * W, 8)
    bases = np.asarray(fs.ex_bases)
    nblk, nwin = int(fs.ex_nblk), int(fs.ex_nwin)
    assert nblk >= 2 and 1 <= nwin < nblk
    got = set()
    for b in range(nblk):
        rows = tab[b]
        act = rows[:, 2] > 0
        cols = rows[:, 1].copy()
        if b < nwin:
            assert 0 <= bases[b] * 128 <= P - 512
            assert np.all(cols[act] >= 0) and np.all(cols[act] < 512)
            cols = cols + bases[b] * 128
        else:
            assert bases[b] == 0
        for r, c in zip(rows[act, 0], cols[act]):
            got.add((int(r), int(c)))
    want = set()
    for sl, sr, l in zip(np.asarray(fs.exl_slot), np.asarray(fs.exr_slot),
                         np.asarray(fs.ex_left)):
        if l >= 0:
            want.add((int(sl) // P, int(sl) % P))
            want.add((int(sr) // P, int(sr) % P))
    assert got == want
    # the far cross-box springs must NOT be windowed: find their anchors
    # in full-P blocks only
    sl36 = int(np.asarray(fs.exl_slot)[36])
    found_in_full = any(
        (tab[b][:, 2] > 0)
        [np.asarray(tab[b][:, 0] * P + tab[b][:, 1] +
                    (bases[b] * 128 if b < nwin else 0) == sl36)].any()
        for b in range(nwin, nblk))
    assert found_in_full


def test_windowed_block_parity(melt2k, monkeypatch):
    """Physics is invariant to the windowed/full split: interpret-mode
    fused kernel (EX_WN=512, windowed blocks active) matches the XLA
    chain through steps, energies, and the full LE event machinery."""
    from lammps_le_tpu.fast import pallas_step

    monkeypatch.setattr(pallas_step, "EX_WN", 512)
    system, state = melt2k
    sim = Simulation(
        system=system, dt=0.005, energy_every=2,
        fixes=(NVE(), Langevin(1.0, 1.0, 10.0, seed=904297)),
        ex_btype=2)
    fx = _run_core(sim, state, 4, pallas=False)
    fp = _run_core(sim, state, 4, pallas="interpret")
    assert int(fp.ex_nwin) >= 1
    # compare PHYSICAL (bead-extracted) state: raw planes differ in
    # ghost columns whose stale values are engine-cadence-dependent
    # (physically irrelevant; present with EX_WN=0 too)
    sx = from_fast(fx, system)
    sp = from_fast(fp, system)
    assert float(jnp.max(jnp.abs(sx.x - sp.x))) < 1e-5
    assert float(jnp.max(jnp.abs(sx.v - sp.v))) < 1e-4
    assert abs(float(fp.ebond) - float(fx.ebond)) < 5e-2
    assert int(fp.flags) == int(fx.flags) == 0
