"""Deterministic micro-scenarios for the three LE fixes.

The reference ships zero tests for USER-LE (SURVEY.md §4); these encode the
semantics extracted from fix_extrusion.cpp / fix_ex_load.cpp /
fix_ex_unload.cpp as executable checks.
"""

import numpy as np
import jax
import jax.numpy as jnp

from lammps_le_tpu.fixes import Extrusion, ExLoad, ExUnload
from lammps_le_tpu.fixes.extrusion import make_extrusion_update
from lammps_le_tpu.fixes.ex_load import make_ex_load_update
from lammps_le_tpu.fixes.ex_unload import make_ex_unload_update
from lammps_le_tpu.state import init_state, extruder_partner
from lammps_le_tpu.system import build_system, chain_topology

from helpers import fene_harmonic_bonds, lj_pair_params


def straight_chain_system(n=30, n_types=4, max_extruders=8, spacing=0.97):
    nxt, prv, mol, btype = chain_topology([n])
    x = np.zeros((n, 3))
    x[:, 0] = np.arange(n) * spacing + 1.0
    x[:, 1] = 4.0
    x[:, 2] = 4.0
    # keep the transverse box small: a cubic box of edge ~n*spacing would
    # create an enormous, nearly-empty cell grid (slow on test CPUs)
    box = (n * spacing + 2.0, 8.0, 8.0)
    system = build_system(
        n=n, n_types=n_types, box_lo=(0, 0, 0), box_hi=box,
        next_bead=nxt, prev_bead=prv, molecule=mol, backbone_type=btype,
        masses=np.ones(n_types), pair=lj_pair_params(n_types),
        bonds=fene_harmonic_bonds(), max_extruders=max_extruders,
        dtype="float64",
    )
    return system, x


def put_extruders(state, pairs, e):
    left = np.full(e, -1, np.int32)
    right = np.full(e, -1, np.int32)
    for k, (l, r) in enumerate(pairs):
        left[k] = l
        right[k] = r
    return state.replace(ex_left=jnp.asarray(left), ex_right=jnp.asarray(right))


EX_FIX = Extrusion(nevery=10, neutral_type=1, ctcf_left=2, ctcf_right=3,
                   through_prob=0.0, btype=2, ctcf_left_right=4)


def run_extrusion(system, x, state, fix=EX_FIX, key=0):
    upd = make_extrusion_update(system, fix)
    occ = extruder_partner(state, system.n) >= 0
    l, r, nm, _ = upd(jnp.asarray(x), state.type, state.ex_left,
                      state.ex_right, occ, jax.random.PRNGKey(key))
    return np.asarray(l), np.asarray(r), int(nm)


def test_free_extruder_moves_both_sides():
    system, x = straight_chain_system()
    state = init_state(system, x)
    state = put_extruders(state, [(10, 14)], 8)
    l, r, nm = run_extrusion(system, x, state)
    assert (l[0], r[0]) == (9, 15)
    assert nm == 1


def test_ctcf_left_blocks_left_move():
    system, x = straight_chain_system()
    types = np.zeros(len(x), np.int32)
    types[9] = 1  # 0-based type 1 == deck type 2 == ctcf_left
    state = init_state(system, x, types=types)
    state = put_extruders(state, [(10, 14)], 8)
    l, r, nm = run_extrusion(system, x, state)
    assert (l[0], r[0]) == (10, 15)  # one-sided right move


def test_ctcf_right_does_not_block_left_move():
    system, x = straight_chain_system()
    types = np.zeros(len(x), np.int32)
    types[9] = 2  # ctcf_right at the left target: no gate on leftward move
    state = init_state(system, x, types=types)
    state = put_extruders(state, [(10, 14)], 8)
    l, r, nm = run_extrusion(system, x, state)
    assert (l[0], r[0]) == (9, 15)


def test_bidirectional_ctcf_blocks_both():
    system, x = straight_chain_system()
    types = np.zeros(len(x), np.int32)
    types[9] = 3   # ctcf_left_right (deck type 4)
    types[15] = 3
    state = init_state(system, x, types=types)
    state = put_extruders(state, [(10, 14)], 8)
    l, r, nm = run_extrusion(system, x, state)
    assert (l[0], r[0]) == (10, 14)
    assert nm == 0


def test_through_prob_one_passes_barrier():
    system, x = straight_chain_system()
    types = np.zeros(len(x), np.int32)
    types[9] = 1
    state = init_state(system, x, types=types)
    state = put_extruders(state, [(10, 14)], 8)
    fix = Extrusion(nevery=10, neutral_type=1, ctcf_left=2, ctcf_right=3,
                    through_prob=1.0, btype=2)
    l, r, nm = run_extrusion(system, x, state, fix=fix)
    assert (l[0], r[0]) == (9, 15)


def test_chain_end_one_sided():
    system, x = straight_chain_system()
    state = init_state(system, x)
    state = put_extruders(state, [(1, 5)], 8)
    l, r, nm = run_extrusion(system, x, state)
    # bead 0 is a chain end (no prev backbone bond): left is never eligible
    assert (l[0], r[0]) == (1, 6)


def test_collision_stall():
    system, x = straight_chain_system()
    state = init_state(system, x)
    state = put_extruders(state, [(5, 9), (11, 15)], 8)
    l, r, nm = run_extrusion(system, x, state)
    # both want bead 10; exactly one of them gets it, the other stalls whole
    winners = [(l[0], r[0]), (l[1], r[1])]
    occupied = set()
    for pair in winners:
        occupied.update(pair)
    assert len(occupied) == 4
    got10 = [p for p in winners if 10 in p]
    assert len(got10) == 1
    stalled = [p for p in winners if 10 not in p]
    assert stalled[0] in [(5, 9), (11, 15)]
    assert nm == 1


def test_adjacent_extruders_fully_stalled():
    system, x = straight_chain_system()
    state = init_state(system, x)
    # e0 right target is 9 (occupied), left target 3 free -> one-sided left
    state = put_extruders(state, [(4, 8), (9, 13)], 8)
    l, r, nm = run_extrusion(system, x, state)
    assert (l[0], r[0]) == (3, 8)
    assert (l[1], r[1]) == (9, 14)


LOAD_FIX = ExLoad(nevery=10, iatomtype=1, jatomtype=1, cutoff=2.5, btype=2,
                  fraction=1.0, imaxbond=1, inewtype=1, jmaxbond=1, jnewtype=1)


def run_load(system, x, state, fix=LOAD_FIX, key=0):
    upd = make_ex_load_update(system, fix)
    occ = extruder_partner(state, system.n) >= 0
    l, r, t, nc, fl = upd(jnp.asarray(x), state.type, state.ex_left,
                          state.ex_right, occ, jax.random.PRNGKey(key))
    return np.asarray(l), np.asarray(r), int(nc), int(fl)


def test_load_creates_i_ip2_pairs():
    system, x = straight_chain_system(n=20, max_extruders=8)
    state = init_state(system, x)
    l, r, nc, fl = run_load(system, x, state)
    assert nc >= 1 and fl == 0
    used = set()
    for k in range(8):
        if l[k] >= 0:
            assert r[k] - l[k] == 2
            assert l[k] not in used and r[k] not in used
            mid = (l[k] + r[k]) // 2
            assert mid not in used
            used.update((l[k], mid, r[k]))
            # never at chain ends
            assert l[k] >= 1 and r[k] <= 18


def test_load_respects_occupancy():
    system, x = straight_chain_system(n=20, max_extruders=8)
    state = init_state(system, x)
    state = put_extruders(state, [(8, 10)], 8)
    l, r, nc, fl = run_load(system, x, state)
    for k in range(1, 8):
        if l[k] >= 0:
            # beads 8,10 carry anchors; mid bead 9 has degree 2 but is
            # flanked by occupied beads — no new pair may touch 8,9,10
            assert not {l[k], l[k] + 1, r[k]} & {8, 9, 10}


def test_load_distance_gate():
    system, x = straight_chain_system(n=20, max_extruders=8)
    fix = ExLoad(nevery=10, iatomtype=1, jatomtype=1, cutoff=0.5, btype=2)
    state = init_state(system, x)
    l, r, nc, fl = run_load(system, x, state, fix=fix)
    assert nc == 0  # straight chain: |x_i - x_{i+2}| = 1.94 > 0.5


def test_load_type_gate():
    system, x = straight_chain_system(n=20, max_extruders=8)
    types = np.zeros(20, np.int32)
    types[:] = 1  # nothing is type 1 (deck) anymore
    state = init_state(system, x, types=types)
    l, r, nc, fl = run_load(system, x, state)
    assert nc == 0


def test_unload_breaks_long_bonds_only():
    system, x = straight_chain_system(n=30, max_extruders=8)
    state = init_state(system, x)
    # (5,7) spans 1.94; (10,20) spans 9.7
    state = put_extruders(state, [(5, 7), (10, 20)], 8)
    fix = ExUnload(nevery=10, btype=2, cutoff=5.0, fraction=1.0)
    upd = make_ex_unload_update(system, fix)
    l, r, nb = upd(jnp.asarray(x), state.ex_left, state.ex_right,
                   jax.random.PRNGKey(0))
    l, r = np.asarray(l), np.asarray(r)
    assert (l[0], r[0]) == (5, 7)
    assert l[1] == -1 and r[1] == -1
    assert int(nb) == 1


def test_unload_fraction_zero_keeps_all():
    system, x = straight_chain_system(n=30, max_extruders=8)
    state = init_state(system, x)
    state = put_extruders(state, [(10, 20)], 8)
    fix = ExUnload(nevery=10, btype=2, cutoff=5.0, fraction=0.0)
    upd = make_ex_unload_update(system, fix)
    l, r, nb = upd(jnp.asarray(x), state.ex_left, state.ex_right,
                   jax.random.PRNGKey(0))
    assert int(nb) == 0
    assert int(l[0]) == 10


def test_release_r_unloads_wound_extruder():
    """Opt-in max-tension stall release (Extrusion.release_r): an extruder
    stretched past release_r unloads at event time; shorter ones keep
    extruding (bounds VALIDATION.md defect 2)."""
    system, x = straight_chain_system(n=30, max_extruders=8)
    state = init_state(system, x)
    # (5,7) spans 1.94 < 5.0; (10,20) spans 9.7 > 5.0
    state = put_extruders(state, [(5, 7), (10, 20)], 8)
    fix = Extrusion(nevery=10, neutral_type=1, ctcf_left=2, ctcf_right=3,
                    through_prob=0.0, btype=2, release_r=5.0)
    upd = make_extrusion_update(system, fix)
    occ = extruder_partner(state, system.n) >= 0
    l, r, nm, nrel = upd(jnp.asarray(x), state.type, state.ex_left,
                         state.ex_right, occ, jax.random.PRNGKey(0))
    l, r = np.asarray(l), np.asarray(r)
    assert int(nrel) == 1
    assert l[1] == -1 and r[1] == -1     # wound extruder released
    assert (l[0], r[0]) == (4, 8)        # healthy one extruded both ways
    assert int(nm) == 1


def test_release_r_off_by_default():
    system, x = straight_chain_system(n=30, max_extruders=8)
    state = init_state(system, x)
    state = put_extruders(state, [(10, 20)], 8)
    l, r, nm = run_extrusion(system, x, state)  # EX_FIX has release_r=0
    assert (l[0], r[0]) == (9, 21)
