"""Statistical and invariant tests for the loop-extrusion machinery.

The reference ships zero USER-LE tests; parity is established here
statistically (SURVEY.md §4 'implication'): barrier passage rates,
load/unload balance, and structural invariants under full MD.
"""

import numpy as np
import jax
import jax.numpy as jnp

from lammps_le_tpu.fixes import NVE, Extrusion, ExLoad, ExUnload, Langevin
from lammps_le_tpu.fixes.extrusion import make_extrusion_update
from lammps_le_tpu.integrate import Simulation, run
from lammps_le_tpu.state import extruder_partner, init_state

from test_extrusion import put_extruders, straight_chain_system


def test_barrier_passage_rate_matches_through_prob():
    system, x = straight_chain_system(n=30)
    types = np.zeros(30, np.int32)
    types[9] = 1  # ctcf_left at the left target
    fix = Extrusion(nevery=10, neutral_type=1, ctcf_left=2, ctcf_right=3,
                    through_prob=0.5, btype=2)
    upd = make_extrusion_update(system, fix)
    state = init_state(system, x, types=types)
    state = put_extruders(state, [(10, 14)], 8)
    occ = extruder_partner(state, system.n) >= 0
    trials = 300
    xj = jnp.asarray(x)

    @jax.jit
    @jax.vmap
    def trial(key):
        l, r, nm, _ = upd(xj, state.type, state.ex_left, state.ex_right,
                          occ, key)
        return l[0] == 9

    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(trials))
    frac = float(jnp.mean(trial(keys)))
    assert 0.38 < frac < 0.62, frac


def assert_invariants(state, system):
    left = np.asarray(state.ex_left)
    right = np.asarray(state.ex_right)
    active = left >= 0
    assert np.all(right[active] > left[active])
    mol = system.molecule
    assert np.all(mol[left[active]] == mol[right[active]])
    anchors = np.concatenate([left[active], right[active]])
    assert len(anchors) == len(set(anchors.tolist())), "bead in two extruders"
    n_active = int(active.sum())
    return n_active


def test_load_unload_balance_and_invariants():
    system, x = straight_chain_system(n=120, max_extruders=40)
    sim = Simulation(
        system=system, dt=0.002,
        fixes=(
            NVE(),
            Langevin(t_start=1.0, t_stop=1.0, damp=10.0, seed=1),
            Extrusion(nevery=10, neutral_type=1, ctcf_left=2, ctcf_right=3,
                      through_prob=1.0, btype=2),
            ExLoad(nevery=10, iatomtype=1, jatomtype=1, cutoff=2.5, btype=2,
                   fraction=0.3, seed=9, imaxbond=1, inewtype=1,
                   jmaxbond=1, jnewtype=1),
            ExUnload(nevery=10, btype=2, cutoff=0.5, fraction=0.2, seed=5),
        ),
    )
    state = init_state(system, x, seed=2)
    counts = []
    for _ in range(6):
        state, _ = run(sim, state, 50)
        n_active = assert_invariants(state, system)
        counts.append(n_active)
        total = int(state.n_loads) - int(state.n_unloads)
        assert total == n_active, (total, n_active)
    # turnover happened in both directions
    assert int(state.n_loads) > 0
    assert int(state.n_unloads) > 0
    assert max(counts) > 0
    # extruders extrude: spans should exceed the initial |j-i|=2
    left = np.asarray(state.ex_left)
    right = np.asarray(state.ex_right)
    spans = right[left >= 0] - left[left >= 0]
    if len(spans):
        assert spans.max() >= 2


def test_extrusion_velocity_free_chain():
    """A lone unobstructed extruder grows by exactly 2 beads per event
    (reference semantics: one shift per side per nevery,
    fix_extrusion.cpp:430-452)."""
    system, x = straight_chain_system(n=60)
    fix = Extrusion(nevery=5, neutral_type=1, ctcf_left=2, ctcf_right=3,
                    through_prob=0.0, btype=2)
    sim = Simulation(system=system, dt=0.0005, fixes=(NVE(), fix))
    state = init_state(system, x)
    state = put_extruders(state, [(28, 32)], 8)
    n_events = 5
    state, _ = run(sim, state, 5 * n_events)
    l, r = int(state.ex_left[0]), int(state.ex_right[0])
    assert (r - l) == 4 + 2 * n_events, (l, r)
    assert int(state.n_moves) == n_events
