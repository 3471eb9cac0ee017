"""Golden-reference force tests vs independent numpy implementations.

Mirrors the reference's per-atom force regression strategy
(unittest/force-styles/, tolerance ~1e-12 in f64 — SURVEY.md §4).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lammps_le_tpu.ops import bond as bond_ops
from lammps_le_tpu.ops import cells, pair as pair_ops
from lammps_le_tpu.state import init_state, extruder_partner

from helpers import (
    fene_harmonic_bonds,
    fene_np,
    harmonic_np,
    lj_np,
    random_chain_system,
)

TOL = 1e-10


@pytest.fixture(scope="module")
def chain_sys():
    return random_chain_system(n_chains=4, chain_len=25, box_l=12.0, seed=3)


def backbone_pairs(system):
    nxt = system.next_bead
    return [(i, int(nxt[i])) for i in range(system.n) if nxt[i] >= 0]


def test_lj_bruteforce_matches_numpy(chain_sys):
    system, x = chain_sys
    box = np.array(system.box_size)
    excl = {frozenset(p) for p in backbone_pairs(system)}
    f_ref, e_ref = lj_np(x, box, 1.0, 1.0, 1.12, shift=True, excl=excl)

    types = jnp.zeros(system.n, jnp.int32)
    f, e = pair_ops.lj_force_bruteforce(jnp.asarray(x), types, system)
    np.testing.assert_allclose(np.asarray(f), f_ref, atol=TOL)
    np.testing.assert_allclose(float(e), e_ref, rtol=1e-12)


def test_lj_cell_list_matches_bruteforce(chain_sys):
    system, x = chain_sys
    assert system.neighbor.use_cells
    types = jnp.zeros(system.n, jnp.int32)
    xj = jnp.asarray(x)
    nbr, flags = cells.build_neighbor_list(xj, system)
    assert int(flags) == 0
    f_nbr, e_nbr = pair_ops.lj_force_nbr(xj, types, nbr, system)
    f_bf, e_bf = pair_ops.lj_force_bruteforce(xj, types, system)
    np.testing.assert_allclose(np.asarray(f_nbr), np.asarray(f_bf), atol=TOL)
    np.testing.assert_allclose(float(e_nbr), float(e_bf), rtol=1e-12)


def _grid_vs_brute(system, x, ex_left=None, ex_right=None, partner=None):
    """Total pair force via the grid path (kernel + special correction)
    vs the brute-force reference path with in-kernel exclusions."""
    from lammps_le_tpu.ops import grid as grid_ops
    from lammps_le_tpu.ops.forces import special_pair_correction

    types = jnp.zeros(system.n, jnp.int32)
    # the engine wraps at rebuild (ghost shifts assume in-box positions)
    xj = jnp.asarray(np.asarray(x) % np.asarray(system.box_size))
    g, fl = grid_ops.build_grid(xj, system)
    f_g, e_g = grid_ops.grid_pair_force(xj, types, g, system)
    fc, ec = special_pair_correction(xj, types, system, ex_left, ex_right)
    f_g = f_g + fc
    e_g = e_g + ec
    f_b, e_b = pair_ops.lj_force_bruteforce(xj, types, system,
                                            ex_partner=partner)
    return int(fl), f_g, e_g, f_b, e_b


def test_grid_pair_matches_bruteforce(chain_sys):
    system, x = chain_sys
    fl, f_g, e_g, f_b, e_b = _grid_vs_brute(system, x)
    assert fl == 0
    scale = float(jnp.abs(f_b).max())
    np.testing.assert_allclose(np.asarray(f_g), np.asarray(f_b),
                               atol=1e-9 * max(scale, 1.0))
    np.testing.assert_allclose(float(e_g), float(e_b), rtol=1e-10)


def test_grid_pair_excludes_extruder_partners(chain_sys):
    from lammps_le_tpu.state import extruder_partner, init_state

    system, x = chain_sys
    x = x.copy()
    x[30] = x[2] + np.array([0.9, 0.0, 0.0])
    state = init_state(system, x)
    state = state.replace(
        ex_left=jnp.asarray([2], jnp.int32),
        ex_right=jnp.asarray([30], jnp.int32),
    )
    partner = extruder_partner(state, system.n)
    fl, f_g, e_g, f_b, e_b = _grid_vs_brute(
        system, x, ex_left=state.ex_left, ex_right=state.ex_right,
        partner=partner,
    )
    scale = float(jnp.abs(f_b).max())
    np.testing.assert_allclose(np.asarray(f_g), np.asarray(f_b),
                               atol=1e-9 * max(scale, 1.0))
    np.testing.assert_allclose(float(e_g), float(e_b), rtol=1e-10)


def test_cell_list_valid_after_skin_motion(chain_sys):
    """Pairs entering the cutoff after sub-half-skin motion are still found."""
    system, x = chain_sys
    types = jnp.zeros(system.n, jnp.int32)
    xj = jnp.asarray(x)
    nbr, _ = cells.build_neighbor_list(xj, system)
    rng = np.random.default_rng(7)
    disp = rng.uniform(-1, 1, x.shape)
    disp *= (0.49 * system.neighbor.skin / 2) / np.abs(disp).max()
    x2 = jnp.asarray(x + disp)
    f_nbr, e_nbr = pair_ops.lj_force_nbr(x2, types, nbr, system)
    f_bf, e_bf = pair_ops.lj_force_bruteforce(x2, types, system)
    np.testing.assert_allclose(np.asarray(f_nbr), np.asarray(f_bf), atol=TOL)


def test_fene_backbone_matches_numpy(chain_sys):
    system, x = chain_sys
    box = np.array(system.box_size)
    bonds = backbone_pairs(system)
    f_ref, e_ref = fene_np(x, box, bonds, 30.0, 1.5, 1.0, 1.0)
    f, e, flags = bond_ops.backbone_bond_force(jnp.asarray(x), system)
    np.testing.assert_allclose(np.asarray(f), f_ref, atol=TOL)
    np.testing.assert_allclose(float(e), e_ref, rtol=1e-12)
    assert int(flags) == 0


def test_fene_clamp_sets_flag(chain_sys):
    system, x = chain_sys
    x2 = x.copy()
    x2[1] = x2[0] + np.array([1.49, 0, 0])  # rlogarg ~ 0.013 < 0.1
    f, e, flags = bond_ops.backbone_bond_force(jnp.asarray(x2), system)
    assert int(flags) != 0
    assert np.isfinite(np.asarray(f)).all()


def test_extruder_harmonic_force():
    system, x = random_chain_system(
        n_chains=2, chain_len=30, box_l=10.0, seed=5,
        bonds=fene_harmonic_bonds(), max_extruders=4,
    )
    state = init_state(system, x)
    # two active extruders: (3, 9) and (40, 44)
    state = state.replace(
        ex_left=jnp.asarray([3, 40, -1, -1], jnp.int32),
        ex_right=jnp.asarray([9, 44, -1, -1], jnp.int32),
    )
    f, e, flags = bond_ops.extruder_bond_force(
        jnp.asarray(x), state.ex_left, state.ex_right, 1, system
    )
    f_ref, e_ref = harmonic_np(x, np.array(system.box_size), [(3, 9), (40, 44)],
                               10.0, 1.0)
    np.testing.assert_allclose(np.asarray(f), f_ref, atol=TOL)
    np.testing.assert_allclose(float(e), e_ref, rtol=1e-12)

    partner = extruder_partner(state, system.n)
    assert int(partner[3]) == 9 and int(partner[9]) == 3
    assert int(partner[40]) == 44 and int(partner[44]) == 40
    assert int(jnp.sum(partner >= 0)) == 4


def test_lj_excludes_extruder_partners():
    """special_bonds fene: LJ masked between current extruder anchors
    (reference: force.cpp:787-795 + fix_extrusion special splice)."""
    system, x = random_chain_system(
        n_chains=1, chain_len=20, box_l=10.0, seed=11,
        bonds=fene_harmonic_bonds(), max_extruders=2,
    )
    # put beads 2 and 10 within LJ range
    x = x.copy()
    x[10] = x[2] + np.array([0.9, 0.0, 0.0])
    state = init_state(system, x)
    state = state.replace(
        ex_left=jnp.asarray([2, -1], jnp.int32),
        ex_right=jnp.asarray([10, -1], jnp.int32),
    )
    partner = extruder_partner(state, system.n)
    types = jnp.zeros(system.n, jnp.int32)
    f_excl, e_excl = pair_ops.lj_force_bruteforce(
        jnp.asarray(x), types, system, ex_partner=partner
    )
    excl = {frozenset(p) for p in backbone_pairs(system)} | {frozenset((2, 10))}
    f_ref, e_ref = lj_np(x, np.array(system.box_size), 1.0, 1.0, 1.12,
                         shift=True, excl=excl)
    np.testing.assert_allclose(np.asarray(f_excl), f_ref, atol=TOL)
    np.testing.assert_allclose(float(e_excl), e_ref, rtol=1e-12)
