"""Per-atom computes: pe/atom, stress/atom, coord/atom + deck wiring.

Pins the tally invariants the reference's ev_tally guarantees
(src/pair.cpp:1000-1060): per-atom halves sum back to the global epair/
ebond/virial totals, and the grid-pass per-atom values match an O(N^2)
brute-force re-derivation.
"""

import os

import numpy as np

from lammps_le_tpu.observe.peratom import (make_coord_atom_fn,
                                           make_peratom_pe_fn,
                                           make_stress_atom_fn)
from lammps_le_tpu.observe.pressure import make_pressure_fn
from lammps_le_tpu.ops.forces import compute_forces
from lammps_le_tpu.ops.grid import build_grid
from lammps_le_tpu.state import init_state

from helpers import fene_harmonic_bonds, min_image_np, relaxed_chain_system


def _dense_state(seed=3):
    system, x = relaxed_chain_system(
        n_chains=3, chain_len=16, box_l=18.0, seed=seed, dtype="float64",
        bonds=fene_harmonic_bonds())
    rng = np.random.default_rng(seed)
    v = rng.normal(scale=0.4, size=x.shape)
    state = init_state(system, x, v=v)
    # one active extruder bond so the special/extruder paths are exercised
    e = state.ex_left.shape[0]
    left = np.full(e, -1, np.int32)
    right = np.full(e, -1, np.int32)
    left[0], right[0] = 2, 9
    import jax.numpy as jnp

    state = state.replace(ex_left=jnp.asarray(left),
                          ex_right=jnp.asarray(right))
    return system, state


def test_pe_atom_sums_to_thermo_totals():
    system, state = _dense_state()
    grid, _ = build_grid(state.x, system)
    res = compute_forces(state.x, state.type, grid, system,
                         ex_left=state.ex_left, ex_right=state.ex_right,
                         ex_btype=2)
    pe = make_peratom_pe_fn(system, ex_btype=2)(state)
    total = float(res.epair) + float(res.ebond)
    np.testing.assert_allclose(float(np.sum(np.asarray(pe))), total,
                               rtol=1e-10)


def test_pe_atom_pair_matches_bruteforce():
    system, state = _dense_state(seed=11)
    pe = np.asarray(make_peratom_pe_fn(system, ex_btype=2,
                                       bond=False)(state))
    # O(N^2) per-atom half-shares with the engine's exclusions + LJ floor
    x = np.asarray(state.x)
    box = np.array(system.box_size)
    n = system.n
    nxt = system.next_bead
    excl = {frozenset((i, int(nxt[i]))) for i in range(n) if nxt[i] >= 0}
    excl.add(frozenset((2, 9)))  # the extruder bond (1-2 special)
    rc, off = 1.12, 4 * ((1 / 1.12**12) - (1 / 1.12**6))
    ref = np.zeros(n)
    for i in range(n):
        for j in range(i + 1, n):
            if frozenset((i, j)) in excl:
                continue
            d = min_image_np(x[i] - x[j], box)
            r2 = d @ d
            if r2 >= rc * rc:
                continue
            r2 = max(r2, 0.5625)
            sr6 = (1.0 / r2) ** 3
            e = 4 * (sr6 * sr6 - sr6) - off
            ref[i] += 0.5 * e
            ref[j] += 0.5 * e
    np.testing.assert_allclose(pe, ref, atol=1e-10)


def test_stress_atom_trace_matches_pressure():
    system, state = _dense_state(seed=5)
    s = np.asarray(make_stress_atom_fn(system, ex_btype=2)(state))
    assert s.shape == (system.n, 6)
    p = float(make_pressure_fn(system, ex_btype=2)(state))
    vol = float(np.prod(np.asarray(system.box_size)))
    # sum over atoms of -(sxx+syy+szz) = 3 P V (compute_pressure.cpp)
    np.testing.assert_allclose(-np.sum(s[:, :3]), 3 * p * vol, rtol=1e-8)


def test_coord_atom_matches_bruteforce():
    system, state = _dense_state(seed=7)
    cutoff = min(1.3, system.neighbor.cell_size)
    c = np.asarray(make_coord_atom_fn(system, cutoff)(state))
    x = np.asarray(state.x)
    box = np.array(system.box_size)
    n = system.n
    ref = np.zeros(n)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            d = min_image_np(x[i] - x[j], box)
            if d @ d < cutoff * cutoff:
                ref[i] += 1
    np.testing.assert_allclose(c, ref)


def test_deck_peratom_computes(tmp_path):
    """ke/atom through compute reduce == total KE; dump custom c_ID[n]
    columns; displace/atom reports motion."""
    from lammps_le_tpu.deck import DeckRunner
    from lammps_le_tpu.io.data import write_data
    from lammps_le_tpu.scene import serpentine

    data = serpentine(48, seed=2, n_atom_types=1, n_bond_types=1)
    write_data(os.path.join(tmp_path, "data.le"), data)
    deck = """
units lj
atom_style bond
special_bonds fene
read_data data.le
neighbor 0.4 bin
bond_style fene
bond_coeff 1 30.0 1.5 1.0 1.0
pair_style lj/cut 1.12
pair_coeff * * 1.0 1.0 1.12
velocity all create 1.5 4928459
fix 1 all nve
fix 2 all langevin 1.0 1.0 10.0 29387
compute kea all ke/atom
compute pea all pe/atom
compute str all stress/atom NULL
compute dsp all displace/atom
compute co all coord/atom cutoff 1.12
compute ketot all reduce sum c_kea
compute petot all reduce sum c_pea
compute dmax all reduce max c_dsp[4]
variable two_ke equal 2*c_ketot
dump d1 all custom 50 out.dump id c_kea c_co c_str[1] c_dsp[4]
thermo 50
timestep 0.005
run 50
print "KE2=${two_ke}"
"""
    path = os.path.join(tmp_path, "in.peratom")
    with open(path, "w") as fh:
        fh.write(deck)
    r = DeckRunner(root=str(tmp_path), dtype="float64")
    r.run_file(path)
    st = r.state
    v = np.asarray(st.v)
    ke_tot = 0.5 * float(np.sum(v * v))
    np.testing.assert_allclose(r.live_value("c_ketot"), ke_tot, rtol=1e-9)
    # pe reduce = thermo epair+ebond (energies evaluated at boundary)
    pe_tot = float(st.epair) + float(st.ebond)
    np.testing.assert_allclose(r.live_value("c_petot"), pe_tot, rtol=1e-6)
    assert r.live_value("c_dmax") > 0.0  # beads moved since definition
    dump = os.path.join(tmp_path, "out.dump")
    with open(dump) as fh:
        txt = fh.read()
    assert "c_kea" in txt and "c_str[1]" in txt
    rows = [ln.split() for ln in txt.splitlines()[-48:]]
    arr = np.array(rows, float)
    # dumped ke/atom column sums to the boundary-state total KE
    np.testing.assert_allclose(arr[:, 1].sum(), ke_tot, rtol=1e-6)
