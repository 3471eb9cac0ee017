"""IO: data-file round trip, deck parsing, checkpoint resume, scenes."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from lammps_le_tpu.deck.parser import parse_deck
from lammps_le_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from lammps_le_tpu.io.data import read_data, split_topology, write_data
from lammps_le_tpu.scene import chromosome, fene_melt, serpentine
from lammps_le_tpu.state import init_state

from helpers import relaxed_chain_system


def test_scene_generators():
    data = fene_melt(4, 50, density=0.5, seed=1)
    assert data.n_atoms == 200
    assert data.n_bonds == 196
    box = np.array(data.box_hi)
    assert np.all(data.x >= 0) and np.all(data.x <= box + 1e-9)
    nxt, prv, bt, ex = split_topology(data)
    assert (nxt >= 0).sum() == 196
    assert len(ex) == 0

    chro = chromosome(1000, barrier_fraction=0.01)
    assert (chro.types > 0).sum() >= 5

    serp = serpentine(500)
    d = np.linalg.norm(np.diff(serp.x, axis=0), axis=1)
    assert d.max() < 1.35, d.max()  # bonded spacing stays FENE-safe


def test_data_roundtrip(tmp_path):
    data = fene_melt(3, 40, density=0.4, seed=2)
    data.v = np.random.default_rng(0).normal(size=(120, 3))
    path = os.path.join(tmp_path, "t.data")
    write_data(path, data)
    back = read_data(path)
    assert back.n_atoms == data.n_atoms
    assert back.n_bonds == data.n_bonds
    np.testing.assert_allclose(back.x, data.x, atol=1e-8)
    np.testing.assert_allclose(back.v, data.v, atol=1e-8)
    np.testing.assert_array_equal(back.types, data.types)
    np.testing.assert_array_equal(back.molecule, data.molecule)
    np.testing.assert_array_equal(back.bonds, data.bonds)


def test_reference_data_chain_parses():
    path = "/root/reference/bench/data.chain"
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference tree not mounted")
    data = read_data(path)
    assert data.n_atoms == 32000
    assert data.n_bonds == 31680
    assert data.v is not None
    nxt, prv, bt, ex = split_topology(data)
    assert (nxt >= 0).sum() == 31680


def test_deck_parser_reference_commands():
    deck = parse_deck(
        """
# comment
units lj
special_bonds fene
fix loop all extrusion 17500 1 2 3 1.0 2 4
fix loading all ex_load 7000 1 1 1.12 2 prob 0.001 684474 iparam 1 1 jparam 1 1
fix unloading all ex_unload 7000 2 0.5 prob 0.001 456456
variable T equal 1.0
fix 2 all langevin $T $T 10.0 904297
run 100
"""
    )
    names = [c.name for c in deck.commands]
    assert names == ["units", "special_bonds", "fix", "fix", "fix", "fix", "run"]
    lang = deck.commands[5]
    assert lang.args[3] == "1.0"  # $T substitution


def test_checkpoint_bitwise_roundtrip(tmp_path):
    system, x = relaxed_chain_system(n_chains=2, chain_len=10, box_l=24.0)
    state = init_state(system, x, seed=3)
    state = state.replace(
        ex_left=jnp.asarray([2], jnp.int32),
        ex_right=jnp.asarray([6], jnp.int32),
        step=jnp.asarray(41, jnp.int32),
        n_moves=jnp.asarray(7, jnp.int32),
    )
    path = os.path.join(tmp_path, "ck.npz")
    save_checkpoint(path, state)
    fresh = init_state(system, np.zeros_like(x), seed=0)
    back = load_checkpoint(path, like=fresh)
    for name in ("x", "v", "img", "type", "ex_left", "ex_right", "key",
                 "step", "flags", "n_moves"):
        np.testing.assert_array_equal(
            np.asarray(getattr(back, name)), np.asarray(getattr(state, name)),
            err_msg=name,
        )


def test_gz_dump(tmp_path):
    """.gz dump paths write gzip-compressed frames (the reference's
    dump atom/gz etc., src/dump_atom_gz.cpp / COMPRESS package)."""
    import gzip
    import os

    from lammps_le_tpu.deck import DeckRunner
    from lammps_le_tpu.io.data import write_data
    from lammps_le_tpu.scene import serpentine

    td = str(tmp_path)
    write_data(os.path.join(td, "d.data"), serpentine(120, seed=2))
    deck = """
units lj
atom_style bond
special_bonds fene
read_data d.data
neighbor 0.3 bin
bond_style fene
bond_coeff 1 30.0 1.5 1.0 1.0
pair_style lj/cut 1.12
pair_coeff * * 1.0 1.0 1.12
velocity all create 1.0 87287
fix 1 all nve
dump d1 all atom 2 traj.dump.gz
timestep 0.004
run 4
"""
    path = os.path.join(td, "in.gz")
    with open(path, "w") as fh:
        fh.write(deck)
    r = DeckRunner(dtype="float32", quiet=True)
    r.run_file(path)
    with gzip.open(os.path.join(td, "traj.dump.gz"), "rt") as fh:
        txt = fh.read()
    assert "ITEM: TIMESTEP" in txt
    assert txt.count("ITEM: ATOMS") >= 2
