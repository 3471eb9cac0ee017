"""Chunk computes: chunk/atom molecule|type + com/gyration/msd per chunk
(src/compute_chunk_atom.cpp, compute_com_chunk.cpp,
compute_gyration_chunk.cpp, compute_msd_chunk.cpp)."""

import os

import numpy as np

from lammps_le_tpu.deck import DeckRunner
from lammps_le_tpu.io.data import write_data
from lammps_le_tpu.scene import serpentine


def _deck(td, body):
    data = serpentine(200, seed=7, n_atom_types=4, n_bond_types=2)
    write_data(os.path.join(td, "data.tiny"), data)
    deck = """
units lj
atom_style bond
special_bonds fene
read_data data.tiny
replicate 1 1 2
neighbor 0.3 bin
bond_style hybrid
bond_coeff 1 fene 30.0 1.5 1.0 1.0
bond_coeff 2 harmonic 10.0 1.1
pair_style lj/cut 1.12
pair_coeff * * 1.0 1.0 1.12
velocity all create 1.0 87287
fix 1 all nve
""" + body
    path = os.path.join(td, "in.chunk")
    with open(path, "w") as fh:
        fh.write(deck)
    return path


def test_chunk_molecule_observables(tmp_path):
    td = str(tmp_path)
    path = _deck(td, """
compute cc all chunk/atom molecule
compute rgc all gyration/chunk cc
compute comc all com/chunk cc
compute msdc all msd/chunk cc
fix rg all ave/time 5 1 5 c_rgc[*] mode vector file rg.out
thermo_style custom step c_rgc[1] c_rgc[2]
thermo 5
timestep 0.005
run 10
""")
    r = DeckRunner(dtype="float32", quiet=True)
    r.run_file(path)
    st = r.state
    mol = np.asarray(r.system.molecule)
    assert mol.max() == 1, "replicate should produce 2 molecules"
    xu = np.asarray(st.x) + np.asarray(st.img) * np.asarray(
        r.system.box_size)
    for i in (0, 1):
        sel = mol == i
        com = xu[sel].mean(0)
        rg = float(np.sqrt(((xu[sel] - com) ** 2).sum(-1).mean()))
        assert abs(r.live_value(f"c_rgc[{i + 1}]") - rg) < 1e-4
        # com/chunk first column == com x
        tab = r._chunk_table("comc", st)
        assert np.allclose(tab[i], com, atol=1e-6)
    # msd/chunk: com0 pinned at the first evaluation of THIS call
    msd = r._chunk_table("msdc", st)
    assert msd.shape == (2, 4)
    assert np.all(msd == 0.0)  # first evaluation defines the origin
    # ave/time vector file has one block of 2 rows
    out = open(os.path.join(td, "rg.out")).read().splitlines()
    assert any(ln.split()[1] == "2" for ln in out[1:2])


def test_chunk_type_and_group(tmp_path):
    td = str(tmp_path)
    path = _deck(td, """
group t1 type 1
compute ct t1 chunk/atom type
compute rgt all gyration/chunk ct
timestep 0.005
run 0
""")
    r = DeckRunner(dtype="float32", quiet=True)
    r.run_file(path)
    st = r.state
    ids, nchunk = r._chunk_ids("ct", st)
    ty = np.asarray(st.type)
    # outside-group atoms are chunk -1; in-group atoms chunk == type
    assert np.all(ids[ty != 0] == -1)
    assert np.all(ids[ty == 0] == 0)
    tab = r._chunk_table("rgt", st)
    xu = np.asarray(st.x) + np.asarray(st.img) * np.asarray(
        r.system.box_size)
    sel = ty == 0
    com = xu[sel].mean(0)
    rg = float(np.sqrt(((xu[sel] - com) ** 2).sum(-1).mean()))
    assert abs(tab[0, 0] - rg) < 1e-4


def test_chunk_errors(tmp_path):
    import pytest

    from lammps_le_tpu.deck.runner import DeckError

    td = str(tmp_path)
    path = _deck(td, """
compute rgc all gyration/chunk nosuch
""")
    with pytest.raises(DeckError):
        DeckRunner(dtype="float32", quiet=True).run_file(path)
