"""Native LAMMPS binary restart interop (VERDICT r2 missing #5).

Fixtures: tests/data/ref_le.restart + ref_le.data were written by the
COMPILED REFERENCE BINARY (29 Oct 2020 fork) at step 120 of a 120-bead
LE run with an active extruder and CTCF barriers (see VALIDATION.md for
the build recipe).  The binary reader must recover the exact state the
reference's own text write_data records at the same step, and a deck
must be able to resume from it mid-stream.
"""

import os

import numpy as np

from lammps_le_tpu.deck import DeckRunner
from lammps_le_tpu.io.data import read_data
from lammps_le_tpu.io.lammps_restart import read_lammps_restart

HERE = os.path.dirname(__file__)
RST = os.path.join(HERE, "data", "ref_le.restart")
DAT = os.path.join(HERE, "data", "ref_le.data")


def test_parse_matches_reference_write_data():
    r = read_lammps_restart(RST)
    d = read_data(DAT)
    assert r.natoms == d.n_atoms == 120
    assert r.step == 120
    assert r.dt == 0.006
    assert r.units == "lj"
    # positions, velocities, types, images: bit-exact vs the reference's
    # own plain-text dump of the same state
    np.testing.assert_array_equal(r.x, d.x)
    np.testing.assert_array_equal(r.v, d.v)
    np.testing.assert_array_equal(r.types, d.types)
    np.testing.assert_array_equal(r.img, d.image)
    # force field metadata round-trips
    assert r.pair_style.startswith("lj/cut")
    assert r.pair_coeffs[(1, 1)] == (1.0, 1.0, 1.12)
    assert r.bond_styles == ["fene", "harmonic"]
    assert tuple(r.special_lj) == (0.0, 1.0, 1.0)
    # exactly one extruder bond (type 2) + the backbone chain; the
    # reference stores bonds on both atoms (newton off) — reader dedupes
    t2 = r.bonds[r.bonds[:, 0] == 2]
    t1 = r.bonds[r.bonds[:, 0] == 1]
    assert len(t2) == 1
    assert len(t1) == 119
    l, rr = int(t2[0, 1]), int(t2[0, 2])
    assert rr - l >= 4  # grew from the seeded (31, 35) 1-based pair


DECK = """
units lj
atom_style bond
special_bonds fene
read_restart ref_le.restart
neighbor 0.4 bin
bond_style hybrid
bond_coeff 1 fene 30.0 1.5 1.0 1.0
bond_coeff 2 harmonic 3.0 1.1
pair_style lj/cut 1.12
pair_modify shift yes
pair_coeff * * 1.0 1.0 1.12
fix 1 all nve
fix 2 all langevin 1.0 1.0 10.0 904297
fix loop all extrusion 40 1 2 3 0.5 2 4
thermo 40
run 80
"""


def test_deck_resumes_from_reference_restart(tmp_path):
    td = str(tmp_path)
    import shutil

    shutil.copy(RST, os.path.join(td, "ref_le.restart"))
    with open(os.path.join(td, "in.resume"), "w") as fh:
        fh.write(DECK)
    runner = DeckRunner(dtype="float32", quiet=True)
    runner.run_file(os.path.join(td, "in.resume"))
    # resumed at the reference's step counter and advanced
    assert int(runner.state.step) == 200
    # dt restored from the restart (timestep command absent from deck)
    assert runner.sim.dt == 0.006
    # the reference's mid-stream extruder bond is live in the State table
    left = np.asarray(runner.state.ex_left)
    right = np.asarray(runner.state.ex_right)
    act = left >= 0
    assert act.sum() == 1
    r = read_lammps_restart(RST)
    t2 = r.bonds[r.bonds[:, 0] == 2][0]
    # extrusion continued from the restart anchors (possibly moved
    # outward by later events, never inward past the restart span)
    assert int(left[act][0]) <= t2[1] - 1
    assert int(right[act][0]) >= t2[2] - 1
    # healthy continuation
    assert int(runner.state.flags) == 0, hex(int(runner.state.flags))


WRITE_DECK = """
units lj
atom_style bond
special_bonds fene
read_data data.le
neighbor 0.4 bin
bond_style hybrid
bond_coeff 1 fene 30.0 1.5 1.0 1.0
bond_coeff 2 harmonic 3.0 1.1
pair_style lj/cut 1.12
pair_modify shift yes
pair_coeff * * 1.0 1.0 1.12
velocity all create 1.0 87287
fix 1 all nve
fix 2 all langevin 1.0 1.0 10.0 904297
fix loop all extrusion 15 1 2 3 0.5 2 4
timestep 0.005
run 45
write_restart ours.restart
write_data ours.data
"""


def _write_run(tmp_path):
    import sys

    sys.path.insert(0, os.path.join(HERE, "..", "benchmarks"))
    from validate_vs_reference import make_le_data

    from lammps_le_tpu.io.data import write_data

    td = str(tmp_path)
    data = make_le_data(n_beads=90, extruder_at=(20, 24),
                        barriers={40: 2, 70: 3})
    write_data(os.path.join(td, "data.le"), data)
    with open(os.path.join(td, "in.w"), "w") as fh:
        fh.write(WRITE_DECK)
    runner = DeckRunner(dtype="float32", quiet=True)
    runner.run_file(os.path.join(td, "in.w"))
    return td, runner


def test_write_native_roundtrip(tmp_path):
    """Our native writer round-trips through our reader bit-exactly and
    matches the engine's own text write_data of the same state."""
    td, runner = _write_run(tmp_path)
    r = read_lammps_restart(os.path.join(td, "ours.restart"))
    d = read_data(os.path.join(td, "ours.data"))
    assert r.step == 45 and r.dt == 0.005
    # binary payload is EXACT vs the live engine state (the text data
    # file rounds to %g)
    np.testing.assert_array_equal(r.x, np.asarray(runner.state.x))
    np.testing.assert_array_equal(r.v, np.asarray(runner.state.v))
    np.testing.assert_array_equal(r.img, np.asarray(runner.state.img))
    np.testing.assert_array_equal(r.types, d.types)
    assert sorted(map(tuple, r.bonds - 1)) == \
        sorted(map(tuple, np.asarray(d.bonds)))
    assert r.pair_coeffs[(1, 1)] == (1.0, 1.0, 1.12)


LMP = "/tmp/lmpbuild/lmp"


def test_reference_binary_resumes_our_restart(tmp_path):
    """The COMPILED REFERENCE BINARY consumes our native restart: it must
    read our mid-stream LE state and report the exact same atom state in
    its own write_data."""
    import pytest
    import subprocess

    if not os.path.exists(LMP):
        pytest.skip("reference binary not built in this environment")
    td, runner = _write_run(tmp_path)
    deck = """
units lj
newton off
atom_style bond
special_bonds fene
read_restart ours.restart
neighbor 0.4 bin
bond_style hybrid fene harmonic
bond_coeff 1 fene 30.0 1.5 1.0 1.0
bond_coeff 2 harmonic 3.0 1.1
pair_style lj/cut 1.12
pair_modify shift yes
pair_coeff * * 1.0 1.0 1.12
fix 1 all nve
run 0
write_data theirs.data
"""
    with open(os.path.join(td, "in.r"), "w") as fh:
        fh.write(deck)
    proc = subprocess.run([LMP, "-in", "in.r", "-log", "log.r"],
                          cwd=td, capture_output=True, text=True,
                          timeout=300)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    ours = read_data(os.path.join(td, "ours.data"))
    theirs = read_data(os.path.join(td, "theirs.data"))
    np.testing.assert_allclose(theirs.x, ours.x, atol=1e-12)
    np.testing.assert_allclose(theirs.v, ours.v, atol=1e-12)
    np.testing.assert_array_equal(theirs.types, ours.types)
    assert sorted(map(tuple, np.asarray(theirs.bonds))) == \
        sorted(map(tuple, np.asarray(ours.bonds)))
