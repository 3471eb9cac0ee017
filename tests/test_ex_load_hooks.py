"""fix ex_load angle/dihedral/improper creation hooks (VERDICT r3 #8).

The reference optionally creates angles over the rewired special lists
when a new extruder bond forms (fix_ex_load.cpp:240-243, 747-749,
create_angles 845-900).  This engine's angle encoding is the implicit
static chain (ops/angle.py); dynamic triplets over rewired topology are a
DECLARED non-goal — decks asking for them must fail loudly (never
silently drop the interaction), while ``atype 0`` (hook parsed, disabled,
the reference's default) must run.
"""

import os

import pytest

from lammps_le_tpu.deck import DeckRunner
from lammps_le_tpu.deck.runner import DeckError
from lammps_le_tpu.io.data import write_data
from lammps_le_tpu.scene import serpentine


_BASE = """
units lj
atom_style bond
special_bonds fene
read_data d.tiny
bond_style hybrid fene harmonic
bond_coeff 1 fene 30.0 1.5 1.0 1.0
bond_coeff 2 harmonic 3.0 1.1
pair_style lj/cut 1.12
pair_coeff * * 1.0 1.0 1.12
velocity all create 1.0 87287
fix 1 all nve
fix 2 all langevin 1.0 1.0 1.0 2024
fix 3 all ex_load 5 1 1 1.12 2 prob 0.5 123 {hook}
timestep 0.004
run 5
"""


def _run(tmp_path, hook):
    td = str(tmp_path)
    write_data(os.path.join(td, "d.tiny"),
               serpentine(60, seed=1, n_atom_types=1, n_bond_types=2))
    with open(os.path.join(td, "in.x"), "w") as fh:
        fh.write(_BASE.format(hook=hook))
    r = DeckRunner(dtype="float32", quiet=True)
    r.run_file(os.path.join(td, "in.x"))
    return r


def test_atype_zero_parses_and_runs(tmp_path):
    r = _run(tmp_path, "atype 0 dtype 0 itype 0")
    assert int(r.state.step) == 5


def test_atype_nonzero_fails_loudly(tmp_path):
    with pytest.raises(DeckError, match="non-goal"):
        _run(tmp_path, "atype 1")
