"""Golden parity vs the reference's committed log: bench/in.chain step 0.

The reference log (bench/log.6Oct16.chain.fixed.icc.1:48-49) records the
exact step-0 thermo of the 32k-bead chain system — a deterministic
function of data.chain.  Matching it validates the whole static pipeline:
data reading, velocities, special_bonds fene exclusions, shifted LJ, FENE
bonds, temperature DOF convention, and the virial pressure.

    Step Temp          E_pair        E_mol       TotEng     Press
    0    0.97029772    0.44484087    20.494523   22.394765  4.6721833
"""

import os

import numpy as np
import pytest

REF = "/root/reference/bench"

EXPECTED = {
    "temp": 0.97029772,
    "epair": 0.44484087,
    "ebond": 20.494523,
    "etotal": 22.394765,
    "press": 4.6721833,
}


@pytest.mark.skipif(not os.path.exists(os.path.join(REF, "data.chain")),
                    reason="reference tree not mounted")
def test_chain_step0_thermo_matches_reference_log():
    import jax

    from lammps_le_tpu.integrate import Simulation, thermo_row
    from lammps_le_tpu.integrate.verlet import setup
    from lammps_le_tpu.io.data import read_data, system_from_data
    from lammps_le_tpu.observe.pressure import make_pressure_fn
    from lammps_le_tpu.state import init_state
    from lammps_le_tpu.system import BondParams, PairLJCut, BOND_FENE

    data = read_data(os.path.join(REF, "data.chain"))
    ones = np.ones((1, 1))
    pair = PairLJCut(epsilon=ones, sigma=ones, cutoff=1.12 * ones, shift=True)
    bonds = BondParams(style=np.array([BOND_FENE]),
                       coeffs=np.array([[30.0, 1.5, 1.0, 1.0]]))
    system, _ = system_from_data(data, pair=pair, bonds=bonds,
                                 dtype="float64")
    sim = Simulation(system=system, dt=0.012, fixes=())
    state = init_state(system, data.x, v=data.v, types=data.types)
    state = jax.jit(lambda s: setup(sim, s))(state)
    row = thermo_row(state, system)
    n = system.n
    assert abs(float(row.temp) - EXPECTED["temp"]) < 2e-7
    assert abs(float(row.epair) / n - EXPECTED["epair"]) < 2e-7
    assert abs(float(row.ebond) / n - EXPECTED["ebond"]) < 2e-5
    assert abs(float(row.etotal) / n - EXPECTED["etotal"]) < 2e-5
    press = float(make_pressure_fn(system)(state))
    assert abs(press - EXPECTED["press"]) < 2e-5


@pytest.mark.skipif(not os.path.exists(os.path.join(REF, "in.chain.scaled")),
                    reason="reference tree not mounted")
def test_chain_scaled_deck_runs_asis(tmp_path):
    """The reference's weak-scaling deck (bench/in.chain.scaled: index
    variables + atom_modify + replicate $x $y $z) executes unchanged."""
    from lammps_le_tpu.deck import DeckRunner

    deck = open(os.path.join(REF, "in.chain.scaled")).read()
    # shrink the run for the 1-core test host; everything else verbatim
    deck = deck.replace("run\t\t100", "run 5").replace("run 100", "run 5")
    import shutil

    p = os.path.join(str(tmp_path), "in.scaled")
    with open(p, "w") as fh:
        fh.write(deck)
    shutil.copy(os.path.join(REF, "data.chain"), str(tmp_path))
    r = DeckRunner(dtype="float32", quiet=True)
    r.run_file(p, variables={"x": "2", "y": "1", "z": "1"})
    assert r.system.n == 64000  # 32000 replicated 2x1x1
    assert int(r.state.step) == 5
    assert int(r.state.flags) == 0, hex(int(r.state.flags))
