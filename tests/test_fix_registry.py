"""Extensible fix-style registry (fixes/registry.py): a user-defined style
plugs into the traced step at the Modify lifecycle points and into the
deck parser — the TPU analog of dropping a FixFoo class into src/ and the
fix_map factory (src/modify.cpp:789; hook mask fix.h:248-264).

The example style is ``dragx`` (a clone of src/fix_viscous.cpp — a
POST_FORCE drag f -= gamma*v), which the built-in set does not cover.
"""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lammps_le_tpu.deck import DeckRunner
from lammps_le_tpu.fixes import NVE
from lammps_le_tpu.fixes.registry import (
    FIX_STYLES,
    register_fix_style,
    style_of,
)
from lammps_le_tpu.integrate import Simulation, run
from lammps_le_tpu.io.data import write_data
from lammps_le_tpu.scene import serpentine
from lammps_le_tpu.state import init_state
from lammps_le_tpu.system import build_system, chain_topology

from helpers import fene_harmonic_bonds, lj_pair_params


@dataclasses.dataclass(frozen=True)
class Drag:
    gamma: float
    group: str = None


def _drag_post_force(system, fix):
    def hook(state, f, step_no):
        return f - fix.gamma * state.v

    return hook


@pytest.fixture(scope="module", autouse=True)
def _registered():
    if "dragx" not in FIX_STYLES:
        register_fix_style(
            "dragx", Drag,
            parse=lambda group, args: Drag(float(args[0]), group=group),
            post_force=_drag_post_force,
        )
    yield


def _tiny(n=40):
    nxt, prv, mol, btype = chain_topology([n])
    x = np.zeros((n, 3))
    x[:, 0] = np.arange(n) * 0.97 + 1.0
    x[:, 1] = 4.0
    x[:, 2] = 4.0
    system = build_system(
        n=n, n_types=1, box_lo=(0, 0, 0), box_hi=(n * 0.97 + 2, 8, 8),
        next_bead=nxt, prev_bead=prv, molecule=mol, backbone_type=btype,
        masses=np.ones(1), pair=lj_pair_params(1),
        bonds=fene_harmonic_bonds(), max_extruders=1, dtype="float64",
    )
    return system, x


def test_registered_hook_runs_in_step():
    """The post_force hook composes into the jitted step: with strong
    drag and no thermostat, kinetic energy decays."""
    system, x = _tiny()
    state = init_state(system, x, seed=1)
    v0 = np.zeros((len(x), 3))
    v0[:, 1] = 0.5
    state = state.replace(v=jnp.asarray(v0))

    sim_drag = Simulation(system=system, dt=0.005,
                          fixes=(NVE(), Drag(2.0)))
    sim_free = Simulation(system=system, dt=0.005, fixes=(NVE(),))
    s_drag, _ = run(sim_drag, state, 100)
    s_free, _ = run(sim_free, state, 100)
    ke = lambda s: float(jnp.sum(s.v * s.v))
    # strong drag dissipates most of the injected drift; the free NVE run
    # conserves it (modulo PE exchange with the slightly-stretched chain)
    assert ke(s_drag) < 0.3 * ke(s_free)
    assert ke(s_drag) < 0.3 * ke(state)


def test_unregistered_fix_rejected():
    @dataclasses.dataclass(frozen=True)
    class Mystery:
        group: str = None

    system, x = _tiny()
    state = init_state(system, x, seed=1)
    sim = Simulation(system=system, dt=0.005, fixes=(NVE(), Mystery()))
    with pytest.raises(ValueError, match="registered fix style"):
        run(sim, state, 1)


def test_deck_parses_registered_style(tmp_path):
    """`fix 2 all dragx 0.5` parses through the registry and runs."""
    td = str(tmp_path)
    data = serpentine(60, seed=7, n_atom_types=1, n_bond_types=2)
    write_data(os.path.join(td, "data.tiny"), data)
    deck = """
units lj
atom_style bond
read_data data.tiny
neighbor 0.3 bin
bond_style hybrid
bond_coeff 1 fene 30.0 1.5 1.0 1.0
bond_coeff 2 harmonic 10.0 1.1
pair_style lj/cut 1.12
pair_coeff * * 1.0 1.0 1.12
velocity all create 1.0 87287
fix 1 all nve
fix drag all dragx 5.0
timestep 0.005
run 80
"""
    path = os.path.join(td, "in.deck")
    with open(path, "w") as fh:
        fh.write(deck)
    r = DeckRunner(dtype="float64", quiet=True, root=td)
    r.run_file(path)
    assert isinstance(r.fixes["drag"], Drag)
    assert r.fixes["drag"].gamma == 5.0
    assert style_of(r.fixes["drag"]).name == "dragx"
    # the hook really acted: same deck without the drag fix ends hotter
    # (the packed random-walk start releases potential energy; drag
    # dissipates it)
    r2 = DeckRunner(dtype="float64", quiet=True, root=td)
    with open(path) as fh:
        deck2 = fh.read().replace("fix drag all dragx 5.0\n", "")
    path2 = os.path.join(td, "in2.deck")
    with open(path2, "w") as fh:
        fh.write(deck2)
    r2.run_file(path2)
    from lammps_le_tpu.integrate.verlet import thermo_row

    t_drag = float(thermo_row(r.state, r.system).temp)
    t_free = float(thermo_row(r2.state, r2.system).temp)
    assert np.isfinite(t_drag) and t_drag < 0.6 * t_free


def test_fast_path_declines_custom_fix():
    from lammps_le_tpu.fast.engine import fast_supported

    system, x = _tiny()
    sim = Simulation(system=system, dt=0.005, fixes=(NVE(), Drag(1.0)))
    assert not fast_supported(sim)


def test_shipped_viscous_drains_energy():
    """The SHIPPED fix viscous (fixes/viscous.py, src/fix_viscous.cpp)
    drains kinetic energy under NVE."""
    import jax.numpy as jnp

    from lammps_le_tpu.fixes import Viscous as ShippedViscous

    system, x = _tiny()
    state = init_state(system, x, seed=3)
    import jax

    v0 = jax.random.normal(jax.random.PRNGKey(0), state.v.shape,
                           state.v.dtype)
    state = state.replace(v=v0)
    sim = Simulation(system=system, dt=0.004,
                     fixes=(NVE(), ShippedViscous(5.0)))
    out, _ = run(sim, state, 60)
    ke0 = float(jnp.sum(v0 ** 2))
    ke1 = float(jnp.sum(out.v ** 2))
    assert ke1 < 0.5 * ke0, (ke0, ke1)
