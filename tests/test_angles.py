"""Chain bending angles (angle_style harmonic / cosine).

Force parity strategy: the reference's per-style golden approach
(src/MOLECULE/angle_harmonic.cpp, angle_cosine.cpp) — analytic forces
must equal the negative gradient of the energy (finite differences) and
the total force/torque must vanish.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lammps_le_tpu.ops.angle import chain_angle_force
from lammps_le_tpu.system import (ANGLE_COSINE, ANGLE_HARMONIC, AngleParams,
                                  build_system)


def _bent_chain_system(style, coeffs, n=6, seed=0):
    rng = np.random.default_rng(seed)
    x = np.zeros((n, 3))
    x[:, 0] = np.arange(n) * 0.97
    x += rng.normal(0, 0.25, (n, 3))  # real bending everywhere
    x += 8.0
    nxt = np.r_[np.arange(1, n), -1].astype(np.int32)
    prv = np.r_[-1, np.arange(n - 1)].astype(np.int32)
    act = np.full(n, -1, np.int32)
    act[1:-1] = 0  # one angle type, every interior bead
    system = build_system(
        n=n, n_types=1, box_lo=(0, 0, 0), box_hi=(16, 16, 16),
        next_bead=nxt, prev_bead=prv, molecule=np.zeros(n, np.int32),
        backbone_type=np.zeros(n, np.int32), masses=np.ones(1),
        angles=AngleParams(style=np.array([style]),
                           coeffs=np.array([coeffs])),
        angle_center_type=act, dtype="float64",
    )
    return system, jnp.asarray(x, jnp.float64)


@pytest.mark.parametrize("style,coeffs", [
    (ANGLE_HARMONIC, [3.0, np.deg2rad(120.0)]),
    (ANGLE_COSINE, [2.0, 0.0]),
])
def test_angle_force_is_minus_grad(style, coeffs):
    system, x = _bent_chain_system(style, coeffs)

    def energy(xf):
        return chain_angle_force(xf, system)[1]

    f, e = chain_angle_force(x, system)
    g = jax.grad(energy)(x)
    np.testing.assert_allclose(np.asarray(f), -np.asarray(g),
                               rtol=1e-9, atol=1e-10)
    # finite differences as an independent check on one coordinate
    h = 1e-6
    dx = x.at[2, 1].add(h)
    e2 = energy(dx)
    fd = -(float(e2) - float(e)) / h
    assert abs(fd - float(f[2, 1])) < 1e-4
    # Newton: total force zero
    np.testing.assert_allclose(np.asarray(jnp.sum(f, axis=0)), 0.0,
                               atol=1e-11)
    assert float(e) > 0.0


def test_angle_harmonic_equilibrium_zero_force():
    """A straight chain at theta0=180deg carries no bending force."""
    n = 5
    x = np.zeros((n, 3))
    x[:, 0] = np.arange(n) * 0.97
    x += 4.0
    nxt = np.r_[np.arange(1, n), -1].astype(np.int32)
    prv = np.r_[-1, np.arange(n - 1)].astype(np.int32)
    act = np.full(n, -1, np.int32)
    act[1:-1] = 0
    system = build_system(
        n=n, n_types=1, box_lo=(0, 0, 0), box_hi=(12, 12, 12),
        next_bead=nxt, prev_bead=prv, molecule=np.zeros(n, np.int32),
        backbone_type=np.zeros(n, np.int32), masses=np.ones(1),
        angles=AngleParams(style=np.array([ANGLE_HARMONIC]),
                           coeffs=np.array([[3.0, np.pi]])),
        angle_center_type=act, dtype="float64",
    )
    f, e = chain_angle_force(jnp.asarray(x, jnp.float64), system)
    assert float(jnp.max(jnp.abs(f))) < 1e-9
    assert abs(float(e)) < 1e-12


DECK = """
units lj
atom_style angle
special_bonds fene
read_data data.ang
neighbor 0.4 bin
bond_style fene
bond_coeff 1 30.0 1.5 1.0 1.0
angle_style cosine
angle_coeff 1 20.0
pair_style lj/cut 1.12
pair_modify shift yes
pair_coeff * * 1.0 1.0 1.12
velocity all create 1.0 87287
fix 1 all nve
fix 2 all langevin 1.0 1.0 1.0 904297
thermo 100
timestep 0.004
run 300
"""


def test_angle_deck_end_to_end(tmp_path):
    """A persistence-length (angle cosine) deck runs healthily; bending
    stiffness measurably straightens the chain vs the same deck without
    angles."""
    import os

    from lammps_le_tpu.deck import DeckRunner
    from lammps_le_tpu.io.data import DataFile, write_data
    from lammps_le_tpu.scene import serpentine

    td = str(tmp_path)
    data = serpentine(200, seed=11, n_atom_types=1, n_bond_types=1)
    a = np.arange(1, 199)
    data = DataFile(
        n_atoms=data.n_atoms, n_bonds=data.n_bonds, n_atom_types=1,
        n_bond_types=1, box_lo=data.box_lo, box_hi=data.box_hi,
        masses=data.masses, x=data.x, v=None, types=data.types,
        molecule=data.molecule, image=data.image, bonds=data.bonds,
        n_angles=len(a), n_angle_types=1,
        angles=np.stack([np.zeros_like(a), a - 1, a, a + 1], axis=1),
    )
    write_data(os.path.join(td, "data.ang"), data)
    noang = serpentine(200, seed=11, n_atom_types=1, n_bond_types=1)
    write_data(os.path.join(td, "data.noang"), noang)

    def mean_cos(deck):
        with open(os.path.join(td, "in.ang"), "w") as fh:
            fh.write(deck)
        r = DeckRunner(dtype="float32", quiet=True)
        r.run_file(os.path.join(td, "in.ang"))
        assert int(r.state.flags) == 0, hex(int(r.state.flags))
        x = np.asarray(r.state.x)
        # roundtrip: write_data preserves the Angles section
        if "angle_style" in deck:
            r.command("write_data", ["out.ang"])
            from lammps_le_tpu.io.data import read_data
            out = read_data(os.path.join(td, "out.ang"))
            assert out.n_angles == 198
        d1 = x[1:-1] - x[:-2]
        d2 = x[2:] - x[1:-1]
        c = (d1 * d2).sum(1) / np.sqrt((d1 ** 2).sum(1) * (d2 ** 2).sum(1))
        return float(np.mean(c))

    stiff = mean_cos(DECK)
    floppy = mean_cos(
        "\n".join(l for l in DECK.splitlines() if "angle_" not in l)
        .replace("data.ang", "data.noang"))
    assert stiff > floppy + 0.1, (stiff, floppy)
