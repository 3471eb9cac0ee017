"""End-to-end deck front end: parse -> build -> run -> write -> restart."""

import os

import numpy as np

from lammps_le_tpu.deck import DeckRunner
from lammps_le_tpu.io.data import read_data, write_data
from lammps_le_tpu.scene import serpentine

DECK = """
units lj
atom_style bond
special_bonds fene
read_data data.tiny
neighbor 0.3 bin
bond_style hybrid
bond_coeff 1 fene 30.0 1.5 1.0 1.0
bond_coeff 2 harmonic 10.0 1.1
pair_style lj/cut 1.12
pair_modify shift yes
pair_coeff * * 1.0 1.0 1.12
velocity all create 1.0 87287
fix 1 all nve
fix 2 all langevin 1.0 1.0 10.0 904297
fix loop all extrusion 10 1 2 3 0.5 2 4
fix loading all ex_load 10 1 1 1.12 2 prob 0.5 684474 iparam 1 1 jparam 1 1
fix unloading all ex_unload 10 2 0.5 prob 0.1 456456
thermo 20
timestep 0.005
run 40
write_data out.data
write_restart out.ckpt.npz
run 20
"""


def _write_tiny(td):
    data = serpentine(300, seed=7, n_atom_types=4, n_bond_types=2,
                      barrier_fraction=0.02)
    write_data(os.path.join(td, "data.tiny"), data)


def test_compute_ke_pe_com(tmp_path):
    """compute ke/pe scalars and the com 3-vector (compute_ke.cpp,
    compute_pe.cpp, compute_com.cpp) via thermo columns + live_value."""
    import numpy as np

    td = str(tmp_path)
    _write_tiny(td)
    deck = """
units lj
atom_style bond
special_bonds fene
read_data data.tiny
neighbor 0.3 bin
bond_style hybrid
bond_coeff 1 fene 30.0 1.5 1.0 1.0
bond_coeff 2 harmonic 10.0 1.1
pair_style lj/cut 1.12
pair_coeff * * 1.0 1.0 1.12
velocity all create 1.0 87287
fix 1 all nve
compute myke all ke
compute mype all pe
compute c all com
group t1 type 1
compute rg1 t1 gyration
thermo_style custom step temp c_myke c_mype c_c[1] c_c[2] c_c[3]
thermo 10
timestep 0.005
run 10
"""
    path = os.path.join(td, "in.comp")
    with open(path, "w") as fh:
        fh.write(deck)
    r = DeckRunner(dtype="float32", quiet=True)
    r.run_file(path)
    st = r.state
    # ke == 0.5 sum m v^2 (all masses 1 here)
    v = np.asarray(st.v)
    ke = r.live_value("c_myke")
    assert abs(ke - 0.5 * float((v * v).sum())) < 1e-3 * max(ke, 1.0)
    # pe == epair + ebond at the last energy evaluation
    assert abs(r.live_value("c_mype")
               - (float(st.epair) + float(st.ebond))) < 1e-6
    # com components match the unwrapped mean (uniform mass)
    xu = np.asarray(st.x) + np.asarray(st.img) * np.asarray(
        r.system.box_size)
    for i in range(3):
        assert abs(r.live_value(f"c_c[{i + 1}]")
                   - float(xu[:, i].mean())) < 1e-4
    # group-restricted gyration (mass-weighted == unweighted here)
    sel = np.asarray(st.type) == 0
    com1 = xu[sel].mean(0)
    rg_np = float(np.sqrt(((xu[sel] - com1) ** 2).sum(-1).mean()))
    assert abs(r.live_value("c_rg1") - rg_np) < 1e-4


def test_thermo_modify_norm(tmp_path):
    """thermo_modify norm no reports extensive values (thermo.cpp
    modify_params; lj-units default is per-atom normalization)."""
    td = str(tmp_path)
    _write_tiny(td)
    deck = ("units lj\natom_style bond\nspecial_bonds fene\n"
            "read_data data.tiny\nneighbor 0.3 bin\nbond_style hybrid\n"
            "bond_coeff 1 fene 30.0 1.5 1.0 1.0\n"
            "bond_coeff 2 harmonic 10.0 1.1\n"
            "pair_style lj/cut 1.12\npair_coeff * * 1.0 1.0 1.12\n"
            "velocity all create 1.0 87287\nfix 1 all nve\n"
            "timestep 0.005\nrun 2\n")
    path = os.path.join(td, "in.norm")
    with open(path, "w") as fh:
        fh.write(deck)
    r = DeckRunner(dtype="float32", quiet=True)
    r.run_file(path)
    e_per_atom = r.live_value("epair")
    r.command("thermo_modify", ["norm", "no"])
    e_ext = r.live_value("epair")
    assert abs(e_ext - e_per_atom * 300) < 1e-3 * max(abs(e_ext), 1.0)
    r.command("thermo_modify", ["norm", "yes"])
    assert abs(r.live_value("epair") - e_per_atom) < 1e-9


def test_mass_type_wildcard(tmp_path):
    """mass accepts utils::bounds ranges: *, N*, *N, N*M (utils.cpp)."""
    import pytest

    from lammps_le_tpu.deck.runner import DeckError

    td = str(tmp_path)
    _write_tiny(td)
    deck = ("units lj\natom_style bond\nread_data data.tiny\n"
            "mass * 2.5\nmass 2*3 1.5\nmass *2 3.5\n")
    path = os.path.join(td, "in.mass")
    with open(path, "w") as fh:
        fh.write(deck)
    r = DeckRunner(dtype="float32", quiet=True)
    r.run_file(path)
    assert r.masses == {1: 3.5, 2: 3.5, 3: 1.5, 4: 2.5}
    with open(path, "w") as fh:
        fh.write("units lj\natom_style bond\nread_data data.tiny\n"
                 "mass 3*9 1.0\n")
    with pytest.raises(DeckError):
        DeckRunner(dtype="float32", quiet=True).run_file(path)


def test_deck_end_to_end(tmp_path):
    td = str(tmp_path)
    _write_tiny(td)
    with open(os.path.join(td, "in.tiny"), "w") as fh:
        fh.write(DECK)
    r = DeckRunner(dtype="float32", quiet=True)
    r.run_file(os.path.join(td, "in.tiny"))
    assert int(r.state.step) == 60
    assert r.last_perf["steps"] == 20
    # LE machinery ran
    assert int(r.state.n_loads) > 0
    # outputs exist and round-trip
    out = read_data(os.path.join(td, "out.data"))
    assert out.n_atoms == 300
    assert os.path.exists(os.path.join(td, "out.ckpt.npz"))
    # no sticky error flags
    assert int(r.state.flags) == 0, hex(int(r.state.flags))


def test_deck_restart_resume(tmp_path):
    td = str(tmp_path)
    _write_tiny(td)
    with open(os.path.join(td, "in.tiny"), "w") as fh:
        fh.write(DECK)
    r = DeckRunner(dtype="float32", quiet=True)
    r.run_file(os.path.join(td, "in.tiny"))
    x_after = np.asarray(r.state.x)

    # resume from the checkpoint (written at step 40) and replay 20 steps:
    # bitwise identical to the original trajectory
    r2 = DeckRunner(dtype="float32", quiet=True)
    r2.root = td
    for line in DECK.strip().splitlines():
        line = line.strip()
        if not line or line.startswith("run") or line.startswith("write"):
            continue
        if line.startswith("velocity"):
            continue  # velocities come from the checkpoint
        parts = line.split()
        r2.command(parts[0], parts[1:])
    r2.command("read_restart", ["out.ckpt.npz"])
    assert int(r2.state.step) == 40
    r2.command("run", ["20"])
    np.testing.assert_array_equal(np.asarray(r2.state.x), x_after)


def test_deck_dump(tmp_path):
    td = str(tmp_path)
    _write_tiny(td)
    deck = DECK.replace("run 40", "dump d1 all xyz 20 traj.xyz\nrun 40")
    deck = deck.split("write_data")[0]
    with open(os.path.join(td, "in.tiny"), "w") as fh:
        fh.write(deck)
    r = DeckRunner(dtype="float32", quiet=True)
    r.run_file(os.path.join(td, "in.tiny"))
    traj = open(os.path.join(td, "traj.xyz")).read().splitlines()
    # two frames of 300 atoms + 2 headers each
    assert traj.count("300") >= 2


def test_atom_style_variable_dump(tmp_path):
    """variable N atom <expr> feeds dump custom v_name columns
    (src/variable.cpp ATOM style; src/dump_custom.cpp v_ fields)."""
    td = str(tmp_path)
    _write_tiny(td)
    deck = DECK.split("write_data")[0].replace(
        "run 40",
        "variable halfk atom 2\n"
        "variable ke atom v_halfk*(vx*vx+vy*vy+vz*vz)\n"
        "variable rscaled atom sqrt(x*x+y*y+z*z)/v_two\n"
        "dump d1 all custom 20 traj.dump id type x y z v_ke v_rscaled\n"
        "run 40",
    )
    with open(os.path.join(td, "in.tiny"), "w") as fh:
        fh.write(deck)
    r = DeckRunner(dtype="float32", quiet=True)
    # scalar (equal-style) reference resolved at evaluation time
    r.run_file(os.path.join(td, "in.tiny"), variables={"two": 2.0})
    rows = []
    with open(os.path.join(td, "traj.dump")) as fh:
        lines = fh.read().splitlines()
    hdr = [i for i, l in enumerate(lines) if l.startswith("ITEM: ATOMS")]
    assert lines[hdr[0]].split()[2:] == [
        "id", "type", "x", "y", "z", "v_ke", "v_rscaled"]
    # check the LAST frame against the final state
    last = np.array([[float(t) for t in l.split()]
                     for l in lines[hdr[-1] + 1:hdr[-1] + 301]])
    v = np.asarray(r.state.v)
    x = np.asarray(r.state.x)
    ke = 2.0 * (v ** 2).sum(axis=1)
    rs = np.sqrt((x ** 2).sum(axis=1)) / 2.0
    np.testing.assert_allclose(last[:, 5], ke, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(last[:, 6], rs, rtol=1e-5, atol=1e-8)


def test_atom_variable_errors(tmp_path):
    from lammps_le_tpu.deck.atomvars import AtomExpr
    import pytest

    with pytest.raises(ValueError):
        AtomExpr("bad", "__import__('os')")
    with pytest.raises(ValueError):
        AtomExpr("bad", "x +")
    td = str(tmp_path)
    _write_tiny(td)
    deck = DECK.split("run 40")[0] + \
        "dump d1 all custom 20 t.dump id v_missing\nrun 0\n"
    with open(os.path.join(td, "in.tiny"), "w") as fh:
        fh.write(deck)
    from lammps_le_tpu.deck.runner import DeckError
    r = DeckRunner(dtype="float32", quiet=True)
    with pytest.raises(DeckError):
        r.run_file(os.path.join(td, "in.tiny"))


def test_pair_mixing_geometric(tmp_path):
    """Unset off-diagonal pair coeffs mix geometrically from the
    diagonals (pair.cpp mix geometric, the lj/cut default)."""
    import numpy as np

    r = DeckRunner(dtype="float32", quiet=True)
    td = str(tmp_path)
    _write_tiny(td)
    r.root = td
    for cmd, args in [
        ("units", ["lj"]), ("atom_style", ["bond"]),
        ("special_bonds", ["fene"]), ("read_data", ["data.tiny"]),
        ("bond_style", ["hybrid"]),
        ("bond_coeff", ["1", "fene", "30.0", "1.5", "1.0", "1.0"]),
        ("bond_coeff", ["2", "harmonic", "10.0", "1.1"]),
        ("pair_style", ["lj/cut", "1.12"]),
        ("pair_coeff", ["1", "1", "1.0", "1.0"]),
        ("pair_coeff", ["2", "2", "4.0", "2.0"]),
        ("pair_coeff", ["3", "3", "1.0", "1.0"]),
        ("pair_coeff", ["4", "4", "1.0", "1.0"]),
        ("fix", ["1", "all", "nve"]),
        ("run", ["0"]),
    ]:
        r.command(cmd, args)
    p = r.system.pair
    assert abs(p.epsilon[0, 1] - 2.0) < 1e-12      # sqrt(1*4)
    assert abs(p.sigma[0, 1] - np.sqrt(2.0)) < 1e-12
    assert p.epsilon[0, 0] == 1.0 and p.epsilon[1, 1] == 4.0


def test_replicate(tmp_path):
    """replicate nx ny nz tiles the system (src/replicate.cpp; the
    reference's scaled benchmarks, bench/in.chain.scaled)."""
    td = str(tmp_path)
    _write_tiny(td)
    deck = DECK.split("thermo 20")[0].replace(
        "read_data data.tiny", "read_data data.tiny\nreplicate 2 1 1"
    ) + "thermo 20\ntimestep 0.005\nrun 20\n"
    with open(os.path.join(td, "in.rep"), "w") as fh:
        fh.write(deck)
    r = DeckRunner(dtype="float32", quiet=True)
    r.run_file(os.path.join(td, "in.rep"))
    assert r.system.n == 600
    assert int(r.state.flags) == 0, hex(int(r.state.flags))
    # per-image chains intact: 600 beads with the same per-molecule
    # backbone structure (bond count doubled)
    nxt = r.system.next_bead
    assert (nxt[:299] >= 0).sum() + (nxt[300:599] >= 0).sum() == \
        (np.asarray(nxt) >= 0).sum()
    # box doubled along x
    assert abs(r.system.box_size[0] - 2 * 9.6) < 1e-9 or \
        r.system.box_size[0] > r.system.box_size[1]


def test_region_sphere_group_and_temp_region(tmp_path):
    """region sphere (src/region_sphere.cpp): membership for group
    region and compute temp/region."""
    import numpy as np

    from lammps_le_tpu.deck import DeckRunner
    from lammps_le_tpu.io.data import write_data
    from lammps_le_tpu.scene import serpentine

    td = str(tmp_path)
    data = serpentine(200, seed=9)
    write_data(os.path.join(td, "d.data"), data)
    cx, cy, cz = np.asarray(data.box_hi) * 0.5
    deck = f"""
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
region ball sphere {cx} {cy} {cz} 3.5 units box
group inner region ball
fix 1 all nve
compute tr all temp/region ball
timestep 0.004
run 2
"""
    path = os.path.join(td, "in.sph")
    with open(path, "w") as fh:
        fh.write(deck)
    r = DeckRunner(dtype="float32", quiet=True)
    r.run_file(path)
    st = r.state
    x = np.asarray(st.x)
    d = x - np.array([cx, cy, cz])
    sel = np.sum(d * d, axis=1) <= 3.5 ** 2
    assert 0 < sel.sum() < r.system.n
    got = np.asarray(r._region_mask("ball", st.x))
    assert np.array_equal(got, sel)
    v = np.asarray(st.v, np.float64)
    m = np.asarray(r.system.masses, np.float64)[np.asarray(st.type)]
    want = float(np.sum(m[sel] * np.sum(v[sel] ** 2, 1))
                 / (3.0 * sel.sum()))
    assert abs(r._compute_value("tr", st) - want) < 1e-10


def test_velocity_zero_angular(tmp_path):
    """velocity all zero angular (velocity.cpp zero_rotation): the group
    angular momentum about its COM vanishes."""
    import numpy as np

    from lammps_le_tpu.deck import DeckRunner
    from lammps_le_tpu.io.data import write_data
    from lammps_le_tpu.scene import serpentine

    td = str(tmp_path)
    write_data(os.path.join(td, "d.data"), serpentine(150, seed=4))
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
velocity all zero angular
fix 1 all nve
run 0
"""
    path = os.path.join(td, "in.za")
    with open(path, "w") as fh:
        fh.write(deck)
    r = DeckRunner(dtype="float64", quiet=True)
    r.run_file(path)
    st = r.state
    x = np.asarray(r._unwrapped(st), np.float64)
    v = np.asarray(st.v, np.float64)
    m = np.asarray(r.system.masses, np.float64)[np.asarray(st.type)]
    com = (m[:, None] * x).sum(0) / m.sum()
    L = np.sum(np.cross(x - com, m[:, None] * v), axis=0)
    assert np.max(np.abs(L)) < 1e-8 * len(x)
