"""Extended compute surface: temp/com, temp/partial, temp/region,
temp/chunk, vacf, vcm/chunk, inertia/angmom/torque per chunk,
property/atom, angle/local, pair/local, group/group, reduce/region,
slice (reference: the matching src/compute_*.cpp files)."""

import os

import numpy as np

from lammps_le_tpu.deck import DeckRunner
from lammps_le_tpu.io.data import write_data
from lammps_le_tpu.scene import serpentine


def _run(td, body, n=120, pre=""):
    data = serpentine(n, seed=11, n_atom_types=4, n_bond_types=2)
    write_data(os.path.join(td, "data.tiny"), data)
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
""" + pre + body
    path = os.path.join(td, "in.ext")
    with open(path, "w") as fh:
        fh.write(deck)
    r = DeckRunner(dtype="float32", quiet=True)
    r.run_file(path)
    return r


def test_temp_com_and_partial(tmp_path):
    r = _run(str(tmp_path), """
compute tc all temp/com
compute tp all temp/partial 1 1 0
compute t0 all temp
variable dt equal c_tc-c_t0
timestep 0.005
run 4
""")
    st = r.state
    v = np.asarray(st.v, np.float64)
    m = np.asarray(r.system.masses, np.float64)[np.asarray(st.type)]
    n = r.system.n
    # temp/com: COM velocity removed, dof = 3n - 3
    vcm = (m[:, None] * v).sum(0) / m.sum()
    want = float(np.sum(m * np.sum((v - vcm) ** 2, 1)) / (3 * n - 3))
    got = r._compute_value("tc", st)
    assert abs(got - want) < 1e-10
    # temp/partial 1 1 0: z dropped, dof = 2(n-1)
    want_p = float(np.sum(m * (v[:, 0] ** 2 + v[:, 1] ** 2))
                   / (2 * (n - 1)))
    got_p = r._compute_value("tp", st)
    assert abs(got_p - want_p) < 1e-10


def test_temp_region_and_reduce_region(tmp_path):
    box = "region half block 0 3.0 EDGE EDGE EDGE EDGE units box\n"
    r = _run(str(tmp_path), box + """
compute tr all temp/region half
compute ke all ke/atom
compute rsum all reduce/region half sum c_ke
timestep 0.005
run 2
""")
    st = r.state
    x = np.asarray(st.x)
    v = np.asarray(st.v, np.float64)
    m = np.asarray(r.system.masses, np.float64)[np.asarray(st.type)]
    _, bb = r.regions["half"]
    sel = ((x[:, 0] >= bb[0]) & (x[:, 0] <= bb[1])
           & (x[:, 1] >= bb[2]) & (x[:, 1] <= bb[3])
           & (x[:, 2] >= bb[4]) & (x[:, 2] <= bb[5]))
    assert 0 < sel.sum() < r.system.n
    want = float(np.sum(m[sel] * np.sum(v[sel] ** 2, 1))
                 / (3.0 * sel.sum()))
    assert abs(r._compute_value("tr", st) - want) < 1e-10
    ke = 0.5 * m * np.sum(v * v, axis=1)
    assert abs(r._compute_value("rsum", st)
               - float(ke[sel].sum())) < 1e-4  # ke/atom is f32


def test_vacf_starts_at_mean_vsq(tmp_path):
    r = _run(str(tmp_path), """
compute vf all vacf
thermo_style custom step c_vf[4]
thermo 2
timestep 0.005
run 2
""")
    st = r.state
    # v0 was captured at the first thermo evaluation; re-evaluating at
    # the same state must give <v.v0> with both factors current
    v = np.asarray(st.v, np.float64)
    got = r._compute_value("vf", st, idx=4)
    want = float(np.mean(np.sum(v * r.computes["vf"]["v0"], axis=1)))
    assert abs(got - want) < 1e-12


def test_vcm_and_temp_chunk(tmp_path):
    r = _run(str(tmp_path), """
compute cc all chunk/atom type
compute vc all vcm/chunk cc
compute tch all temp/chunk cc com yes
timestep 0.005
run 2
""")
    st = r.state
    v = np.asarray(st.v, np.float64)
    ty = np.asarray(st.type)
    m = np.asarray(r.system.masses, np.float64)[ty]
    tab = r._chunk_table("vc", st)
    for t in range(tab.shape[0]):
        sel = ty == t
        if not sel.any():
            continue
        want = (m[sel, None] * v[sel]).sum(0) / m[sel].sum()
        assert np.allclose(tab[t], want, atol=1e-12)
    ttab = r._chunk_table("tch", st)
    t0 = ty == 0
    vcm = (m[t0, None] * v[t0]).sum(0) / m[t0].sum()
    want_t = float(np.sum(m[t0] * np.sum((v[t0] - vcm) ** 2, 1))
                   / (3.0 * t0.sum() - 3.0))
    assert abs(ttab[0, 0] - want_t) < 1e-10


def test_inertia_angmom_torque_chunk(tmp_path):
    r = _run(str(tmp_path), """
compute cc all chunk/atom molecule
compute ic all inertia/chunk cc
compute lc all angmom/chunk cc
compute qc all torque/chunk cc
timestep 0.005
run 2
""")
    st = r.state
    xu = np.asarray(st.x, np.float64) + np.asarray(st.img) * np.asarray(
        r.system.box_size, np.float64)
    m = np.asarray(r.system.masses, np.float64)[np.asarray(st.type)]
    com = (m[:, None] * xu).sum(0) / m.sum()
    d = xu - com
    itab = r._chunk_table("ic", st)
    assert abs(itab[0, 0]
               - np.sum(m * (d[:, 1] ** 2 + d[:, 2] ** 2))) < 1e-8
    assert abs(itab[0, 3] - np.sum(m * -d[:, 0] * d[:, 1])) < 1e-8
    ltab = r._chunk_table("lc", st)
    want_l = np.sum(np.cross(d, m[:, None] * np.asarray(st.v,
                                                        np.float64)), 0)
    assert np.allclose(ltab[0], want_l, atol=1e-8)
    qtab = r._chunk_table("qc", st)
    want_q = np.sum(np.cross(d, np.asarray(st.f, np.float64)), 0)
    assert np.allclose(qtab[0], want_q, atol=1e-6)


def test_property_atom_dump_and_reduce(tmp_path):
    td = str(tmp_path)
    r = _run(td, """
compute pa all property/atom xu vx
compute mx all reduce max c_pa[2]
dump d1 all custom 2 prop.dump id c_pa[1] c_pa[2]
timestep 0.005
run 2
""")
    st = r.state
    v = np.asarray(st.v)
    assert abs(r._compute_value("mx", st) - float(v[:, 0].max())) < 1e-6
    txt = open(os.path.join(td, "prop.dump")).read()
    assert "c_pa[1]" in txt
    rows = [l.split() for l in txt.splitlines()
            if l and l[0].isdigit() and len(l.split()) == 3]
    assert len(rows) >= r.system.n


def test_angle_local_dump(tmp_path):
    from lammps_le_tpu.io.data import DataFile

    td = str(tmp_path)
    data = serpentine(60, seed=3, n_atom_types=4, n_bond_types=2)
    a = np.arange(1, 59)
    data = DataFile(
        n_atoms=data.n_atoms, n_bonds=data.n_bonds,
        n_atom_types=data.n_atom_types, n_bond_types=data.n_bond_types,
        box_lo=data.box_lo, box_hi=data.box_hi, masses=data.masses,
        x=data.x, v=None, types=data.types, molecule=data.molecule,
        image=data.image, bonds=data.bonds,
        n_angles=len(a), n_angle_types=1,
        angles=np.stack([np.zeros_like(a), a - 1, a, a + 1], axis=1),
    )
    write_data(os.path.join(td, "data.ang"), data)
    deck = """
units lj
atom_style angle
special_bonds fene
read_data data.ang
neighbor 0.3 bin
bond_style hybrid
bond_coeff 1 fene 30.0 1.5 1.0 1.0
bond_coeff 2 harmonic 10.0 1.1
angle_style cosine
angle_coeff 1 2.0
pair_style lj/cut 1.12
pair_coeff * * 1.0 1.0 1.12
velocity all create 0.5 12345
fix 1 all nve
compute al all angle/local theta eng
dump d2 all local 2 ang.dump c_al[1] c_al[2]
timestep 0.005
run 2
"""
    path = os.path.join(td, "in.ang")
    with open(path, "w") as fh:
        fh.write(deck)
    r = DeckRunner(dtype="float32", quiet=True)
    r.run_file(path)
    tab = r._angle_local_table(["theta", "eng"], "all", r.state)
    assert tab.shape[0] > 0
    assert np.all((tab[:, 0] > 0) & (tab[:, 0] <= 180.0))
    # cosine angle energy: K (1 + cos theta)
    want = 2.0 * (1.0 + np.cos(np.radians(tab[:, 0])))
    assert np.allclose(tab[:, 1], want, rtol=1e-6)
    txt = open(os.path.join(td, "ang.dump")).read()
    assert "NUMBER OF ENTRIES" in txt


def test_pair_local_and_group_group(tmp_path):
    td = str(tmp_path)
    r = _run(td, """
pair_style lj/cut 1.3
pair_coeff * * 1.0 1.0 1.3
group half1 id 1:60
group half2 id 61:120
compute pl all pair/local dist eng
compute gg half1 group/group half2
dump d3 all local 2 pair.dump c_pl[1] c_pl[2]
timestep 0.005
run 2
""")
    st = r.state
    tab = r._pair_local_table(["dist", "eng"], "all", st)
    cut = float(np.max(np.asarray(r.system.pair.cutoff)))
    assert tab.shape[0] > 0
    assert np.all(tab[:, 0] < cut)
    # brute-force the total pair energy with fene exclusions: the halved
    # pair/local sum must match within special handling
    from lammps_le_tpu.observe.pairs import (_all_pairs, lj_pair_values,
                                             special_weights)

    x = np.asarray(st.x, np.float64)
    box = np.asarray(r.system.box_size, np.float64)
    i, j, dist = _all_pairs(x, box, cut)
    w = special_weights(r.system, st, i, j)
    eng, _ = lj_pair_values(r.system, np.asarray(st.type), i, j, dist)
    assert abs(tab[:, 1].sum() - float(np.sum(w * eng))) < 1e-8
    # group/group: cross-pair lj energy only
    gg = r._compute_value("gg", st)
    ga = np.zeros(r.system.n, bool)
    ga[:60] = True
    cross = (ga[i] & ~ga[j]) | (~ga[i] & ga[j])
    assert abs(gg - float(np.sum((w * eng)[cross]))) < 1e-8


def test_slice_of_rdf(tmp_path):
    r = _run(str(tmp_path), """
compute r all rdf 10
compute s2 all slice 2 10 4 c_r
timestep 0.005
run 2
""")
    st = r.state
    tab = np.asarray(r._compute_vector("r", st))
    got = r._compute_value("s2", st, idx=2)
    # rows 2, 6, 10 (1-based start 2 skip 4): idx 2 -> row 6, col 0
    assert abs(got - tab[5, 0]) < 1e-12


def test_fix_ave_chunk(tmp_path):
    td = str(tmp_path)
    r = _run(td, """
compute cc all chunk/atom type
fix ac all ave/chunk 2 2 4 cc vx c_ke1 file chunk.out
compute ke1 all ke/atom
timestep 0.005
run 8
""", pre="compute ke1b all ke/atom\n")
    out = open(os.path.join(td, "chunk.out")).read()
    lines = [l for l in out.splitlines() if not l.startswith("#")]
    # two Nfreq blocks (steps 4 and 8), each: header + nchunk rows
    heads = [l for l in lines if len(l.split()) == 3]
    assert len(heads) == 2
    step, nchunk, total = heads[0].split()
    assert int(step) == 4
    assert float(total) == r.system.n
    rows = [l.split() for l in lines if len(l.split()) == 4]
    assert len(rows) == 2 * int(nchunk)
    # per-chunk mean vx of the window should be a finite number
    assert all(np.isfinite(float(c)) for row in rows for c in row)


def test_compute_bond_pair_energy(tmp_path):
    """compute bond / compute pair global energy vectors
    (src/compute_bond.cpp, compute_pair.cpp): per-sub-style energies
    that sum to the engine's ebond/epair tallies."""
    from lammps_le_tpu.io.data import DataFile, write_data
    from lammps_le_tpu.scene import serpentine

    td = str(tmp_path)
    data = serpentine(120, seed=11, n_atom_types=4, n_bond_types=2)
    # pre-seed two extruder (non-consecutive, type-2) bonds
    extra = np.array([[1, 10, 14], [1, 40, 46]])
    data = DataFile(
        n_atoms=data.n_atoms, n_bonds=data.n_bonds + 2,
        n_atom_types=4, n_bond_types=2, box_lo=data.box_lo,
        box_hi=data.box_hi, masses=data.masses, x=data.x, v=None,
        types=data.types, molecule=data.molecule, image=data.image,
        bonds=np.concatenate([np.asarray(data.bonds), extra], axis=0),
    )
    write_data(os.path.join(td, "data.tiny"), data)
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
compute eb all bond
compute ep all pair lj/cut
timestep 0.005
run 4
"""
    path = os.path.join(td, "in.eb")
    with open(path, "w") as fh:
        fh.write(deck)
    r = DeckRunner(dtype="float32", quiet=True)
    r.run_file(path)
    st = r.state
    vec = r._style_energy_vector("bond", st)
    # hybrid deck: [fene backbone, harmonic extruder]
    assert len(vec) == 2
    total = r._compute_value("eb", st)
    assert abs(total - (vec[0] + vec[1])) < 1e-6
    # re-evaluated bonded energy matches the step's ebond tally
    ref = float(st.ebond)
    assert abs(total - ref) < 1e-3 * max(1.0, abs(ref))
    assert r._compute_value("eb", st, idx=1) == float(vec[0])
    assert r._compute_value("eb", st, idx=2) == float(vec[1])
    # compute pair returns the last pair-energy evaluation
    assert abs(r._compute_value("ep", st) - float(st.epair)) < 1e-9


def test_compute_angle_energy(tmp_path):
    """compute angle (src/compute_angle.cpp): chain bending energy."""
    import os

    from lammps_le_tpu.io.data import DataFile, write_data
    from lammps_le_tpu.scene import serpentine

    td = str(tmp_path)
    data = serpentine(60, seed=7, n_atom_types=1, n_bond_types=1)
    a = np.arange(1, 59)
    data = DataFile(
        n_atoms=data.n_atoms, n_bonds=data.n_bonds, n_atom_types=1,
        n_bond_types=1, box_lo=data.box_lo, box_hi=data.box_hi,
        masses=data.masses, x=data.x, v=None, types=data.types,
        molecule=data.molecule, image=data.image, bonds=data.bonds,
        n_angles=len(a), n_angle_types=1,
        angles=np.stack([np.zeros_like(a), a - 1, a, a + 1], axis=1),
    )
    write_data(os.path.join(td, "data.ang"), data)
    deck = """
units lj
atom_style angle
special_bonds fene
read_data data.ang
neighbor 0.3 bin
bond_style fene
bond_coeff 1 30.0 1.5 1.0 1.0
angle_style cosine
angle_coeff 1 5.0
pair_style lj/cut 1.12
pair_coeff * * 1.0 1.0 1.12
velocity all create 1.0 87287
fix 1 all nve
compute ea all angle
timestep 0.004
run 3
"""
    path = os.path.join(td, "in.ang")
    with open(path, "w") as fh:
        fh.write(deck)
    r = DeckRunner(dtype="float32", quiet=True)
    r.run_file(path)
    st = r.state
    from lammps_le_tpu.ops.angle import chain_angle_force
    import jax.numpy as jnp

    _, ea = chain_angle_force(jnp.asarray(st.x), r.system, energy=True)
    got = r._compute_value("ea", st)
    assert abs(got - float(ea)) < 1e-6
    assert got == r._compute_value("ea", st, idx=1)
    # thermo keyword split: emol = ebond + eangle (thermo.cpp)
    lv_ea = r.live_value("eangle")
    lv_eb = r.live_value("ebond")
    lv_em = r.live_value("emol")
    assert abs(lv_ea - float(ea) / r.system.n) < 1e-9
    assert abs((lv_eb + lv_ea) - lv_em) < 1e-6


def test_compute_pair_nsub_and_ecoul(tmp_path):
    """compute pair accepts the reference's optional leading nsub digit
    and the ecoul evalue (compute_pair.cpp:49-64; ecoul tallies 0 for
    lj/cut) — round-4 advisor finding."""
    r = _run(str(tmp_path), """
compute e1 all pair lj/cut 1 evdwl
compute ec all pair lj/cut ecoul
timestep 0.005
run 2
""")
    st = r.state
    assert abs(r._compute_value("e1", st) - float(st.epair)) < 1e-9
    assert r._compute_value("ec", st) == 0.0


def test_ebond_live_before_first_run(tmp_path):
    """live_value('ebond') before any run must re-evaluate the bond
    terms (round-4 advisor finding: the zeroed tally minus a live angle
    term used to produce a bogus negative E_bond)."""
    r = _run(str(tmp_path), """
compute eb all bond
""", pre="")
    lv = r.live_value("ebond")       # builds state; no run has happened
    st = r.state
    vec = r._style_energy_vector("bond", st)
    n = r.system.n
    assert lv >= 0.0 or abs(lv * n - float(np.sum(vec))) < 1e-6
    assert abs(lv * n - float(np.sum(vec))) < 1e-6


def test_compute_bond_mixed_backbone_styles_refused(tmp_path):
    """A hybrid deck whose BACKBONE bonds mix styles cannot be split
    into per-sub-style energies by the lumped evaluator — refuse loudly
    (round-4 advisor finding; reference tallies per BondHybrid
    sub-style, compute_bond.cpp)."""
    import pytest

    from lammps_le_tpu.deck.runner import DeckError
    from lammps_le_tpu.io.data import DataFile, write_data

    td = str(tmp_path)
    data = serpentine(40, seed=3, n_atom_types=1, n_bond_types=2)
    bonds = np.asarray(data.bonds).copy()
    bonds[::2, 0] = 1          # alternate backbone bonds to type 2
    data = DataFile(
        n_atoms=data.n_atoms, n_bonds=data.n_bonds, n_atom_types=1,
        n_bond_types=2, box_lo=data.box_lo, box_hi=data.box_hi,
        masses=data.masses, x=data.x, v=None, types=data.types,
        molecule=data.molecule, image=data.image, bonds=bonds,
    )
    write_data(os.path.join(td, "data.mix"), data)
    deck = """
units lj
atom_style bond
special_bonds fene
read_data data.mix
neighbor 0.3 bin
bond_style hybrid
bond_coeff 1 fene 30.0 1.5 1.0 1.0
bond_coeff 2 harmonic 10.0 1.1
pair_style lj/cut 1.12
pair_coeff * * 1.0 1.0 1.12
velocity all create 0.5 12345
fix 1 all nve
compute eb all bond
timestep 0.005
run 1
"""
    path = os.path.join(td, "in.mix")
    with open(path, "w") as fh:
        fh.write(deck)
    r = DeckRunner(dtype="float32", quiet=True)
    r.run_file(path)
    with pytest.raises(DeckError, match="mix styles"):
        r._compute_value("eb", r.state)
