"""Native LAMMPS binary restart reader (reference interop).

Parses the single-file native restart format the reference binary writes
(reference: src/write_restart.cpp:424-498 header layout,
src/lmprestart.h:22 flag enumeration, src/atom_vec.cpp:1468 per-atom
payload, FORMAT_REVISION 2 / 29Oct2020 era) so a deck can resume a
REFERENCE run mid-stream for tight A/Bs:

    read_restart state.restart      # written by the reference binary

Scope: atom_style bond, pair lj/cut, bond fene/harmonic (plain or
hybrid), single- or multi-proc files written without MPI-IO — i.e.
exactly the LE workflow's surface.  Everything is parsed into the same
``DataFile`` the text reader produces, plus run metadata (step, dt,
velocities, images, special weights); the deck runner then builds
System/State through the ordinary read_data path.

ubuf convention: int fields ride the 8-byte double slots as int64 bit
patterns (src/lmptype.h union ubuf), NOT numeric casts.  Image counters
pack (ix, iy, iz) as 10-bit fields offset by 512 (src/lmptype.h IMGMASK).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

MAGIC = b"LammpS RestartT\x00"

# src/lmprestart.h enum, FORMAT_REVISION 2
(VERSION, SMALLINT, TAGINT, BIGINT,
 UNITS, NTIMESTEP, DIMENSION, NPROCS, PROCGRID,
 NEWTON_PAIR, NEWTON_BOND,
 XPERIODIC, YPERIODIC, ZPERIODIC, BOUNDARY,
 ATOM_STYLE, NATOMS, NTYPES,
 NBONDS, NBONDTYPES, BOND_PER_ATOM,
 NANGLES, NANGLETYPES, ANGLE_PER_ATOM,
 NDIHEDRALS, NDIHEDRALTYPES, DIHEDRAL_PER_ATOM,
 NIMPROPERS, NIMPROPERTYPES, IMPROPER_PER_ATOM,
 TRICLINIC, BOXLO, BOXHI, XY, XZ, YZ,
 SPECIAL_LJ, SPECIAL_COUL,
 MASS, PAIR, BOND, ANGLE, DIHEDRAL, IMPROPER,
 MULTIPROC, MPIIO, PROCSPERFILE, PERPROC,
 IMAGEINT, BOUNDMIN, TIMESTEP,
 ATOM_ID, ATOM_MAP_STYLE, ATOM_MAP_USER, ATOM_SORTFREQ, ATOM_SORTBIN,
 COMM_MODE, COMM_CUTOFF, COMM_VEL, NO_PAIR,
 EXTRA_BOND_PER_ATOM, EXTRA_ANGLE_PER_ATOM, EXTRA_DIHEDRAL_PER_ATOM,
 EXTRA_IMPROPER_PER_ATOM, EXTRA_SPECIAL_PER_ATOM, ATOM_MAXSPECIAL,
 NELLIPSOIDS, NLINES, NTRIS, NBODIES) = range(70)

_IMG_MAX = 512
_IMG_MASK = 1023


class RestartError(RuntimeError):
    pass


class _Reader:
    def __init__(self, blob: bytes):
        self.b = blob
        self.o = 0

    def raw(self, n: int) -> bytes:
        if self.o + n > len(self.b):
            raise RestartError("truncated restart file")
        out = self.b[self.o:self.o + n]
        self.o += n
        return out

    def i32(self) -> int:
        return struct.unpack("<i", self.raw(4))[0]

    def i64(self) -> int:
        return struct.unpack("<q", self.raw(8))[0]

    def f64(self) -> float:
        return struct.unpack("<d", self.raw(8))[0]

    def string(self) -> str:
        n = self.i32()
        return self.raw(n).split(b"\x00", 1)[0].decode()

    def i32_vec(self) -> np.ndarray:
        n = self.i32()
        return np.frombuffer(self.raw(4 * n), "<i4")

    def f64_vec(self) -> np.ndarray:
        n = self.i32()
        return np.frombuffer(self.raw(8 * n), "<f8")


@dataclass
class LammpsRestart:
    """Everything the LE engine needs from a native restart file."""
    natoms: int = 0
    ntypes: int = 0
    nbondtypes: int = 0
    step: int = 0
    dt: float = 0.0
    units: str = "lj"
    box_lo: tuple = (0.0, 0.0, 0.0)
    box_hi: tuple = (0.0, 0.0, 0.0)
    special_lj: tuple = (0.0, 1.0, 1.0)
    masses: Optional[np.ndarray] = None
    pair_style: str = ""
    pair_coeffs: Dict[tuple, tuple] = field(default_factory=dict)
    bond_styles: List[str] = field(default_factory=list)
    x: Optional[np.ndarray] = None       # (N, 3) by tag order
    v: Optional[np.ndarray] = None
    img: Optional[np.ndarray] = None     # (N, 3) int32
    types: Optional[np.ndarray] = None   # (N,) 0-based
    molecule: Optional[np.ndarray] = None
    bonds: Optional[np.ndarray] = None   # (B, 3) [type(1b), a(1b), b(1b)]
    version: str = ""


_HEADER_KINDS = {
    VERSION: "str", UNITS: "str",
    SMALLINT: "i32", IMAGEINT: "i32", TAGINT: "i32", BIGINT: "i32",
    NTIMESTEP: "i64", DIMENSION: "i32", NPROCS: "i32",
    PROCGRID: "ivec",
    NEWTON_PAIR: "i32", NEWTON_BOND: "i32",
    XPERIODIC: "i32", YPERIODIC: "i32", ZPERIODIC: "i32",
    BOUNDARY: "ivec", BOUNDMIN: "dvec",
    NATOMS: "i64", NTYPES: "i32",
    NBONDS: "i64", NBONDTYPES: "i32", BOND_PER_ATOM: "i32",
    NANGLES: "i64", NANGLETYPES: "i32", ANGLE_PER_ATOM: "i32",
    NDIHEDRALS: "i64", NDIHEDRALTYPES: "i32", DIHEDRAL_PER_ATOM: "i32",
    NIMPROPERS: "i64", NIMPROPERTYPES: "i32", IMPROPER_PER_ATOM: "i32",
    TRICLINIC: "i32", BOXLO: "dvec", BOXHI: "dvec",
    XY: "f64", XZ: "f64", YZ: "f64",
    SPECIAL_LJ: "dvec", SPECIAL_COUL: "dvec",
    TIMESTEP: "f64",
    ATOM_ID: "i32", ATOM_MAP_STYLE: "i32", ATOM_MAP_USER: "i32",
    ATOM_SORTFREQ: "i32", ATOM_SORTBIN: "f64",
    COMM_MODE: "i32", COMM_CUTOFF: "f64", COMM_VEL: "i32",
    EXTRA_BOND_PER_ATOM: "i32", EXTRA_ANGLE_PER_ATOM: "i32",
    EXTRA_DIHEDRAL_PER_ATOM: "i32", EXTRA_IMPROPER_PER_ATOM: "i32",
    EXTRA_SPECIAL_PER_ATOM: "i32", ATOM_MAXSPECIAL: "i32",
    NELLIPSOIDS: "i64", NLINES: "i64", NTRIS: "i64", NBODIES: "i64",
}


def _read_header(r: _Reader, out: LammpsRestart):
    while True:
        flag = r.i32()
        if flag == -1:
            return
        if flag == ATOM_STYLE:
            style = r.string()
            if style != "bond":
                raise RestartError(
                    f"unsupported atom_style {style!r} (LE scope: bond)")
            narg = r.i32()  # style args follow flagless
            for _ in range(narg):
                r.string()
            continue
        kind = _HEADER_KINDS.get(flag)
        if kind is None:
            raise RestartError(f"unknown restart header flag {flag}")
        val = {"str": r.string, "i32": r.i32, "i64": r.i64, "f64": r.f64,
               "ivec": r.i32_vec, "dvec": r.f64_vec}[kind]()
        if flag == VERSION:
            out.version = val
        elif flag == UNITS:
            out.units = val
        elif flag == NTIMESTEP:
            out.step = val
        elif flag == NATOMS:
            out.natoms = val
        elif flag == NTYPES:
            out.ntypes = val
        elif flag == NBONDTYPES:
            out.nbondtypes = val
        elif flag == BOXLO:
            out.box_lo = tuple(val)
        elif flag == BOXHI:
            out.box_hi = tuple(val)
        elif flag == SPECIAL_LJ:
            out.special_lj = tuple(val)
        elif flag == TIMESTEP:
            out.dt = val
        elif flag == TRICLINIC and val:
            raise RestartError("triclinic boxes are out of scope")


def _read_force_fields(r: _Reader, out: LammpsRestart):
    while True:
        flag = r.i32()
        if flag == -1:
            return
        if flag in (PAIR, NO_PAIR):
            out.pair_style = r.string()
            if flag == NO_PAIR:
                continue
            if not out.pair_style.startswith("lj/cut"):
                raise RestartError(
                    f"unsupported pair style {out.pair_style!r}")
            # PairLJCut::write_restart_settings + per-pair coeffs
            # (src/pair_lj_cut.cpp:575-629)
            r.f64()                   # cut_global
            r.i32(); r.i32(); r.i32()  # offset/mix/tail flags
            for i in range(1, out.ntypes + 1):
                for j in range(i, out.ntypes + 1):
                    if r.i32():
                        eps, sig, cut = r.f64(), r.f64(), r.f64()
                        out.pair_coeffs[(i, j)] = (eps, sig, cut)
        elif flag == BOND:
            style = r.string()
            nbt = out.nbondtypes
            if style == "hybrid":
                # src/bond_hybrid.cpp:334 — keywords only, NO coeffs
                # (re-specify bond_coeff after read_restart, as LAMMPS
                # itself requires for hybrid)
                n = r.i32()
                for _ in range(n):
                    sub = r.string()
                    out.bond_styles.append(sub)
                    # write_restart_settings is empty for fene/harmonic
                    if sub not in ("fene", "harmonic"):
                        raise RestartError(
                            f"unsupported hybrid bond sub-style {sub!r}")
            elif style == "fene":
                out.bond_styles.append("fene")
                r.raw(8 * 4 * nbt)    # k, r0, epsilon, sigma per type
            elif style == "harmonic":
                out.bond_styles.append("harmonic")
                r.raw(8 * 2 * nbt)    # k, r0 per type
            else:
                raise RestartError(f"unsupported bond style {style!r}")
        else:
            raise RestartError(
                f"unsupported force-field section (flag {flag}); LE scope "
                "is pair lj/cut + bond fene/harmonic/hybrid")


def _unpack_atoms(bufs: List[np.ndarray], out: LammpsRestart):
    n = out.natoms
    x = np.zeros((n, 3))
    v = np.zeros((n, 3))
    img = np.zeros((n, 3), np.int32)
    types = np.zeros(n, np.int64)
    mol = np.zeros(n, np.int64)
    seen = np.zeros(n, bool)
    bond_set = set()
    for buf in bufs:
        ints = buf.view("<i8")  # ubuf: int fields are int64 bit patterns
        m = 0
        while m < len(buf):
            ln = int(buf[m])
            if ln <= 0:
                raise RestartError("corrupt per-atom record length")
            tag = int(ints[m + 4])
            if not 1 <= tag <= n:
                raise RestartError(f"atom tag {tag} out of range")
            i = tag - 1
            seen[i] = True
            x[i] = buf[m + 1:m + 4]
            types[i] = ints[m + 5]
            imgint = int(ints[m + 7])
            img[i] = ((imgint & _IMG_MASK) - _IMG_MAX,
                      ((imgint >> 10) & _IMG_MASK) - _IMG_MAX,
                      ((imgint >> 20) & _IMG_MASK) - _IMG_MAX)
            v[i] = buf[m + 8:m + 11]
            # fields_restart = "molecule num_bond bond_type bond_atom"
            # (src/MOLECULE/atom_vec_bond.cpp:45)
            mol[i] = ints[m + 11]
            nb = int(ints[m + 12])
            bt = ints[m + 13:m + 13 + nb]
            ba = ints[m + 13 + nb:m + 13 + 2 * nb]
            for t, other in zip(bt, ba):
                a, b = (tag, int(other)) if tag < other else (int(other), tag)
                bond_set.add((int(t), a, b))
            # anything past the avec fields is per-atom fix state —
            # irrelevant to the LE engine's State; skip via the record
            # length (the reference does the same for unknown styles)
            m += ln
    if not seen.all():
        raise RestartError("restart file missing atoms")
    out.x, out.v, out.img = x, v, img
    out.types = types - 1
    out.molecule = mol
    out.bonds = np.array(sorted(bond_set), np.int64) if bond_set else \
        np.zeros((0, 3), np.int64)


def read_lammps_restart(path: str) -> LammpsRestart:
    with open(path, "rb") as fh:
        blob = fh.read()
    if not blob.startswith(MAGIC):
        raise RestartError(f"{path}: not a LAMMPS native restart file")
    r = _Reader(blob)
    r.raw(len(MAGIC))
    endian = r.i32()
    if endian != 0x0001:
        raise RestartError("big-endian restart files are unsupported")
    revision = r.i32()
    if revision > 2:
        raise RestartError(f"restart format revision {revision} > 2")
    out = LammpsRestart()
    _read_header(r, out)
    # groups (src/group.cpp:693 Group::write_restart): ngroup, then up to
    # MAX_GROUP (32) length-prefixed names, stopping once ngroup found
    ngroup = r.i32()
    found = 0
    for _ in range(32):
        if found == ngroup:
            break
        n = r.i32()
        if n:
            r.raw(n)
            found += 1
    # type arrays
    while True:
        flag = r.i32()
        if flag == -1:
            break
        if flag == MASS:
            out.masses = np.asarray(r.f64_vec())
        else:
            raise RestartError(f"unknown type-array flag {flag}")
    _read_force_fields(r, out)
    # fix state (src/modify.cpp:1374 Modify::write_restart): global blobs
    # are (id, style, int n, n doubles); the LE fixes store none.
    nglobal = r.i32()
    for _ in range(nglobal):
        r.string()  # id
        r.string()  # style
        r.raw(8 * r.i32())
    nperatom = r.i32()
    if nperatom:
        # per-atom fix state also rides the atom payload records (the
        # record-length skip there handles it), but mapping it back needs
        # the fix identities — out of LE scope
        raise RestartError("per-atom fix restart state is unsupported")
    # file layout
    multiproc = 0
    while True:
        flag = r.i32()
        if flag == -1:
            break
        if flag == MULTIPROC:
            multiproc = r.i32()
            if multiproc:
                raise RestartError("multi-file ('%') restarts unsupported")
        elif flag == MPIIO:
            if r.i32():
                raise RestartError("MPI-IO restarts unsupported")
        else:
            raise RestartError(f"unknown layout flag {flag}")
    # per-proc atom payloads until the trailing magic string
    bufs = []
    while r.o < len(blob) and not blob[r.o:].startswith(MAGIC):
        flag = r.i32()
        if flag != PERPROC:
            raise RestartError(f"expected PERPROC payload, got flag {flag}")
        bufs.append(r.f64_vec())
    _unpack_atoms(bufs, out)
    return out


# ---------------------------------------------------------------------------
# writer: produce a native restart the REFERENCE binary can resume
# (mirror of the layout parsed above; see write_restart.cpp:424-498)

from ..system import BOND_FENE, BOND_HARMONIC  # noqa: E402

_BOND_NAMES = {BOND_FENE: "fene", BOND_HARMONIC: "harmonic"}


class _Writer:
    def __init__(self):
        self.parts: List[bytes] = []

    def raw(self, b: bytes):
        self.parts.append(b)

    def i32(self, v: int):
        self.raw(struct.pack("<i", int(v)))

    def i64(self, v: int):
        self.raw(struct.pack("<q", int(v)))

    def f64(self, v: float):
        self.raw(struct.pack("<d", float(v)))

    def flag_i32(self, flag: int, v: int):
        self.i32(flag); self.i32(v)

    def flag_i64(self, flag: int, v: int):
        self.i32(flag); self.i64(v)

    def flag_f64(self, flag: int, v: float):
        self.i32(flag); self.f64(v)

    def flag_str(self, flag: int, s: str):
        b = s.encode() + b"\x00"
        self.i32(flag); self.i32(len(b)); self.raw(b)

    def flag_ivec(self, flag: int, vec):
        self.i32(flag); self.i32(len(vec))
        self.raw(np.asarray(vec, "<i4").tobytes())

    def flag_dvec(self, flag: int, vec):
        self.i32(flag); self.i32(len(vec))
        self.raw(np.asarray(vec, "<f8").tobytes())


def write_lammps_restart(path: str, data, step: int, dt: float,
                         special_lj=(0.0, 1.0, 1.0), pair=None,
                         pair_shift=True, bond_styles=None,
                         bond_coeffs=None):
    """Write ``data`` (a DataFile, 0-based like io.data) as a native
    restart resumable by the reference binary.

    ``pair``: optional (ntypes, ntypes) (epsilon, sigma, cutoff) triple of
    arrays for the lj/cut coeff block.  ``bond_styles``: per-bond-type
    style ints (BOND_FENE/BOND_HARMONIC); with a single distinct style its
    coeff table is embedded, otherwise the hybrid convention applies
    (coeffs re-specified by the resume deck, as LAMMPS requires).
    """
    n = data.n_atoms
    ntypes = data.n_atom_types
    nbt = data.n_bond_types
    if getattr(data, "n_angles", 0):
        # atom_style bond carries no angle storage in LAMMPS; a faithful
        # angle restart would need the atom_vec_angle payload layout
        raise RestartError(
            "native restart export with angles is unsupported "
            "(atom_style bond payload); use npz checkpoints")
    w = _Writer()
    w.raw(MAGIC)
    w.i32(0x0001)
    w.i32(2)
    # header — field order follows write_restart.cpp:426-498
    w.flag_str(VERSION, "29 Oct 2020")
    w.flag_i32(SMALLINT, 4)
    w.flag_i32(IMAGEINT, 4)
    w.flag_i32(TAGINT, 4)
    w.flag_i32(BIGINT, 8)
    w.flag_str(UNITS, "lj")
    w.flag_i64(NTIMESTEP, step)
    w.flag_i32(DIMENSION, 3)
    w.flag_i32(NPROCS, 1)
    w.flag_ivec(PROCGRID, [1, 1, 1])
    w.flag_i32(NEWTON_PAIR, 0)
    w.flag_i32(NEWTON_BOND, 0)
    w.flag_i32(XPERIODIC, 1)
    w.flag_i32(YPERIODIC, 1)
    w.flag_i32(ZPERIODIC, 1)
    w.flag_ivec(BOUNDARY, [0, 0, 0, 0, 0, 0])
    w.flag_dvec(BOUNDMIN, [0.0] * 6)
    # atom_style + flagless nargcopy
    b = b"bond\x00"
    w.i32(ATOM_STYLE); w.i32(len(b)); w.raw(b)
    w.i32(0)
    bonds = np.asarray(data.bonds, np.int64)
    w.flag_i64(NATOMS, n)
    w.flag_i32(NTYPES, ntypes)
    w.flag_i64(NBONDS, len(bonds))
    w.flag_i32(NBONDTYPES, nbt)
    # per-atom capacity: both-direction storage + ex_load headroom
    cnt = np.zeros(n, np.int64)
    if len(bonds):
        np.add.at(cnt, bonds[:, 1], 1)
        np.add.at(cnt, bonds[:, 2], 1)
    w.flag_i32(BOND_PER_ATOM, int(cnt.max(initial=0)) + 2)
    for f_, v_ in ((NANGLES, 0), (NANGLETYPES, 0), (ANGLE_PER_ATOM, 0),
                   (NDIHEDRALS, 0), (NDIHEDRALTYPES, 0),
                   (DIHEDRAL_PER_ATOM, 0),
                   (NIMPROPERS, 0), (NIMPROPERTYPES, 0),
                   (IMPROPER_PER_ATOM, 0)):
        if f_ in (NANGLES, NDIHEDRALS, NIMPROPERS):
            w.flag_i64(f_, v_)
        else:
            w.flag_i32(f_, v_)
    w.flag_i32(TRICLINIC, 0)
    w.flag_dvec(BOXLO, list(data.box_lo))
    w.flag_dvec(BOXHI, list(data.box_hi))
    w.flag_f64(XY, 0.0)
    w.flag_f64(XZ, 0.0)
    w.flag_f64(YZ, 0.0)
    w.flag_dvec(SPECIAL_LJ, list(special_lj))
    w.flag_dvec(SPECIAL_COUL, list(special_lj))
    w.flag_f64(TIMESTEP, dt)
    w.flag_i32(ATOM_ID, 1)
    w.flag_i32(ATOM_MAP_STYLE, 1)
    w.flag_i32(ATOM_MAP_USER, 0)
    w.flag_i32(ATOM_SORTFREQ, 1000)
    w.flag_f64(ATOM_SORTBIN, 0.0)
    w.flag_i32(COMM_MODE, 0)
    w.flag_f64(COMM_CUTOFF, 0.0)
    w.flag_i32(COMM_VEL, 0)
    w.flag_i32(EXTRA_BOND_PER_ATOM, 2)
    w.flag_i32(EXTRA_ANGLE_PER_ATOM, 0)
    w.flag_i32(EXTRA_DIHEDRAL_PER_ATOM, 0)
    w.flag_i32(EXTRA_IMPROPER_PER_ATOM, 0)
    w.flag_i32(ATOM_MAXSPECIAL, 27)
    w.flag_i64(NELLIPSOIDS, 0)
    w.flag_i64(NLINES, 0)
    w.flag_i64(NTRIS, 0)
    w.flag_i64(NBODIES, 0)
    w.i32(-1)
    # groups: just "all"
    w.i32(1)
    g = b"all\x00"
    w.i32(len(g)); w.raw(g)
    # type arrays
    w.flag_dvec(MASS, np.asarray(data.masses, np.float64))
    w.i32(-1)
    # force fields
    if pair is not None:
        eps, sig, cut = pair
        w.flag_str(PAIR, "lj/cut")
        w.f64(float(np.max(cut)))   # cut_global
        w.i32(1 if pair_shift else 0)  # offset_flag (pair_modify shift)
        w.i32(1)                    # mix_flag
        w.i32(0)                    # tail_flag
        for i in range(ntypes):
            for j in range(i, ntypes):
                w.i32(1)
                w.f64(float(eps[i][j]))
                w.f64(float(sig[i][j]))
                w.f64(float(cut[i][j]))
    if bond_styles is not None and nbt:
        styles = [int(s) for s in bond_styles[:nbt]]
        distinct = sorted(set(styles))
        if len(distinct) == 1:
            name = _BOND_NAMES[distinct[0]]
            w.flag_str(BOND, name)
            co = np.asarray(bond_coeffs, np.float64)
            ncol = 4 if distinct[0] == BOND_FENE else 2
            for c in range(ncol):
                w.raw(co[:nbt, c].astype("<f8").tobytes())
        else:
            w.flag_str(BOND, "hybrid")
            w.i32(len(distinct))
            for s in distinct:
                nm = _BOND_NAMES[s].encode() + b"\x00"
                w.i32(len(nm)); w.raw(nm)
    w.i32(-1)
    # fix state: none (the LE fixes are restart-free, src/fix.cpp:60)
    w.i32(0)
    w.i32(0)
    # file layout
    w.flag_i32(MULTIPROC, 0)
    w.flag_i32(MPIIO, 0)
    w.i32(-1)
    # per-proc payload: one record per atom, ubuf int64 puns
    per_atom: Dict[int, List] = {i: [] for i in range(n)}
    for t, a_, b_ in bonds:
        per_atom[int(a_)].append((int(t) + 1, int(b_) + 1))
        per_atom[int(b_)].append((int(t) + 1, int(a_) + 1))
    recs = []
    x = np.asarray(data.x, np.float64).copy()
    v = (np.asarray(data.v, np.float64) if data.v is not None
         else np.zeros((n, 3)))
    img = (np.asarray(data.image, np.int64) if data.image is not None
           else np.zeros((n, 3), np.int64)).copy()
    # Domain::pbc analog (domain.cpp:528): the fast engine wraps
    # positions only at neighbor rebuilds, so a snapshot can hold beads
    # slightly outside the box — the reference's read_restart assigns
    # atoms to subdomains by coordinate and ERRORS on out-of-box atoms
    # ("Did not assign all restart atoms correctly",
    # read_restart.cpp:473).  Wrap into [lo, hi) and fold the shift into
    # the image flags so unwrapped coordinates are preserved.
    lo = np.asarray(data.box_lo, np.float64)
    hi = np.asarray(data.box_hi, np.float64)
    L = hi - lo
    shift = np.floor((x - lo) / L).astype(np.int64)
    x -= shift * L
    img += shift
    mol = (np.asarray(data.molecule, np.int64) if data.molecule is not None
           else np.zeros(n, np.int64))
    types = np.asarray(data.types, np.int64)
    ib = lambda q: np.int64(q).view(np.float64)  # noqa: E731
    for i in range(n):
        blist = per_atom[i]
        imgint = (((int(img[i, 2]) + _IMG_MAX) << 20)
                  | ((int(img[i, 1]) + _IMG_MAX) << 10)
                  | (int(img[i, 0]) + _IMG_MAX))
        rec = [0.0, x[i, 0], x[i, 1], x[i, 2],
               ib(i + 1), ib(int(types[i]) + 1), ib(1), ib(imgint),
               v[i, 0], v[i, 1], v[i, 2],
               ib(int(mol[i]) + 1), ib(len(blist))]
        rec += [ib(t) for (t, _) in blist]
        rec += [ib(a) for (_, a) in blist]
        rec[0] = float(len(rec))
        recs.extend(rec)
    buf = np.asarray(recs, np.float64)
    w.i32(PERPROC)
    w.i32(len(buf))
    w.raw(buf.astype("<f8").tobytes())
    w.raw(MAGIC)
    with open(path, "wb") as fh:
        fh.write(b"".join(w.parts))
