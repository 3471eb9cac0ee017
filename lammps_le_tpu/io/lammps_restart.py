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
