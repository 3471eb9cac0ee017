"""Grid-resident fast path: the TPU production engine for LE decks.

Motivation (measured on TPU v5e, PERF_NOTES.md): the LJ math of a 32k-bead
step costs ~1.4 ms, but moving data through *per-element* gathers/scatters
costs ~10 ns/element + ~0.8 ms/op — the general path's ``xp[slot]`` gather
(7 ms) and force scatter (6 ms) dominate the step.  This module therefore
keeps the dynamic state *resident in the cell-grid layout* between neighbor
rebuilds, so a normal step contains only:

* one whole-column gather refreshing the periodic halo of the position
  planes (the on-device analog of ``Comm::forward_comm``,
  reference src/comm_brick.cpp:452);
* one fused XLA chain evaluating LJ **and** backbone FENE **and** special
  exclusions in a single full 27-offset stencil pass (pair_lj_cut.cpp:68,
  bond_fene.cpp:52, force.cpp:787 in one kernel — bonds are recognized by
  bead-id difference, so no bond list exists at all);
* one small gather + one small scatter-add for the extruder springs
  (bond_harmonic.cpp:48) whose length can exceed the stencil reach;
* elementwise velocity-Verlet + Langevin with counter-based threefry noise
  keyed by (step, bead id) — halo copies would draw identical noise by
  construction (fix_langevin.cpp:654, fix_nve.cpp:64).

Re-binning (sort + scatter, the analog of ``Neighbor::build`` +
``Comm::borders``) runs every ``rebuild_every`` steps; positions wrap only
then (domain->pbc on reneighbor, src/verlet.cpp:271).  The half-skin safety
criterion (src/neighbor.cpp:1948) is monitored every step into a sticky
flag, as is "a backbone bond left the stencil reach" (which would silently
lose its force here — the moral analog of the reference's "bond atoms
missing" error, src/ntopo_bond_all.cpp:58).

Supported surface (``fast_supported``): uniform LJ parameters, uniform
mass, FENE backbone with one bond type, ``special_bonds fene`` (0,1,1),
fixes NVE + one Langevin + extrusion/ex_load/ex_unload.  Everything else
runs on the general path (ops/grid.py) — the two paths are
physics-equivalent (tests/test_fastpath.py pins t=0 forces to 1e-10 and
NVE trajectories against each other).

All per-step gates (LE fix phases, rebuild cadence, energy cadence) key on
a *scalar* step counter passed alongside the batched state so that under
``vmap`` (replica ensembles) they remain true ``lax.cond``s rather than
decaying into both-branch ``select``s.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from ..fixes.config import NVE, Extrusion, ExLoad, ExUnload, Langevin
from ..fixes.ex_load import make_ex_load_update
from ..fixes.ex_unload import make_ex_unload_update
from ..fixes.extrusion import make_extrusion_update
from ..ops.cells import cell_coords, minimum_image, wrap_positions
from ..ops.grid import _OFFSETS, halo_maps
from ..ops.pair import _lj_tables, _RSQ_FLOOR_FRAC
from ..state import (
    FLAG_BOND_REACH,
    FLAG_CELL_OVERFLOW,
    FLAG_FENE_CLAMP,
    FLAG_NON_FINITE,
    FLAG_SKIN_VIOLATION,
    State,
)
from ..system import BOND_FENE, BOND_HARMONIC, System

_FAR = -1.0e4  # sentinel coordinate for empty slots / shifted-out fills


# ---------------------------------------------------------------------------
# static geometry


@dataclasses.dataclass(frozen=True)
class _FastMaps:
    """Static (numpy) maps shared by placement/halo/kernel."""

    cap: int
    P: int
    p_raw: int
    nxyz: Tuple[int, int, int]
    strides: Tuple[int, int, int]
    src_cols: np.ndarray    # (P,) padded source column per padded column
    interior: np.ndarray    # (P,) bool
    shifts: np.ndarray      # (P, 3) ghost-image coordinate shifts
    # halo-face consts for the masked-roll refresh (pallas_step
    # make_halo_consts layout: aux rows 0-5 = x/y/z lo/hi face masks)
    halo_aux: np.ndarray = None       # (8, P) float32
    halo_roll: tuple = None           # ((s_lo, s_hi) per axis)
    box: tuple = None


_MAPS_CACHE: dict = {}


def fast_maps(system: System) -> _FastMaps:
    key = (
        system.neighbor.nx, system.neighbor.ny, system.neighbor.nz,
        system.neighbor.cell_cap, system.box_size,
    )
    hit = _MAPS_CACHE.get(key)
    if hit is not None:
        return hit
    src_p, int_p, p, strides, shifts = halo_maps(system)
    cfg = system.neighbor
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    py, pz = ny + 2, nz + 2
    p_raw = (nx + 2) * py * pz
    # padded column of each interior (unpadded) cell
    cx, cy, cz = np.meshgrid(
        np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
    )
    int_cell = (((cx + 1) * py + cy + 1) * pz + cz + 1).reshape(-1)
    src_cols = np.zeros(p, np.int32)
    src_cols[:p_raw] = int_cell[src_p[:p_raw]]
    # lane-padding tail: copy cell 0 but push coordinates far out of range
    shifts = np.array(shifts, np.float64)
    if p > p_raw:
        src_cols[p_raw:] = int_cell[0]
        box = system.box_size
        shifts[p_raw:] = [5.0 * box[0], 5.0 * box[1], 5.0 * box[2]]
    maps = _FastMaps(
        cap=cfg.cell_cap,
        P=p,
        p_raw=p_raw,
        nxyz=(nx, ny, nz),
        strides=strides,
        src_cols=src_cols,
        interior=np.array(int_p, bool),
        shifts=shifts,
    )
    from .pallas_step import make_halo_consts

    aux, roll_shifts, _ = make_halo_consts(system, maps)
    maps = dataclasses.replace(
        maps, halo_aux=aux, halo_roll=tuple(roll_shifts),
        box=tuple(float(b) for b in system.box_size),
    )
    _MAPS_CACHE[key] = maps
    return maps


# ---------------------------------------------------------------------------
# state


@struct.dataclass
class FastState:
    """Grid-resident dynamic state (one replica).

    ``gx/gv/gf`` are (3, cap, P) coordinate planes (component major, flat
    halo-padded cell axis minor — lane-dense).  ``bid`` holds the bead id
    per slot (N = empty), ``hn`` whether that bead has a chain-next link,
    ``pid`` its current extruder partner (-1).  ``slot_of`` maps bead ->
    flat slot (r * P + column).  All of these are static between rebuilds
    except ``pid``/extruder slots, which also change at LE events.
    """

    gx: jax.Array            # (3, cap, P) positions (halo = shifted copies)
    gv: jax.Array            # (3, cap, P) velocities (interior only valid)
    gf: jax.Array            # (3, cap, P) forces from last evaluation
    gx_ref: jax.Array        # (3, cap, P) positions at last rebuild
    bid: jax.Array           # (cap, P) int32 bead id, N = empty
    hn: jax.Array            # (cap, P) bool has-chain-next
    pid: jax.Array           # (cap, P) int32 extruder partner bead id, -1
    slot_of: jax.Array       # (N,) int32 flat slot of bead (r*P + col)
    exl_slot: jax.Array      # (E,) int32 flat slot of left anchors
    exr_slot: jax.Array      # (E,) int32
    types: jax.Array         # (N,) int32 (bead layout; used by LE fixes)
    img: jax.Array           # (N, 3) int32 image counters (updated at rebuild)
    ex_left: jax.Array       # (E,) int32 bead ids
    ex_right: jax.Array      # (E,) int32
    key: jax.Array
    step: jax.Array          # () int32
    flags: jax.Array         # () uint32
    epair: jax.Array         # () last evaluated pair energy
    ebond: jax.Array         # () last evaluated bond energy
    n_moves: jax.Array
    n_loads: jax.Array
    n_unloads: jax.Array
    # FENE clamp events (bond_fene.cpp:87-92 warns per occurrence and
    # continues; a bounded count during violent transients is expected,
    # an unbounded one is not)
    n_clamps: jax.Array = None
    # (3,) counts at the most recent (move, load, unload) event — f_ID[1]
    # semantics (fix_extrusion.cpp:1496-1501)
    last_event: jax.Array = None
    # () int32: 1 = displacement since rebuild crossed the reactive
    # trigger (0.5 * half-skin); the next step rebuilds (the decide()/
    # check_distance analog, src/neighbor.cpp:1933-1962, with a one-step
    # lag the 0.75 factor absorbs)
    skin_pend: jax.Array = None
    # (the rebuild-time ex_part/ex_far spring-visibility partition was
    # superseded by the cached block tables below — every active spring
    # is covered by the in-kernel block pass each step)
    # () int32 run counters (the reference prints neighbor-build counts in
    # its Performance summary, src/finish.cpp): rebuilds since to_fast, and
    # device launches on the multi-step pallas path (launches << steps is
    # the amortization working; launches ~= steps means the reactive
    # trigger is firing every step)
    n_rebuilds: jax.Array = None
    n_launches: jax.Array = None
    # Cached block-spring tables for the fused kernel's vectorized
    # extruder pass (_ex_block_table): recomputed only when anchor slots
    # or the extruder table change (rebuild, LE events), NOT per launch.
    # ex_fb = an ACTIVE spring has an overflow-dropped anchor: the
    # kernel cannot see it, so the XLA exf fallback covers all springs
    # and launches are capped at one step.
    ex_tab: jax.Array = None     # (2*EPAD, 8) int32 stacked-anchor rows
    ex_tabT: jax.Array = None    # (NBLK*8, 2*EX_BLOCK) int32 lane-major
    ex_bases: jax.Array = None   # (NBLK,) int32 window base / 128 (v5)
    ex_nblk: jax.Array = None    # () int32 leading blocks holding springs
    ex_nwin: jax.Array = None    # () int32 leading WINDOWED blocks (v5)
    ex_fb: jax.Array = None      # () bool
    # (cap, P) f32 0/1 Langevin-group membership plane, rebuilt with the
    # grid (None when the thermostat covers all beads) — fix langevin
    # <group> on the fast path (fix_langevin.cpp groupbit)
    lgm: jax.Array = None


# ---------------------------------------------------------------------------
# support checks


def _uniform_pair(system: System) -> bool:
    pp = system.pair
    if pp is None:
        return False
    return all(
        bool(np.all(np.asarray(a) == np.asarray(a).flat[0]))
        for a in (pp.epsilon, pp.sigma, pp.cutoff)
    )


def fast_block_reason(sim):
    """None when the Simulation can run on the grid-resident fast path,
    else a one-line human-readable reason (the runner prints it — decks
    must never silently drop engines, VERDICT r3 weak #5)."""
    system = sim.system
    if not system.neighbor.use_cells or system.neighbor.mode != "grid":
        return "neighbor mode is not the dense cell grid"
    if not _uniform_pair(system):
        return "per-type pair coefficients differ (uniform-LJ fast path)"
    if not bool(np.all(system.masses == system.masses.flat[0])):
        return "per-type masses differ"
    s12, s13, s14 = system.special_lj
    if s12 != 0.0 or s13 != 1.0 or s14 != 1.0:
        return f"special_bonds {s12}/{s13}/{s14} (fast path is 0/1/1)"
    if system.bonds is None:
        return "no bond styles defined"
    if system.angles is not None:
        # chain-bending pass is general-engine only (ops/angle.py)
        return "angle styles present (chain-bending is general-engine)"
    bts = np.asarray(system.backbone_type)
    used = bts[bts >= 0]
    if used.size and (
        np.any(used != used[0])
        or int(system.bonds.style[used[0]]) != BOND_FENE
    ):
        return "backbone bonds are not a single FENE type"
    n_nve = n_lan = 0
    for f in sim.fixes:
        if type(f) is NVE:
            if f.group is not None:
                return "fix nve with a group (fast path integrates all)"
            n_nve += 1
        elif isinstance(f, Langevin):
            if f.tally or f.gjf != "no":
                # tally needs a per-step energy accumulator, gjf rewired
                # Verlet kicks — general path only (fixes/config.py
                # Langevin).  group (a mask plane rebuilt with the grid)
                # and zero (one in-kernel mean-subtract per step) ride
                # the fast path since r4 (fix_langevin.cpp:438-674 keeps
                # every option in the one hot path).
                opt = "tally" if f.tally else f"gjf {f.gjf}"
                return f"fix langevin {opt} (general-engine option)"
            n_lan += 1
        elif isinstance(f, (Extrusion, ExLoad, ExUnload)):
            continue
        else:
            return f"fix {type(f).__name__} is not fast-path capable"
    if sim.ex_btype > 0:
        st = int(system.bonds.style[sim.ex_btype - 1])
        if st not in (BOND_FENE, BOND_HARMONIC):
            return "extruder bond style is neither FENE nor harmonic"
    if n_nve != 1:
        return f"{n_nve} fix nve (fast path needs exactly one)"
    if n_lan > 1:
        return f"{n_lan} fix langevin (fast path supports at most one)"
    return None


def fast_supported(sim) -> bool:
    """True when the Simulation can run on the grid-resident fast path."""
    return fast_block_reason(sim) is None


# ---------------------------------------------------------------------------
# placement (rebuild) — sort + one scatter per dtype group


def _place(system: System, maps: _FastMaps, x, v, f, types, ex_left,
           ex_right, img):
    """Bin beads into fresh planes.  Returns plane set + overflow flag.

    Forces are re-placed alongside x/v: a rebuild may happen BETWEEN the
    final half-kick of one step and the initial half-kick of the next
    (the pre-drift trigger service), and that second kick consumes the
    same forces — in the NEW slot layout."""
    n = system.n
    cap, P = maps.cap, maps.P
    dtype = x.dtype
    nx, ny, nz = maps.nxyz
    py, pz = ny + 2, nz + 2

    x, img = wrap_positions(x, system, img)
    c3 = cell_coords(x, system)
    col = ((c3[:, 0] + 1) * py + c3[:, 1] + 1) * pz + c3[:, 2] + 1

    order = jnp.argsort(col).astype(jnp.int32)
    scol = col[order]
    idx = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), scol[1:] != scol[:-1]])
    start = jax.lax.associative_scan(jnp.maximum, jnp.where(is_start, idx, 0))
    rank = idx - start
    overflow = jnp.where(
        jnp.max(rank) >= cap, jnp.uint32(FLAG_CELL_OVERFLOW), jnp.uint32(0)
    )
    # overflowed beads get DISTINCT out-of-range slots (cap*P + sorted
    # position): scatters below keep unique_indices=True valid — duplicate
    # targets would be UB in XLA scatter even when out-of-bounds-dropped
    slot_sorted = jnp.where(rank < cap, rank * P + scol, cap * P + idx)
    slot_of = jnp.zeros((n,), jnp.int32).at[order].set(slot_sorted)

    capP = cap * P

    # Plane construction is GATHER-shaped, not scatter-shaped (round 5):
    # ONE 1M-element scatter inverts the placement into a bead_at_slot
    # map, then every plane is a minor-axis gather through it.  On this
    # part scatters cost ~12.5 ms per million elements vs ~2.2 for
    # minor-axis gathers (probe_1m_components 2026-08-20: the previous
    # two concatenated scatters — 9M f32 + 3M int — were ~150 ms of the
    # 188 ms 1M rebuild).  slot_sorted's overflow entries (>= capP,
    # distinct by construction) drop; unplaced slots keep the n sentinel
    # so bid masks them and the gathers read the appended sentinel
    # column (_FAR positions / zero v,f / no-bond / no-partner).
    bas = jnp.full((capP,), n, jnp.int32).at[slot_sorted].set(
        order, mode="drop", unique_indices=True)

    arr9 = jnp.stack([x[:, 0], x[:, 1], x[:, 2],
                      v[:, 0], v[:, 1], v[:, 2],
                      f[:, 0], f[:, 1], f[:, 2]])
    sentinel = jnp.asarray([_FAR, _FAR, _FAR, 0, 0, 0, 0, 0, 0],
                           dtype)[:, None]
    planes9 = jnp.concatenate([arr9, sentinel], axis=1)[:, bas]
    gx = planes9[0:3].reshape(3, cap, P)
    gv = planes9[3:6].reshape(3, cap, P)
    gf = planes9[6:9].reshape(3, cap, P)

    nxt = jnp.asarray(system.next_bead)
    partner = _partner_of(ex_left, ex_right, n)
    bid = bas.reshape(cap, P)
    hn_src = jnp.concatenate([(nxt >= 0), jnp.zeros((1,), bool)])
    hn = hn_src[bas].reshape(cap, P)
    pid_src = jnp.concatenate([partner, jnp.full((1,), -1, jnp.int32)])
    pid = pid_src[bas].reshape(cap, P)

    # static halo columns for the int planes (refreshed only at rebuild);
    # masked rolls for the same reason as _halo_refresh (the 3-plane
    # gather cost ~20 ms per rebuild at 1M)
    ints = _halo_refresh_int(
        jnp.stack([bid, hn.astype(jnp.int32), pid]), maps)
    bid, hn, pid = ints[0], ints[1].astype(bool), ints[2]

    gx = _halo_refresh(gx, maps)

    exl_slot, exr_slot = _ex_slots(slot_of, ex_left, ex_right)
    return (gx, gv, gf, bid, hn, pid, slot_of, exl_slot, exr_slot, x, img,
            overflow)


def _partner_of(ex_left, ex_right, n):
    active = ex_left >= 0
    safe_l = jnp.where(active, ex_left, n)
    safe_r = jnp.where(active, ex_right, n)
    partner = jnp.full((n,), -1, jnp.int32)
    partner = partner.at[safe_l].set(jnp.where(active, ex_right, -1), mode="drop")
    partner = partner.at[safe_r].set(jnp.where(active, ex_left, -1), mode="drop")
    return partner


def _ex_slots(slot_of, ex_left, ex_right):
    e = ex_left.shape[0]
    active = ex_left >= 0
    both = jnp.concatenate([
        jnp.where(active, ex_left, 0), jnp.where(active, ex_right, 0)
    ])
    slots = slot_of[both]
    return slots[:e], slots[e:]


def _ex_epad(system):
    """Padded spring-table height for the kernel's block spring pass."""
    from .pallas_step import EX_BLOCK

    return -(-max(system.max_extruders, 1) // EX_BLOCK) * EX_BLOCK


def _near_spring_mask(system, ex_btype, maps, exl_slot, exr_slot,
                      ex_left, ex_right):
    """Per-spring bool: this spring's anchors sit in stencil-adjacent
    rebuild cells, so the fused kernel's near-spring term covers it and
    it must be DROPPED from the block table (pallas_step near_ex — the
    kernel decision comes from the same near_springs_enabled()).
    Returns None when the near split is off.  Backbone-adjacent anchor
    pairs are kept in the table: the kernel's sp mask excludes bonded
    pairs to keep the shared-reciprocal masks disjoint.

    Visibility == padded-cell adjacency modulo the interior period —
    exact for the whole launch because grid cells are frozen between
    rebuilds, and every retable/rebuild recomputes this mask."""
    from .pallas_step import near_springs_enabled

    if not near_springs_enabled(system, ex_btype):
        return None
    nx, ny, nz = maps.nxyz
    py, pz = ny + 2, nz + 2
    P = maps.P

    def coords(s):
        col = s % P
        return (col // (py * pz) - 1, (col // pz) % py - 1, col % pz - 1)

    def adj(a, b, nd):
        d = jnp.abs(a - b)
        return (d <= 1) | (d == nd - 1)

    la, rb = coords(exl_slot), coords(exr_slot)
    near = (adj(la[0], rb[0], nx) & adj(la[1], rb[1], ny)
            & adj(la[2], rb[2], nz))
    return near & (jnp.abs(ex_left - ex_right) != 1)


def _ex_block_table(exl_slot, exr_slot, ex_left, capP, P, cap, epad,
                    near_mask=None):
    """(tab, tabT, nblk, fallback) for the kernel's block spring pass.

    v3 stacked-anchor layout: ``tab`` is (2*epad, 8) int32 rows
    [row, col, active, 0...] where block b occupies rows
    [2Wb, 2W(b+1)) as [W left anchors; W right anchors] of springs
    bW..bW+W-1 — one one-hot/mask pair then serves BOTH sides in the
    kernel and the roll-by-W trick yields each side's signed
    separation (pallas_step spring pass).
    v5 windowing: active springs are sorted by min anchor lane and
    chunked; a block whose anchors all fit one EX_WN-lane window is
    WINDOWED — its cols are stored RELATIVE to a 128-aligned per-block
    base and the kernel runs its one-hot/mask intermediates on
    (2W, EX_WN) dynamic lane slices instead of (2W, P) full planes.
    Windowed blocks are permuted to the front; ``nwin`` counts them and
    ``bases`` (nblk_cap,) holds each block's base in 128-lane units
    (full-P blocks: base 0, absolute cols).  Springs whose anchors'
    targets are unique (occupancy-stall: <=1 anchor per bead), so the
    sort does not change any scatter sum.
    ``tabT`` is the lane-major twin (nblk*8, 2*EX_BLOCK): row 8b+f
    holds field f of block b's 2W anchors as LANES — the kernel builds
    its TRANSPOSED one-hots from these rows directly, because Mosaic
    can neither transpose in-kernel nor concat ref slices whose offsets
    differ ("offset mismatch on non-concat dimension").  The kernel
    loops only the ``nblk`` leading blocks, so a sparsely-loaded table
    costs nact, not capacity.  ``fallback``: an active spring's anchor
    was overflow-dropped (slot >= capP — the bead never made it into
    the grid): nblk is forced to 0 and the caller must route springs
    through the XLA exf planes with single-step launches.
    Returns (tab, tabT, bases, nblk, nwin, fallback)."""
    from .pallas_step import EX_BLOCK, ex_window

    WN = ex_window(P)
    act = ex_left >= 0
    in_grid = (exl_slot < capP) & (exr_slot < capP)
    fallback = jnp.any(act & ~in_grid)
    ok = act & in_grid
    if near_mask is not None:
        # near springs ride the fused stencil (pallas_step near_ex);
        # the table carries only the stencil-invisible remainder
        ok = ok & ~near_mask
    e = ok.shape[0]
    idx = jnp.where(ok, size=e, fill_value=0)[0]
    nok = jnp.sum(ok.astype(jnp.int32))
    live = jnp.arange(e, dtype=jnp.int32) < nok
    sl = jnp.where(live, exl_slot[idx], 0)
    sr = jnp.where(live, exr_slot[idx], 0)
    if WN > 0:
        # v5 lane-sort: windowable springs (own span fits the window
        # with alignment slack) first by min lane, then the rest, then
        # padding — a stable key so rebuild-to-rebuild order is
        # deterministic
        cmin = jnp.minimum(sl % P, sr % P)
        cmax = jnp.maximum(sl % P, sr % P)
        sp_win = (cmax - cmin) <= (WN - 128)
        key = jnp.where(live,
                        jnp.where(sp_win, cmin, cmin + (1 << 24)),
                        jnp.int32((1 << 30)))
        order = jnp.argsort(key, stable=True)
        sl, sr, live = sl[order], sr[order], live[order]
    okf = (live & ~fallback).astype(jnp.int32)

    def pad_blocks(a):
        # (e,) -> (epad,) -> (nblk_cap, W)
        if epad - e:
            a = jnp.concatenate(
                [a, jnp.zeros((epad - e,), jnp.int32)])
        return a.reshape(epad // EX_BLOCK, EX_BLOCK)

    nblk_cap = epad // EX_BLOCK
    z = jnp.zeros((nblk_cap, 2 * EX_BLOCK), jnp.int32)
    # per-block [lefts; rights] stacking on the row axis
    rowf = jnp.concatenate(
        [pad_blocks(sl // P), pad_blocks(sr // P)], axis=1)
    colf = jnp.concatenate(
        [pad_blocks(sl % P), pad_blocks(sr % P)], axis=1)
    actf = jnp.concatenate([pad_blocks(okf), pad_blocks(okf)], axis=1)
    nblk = jnp.where(fallback, 0, -(-nok // EX_BLOCK)).astype(jnp.int32)
    bases = jnp.zeros((nblk_cap,), jnp.int32)
    nwin = jnp.zeros((), jnp.int32)
    if WN > 0:
        # block windowability: every anchor (incl. inactive padding,
        # whose col is 0 — masked out of the span by actb) within
        # WN of the 128-aligned block base
        actb = actf > 0
        bmin = jnp.min(jnp.where(actb, colf, jnp.int32(P)), axis=1)
        bmax = jnp.max(jnp.where(actb, colf, 0), axis=1)
        base = jnp.clip(bmin // 128, 0, (P - WN) // 128)
        has = jnp.any(actb, axis=1)
        bidx = jnp.arange(nblk_cap, dtype=jnp.int32)
        blk_win = (has & (bidx < nblk)
                   & ((bmax - base * 128) <= (WN - 1)))
        # permute windowed blocks to the front (stable)
        bkey = jnp.where(bidx < nblk,
                         jnp.where(blk_win, 0, 1), jnp.int32(2))
        border = jnp.argsort(bkey, stable=True)
        rowf, colf, actf = rowf[border], colf[border], actf[border]
        base, blk_win = base[border], blk_win[border]
        nwin = jnp.sum(blk_win.astype(jnp.int32))
        # windowed blocks store window-RELATIVE cols
        colf = jnp.where(blk_win[:, None], colf - base[:, None] * 128,
                         colf)
        bases = jnp.where(blk_win, base, 0).astype(jnp.int32)
    tab = jnp.stack(
        [rowf, colf, actf, z, z, z, z, z], axis=2
    ).reshape(2 * epad, 8)
    tabT = jnp.stack(
        [rowf, colf, actf, z, z, z, z, z], axis=1
    ).reshape(-1, 2 * EX_BLOCK)
    return tab, tabT, bases, nblk, nwin, fallback


def _halo_refresh(gx, maps: _FastMaps):
    """Refresh halo columns of the position planes — Comm::forward_comm's
    analog — as SIX MASKED ROLLS (z -> y -> x; edges/corners compose by
    sequential application, bit-exact vs the src_cols gather).

    Round 5: the original static column gather cost 21.0 ms/step on the
    1M planes vs 1.45 ms for the rolls (probe_1m_components, 2026-08-20)
    — random-index gathers are the most expensive primitive on this part
    (2.5-8 ms per million elements, CLAUDE.md) while rolls are dense
    lane shifts.  Under GSPMD the rolls also lower to collective
    permutes of boundary slabs instead of a gather all-to-all.  The
    lane-padding tail keeps its _FAR fill (rebuild scatters it; no face
    mask covers it), which preserves the no-fake-pairs sentinel."""
    aux = jnp.asarray(maps.halo_aux)
    a = gx
    for axis in (2, 1, 0):
        s_lo, s_hi = maps.halo_roll[axis]
        m_lo = aux[2 * axis]
        m_hi = aux[2 * axis + 1]
        keep = 1.0 - m_lo - m_hi
        sh = jnp.zeros((3, 1, 1), a.dtype).at[axis, 0, 0].set(
            jnp.asarray(maps.box[axis], a.dtype))
        lo = (jnp.roll(a, s_lo, axis=-1) - sh) * m_lo
        hi = (jnp.roll(a, s_hi, axis=-1) + sh) * m_hi
        a = a * keep + lo + hi
    return a


def _halo_refresh_int(ints, maps: _FastMaps):
    """Masked-roll halo refresh for stacked int planes (bid/hn/pid at
    rebuild): same composition as _halo_refresh without the ghost-image
    coordinate shift."""
    aux = maps.halo_aux
    a = ints
    for axis in (2, 1, 0):
        s_lo, s_hi = maps.halo_roll[axis]
        m_lo = jnp.asarray(aux[2 * axis] > 0.5)
        m_hi = jnp.asarray(aux[2 * axis + 1] > 0.5)
        a = jnp.where(m_lo, jnp.roll(a, s_lo, axis=-1), a)
        a = jnp.where(m_hi, jnp.roll(a, s_hi, axis=-1), a)
    return a


# ---------------------------------------------------------------------------
# the fused pair+bond kernel


def _shift_minor(a, delta, fill):
    if delta == 0:
        return a
    pad = jnp.full(a.shape[:-1] + (abs(delta),), fill, a.dtype)
    if delta > 0:
        return jnp.concatenate([a[..., delta:], pad], axis=-1)
    return jnp.concatenate([pad, a[..., :delta]], axis=-1)


def make_kernel(system: System, maps: _FastMaps, ex_btype: int):
    """Fused LJ + FENE + exclusion kernel over the full 27-offset stencil.

    Full stencil (no Newton) so every interior slot accumulates its complete
    force locally — no reaction fold-back pass exists.  Per pair slot:
      bonded  <- |bid_i - bid_j| == 1 and the chain link exists
      excl    <- bonded or bid_j == extruder_partner(i)
      LJ      <- in-cutoff, not excluded          (pair_lj_cut.cpp:68-141)
      FENE+WCA<- bonded                           (bond_fene.cpp:52-128)
    Energies are half-counted (each pair seen from both sides).  Also
    counts the bonded pairs found so a bond drifting outside the stencil
    reach raises FLAG_BOND_REACH instead of silently losing its force.
    """
    dtype = jnp.dtype(system.dtype)
    n = system.n
    cap, P = maps.cap, maps.P
    sx, sy, sz = maps.strides
    lj1, lj2, lj3, lj4, cutsq, offe, floorsq = (
        t[0, 0] for t in _lj_tables(system, dtype)
    )
    bts = np.asarray(system.backbone_type)
    used = bts[bts >= 0]
    if used.size:
        kf, r0f, epsf, sigf = (
            float(c) for c in np.asarray(system.bonds.coeffs)[used[0]]
        )
    else:
        kf = r0f = epsf = sigf = 0.0
    r0sq = r0f * r0f
    inv_r0sq = 1.0 / r0sq if r0sq else 0.0
    wca_cutsq = 2.0 ** (1.0 / 3.0) * sigf * sigf
    wca_floorsq = 0.5625 * sigf * sigf
    # Kremer-Grest work-share (see pallas_step.make_step_kernel): when the
    # FENE bond's (sigma, epsilon) equal the LJ pair's, the WCA term IS
    # the LJ force polynomial — one merged chain, bitwise identical to the
    # split form (0/1-weight products distribute exactly)
    # (compare in numpy — `floorsq` above may be a tracer when the system
    # pytree rides through jit; _RSQ_FLOOR_FRAC == the 0.5625 WCA floor
    # fraction, so equal sigmas imply equal floors)
    wca_is_lj = bool(
        kf != 0.0
        and system.pair is not None
        and sigf == float(np.asarray(system.pair.sigma).flat[0])
        and epsf == float(np.asarray(system.pair.epsilon).flat[0])
        and _RSQ_FLOOR_FRAC == 0.5625
    )
    # blast shield: a legitimate bonded pair inside the +-1 stencil is
    # always shorter than 2 cells; anything longer is a frame/wrap artifact
    # and must degrade to a *flagged missing bond* (FLAG_BOND_REACH via the
    # nb_found balance below), never a clamped-FENE force over a phantom
    # box-length displacement
    bond_reach_sq = (2.0 * system.neighbor.cell_size) ** 2
    interior = jnp.asarray(maps.interior)

    def kernel(gx, bid, hn, pid, energy: bool):
        X, Y, Z = gx[0], gx[1], gx[2]
        int_i = interior[None, None, :].astype(dtype)  # (1,1,P) i-column mask
        # chain-code plane (see pallas_step): u1 = bid+1 where the slot
        # has a chain-next link, else a never-matching sentinel
        u1 = jnp.where(hn, bid + 1, n + 2)
        xi = X[:, None, :]
        yi = Y[:, None, :]
        zi = Z[:, None, :]
        bi = bid[:, None, :]
        u1i = u1[:, None, :]
        pi = pid[:, None, :]

        fx = jnp.zeros((cap, P), dtype)
        fy = jnp.zeros((cap, P), dtype)
        fz = jnp.zeros((cap, P), dtype)
        e_lj = jnp.zeros((), dtype)
        e_b = jnp.zeros((), dtype)
        nb_found = jnp.zeros((), dtype)
        n_clamp = jnp.zeros((), dtype)

        for (a, b, c) in _OFFSETS:
            delta = a * sx + b * sy + c * sz
            xj = _shift_minor(X, delta, _FAR)[None, :, :]
            yj = _shift_minor(Y, delta, _FAR)[None, :, :]
            zj = _shift_minor(Z, delta, _FAR)[None, :, :]
            bj = _shift_minor(bid, delta, n)[None, :, :]
            u1j = _shift_minor(u1, delta, n + 2)[None, :, :]

            dx = xi - xj
            dy = yi - yj
            dz = zi - zj
            rsq = dx * dx + dy * dy + dz * dz
            nz_pair = rsq > 0.0

            # u1 encodes (bid+1, has-next); a self pair can never match
            bonded = (bj == u1i) | (bi == u1j)
            in_cut = rsq < cutsq
            if kf != 0.0:
                in_reach = rsq < bond_reach_sq
                w_b_m = bonded & in_reach
            lj_ok = (in_cut & nz_pair) & (~bonded) & (bj != pi)
            if wca_is_lj:
                pair_ok = lj_ok | (w_b_m & (rsq < wca_cutsq))
                rsq_den = jnp.maximum(
                    jnp.where(pair_ok, rsq, jnp.ones_like(rsq)), floorsq)
                w12 = jnp.where(pair_ok, int_i, jnp.zeros_like(rsq))
            else:
                bonded_nz = bonded & nz_pair
                rsq_den = jnp.where(
                    bonded_nz,
                    jnp.maximum(rsq, wca_floorsq),
                    jnp.maximum(
                        jnp.where(in_cut & nz_pair, rsq,
                                  jnp.ones_like(rsq)),
                        floorsq),
                )
                w12 = jnp.where(lj_ok, int_i, jnp.zeros_like(rsq))
            r2 = 1.0 / rsq_den
            r6 = r2 * r2 * r2
            ffac = r6 * (lj1 * r6 - lj2) * r2 * w12
            if energy:
                w_lj = (jnp.where(lj_ok, int_i, jnp.zeros_like(rsq))
                        if wca_is_lj else w12)

            if kf != 0.0:
                w_b = jnp.where(w_b_m, int_i, jnp.zeros_like(rsq))
                rsq_b = jnp.where(bonded, rsq, jnp.ones_like(rsq))
                rlog = 1.0 - rsq_b * inv_r0sq
                cl = rlog < 0.1
                rlog = jnp.maximum(rlog, jnp.asarray(0.1, dtype))
                fb = -kf / rlog
                sr2 = (sigf * sigf) * r2
                sr6 = sr2 * sr2 * sr2
                if not wca_is_lj:
                    wca = rsq_b < wca_cutsq
                    fb = fb + jnp.where(
                        wca, 48.0 * epsf * sr6 * (sr6 - 0.5) * r2, 0.0
                    )
                ffac = ffac + fb * w_b
                nb_found = nb_found + jnp.sum(w_b)
                n_clamp = n_clamp + jnp.sum(jnp.where(cl, w_b, 0.0))
                if energy:
                    wca_e = rsq_b < wca_cutsq
                    eb = -0.5 * kf * r0sq * jnp.log(rlog) + jnp.where(
                        wca_e, 4.0 * epsf * sr6 * (sr6 - 1.0) + epsf, 0.0
                    )
                    e_b = e_b + 0.5 * jnp.sum(eb * w_b)

            fx = fx + jnp.sum(dx * ffac, axis=1)
            fy = fy + jnp.sum(dy * ffac, axis=1)
            fz = fz + jnp.sum(dz * ffac, axis=1)
            if energy:
                el = (r6 * (lj3 * r6 - lj4) - offe) * w_lj
                e_lj = e_lj + 0.5 * jnp.sum(el)

        gf = jnp.stack([fx, fy, fz])
        # each backbone bond must appear exactly twice (both directions);
        # count interior-i sightings of links whose smaller-id end is
        # interior — conservative: compare to interior link count
        n_links = jnp.sum(
            jnp.where(interior[None, :] & (bid < n), hn, False)
        ).astype(dtype)
        reach = jnp.where(
            0.5 * nb_found < n_links - 0.5,
            jnp.uint32(FLAG_BOND_REACH), jnp.uint32(0),
        )
        # sightings are double-counted (full stencil): /2 gives bond events
        clamps = (0.5 * n_clamp).astype(jnp.int32)
        fl = reach | jnp.where(
            clamps > 0, jnp.uint32(FLAG_FENE_CLAMP), jnp.uint32(0)
        )
        return gf, e_lj, e_b, fl, clamps

    return kernel


def whole_planes_fit(maps: _FastMaps) -> bool:
    """Whole-plane VMEM residency gate for the fused whole-step kernel.

    The honest envelope is EMPIRICAL: at the hardware-proven bench point
    (cap 9, P 33664 = 100k beads) the compiled kernel uses 127.0 MB of
    the 128 MB v5e VMEM — planes (~27x), stencil temporaries (~20 8-row
    slabs), and the spring-pass masks all scale with cap*P, so the
    proven point IS the ceiling (a 200k-bead grid OOM'd the scoped
    allocator on hardware 2026-08-19 even though a planes-only estimate
    said it fit).  Past it the XLA chain + blocked Pallas stencil take
    over (select_kernel)."""
    return maps.cap * maps.P <= 9 * 33664


def select_kernel(system: System, maps: _FastMaps, ex_btype: int):
    """Pick the stencil-kernel backend: the Pallas VMEM-resident kernel on
    TPU f32 (LLE_FAST_PALLAS=0 opts out), the XLA chain elsewhere.  Both
    are physics-identical (tests/test_pallas_kernel.py pins equality)."""
    import os

    # opt-IN until the on-hardware run is validated: the first TPU
    # execution hung on device (suspected DMA wait deadlock) even though
    # interpret-mode equality passes — do not make unproven kernels the
    # default for the driver's bench
    if (
        os.environ.get("LLE_FAST_PALLAS", "0") == "1"
        and jnp.dtype(system.dtype) == jnp.float32
        and jax.default_backend() == "tpu"
    ):
        from .pallas_kernel import make_pallas_kernel

        return make_pallas_kernel(system, maps, ex_btype)
    if (
        os.environ.get("LLE_BLOCKED", "1") == "1"
        and jnp.dtype(system.dtype) == jnp.float32
        and jax.default_backend() == "tpu"
        and not whole_planes_fit(maps)
    ):
        # past the whole-plane residency cliff (million-bead grids) the
        # fused whole-step kernel can't run and the XLA chain takes over
        # stepping — but its stencil (the dominant cost) rides the
        # layer-blocked Pallas kernel, the KOKKOS full-residency model's
        # TPU analog (SURVEY §2.3; VERDICT r3 missing #1)
        from .blocked_kernel import make_blocked_kernel

        return make_blocked_kernel(system, maps, ex_btype)
    return make_kernel(system, maps, ex_btype)


def make_extruder_pass(system: System, maps: _FastMaps, ex_btype: int):
    """Extruder-spring forces straight on the planes.

    Two small data-dependent ops (one gather of the 2E anchor coordinates,
    one scatter-add of their forces) — extruder bonds are soft springs that
    routinely stretch beyond the one-cell stencil reach, so they cannot
    ride the dense kernel (bond_harmonic.cpp:48-80 semantics).
    """
    if ex_btype <= 0:
        return None
    dtype = jnp.dtype(system.dtype)
    cap, P = maps.cap, maps.P
    capP = cap * P
    style = int(system.bonds.style[ex_btype - 1])
    kh, r0h, epsh, sigh = (
        float(c) for c in np.asarray(system.bonds.coeffs)[ex_btype - 1]
    )
    box = np.asarray(system.box_size)

    def ex_pass(gx, gf, exl_slot, exr_slot, active, energy: bool):
        e = exl_slot.shape[0]
        sl = jnp.where(active, exl_slot, 0)
        sr = jnp.where(active, exr_slot, 0)
        idx = jnp.concatenate(
            [sl + k * capP for k in range(3)]
            + [sr + k * capP for k in range(3)]
        )
        pos = gx.reshape(-1)[idx]
        xl = pos[:3 * e].reshape(3, e)
        xr = pos[3 * e:].reshape(3, e)
        d = xl - xr
        d = d - jnp.asarray(box, dtype)[:, None] * jnp.round(
            d / jnp.asarray(box, dtype)[:, None]
        )
        rsq = jnp.maximum(jnp.sum(d * d, axis=0), 1e-12)
        if style == BOND_HARMONIC:
            r = jnp.sqrt(rsq)
            dr = r - r0h
            fb = -2.0 * kh * dr / r
            eb = kh * dr * dr
        else:  # FENE extruder bond
            rlog = jnp.maximum(1.0 - rsq / (r0h * r0h), 0.1)
            fb = -kh / rlog
            rsq_w = jnp.maximum(rsq, 0.5625 * sigh * sigh)
            sr2 = sigh * sigh / rsq_w
            sr6 = sr2 * sr2 * sr2
            wca = rsq < 2.0 ** (1.0 / 3.0) * sigh * sigh
            fb = fb + jnp.where(wca, 48.0 * epsh * sr6 * (sr6 - 0.5) / rsq_w,
                                0.0)
            eb = -0.5 * kh * r0h * r0h * jnp.log(rlog) + jnp.where(
                wca, 4.0 * epsh * sr6 * (sr6 - 1.0) + epsh, 0.0
            )
        am = active.astype(dtype)
        fvec = d * (fb * am)[None, :]        # force on left anchor
        vals = jnp.concatenate(
            [fvec[k] for k in range(3)] + [-fvec[k] for k in range(3)]
        )
        gf = gf.reshape(-1).at[idx].add(vals).reshape(3, cap, P)
        ebond = jnp.sum(eb * am) if energy else jnp.zeros((), dtype)
        return gf, ebond

    return ex_pass


# ---------------------------------------------------------------------------
# counter-based RNG (threefry2x32) for in-grid Langevin noise


_TF_ROT = (13, 15, 26, 6, 17, 29, 16, 24)


def _threefry2x32(k0, k1, c0, c1):
    """Reference threefry2x32 (Salmon et al. 2011), 20 rounds, on uint32
    arrays.  Counter-based so halo copies of a bead would draw identical
    noise (the replacement for RanMars per-atom streams,
    src/random_mars.cpp:81)."""
    ks2 = k0 ^ k1 ^ jnp.uint32(0x1BD11BDA)
    ks = (k0, k1, ks2)
    x0 = c0 + k0
    x1 = c1 + k1
    for i in range(5):
        for j in range(4):
            r = _TF_ROT[4 * (i % 2) + j]
            x0 = x0 + x1
            x1 = (x1 << r) | (x1 >> (32 - r))
            x1 = x1 ^ x0
        x0 = x0 + ks[(i + 1) % 3]
        x1 = x1 + ks[(i + 2) % 3] + jnp.uint32(i + 1)
    return x0, x1


def _key_words(key):
    """(k0, k1) uint32 from either a typed PRNG key or a raw (2,) array."""
    kd = key
    if jnp.issubdtype(jnp.asarray(kd).dtype, jax.dtypes.prng_key):
        kd = jax.random.key_data(kd)
    kd = jnp.asarray(kd).astype(jnp.uint32).reshape(-1)
    return kd[0], kd[1]


def _uniform3(key, bid, sstep, dtype):
    """Three (cap, P) uniform [0,1) planes keyed by (key, step, bead)."""
    k0, k1 = _key_words(key)
    c0 = bid.astype(jnp.uint32)
    base = (sstep.astype(jnp.uint32)) * jnp.uint32(4)
    us = []
    scale = jnp.asarray(1.0 / 16777216.0, dtype)
    for comp in range(3):
        x0, _ = _threefry2x32(k0, k1, c0, base + jnp.uint32(comp))
        us.append((x0 >> 8).astype(dtype) * scale)
    return jnp.stack(us)


# ---------------------------------------------------------------------------
# conversion


def _lan_member(sim, groups):
    """(N,) bool Langevin-group membership, or None for group-all.

    ``groups``: the deck's name -> (N,) bool dict; required when the
    Simulation's Langevin fix names a group (fix_langevin.cpp groupbit)."""
    from ..fixes.config import Langevin as _Lan

    for f in sim.fixes:
        if isinstance(f, _Lan) and f.group is not None:
            if not groups or f.group not in groups:
                raise ValueError(
                    f"fix langevin group {f.group!r} needs the deck's "
                    "group masks (pass groups= to run_fast/to_fast)")
            return np.asarray(groups[f.group], bool)
    return None


def _lgm_plane(member, slot_of, maps, dtype):
    """Scatter (N,) membership to a (cap, P) 0/1 plane (rebuild-time
    only — never in the per-step hot path)."""
    capP = maps.cap * maps.P
    slot = jnp.clip(slot_of, 0, capP - 1)
    flat = jnp.zeros((capP,), dtype).at[slot].set(
        jnp.asarray(member, dtype))
    return flat.reshape(maps.cap, maps.P)


def to_fast(state: State, sim, groups=None) -> FastState:
    """Convert a bead-layout State (post-setup or fresh) to grid residency
    and evaluate initial forces/energies (Verlet::setup analog)."""
    system = sim.system
    maps = fast_maps(system)
    (gx, gv, _, bid, hn, pid, slot_of, exl, exr, x, img, overflow) = _place(
        system, maps, state.x, state.v, state.f, state.type, state.ex_left,
        state.ex_right, state.img,
    )
    member = _lan_member(sim, groups)
    lgm = (None if member is None
           else _lgm_plane(member, slot_of, maps, jnp.dtype(system.dtype)))
    kernel = select_kernel(system, maps, sim.ex_btype)
    gf, e_lj, e_b, kfl, clamps = kernel(gx, bid, hn, pid, True)
    ex_pass = make_extruder_pass(system, maps, sim.ex_btype)
    if ex_pass is not None:
        gf, eb2 = ex_pass(gx, gf, exl, exr, state.ex_left >= 0, True)
        e_b = e_b + eb2
    tab, tabT, bases, nblk, nwin, ex_fb = _ex_block_table(
        exl, exr, state.ex_left, maps.cap * maps.P, maps.P, maps.cap,
        _ex_epad(system),
        near_mask=_near_spring_mask(system, sim.ex_btype, maps, exl, exr,
                                    state.ex_left, state.ex_right))
    return FastState(
        gx=gx, gv=gv, gf=gf, gx_ref=gx, bid=bid, hn=hn, pid=pid,
        slot_of=slot_of, exl_slot=exl, exr_slot=exr,
        types=state.type, img=img,
        ex_left=state.ex_left, ex_right=state.ex_right,
        key=state.key, step=state.step,
        flags=state.flags | overflow | kfl,
        epair=e_lj, ebond=e_b,
        n_moves=state.n_moves, n_loads=state.n_loads,
        n_unloads=state.n_unloads,
        n_clamps=jnp.zeros((), jnp.int32) + clamps,
        last_event=state.last_event,
        skin_pend=jnp.zeros((), jnp.int32),
        n_rebuilds=jnp.zeros((), jnp.int32),
        n_launches=jnp.zeros((), jnp.int32),
        ex_tab=tab, ex_tabT=tabT, ex_bases=bases, ex_nblk=nblk,
        ex_nwin=nwin, ex_fb=ex_fb,
        lgm=lgm,
    )


def _extract_beads(fs: FastState, system: System):
    """(x, v, f) bead-layout arrays — one flat gather for 9 components."""
    maps = fast_maps(system)
    capP = maps.cap * maps.P
    slot = jnp.clip(fs.slot_of, 0, capP - 1)
    idx = jnp.concatenate([slot + k * capP for k in range(3)])
    n = system.n
    x = fs.gx.reshape(-1)[idx].reshape(3, n).T
    v = fs.gv.reshape(-1)[idx].reshape(3, n).T
    f = fs.gf.reshape(-1)[idx].reshape(3, n).T
    return x, v, f


def from_fast(fs: FastState, system: System) -> State:
    """Back to the bead-layout State (for thermo/dump/checkpoint/decks)."""
    x, v, f = _extract_beads(fs, system)
    return State(
        x=x, v=v, f=f, img=fs.img, type=fs.types,
        ex_left=fs.ex_left, ex_right=fs.ex_right,
        key=fs.key, step=fs.step, flags=fs.flags,
        epair=fs.epair, ebond=fs.ebond,
        n_moves=fs.n_moves, n_loads=fs.n_loads, n_unloads=fs.n_unloads,
        last_event=fs.last_event,
        therm_e=jnp.zeros((), x.dtype),  # tally is general-path only
        nbr=None,
    )


# ---------------------------------------------------------------------------
# thermo (no extraction needed)


def thermo_row_fast(fs: FastState, system: System):
    from ..integrate.verlet import ThermoSample

    maps = fast_maps(system)
    dtype = fs.gv.dtype
    mass = float(np.asarray(system.masses).flat[0])
    valid = (fs.bid < system.n) & jnp.asarray(maps.interior)[None, :]
    vv = jnp.sum(fs.gv * fs.gv, axis=0)
    ke2 = mass * jnp.sum(jnp.where(valid, vv, 0.0))
    dof = 3.0 * system.n - 3.0
    temp = ke2 / (dof * system.units.boltz)
    ke = 0.5 * ke2
    return ThermoSample(
        step=fs.step, temp=temp, epair=fs.epair, ebond=fs.ebond, ke=ke,
        etotal=ke + fs.epair + fs.ebond,
        n_extruders=jnp.sum(fs.ex_left >= 0).astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# the step


def _pallas_step_mode(system, pallas):
    """Resolve the step-core backend: 'real' (fused whole-step Pallas
    kernel, the TPU production default), 'interpret' (CPU tests), or None
    (the XLA chain).  LLE_PALLAS_STEP=0 opts out."""
    import os

    if pallas is not None:
        return pallas or None
    if os.environ.get("LLE_PALLAS_STEP", "1") == "0":
        return None
    if (jnp.dtype(system.dtype) == jnp.float32
            and jax.default_backend() == "tpu"):
        # whole-plane residency gate: past it the XLA chain takes over
        # stepping, with its stencil on the blocked Pallas kernel
        # (select_kernel)
        if not whole_planes_fit(fast_maps(system)):
            return None
        return "real"
    return None


def make_fast_segment(sim, thermo_every: int = 0, pallas=None,
                      reactive: bool = True, hot_window: int = None,
                      kernel_fn=None):
    """Build ``segment(fs, length) -> fs`` advancing ``length`` steps.

    Step gates (LE phases, rebuild cadence, energy cadence) key on the
    scalar ``fs.step``-derived counter threaded through the fori loop as an
    UNBATCHED scalar, so the function stays cond-friendly under vmap: call
    ``segment`` with a scalar ``step0`` when vmapping (see run_replicas).

    ``pallas``: None = auto (fused whole-step kernel on TPU f32, XLA chain
    elsewhere), False = XLA chain, "real"/"interpret" = force the fused
    kernel (interpret mode runs it on CPU for tests).
    """
    system = sim.system
    maps = fast_maps(system)
    dtype = jnp.dtype(system.dtype)
    n = system.n
    dt = sim.dt
    units = system.units
    dtf = 0.5 * dt * units.ftm2v
    mass = float(np.asarray(system.masses).flat[0])
    K = max(int(system.neighbor.rebuild_every), 1)
    energy_every = max(int(sim.energy_every), 1)
    if thermo_every and thermo_every % energy_every != 0:
        # keep thermo rows from reading stale energies (VERDICT r1 weak #8)
        energy_every = np.gcd(thermo_every, energy_every)

    # kernel_fn: caller-supplied stencil with make_kernel's contract
    # (the shard_map slab kernel, parallel/shard_step.py)
    kernel = kernel_fn or select_kernel(system, maps, sim.ex_btype)
    ex_pass = make_extruder_pass(system, maps, sim.ex_btype)

    langevin = [f for f in sim.fixes if isinstance(f, Langevin)]
    lf = langevin[0] if langevin else None

    event_fixes = [
        f for f in sim.fixes if isinstance(f, (Extrusion, ExLoad, ExUnload))
    ]
    event_updates = []
    for fid, f in enumerate(event_fixes):
        if isinstance(f, Extrusion):
            event_updates.append((f, fid, make_extrusion_update(system, f)))
        elif isinstance(f, ExLoad):
            event_updates.append((f, fid, make_ex_load_update(system, f)))
        else:
            event_updates.append((f, fid, make_ex_unload_update(system, f)))

    # half-skin displacement bound from the ACTUAL cell margin (the cell
    # edge is >= cutoff + requested skin and may exceed it through min_cell
    # or grid rounding — the coverage guarantee scales with the real
    # margin, reference: src/neighbor.cpp:1948 uses skin/2 of the real skin)
    min_edge = min(
        b / d for b, d in zip(
            system.box_size,
            (system.neighbor.nx, system.neighbor.ny, system.neighbor.nz),
        )
    )
    pp = system.pair
    max_cut = float(np.max(np.asarray(pp.cutoff))) if pp is not None else 0.0
    halfskin_sq = (0.5 * max(min_edge - max_cut, 1e-6)) ** 2
    capP = maps.cap * maps.P
    interior = jnp.asarray(maps.interior)
    # LE events rewire bonds: rebuild immediately afterwards like the
    # reference's next_reneighbor = ntimestep (fix_extrusion.cpp:797) —
    # the predicate stays a function of the scalar step, so it survives
    # vmap as a true cond.  Extrusion moves additionally snap the extruder
    # spring shut, overstretching backbone bonds behind the anchors for
    # ~one spring-contraction time; rebuild EVERY step for a window after
    # each extrusion event so the clamp-force transient cannot outrun the
    # half-skin budget (the displacement-triggered decide() would have
    # rebuilt there too, src/neighbor.cpp:1933).
    event_phases = [(f.nevery, f.phase) for f in event_fixes]
    # ``reactive`` mode is the decide()/check_distance analog
    # (src/neighbor.cpp:1933-1962): the skin monitor sets fs.skin_pend when
    # any bead's PREDICTED next-step displacement |d| + |v|*dt crosses
    # 0.85 * half-skin, and the NEXT step rebuilds (the one-step lag is
    # covered by the velocity lookahead itself).  The
    # static cadence K then only backstops; spring-snap transients after LE
    # events trigger their own rebuilds.  Under vmap a state-dependent cond
    # predicate degrades to a both-branch select (rebuild cost every step),
    # so vmapped/sharded callers pass reactive=False and get the pure
    # step-scalar cadence plus blanket post-event hot windows instead.
    hot_windows = [] if reactive else [
        (f.nevery, f.phase,
         hot_window if hot_window is not None
         else min(150, max(f.nevery // 4, 1)))
        for f in event_fixes if isinstance(f, Extrusion)
    ]

    def rebuild_due(sstep, fs=None):
        due = (sstep % K) == 0
        for nev, ph in event_phases:
            due = due | ((sstep % nev) == ph)
        for nev, ph, w in hot_windows:
            due = due | (((sstep - ph) % nev) < w)
        if reactive and fs is not None:
            due = due | (fs.skin_pend > 0)
        return due

    def occupancy(fs):
        return _partner_of(fs.ex_left, fs.ex_right, n) >= 0

    def apply_events(fs, sstep):
        """LE fixes (post_integrate stage) — bead-layout logic reused from
        the general path, then partner planes/slots refreshed in place."""
        for f, fid, update in event_updates:
            fire = (sstep % f.nevery) == f.phase
            kind = {Extrusion: 1, ExLoad: 2, ExUnload: 3}[type(f)]
            key = jax.random.fold_in(
                jax.random.fold_in(
                    jax.random.fold_in(fs.key, sstep), (kind << 20) + fid
                ),
                f.seed,
            )

            if isinstance(f, Extrusion):
                def do(fs, update=update, key=key):
                    x, _, _ = _extract_beads(fs, system)
                    l, r, nm, nrel = update(x, fs.types, fs.ex_left,
                                            fs.ex_right, occupancy(fs), key)
                    return _retable(fs, l, r, fs.types,
                                    n_moves=fs.n_moves + nm,
                                    n_unloads=fs.n_unloads + nrel,
                                    last_event=fs.last_event.at[0].set(nm))
            elif isinstance(f, ExLoad):
                def do(fs, update=update, key=key):
                    x, _, _ = _extract_beads(fs, system)
                    l, r, t, nc, fl = update(x, fs.types, fs.ex_left,
                                             fs.ex_right, occupancy(fs), key)
                    return _retable(fs, l, r, t,
                                    n_loads=fs.n_loads + nc,
                                    last_event=fs.last_event.at[1].set(nc),
                                    flags=fs.flags | fl)
            else:
                def do(fs, update=update, key=key):
                    x, _, _ = _extract_beads(fs, system)
                    l, r, nb = update(x, fs.ex_left, fs.ex_right, key)
                    return _retable(fs, l, r, fs.types,
                                    n_unloads=fs.n_unloads + nb,
                                    last_event=fs.last_event.at[2].set(nb))

            fs = jax.lax.cond(fire, do, lambda fs: fs, fs)
        return fs

    def _retable(fs, l, r, types, **kw):
        """Refresh partner plane + extruder slot lists after a table edit."""
        partner = _partner_of(l, r, n)
        pid_flat = jnp.full((capP,), -1, jnp.int32)
        # overflowed beads carry distinct slots >= capP (see _place): they
        # drop out of bounds here instead of clip-colliding at capP-1
        pid_flat = pid_flat.at[fs.slot_of].set(
            partner, mode="drop", unique_indices=True)
        pid = pid_flat.reshape(maps.cap, maps.P)
        pid = _halo_refresh_int(pid[None], maps)[0]
        exl, exr = _ex_slots(fs.slot_of, l, r)
        tab, tabT, bases, nblk, nwin, ex_fb = _ex_block_table(
            exl, exr, l, capP, maps.P, maps.cap, _ex_epad(system),
            near_mask=_near_spring_mask(system, sim.ex_btype, maps,
                                        exl, exr, l, r))
        return fs.replace(
            ex_left=l, ex_right=r, types=types, pid=pid,
            exl_slot=exl, exr_slot=exr,
            ex_tab=tab, ex_tabT=tabT, ex_bases=bases, ex_nblk=nblk,
            ex_nwin=nwin, ex_fb=ex_fb, **kw
        )

    def rebuild(fs):
        x, v, f = _extract_beads(fs, system)
        (gx, gv, gf, bid, hn, pid, slot_of, exl, exr, _, img,
         overflow) = _place(
            system, maps, x, v, f, fs.types, fs.ex_left, fs.ex_right, fs.img
        )
        tab, tabT, bases, nblk, nwin, ex_fb = _ex_block_table(
            exl, exr, fs.ex_left, capP, maps.P, maps.cap,
            _ex_epad(system),
            near_mask=_near_spring_mask(system, sim.ex_btype, maps,
                                        exl, exr, fs.ex_left,
                                        fs.ex_right))
        extra = {}
        if fs.lgm is not None:
            # re-place the Langevin-group plane: membership is per BEAD
            # (invariant), only slots moved — gather through the OLD
            # slots, scatter to the new (rebuild cadence only)
            member = fs.lgm.reshape(-1)[jnp.clip(fs.slot_of, 0, capP - 1)]
            extra["lgm"] = _lgm_plane(member, slot_of, maps, dtype)
        return fs.replace(
            gx=gx, gv=gv, gf=gf, gx_ref=gx, bid=bid, hn=hn, pid=pid,
            slot_of=slot_of, exl_slot=exl, exr_slot=exr, img=img,
            ex_tab=tab, ex_tabT=tabT, ex_bases=bases, ex_nblk=nblk,
            ex_nwin=nwin, ex_fb=ex_fb,
            flags=fs.flags | overflow,
            skin_pend=jnp.zeros((), jnp.int32),
            n_rebuilds=fs.n_rebuilds + 1,
            **extra,
        )

    def skin_check(fs):
        """Post-rebuild displacement monitor: sticky error flag on the
        PAIRWISE coverage bound — a pair can only be missed when the two
        largest displacements sum past the full skin margin
        (src/neighbor.cpp:1962 uses half-skin per atom; flagging
        single-bead half-skin exceedance would false-positive during the
        one-step reactive lag).  The reactive rebuild trigger itself
        lives at the END of the step (post final kick) so its lookahead
        uses THIS step's force — see step()."""
        d = fs.gx - fs.gx_ref
        valid = (fs.bid < n) & interior[None, :]
        dsq = jnp.where(valid, jnp.sum(d * d, axis=0), 0.0)
        m1 = jnp.max(dsq)
        m2 = jnp.max(jnp.where(dsq == m1, 0.0, dsq))
        bad = jnp.sqrt(m1) + jnp.sqrt(m2) > 2.0 * np.sqrt(halfskin_sq)
        fl = fs.flags | jnp.where(
            bad, jnp.uint32(FLAG_SKIN_VIOLATION), jnp.uint32(0))
        return fs.replace(flags=fl)

    def forces(fs, sstep):
        energy_on = (sstep % energy_every) == 0

        def with_e(fs):
            gf, el, eb, fl, ncl = kernel(fs.gx, fs.bid, fs.hn, fs.pid, True)
            if ex_pass is not None:
                gf, eb2 = ex_pass(fs.gx, gf, fs.exl_slot, fs.exr_slot,
                                  fs.ex_left >= 0, True)
                eb = eb + eb2
            finite = jnp.isfinite(el) & jnp.isfinite(eb)
            nf = jnp.where(finite, jnp.uint32(0), jnp.uint32(FLAG_NON_FINITE))
            return fs.replace(gf=gf, epair=el, ebond=eb,
                              flags=fs.flags | fl | nf,
                              n_clamps=fs.n_clamps + ncl)

        def no_e(fs):
            gf, el, eb, fl, ncl = kernel(fs.gx, fs.bid, fs.hn, fs.pid, False)
            if ex_pass is not None:
                gf, _ = ex_pass(fs.gx, gf, fs.exl_slot, fs.exr_slot,
                                fs.ex_left >= 0, False)
            return fs.replace(gf=gf, flags=fs.flags | fl,
                              n_clamps=fs.n_clamps + ncl)

        if energy_every == 1:
            return with_e(fs)
        return jax.lax.cond(energy_on, with_e, no_e, fs)

    def vmask(fs):
        return ((fs.bid < n) & interior[None, :]).astype(dtype)[None]

    def step(fs: FastState, sstep, run_begin, run_end) -> FastState:
        # Reactive mode services skin/cadence rebuilds BEFORE this step's
        # drift (a deliberate deviation from verlet.cpp:187-225, which
        # rebuilds post-integrate): a rebuild is a re-binning of the same
        # phase-space point, so its order is only semantic for LE-event
        # steps — and pre-drift servicing removes the one-step lag from
        # the reactive trigger, making "displacement since rebuild never
        # exceeds the 0.85*half-skin trigger point" a hard per-bead
        # invariant (two beads then sum under the 2*half-skin pairwise
        # coverage bound with lookahead-miss headroom to spare).
        if reactive:
            fs = jax.lax.cond(
                rebuild_due(sstep, fs), rebuild, lambda fs: fs, fs)
        valid = vmask(fs)

        # initial integrate: half kick + drift (fix_nve.cpp:64-103)
        gv = fs.gv + (dtf / mass) * fs.gf * valid
        gx = fs.gx + dt * gv * valid
        fs = fs.replace(gx=gx, gv=gv, step=sstep)

        # post integrate: LE fixes (fix_extrusion.cpp:256 et al.)
        if event_updates:
            fs = apply_events(fs, sstep)

        # neighbor maintenance (neighbor.cpp:1933 decide() analog):
        # LE-event steps rebuild at post-integrate/post-event positions
        # (verlet.cpp order); non-reactive mode keeps the legacy
        # post-integrate rebuild for every due step
        if reactive:
            ev_b = jnp.zeros((), bool)
            for nev, ph in event_phases:
                ev_b = ev_b | ((sstep % nev) == ph)
            fs = jax.lax.cond(ev_b, rebuild, lambda fs: fs, fs)
        else:
            fs = jax.lax.cond(
                rebuild_due(sstep, fs), rebuild, lambda fs: fs, fs)
        fs = skin_check(fs)
        valid = vmask(fs)  # slot layout may have changed

        # halo refresh (comm_brick.cpp:452 forward_comm analog)
        fs = fs.replace(gx=_halo_refresh(fs.gx, maps))

        # force evaluation
        fs = forces(fs, sstep)

        # post force: Langevin (fix_langevin.cpp:654-674).  The key folds
        # only the stream salt and seed — the STEP enters through the
        # threefry counter inside _uniform3 (base = step*4 + component),
        # so the stream is fully counter-based: the fused multi-step
        # kernel draws bitwise-identical noise for any launch batching.
        gf = fs.gf
        if lf is not None:
            key = jax.random.fold_in(
                jax.random.fold_in(fs.key, (4 << 20)),
                lf.seed,
            )
            # t_start -> t_stop ramp over the run (fix_langevin.cpp:97-145:
            # delta = (ntimestep - beginstep) / (endstep - beginstep))
            span = jnp.maximum((run_end - run_begin).astype(dtype), 1.0)
            frac = jnp.clip(
                (sstep - run_begin).astype(dtype) / span, 0.0, 1.0
            )
            t_target = jnp.asarray(lf.t_start, dtype) + frac * (
                jnp.asarray(lf.t_stop, dtype) - jnp.asarray(lf.t_start, dtype)
            )
            gamma1 = -mass / lf.damp / units.ftm2v
            # python float, not np.float64: a strong numpy scalar would
            # promote the f32 planes to f64 under jax_enable_x64
            gamma2 = float(
                np.sqrt(mass)
                * np.sqrt(24.0 * units.boltz / (lf.damp * dt) / units.mvv2e)
                / units.ftm2v
            ) * jnp.sqrt(t_target)
            noise = _uniform3(key, fs.bid, sstep, dtype) - 0.5
            # group: membership plane rebuilt with the grid (fs.lgm);
            # zero: random-force sum adjusted to zero over the group each
            # step (fix_langevin.cpp zeroflag post_force end) — the mean
            # subtracts from noise BEFORE the group mask so only members
            # feel it, exactly the reference's second pass
            w_lan = valid if fs.lgm is None else valid * fs.lgm[None]
            if lf.zero:
                if fs.lgm is None:
                    inv_cnt = 1.0 / n
                else:
                    inv_cnt = 1.0 / jnp.maximum(jnp.sum(fs.lgm), 1.0)
                noise = noise - jnp.sum(
                    noise * w_lan, axis=(1, 2), keepdims=True) * inv_cnt
            gf = gf + (gamma1 * fs.gv + gamma2 * noise) * w_lan

        # final integrate: half kick (fix_nve.cpp:108-140)
        gv = fs.gv + (dtf / mass) * gf * valid
        if not reactive:
            return fs.replace(gv=gv, gf=gf)
        # reactive rebuild trigger with PER-BEAD lookahead, mirroring the
        # in-kernel monitor BIT-FOR-BIT (pallas_step step_body tail): the
        # trigger is served next step, so predict the next drift EXACTLY
        # — dt * |v(t+dt) + kick*f_new| with THIS step's total force
        # (an earlier variant used the stale pre-step force one half-kick
        # short, which under-predicted post-LE-event spring snaps and
        # could flag 0x4 / desync the two engines' rebuild schedules)
        d = fs.gx - fs.gx_ref
        vmask_b = (fs.bid < n) & interior[None, :]
        dsq = jnp.where(vmask_b, jnp.sum(d * d, axis=0), 0.0)
        vn = gv + (dtf / mass) * gf
        vsq = jnp.where(vmask_b, jnp.sum(vn * vn, axis=0), 0.0)
        pred = jnp.max(jnp.sqrt(dsq) + dt * jnp.sqrt(vsq))
        return fs.replace(gv=gv, gf=gf, skin_pend=jnp.where(
            pred > 0.85 * np.sqrt(halfskin_sq), 1, 0).astype(jnp.int32))

    # ---- fused whole-step Pallas core (one device launch per step) ----
    mode = _pallas_step_mode(system, pallas)
    if mode:
        from .pallas_step import make_step_kernel

        kernels = {
            e: make_step_kernel(
                system, maps, sim.ex_btype, dt=dt, langevin=lf, energy=e,
                interpret=(mode == "interpret"))
            for e in (False, True)
        }
        style_ex = (int(system.bonds.style[sim.ex_btype - 1])
                    if sim.ex_btype > 0 else -1)
        if sim.ex_btype > 0:
            khe, r0he, epshe, sighe = (
                float(c)
                for c in np.asarray(system.bonds.coeffs)[sim.ex_btype - 1]
            )
        box_d = jnp.asarray(np.asarray(system.box_size), dtype)
        zero_planes = jnp.zeros((3, maps.cap, maps.P), dtype)

        def ex_force_planes(fs, do_drift, mask=None):
            """Extruder spring forces as dense planes + bond energy.

            Anchor positions are advanced by the SAME half-kick+drift the
            kernel will apply (scaled by ``do_drift``), so the spring acts
            on this step's x exactly like make_extruder_pass does.
            ``mask``: optional subset restriction (None = all active).
            """
            if sim.ex_btype <= 0:
                return zero_planes, jnp.zeros((), dtype)
            active = fs.ex_left >= 0 if mask is None else mask
            e = fs.exl_slot.shape[0]
            sl = jnp.where(active, fs.exl_slot, 0)
            sr = jnp.where(active, fs.exr_slot, 0)
            idx = jnp.concatenate(
                [sl + k * capP for k in range(3)]
                + [sr + k * capP for k in range(3)]
            )
            pos = fs.gx.reshape(-1)[idx]
            vel = fs.gv.reshape(-1)[idx]
            frc = fs.gf.reshape(-1)[idx]
            df = do_drift.astype(dtype)
            pos = pos + (df * dt) * (vel + (dtf / mass) * frc)
            xl = pos[:3 * e].reshape(3, e)
            xr = pos[3 * e:].reshape(3, e)
            d = xl - xr
            d = d - box_d[:, None] * jnp.round(d / box_d[:, None])
            rsq = jnp.maximum(jnp.sum(d * d, axis=0), 1e-12)
            if style_ex == BOND_HARMONIC:
                r = jnp.sqrt(rsq)
                dr = r - r0he
                fb = -2.0 * khe * dr / r
                eb = khe * dr * dr
            else:
                rlog = jnp.maximum(1.0 - rsq / (r0he * r0he), 0.1)
                fb = -khe / rlog
                rsq_w = jnp.maximum(rsq, 0.5625 * sighe * sighe)
                sr2 = sighe * sighe / rsq_w
                sr6 = sr2 * sr2 * sr2
                wca = rsq < 2.0 ** (1.0 / 3.0) * sighe * sighe
                fb = fb + jnp.where(
                    wca, 48.0 * epshe * sr6 * (sr6 - 0.5) / rsq_w, 0.0)
                eb = -0.5 * khe * r0he * r0he * jnp.log(rlog) + jnp.where(
                    wca, 4.0 * epshe * sr6 * (sr6 - 1.0) + epshe, 0.0)
            am = active.astype(dtype)
            fvec = d * (fb * am)[None, :]
            vals = jnp.concatenate(
                [fvec[k] for k in range(3)] + [-fvec[k] for k in range(3)]
            )
            exf = jnp.zeros((3 * capP,), dtype).at[idx].add(vals)
            return exf.reshape(3, maps.cap, maps.P), jnp.sum(eb * am)

        def pre_skin_check(fs):
            # a violation whose first exceedance lands ON a boundary step
            # would be wiped by the rebuild before the kernel's monitor
            # sees it — check the drifted positions here first (pairwise
            # coverage bound, see skin_check)
            valid = (fs.bid < n) & interior[None, :]
            gv1 = fs.gv + (dtf / mass) * fs.gf * vmask(fs)
            gx1 = fs.gx + dt * gv1 * vmask(fs)
            d = gx1 - fs.gx_ref
            dsq = jnp.where(valid, jnp.sum(d * d, axis=0), 0.0)
            m1 = jnp.max(dsq)
            m2 = jnp.max(jnp.where(dsq == m1, 0.0, dsq))
            bad = jnp.sqrt(m1) + jnp.sqrt(m2) > 2.0 * np.sqrt(halfskin_sq)
            return fs.replace(
                gx=gx1, gv=gv1,
                flags=fs.flags | jnp.where(
                    bad, jnp.uint32(FLAG_SKIN_VIOLATION), jnp.uint32(0)))

        def launch_pallas(fs: FastState, sstep, limit, run_begin, run_end):
            """One device launch executing steps sstep..sstep+d-1 where
            d <= limit (the in-kernel reactive trigger stops early).  The
            FIRST step's boundary work (events, rebuild) runs in XLA; the
            caller guarantees no later step of the launch is a boundary
            (see the cadence-distance cap in ``segment``).  Returns
            (fs, d)."""
            # skin/cadence rebuilds are serviced BEFORE this step's drift
            # (see the XLA chain's `step` for why: it makes the 0.85 *
            # half-skin trigger point a hard per-bead displacement
            # invariant); event steps ALSO rebuild here so the event's
            # own pre_skin_check window is one step deep
            fs = jax.lax.cond(
                rebuild_due(sstep, fs), rebuild, lambda f: f, fs)

            ev_b = jnp.zeros((), bool)
            for nev, ph in event_phases:
                ev_b = ev_b | ((sstep % nev) == ph)

            def slow_pre(fs):
                # XLA does this step's half-kick + drift so LE events and
                # the post-event rebuild see post-integrate positions
                # (verlet.cpp order), then the kernel runs with drift
                # flagged off
                fs = pre_skin_check(fs)
                fs = fs.replace(step=sstep)
                if event_updates:
                    fs = apply_events(fs, sstep)
                return rebuild(fs)

            fs = jax.lax.cond(
                ev_b, slow_pre, lambda f: f.replace(step=sstep), fs)
            do_drift = ~ev_b

            if sim.ex_btype > 0:
                # the kernel's block spring pass covers every active
                # spring each step from the CACHED tables (refreshed at
                # rebuilds/events, which this launch's boundary already
                # ran); the XLA gather/scatter planes exist ONLY for the
                # overflow-dropped-anchor fallback (the caller then caps
                # the launch at one step, the only span for which these
                # planes are valid)
                # the boundary just above may have REFRESHED ex_fb (an
                # overflow appearing at this rebuild): re-cap the span
                # here, not only in segment's pre-launch estimate
                limit = jnp.where(fs.ex_fb, jnp.minimum(limit, 1), limit)
                exf, eb_ex = jax.lax.cond(
                    fs.ex_fb,
                    lambda fs, dd: ex_force_planes(fs, dd, None),
                    lambda fs, dd: (zero_planes, jnp.zeros((), dtype)),
                    fs, do_drift)
            else:
                exf, eb_ex = ex_force_planes(fs, do_drift, None)

            if lf is not None:
                # run-constant key: the step enters ONLY through the
                # threefry counter (see the XLA-chain step above), which
                # is what lets one launch batch several steps
                key = jax.random.fold_in(
                    jax.random.fold_in(fs.key, (4 << 20)),
                    lf.seed,
                )
                k0, k1 = _key_words(key)
                key_words = jnp.stack([k0, k1])
                span = jnp.maximum((run_end - run_begin).astype(dtype), 1.0)
                frac = jnp.clip(
                    (sstep - run_begin).astype(dtype) / span, 0.0, 1.0)
                dT = (jnp.asarray(lf.t_stop, dtype)
                      - jnp.asarray(lf.t_start, dtype))
                t_target = jnp.asarray(lf.t_start, dtype) + frac * dT
                # per-step ramp slope inside the launch (steps after sstep
                # stay within the run, so no clipping is needed mid-run)
                t_slope = dT / span
            else:
                key_words = jnp.zeros((2,), jnp.uint32)
                t_target = jnp.ones((), dtype)
                t_slope = jnp.zeros((), dtype)

            energy_on = (sstep % energy_every) == 0

            def kcall(fs, energy, lim):
                gx1, gv2, ftot, stats = kernels[energy](
                    fs.gx, fs.gv, fs.gf, exf, fs.gx_ref,
                    fs.bid, fs.hn, fs.pid,
                    sstep, do_drift, key_words, t_target,
                    t_slope=t_slope, limit=lim,
                    ex_tab=fs.ex_tab if sim.ex_btype > 0 else None,
                    ex_tabT=fs.ex_tabT if sim.ex_btype > 0 else None,
                    ex_bases=fs.ex_bases if sim.ex_btype > 0 else None,
                    ex_nblk=fs.ex_nblk if sim.ex_btype > 0 else None,
                    ex_nwin=fs.ex_nwin if sim.ex_btype > 0 else None,
                    lgm=fs.lgm,
                    # near-spring stencil term: off on the exf-fallback
                    # launch (the XLA planes then carry ALL springs)
                    ex_inkernel=jnp.where(
                        fs.ex_fb, 0, 1).astype(jnp.int32)
                    if sim.ex_btype > 0 else None)
                d = stats[7, 0].astype(jnp.int32)
                clamps = (0.5 * stats[3, 0]).astype(jnp.int32)
                fl = jnp.where(
                    stats[2, 0] > 0.0,
                    jnp.uint32(FLAG_BOND_REACH), jnp.uint32(0))
                fl = fl | jnp.where(
                    clamps > 0, jnp.uint32(FLAG_FENE_CLAMP), jnp.uint32(0))
                fl = fl | jnp.where(
                    stats[5, 0] > 0.0,
                    jnp.uint32(FLAG_SKIN_VIOLATION), jnp.uint32(0))
                kw = dict(gx=gx1, gv=gv2, gf=ftot,
                          n_clamps=fs.n_clamps + clamps,
                          step=sstep + d - 1)
                if reactive:
                    # re-arm the decide() trigger from the in-kernel
                    # monitor (stats row 6); served next launch
                    kw["skin_pend"] = (stats[6, 0] > 0.0).astype(jnp.int32)
                if energy:
                    el = 0.5 * stats[0, 0]
                    eb = 0.5 * stats[1, 0] + eb_ex
                    finite = jnp.isfinite(el) & jnp.isfinite(eb)
                    fl = fl | jnp.where(
                        finite, jnp.uint32(0), jnp.uint32(FLAG_NON_FINITE))
                    kw.update(epair=el, ebond=eb)
                return fs.replace(flags=fs.flags | fl, **kw), d

            one = jnp.ones((), jnp.int32)
            if energy_every == 1:
                return kcall(fs, True, one)
            # energy steps are always single-step launches: the energy
            # rows in stats hold the LAST executed step's sums only
            return jax.lax.cond(
                energy_on,
                lambda fs: kcall(fs, True, one),
                lambda fs: kcall(fs, False, limit),
                fs,
            )

        def step_pallas(fs: FastState, sstep, run_begin, run_end):
            fs, _ = launch_pallas(fs, sstep, jnp.ones((), jnp.int32),
                                  run_begin, run_end)
            return fs

        step_core = step_pallas
    else:
        step_core = step

    if mode and reactive:
        # multi-step launches: batch up to LAUNCH_MAX steps per device
        # launch, stopping at the next boundary-step candidate (static
        # cadences — LE event phases, the rebuild backstop, energy steps)
        # and letting the in-kernel trigger cut the run short when the
        # half-skin budget demands a rebuild.  This amortizes the
        # pallas_call launch floor AND the XLA-side scalar plumbing over
        # ~LAUNCH_MAX steps (PERF_NOTES round-3: glue was ~40% of the
        # step); the multi-step analog of Verlet::run's decide() gate.
        LAUNCH_MAX = 16
        cadences = list(event_phases) + [(K, 0)]
        if energy_every > 1:
            cadences.append((energy_every, 0))
        else:
            cadences.append((1, 0))  # energy every step: single-step only

        def segment(fs: FastState, step0, length, run_begin, run_end):
            length = jnp.asarray(length, jnp.int32)

            def cond(c):
                return c[1] < length

            def body(c):
                fs, done = c
                sstep = step0 + done + 1
                lim = jnp.minimum(
                    jnp.asarray(LAUNCH_MAX, jnp.int32), length - done)
                for nev, ph in cadences:
                    # distance from sstep to the NEXT step matching this
                    # cadence; sstep itself matching is the launch's own
                    # (XLA-handled) first step
                    dist = (ph - sstep) % nev
                    dist = jnp.where(dist == 0, nev, dist)
                    lim = jnp.minimum(lim, dist)
                if sim.ex_btype > 0:
                    # the XLA exf fallback planes are only valid for the
                    # first step: cap at 1 only when an active anchor was
                    # overflow-dropped (the kernel's block spring pass
                    # handles everything else itself)
                    lim = jnp.where(fs.ex_fb, 1, lim)
                fs, d = launch_pallas(fs, sstep, lim, run_begin, run_end)
                fs = fs.replace(n_launches=fs.n_launches + 1)
                return (fs, done + d)

            fs, _ = jax.lax.while_loop(
                cond, body, (fs, jnp.zeros((), jnp.int32)))
            return fs
    else:
        def segment(fs: FastState, step0, length, run_begin, run_end):
            def body(i, fs):
                return step_core(fs, step0 + i + 1, run_begin, run_end)

            return jax.lax.fori_loop(0, length, body, fs)

    return segment, step_core


def run_fast(sim, state: State, nsteps: int, thermo_every: int = 0,
             thermo_callback=None, max_segment: int = 2000,
             boundary_every: int = 0, boundary_callback=None,
             groups=None):
    """Drive nsteps on the fast path; mirrors integrate.run()'s contract.

    ``boundary_callback(state)`` fires at ABSOLUTE steps that are multiples
    of ``boundary_every`` (the dump cadence, src/output.cpp:284) — decks
    with dumps ride the fast engine instead of falling back to the 5x
    slower general path (VERDICT r2 weak #4).  The bead-layout State is
    extracted from grid residency only at those boundaries.
    """
    system = sim.system
    segment, _ = _compiled_fast(sim, thermo_every)
    fs = _jit_to_fast(sim, groups)(state)

    rows = []

    def emit(fs):
        row = jax.device_get(thermo_row_fast(fs, system))
        rows.append(row)
        if thermo_callback:
            thermo_callback(row, from_fast(fs, system))

    begin = int(jax.device_get(fs.step))
    if thermo_every > 0:
        emit(fs)
    if boundary_callback and boundary_every > 0:
        if begin % boundary_every == 0:
            boundary_callback(from_fast(fs, system))

    run_begin = jnp.asarray(begin, jnp.int32)
    run_end = jnp.asarray(begin + nsteps, jnp.int32)
    seg = thermo_every if thermo_every > 0 else 0
    if boundary_every > 0:
        seg = np.gcd(seg, boundary_every) if seg else boundary_every
    if seg == 0:
        seg = min(nsteps, max_segment)
    done = 0
    while done < nsteps:
        # stop at the next ABSOLUTE multiple of seg (phase on step 0, not
        # the run begin: staged decks enter runs at unaligned steps)
        cur = begin + done
        this = min(int(seg - cur % seg), nsteps - done)
        left = this
        while left > 0:
            chunk = min(left, max_segment)
            step0 = jnp.asarray(begin + done + (this - left), jnp.int32)
            fs = segment(fs, step0, chunk, run_begin, run_end)
            left -= chunk
        done += this
        step_abs = begin + done
        if thermo_every > 0 and (step_abs % thermo_every == 0
                                 or done == nsteps):
            emit(fs)
        if boundary_callback and boundary_every > 0:
            if step_abs % boundary_every == 0:
                boundary_callback(from_fast(fs, system))
    return from_fast(fs, system), rows


def run_fast_replicas(sim, state: State, n_replicas: int, nsteps: int,
                      seed: int = 1234, max_segment: int = 2000):
    """Vmapped replica ensemble on the fast path (BASELINE config 5).

    Replicates the given State across R trajectories with decorrelated PRNG
    keys and identical initial conditions (the reference analog is the
    multi-partition Universe, src/universe.cpp, where each partition runs
    the same deck with a different seed).  Every per-step gate keys on the
    shared scalar step counter, so rebuild/LE/energy conds survive vmap as
    real conds.  Returns (final FastStates stacked, wall-metric helper).
    """
    system = sim.system
    segment, _ = make_fast_segment(sim, pallas=False, reactive=False)
    vseg = jax.jit(jax.vmap(segment, in_axes=(0, None, None, None, None)))

    def rep(seed_i, s):
        return to_fast(
            s.replace(key=jax.random.fold_in(s.key, seed_i)), sim
        )

    fs = jax.jit(jax.vmap(rep, in_axes=(0, None)))(
        jnp.arange(seed, seed + n_replicas, dtype=jnp.int32), state
    )
    begin = int(jax.device_get(fs.step[0]))
    run_begin = jnp.asarray(begin, jnp.int32)
    run_end = jnp.asarray(begin + nsteps, jnp.int32)
    done = 0
    while done < nsteps:
        chunk = min(max_segment, nsteps - done)
        step0 = jnp.asarray(begin + done, jnp.int32)
        fs = vseg(fs, step0, chunk, run_begin, run_end)
        done += chunk
    jax.device_get(fs.step)
    return fs


def _lru_caches():
    from ..integrate.verlet import _LRU

    return _LRU(), _LRU()


_FAST_CACHE, _TOFAST_CACHE = None, None


def _compiled_fast(sim, thermo_every: int):
    global _FAST_CACHE, _TOFAST_CACHE
    if _FAST_CACHE is None:
        _FAST_CACHE, _TOFAST_CACHE = _lru_caches()
    key = (id(sim), thermo_every)
    hit = _FAST_CACHE.get(key)
    if hit is not None:
        return hit[0], hit[1]
    segment, step = make_fast_segment(sim, thermo_every)
    jseg = jax.jit(segment)
    _FAST_CACHE.put(key, (jseg, step, sim))
    return jseg, step


def _jit_to_fast(sim, groups=None):
    global _FAST_CACHE, _TOFAST_CACHE
    if _TOFAST_CACHE is None:
        _FAST_CACHE, _TOFAST_CACHE = _lru_caches()
    # group masks are baked into the trace (numpy constants): key on
    # their content, not just the Simulation
    gfp = (None if not groups else tuple(
        sorted((k, np.asarray(v, bool).tobytes())
               for k, v in groups.items())))
    key = (id(sim), gfp)
    hit = _TOFAST_CACHE.get(key)
    if hit is None:
        hit = (jax.jit(lambda s: to_fast(s, sim, groups)), sim)
        _TOFAST_CACHE.put(key, hit)
    return hit[0]
