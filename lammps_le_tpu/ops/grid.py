"""Dense cell-grid pair computation — the TPU-native neighbor backend.

Beads are packed into a dense ``(cap, P)`` slot grid at rebuild time, where
``P`` is the *halo-padded* flat cell count: the 3-D cell grid is surrounded
by one layer of ghost cells that duplicate the periodically-wrapped source
cells (the on-device analog of the reference's ghost-atom halo,
src/comm_brick.cpp:700 ``borders()`` — except here the "communication" is a
rebuild-time index duplication and costs nothing per step).

With halo cells present, the 27-cell stencil becomes 27 *static shifts of
the flat minor axis* — pure slice/concat ops with perfect lane utilization
(P is padded to a multiple of 128).  Pair interactions are evaluated as
dense ``(cap_i, cap_j, P)`` broadcasts on the VPU; XLA fuses the whole
per-offset chain into one pass over the (cap, P) inputs.

Why not ``jnp.roll`` on an (nx, ny, nz, cap) grid: TPU tiles pad the two
minor dims to (8, 128), so any (..., cap, cap) intermediate wastes ~10x
memory bandwidth.  The flat-minor layout keeps every tensor lane-dense.

Correctness:
* halo cells are masked as i-atoms (their slots alias interior beads, so
  counting them would double forces) and serve only as j-neighbors;
* minimum-image wrapping of distances makes coordinate duplication (rather
  than shifted copies) sufficient;
* between rebuilds beads stay in their rebuild cells — the half-skin
  argument (reference: src/neighbor.cpp:1948-1962), monitored by the sticky
  skin flag;
* slot overflow raises FLAG_CELL_OVERFLOW, never silent.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from ..state import FLAG_CELL_OVERFLOW
from ..system import System
from .cells import cell_coords
from .pair import _lj_tables

_OFFSETS = [
    (i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)
]


@struct.dataclass
class CellGrid:
    """Rebuild-time bead->slot assignment.

    All arrays are (cap, P) with the flat halo-padded cell axis minor.
    ``slot_bead`` holds bead ids (N = empty); ``scatter_bead`` is the same
    with halo slots masked to N (safe scatter targets).
    """

    slot_bead: jax.Array     # (cap, P) int32
    scatter_bead: jax.Array  # (cap, P) int32, halo -> N
    x_ref: jax.Array         # (N, 3) positions at rebuild (skin check)


def _halo_maps(system: System):
    """Static numpy maps for the halo-padded flat grid.

    Returns (src_cell, interior, P, strides, shifts): ``src_cell[p]`` is the
    source interior cell (flat, unpadded) each padded cell duplicates;
    ``interior`` marks non-halo cells; ``shifts`` is a (P, 3) array of
    +-box_L ghost-image coordinate shifts (the on-device analog of the
    reference's shifted ghost-atom coordinates, comm_brick.cpp:700 —
    baking the shift in removes per-pair minimum-image rounding from the
    pair kernel).  Cached on first use per neighbor config.
    """
    cfg = system.neighbor
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    px, py, pz = nx + 2, ny + 2, nz + 2
    p_raw = px * py * pz
    p = -(-p_raw // 128) * 128  # pad to lane multiple
    ix, iy, iz = np.meshgrid(
        np.arange(px), np.arange(py), np.arange(pz), indexing="ij"
    )
    sx = (ix - 1) % nx
    sy = (iy - 1) % ny
    sz = (iz - 1) % nz
    src = ((sx * ny + sy) * nz + sz).reshape(-1)
    interior = (
        (ix >= 1) & (ix <= nx) & (iy >= 1) & (iy <= ny) & (iz >= 1) & (iz <= nz)
    ).reshape(-1)
    src_p = np.zeros(p, np.int32)
    src_p[:p_raw] = src
    int_p = np.zeros(p, bool)
    int_p[:p_raw] = interior
    box = system.box_size
    shifts_raw = np.stack(
        [
            np.where(ix == 0, -box[0], np.where(ix == px - 1, box[0], 0.0)),
            np.where(iy == 0, -box[1], np.where(iy == py - 1, box[1], 0.0)),
            np.where(iz == 0, -box[2], np.where(iz == pz - 1, box[2], 0.0)),
        ],
        axis=-1,
    ).reshape(-1, 3)
    shifts = np.zeros((p, 3), np.float64)
    shifts[:p_raw] = shifts_raw
    # cells in the lane-padding tail keep src 0 but are non-interior and
    # their contributions are masked via sentinel coordinates.
    strides = (py * pz, pz, 1)
    return src_p, int_p, p, strides, shifts


_HALO_CACHE: dict = {}


def halo_maps(system: System):
    key = (
        system.neighbor.nx,
        system.neighbor.ny,
        system.neighbor.nz,
        system.box_size,
    )
    hit = _HALO_CACHE.get(key)
    if hit is None:
        hit = _halo_maps(system)
        _HALO_CACHE[key] = hit
    return hit


def build_grid(x: jax.Array, system: System):
    """Pack beads into the halo-padded slot grid (argsort + scatter + dup)."""
    cfg = system.neighbor
    n = system.n
    nx, ny, nz, cap = cfg.nx, cfg.ny, cfg.nz, cfg.cell_cap
    ncells = nx * ny * nz
    src, interior, p, _, _ = halo_maps(system)

    c3 = cell_coords(x, system)
    cid = (c3[:, 0] * ny + c3[:, 1]) * nz + c3[:, 2]
    order = jnp.argsort(cid).astype(jnp.int32)
    scid = cid[order]
    idx = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), scid[1:] != scid[:-1]])
    start_idx = jax.lax.associative_scan(jnp.maximum, jnp.where(is_start, idx, 0))
    rank = idx - start_idx
    flat = jnp.full((ncells * cap,), n, jnp.int32)
    flat = flat.at[scid * cap + rank].set(order, mode="drop")
    base = flat.reshape(ncells, cap).T            # (cap, ncells)
    slot_bead = base[:, jnp.asarray(src)]         # (cap, P) halo duplication
    # halo j-slots in the pure padding tail must be empty
    int_j = jnp.asarray(interior)
    scatter_bead = jnp.where(int_j[None, :], slot_bead, n)

    overflow = jnp.where(
        jnp.max(rank) >= cap, jnp.uint32(FLAG_CELL_OVERFLOW), jnp.uint32(0)
    )
    grid = CellGrid(
        slot_bead=slot_bead,
        scatter_bead=scatter_bead,
        x_ref=x,
    )
    return grid, overflow


def _shift(a: jax.Array, delta: int, fill):
    """Static shift along the minor axis: out[..., c] = a[..., c + delta]."""
    if delta == 0:
        return a
    pad = jnp.full(a.shape[:-1] + (abs(delta),), fill, a.dtype)
    if delta > 0:
        return jnp.concatenate([a[..., delta:], pad], axis=-1)
    return jnp.concatenate([pad, a[..., :delta]], axis=-1)


# 13 lexicographically-positive stencil offsets: each unordered cell pair
# {c, c+delta} is visited once (Newton's third law at the cell level,
# the dense analog of the reference's half neighbor list with Newton on,
# npair_half_bin_newton.cpp:35-160)
_HALF_OFFSETS = [
    (i, j, k)
    for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)
    if (i, j, k) > (0, 0, 0)
]


def grid_pair_force(
    x: jax.Array,
    types: jax.Array,
    grid: CellGrid,
    system: System,
    ex_partner=None,  # unused: exclusions are corrected outside the kernel
    virial: bool = False,
    energy: bool = True,
):
    """LJ forces + energy from the slot grid — exclusion-free half stencil.

    * Bonded (special) pairs are *not* masked; the caller subtracts their
      weighted contribution (forces.special_pair_correction).
    * Ghost cells carry pre-baked +-L coordinate shifts: no per-pair
      minimum-image rounding.
    * 13 positive offsets + the self cell: each cell pair computed once,
      with the reaction force delivered to the j cell by a static shift —
      Newton's third law halves the dominant cost.
    * Halo i-cells are masked at compute time; reactions landing in halo
      cells fold back onto their source beads through the unmasked
      slot_bead scatter (halo slots alias interior beads).
    """
    dtype = x.dtype
    n = system.n
    tables = _lj_tables(system, dtype)
    lj1, lj2, lj3, lj4, cutsq, offset_e, floorsq = tables
    nt = lj1.shape[0]
    # scalar fast path whenever every type pair shares one parameter set
    # (all LE decks): skips per-pair table gathers entirely
    pp = system.pair
    uniform = all(
        bool(np.all(np.asarray(a) == np.asarray(a).flat[0]))
        for a in (pp.epsilon, pp.sigma, pp.cutoff)
    )
    one_type = nt == 1 or uniform
    _, interior, _, strides, shifts = halo_maps(system)
    int_m = jnp.asarray(interior, dtype)[None, None, :]  # (1, 1, P)

    slot = grid.slot_bead                      # (cap, P)
    far = jnp.asarray(-1.0e4, dtype)
    xp = jnp.concatenate([x, jnp.full((1, 3), far, dtype)])
    sh = jnp.asarray(shifts, dtype)            # (P, 3) ghost image shifts
    gx = xp[slot, 0] + sh[None, :, 0]
    gy = xp[slot, 1] + sh[None, :, 1]
    gz = xp[slot, 2] + sh[None, :, 2]
    if not one_type:
        tp = jnp.concatenate([types, jnp.zeros((1,), jnp.int32)])
        gt = tp[slot]

    fx = jnp.zeros_like(gx)
    fy = jnp.zeros_like(gy)
    fz = jnp.zeros_like(gz)
    e_acc = jnp.zeros_like(gx)
    w_acc = jnp.zeros((), dtype)

    gxi = gx[:, None, :]
    gyi = gy[:, None, :]
    gzi = gz[:, None, :]
    if not one_type:
        gti = gt[:, None, :]

    def pair_block(gxj, gyj, gzj, gtj):
        dx = gxi - gxj
        dy = gyi - gyj
        dz = gzi - gzj
        rsq = dx * dx + dy * dy + dz * dz
        if one_type:
            l1 = lj1[0, 0]
            l2 = lj2[0, 0]
            l3 = lj3[0, 0]
            l4 = lj4[0, 0]
            csq = cutsq[0, 0]
            eoff = offset_e[0, 0]
            fsq = floorsq[0, 0]
        else:
            pairidx = gti * nt + gtj
            l1 = jnp.take(lj1.ravel(), pairidx)
            l2 = jnp.take(lj2.ravel(), pairidx)
            l3 = jnp.take(lj3.ravel(), pairidx)
            l4 = jnp.take(lj4.ravel(), pairidx)
            csq = jnp.take(cutsq.ravel(), pairidx)
            eoff = jnp.take(offset_e.ravel(), pairidx)
            fsq = jnp.take(floorsq.ravel(), pairidx)
        # rsq == 0 exactly only for the self pair (sentinels are spread
        # apart by the ghost shifts and fill constants)
        mask = (rsq < csq) & (rsq > 0.0)
        w = jnp.where(mask, int_m, jnp.zeros_like(rsq))  # halo-i masked
        # LJ evaluation floor (see ops.pair._RSQ_FLOOR_FRAC): keeps
        # interpenetrating special pairs finite and cancellation-exact
        rsq_s = jnp.maximum(jnp.where(mask, rsq, jnp.ones_like(rsq)), fsq)
        r2inv = 1.0 / rsq_s
        r6inv = r2inv * r2inv * r2inv
        fpair = r6inv * (l1 * r6inv - l2) * r2inv * w
        e = (r6inv * (l3 * r6inv - l4) - eoff) * w if energy else None
        return dx, dy, dz, fpair, e

    # self cell: full i != j (each in-cell pair counted twice; energy halved)
    gtj0 = gt[None, :, :] if not one_type else None
    dx, dy, dz, fpair, e = pair_block(
        gx[None, :, :], gy[None, :, :], gz[None, :, :], gtj0
    )
    fx = fx + jnp.sum(dx * fpair, axis=1)
    fy = fy + jnp.sum(dy * fpair, axis=1)
    fz = fz + jnp.sum(dz * fpair, axis=1)
    if energy:
        e_acc = e_acc + 0.5 * jnp.sum(e, axis=1)
    if virial:
        w_acc = w_acc + 0.5 * jnp.sum(
            fpair * (dx * dx + dy * dy + dz * dz)
        )

    for (dx_c, dy_c, dz_c) in _HALF_OFFSETS:
        delta = dx_c * strides[0] + dy_c * strides[1] + dz_c * strides[2]
        gxj = _shift(gx, delta, far)[None, :, :]
        gyj = _shift(gy, delta, far)[None, :, :]
        gzj = _shift(gz, delta, far)[None, :, :]
        gtj = _shift(gt, delta, 0)[None, :, :] if not one_type else None
        dx, dy, dz, fpair, e = pair_block(gxj, gyj, gzj, gtj)

        wfx = dx * fpair
        wfy = dy * fpair
        wfz = dz * fpair
        fx = fx + jnp.sum(wfx, axis=1)
        fy = fy + jnp.sum(wfy, axis=1)
        fz = fz + jnp.sum(wfz, axis=1)
        if energy:
            e_acc = e_acc + jnp.sum(e, axis=1)
        if virial:
            w_acc = w_acc + jnp.sum(wfx * dx + wfy * dy + wfz * dz)
        # Newton reaction on the j cell: reduce over i, shift back by -delta
        fx = fx - _shift(jnp.sum(wfx, axis=0), -delta, 0.0)
        fy = fy - _shift(jnp.sum(wfy, axis=0), -delta, 0.0)
        fz = fz - _shift(jnp.sum(wfz, axis=0), -delta, 0.0)

    # scatter to bead order: halo slots alias their source beads, so the
    # unmasked scatter folds halo-cell reactions onto the right owners
    tgt = grid.slot_bead.reshape(-1)
    f = jnp.zeros((n + 1, 3), dtype)
    f = f.at[tgt, 0].add(fx.reshape(-1), mode="drop")
    f = f.at[tgt, 1].add(fy.reshape(-1), mode="drop")
    f = f.at[tgt, 2].add(fz.reshape(-1), mode="drop")
    epair = jnp.sum(e_acc) if energy else jnp.zeros((), dtype)
    if virial:
        return f[:n], epair, w_acc
    return f[:n], epair
