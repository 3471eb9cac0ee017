"""Fixed-shape cell-list and verlet-list construction.

TPU-native replacement for the reference's NBin/NStencil/NPair machinery
(reference: src/nbin_standard.cpp:53,192 bins atoms into linked lists;
src/npair_half_bin_newton.cpp:35-160 walks a stencil producing a ragged
half list).  XLA needs static shapes, so:

* cells are a dense ``(ncells, cell_cap)`` table built by one argsort —
  no linked lists;
* the verlet list is a dense ``(N, max_neighbors)`` *full* list (each pair
  appears in both rows).  A full list costs 2x the pair evaluations of the
  reference's half list but removes the force scatter entirely: every bead's
  force is a pure row reduction, which vectorizes perfectly on the VPU.

Overflows (cell cap, list width) never drop pairs silently without notice:
sticky bits are returned and accumulated into ``State.flags``.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..state import (
    FLAG_CELL_OVERFLOW,
    FLAG_NEIGHBOR_OVERFLOW,
    NeighborList,
)
from ..system import System

# 27-cell stencil offsets, static.
_STENCIL = np.array(
    [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)],
    dtype=np.int32,
)


def minimum_image(d: jax.Array, box_size) -> jax.Array:
    """Wrap displacement vectors to the nearest periodic image
    (reference: src/domain.cpp:980 ``Domain::minimum_image``)."""
    box = jnp.asarray(box_size, d.dtype)
    return d - box * jnp.round(d / box)


def wrap_positions(x: jax.Array, system: System, img: jax.Array):
    """Remap positions into the primary box, updating image counters
    (reference: src/domain.cpp:528 ``Domain::pbc``).

    The result is guaranteed to lie in [lo, hi): in f32, ``x - shift*box``
    can round exactly onto ``hi`` (or a hair below ``lo``), which would put
    the coordinate one full box out of frame with its cell assignment —
    the cell index wraps to 0 while the coordinate stays at L.  Downstream,
    any non-cutoff-masked in-cell interaction (the fast path's in-kernel
    FENE) then acts across a phantom box-length displacement and detonates
    (observed: a clamped-FENE force of 300*2L).  The reference has the same
    guard in Domain::pbc (domain.cpp:541-561 re-checks bounds after the
    shift)."""
    lo = jnp.asarray(system.box_lo, x.dtype)
    box = jnp.asarray(system.box_size, x.dtype)
    hi = lo + box
    shift = jnp.floor((x - lo) / box).astype(jnp.int32)
    x = x - shift.astype(x.dtype) * box
    over = x >= hi
    x = jnp.where(over, x - box, x)
    shift = shift + over.astype(jnp.int32)
    under = x < lo
    x = jnp.where(under, x + box, x)
    shift = shift - under.astype(jnp.int32)
    # a value that still rounds onto hi after the correction pins to lo —
    # a full-box move, so it counts as one more ``over`` crossing (else the
    # image counter is off by one and unwrapped trajectories / MSD skew)
    pin = x >= hi
    x = jnp.where(pin, lo, x)
    shift = shift + pin.astype(jnp.int32)
    return x, img + shift


def cell_coords(x: jax.Array, system: System) -> jax.Array:
    """(N, 3) integer cell coordinates of each bead.

    Callers must pass positions already wrapped into [lo, hi)
    (wrap_positions).  The assignment CLIPS rather than re-wrapping: in f32,
    ``(x - lo)/box`` for x within a couple of ulps of ``hi`` rounds to 1.0,
    and a frac-based re-wrap would then bin the bead into cell 0 while its
    coordinate stays near ``hi`` — one full box out of frame with its cell,
    which detonates any non-cutoff-masked in-cell interaction.  Clipping
    keeps the cell consistent with the coordinate (error bounded by one
    ulp, not one box)."""
    cfg = system.neighbor
    lo = jnp.asarray(system.box_lo, x.dtype)
    box = jnp.asarray(system.box_size, x.dtype)
    dims = jnp.asarray([cfg.nx, cfg.ny, cfg.nz], jnp.int32)
    s = (x - lo) / box
    c = jnp.floor(s * dims.astype(x.dtype)).astype(jnp.int32)
    return jnp.clip(c, 0, dims - 1)


def _flatten_cells(c3: jax.Array, system: System) -> jax.Array:
    cfg = system.neighbor
    return (c3[..., 0] * cfg.ny + c3[..., 1]) * cfg.nz + c3[..., 2]


def build_cell_bins(x: jax.Array, system: System):
    """Dense (ncells, cell_cap) table of bead ids, padded with N.

    Built with one sort: beads sorted by cell id; each bead's rank within
    its cell indexes the table row.  Rank overflow is dropped and flagged.
    """
    cfg = system.neighbor
    n = system.n
    ncells = cfg.nx * cfg.ny * cfg.nz
    cid = _flatten_cells(cell_coords(x, system), system)
    order = jnp.argsort(cid).astype(jnp.int32)
    scid = cid[order]
    idx = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), scid[1:] != scid[:-1]])
    start_idx = jax.lax.associative_scan(jnp.maximum, jnp.where(is_start, idx, 0))
    rank = idx - start_idx
    bins = jnp.full((ncells, cfg.cell_cap), n, jnp.int32)
    bins = bins.at[scid, rank].set(order, mode="drop")
    overflow = jnp.where(
        jnp.max(rank) >= cfg.cell_cap,
        jnp.uint32(FLAG_CELL_OVERFLOW),
        jnp.uint32(0),
    )
    return bins, overflow


def build_neighbor_list(x: jax.Array, system: System):
    """Build a (N, max_neighbors) full verlet list within cutoff + skin.

    Returns (NeighborList, flags).  With ``use_cells=False`` the list simply
    enumerates all other beads (testing / tiny systems).
    """
    cfg = system.neighbor
    n = system.n
    if not cfg.use_cells:
        # all-pairs "list": row i = all j != i, padded to width n.
        idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (n, n))
        rows = jnp.arange(n, dtype=jnp.int32)[:, None]
        idx = jnp.where(idx == rows, n, idx)
        idx = jnp.sort(idx, axis=1)[:, : max(n - 1, 1)]
        return NeighborList(idx=idx, x_ref=x), jnp.uint32(0)

    rc = system.pair.max_cutoff if system.pair is not None else cfg.cell_size - cfg.skin
    rlist_sq = (rc + cfg.skin) ** 2

    bins, flags = build_cell_bins(x, system)
    c3 = cell_coords(x, system)  # (N, 3)
    dims = jnp.asarray([cfg.nx, cfg.ny, cfg.nz], jnp.int32)
    ncc = (c3[:, None, :] + jnp.asarray(_STENCIL)[None, :, :]) % dims  # (N, 27, 3)
    ncid = _flatten_cells(ncc, system)  # (N, 27)
    cand = bins[ncid].reshape(n, 27 * cfg.cell_cap)  # (N, C)

    xp = jnp.concatenate([x, jnp.zeros((1, 3), x.dtype)])  # sentinel row
    d = xp[cand] - x[:, None, :]
    d = minimum_image(d, system.box_size)
    rsq = jnp.sum(d * d, axis=-1)
    self_rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    valid = (cand != n) & (cand != self_rows) & (rsq < rlist_sq)

    k = cfg.max_neighbors
    # Compact each row to k slots: top_k on -rsq keyed by validity.
    big = jnp.asarray(jnp.finfo(rsq.dtype).max, rsq.dtype)
    keys = jnp.where(valid, rsq, big)
    _, sel = jax.lax.top_k(-keys, k)
    sel_idx = jnp.take_along_axis(cand, sel, axis=1)
    sel_valid = jnp.take_along_axis(valid, sel, axis=1)
    idx = jnp.where(sel_valid, sel_idx, n)

    nvalid = jnp.sum(valid, axis=1)
    flags = flags | jnp.where(
        jnp.max(nvalid) > k, jnp.uint32(FLAG_NEIGHBOR_OVERFLOW), jnp.uint32(0)
    )
    return NeighborList(idx=idx, x_ref=x), flags
