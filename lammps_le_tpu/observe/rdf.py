"""Radial distribution function g(r) — on-device histogram.

The analog of ``compute rdf`` (reference: src/compute_rdf.cpp) for the
melt-structure checks LE studies use (solvent-free bead-spring melts have
a characteristic WCA first peak at ~1.05 sigma).  Reuses the halo cell
grid like the contact-map observable: every pair within ``rmax`` votes
into a radial bin; normalization to the ideal-gas shell count follows the
reference's convention (compute_rdf.cpp:187-219).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import grid as grid_ops
from ..ops.cells import wrap_positions
from ..state import State
from ..system import System, make_neighbor_config


def make_rdf_fn(system: System, nbins: int = 50, rmax: float = None,
                cap_boost: int = 1):
    """jitted (state, hist) -> (hist, flags) with this snapshot's pair
    counts added.

    ``hist`` is a (nbins,) float32 vector of raw pair counts (both
    directions); convert to g(r) with :func:`normalize_rdf`.  ``flags``
    carries FLAG_CELL_OVERFLOW when the binning grid dropped beads (the
    frame then undercounts pairs — resize with ``cap_boost``); overflow is
    never silent (ADVICE r2: LE globules pack far beyond mean density).
    """
    if rmax is None:
        rmax = system.neighbor.cell_size
    if rmax > system.neighbor.cell_size:
        density = system.n / float(np.prod(np.asarray(system.box_size)))
        lam = 4.0 * density * rmax ** 3
        cap = max(8, int(np.ceil(lam + 6.0 * np.sqrt(lam) + 4.0)))
        system = system.replace(
            neighbor=make_neighbor_config(system.box_size, rmax, skin=0.0,
                                          cell_cap=cap * cap_boost)
        )
    elif cap_boost > 1:
        system = system.with_neighbor(
            cell_cap=system.neighbor.cell_cap * cap_boost)
    assert rmax <= system.neighbor.cell_size
    _, interior, _, strides, shifts = grid_ops.halo_maps(system)
    offsets = grid_ops._OFFSETS
    n = system.n
    inv_dr = nbins / rmax

    @jax.jit
    def accumulate(state: State, hist: jax.Array):
        x, _ = wrap_positions(state.x, system, state.img)
        grid, overflow = grid_ops.build_grid(x, system)
        slot = grid.slot_bead
        dtype = x.dtype
        far = jnp.asarray(-1.0e4, dtype)
        xp = jnp.concatenate([x, jnp.full((1, 3), far, dtype)])
        sh = jnp.asarray(shifts, dtype)
        gx = xp[slot, 0] + sh[None, :, 0]
        gy = xp[slot, 1] + sh[None, :, 1]
        gz = xp[slot, 2] + sh[None, :, 2]
        int_m = jnp.asarray(interior)[None, None, :]
        gvalid = (slot != n)[:, None, :] & int_m

        h = hist.astype(jnp.float32)
        for (a, b, c) in offsets:
            delta = a * strides[0] + b * strides[1] + c * strides[2]
            gxj = grid_ops._shift(gx, delta, far)[None, :, :]
            gyj = grid_ops._shift(gy, delta, far)[None, :, :]
            gzj = grid_ops._shift(gz, delta, far)[None, :, :]
            dx = gx[:, None, :] - gxj
            dy = gy[:, None, :] - gyj
            dz = gz[:, None, :] - gzj
            rsq = dx * dx + dy * dy + dz * dz
            mask = gvalid & (rsq < rmax * rmax) & (rsq > 0.0)
            binidx = jnp.clip(
                (jnp.sqrt(jnp.maximum(rsq, 1e-12)) * inv_dr).astype(jnp.int32),
                0, nbins - 1,
            )
            h = h.at[binidx.reshape(-1)].add(
                mask.reshape(-1).astype(jnp.float32), mode="drop"
            )
        return h, overflow

    return accumulate


def normalize_rdf(hist, system: System, nframes: int, nbins: int = None,
                  rmax: float = None):
    """(r_centers, g_of_r) using the ideal-gas shell normalization."""
    hist = np.asarray(hist, np.float64)
    nbins = nbins or len(hist)
    rmax = rmax or system.neighbor.cell_size
    dr = rmax / nbins
    r_lo = np.arange(nbins) * dr
    shell = 4.0 / 3.0 * np.pi * ((r_lo + dr) ** 3 - r_lo ** 3)
    vol = float(np.prod(np.asarray(system.box_size)))
    density = system.n / vol
    ideal = shell * density * system.n * nframes
    return r_lo + 0.5 * dr, hist / np.maximum(ideal, 1e-300)
