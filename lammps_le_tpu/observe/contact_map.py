"""On-device contact-map accumulation — the primary LE observable.

Contact maps (binned bead-bead proximity counts) are how loop-extrusion
simulations are compared to Hi-C data and how this engine's statistics are
validated against the reference fix (BASELINE.md: "contact maps matching
within statistical error").  The accumulation reuses the halo cell grid:
every bead pair within ``radius`` votes into a (nbins, nbins) genomic-bin
matrix.  Intended to run every ``sample_every`` steps, not per step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import grid as grid_ops
from ..ops.cells import wrap_positions
from ..state import State
from ..system import System


def make_contact_fn(system: System, radius: float = 2.0, nbins: int = 256,
                    cap_boost: int = 1):
    """jitted (state, cmap) -> (cmap, flags): this snapshot's contacts
    added plus a sticky flags word (FLAG_CELL_OVERFLOW when the dedicated
    grid dropped beads — then the frame undercounts and the caller must
    rebuild with a larger ``cell_cap``; see ADVICE r2: LE globules are
    locally dense, so overflow must never pass silently).

    cmap is a (nbins, nbins) float32 matrix over genomic (chain-index)
    bins; both (i,j) and (j,i) receive each contact.
    """
    n = system.n
    rcsq = radius * radius

    # the contact radius can exceed the pair grid's one-cell stencil reach
    # (standard LE analysis uses 2.0 sigma vs ~1.5 sigma cells): derive a
    # dedicated coarser grid whose cells cover the radius
    if radius > system.neighbor.cell_size:
        from ..system import make_neighbor_config
        import numpy as _np

        box = system.box_size
        density = n / float(_np.prod(_np.asarray(box)))
        # Poisson-tail sizing, not mean-density: chromatin globules pack
        # cells well past the mean (lam + 6*sqrt(lam) covers the tail;
        # overflow is still flagged, never silent)
        lam = 4.0 * density * radius ** 3
        cap = max(8, int(_np.ceil(lam + 6.0 * _np.sqrt(lam) + 4.0)))
        ncfg = make_neighbor_config(box, radius, skin=0.0,
                                    cell_cap=cap * cap_boost)
        system = system.replace(neighbor=ncfg)
    elif cap_boost > 1:
        system = system.with_neighbor(
            cell_cap=system.neighbor.cell_cap * cap_boost)
    assert radius <= system.neighbor.cell_size, (
        f"contact radius {radius} exceeds even a dedicated grid's reach "
        f"{system.neighbor.cell_size} (box too small)"
    )

    _, interior, _, strides, shifts = grid_ops.halo_maps(system)
    offsets = grid_ops._OFFSETS

    @jax.jit
    def accumulate(state: State, cmap: jax.Array):
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
        bead_bin = jnp.clip(
            (jnp.arange(n + 1, dtype=jnp.int32) * nbins) // n, 0, nbins - 1
        )
        gbin = bead_bin[slot]
        int_m = jnp.asarray(interior)[None, None, :]
        gvalid = (slot != n)[:, None, :] & int_m

        gxi = gx[:, None, :]
        gyi = gy[:, None, :]
        gzi = gz[:, None, :]
        gbini = gbin[:, None, :]

        cm = cmap.astype(jnp.float32)
        for (dx_c, dy_c, dz_c) in offsets:
            delta = (
                dx_c * strides[0] + dy_c * strides[1] + dz_c * strides[2]
            )
            gxj = grid_ops._shift(gx, delta, far)[None, :, :]
            gyj = grid_ops._shift(gy, delta, far)[None, :, :]
            gzj = grid_ops._shift(gz, delta, far)[None, :, :]
            gbinj = grid_ops._shift(gbin, delta, nbins)[None, :, :]
            dx = gxi - gxj
            dy = gyi - gyj
            dz = gzi - gzj
            rsq = dx * dx + dy * dy + dz * dz
            mask = gvalid & (rsq < rcsq) & (rsq > 0.0)
            flat = (gbini * nbins + gbinj).reshape(-1)
            cm = cm.reshape(-1).at[flat].add(
                mask.reshape(-1).astype(jnp.float32), mode="drop"
            ).reshape(nbins, nbins)
        return cm, overflow

    return accumulate


def contact_map_accumulate(state, system, cmap=None, radius=2.0, nbins=256):
    """Convenience one-shot wrapper; raises on dropped beads after retrying
    with a doubled cell cap (a dropped bead = silently undercounted
    contacts in the A/B acceptance observable)."""
    if cmap is None:
        cmap = jnp.zeros((nbins, nbins), jnp.float32)
    for cap_boost in (1, 2, 4, 8):
        fn = make_contact_fn(system, radius, nbins, cap_boost=cap_boost)
        out, fl = fn(state, cmap)
        if int(fl) == 0:
            return out
    raise RuntimeError(
        "contact_map: cell overflow persisted after cap retries")
