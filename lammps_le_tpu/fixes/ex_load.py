"""Jit-safe extruder loading: TPU reimplementation of
``FixExLoad::post_integrate`` (reference: src/USER-LE/fix_ex_load.cpp:329-655).

Reference semantics reproduced:

* Candidates are bead pairs exactly two apart along the chain
  (``|tag_i - tag_j| == 2``, fix_ex_load.cpp:470) — enumerated here per mid
  bead via the chain arrays, with no neighbor search at all (the reference
  scans an occasional half neighbor list; on chains i+-2 is a shift).
* All of i, mid, j must have exactly two bonds — chain-interior and
  extruder-free (fix_ex_load.cpp:481-484) — and the mid bead must not be
  claimed by a competing proposal.
* Atom-type gates with optional per-type max-bond limits and new-type
  conversion (iparam/jparam, fix_ex_load.cpp:86-99,594-598).
* Distance gate ``rsq < cutoff^2`` (fix_ex_load.cpp:494) and probability
  ``fraction`` applied to election winners (517-548).
* Overlapping proposals (mids two apart share a bead) are resolved by
  closest-pair election, ties by slot index.

New bonds go into free slots of the fixed-capacity extruder table; slot
exhaustion sets FLAG_EXTRUDER_OVERFLOW (the reference grows tables and can
abort on bond_per_atom instead, fix_ex_load.cpp:556-560).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.cells import minimum_image
from ..state import FLAG_EXTRUDER_OVERFLOW
from ..system import System
from .config import ExLoad
from .extrusion import _scatter_election


def make_ex_load_update(system: System, fix: ExLoad):
    n = system.n
    nxt = jnp.asarray(system.next_bead)
    prv = jnp.asarray(system.prev_bead)
    itype = fix.iatomtype - 1
    jtype = fix.jatomtype - 1
    cutsq = fix.cutoff * fix.cutoff

    def update(x, types, ex_left, ex_right, occ, key):
        e = ex_left.shape[0]
        mids = jnp.arange(n, dtype=jnp.int32)
        i = prv[mids]
        j = nxt[mids]
        valid = (i >= 0) & (j >= 0)
        i_s = jnp.where(valid, i, 0)
        j_s = jnp.where(valid, j, 0)

        def degree(b):
            # bonds incident on b: backbone prev/next + extruder occupancy
            return (
                (prv[b] >= 0).astype(jnp.int32)
                + (nxt[b] >= 0).astype(jnp.int32)
                + occ[b].astype(jnp.int32)
            )

        ok = valid
        ok &= (degree(i_s) == 2) & (degree(mids) == 2) & (degree(j_s) == 2)

        ti = types[i_s]
        tj = types[j_s]
        match_ij = (ti == itype) & (tj == jtype)
        match_ji = (ti == jtype) & (tj == itype)
        occ_i = occ[i_s].astype(jnp.int32)
        occ_j = occ[j_s].astype(jnp.int32)
        # bondcount limits (0 = unlimited); bondcount here is extruder count
        lim_ij = ((fix.imaxbond == 0) | (occ_i < fix.imaxbond)) & (
            (fix.jmaxbond == 0) | (occ_j < fix.jmaxbond)
        )
        lim_ji = ((fix.jmaxbond == 0) | (occ_i < fix.jmaxbond)) & (
            (fix.imaxbond == 0) | (occ_j < fix.imaxbond)
        )
        ok &= (match_ij & lim_ij) | (match_ji & lim_ji)

        d = minimum_image(x[j_s] - x[i_s], system.box_size)
        rsq = jnp.sum(d * d, axis=-1).astype(jnp.float32)
        ok &= rsq < cutsq

        # election over shared beads {i, mid, j}
        best_slot = _scatter_election(
            [(i_s, ok), (mids, ok), (j_s, ok)], rsq, n
        )
        win = (
            ok
            & (best_slot[jnp.where(ok, i_s, n)] == mids)
            & (best_slot[jnp.where(ok, mids, n)] == mids)
            & (best_slot[jnp.where(ok, j_s, n)] == mids)
        )

        if fix.fraction < 1.0:
            u = jax.random.uniform(key, (n,), jnp.float32)
            win &= u < fix.fraction

        # pack winners into free extruder slots, in mid-bead order
        inactive = ex_left < 0
        nfree = jnp.sum(inactive).astype(jnp.int32)
        frank = jnp.cumsum(inactive.astype(jnp.int32)) - 1
        free_list = jnp.full((e,), e, jnp.int32)
        free_list = free_list.at[jnp.where(inactive, frank, e)].set(
            jnp.arange(e, dtype=jnp.int32), mode="drop"
        )
        wrank = jnp.cumsum(win.astype(jnp.int32)) - 1
        fits = win & (wrank < nfree)
        slot = free_list[jnp.clip(jnp.where(fits, wrank, 0), 0, e - 1)]
        slot = jnp.where(fits, slot, e)

        new_left = ex_left.at[slot].set(jnp.where(fits, i_s, -1), mode="drop")
        new_right = ex_right.at[slot].set(jnp.where(fits, j_s, -1), mode="drop")

        # iparam/jparam atom-type conversion when the new bondcount (=1)
        # reaches the max (fix_ex_load.cpp:594-598)
        new_types = types
        if fix.imaxbond == 1 and fix.inewtype > 0:
            conv = fits & (types[i_s] == itype)
            new_types = new_types.at[jnp.where(conv, i_s, n)].set(
                fix.inewtype - 1, mode="drop"
            )
            conv_j = fits & (types[j_s] == itype)
            new_types = new_types.at[jnp.where(conv_j, j_s, n)].set(
                fix.inewtype - 1, mode="drop"
            )
        if fix.jmaxbond == 1 and fix.jnewtype > 0 and jtype != itype:
            conv = fits & (types[i_s] == jtype)
            new_types = new_types.at[jnp.where(conv, i_s, n)].set(
                fix.jnewtype - 1, mode="drop"
            )
            conv_j = fits & (types[j_s] == jtype)
            new_types = new_types.at[jnp.where(conv_j, j_s, n)].set(
                fix.jnewtype - 1, mode="drop"
            )

        ncreated = jnp.sum(fits).astype(jnp.int32)
        flags = jnp.where(
            jnp.sum(win) > nfree,
            jnp.uint32(FLAG_EXTRUDER_OVERFLOW),
            jnp.uint32(0),
        )
        return new_left, new_right, new_types, ncreated, flags

    return update
