"""Jit-safe loop-extrusion stepping: the TPU reimplementation of
``FixExtrusion::post_integrate`` (reference: src/USER-LE/fix_extrusion.cpp:256-872).

Reference semantics reproduced (SURVEY.md §7 parity checklist):

* Each extruder bond [l, r] tries to widen to [l-1, r+1] every ``nevery``
  steps; if only one side is free it shifts one-sided to [l-1, r] or
  [l, r+1] (fix_extrusion.cpp:430-515).
* A side is free iff the target bead is chain-interior with both backbone
  bonds (``num_bond - bondcount == 2``), carries no extruder
  (``bondcount == 0``) — stall-on-collision emerges from this — and its
  atom type passes the barrier gate: ``ctcf_left`` blocks leftward moves
  and ``ctcf_left_right`` blocks both, unless an independent uniform draw
  beats ``through_prob`` (fix_extrusion.cpp:398-429).  ``ctcf_right``
  symmetrically blocks rightward moves.
* When two extruders propose the same target bead, the proposal whose *new*
  bond is shorter wins and the loser stalls entirely
  (the distsq_c election, fix_extrusion.cpp:430-515,517-599).
* Break/create balance is exact by construction: a winning proposal
  replaces its bond atomically (the reference instead mutates bond tables
  and cross-checks counts with an Allreduce, fix_extrusion.cpp:788-809).

Differences (documented, statistically immaterial):
* Counter-based threefry PRNG instead of per-rank RanMars streams — barrier
  pass draws use one independent uniform per (extruder, side, event).
* Distance ties in the election break by slot index rather than MPI scan
  order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.cells import minimum_image
from ..system import System
from .config import Extrusion


def _scatter_election(targets_list, rsq, n):
    """Two-pass scatter-min election: returns per-bead winning slot id.

    targets_list: list of (idx, mask) proposals; idx (E,) bead targets,
    mask (E,) participation.  rsq (E,) is the proposal's score.
    """
    e = rsq.shape[0]
    big = jnp.asarray(jnp.finfo(rsq.dtype).max, rsq.dtype)
    best = jnp.full((n + 1,), big, rsq.dtype)
    for idx, mask in targets_list:
        safe = jnp.where(mask, idx, n)
        best = best.at[safe].min(jnp.where(mask, rsq, big))
    big_slot = jnp.int32(e + 1)
    best_slot = jnp.full((n + 1,), big_slot, jnp.int32)
    slots = jnp.arange(e, dtype=jnp.int32)
    for idx, mask in targets_list:
        safe = jnp.where(mask, idx, n)
        tied = mask & (rsq == best[safe])
        best_slot = best_slot.at[safe].min(jnp.where(tied, slots, big_slot))
    return best_slot


def make_extrusion_update(system: System, fix: Extrusion):
    """Returns update(x, types, ex_left, ex_right, occ, key)
    -> (left, right, n_moves, n_released)."""
    n = system.n
    nxt = jnp.asarray(system.next_bead)
    prv = jnp.asarray(system.prev_bead)
    neutral = fix.neutral_type - 1
    c_left = fix.ctcf_left - 1
    c_right = fix.ctcf_right - 1
    c_both = fix.ctcf_left_right - 1 if fix.ctcf_left_right > 0 else -999
    through = fix.through_prob

    release_sq = fix.release_r * fix.release_r

    def update(x, types, ex_left, ex_right, occ, key):
        e = ex_left.shape[0]
        active = ex_left >= 0
        l = jnp.where(active, ex_left, 0)
        r = jnp.where(active, ex_right, 0)

        # opt-in max-tension stall release (see Extrusion.release_r): an
        # extruder whose spring is wound past release_r unloads instead of
        # clamping FENE — checked before proposals so a released slot
        # neither moves nor blocks this event's election
        nreleased = jnp.zeros((), jnp.int32)
        if release_sq > 0.0:
            d0 = minimum_image(x[r] - x[l], system.box_size)
            wound = active & (jnp.sum(d0 * d0, axis=-1) > release_sq)
            nreleased = jnp.sum(wound).astype(jnp.int32)
            ex_left = jnp.where(wound, -1, ex_left)
            ex_right = jnp.where(wound, -1, ex_right)
            active = active & ~wound
            l = jnp.where(active, ex_left, 0)
            r = jnp.where(active, ex_right, 0)

        # target beads one hop outward along the chain (-1 off chain end)
        lt = prv[l]
        rt = nxt[r]
        lt_ok = active & (lt >= 0)
        rt_ok = active & (rt >= 0)
        lt_s = jnp.where(lt_ok, lt, 0)
        rt_s = jnp.where(rt_ok, rt, 0)

        def bead_free(b, ok):
            # chain-interior with both backbone bonds, and unoccupied
            interior = (prv[b] >= 0) & (nxt[b] >= 0)
            return ok & interior & ~occ[b]

        tl = types[lt_s]
        tr = types[rt_s]
        allowed_l = (tl == neutral) | (tl == c_left) | (tl == c_right) | (tl == c_both)
        allowed_r = (tr == neutral) | (tr == c_left) | (tr == c_right) | (tr == c_both)

        ku_l, ku_r = jax.random.split(key)
        u_l = jax.random.uniform(ku_l, (e,), jnp.float32)
        u_r = jax.random.uniform(ku_r, (e,), jnp.float32)
        blocked_l = (tl == c_left) | (tl == c_both)
        blocked_r = (tr == c_right) | (tr == c_both)
        pass_l = ~blocked_l | (through > u_l)
        pass_r = ~blocked_r | (through > u_r)

        left_ok = bead_free(lt_s, lt_ok) & allowed_l & pass_l
        right_ok = bead_free(rt_s, rt_ok) & allowed_r & pass_r

        nl = jnp.where(left_ok, lt_s, l)
        nr = jnp.where(right_ok, rt_s, r)
        moved = left_ok | right_ok

        d = minimum_image(x[nr] - x[nl], system.box_size)
        rsq = jnp.sum(d * d, axis=-1).astype(jnp.float32)

        best_slot = _scatter_election(
            [(nl, left_ok), (nr, right_ok)], rsq, n
        )
        slots = jnp.arange(e, dtype=jnp.int32)
        win_l = ~left_ok | (best_slot[jnp.where(left_ok, nl, n)] == slots)
        win_r = ~right_ok | (best_slot[jnp.where(right_ok, nr, n)] == slots)
        win = moved & win_l & win_r

        new_left = jnp.where(win, nl, ex_left)
        new_right = jnp.where(win, nr, ex_right)
        nmoves = jnp.sum(win).astype(jnp.int32)
        return new_left, new_right, nmoves, nreleased

    return update
