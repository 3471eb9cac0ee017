"""Lennard-Jones pair forces over the verlet list.

Physics parity with ``pair_style lj/cut`` (reference:
src/pair_lj_cut.cpp:68-141): 12-6 LJ with per-type-pair cutoff, optional
energy shift (``pair_modify shift yes``), and ``special_bonds`` scaling of
bonded pairs (reference: src/force.cpp:748-800 — style ``fene`` is lj
0,1,1, i.e. 1-2 pairs fully excluded).

TPU design: the reference encodes special-bond masks into neighbor-list
index high bits (sbmask) and rebuilds lists when topology changes.  Here
exclusions are evaluated *at force time* from the chain arrays plus the
per-bead extruder-partner array, so extruder rewiring never requires a
neighbor rebuild.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..state import NeighborList
from ..system import System
from .cells import minimum_image


# LJ evaluation floor: interactions closer than 0.75*sigma are evaluated AT
# 0.75*sigma.  Physical pairs never get there (the WCA wall is ~100 kT), but
# special/bonded pairs — whose LJ is computed at full strength by the
# exclusion-free kernels and subtracted in the correction pass — may
# interpenetrate freely; without the floor their r^-12 overflows f32 and
# poisons the force sums (inf - inf).  The floor is applied identically in
# every path so kernel and correction cancel exactly.
_RSQ_FLOOR_FRAC = 0.5625  # (0.75 sigma)^2


def _lj_tables(system: System, dtype):
    p = system.pair
    eps = jnp.asarray(p.epsilon, dtype)
    sig = jnp.asarray(p.sigma, dtype)
    cut = jnp.asarray(p.cutoff, dtype)
    sig6 = sig**6
    lj1 = 48.0 * eps * sig6 * sig6   # force r^-13 coefficient (x r)
    lj2 = 24.0 * eps * sig6
    lj3 = 4.0 * eps * sig6 * sig6    # energy r^-12 coefficient
    lj4 = 4.0 * eps * sig6
    if p.shift:
        rc6 = cut**6
        offset = lj3 / (rc6 * rc6) - lj4 / rc6
    else:
        offset = jnp.zeros_like(eps)
    floorsq = _RSQ_FLOOR_FRAC * sig * sig
    return lj1, lj2, lj3, lj4, cut**2, offset, floorsq


def _pair_terms(rsq, ti, tj, tables):
    """fpair (force/r) and pair energy for given type pair; zero beyond cutoff."""
    lj1, lj2, lj3, lj4, cutsq, offset, floorsq = tables
    one = jnp.ones_like(rsq)
    r2inv = one / jnp.maximum(rsq, floorsq[ti, tj])
    r6inv = r2inv * r2inv * r2inv
    l1 = lj1[ti, tj]
    l2 = lj2[ti, tj]
    l3 = lj3[ti, tj]
    l4 = lj4[ti, tj]
    inside = rsq < cutsq[ti, tj]
    fpair = r6inv * (l1 * r6inv - l2) * r2inv
    e = r6inv * (l3 * r6inv - l4) - offset[ti, tj]
    zero = jnp.zeros_like(rsq)
    return jnp.where(inside, fpair, zero), jnp.where(inside, e, zero)


def _special_factor(i, j, system: System, ex_partner, dtype):
    """special_bonds lj weight for pair (i, j).

    1-2 pairs: backbone neighbors and current extruder partners — matching
    the reference where a created extruder bond is spliced into the 1-2
    special list (fix_extrusion.cpp:743-771).  1-3/1-4 weights are applied
    along the static backbone; with the LE decks' ``special_bonds fene``
    (0,1,1) they are identity.  Extruder-induced 1-3/1-4 rescaling is not
    modeled (weights are 1.0 in every supported deck).
    """
    s12, s13, s14 = system.special_lj
    nxt = jnp.asarray(system.next_bead)
    prv = jnp.asarray(system.prev_bead)
    n = system.n

    def chain_hop(idx, table):
        safe = jnp.where(idx >= 0, idx, n)
        padded = jnp.concatenate([table, jnp.full((1,), -1, jnp.int32)])
        return padded[jnp.clip(safe, 0, n)]

    w = jnp.ones(j.shape, dtype)
    is12 = (j == nxt[i]) | (j == prv[i])
    if ex_partner is not None:
        is12 = is12 | (j == ex_partner[i])
    w = jnp.where(is12, jnp.asarray(s12, dtype), w)
    if s13 != 1.0:
        n2 = chain_hop(nxt[i], nxt)
        p2 = chain_hop(prv[i], prv)
        w = jnp.where((j == n2) | (j == p2), jnp.asarray(s13, dtype), w)
        if s14 != 1.0:
            n3 = chain_hop(n2, nxt)
            p3 = chain_hop(p2, prv)
            w = jnp.where((j == n3) | (j == p3), jnp.asarray(s14, dtype), w)
    return w


def lj_force_nbr(
    x: jax.Array,
    types: jax.Array,
    nbr: NeighborList,
    system: System,
    ex_partner: Optional[jax.Array] = None,
):
    """Forces + total pair energy from the verlet list.

    Full-list formulation: each pair is evaluated from both rows, so the
    force is a pure per-row reduction (no scatter) and the energy is halved.
    """
    n = system.n
    dtype = x.dtype
    tables = _lj_tables(system, dtype)

    idx = nbr.idx  # (N, K) padded with n
    xp = jnp.concatenate([x, jnp.zeros((1, 3), dtype)])
    tp = jnp.concatenate([types, jnp.zeros((1,), jnp.int32)])
    d = xp[idx] - x[:, None, :]  # (N, K, 3) r_j - r_i
    d = minimum_image(d, system.box_size)
    rsq = jnp.sum(d * d, axis=-1)
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    ti = types[:, None]
    tj = tp[idx]
    pad = idx == n
    rsq = jnp.where(pad, jnp.asarray(1e30, dtype), rsq)
    fpair, e = _pair_terms(rsq, ti, tj, tables)
    w = _special_factor(rows, idx, system, ex_partner, dtype)
    w = jnp.where(pad, jnp.zeros_like(w), w)
    fpair = fpair * w
    e = e * w
    # force on i points away from j for repulsion: f_i = -sum_j d_ij * fpair
    f = -jnp.sum(d * fpair[..., None], axis=1)
    epair = 0.5 * jnp.sum(e)
    return f, epair


def lj_force_bruteforce(
    x: jax.Array,
    types: jax.Array,
    system: System,
    ex_partner: Optional[jax.Array] = None,
):
    """O(N^2) reference path for tests and tiny boxes."""
    n = system.n
    dtype = x.dtype
    tables = _lj_tables(system, dtype)
    d = x[None, :, :] - x[:, None, :]
    d = minimum_image(d, system.box_size)
    rsq = jnp.sum(d * d, axis=-1)
    i = jnp.arange(n, dtype=jnp.int32)[:, None]
    j = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (n, n))
    # keep the self-pair out of the flop path entirely (inf*0 -> nan in f32)
    rsq = jnp.where(j == i, jnp.asarray(1e30, dtype), rsq)
    fpair, e = _pair_terms(rsq, types[:, None], types[None, :], tables)
    w = _special_factor(i, j, system, ex_partner, dtype)
    w = jnp.where(j == i, jnp.zeros_like(w), w)
    fpair = fpair * w
    e = e * w
    f = -jnp.sum(d * fpair[..., None], axis=1)
    return f, 0.5 * jnp.sum(e)
