"""Total force assembly: pair + backbone bonds + extruder bonds.

The analog of the reference Verlet loop's force stage
(reference: src/verlet.cpp:300-320 force_clear -> pair->compute ->
bond->compute -> reverse_comm), as one pure function of positions and the
dynamic topology.  No force clearing, ghost exchange, or reverse
communication exists: forces are summed functionally on device.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..state import NeighborList
from ..system import System
from . import bond as bond_ops
from . import pair as pair_ops


class ForceResult(NamedTuple):
    f: jax.Array
    epair: jax.Array
    ebond: jax.Array
    flags: jax.Array  # uint32 sticky bits


def _pair_terms_at(x, i, j, types, system: System, weight):
    """Weighted LJ force/energy contribution of explicit pairs (i, j).

    Used to subtract special-bond pairs that the exclusion-free grid kernel
    counted at full strength (reference applies special_lj weights in-list
    via sbmask, pair_lj_cut.cpp:86-99; here the weighting is a separate
    O(bonds) pass so the O(N*27*cap^2) kernel carries no exclusion logic).
    """
    from .cells import minimum_image
    from .pair import _lj_tables, _pair_terms

    dtype = x.dtype
    tables = _lj_tables(system, dtype)
    d = minimum_image(x[j] - x[i], system.box_size)
    rsq = jnp.sum(d * d, axis=-1)
    fpair, e = _pair_terms(rsq, types[i], types[j], tables)
    fpair = fpair * weight
    e = e * weight
    # force on i is (x_i - x_j) * fpair = -d * fpair
    return -d * fpair[:, None], d * fpair[:, None], e


def special_pair_correction(x, types, system: System, ex_left, ex_right):
    """Force/energy delta removing (1 - w) of each special pair's LJ.

    Covers 1-2 backbone + extruder partners, and 1-3/1-4 backbone tiers
    when their weights differ from 1 (special_bonds, force.cpp:748-800).
    """
    dtype = x.dtype
    n = system.n
    f = jnp.zeros((n, 3), dtype)
    e = jnp.zeros((), dtype)
    s12, s13, s14 = system.special_lj
    nxt = jnp.asarray(system.next_bead)
    idx = jnp.arange(n, dtype=jnp.int32)

    def chain_tier(f, e, hops, w):
        # follow `hops` next-links; shift-based reaction (j = i + hops)
        j = idx
        valid = jnp.ones((n,), bool)
        for _ in range(hops):
            valid &= j < n
            nj = nxt[jnp.where(valid, j, 0)]
            valid &= nj >= 0
            j = jnp.where(valid, nj, 0)
        fi, fj, ep = _pair_terms_at(x, idx, j, types, system, (1.0 - w))
        vf = valid[:, None]
        fi = jnp.where(vf, fi, 0.0)
        fj = jnp.where(vf, fj, 0.0)
        f = f - fi  # subtract: kernel counted the pair fully
        f = f.at[hops:].add(-fj[:-hops] if hops else -fj)
        e = e - jnp.sum(jnp.where(valid, ep, 0.0))
        return f, e

    if s12 != 1.0:
        f, e = chain_tier(f, e, 1, s12)
    if s13 != 1.0:
        f, e = chain_tier(f, e, 2, s13)
    if s14 != 1.0:
        f, e = chain_tier(f, e, 3, s14)

    if ex_left is not None and s12 != 1.0:
        active = ex_left >= 0
        li = jnp.where(active, ex_left, 0)
        ri = jnp.where(active, ex_right, 0)
        fi, fj, ep = _pair_terms_at(x, li, ri, types, system, (1.0 - s12))
        va = active[:, None]
        fi = jnp.where(va, fi, 0.0)
        fj = jnp.where(va, fj, 0.0)
        safe_l = jnp.where(active, ex_left, n)
        safe_r = jnp.where(active, ex_right, n)
        f = f.at[safe_l].add(-fi, mode="drop")
        f = f.at[safe_r].add(-fj, mode="drop")
        e = e - jnp.sum(jnp.where(active, ep, 0.0))
    return f, e


def compute_forces(
    x: jax.Array,
    types: jax.Array,
    nbr: Optional[NeighborList],
    system: System,
    ex_left: Optional[jax.Array] = None,
    ex_right: Optional[jax.Array] = None,
    ex_btype: int = -1,
    ex_partner: Optional[jax.Array] = None,
    energy: bool = True,
) -> ForceResult:
    dtype = x.dtype
    n = system.n
    f = jnp.zeros((n, 3), dtype)
    epair = jnp.zeros((), dtype)
    ebond = jnp.zeros((), dtype)
    flags = jnp.zeros((), jnp.uint32)

    if system.pair is not None:
        if nbr is not None and system.neighbor.use_cells:
            from .grid import CellGrid, grid_pair_force

            if isinstance(nbr, CellGrid):
                # (the Pallas variant of the fused stencil kernel lives in
                # fast/pallas_kernel.py; the round-1 ops/pallas_pair.py was
                # slower than XLA and has been removed)
                fp, epair = grid_pair_force(x, types, nbr, system,
                                            energy=energy)
                fc, ec = special_pair_correction(
                    x, types, system, ex_left, ex_right
                )
                fp = fp + fc
                epair = epair + ec
            else:
                fp, epair = pair_ops.lj_force_nbr(x, types, nbr, system, ex_partner)
        else:
            fp, epair = pair_ops.lj_force_bruteforce(x, types, system, ex_partner)
        f = f + fp

    if system.bonds is not None:
        fb, eb, fl = bond_ops.backbone_bond_force(x, system)
        f = f + fb
        ebond = ebond + eb
        flags = flags | fl
        if ex_left is not None and ex_btype >= 0:
            fe, ee, fl2 = bond_ops.extruder_bond_force(
                x, ex_left, ex_right, ex_btype, system
            )
            f = f + fe
            ebond = ebond + ee
            flags = flags | fl2

    if system.angles is not None and system.angle_center_type is not None:
        from .angle import chain_angle_force

        fa, ea = chain_angle_force(x, system, energy=energy)
        f = f + fa
        # angle energy reports under emol with bonds, as thermo does
        ebond = ebond + ea

    return ForceResult(f=f, epair=epair, ebond=ebond, flags=flags)
