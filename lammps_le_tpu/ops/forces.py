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


def compute_forces(
    x: jax.Array,
    types: jax.Array,
    nbr: Optional[NeighborList],
    system: System,
    ex_left: Optional[jax.Array] = None,
    ex_right: Optional[jax.Array] = None,
    ex_btype: int = -1,
    ex_partner: Optional[jax.Array] = None,
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
                fp, epair = grid_pair_force(x, types, nbr, system, ex_partner)
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

    return ForceResult(f=f, epair=epair, ebond=ebond, flags=flags)
