"""Scalar pressure via the pair + bond virial.

Matches the reference convention (src/compute_pressure.cpp):
P = (sum m v^2 + W) / (3 V) in lj units, with W = sum_pairs r.F over
unique pairs plus bond terms.  Computed on demand at thermo boundaries by
a dedicated jitted function — the hot step loop carries no virial cost.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import grid as grid_ops
from ..ops.cells import minimum_image
from ..ops.forces import special_pair_correction
from ..ops.pair import _lj_tables, _pair_terms
from ..state import State
from ..system import System


def _pair_virial_explicit(x, i, j, types, system, weight):
    dtype = x.dtype
    tables = _lj_tables(system, dtype)
    d = minimum_image(x[j] - x[i], system.box_size)
    rsq = jnp.sum(d * d, axis=-1)
    fpair, _ = _pair_terms(rsq, types[i], types[j], tables)
    return fpair * rsq * weight


def _bond_virial(x, system, ex_left, ex_right, ex_btype):
    from ..ops.bond import _bond_terms

    dtype = x.dtype
    n = system.n
    nxt = jnp.asarray(system.next_bead)
    btype = jnp.asarray(system.backbone_type)
    valid = nxt >= 0
    j = jnp.where(valid, nxt, jnp.arange(n, dtype=jnp.int32))
    d = minimum_image(x[j] - x, system.box_size)
    rsq = jnp.sum(d * d, axis=-1)
    fbond, _, _ = _bond_terms(rsq, btype, system, dtype)
    w = jnp.sum(jnp.where(valid, fbond * rsq, 0.0))
    if ex_left is not None and ex_btype > 0:
        active = ex_left >= 0
        li = jnp.where(active, ex_left, 0)
        ri = jnp.where(active, ex_right, 0)
        de = minimum_image(x[ri] - x[li], system.box_size)
        rsqe = jnp.sum(de * de, axis=-1)
        bt = jnp.full(ex_left.shape, ex_btype - 1, jnp.int32)
        fbe, _, _ = _bond_terms(rsqe, bt, system, dtype)
        w = w + jnp.sum(jnp.where(active, fbe * rsqe, 0.0))
    return w


def make_pressure_fn(system: System, ex_btype: int = -1):
    """jitted state -> pressure scalar (lj units)."""
    vol = system.box_size[0] * system.box_size[1] * system.box_size[2]

    @jax.jit
    def pressure(state: State):
        x = state.x
        types = state.type
        dtype = x.dtype
        # fresh grid so pressure is exact at the current positions
        from ..ops.cells import wrap_positions

        xw, _ = wrap_positions(x, system, state.img)
        grid, _ = grid_ops.build_grid(xw, system)
        if system.pair is not None and system.neighbor.use_cells:
            _, _, w_pair = grid_ops.grid_pair_force(
                xw, types, grid, system, virial=True
            )
            # special-pair correction virial
            s12 = system.special_lj[0]
            if s12 != 1.0:
                nxt = jnp.asarray(system.next_bead)
                idx = jnp.arange(system.n, dtype=jnp.int32)
                valid = nxt >= 0
                jb = jnp.where(valid, nxt, 0)
                wv = _pair_virial_explicit(xw, idx, jb, types, system,
                                           (1.0 - s12))
                w_pair = w_pair - jnp.sum(jnp.where(valid, wv, 0.0))
                if ex_btype > 0:
                    active = state.ex_left >= 0
                    li = jnp.where(active, state.ex_left, 0)
                    ri = jnp.where(active, state.ex_right, 0)
                    wv = _pair_virial_explicit(xw, li, ri, types, system,
                                               (1.0 - s12))
                    w_pair = w_pair - jnp.sum(jnp.where(active, wv, 0.0))
        else:
            w_pair = jnp.zeros((), dtype)
        w_bond = (
            _bond_virial(xw, system, state.ex_left, state.ex_right, ex_btype)
            if system.bonds is not None
            else jnp.zeros((), dtype)
        )
        masses = jnp.asarray(system.masses, dtype)
        m = masses[state.type][:, None]
        ke2 = jnp.sum(m * state.v * state.v)
        return (ke2 + w_pair + w_bond) / (3.0 * vol)

    return pressure
