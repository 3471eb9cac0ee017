"""Per-atom diagnostics: pe/atom, stress/atom, coord/atom.

The reference computes these as per-atom tallies inside the force loop
(src/compute_pe_atom.cpp, compute_stress_atom.cpp, compute_coord_atom.cpp
— each pair's energy/virial split half to each partner,
pair_lj_cut.cpp:110-117 ev_tally).  Here they are on-demand jitted passes
over the halo cell grid (ops/grid.py layout): the hot step loop carries no
per-atom tally cost, and the diagnostic pass re-walks the 13+self Newton
offsets accumulating HALF of each pair quantity on the i side and folding
the other half back onto the j cell with the same static shift the force
kernel uses for its reaction term.  Halo slots alias interior beads, so
the final slot->bead scatter delivers ghost-cell halves to their owners.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import grid as grid_ops
from ..ops.cells import minimum_image, wrap_positions
from ..ops.grid import _HALF_OFFSETS, _shift, halo_maps
from ..ops.pair import _lj_tables, _pair_terms
from ..state import State
from ..system import System


def _scatter_slots(vals, slot_bead, n):
    """(cap, P) per-slot -> (n,) per-bead, folding halo aliases."""
    tgt = slot_bead.reshape(-1)
    out = jnp.zeros((n + 1,), vals.dtype)
    return out.at[tgt].add(vals.reshape(-1), mode="drop")[:n]


def _sym_pair_pass(x, types, grid, system: System, want_virial: bool):
    """Symmetric per-slot accumulation of pair energy (+ virial tensor).

    Returns (e_half (cap,P), v6 (6,cap,P)|None): each in-cutoff pair
    contributes e/2 and (d_a d_b fpair)/2 to BOTH partners — the per-atom
    convention of the reference's ev_tally (pair.cpp:1000-1060).
    """
    dtype = x.dtype
    tables = _lj_tables(system, dtype)
    lj1, lj2, lj3, lj4, cutsq, offset_e, floorsq = tables
    nt = lj1.shape[0]
    pp = system.pair
    uniform = all(
        bool(np.all(np.asarray(a) == np.asarray(a).flat[0]))
        for a in (pp.epsilon, pp.sigma, pp.cutoff)
    )
    one_type = nt == 1 or uniform
    _, interior, _, strides, shifts = halo_maps(system)
    int_m = jnp.asarray(interior, dtype)[None, None, :]

    slot = grid.slot_bead
    far = jnp.asarray(-1.0e4, dtype)
    xp = jnp.concatenate([x, jnp.full((1, 3), far, dtype)])
    sh = jnp.asarray(shifts, dtype)
    gx = xp[slot, 0] + sh[None, :, 0]
    gy = xp[slot, 1] + sh[None, :, 1]
    gz = xp[slot, 2] + sh[None, :, 2]
    if not one_type:
        tp = jnp.concatenate([types, jnp.zeros((1,), jnp.int32)])
        gt = tp[slot]

    gxi, gyi, gzi = gx[:, None, :], gy[:, None, :], gz[:, None, :]
    gti = gt[:, None, :] if not one_type else None

    def block(gxj, gyj, gzj, gtj):
        dx = gxi - gxj
        dy = gyi - gyj
        dz = gzi - gzj
        rsq = dx * dx + dy * dy + dz * dz
        if one_type:
            l1, l2, l3, l4 = lj1[0, 0], lj2[0, 0], lj3[0, 0], lj4[0, 0]
            csq, eoff, fsq = cutsq[0, 0], offset_e[0, 0], floorsq[0, 0]
        else:
            pidx = gti * nt + gtj
            l1 = jnp.take(lj1.ravel(), pidx)
            l2 = jnp.take(lj2.ravel(), pidx)
            l3 = jnp.take(lj3.ravel(), pidx)
            l4 = jnp.take(lj4.ravel(), pidx)
            csq = jnp.take(cutsq.ravel(), pidx)
            eoff = jnp.take(offset_e.ravel(), pidx)
            fsq = jnp.take(floorsq.ravel(), pidx)
        mask = (rsq < csq) & (rsq > 0.0)
        w = jnp.where(mask, int_m, jnp.zeros_like(rsq))
        rsq_s = jnp.maximum(jnp.where(mask, rsq, jnp.ones_like(rsq)), fsq)
        r2inv = 1.0 / rsq_s
        r6inv = r2inv * r2inv * r2inv
        e = (r6inv * (l3 * r6inv - l4) - eoff) * w
        if want_virial:
            fpair = r6inv * (l1 * r6inv - l2) * r2inv * w
            v6 = jnp.stack([dx * dx, dy * dy, dz * dz,
                            dx * dy, dx * dz, dy * dz]) * fpair
        else:
            v6 = None
        return e, v6

    gtj0 = gt[None, :, :] if not one_type else None
    e, v6 = block(gx[None, :, :], gy[None, :, :], gz[None, :, :], gtj0)
    # self cell: each unordered pair is visited from both rows — the
    # 0.5 sum over j IS the symmetric half-share for both partners
    e_acc = 0.5 * jnp.sum(e, axis=1)
    v_acc = 0.5 * jnp.sum(v6, axis=2) if want_virial else None

    for (dxc, dyc, dzc) in _HALF_OFFSETS:
        delta = dxc * strides[0] + dyc * strides[1] + dzc * strides[2]
        gxj = _shift(gx, delta, far)[None, :, :]
        gyj = _shift(gy, delta, far)[None, :, :]
        gzj = _shift(gz, delta, far)[None, :, :]
        gtj = _shift(gt, delta, 0)[None, :, :] if not one_type else None
        e, v6 = block(gxj, gyj, gzj, gtj)
        # i side gets its half; j's half shifts back to the j cell (the
        # same -delta fold the force kernel's Newton reaction uses)
        e_acc = e_acc + 0.5 * jnp.sum(e, axis=1)
        e_acc = e_acc + 0.5 * _shift(jnp.sum(e, axis=0), -delta, 0.0)
        if want_virial:
            vi = 0.5 * jnp.sum(v6, axis=2)
            vj = _shift(0.5 * jnp.sum(v6, axis=1), -delta, 0.0)
            v_acc = v_acc + vi + vj
    return e_acc, v_acc


def _special_epair_halves(x, types, system: System, ex_left, ex_right):
    """Per-atom energy correction removing (1-w)/2 of each special pair's
    LJ from both endpoints (the per-atom twin of
    ops.forces.special_pair_correction)."""
    dtype = x.dtype
    n = system.n
    de = jnp.zeros((n,), dtype)
    s12, s13, s14 = system.special_lj
    nxt = jnp.asarray(system.next_bead)
    idx = jnp.arange(n, dtype=jnp.int32)
    tables = _lj_tables(system, dtype)

    def pair_e(i, j, w):
        d = minimum_image(x[j] - x[i], system.box_size)
        rsq = jnp.sum(d * d, axis=-1)
        _, e = _pair_terms(rsq, types[i], types[j], tables)
        return e * (1.0 - w)

    def chain_tier(de, hops, w):
        j = idx
        valid = jnp.ones((n,), bool)
        for _ in range(hops):
            valid &= j < n
            nj = nxt[jnp.where(valid, j, 0)]
            valid &= nj >= 0
            j = jnp.where(valid, nj, 0)
        ep = jnp.where(valid, pair_e(idx, j, w), 0.0)
        de = de - 0.5 * ep
        safe_j = jnp.where(valid, j, n)
        full = jnp.zeros((n + 1,), dtype).at[safe_j].add(
            0.5 * ep, mode="drop")
        return de - full[:n]

    if s12 != 1.0:
        de = chain_tier(de, 1, s12)
    if s13 != 1.0:
        de = chain_tier(de, 2, s13)
    if s14 != 1.0:
        de = chain_tier(de, 3, s14)

    if ex_left is not None and s12 != 1.0:
        active = ex_left >= 0
        li = jnp.where(active, ex_left, 0)
        ri = jnp.where(active, ex_right, 0)
        ep = jnp.where(active, pair_e(li, ri, s12), 0.0)
        safe_l = jnp.where(active, ex_left, n)
        safe_r = jnp.where(active, ex_right, n)
        acc = jnp.zeros((n + 1,), dtype)
        acc = acc.at[safe_l].add(0.5 * ep, mode="drop")
        acc = acc.at[safe_r].add(0.5 * ep, mode="drop")
        de = de - acc[:n]
    return de


def _bond_epair_halves(x, system: System, ex_left, ex_right, ex_btype):
    """Per-atom bond energy: half of each bond term to each endpoint
    (ev_tally convention, bond_fene.cpp:120-134)."""
    from ..ops.bond import _bond_terms

    dtype = x.dtype
    n = system.n
    nxt = jnp.asarray(system.next_bead)
    btype = jnp.asarray(system.backbone_type)
    valid = nxt >= 0
    j = jnp.where(valid, nxt, jnp.arange(n, dtype=jnp.int32))
    d = minimum_image(x[j] - x, system.box_size)
    rsq = jnp.sum(d * d, axis=-1)
    _, eb, _ = _bond_terms(rsq, btype, system, dtype)
    eb = jnp.where(valid, eb, 0.0)
    acc = jnp.zeros((n + 1,), dtype)
    acc = acc.at[jnp.arange(n)].add(0.5 * eb)
    acc = acc.at[jnp.where(valid, j, n)].add(0.5 * eb, mode="drop")
    if ex_left is not None and ex_btype > 0:
        active = ex_left >= 0
        li = jnp.where(active, ex_left, 0)
        ri = jnp.where(active, ex_right, 0)
        de = minimum_image(x[ri] - x[li], system.box_size)
        rsqe = jnp.sum(de * de, axis=-1)
        bt = jnp.full(ex_left.shape, ex_btype - 1, jnp.int32)
        _, ebe, _ = _bond_terms(rsqe, bt, system, dtype)
        ebe = jnp.where(active, ebe, 0.0)
        acc = acc.at[jnp.where(active, ex_left, n)].add(
            0.5 * ebe, mode="drop")
        acc = acc.at[jnp.where(active, ex_right, n)].add(
            0.5 * ebe, mode="drop")
    return acc[:n]


def make_peratom_pe_fn(system: System, ex_btype: int = -1,
                       pair: bool = True, bond: bool = True):
    """jitted state -> (n,) per-atom potential energy.

    Sum over atoms equals the thermo epair+ebond totals (pinned by
    tests/test_peratom.py); reference: src/compute_pe_atom.cpp.
    """

    @jax.jit
    def pe_atom(state: State):
        x = state.x
        xw, _ = wrap_positions(x, system, state.img)
        out = jnp.zeros((system.n,), x.dtype)
        if pair and system.pair is not None:
            grid, _ = grid_ops.build_grid(xw, system)
            e_half, _ = _sym_pair_pass(xw, state.type, grid, system, False)
            out = out + _scatter_slots(e_half, grid.slot_bead, system.n)
            out = out + _special_epair_halves(
                xw, state.type, system, state.ex_left, state.ex_right)
        if bond and system.bonds is not None:
            out = out + _bond_epair_halves(
                xw, system, state.ex_left, state.ex_right, ex_btype)
        return out

    return pe_atom


def make_stress_atom_fn(system: System, ex_btype: int = -1,
                        ke: bool = True):
    """jitted state -> (n, 6) per-atom stress*volume, LAMMPS ordering
    (xx yy zz xy xz yz) and sign (compute_stress_atom.cpp: NEGATIVE of
    the kinetic + virial tally, so sum(-(sxx+syy+szz))/(3V) = pressure)."""

    def _pair_v6(x, i, j, types, weight):
        tables = _lj_tables(system, x.dtype)
        d = minimum_image(x[j] - x[i], system.box_size)
        rsq = jnp.sum(d * d, axis=-1)
        fpair, _ = _pair_terms(rsq, types[i], types[j], tables)
        fpair = fpair * weight
        return jnp.stack([d[:, 0] * d[:, 0], d[:, 1] * d[:, 1],
                          d[:, 2] * d[:, 2], d[:, 0] * d[:, 1],
                          d[:, 0] * d[:, 2], d[:, 1] * d[:, 2]],
                         axis=-1) * fpair[:, None]

    @jax.jit
    def stress_atom(state: State):
        x = state.x
        dtype = x.dtype
        n = system.n
        xw, _ = wrap_positions(x, system, state.img)
        v6 = jnp.zeros((n, 6), dtype)
        if system.pair is not None:
            grid, _ = grid_ops.build_grid(xw, system)
            _, v_slots = _sym_pair_pass(xw, state.type, grid, system, True)
            for k in range(6):
                v6 = v6.at[:, k].add(
                    _scatter_slots(v_slots[k], grid.slot_bead, n))
            # special-pair removal, half to each endpoint
            s12 = system.special_lj[0]
            if s12 != 1.0:
                nxt = jnp.asarray(system.next_bead)
                idx = jnp.arange(n, dtype=jnp.int32)
                valid = nxt >= 0
                jb = jnp.where(valid, nxt, 0)
                dv = _pair_v6(xw, idx, jb, state.type, (1.0 - s12))
                dv = jnp.where(valid[:, None], dv, 0.0)
                v6 = v6 - 0.5 * dv
                safe_j = jnp.where(valid, nxt, n)
                v6 = v6.at[safe_j].add(-0.5 * dv, mode="drop")
                if ex_btype > 0:
                    active = state.ex_left >= 0
                    li = jnp.where(active, state.ex_left, 0)
                    ri = jnp.where(active, state.ex_right, 0)
                    dv = _pair_v6(xw, li, ri, state.type, (1.0 - s12))
                    dv = jnp.where(active[:, None], dv, 0.0)
                    sl = jnp.where(active, state.ex_left, n)
                    sr = jnp.where(active, state.ex_right, n)
                    v6 = v6.at[sl].add(-0.5 * dv, mode="drop")
                    v6 = v6.at[sr].add(-0.5 * dv, mode="drop")
        if system.bonds is not None:
            from ..ops.bond import _bond_terms

            nxt = jnp.asarray(system.next_bead)
            btype = jnp.asarray(system.backbone_type)
            valid = nxt >= 0
            jb = jnp.where(valid, nxt, jnp.arange(n, dtype=jnp.int32))
            d = minimum_image(xw[jb] - xw, system.box_size)
            rsq = jnp.sum(d * d, axis=-1)
            fb, _, _ = _bond_terms(rsq, btype, system, dtype)
            dv = jnp.stack([d[:, 0] * d[:, 0], d[:, 1] * d[:, 1],
                            d[:, 2] * d[:, 2], d[:, 0] * d[:, 1],
                            d[:, 0] * d[:, 2], d[:, 1] * d[:, 2]],
                           axis=-1) * jnp.where(valid, fb, 0.0)[:, None]
            v6 = v6 + 0.5 * dv
            v6 = v6.at[jnp.where(valid, jb, n)].add(0.5 * dv, mode="drop")
            if ex_btype > 0:
                active = state.ex_left >= 0
                li = jnp.where(active, state.ex_left, 0)
                ri = jnp.where(active, state.ex_right, 0)
                de = minimum_image(xw[ri] - xw[li], system.box_size)
                rsqe = jnp.sum(de * de, axis=-1)
                bt = jnp.full(state.ex_left.shape, ex_btype - 1, jnp.int32)
                fbe, _, _ = _bond_terms(rsqe, bt, system, dtype)
                dv = jnp.stack(
                    [de[:, 0] * de[:, 0], de[:, 1] * de[:, 1],
                     de[:, 2] * de[:, 2], de[:, 0] * de[:, 1],
                     de[:, 0] * de[:, 2], de[:, 1] * de[:, 2]],
                    axis=-1) * jnp.where(active, fbe, 0.0)[:, None]
                sl = jnp.where(active, state.ex_left, n)
                sr = jnp.where(active, state.ex_right, n)
                v6 = v6.at[sl].add(0.5 * dv, mode="drop")
                v6 = v6.at[sr].add(0.5 * dv, mode="drop")
        if ke:
            m = jnp.asarray(system.masses, dtype)[state.type]
            v = state.v
            kin = jnp.stack([v[:, 0] * v[:, 0], v[:, 1] * v[:, 1],
                             v[:, 2] * v[:, 2], v[:, 0] * v[:, 1],
                             v[:, 0] * v[:, 2], v[:, 1] * v[:, 2]],
                            axis=-1) * m[:, None]
            v6 = v6 + kin
        return -v6

    return stress_atom


def make_coord_atom_fn(system: System, cutoff: float):
    """jitted state -> (n,) neighbor counts within `cutoff`
    (src/compute_coord_atom.cpp, cstyle=cutoff).  The cutoff must fit
    inside the cell-stencil reach (cell_size), else neighbors would be
    silently missed."""
    nb = system.neighbor
    if cutoff > nb.cell_size + 1e-9:
        raise ValueError(
            f"coord/atom cutoff {cutoff} exceeds the cell stencil reach "
            f"{nb.cell_size:.4f}; rebuild with a larger skin")
    csq = float(cutoff) ** 2

    @jax.jit
    def coord_atom(state: State):
        x = state.x
        dtype = x.dtype
        xw, _ = wrap_positions(x, system, state.img)
        grid, _ = grid_ops.build_grid(xw, system)
        _, interior, _, strides, shifts = halo_maps(system)
        int_m = jnp.asarray(interior, dtype)[None, None, :]
        slot = grid.slot_bead
        far = jnp.asarray(-1.0e4, dtype)
        xp = jnp.concatenate([xw, jnp.full((1, 3), far, dtype)])
        sh = jnp.asarray(shifts, dtype)
        gx = xp[slot, 0] + sh[None, :, 0]
        gy = xp[slot, 1] + sh[None, :, 1]
        gz = xp[slot, 2] + sh[None, :, 2]
        gxi, gyi, gzi = gx[:, None, :], gy[:, None, :], gz[:, None, :]

        def counts(gxj, gyj, gzj):
            dx = gxi - gxj
            dy = gyi - gyj
            dz = gzi - gzj
            rsq = dx * dx + dy * dy + dz * dz
            mask = (rsq < csq) & (rsq > 0.0)
            return jnp.where(mask, int_m, jnp.zeros_like(rsq))

        w = counts(gx[None, :, :], gy[None, :, :], gz[None, :, :])
        c_acc = jnp.sum(w, axis=1)  # in-cell: every neighbor seen once
        for (dxc, dyc, dzc) in _HALF_OFFSETS:
            delta = dxc * strides[0] + dyc * strides[1] + dzc * strides[2]
            w = counts(_shift(gx, delta, far)[None, :, :],
                       _shift(gy, delta, far)[None, :, :],
                       _shift(gz, delta, far)[None, :, :])
            c_acc = c_acc + jnp.sum(w, axis=1)
            c_acc = c_acc + _shift(jnp.sum(w, axis=0), -delta, 0.0)
        return _scatter_slots(c_acc, grid.slot_bead, system.n)

    return coord_atom
