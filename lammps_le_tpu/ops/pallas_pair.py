"""Pallas TPU kernel for the halo-grid LJ pair force (exclusion-free).

Tiles the flat cell axis, holds each tile's 27-neighborhood coordinate
window in VMEM scratch, and runs all 27 stencil offsets from on-chip
memory.  Compared to the XLA version (ops/grid.py) the HBM traffic drops
to ~3x the coordinate arrays, and compared to earlier in-kernel-exclusion
designs the inner loop carries only coordinates:

* ghost cells hold pre-shifted coordinates (+-L), so there is no per-pair
  minimum-image rounding;
* special/bonded pairs are NOT masked here — the caller subtracts their
  weighted LJ separately (forces.special_pair_correction);
* empty slots hold far sentinel coordinates, so the only masks are the
  cutoff test and rsq > 0 (self pair).

Single-LJ-parameter fast path: used when every type pair shares one
(epsilon, sigma, cutoff) set — true for all LE decks.  Mixed tables fall
back to the XLA grid path.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..system import System
from .grid import CellGrid, halo_maps


def uniform_lj(system: System):
    """(lj1, lj2, lj3, lj4, cutsq, offset) floats if all type pairs share
    one parameter set, else None."""
    p = system.pair
    if p is None:
        return None
    eps = np.asarray(p.epsilon)
    sig = np.asarray(p.sigma)
    cut = np.asarray(p.cutoff)
    if not (np.all(eps == eps.flat[0]) and np.all(sig == sig.flat[0])
            and np.all(cut == cut.flat[0])):
        return None
    e, s, c = float(eps.flat[0]), float(sig.flat[0]), float(cut.flat[0])
    s6 = s**6
    lj1 = 48.0 * e * s6 * s6
    lj2 = 24.0 * e * s6
    lj3 = 4.0 * e * s6 * s6
    lj4 = 4.0 * e * s6
    off = lj3 / c**12 - lj4 / c**6 if p.shift else 0.0
    floorsq = 0.5625 * s * s  # LJ evaluation floor (ops.pair._RSQ_FLOOR_FRAC)
    return lj1, lj2, lj3, lj4, c * c, off, floorsq


def pallas_available(system: System) -> bool:
    return uniform_lj(system) is not None


def _make_kernel(coeffs, tile, wmax, strides, cap):
    # plain python floats embed as literals (captured arrays are rejected)
    lj1, lj2, lj3, lj4, cutsq, eoff, floorsq = (float(v) for v in coeffs)
    sx, sy, sz = strides
    win = tile + 2 * wmax
    win = -(-win // 128) * 128

    deltas = [
        wmax + dx_ * sx + dy_ * sy + dz_ * sz
        for dx_ in (-1, 0, 1) for dy_ in (-1, 0, 1) for dz_ in (-1, 0, 1)
    ]

    def kernel(
        xm, x0, xp, ym, y0, yp, zm, z0, zp,
        fx_o, fy_o, fz_o, e_o,
        wx, wy, wz,
    ):
        # stitch the 3-block coordinate window into VMEM scratch
        wx[:, :] = jnp.full((cap, win), -3.0e4, jnp.float32)
        wy[:, :] = jnp.full((cap, win), -3.0e4, jnp.float32)
        wz[:, :] = jnp.full((cap, win), -3.0e4, jnp.float32)
        wx[:, :wmax] = xm[:, tile - wmax:]
        wx[:, wmax : wmax + tile] = x0[:, :]
        wx[:, wmax + tile : wmax + tile + wmax] = xp[:, :wmax]
        wy[:, :wmax] = ym[:, tile - wmax:]
        wy[:, wmax : wmax + tile] = y0[:, :]
        wy[:, wmax + tile : wmax + tile + wmax] = yp[:, :wmax]
        wz[:, :wmax] = zm[:, tile - wmax:]
        wz[:, wmax : wmax + tile] = z0[:, :]
        wz[:, wmax + tile : wmax + tile + wmax] = zp[:, :wmax]

        xi = x0[:, :][:, None, :]
        yi = y0[:, :][:, None, :]
        zi = z0[:, :][:, None, :]

        def slice_branch(j0):
            def br():
                return (
                    wx[:, j0 : j0 + tile],
                    wy[:, j0 : j0 + tile],
                    wz[:, j0 : j0 + tile],
                )
            return br

        branches = [slice_branch(j0) for j0 in deltas]

        def offset_body(k, acc):
            fx, fy, fz, ea = acc
            xjr, yjr, zjr = jax.lax.switch(k, branches)
            dx = xi - xjr[None, :, :]
            dy = yi - yjr[None, :, :]
            dz = zi - zjr[None, :, :]
            rsq = dx * dx + dy * dy + dz * dz

            mask = (rsq < cutsq) & (rsq > 0.0)
            rsq_s = jnp.maximum(jnp.where(mask, rsq, jnp.float32(1.0)),
                                jnp.float32(floorsq))
            r2 = 1.0 / rsq_s
            r6 = r2 * r2 * r2
            fpair = jnp.where(mask, r6 * (lj1 * r6 - lj2) * r2,
                              jnp.float32(0.0))
            e = jnp.where(mask, r6 * (lj3 * r6 - lj4) - eoff,
                          jnp.float32(0.0))

            fx = fx + jnp.sum(dx * fpair, axis=1)
            fy = fy + jnp.sum(dy * fpair, axis=1)
            fz = fz + jnp.sum(dz * fpair, axis=1)
            ea = ea + jnp.sum(e, axis=1)
            return fx, fy, fz, ea

        zero = jnp.zeros((cap, tile), jnp.float32)
        fx, fy, fz, ea = jax.lax.fori_loop(
            0, 27, offset_body, (zero, zero, zero, zero)
        )
        fx_o[:, :] = fx
        fy_o[:, :] = fy
        fz_o[:, :] = fz
        e_o[:, :] = ea

    return kernel, win


def pallas_grid_pair_force(
    x: jax.Array,
    types: jax.Array,
    grid: CellGrid,
    system: System,
    ex_partner=None,  # unused: exclusions corrected outside the kernel
    tile: int = 1024,
):
    """Drop-in replacement for grid_pair_force on the uniform-LJ fast path."""
    dtype = x.dtype
    n = system.n
    cap, p = grid.slot_bead.shape
    _, _, _, strides, shifts = halo_maps(system)
    wmax = strides[0] + strides[1] + strides[2]
    if wmax >= tile:
        tile = -(-(wmax + 1) // 128) * 128
    coeffs = uniform_lj(system)

    slot = grid.slot_bead
    far = jnp.asarray(-1.0e4, jnp.float32)
    xp32 = jnp.concatenate(
        [x.astype(jnp.float32), jnp.full((1, 3), far, jnp.float32)]
    )
    sh = jnp.asarray(shifts, jnp.float32)
    gx = xp32[slot, 0] + sh[None, :, 0]
    gy = xp32[slot, 1] + sh[None, :, 1]
    gz = xp32[slot, 2] + sh[None, :, 2]

    # pad the minor axis to (p_tiles + 2) * tile: one guard block each side
    # so index maps t-1, t, t+1 stay in bounds.  Guard fill spreads empties.
    p_tiles = -(-p // tile)
    p_pad = (p_tiles + 2) * tile

    def padded(a, fill):
        out = jnp.full((cap, p_pad), fill, a.dtype)
        return jax.lax.dynamic_update_slice(out, a, (0, tile))

    gxp = padded(gx, jnp.float32(-2.0e4))
    gyp = padded(gy, jnp.float32(-2.0e4))
    gzp = padded(gz, jnp.float32(-2.0e4))

    kernel, win = _make_kernel(coeffs, tile, wmax, strides, cap)

    def spec(shift):
        return pl.BlockSpec(
            (cap, tile), lambda t, s=shift: (0, t + s),
            memory_space=pltpu.VMEM,
        )

    specs3 = [spec(0), spec(1), spec(2)]  # blocks t-1, t, t+1 (padded coords)
    in_specs = specs3 * 3
    out_spec = pl.BlockSpec(
        (cap, tile), lambda t: (0, t + 1), memory_space=pltpu.VMEM
    )

    outs = pl.pallas_call(
        kernel,
        grid=(p_tiles,),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((cap, p_pad), jnp.float32) for _ in range(4)
        ),
        scratch_shapes=[
            pltpu.VMEM((cap, win), jnp.float32),
            pltpu.VMEM((cap, win), jnp.float32),
            pltpu.VMEM((cap, win), jnp.float32),
        ],
    )(gxp, gxp, gxp, gyp, gyp, gyp, gzp, gzp, gzp)
    fxg, fyg, fzg, eg = (o[:, tile : tile + p] for o in outs)

    tgt = grid.scatter_bead.reshape(-1)
    f = jnp.zeros((n + 1, 3), jnp.float32)
    f = f.at[tgt, 0].add(fxg.reshape(-1), mode="drop")
    f = f.at[tgt, 1].add(fyg.reshape(-1), mode="drop")
    f = f.at[tgt, 2].add(fzg.reshape(-1), mode="drop")
    valid_e = grid.scatter_bead != n
    epair = 0.5 * jnp.sum(jnp.where(valid_e, eg, 0.0))
    return f[:n].astype(dtype), epair.astype(dtype)
