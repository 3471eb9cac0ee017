"""Pallas TPU kernel for the fused LJ + FENE + exclusion stencil pass.

The XLA version of the fast engine's kernel (engine.make_kernel) is
HBM-bound: every one of the 27 offsets materializes (cap, cap, P)
intermediates through HBM (measured 1.9 ms at 32k, ~5.5 ms at 100k).
Here the cap x cap cross product and all accumulators stay in
VMEM/registers; only the 27 pre-shifted j-plane slabs stream in once.

Mosaic cannot access memrefs at dynamic lane offsets unless provably
128-aligned — in ANY memory space (vector loads and DMA slices both
refuse; discovered empirically).  The stencil deltas are arbitrary, so
the shifts are applied OUTSIDE the kernel by XLA (27 cheap static-slice
concats per plane) and the kernel reads the pre-shifted slabs through a
regular BlockSpec, indexing only the LEADING (offset) dimension inside a
``fori_loop`` — leading-dim dynamic indexing is unconstrained.  A fully
unrolled 27-offset body is also avoided (it made the remote Mosaic
compile effectively hang).

Identical physics to engine.make_kernel (full stencil, bonded recognition
by bead-id difference, partner exclusion, LJ evaluation floor, FENE clamp
counting, bond-reach accounting); equality is pinned by
tests/test_pallas_kernel.py in interpreter mode.  Opt-in on TPU via
LLE_FAST_PALLAS=1 until validated on hardware.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.grid import _OFFSETS
from ..ops.pair import _lj_tables
from ..state import FLAG_BOND_REACH, FLAG_FENE_CLAMP
from ..system import System

_LANE = 128
_SELF = _OFFSETS.index((0, 0, 0))


def _round_up(v, m):
    return -(-v // m) * m


def _shift_minor(a, delta, fill):
    if delta == 0:
        return a
    pad = jnp.full(a.shape[:-1] + (abs(delta),), fill, a.dtype)
    if delta > 0:
        return jnp.concatenate([a[..., delta:], pad], axis=-1)
    return jnp.concatenate([pad, a[..., :delta]], axis=-1)


def make_pallas_kernel(system: System, maps, ex_btype: int,
                       tile: int = 512, interpret: bool = False):
    """Drop-in replacement for engine.make_kernel (TPU, f32)."""
    dtype = jnp.dtype(system.dtype)
    assert dtype == jnp.float32, "pallas kernel is the f32 TPU path"
    n = system.n
    cap, P = maps.cap, maps.P
    sx, sy, sz = maps.strides
    lj1, lj2, lj3, lj4, cutsq, offe, floorsq = (
        float(np.asarray(t)[0, 0]) for t in _lj_tables(system, jnp.float32)
    )
    bts = np.asarray(system.backbone_type)
    used = bts[bts >= 0]
    if used.size:
        kf, r0f, epsf, sigf = (
            float(c) for c in np.asarray(system.bonds.coeffs)[used[0]]
        )
    else:
        kf = r0f = epsf = sigf = 0.0
    r0sq = r0f * r0f if r0f else 1.0
    wca_cutsq = 2.0 ** (1.0 / 3.0) * sigf * sigf
    wca_floorsq = 0.5625 * sigf * sigf
    bond_reach_sq = (2.0 * system.neighbor.cell_size) ** 2
    deltas = [a * sx + b * sy + c * sz for (a, b, c) in _OFFSETS]
    T = tile
    PT = _round_up(P, T)
    nt = PT // T
    FAR = -1.0e4
    C2 = cap * cap
    NOFF = len(_OFFSETS)

    interior = np.zeros(PT, np.float32)
    interior[:P] = maps.interior.astype(np.float32)
    interior_row = jnp.asarray(interior)[None, :]  # (1, PT)

    def kernel_body(energy, xs_ref, is_ref, pid_ref, int_ref, out_f, out_s):
        def rep_i(a):
            return jnp.broadcast_to(
                a[:, None, :], (cap, cap, T)
            ).reshape(C2, T)

        def rep_j(a):
            return jnp.broadcast_to(
                a[None, :, :], (cap, cap, T)
            ).reshape(C2, T)

        xi = rep_i(xs_ref[_SELF, 0])
        yi = rep_i(xs_ref[_SELF, 1])
        zi = rep_i(xs_ref[_SELF, 2])
        bi = rep_i(is_ref[_SELF, 0])
        hi = rep_i(is_ref[_SELF, 1])
        pi = rep_i(pid_ref[...])
        int_i = jnp.broadcast_to(int_ref[...], (C2, T))

        zero = jnp.zeros((C2, T), jnp.float32)
        carry0 = (zero, zero, zero, zero, zero, zero, zero)

        def offset_body(o, carry):
            fx, fy, fz, eacc, ebacc, nbacc, clacc = carry
            xj = rep_j(xs_ref[o, 0])
            yj = rep_j(xs_ref[o, 1])
            zj = rep_j(xs_ref[o, 2])
            bj = rep_j(is_ref[o, 0])
            hj = rep_j(is_ref[o, 1])

            dx = xi - xj
            dy = yi - yj
            dz = zi - zj
            rsq = dx * dx + dy * dy + dz * dz
            nz_pair = rsq > 0.0

            bonded = (
                ((bj == bi + 1) & (hi > 0)) | ((bi == bj + 1) & (hj > 0))
            )
            excl = bonded | (bj == pi)

            in_cut = rsq < cutsq
            w_lj = jnp.where(in_cut & nz_pair & (~excl), int_i, 0.0)
            rsq_lj = jnp.maximum(
                jnp.where(in_cut & nz_pair, rsq, 1.0), floorsq
            )
            r2 = 1.0 / rsq_lj
            r6 = r2 * r2 * r2
            ffac = r6 * (lj1 * r6 - lj2) * r2 * w_lj
            if energy:
                eacc = eacc + (r6 * (lj3 * r6 - lj4) - offe) * w_lj

            if kf != 0.0:
                in_reach = rsq < bond_reach_sq
                w_b = jnp.where(bonded & nz_pair & in_reach, int_i, 0.0)
                rsq_b = jnp.where(bonded & nz_pair & in_reach, rsq, 1.0)
                rlog = 1.0 - rsq_b / r0sq
                cl = rlog < 0.1
                rlog = jnp.where(cl, 0.1, rlog)
                fb = -kf / rlog
                rsq_w = jnp.maximum(rsq_b, wca_floorsq)
                sr2 = sigf * sigf / rsq_w
                sr6 = sr2 * sr2 * sr2
                wca = rsq_b < wca_cutsq
                fb = fb + jnp.where(
                    wca, 48.0 * epsf * sr6 * (sr6 - 0.5) / rsq_w, 0.0
                )
                ffac = ffac + fb * w_b
                nbacc = nbacc + w_b
                clacc = clacc + jnp.where(cl, w_b, 0.0)
                if energy:
                    ebacc = ebacc + w_b * (
                        -0.5 * kf * r0sq * jnp.log(rlog)
                        + jnp.where(
                            wca, 4.0 * epsf * sr6 * (sr6 - 1.0) + epsf, 0.0
                        )
                    )

            fx = fx + dx * ffac
            fy = fy + dy * ffac
            fz = fz + dz * ffac
            return (fx, fy, fz, eacc, ebacc, nbacc, clacc)

        fx, fy, fz, eacc, ebacc, nbacc, clacc = jax.lax.fori_loop(
            0, NOFF, offset_body, carry0
        )

        def fold(a):
            return jnp.sum(a.reshape(cap, cap, T), axis=1)

        out_f[0] = fold(fx)
        out_f[1] = fold(fy)
        out_f[2] = fold(fz)
        stats = jnp.concatenate([
            jnp.full((1, _LANE), jnp.sum(eacc), jnp.float32),
            jnp.full((1, _LANE), jnp.sum(ebacc), jnp.float32),
            jnp.full((1, _LANE), jnp.sum(nbacc), jnp.float32),
            jnp.full((1, _LANE), jnp.sum(clacc), jnp.float32),
            jnp.zeros((4, _LANE), jnp.float32),
        ], axis=0)
        out_s[0] = stats

    def build(energy):
        body = functools.partial(kernel_body, energy)
        return pl.pallas_call(
            body,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((NOFF, 3, cap, T), lambda t: (0, 0, 0, t),
                             memory_space=pltpu.VMEM),  # shifted coords
                pl.BlockSpec((NOFF, 2, cap, T), lambda t: (0, 0, 0, t),
                             memory_space=pltpu.VMEM),  # shifted bid/hn
                pl.BlockSpec((cap, T), lambda t: (0, t),
                             memory_space=pltpu.VMEM),  # pid
                pl.BlockSpec((1, T), lambda t: (0, t),
                             memory_space=pltpu.VMEM),  # interior
            ],
            out_specs=[
                pl.BlockSpec((3, cap, T), lambda t: (0, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, _LANE), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((3, cap, PT), jnp.float32),
                jax.ShapeDtypeStruct((nt, 8, _LANE), jnp.float32),
            ],
            interpret=interpret,
        )

    calls = {True: build(True), False: build(False)}

    def kernel(gx, bid, hn, pid, energy: bool):
        padt = ((0, 0), (0, 0), (0, PT - P))
        xyz = jnp.pad(gx, padt, constant_values=FAR)
        bh = jnp.stack([
            jnp.pad(bid, ((0, 0), (0, PT - P)), constant_values=n),
            jnp.pad(hn.astype(jnp.int32), ((0, 0), (0, PT - P))),
        ])
        # 27 pre-shifted copies per plane (static-slice concats; XLA fuses
        # these into simple copies — this is the one streaming pass)
        xs = jnp.stack([
            _shift_minor(xyz, d, FAR) for d in deltas
        ])                                   # (27, 3, cap, PT)
        is_ = jnp.stack([
            jnp.stack([
                _shift_minor(bh[0], d, n),
                _shift_minor(bh[1], d, 0),
            ]) for d in deltas
        ])                                   # (27, 2, cap, PT)
        pid_p = jnp.pad(pid, ((0, 0), (0, PT - P)), constant_values=-1)
        gf_pt, stats = calls[bool(energy)](xs, is_, pid_p, interior_row)
        gf = gf_pt[:, :, :P]
        tot = jnp.sum(stats[:, :4, 0], axis=0)
        e_lj = 0.5 * tot[0]
        e_b = 0.5 * tot[1]
        nb_found = tot[2]
        clamps = (0.5 * tot[3]).astype(jnp.int32)
        n_links = jnp.sum(
            jnp.where(jnp.asarray(maps.interior)[None, :] & (bid < n),
                      hn, False)
        ).astype(jnp.float32)
        reach = jnp.where(
            0.5 * nb_found < n_links - 0.5,
            jnp.uint32(FLAG_BOND_REACH), jnp.uint32(0),
        )
        fl = reach | jnp.where(
            clamps > 0, jnp.uint32(FLAG_FENE_CLAMP), jnp.uint32(0)
        )
        return gf, e_lj, e_b, fl, clamps

    return kernel
