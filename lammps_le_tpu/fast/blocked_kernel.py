"""Lane-blocked Pallas force kernel: full VMEM-kernel coverage at any N.

The fused whole-step kernel (pallas_step.py) needs every (cap, P) plane
resident in VMEM, which caps it at the 100k-bead bench geometry
(engine.whole_planes_fit); beyond that the engine fell back to the XLA
chain at ~6.7x the per-bead cost (PERF_NOTES 1M headroom entry).  This
kernel removes the residency cliff for the FORCE evaluation — the
dominant cost — by pipelining the same Newton-half stencil
(pallas_step.make_offset_loop) over contiguous LANE chunks:

    grid = (NB,) blocks, block b owning lanes [b*CL, (b+1)*CL) of the
           flat halo-padded cell axis (CL a multiple of 128 — Mosaic
           requires 128-aligned lane blocking; an earlier x-layer-window
           design DMA'd at layer offsets and failed exactly that check
           on hardware, 2026-08-19)
    margins = M lanes each side (M >= the stencil roll reach sx+sy+sz,
           rounded to 128), precomputed in XLA as (NB, 3, cap, M)
           stacks — BlockSpec windows cannot overlap, so margins ride
           separate block-indexed inputs; the kernel assembles
           [lm | center | rm] in a VMEM scratch window
    wrap = the padded input carries M wraparound lanes on both ends
           (the whole-grid kernel's rolls are circular over P; the
           wrap path IS the x-periodic image path)
    reactions stay in-window (margin >= reach); margin reactions are
           emitted per block and folded in XLA, then all six ghost
           faces fold on the assembled planes (z -> y -> x,
           comm_brick.cpp:519 reverse_comm; linear => fold-after-sum)

This is the KOKKOS full-residency model's TPU analog (the reference
runs one hot kernel at any N per rank, /root/reference/src/KOKKOS/,
SURVEY §2.3): the hot loop stays on-device in a compiled kernel at
every scale, with BlockSpec-pipelined HBM<->VMEM staging instead of MPI
ranks.  Same call contract as engine.make_kernel (the XLA chain's
stencil): ``kernel(gx, bid, hn, pid, energy) -> (gf, e_lj, e_b, flags,
clamps)`` with halo-refreshed ``gx`` in, ghost columns of ``gf`` folded
onto owners.  Physics parity with make_kernel is pinned by
tests/test_blocked_kernel.py in interpreter mode.

Reference parity: pair_lj_cut.cpp:68-141, bond_fene.cpp:52-128,
npair_half_bin_newton.cpp:35-160, comm_brick.cpp:519 (reverse_comm).
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.grid import _OFFSETS
from ..state import FLAG_BOND_REACH, FLAG_FENE_CLAMP
from ..system import System
from .pallas_step import StencilConsts, make_halo_consts, make_offset_loop

# Target lanes per block (rounded to 128).  0 = auto (pick_cl).
BLOCK_LANES = int(os.environ.get("LLE_BLOCK_LANES", "0"))

# Empirical VMEM envelope of the compiled window kernel — MEASURED, not
# modeled, because Mosaic's register-spill volume is cap-dependent in a
# way no plane arithmetic predicts (hardware, 2026-08-19):
#   cap 9: 139.07 MB total at Wp = 46848  -> 2968 B/lane (330/cap-row)
#   cap 8: 143.57 MB total at Wp = 39808  -> 3606 B/lane (451/cap-row) —
#          the tail-less j-split (JT == cap) spills ~2.1x MORE per lane
#          than cap 9 despite executing fewer rows (config-6 compile OOM,
#          112.25 MB of spill slots).
# Caps without a calibration point extrapolate linearly from the WORST
# measured coefficient.  Budget 100 MB of the 128 MB v5e VMEM.
_BYTES_PER_LANE = {8: 3610.0, 9: 2970.0}
_VMEM_BUDGET = 100 * 1024 * 1024


def pick_cl(P: int, M: int, cap: int) -> int:
    """Largest 128-multiple chunk whose window fits the VMEM envelope
    (fewer blocks = less margin re-execution and fewer grid trips)."""
    if BLOCK_LANES > 0:
        return -(-BLOCK_LANES // 128) * 128
    bpl = _BYTES_PER_LANE.get(cap, 3610.0 / 8.0 * cap)
    wp_max = int(_VMEM_BUDGET / bpl)
    cl = max(wp_max - 2 * M, 1024)
    return -(-min(cl, P) // 128) * 128


_CALL_CACHE: dict = {}


def make_blocked_kernel(system: System, maps, ex_btype: int, *,
                        interpret: bool = False, cl: int = 0):
    dtype = jnp.dtype(system.dtype)
    assert dtype == jnp.float32, "blocked kernel is the f32 TPU path"
    n = system.n
    cap, P = maps.cap, maps.P
    sx, sy, sz = maps.strides
    cfg = system.neighbor
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    C = StencilConsts(system)

    M = -(-(sx + sy + sz) // 128) * 128     # margin: roll reach, aligned
    CL = cl or pick_cl(P, M, cap)
    CL = -(-CL // 128) * 128
    NB = -(-P // CL)
    L = NB * CL                              # padded center length
    Wp = CL + 2 * M                          # window lanes per block

    half_offsets = [(0, 0, 0)] + [o for o in _OFFSETS if o > (0, 0, 0)]
    NOFF = len(half_offsets)
    deltas = np.array(
        [(-(a * sx + b * sy + c * sz)) % Wp for (a, b, c) in half_offsets]
        + [(a * sx + b * sy + c * sz) % Wp for (a, b, c) in half_offsets],
        np.int32,
    )
    aux_np, halo_shifts, _ = make_halo_consts(system, maps)
    # interior mask over the padded center (tail garbage zeroed)
    int_pad = np.zeros(L, np.float32)
    int_pad[:P] = aux_np[6]
    far = 5.0 * float(max(system.box_size))

    def build_call(energy: bool):
        run_offsets = make_offset_loop(C, cap, Wp, NOFF, energy, interpret)

        def kernel(d_ref, xc_ref, xl_ref, xr_ref, ic_ref,
                   bc_ref, bl_ref, br_ref,
                   uc_ref, ul_ref, ur_ref,
                   pc_ref, pl_, pr_ref,
                   outf_ref, marg_ref, stats_ref,
                   xw_ref, bidw_ref, u1w_ref, pidw_ref, vw_ref,
                   facc_ref, sacc_ref):
            # assemble the [lm | center | rm] window in VMEM scratch
            xw_ref[:, :, :M] = xl_ref[0]
            xw_ref[:, :, M:M + CL] = xc_ref[...]
            xw_ref[:, :, M + CL:] = xr_ref[0]
            bidw_ref[:, :M] = bl_ref[0]
            bidw_ref[:, M:M + CL] = bc_ref[...]
            bidw_ref[:, M + CL:] = br_ref[0]
            u1w_ref[:, :M] = ul_ref[0]
            u1w_ref[:, M:M + CL] = uc_ref[...]
            u1w_ref[:, M + CL:] = ur_ref[0]
            pidw_ref[:, :M] = pl_[0]
            pidw_ref[:, M:M + CL] = pc_ref[...]
            pidw_ref[:, M + CL:] = pr_ref[0]
            # own-lane mask: interior center lanes own; margins never
            vw_ref[:, :M] = jnp.zeros((1, M), jnp.float32)
            vw_ref[:, M:M + CL] = ic_ref[...]
            vw_ref[:, M + CL:] = jnp.zeros((1, M), jnp.float32)

            bid = bidw_ref[...]
            u1 = u1w_ref[...]
            valid = jnp.where(bid < n, vw_ref[...], 0.0)
            facc_ref[...] = jnp.zeros((3, cap, Wp), jnp.float32)
            sacc_ref[...] = jnp.zeros((4, Wp), jnp.float32)
            run_offsets(d_ref, xw_ref, bid, u1, pidw_ref, valid,
                        facc_ref, sacc_ref)
            outf_ref[...] = facc_ref[:, :, M:M + CL]
            marg_ref[0, :, :, :M] = facc_ref[:, :, :M]
            marg_ref[0, :, :, M:] = facc_ref[:, :, M + CL:]
            stats_ref[0] = jnp.concatenate([
                jnp.full((1, 128), jnp.sum(sacc_ref[0:1, :]), jnp.float32),
                jnp.full((1, 128), jnp.sum(sacc_ref[1:2, :]), jnp.float32),
                jnp.full((1, 128), jnp.sum(sacc_ref[2:3, :]), jnp.float32),
                jnp.full((1, 128), jnp.sum(sacc_ref[3:4, :]), jnp.float32),
            ], axis=0)

        sm = pl.BlockSpec(memory_space=pltpu.SMEM)
        c3 = pl.BlockSpec((3, cap, CL), lambda b: (0, 0, b))
        c2 = pl.BlockSpec((cap, CL), lambda b: (0, b))
        c1 = pl.BlockSpec((1, CL), lambda b: (0, b))
        m3 = pl.BlockSpec((1, 3, cap, M), lambda b: (b, 0, 0, 0))
        m2 = pl.BlockSpec((1, cap, M), lambda b: (b, 0, 0))
        return pl.pallas_call(
            kernel,
            grid=(NB,),
            out_shape=[
                jax.ShapeDtypeStruct((3, cap, L), jnp.float32),
                jax.ShapeDtypeStruct((NB, 3, cap, 2 * M), jnp.float32),
                jax.ShapeDtypeStruct((NB, 4, 128), jnp.float32),
            ],
            in_specs=[sm,                    # deltas
                      c3, m3, m3,            # x center/left/right
                      c1,                    # interior lane rows (center)
                      c2, m2, m2,            # bid
                      c2, m2, m2,            # u1
                      c2, m2, m2],           # pid
            out_specs=[
                pl.BlockSpec((3, cap, CL), lambda b: (0, 0, b)),
                pl.BlockSpec((1, 3, cap, 2 * M), lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((1, 4, 128), lambda b: (b, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((3, cap, Wp), jnp.float32),
                pltpu.VMEM((cap, Wp), jnp.int32),
                pltpu.VMEM((cap, Wp), jnp.int32),
                pltpu.VMEM((cap, Wp), jnp.int32),
                pltpu.VMEM((1, Wp), jnp.float32),
                pltpu.VMEM((3, cap, Wp), jnp.float32),
                pltpu.VMEM((4, Wp), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(os.environ.get(
                    "LLE_VMEM_LIMIT_MB", "127")) * 1024 * 1024),
            interpret=interpret,
        )

    cache_key = (nx, ny, nz, cap, P, n, system.box_size, C.key(),
                 CL, interpret)
    calls = _CALL_CACHE.get(cache_key)
    if calls is None:
        calls = {e: build_call(e) for e in (False, True)}
        _CALL_CACHE[cache_key] = calls

    d_arr = jnp.asarray(deltas)
    int_center = jnp.asarray(int_pad)[None, :]          # (1, L)
    interior = jnp.asarray(maps.interior)
    aux_all = jnp.asarray(aux_np)
    # margin source lanes (circular over P, matching the whole-grid
    # kernel's rolls): left margin of block b = lanes [b*CL-M, b*CL),
    # right margin = [ (b+1)*CL, (b+1)*CL + M ) — both mod P.  Static
    # per-block gather indices, applied in XLA as cheap lane slices.
    lm_idx = (np.arange(NB)[:, None] * CL
              + np.arange(-M, 0)[None, :]) % P          # (NB, M)
    rm_idx = ((np.arange(NB)[:, None] + 1) * CL
              + np.arange(M)[None, :]) % P
    lm_i = jnp.asarray(lm_idx)
    rm_i = jnp.asarray(rm_idx)

    def kernel_fn(gx, bid, hn, pid, energy: bool):
        u1 = jnp.where(hn, bid + 1, n + 2)
        pad = L - P
        if pad > 0:
            gx_p = jnp.pad(gx, ((0, 0), (0, 0), (0, pad)),
                           constant_values=far)
            u1_p = jnp.pad(u1, ((0, 0), (0, pad)), constant_values=n + 2)
            bid_p = jnp.pad(bid, ((0, 0), (0, pad)), constant_values=n)
            pid_p = jnp.pad(pid, ((0, 0), (0, pad)), constant_values=-1)
        else:
            gx_p, u1_p, bid_p, pid_p = gx, u1, bid, pid

        def margins(a):
            # (..., P) -> (NB, ..., M) stacks via one static take each
            lm = jnp.moveaxis(a[..., lm_i], -2, 0)
            rm = jnp.moveaxis(a[..., rm_i], -2, 0)
            return lm, rm

        xl, xr = margins(gx)
        bl, br = margins(bid)
        ul, ur = margins(u1)
        pll, prr = margins(pid)

        out_f, marg, stats = calls[bool(energy)](
            d_arr, gx_p, xl, xr, int_center,
            bid_p, bl, br, u1_p, ul, ur, pid_p, pll, prr)

        gf = out_f[:, :, :P]
        # fold each block's margin reactions onto their owner lanes
        # (circular, mirroring the gather above)
        for b in range(NB):
            gf = gf.at[:, :, lm_idx[b]].add(marg[b, :, :, :M])
            gf = gf.at[:, :, rm_idx[b]].add(marg[b, :, :, M:])
        # ghost fold on the assembled planes, z -> y -> x
        for axis in (2, 1, 0):
            s_lo, s_hi = halo_shifts[axis]
            m_lo = aux_all[2 * axis:2 * axis + 1, :]
            m_hi = aux_all[2 * axis + 1:2 * axis + 2, :]
            keep = 1.0 - m_lo - m_hi
            gf = (gf * keep
                  + jnp.roll(gf * m_lo, (P - s_lo) % P, axis=-1)
                  + jnp.roll(gf * m_hi, (P - s_hi) % P, axis=-1))

        tots = jnp.sum(stats[:, :, 0], axis=0)
        e_lj = 0.5 * tots[0]
        e_b = 0.5 * tots[1]
        nb_found = tots[2]
        n_clamp = tots[3]
        n_links = jnp.sum(
            jnp.where(interior[None, :] & (bid < n), hn, False)
        ).astype(dtype)
        reach = jnp.where(
            0.5 * nb_found < n_links - 0.5,
            jnp.uint32(FLAG_BOND_REACH), jnp.uint32(0),
        )
        clamps = (0.5 * n_clamp).astype(jnp.int32)
        fl = reach | jnp.where(
            clamps > 0, jnp.uint32(FLAG_FENE_CLAMP), jnp.uint32(0)
        )
        return gf, e_lj, e_b, fl, clamps

    kernel_fn.block_lanes = CL
    kernel_fn.n_blocks = NB
    kernel_fn.margin = M
    return kernel_fn
