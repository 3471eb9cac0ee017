"""Layer-blocked Pallas force kernel: full VMEM-kernel coverage at any N.

The fused whole-step kernel (pallas_step.py) needs every (cap, P) plane
resident in VMEM, which caps it at ~400k beads; beyond that the engine
fell back to the XLA chain at ~6.7x the per-bead cost (PERF_NOTES 1M
headroom entry).  This kernel removes the residency cliff for the FORCE
evaluation — the dominant cost — by pipelining the same Newton-half
stencil (pallas_step.make_offset_loop) over x-layer slabs:

    grid = (NB,) blocks, block b owning interior layers [1+b*w, 1+(b+1)*w)
    window = the block's w layers plus one margin layer each side,
             DMA'd HBM->VMEM per grid step (pl.BlockSpec(memory_space=ANY)
             inputs + pltpu.make_async_copy), so VMEM holds ~13 window
             planes of (cap, (w+2)*sx) instead of whole (cap, P) planes
    stencil = make_offset_loop over the window (x offsets reach at most
              +-1 layer, which the margins guarantee locally; y/z wraps
              stay within one layer, so window rolls are exact for every
              in-slab i-column)
    reverse comm: y/z ghost-column reactions fold in-window (the z->y
              prefix of pallas_step's fold); x-margin reactions are
              emitted per block and folded in XLA (the x suffix), giving
              bit-identical composition to the whole-grid fold
    output = interior-relaid force planes + per-block margin reactions +
              per-block stat rows (e_lj, e_b, nb_found, n_clamp)

This is the KOKKOS full-residency model's TPU analog (the reference runs
one hot kernel at any N per rank, /root/reference/src/KOKKOS/, SURVEY
§2.3): the hot loop stays on-device in a compiled kernel at every scale,
with HBM<->VMEM staging instead of MPI ranks.  Window DMA traffic per
step is ~(1 + 2/w) x the plane bytes — at 1M beads ~100 MB against the
VPU-bound stencil cost, negligible on v5e HBM.

Same call contract as engine.make_kernel (the XLA chain's stencil):
``kernel(gx, bid, hn, pid, energy) -> (gf, e_lj, e_b, flags, clamps)``
with halo-refreshed ``gx`` in, ghost columns of ``gf`` zeroed out (all
reactions folded onto owners).  Physics parity with make_kernel is pinned
by tests/test_blocked_kernel.py in interpreter mode.

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
from .pallas_step import StencilConsts, make_offset_loop

# Interior layers per block.  The executed VPU work is proportional to
# NB * (w + 2) window layers; pick_w minimizes that subject to VMEM.
BLOCK_W = int(os.environ.get("LLE_BLOCK_W", "0"))  # 0 = auto


def pick_w(nx: int, cap: int, sx: int,
           vmem_budget_mb: float = 64.0) -> int:
    """Minimize NB*(w+2) (executed window layers) under a VMEM budget.

    ~14 (cap, (w+2)*sx) f32 window planes live at once (positions x3,
    bid/u1/pid x3, facc x3, interior/sacc/masks ~1, the out_f block ~w/
    (w+2) x3, plus (8, WW) pair-math temporaries).
    """
    if BLOCK_W > 0:
        return min(BLOCK_W, nx)
    best, best_cost = 1, None
    for w in range(1, nx + 1):
        nb = -(-nx // w)
        bytes_est = 14 * cap * (w + 2) * sx * 4
        if bytes_est > vmem_budget_mb * 1024 * 1024:
            continue
        cost = nb * (w + 2)
        if best_cost is None or cost < best_cost:
            best, best_cost = w, cost
    return best


_CALL_CACHE: dict = {}


def make_blocked_kernel(system: System, maps, ex_btype: int, *,
                        interpret: bool = False, w: int = 0):
    dtype = jnp.dtype(system.dtype)
    assert dtype == jnp.float32, "blocked kernel is the f32 TPU path"
    n = system.n
    cap, P = maps.cap, maps.P
    sx, sy, sz = maps.strides
    cfg = system.neighbor
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    NXP = nx + 2
    C = StencilConsts(system)
    kf = C.kf

    w = w or pick_w(nx, cap, sx)
    NB = -(-nx // w)
    WW = (w + 2) * sx
    # lane-pad the window to the 1024 (8x128) tile so every window plane
    # tiles cleanly; the tail garbage is out of roll-reach of any valid
    # i-column (max |shift| = sx+sy+sz < sx margin)
    WWP = -(-WW // 1024) * 1024
    # padded input length so every block's full-window DMA stays in
    # bounds (the overhang past NXP layers is masked junk)
    PP = (NB - 1) * w * sx + WW

    # per-block own-layer end within the window (start is always layer 1)
    hi_in = np.minimum(1 + (np.arange(NB) + 1) * w, nx + 1) - (
        np.arange(NB) * w)
    blk_tab = np.stack([np.arange(NB) * w * sx,       # window lane start
                        hi_in.astype(np.int64) * sx],  # own-end lane
                       axis=1).astype(np.int32)

    # window face masks: periodic per layer, and windows start on layer
    # boundaries, so ONE (5, WWP) constant serves every block.
    lane = np.arange(WWP)
    py, pz = ny + 2, nz + 2
    ly = (lane % sx) // pz
    lz = lane % pz
    in_w = lane < WW
    fm = np.zeros((5, WWP), np.float32)
    fm[0] = (ly == 0) & in_w
    fm[1] = (ly == py - 1) & in_w
    fm[2] = (lz == 0) & in_w
    fm[3] = (lz == pz - 1) & in_w
    fm[4] = (ly >= 1) & (ly <= ny) & (lz >= 1) & (lz <= nz) & in_w
    # y/z halo fold shifts within the window (reverse_comm prefix)
    fold_shifts = ((ny * sy) % WWP, ((-ny * sy) % WWP),
                   (nz * sz) % WWP, ((-nz * sz) % WWP))

    half_offsets = [(0, 0, 0)] + [o for o in _OFFSETS if o > (0, 0, 0)]
    NOFF = len(half_offsets)
    deltas = np.array(
        [(-(a * sx + b * sy + c * sz)) % WWP for (a, b, c) in half_offsets]
        + [(a * sx + b * sy + c * sz) % WWP for (a, b, c) in half_offsets],
        np.int32,
    )

    W_SX = w * sx

    def build_call(energy: bool):
        run_offsets = make_offset_loop(C, cap, WWP, NOFF, energy, interpret)

        def kernel(tab_ref, d_ref, gx_ref, u1_ref, bid_ref, pid_ref,
                   fm_ref, outf_ref, marg_ref, stats_ref,
                   xw_ref, u1w_ref, bidw_ref, pidw_ref,
                   facc_ref, sacc_ref, sems):
            b = pl.program_id(0)
            ws = tab_ref[b, 0]
            he = tab_ref[b, 1]

            dmas = []
            for c in range(3):
                dmas.append(pltpu.make_async_copy(
                    gx_ref.at[c, :, pl.ds(ws, WW)],
                    xw_ref.at[c, :, pl.ds(0, WW)], sems.at[c]))
            dmas.append(pltpu.make_async_copy(
                u1_ref.at[:, pl.ds(ws, WW)],
                u1w_ref.at[:, pl.ds(0, WW)], sems.at[3]))
            dmas.append(pltpu.make_async_copy(
                bid_ref.at[:, pl.ds(ws, WW)],
                bidw_ref.at[:, pl.ds(0, WW)], sems.at[4]))
            dmas.append(pltpu.make_async_copy(
                pid_ref.at[:, pl.ds(ws, WW)],
                pidw_ref.at[:, pl.ds(0, WW)], sems.at[5]))
            for d in dmas:
                d.start()
            for d in dmas:
                d.wait()
            if WWP > WW:
                # finite-fill the tile-pad tail: pair_math's dx = xi - XJ
                # evaluates UNMASKED before the 0/1 weights — scratch
                # garbage (NaN on the interpreter, arbitrary bits on
                # hardware) would ride dx*0 into the reaction rolls.
                # Values are irrelevant (fm/valid masks are 0 there and
                # no valid i-column's roll reaches past WW); they only
                # need to be finite.
                xw_ref[:, :, WW:WWP] = jnp.zeros(
                    (3, cap, WWP - WW), jnp.float32)
                bidw_ref[:, WW:WWP] = jnp.full(
                    (cap, WWP - WW), n, jnp.int32)
                u1w_ref[:, WW:WWP] = jnp.full(
                    (cap, WWP - WW), n + 2, jnp.int32)
                pidw_ref[:, WW:WWP] = jnp.full(
                    (cap, WWP - WW), -1, jnp.int32)

            bid = bidw_ref[...]
            u1 = u1w_ref[...]
            lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, WWP), 1)
            own = (lane_i >= sx) & (lane_i < he)
            valid = jnp.where((bid < n) & own, fm_ref[4:5, :], 0.0)

            facc_ref[...] = jnp.zeros((3, cap, WWP), jnp.float32)
            sacc_ref[...] = jnp.zeros((4, WWP), jnp.float32)
            run_offsets(d_ref, xw_ref, bid, u1, pidw_ref, valid,
                        facc_ref, sacc_ref)

            # in-window reverse comm, z then y (x is the margin fold,
            # applied by the XLA wrapper — same composition as
            # pallas_step's z->y->x fold)
            for axis in (1, 0):
                m_lo = fm_ref[2 * axis:2 * axis + 1, :]
                m_hi = fm_ref[2 * axis + 1:2 * axis + 2, :]
                keep = 1.0 - m_lo - m_hi
                f_lo, f_hi = fold_shifts[2 * axis], fold_shifts[2 * axis + 1]
                for comp in range(3):
                    F = facc_ref[comp]
                    facc_ref[comp] = (
                        F * keep
                        + pltpu.roll(F * m_lo, f_lo, 1)
                        + pltpu.roll(F * m_hi, f_hi, 1)
                    )

            outf_ref[...] = facc_ref[:, :, sx:sx + W_SX]
            marg_ref[0, :, :, :sx] = facc_ref[:, :, :sx]
            marg_ref[0, :, :, sx:] = facc_ref[:, :, pl.ds(he, sx)]
            stats_ref[0] = jnp.concatenate([
                jnp.full((1, 128), jnp.sum(sacc_ref[0:1, :]), jnp.float32),
                jnp.full((1, 128), jnp.sum(sacc_ref[1:2, :]), jnp.float32),
                jnp.full((1, 128), jnp.sum(sacc_ref[2:3, :]), jnp.float32),
                jnp.full((1, 128), jnp.sum(sacc_ref[3:4, :]), jnp.float32),
            ], axis=0)

        return pl.pallas_call(
            kernel,
            grid=(NB,),
            out_shape=[
                jax.ShapeDtypeStruct((3, cap, NB * W_SX), jnp.float32),
                jax.ShapeDtypeStruct((NB, 3, cap, 2 * sx), jnp.float32),
                jax.ShapeDtypeStruct((NB, 4, 128), jnp.float32),
            ],
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # blk_tab
                pl.BlockSpec(memory_space=pltpu.SMEM),   # deltas
                pl.BlockSpec(memory_space=pl.ANY),    # gx (padded)
                pl.BlockSpec(memory_space=pl.ANY),    # u1
                pl.BlockSpec(memory_space=pl.ANY),    # bid
                pl.BlockSpec(memory_space=pl.ANY),    # pid
                pl.BlockSpec((5, WWP), lambda b: (0, 0)),  # face masks
            ],
            out_specs=[
                pl.BlockSpec((3, cap, W_SX), lambda b: (0, 0, b)),
                pl.BlockSpec((1, 3, cap, 2 * sx), lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((1, 4, 128), lambda b: (b, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((3, cap, WWP), jnp.float32),
                pltpu.VMEM((cap, WWP), jnp.int32),
                pltpu.VMEM((cap, WWP), jnp.int32),
                pltpu.VMEM((cap, WWP), jnp.int32),
                pltpu.VMEM((3, cap, WWP), jnp.float32),
                pltpu.VMEM((4, WWP), jnp.float32),
                pltpu.SemaphoreType.DMA((6,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(os.environ.get(
                    "LLE_VMEM_LIMIT_MB", "127")) * 1024 * 1024),
            interpret=interpret,
        )

    cache_key = (nx, ny, nz, cap, P, n, system.box_size, C.key(),
                 w, interpret)
    calls = _CALL_CACHE.get(cache_key)
    if calls is None:
        calls = {e: build_call(e) for e in (False, True)}
        _CALL_CACHE[cache_key] = calls

    tab_arr = jnp.asarray(blk_tab)
    d_arr = jnp.asarray(deltas)
    fm_arr = jnp.asarray(fm)
    interior = jnp.asarray(maps.interior)
    # fold targets for each block's margins (static python ints):
    # window layer 0 = global layer b*w (ghost 0 folds onto layer nx);
    # window layer he/sx = global layer b*w + he/sx (ghost nx+1 folds
    # onto layer 1)
    lo_tgt = [nx if b == 0 else b * w for b in range(NB)]
    hi_tgt = [1 if b * w + int(hi_in[b]) == nx + 1 else b * w + int(hi_in[b])
              for b in range(NB)]

    def kernel_fn(gx, bid, hn, pid, energy: bool):
        u1 = jnp.where(hn, bid + 1, n + 2)
        pad = PP - P
        if pad > 0:
            far = 5.0 * float(max(system.box_size))
            gx_p = jnp.pad(gx, ((0, 0), (0, 0), (0, pad)),
                           constant_values=far)
            u1_p = jnp.pad(u1, ((0, 0), (0, pad)), constant_values=n + 2)
            bid_p = jnp.pad(bid, ((0, 0), (0, pad)), constant_values=n)
            pid_p = jnp.pad(pid, ((0, 0), (0, pad)), constant_values=-1)
        else:
            gx_p, u1_p, bid_p, pid_p = gx, u1, bid, pid

        out_f, marg, stats = calls[bool(energy)](
            tab_arr, d_arr, gx_p, u1_p, bid_p, pid_p, fm_arr)

        gf = jnp.zeros((3, cap, P), jnp.float32)
        gf = gf.at[:, :, sx:sx + nx * sx].set(out_f[:, :, :nx * sx])
        for b in range(NB):
            t = lo_tgt[b]
            gf = gf.at[:, :, t * sx:(t + 1) * sx].add(marg[b, :, :, :sx])
            t = hi_tgt[b]
            gf = gf.at[:, :, t * sx:(t + 1) * sx].add(marg[b, :, :, sx:])

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

    kernel_fn.block_w = w
    kernel_fn.n_blocks = NB
    return kernel_fn
