"""The fused multi-step Pallas kernel: ONE device launch per step RUN.

Round-3 measurements (PERF_NOTES.md) show this chip-through-tunnel pays a
0.3-1 ms floor per fori-loop iteration *regardless of the work inside*,
while in-kernel vector work runs at ~1 T elem-op/s and ``pltpu.roll`` along
lanes is free (<5 us even for 100 rolls).  The XLA fast path spends ~9 ms
per 100k-bead step across ~6 fused regions; this kernel collapses a full
velocity-Verlet step into ONE ``pallas_call`` — and then amortizes even
that launch plus all the XLA-side scalar plumbing by running UP TO
``limit`` consecutive steps inside a single launch (an in-kernel
``lax.while_loop`` over steps), stopping early when the reactive skin
trigger fires so the XLA driver can rebuild (the multi-step analog of
Verlet::run's per-step decide() gate, src/verlet.cpp:223 +
src/neighbor.cpp:1933).  Per executed step:

    half-kick + drift  (flagged off on the FIRST step of a launch when the
                        XLA driver already integrated/rebuilt on a boundary
                        — fix_nve.cpp:64-103; later steps always drift)
    halo refresh       (6 face copies as lane-rolls + masked blends — the
                        in-VMEM analog of Comm::forward_comm,
                        src/comm_brick.cpp:452)
    fused LJ+FENE+exclusion+spring Newton-half stencil (self + 13 offsets
                        with rolled reaction accumulation and a ghost-force
                        fold-back — pair_lj_cut.cpp:68-141 +
                        npair_half_bin_newton.cpp + comm_brick.cpp:519,
                        bond_fene.cpp:52-128, force.cpp:787) — a
                        ``fori_loop`` over offsets with DYNAMIC pltpu.roll
                        shifts, so Mosaic compiles one small body instead
                        of unrolled copies (the round-2 unrolled kernel
                        hung the remote compiler)
    extruder springs    vectorized block pass: one-hot matmul gather of
                        both anchors' same-step positions per EX_BLOCK
                        springs, elementwise FENE/harmonic spring math,
                        transpose-matmul scatter (fix_extrusion.cpp's
                        bond force via bond_harmonic.cpp:48) — covers
                        ALL active springs at any distance, so launches
                        stay multi-step; the XLA exf fallback (capped at
                        1 step) remains only for overflow-dropped anchors
    Langevin           (fix_langevin.cpp:654-674) with counter-based
                        threefry2x32 noise keyed by (run key, step, bead
                        id): the STEP enters through the threefry counter
                        (base = step*4 + component), never a per-step key
                        fold, so consecutive steps inside one launch draw
                        their own streams — trajectories are BITWISE
                        independent of slot layout AND of how steps are
                        batched into launches
    final half-kick    (fix_nve.cpp:108-140)
    skin monitor       (max displacement vs rebuild reference,
                        src/neighbor.cpp:1948) — per-bead exact one-step
                        lookahead |d| + dt*|v + kick*f| sets the
                        early-stop flag at 0.85 * half-skin (the driver
                        then rebuilds BEFORE the next step's drift, so
                        the trigger point is a hard displacement bound)
                        and the pairwise-coverage error bit at the full
                        skin margin

Physics is identical to engine.make_kernel + the XLA integrate chain
(tests/test_pallas_step.py pins both in interpreter mode).  Stencil shift
semantics: a circular lane-roll equals engine._shift_minor for every
interior i-column — wrapped j-data only ever pairs with halo/padding
i-columns, which the interior mask kills (see engine.py halo invariants).
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.grid import _OFFSETS
from ..system import System

_TF_ROT = (13, 15, 26, 6, 17, 29, 16, 24)

# Extruder-spring block width (springs per block) for the vectorized
# in-kernel spring pass.  Production LE springs are LONG (tug-of-war
# equilibrium vs the polymer: measured median 4.6 sigma ~ 3 cells at the
# bench config), so ~90% sit beyond stencil reach at any time — spring
# forces CANNOT ride the dense pid-match stencil, and per-spring scalar
# loops are O(E * plane) = ms at E ~ 500.  Instead EX_BLOCK springs at a
# time are gathered with one-hot matmuls at HIGHEST precision — exact
# for one-hots.  v3 stacks both anchors of the block on the row axis
# ([W lefts; W rights] = 2W=64 rows, still under the 128 MXU row pad):
# ONE (2W,cap)@(cap,P) row-mix + lane-mask reduce per component gathers
# BOTH sides, the per-side signed separation is xc - roll(xc, W) (top =
# xl-xr, bottom = xr-xl), and one (cap,2W)@(2W,P) STANDARD-layout dot
# per component scatters both reactions — 6 dots/block total.  (v2 used
# 12 dots at W rows each, ~2 ms/step at E=500 on hardware; a 6W-row
# all-components variant spilled 227 MB of Mosaic registers; v1's dim-0-
# contraction scatters forced relayouts.)  O(E * P) total, no
# launch-span restriction.  32 springs per block balances fori trips
# against (2W, P) mask VMEM (~8 MB each at 100k); LLE_EX_BLOCK sweeps
# the tradeoff on hardware (64 -> 2W=128 = a full MXU row pad, half the
# fori trips, double the mask VMEM).
EX_BLOCK = int(os.environ.get("LLE_EX_BLOCK", "32"))
# v5 windowed spring blocks: blocks whose anchors all fall in one
# EX_WN-lane window run their one-hot/mask intermediates on
# (2W, EX_WN) slices via 128-aligned dynamic lane windows instead of
# (2W, P) full planes — the block pass cost was the per-block (2W, P)
# VPU intermediates (PERF_NOTES E-scaling table), so the windowed loop
# cuts it by ~P/EX_WN.  0 disables (all blocks full-P).
EX_WN = int(os.environ.get("LLE_EX_WN", "4096"))


def ex_window(P: int) -> int:
    """Static window width for the v5 windowed spring blocks at plane
    width P — 0 disables windowing (grid too small for one window +
    128-aligned base to always fit, or env-disabled).  Single source of
    truth: the kernel and engine._ex_block_table must agree EXACTLY or
    windowed blocks read the wrong lanes."""
    return EX_WN if 0 < EX_WN <= P - 128 else 0

# Approximate VPU reciprocal + one Newton-Raphson refinement replaces the
# two exact f32 divisions of the pair slab (multi-op VPU sequences).  The
# raw approximate instruction has ~1.6e-5 max rel err (measured on this
# v5e, benchmarks/probe_rcp.py) which the r^-14 LJ chain amplifies ~7x —
# hardware force parity failed at 9.4e-3 absolute (7e-5 relative) against
# the exact-division XLA chain.  One NR step r*(2 - x*r) squares the
# error to ~2.6e-10, below f32 roundoff, for 2 extra VPU ops: hw_parity
# passes at its 3e-5 tolerance.  TPU-real-mode only: interpret-mode CI
# and the XLA chain keep exact division, so CPU parity tests are
# bit-identical.
APPROX_RCP = os.environ.get("LLE_APPROX_RCP", "1") == "1"


def near_springs_enabled(system: System, ex_btype: int) -> bool:
    """Single source of truth for the near-spring stencil split — the
    kernel (make_step_kernel) and the table builder
    (engine._ex_block_table callers) must agree EXACTLY, else springs
    are dropped or double-counted.  Requires: the feature flag, a
    harmonic extruder bond style (FENE extruder bonds keep the block
    pass), and >= 3 interior cells per axis (below that a cell can see
    the same cell through two halo aliases and the visibility argument
    breaks)."""
    if os.environ.get("LLE_NEAR_SPRINGS", "0") != "1":
        return False
    if ex_btype <= 0 or system.bonds is None:
        return False
    from ..system import BOND_HARMONIC as _BH

    if int(np.asarray(system.bonds.style)[ex_btype - 1]) != _BH:
        return False
    if float(np.asarray(system.bonds.coeffs)[ex_btype - 1][0]) == 0.0:
        return False
    nb = system.neighbor
    return min(nb.nx, nb.ny, nb.nz) >= 3


def _threefry2x32(k0, k1, c0, c1):
    """threefry2x32 (Salmon et al. 2011), 20 rounds — must stay bit-exact
    with engine._threefry2x32 so XLA/Pallas trajectories interleave."""
    ks2 = k0 ^ k1 ^ jnp.uint32(0x1BD11BDA)
    ks = (k0, k1, ks2)
    x0 = c0 + k0
    x1 = c1 + k1
    for i in range(5):
        for j in range(4):
            r = _TF_ROT[4 * (i % 2) + j]
            x0 = x0 + x1
            x1 = (x1 << r) | (x1 >> (32 - r))
            x1 = x1 ^ x0
        x0 = x0 + ks[(i + 1) % 3]
        x1 = x1 + ks[(i + 2) % 3] + jnp.uint32(i + 1)
    return x0, x1


class StencilConsts:
    """Pair/bond physics constants shared by every stencil kernel shape
    (the whole-grid fused kernel, the layer-blocked 1M kernel, the
    sharded per-slab kernel).  Plain attributes, all trace-time floats /
    bools — geometry (cap, window width) stays with the caller."""

    def __init__(self, system: System):
        # numpy mirror of ops.pair._lj_tables in f32 (same op order):
        # the jnp version becomes TRACED when a kernel builder runs
        # inside a jitted to_fast/segment trace (system's arrays fold
        # into tracer constants), and np.asarray on a tracer throws —
        # the blocked-kernel selection path hit exactly that (hardware
        # 2026-08-19).  Values land as trace-time python floats either
        # way; production sigma/eps are 1.0 so the f32 rounding of both
        # pipelines is identical (parity suites pin the kernels against
        # the _lj_tables-based XLA chain regardless).
        pp = system.pair
        eps = np.asarray(pp.epsilon, np.float32)[0, 0]
        sig = np.asarray(pp.sigma, np.float32)[0, 0]
        cut = np.asarray(pp.cutoff, np.float32)[0, 0]
        s2 = sig * sig
        sig6 = s2 * s2 * s2
        self.lj1 = float(np.float32(48.0 * eps * sig6 * sig6))
        self.lj2 = float(np.float32(24.0 * eps * sig6))
        self.lj3 = float(np.float32(4.0 * eps * sig6 * sig6))
        self.lj4 = float(np.float32(4.0 * eps * sig6))
        self.cutsq = float(np.float32(cut * cut))
        if pp.shift:
            c2 = cut * cut
            rc6 = np.float32(c2 * c2 * c2)
            self.offe = float(
                np.float32(self.lj3 / (rc6 * rc6) - self.lj4 / rc6))
        else:
            self.offe = 0.0
        from ..ops.pair import _RSQ_FLOOR_FRAC

        self.floorsq = float(np.float32(_RSQ_FLOOR_FRAC * sig * sig))
        bts = np.asarray(system.backbone_type)
        used = bts[bts >= 0]
        if used.size:
            self.kf, self.r0f, self.epsf, self.sigf = (
                float(c) for c in np.asarray(system.bonds.coeffs)[used[0]]
            )
        else:
            self.kf = self.r0f = self.epsf = self.sigf = 0.0
        self.r0sq = self.r0f * self.r0f if self.r0f else 1.0
        # trace-time scalar: strength-reduce the per-pair rsq/r0sq
        # division to a multiply
        self.inv_r0sq = 1.0 / self.r0sq
        self.wca_cutsq = 2.0 ** (1.0 / 3.0) * self.sigf * self.sigf
        self.wca_floorsq = 0.5625 * self.sigf * self.sigf
        self.bond_reach_sq = (2.0 * system.neighbor.cell_size) ** 2
        # Kremer-Grest work-share: when the FENE bond's (sigma, epsilon)
        # equal the LJ pair's, the WCA term of bond_fene.cpp:68-76 is the
        # SAME polynomial r6*(lj1*r6 - lj2)*r2 as pair_lj_cut.cpp:119
        # (48 eps sr6 (sr6-0.5) r2 with sr6 = sigma^6 r6), and the two
        # evaluation floors coincide — so ONE force-factor chain serves
        # both under a combined mask instead of a second ~10-op WCA chain
        # per pair slab.  The sums are float-commutative products by 0/1
        # weights, so the merged form is BITWISE identical to the split
        # form (parity tests unchanged).
        pp_sys = system.pair
        self.wca_is_lj = bool(
            self.kf != 0.0
            and pp_sys is not None
            and self.sigf == float(np.asarray(pp_sys.sigma).flat[0])
            and self.epsf == float(np.asarray(pp_sys.epsilon).flat[0])
            and abs(self.wca_floorsq - self.floorsq) < 1e-12
        )

    def key(self):
        return (round(self.kf, 12), round(self.r0f, 12),
                round(self.epsf, 12), round(self.sigf, 12),
                round(self.lj1, 12), round(self.cutsq, 12),
                round(self.bond_reach_sq, 12), self.wca_is_lj)


def make_offset_loop(C: StencilConsts, cap: int, PW: int, NOFF: int,
                     energy: bool, interpret: bool, near_ex=None):
    """Build the Newton-half offset fori-loop over (cap, PW) planes.

    Returns ``run(d_ref, ox_ref, bid, u1, pid_ref, valid, facc_ref,
    sacc_ref, sp_on)`` accumulating LJ+FENE forces into ``facc_ref``
    (3, cap, PW) and [e_lj, e_b, nb_found, n_clamp] rows into
    ``sacc_ref`` (4, PW).  ``pid_ref`` is the partner-id REF (loaded per
    offset — see the register-pressure note in the offset body).
    ``d_ref`` holds 2*NOFF roll shifts (forward, reaction);
    ``ox_ref`` is indexable [c] -> (cap, PW) post-halo positions; ``u1``
    is the chain-code plane (bid+1 where has-next else sentinel).  The
    window width PW is the caller's: the whole padded grid for the fused
    kernel, one 3-layer slab window for the blocked/sharded kernels
    (their margins guarantee every in-range j-column exists locally).

    ``near_ex``: (khe2, khr0, khe, r0he) harmonic extruder-spring
    constants, or None.  When set, stencil-VISIBLE extruder pairs
    (``BJ == pi`` — the same partner plane the LJ exclusion reads, valid
    because occupancy-stall keeps <=1 anchor per bead) get the harmonic
    bond force fused into the pair chain: fbond/r = -2k(r-r0)/r =
    khr0/r - khe2 on its OWN rsqrt (bond_harmonic.cpp:48) — NOT on the
    shared LJ reciprocal: routing it through rsq_den extended that
    value's live range across the unrolled j-split and hit the Mosaic
    register-spill cliff (242.96 MB VMEM, hardware 2026-08-19).  The
    engine then keeps only stencil-INVISIBLE springs in the block table
    (engine._ex_block_table near split) — visibility == rebuild-cell
    adjacency, exact for the whole launch because the grid-resident
    cells are frozen between rebuilds.
    ``sp_on`` (f32 0/1) gates the term at run time: the exf-fallback
    launch covers ALL springs via XLA planes and must suppress it; it
    enters only through launch-scalar-gated spring constants, costing
    the inner loop nothing.
    """
    if APPROX_RCP and not interpret:
        def _rcp(x):
            r = pl.reciprocal(x, approx=True)
            return r * (2.0 - x * r)
    else:
        def _rcp(x):
            return 1.0 / x
    (lj1, lj2, lj3, lj4, cutsq, offe, floorsq) = (
        C.lj1, C.lj2, C.lj3, C.lj4, C.cutsq, C.offe, C.floorsq)
    kf, r0sq, inv_r0sq = C.kf, C.r0sq, C.inv_r0sq
    sigf, epsf = C.sigf, C.epsf
    wca_cutsq, wca_floorsq = C.wca_cutsq, C.wca_floorsq
    bond_reach_sq, wca_is_lj = C.bond_reach_sq, C.wca_is_lj
    if near_ex is not None:
        khe2, khr0, khe_c, r0he_c = near_ex
    P = PW

    def run(d_ref, ox_ref, bid, u1, pid_ref, valid, facc_ref, sacc_ref,
            sp_on=None):
        if near_ex is not None:
            if sp_on is None:
                sp_on = jnp.ones((), jnp.float32)
            # launch-scalar gating: fold sp_on into the spring constants
            # once, so the per-element term needs no extra multiply
            khr0_g = khr0 * sp_on
            khe2_g = khe2 * sp_on
            khe_g = khe_c * sp_on
        def offset_body(o, carry):
            # pid loads PER OFFSET (matching the r3 kernel): hoisting it
            # out of the fori made the value live across the whole loop
            # and fed the register-pressure cliff (see the note below)
            pidp = pid_ref[...]
            d = d_ref[o]
            rd = d_ref[o + NOFF]
            # self cell (o=0): both pair orders iterate naturally — no
            # reaction, unit energy weight.  Half offsets: reaction
            # rows rolled onto the j columns, energies at weight 2
            # (the engine halves, matching the full-stencil
            # convention).
            react = jnp.where(o > 0, 1.0, 0.0).astype(jnp.float32)
            wgt = 1.0 + react
            X = ox_ref[0]
            Y = ox_ref[1]
            Z = ox_ref[2]
            Xj = pltpu.roll(X, d, 1)
            Yj = pltpu.roll(Y, d, 1)
            Zj = pltpu.roll(Z, d, 1)
            Bj = pltpu.roll(bid, d, 1)
            U1j = pltpu.roll(u1, d, 1)

            def pair_math(xi, yi, zi, bi, u1i, pi, w_i,
                          XJ, YJ, ZJ, BJ, U1J):
                # LJ + FENE + exclusion math for one broadcastable
                # (i-slab, j-slab) combination; energies and bond
                # sighting/clamp tallies reduce into sacc_ref HERE (a
                # sublane reduction per pass — returning the (rows, P)
                # masks for caller-side accumulation chained 5 live
                # accumulator planes through the unrolled i loop and
                # blew Mosaic's register allocator: 114.75 MB of spill
                # slots, hardware 2026-08-19); returns force components.
                dx = xi - XJ
                dy = yi - YJ
                dz = zi - ZJ
                rsq = dx * dx + dy * dy + dz * dz
                nz_pair = rsq > 0.0

                # u1 encodes (bid+1, has-next) in one plane; a
                # self-pair (BJ == bi) can never satisfy either
                # direction, so bonded needs no nz_pair guard
                bonded = (BJ == u1i) | (bi == U1J)

                in_cut = rsq < cutsq
                if kf != 0.0:
                    in_reach = rsq < bond_reach_sq
                    w_b_m = bonded & in_reach
                lj_ok = (in_cut & nz_pair) & (~bonded) & (BJ != pi)
                if near_ex is not None:
                    # stencil-visible extruder spring (pid is symmetric;
                    # pi >= 0 rejects empty-slot sentinels, ~bonded keeps
                    # the denominator masks disjoint — backbone-adjacent
                    # springs stay in the block table by construction)
                    sp = (BJ == pi) & (pi >= 0) & (~bonded)
                if wca_is_lj:
                    # merged Kremer-Grest path: one force-factor
                    # polynomial under the (LJ | bonded-WCA) mask
                    pair_ok = lj_ok | (w_b_m & (rsq < wca_cutsq))
                    rsq_den = jnp.maximum(
                        jnp.where(pair_ok, rsq, 1.0), floorsq)
                    w12 = jnp.where(pair_ok, w_i, 0.0)
                    r2 = _rcp(rsq_den)
                    r6 = r2 * r2 * r2
                    ffac = r6 * (lj1 * r6 - lj2) * r2 * w12
                else:
                    w12 = jnp.where(lj_ok, w_i, 0.0)
                    bonded_nz = bonded & nz_pair
                    rsq_den = jnp.where(
                        bonded_nz,
                        jnp.maximum(rsq, wca_floorsq),
                        jnp.maximum(
                            jnp.where(in_cut & nz_pair, rsq, 1.0),
                            floorsq),
                    )
                    r2 = _rcp(rsq_den)
                    r6 = r2 * r2 * r2
                    ffac = r6 * (lj1 * r6 - lj2) * r2 * w12
                if near_ex is not None:
                    # harmonic spring on its own rsqrt (register-pressure
                    # note in the docstring): fbond/r = 2k*r0/r - 2k
                    # (bond_harmonic.cpp:48); sp_on gating rides the
                    # pre-folded _g constants
                    rinv = jax.lax.rsqrt(jnp.maximum(rsq, 1e-12))
                    ffac = ffac + jnp.where(
                        sp, w_i * (khr0_g * rinv - khe2_g), 0.0)
                    if energy:
                        drs = rsq * rinv - r0he_c
                        sacc_ref[1:2, :] += wgt * jnp.sum(
                            jnp.where(sp, w_i * (khe_g * drs * drs), 0.0),
                            axis=0, keepdims=True)
                if energy:
                    w_lj = (jnp.where(lj_ok, w_i, 0.0)
                            if wca_is_lj else w12)
                    sacc_ref[0:1, :] += jnp.sum(
                        (wgt * (r6 * (lj3 * r6 - lj4) - offe)) * w_lj,
                        axis=0, keepdims=True)
                if kf != 0.0:
                    w_b = jnp.where(w_b_m, w_i, 0.0)
                    rsq_b = jnp.where(bonded, rsq, 1.0)
                    rlog = 1.0 - rsq_b * inv_r0sq
                    cl = rlog < 0.1
                    # max == where(cl, 0.1, rlog) bitwise (rlog may
                    # be negative; never NaN — rsq_b is finite)
                    rlogc = jnp.maximum(rlog, 0.1)
                    fb = (-kf) * _rcp(rlogc)
                    if not wca_is_lj:
                        sr2 = (sigf * sigf) * r2
                        sr6 = sr2 * sr2 * sr2
                        wca = rsq_b < wca_cutsq
                        fb = fb + jnp.where(
                            wca,
                            48.0 * epsf * sr6 * (sr6 - 0.5) * r2, 0.0)
                    ffac = ffac + fb * w_b
                    sacc_ref[2:3, :] += wgt * jnp.sum(
                        w_b, axis=0, keepdims=True)
                    sacc_ref[3:4, :] += wgt * jnp.sum(
                        jnp.where(cl, w_b, 0.0), axis=0, keepdims=True)
                    if energy:
                        if wca_is_lj:
                            sr2e = (sigf * sigf) * r2
                            sr6e = sr2e * sr2e * sr2e
                            wcae = rsq_b < wca_cutsq
                        else:
                            sr6e = sr6
                            wcae = wca
                        sacc_ref[1:2, :] += wgt * jnp.sum(
                            w_b * (-0.5 * kf * r0sq * jnp.log(rlogc)
                                   + jnp.where(
                                       wcae,
                                       4.0 * epsf * sr6e * (sr6e - 1.0)
                                       + epsf,
                                       0.0)),
                            axis=0, keepdims=True)
                return dx * ffac, dy * ffac, dz * ffac

            # The j-side slab is split on the f32 sublane tile (8
            # rows): rows >= 8 of the rolled planes would pad every
            # (cap, P) op in the i loop to TWO sublane tiles (cap=9
            # costs 16 rows of VPU work per op).  Instead the i loop
            # runs against the single-tile 8-row block, and each tail
            # j-row is one extra pass broadcast against the whole i
            # plane — 9x1-tile + 1x2-tile instead of 9x2-tile ops.
            JT = min(cap, 8)
            # Newton reactions for ALL i-rows share this offset's
            # roll shift: accumulate them across the i loop and roll
            # ONCE per component (was per-i — 24 full-plane rolls and
            # adds per offset, ~20% of the stencil cost).  Exactly
            # THREE register accumulator chains — the r3 structure.
            # Adding two more (bond tallies) pushed Mosaic's register
            # allocator over a spill cliff (114.75 MB of spill slots,
            # 100k step 6.6 -> 18-40 ms, hardware bisect 2026-08-19);
            # tallies reduce inside pair_math instead.
            rax = jnp.zeros((JT, P), jnp.float32)
            ray = jnp.zeros((JT, P), jnp.float32)
            raz = jnp.zeros((JT, P), jnp.float32)
            XjB, YjB, ZjB = Xj[:JT], Yj[:JT], Zj[:JT]
            BjB, U1jB = Bj[:JT], U1j[:JT]
            for i in range(cap):
                cx, cy, cz = pair_math(
                    X[i:i + 1, :], Y[i:i + 1, :], Z[i:i + 1, :],
                    bid[i:i + 1, :], u1[i:i + 1, :], pidp[i:i + 1, :],
                    valid[i:i + 1, :],
                    XjB, YjB, ZjB, BjB, U1jB)
                facc_ref[0, i:i + 1, :] += jnp.sum(
                    cx, axis=0, keepdims=True)
                facc_ref[1, i:i + 1, :] += jnp.sum(
                    cy, axis=0, keepdims=True)
                facc_ref[2, i:i + 1, :] += jnp.sum(
                    cz, axis=0, keepdims=True)
                rax = rax + cx
                ray = ray + cy
                raz = raz + cz
            # tail j-rows: one pass per row >= JT, i side = whole plane
            tails = []
            for jt in range(JT, cap):
                cx, cy, cz = pair_math(
                    X, Y, Z, bid, u1, pidp, valid,
                    Xj[jt:jt + 1, :], Yj[jt:jt + 1, :],
                    Zj[jt:jt + 1, :], Bj[jt:jt + 1, :],
                    U1j[jt:jt + 1, :])
                facc_ref[0, :, :] += cx
                facc_ref[1, :, :] += cy
                facc_ref[2, :, :] += cz
                tails.append((jnp.sum(cx, axis=0, keepdims=True),
                              jnp.sum(cy, axis=0, keepdims=True),
                              jnp.sum(cz, axis=0, keepdims=True)))
            if tails:
                rax = jnp.concatenate([rax] + [t[0] for t in tails], 0)
                ray = jnp.concatenate([ray] + [t[1] for t in tails], 0)
                raz = jnp.concatenate([raz] + [t[2] for t in tails], 0)
            # Newton reaction onto the j rows, rolled to their columns
            facc_ref[0, :, :] += (-react) * pltpu.roll(rax, rd, 1)
            facc_ref[1, :, :] += (-react) * pltpu.roll(ray, rd, 1)
            facc_ref[2, :, :] += (-react) * pltpu.roll(raz, rd, 1)
            return carry

        jax.lax.fori_loop(
            0, NOFF, offset_body, jnp.zeros((), jnp.int32))

    return run


def make_halo_consts(system: System, maps):
    """Static halo-face data: aux mask plane + roll shifts + coord shifts.

    aux rows: 0/1 = x lo/hi face, 2/3 = y lo/hi, 4/5 = z lo/hi,
    6 = interior, 7 = zero.  Faces are the PADDED grid's ghost layers;
    face masks are applied sequentially x->y->z so edges/corners compose
    exactly like the rebuild-time src_cols duplication map.
    """
    cfg = system.neighbor
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    px, py, pz = nx + 2, ny + 2, nz + 2
    P = maps.P
    p_raw = maps.p_raw
    sx, sy, sz = maps.strides
    ix, iy, iz = np.meshgrid(
        np.arange(px), np.arange(py), np.arange(pz), indexing="ij"
    )
    def flat(m):
        out = np.zeros(P, np.float32)
        out[:p_raw] = m.reshape(-1).astype(np.float32)
        return out

    aux = np.zeros((8, P), np.float32)
    aux[0] = flat(ix == 0)
    aux[1] = flat(ix == px - 1)
    aux[2] = flat(iy == 0)
    aux[3] = flat(iy == py - 1)
    aux[4] = flat(iz == 0)
    aux[5] = flat(iz == pz - 1)
    aux[6, :] = maps.interior.astype(np.float32)
    # roll shift s such that roll(X, s)[c] = X[c - s]: lo face reads the
    # +n*stride column, hi face the -n*stride column
    shifts = [
        ((-nx * sx) % P, (nx * sx) % P),
        ((-ny * sy) % P, (ny * sy) % P),
        ((-nz * sz) % P, (nz * sz) % P),
    ]
    box = np.asarray(system.box_size, np.float64)
    return aux, shifts, box


def make_step_kernel(system: System, maps, ex_btype: int, *,
                     dt: float, langevin, energy: bool,
                     interpret: bool = False):
    """Build the fused multi-step kernel.

    Returns ``call(gx, gv, gf, exf, gxref, bid, hn, pid, sstep, do_drift,
    key_words, t0, t_slope, limit) -> (gx1, gv2, ftot, stats)`` advancing
    ``d`` = 1..limit steps (early-stopped by the reactive skin trigger) in
    one device launch.  stats rows are [e_lj, e_b, nb_found, n_clamp,
    n_links, skin_bad, trig, steps_done] broadcast over lanes (read
    stats[k, 0]); e_lj/e_b are the LAST executed step's sums (callers gate
    energy steps to limit=1 launches).

    ``dt`` and the Langevin coefficients enter through an SMEM scalar
    vector, NOT as baked constants: one Mosaic compile serves every
    Simulation over the same system geometry (thermalize / settle /
    production differ only in dt and damp, and a remote-tunnel compile
    costs minutes).  Kernels are cached per (geometry, energy, langevin?).
    """
    dtype = jnp.dtype(system.dtype)
    assert dtype == jnp.float32, "pallas step kernel is the f32 TPU path"
    n = system.n
    cap, P = maps.cap, maps.P
    sx, sy, sz = maps.strides
    C = StencilConsts(system)
    kf = C.kf

    # extruder-spring coefficients for the in-kernel block spring pass
    # (bond_harmonic.cpp:48 / bond_fene.cpp:52; engine.ex_force_planes is
    # the overflow-dropped-anchor fallback)
    E_tab = max(system.max_extruders, 1)
    EPAD = -(-E_tab // EX_BLOCK) * EX_BLOCK
    NBLK = EPAD // EX_BLOCK
    if ex_btype > 0:
        from ..system import BOND_HARMONIC as _BH

        style_ex = int(np.asarray(system.bonds.style)[ex_btype - 1])
        khe, r0he, epshe, sighe = (
            float(c) for c in np.asarray(system.bonds.coeffs)[ex_btype - 1]
        )
        ex_harmonic = style_ex == _BH
    else:
        ex_harmonic = True
        khe = r0he = epshe = sighe = 0.0
    # near-spring stencil fusion: harmonic springs between beads whose
    # rebuild cells are stencil-adjacent ride the pair chain; only the
    # stencil-INVISIBLE remainder goes through the block pass.  The
    # engine's table builder makes the SAME decision through
    # near_springs_enabled() so coverage is exactly complementary.
    near_split = near_springs_enabled(system, ex_btype)

    units = system.units
    mass = float(np.asarray(system.masses).flat[0])
    dtf = 0.5 * dt * units.ftm2v
    kick = dtf / mass
    # half-skin bound from the real cell margin (engine.make_fast_segment)
    min_edge = min(
        b / d for b, d in zip(
            system.box_size,
            (system.neighbor.nx, system.neighbor.ny, system.neighbor.nz),
        )
    )
    pp = system.pair
    max_cut = float(np.max(np.asarray(pp.cutoff))) if pp is not None else 0.0
    halfskin_sq = (0.5 * max(min_edge - max_cut, 1e-6)) ** 2

    lan = langevin
    if lan is not None:
        gamma1_v = -mass / lan.damp / units.ftm2v
        gamma2_base = float(
            np.sqrt(mass)
            * np.sqrt(24.0 * units.boltz / (lan.damp * dt) / units.mvv2e)
            / units.ftm2v
        )
    # fix langevin zero/group ride the kernel (fix_langevin.cpp:438-674
    # keeps every option in the one hot path): zero = one in-kernel mean
    # subtract per component per step, group = a 0/1 membership plane
    # (engine FastState.lgm, rebuilt with the grid) extra input
    lan_zero = bool(lan is not None and lan.zero)
    lan_group = bool(lan is not None and lan.group is not None)

    # Newton-half stencil (npair_half_bin_newton.cpp:35-160 in spirit):
    # self cell + the 13 lexicographically-positive offsets; each half
    # offset also accumulates the REACTION onto the j-side rows (rolled
    # back by the forward cell shift), and ghost-accumulated reactions are
    # folded onto their owner columns after the loop (reverse_comm,
    # src/comm_brick.cpp:519).  Halves the offset loop: the kernel is
    # VPU-bound at ~0.16 ms per offset (PERF_NOTES round-3 table).
    half_offsets = [(0, 0, 0)] + [
        o for o in _OFFSETS if o > (0, 0, 0)
    ]
    deltas = np.array(
        [(-(a * sx + b * sy + c * sz)) % P for (a, b, c) in half_offsets]
        + [(a * sx + b * sy + c * sz) % P for (a, b, c) in half_offsets],
        np.int32,
    )
    NOFF = len(half_offsets)
    aux_np, halo_shifts, box = make_halo_consts(system, maps)
    has_ex = ex_btype > 0
    run_offsets = make_offset_loop(
        C, cap, P, NOFF, energy, interpret,
        near_ex=((2.0 * khe, 2.0 * khe * r0he, khe, r0he)
                 if near_split else None))

    def kernel(d_ref, meta_ref, key_ref, sc_ref, exb_ref,
               tab_ref, tabT_ref, gx_ref_in, gv_ref, gf_ref, exf_ref,
               gxr_ref, bid_ref, hn_ref, pid_ref, aux_ref, *rest):
        """VMEM discipline (the 100k lesson): every value that must live
        across the 27-offset fori goes through an explicit VMEM ref —
        positions/velocities/forces ride the output refs (iterated in
        place across the step loop), force accumulators ride ``facc_ref``
        (3, cap, P) scratch, per-step scalar tallies ride ``sacc_ref``
        (4, P).  With an EMPTY offset-loop carry Mosaic's register
        allocator keeps only one body's temporaries live; the carry-based
        version spilled 149 MB at 100k beads and ran out of VMEM.  The
        step while-loop carries SCALARS only (step index, stop flag,
        cross-step tallies)."""
        if lan_group:
            lgm_ref = rest[0]
            rest_r = rest[1:]
        else:
            rest_r = rest
        (ox_ref, ov_ref, of_ref, stats_ref, facc_ref, sacc_ref) = rest_r
        dflag0 = (meta_ref[1] > 0).astype(jnp.float32)
        # meta[2] (ex_inkernel) is implied by meta[4]: ex_nblk > 0 means
        # the block spring pass covers every active extruder spring
        # (tab_ref rows); 0 = no springs OR the XLA exf fallback
        # (overflow-dropped anchors — the driver then caps the launch at
        # one step)
        limit = meta_ref[3]
        ex_nblk = meta_ref[4]
        ex_nwin = meta_ref[5]  # leading WINDOWED spring blocks (v5)
        # meta[2]: near-spring stencil term enabled this launch (0 on the
        # exf-fallback launch, where the XLA planes carry ALL springs)
        sp_on = ((meta_ref[2] > 0).astype(jnp.float32)
                 if near_split else None)
        # per-Simulation scalars (SMEM): geometry stays the compile key
        sc_dt = sc_ref[0]
        sc_kick = sc_ref[1]
        sc_g1 = sc_ref[2]
        sc_g2b = sc_ref[3]
        sc_t0 = sc_ref[4]
        sc_tsl = sc_ref[5]
        interior = aux_ref[6:7, :]                      # (1, P)
        bid = bid_ref[...]
        valid = jnp.where(bid < n, interior, 0.0)
        hn = hn_ref[...]
        n_links = jnp.sum(valid * (hn > 0).astype(jnp.float32))
        # chain-code plane: u1[slot] = bid+1 where the slot's bead has a
        # chain-next link, else a never-matching sentinel.  The bonded
        # test then costs 2 compares + 1 or per pair slab instead of the
        # 5-7 ops of the bid/hn cross terms, and the per-offset hn roll
        # disappears.  (bid <= n always; n+2 matches nothing.)
        u1 = jnp.where(hn > 0, bid + 1, n + 2)

        # positions/velocities/forces iterate IN the output refs
        for k in range(3):
            ox_ref[k] = gx_ref_in[k]
            ov_ref[k] = gv_ref[k]
            of_ref[k] = gf_ref[k]

        if lan is not None:
            k0 = key_ref[0]
            k1 = key_ref[1]
            base0 = key_ref[2]  # sstep*4 as uint32, computed by the caller
            scale = 1.0 / 16777216.0
            # thermostat mask: group membership plane (launch-constant;
            # rebuilds happen at launch boundaries) over the valid mask
            wl = valid * lgm_ref[...] if lan_group else valid
            sc_icnt = sc_ref[6]  # 1/count(group) for the zero option

        def step_body(carry):
            (s, stopped, clamps_tot, reach_bad, skin_bad, trig) = carry
            # drift is off only on a boundary first step (XLA integrated)
            sf = (s > 0).astype(jnp.float32)
            dflag = jnp.maximum(dflag0, sf)

            # ---- initial integrate: half kick + drift ----
            for k in range(3):
                v1 = ov_ref[k] + (dflag * sc_kick) * of_ref[k] * valid
                ov_ref[k] = v1
                ox_ref[k] = ox_ref[k] + (dflag * sc_dt) * v1 * valid

            # ---- halo refresh: 6 masked face blends (forward_comm) ----
            for axis in range(3):
                s_lo, s_hi = halo_shifts[axis]
                m_lo = aux_ref[2 * axis:2 * axis + 1, :]
                m_hi = aux_ref[2 * axis + 1:2 * axis + 2, :]
                keep = 1.0 - m_lo - m_hi
                L = float(box[axis])
                for k in range(3):
                    cur = ox_ref[k]
                    src_lo = pltpu.roll(cur, s_lo, 1)
                    src_hi = pltpu.roll(cur, s_hi, 1)
                    if k == axis:
                        src_lo = src_lo - L
                        src_hi = src_hi + L
                    ox_ref[k] = cur * keep + src_lo * m_lo + src_hi * m_hi

            # ---- fused stencil: LJ + FENE + exclusions, Newton-half ----
            facc_ref[...] = jnp.zeros((3, cap, P), jnp.float32)
            sacc_ref[...] = jnp.zeros((4, P), jnp.float32)
            # (shared Newton-half offset loop — make_offset_loop)
            run_offsets(d_ref, ox_ref, bid, u1, pid_ref, valid,
                        facc_ref, sacc_ref, sp_on=sp_on)

            # ---- reverse comm: fold ghost-accumulated reactions back
            # onto their owner columns, reversing the refresh order
            # (z -> y -> x, src/comm_brick.cpp:519 reverse_comm) ----
            for axis in (2, 1, 0):
                s_lo, s_hi = halo_shifts[axis]
                m_lo = aux_ref[2 * axis:2 * axis + 1, :]
                m_hi = aux_ref[2 * axis + 1:2 * axis + 2, :]
                keep = 1.0 - m_lo - m_hi
                for comp in range(3):
                    F = facc_ref[comp]
                    facc_ref[comp] = (
                        F * keep
                        + pltpu.roll(F * m_lo, (P - s_lo) % P, 1)
                        + pltpu.roll(F * m_hi, (P - s_hi) % P, 1)
                    )

            # ---- extruder springs: vectorized block pass (ALL active
            # springs, near or far — the analog of the XLA
            # ex_force_planes pass, bitwise-mirrored math).  v3: per
            # EX_BLOCK-spring block BOTH anchors stack on the row axis
            # (2W rows), one (2W,cap)@(cap,P) gather dot + per-component
            # (2W,P) mask-reduce pulls both anchor positions, and one
            # standard-layout (cap,2W)@(2W,P) dot per component scatters
            # both reactions.  (v2 did 12 dots/block, half dim-0
            # contractions that forced Mosaic relayouts: 2.5 ms/step at
            # E=500.  v4 tried all-MXU gathers via TRANSPOSED one-hots —
            # (P, W2) lane-padded masks cost (P, 128) f32 each and blew
            # the 128 MiB VMEM cap by exactly their 2x17.2 MB at the
            # 100k bench geometry, hardware 2026-08-19 — transposed
            # plane-height one-hots are unaffordable; v3 keeps every
            # plane-sized tensor row-major (2W, P).)  O(E * P) per
            # step, valid for every step of a multi-step launch. ----
            if has_ex:
                # HIGHEST (bf16x6) — exact f32; Mosaic's dot lowering
                # accepts only DEFAULT/HIGHEST, and DEFAULT truncates
                # positions to bf16 (gathers must be bit-exact)
                hp = jax.lax.Precision.HIGHEST
                W2 = 2 * EX_BLOCK
                rows_i = jax.lax.broadcasted_iota(
                    jnp.int32, (W2, cap), 1)
                rowsT_i = jax.lax.broadcasted_iota(
                    jnp.int32, (cap, W2), 0)
                lane_i = jax.lax.broadcasted_iota(
                    jnp.int32, (W2, P), 1)

                WNw = ex_window(P)
                if WNw:
                    lane_iw = jax.lax.broadcasted_iota(
                        jnp.int32, (W2, WNw), 1)

                @pl.when(ex_nblk > 0)
                def _spring_pass():
                    def blk_body(t, tT, M2, gather, scatter):
                        # v3 stacked-anchor block: rows [0, W) are the
                        # block's LEFT anchors, rows [W, 2W) its RIGHT
                        # anchors (engine._ex_block_table), so ONE
                        # one-hot/mask pair serves BOTH sides and the
                        # block needs 3 gather + 3 scatter dots instead
                        # of v2's 12 (each dot pads to 128 MXU rows
                        # anyway, so doubling rows 32->64 is free).  The
                        # signed per-side separation falls out of a
                        # static half-rotation: xc - roll(xc, W) is
                        # xl - xr on the top half and xr - xl on the
                        # bottom — exactly each side's force direction.
                        # v5: gather/scatter are injected so WINDOWED
                        # blocks run the same physics on (2W, EX_WN)
                        # lane slices (engine sorts springs by lane and
                        # permutes windowed blocks to the front).
                        A2 = (rows_i == t[:, 0:1]).astype(jnp.float32)
                        am = t[:, 2:3].astype(jnp.float32)
                        dd = []
                        for c in range(3):
                            xc = jnp.sum(gather(c, A2) * M2,
                                         axis=1, keepdims=True)
                            L = float(box[c])
                            dc = xc - pltpu.roll(xc, EX_BLOCK, 0)
                            dd.append(dc - L * jnp.round(dc / L))
                        rsq_s = jnp.maximum(
                            dd[0] * dd[0] + dd[1] * dd[1] + dd[2] * dd[2],
                            1e-12)
                        if ex_harmonic:
                            r = jnp.sqrt(rsq_s)
                            dr = r - r0he
                            fb_s = -2.0 * khe * dr / r
                            if energy:
                                eb_s = khe * dr * dr
                        else:
                            rlog_s = jnp.maximum(
                                1.0 - rsq_s / (r0he * r0he), 0.1)
                            fb_s = -khe / rlog_s
                            rsq_sw = jnp.maximum(
                                rsq_s, 0.5625 * sighe * sighe)
                            ssr2 = sighe * sighe / rsq_sw
                            ssr6 = ssr2 * ssr2 * ssr2
                            swca = rsq_s < 2.0 ** (1.0 / 3.0) * sighe * sighe
                            fb_s = fb_s + jnp.where(
                                swca,
                                48.0 * epshe * ssr6 * (ssr6 - 0.5) / rsq_sw,
                                0.0)
                            if energy:
                                eb_s = (-0.5 * khe * r0he * r0he
                                        * jnp.log(rlog_s)
                                        + jnp.where(
                                            swca,
                                            4.0 * epshe * ssr6 * (ssr6 - 1.0)
                                            + epshe, 0.0))
                        w = fb_s * am
                        # transposed one-hot straight from the lane-major
                        # table rows (field 0 = anchor row as lanes) —
                        # the scatter dot is STANDARD-layout
                        # (cap, 2W) @ (2W, P): the v1 dim-0 contractions
                        # forced Mosaic relayouts
                        A2T = (rowsT_i == tT[0:1, :]).astype(jnp.float32)
                        # dd already carries each side's sign
                        scatter(A2T, M2, dd, w)
                        if energy:
                            # each spring appears twice (both anchors), so
                            # the row sum is 2*sum(eb) — what the engine's
                            # halving of all sacc energies expects
                            sacc_ref[1:2, :] += (
                                jnp.zeros((1, P), jnp.float32)
                                + (1.0 / P) * jnp.sum(eb_s * am))

                    def blk(b, carry):
                        t = tab_ref[pl.ds(b * W2, W2), :]
                        tT = tabT_ref[pl.ds(b * 8, 8), :]
                        M2 = (lane_i == t[:, 1:2]).astype(jnp.float32)

                        def gather(c, A2):
                            return jnp.dot(A2, ox_ref[c], precision=hp)

                        def scatter(A2T, M2, dd, w):
                            for c in range(3):
                                facc_ref[c, :, :] += jnp.dot(
                                    A2T, M2 * (dd[c] * w), precision=hp)

                        blk_body(t, tT, M2, gather, scatter)
                        return carry

                    if WNw:
                        def blk_win(b, carry):
                            # windowed block: cols in tab are RELATIVE to
                            # the 128-aligned base (engine guarantees all
                            # anchors inside [base, base+WN))
                            t = tab_ref[pl.ds(b * W2, W2), :]
                            tT = tabT_ref[pl.ds(b * 8, 8), :]
                            base = exb_ref[b] * 128
                            M2 = (lane_iw == t[:, 1:2]).astype(jnp.float32)

                            def gather(c, A2):
                                return jnp.dot(
                                    A2, ox_ref[c, :, pl.ds(base, WNw)],
                                    precision=hp)

                            def scatter(A2T, M2, dd, w):
                                for c in range(3):
                                    facc_ref[
                                        c, :, pl.ds(base, WNw)
                                    ] += jnp.dot(A2T, M2 * (dd[c] * w),
                                                 precision=hp)

                            blk_body(t, tT, M2, gather, scatter)
                            return carry

                        nw = jnp.minimum(ex_nwin, NBLK)
                        jax.lax.fori_loop(0, nw, blk_win,
                                          jnp.zeros((), jnp.int32))
                    else:
                        nw = jnp.zeros((), jnp.int32)
                    jax.lax.fori_loop(nw, jnp.minimum(ex_nblk, NBLK), blk,
                                      jnp.zeros((), jnp.int32))

            # ---- post force: extruder residue + Langevin
            #      (fix_langevin.cpp:654-674), t ramped per step ----
            if lan is not None:
                t_s = jnp.maximum(sc_t0 + sc_tsl * s.astype(jnp.float32),
                                  0.0)
                g2_s = sc_g2b * jnp.sqrt(t_s)
                base = base0 + (jnp.uint32(4) * s.astype(jnp.uint32))
            for comp in range(3):
                f = facc_ref[comp]
                if has_ex:
                    # XLA fallback planes (overflow-dropped anchors):
                    # valid only for the launch's first step — the
                    # driver caps limit at 1 whenever they are nonzero
                    f = f + exf_ref[comp]
                if lan is not None:
                    c0 = pltpu.bitcast(bid, jnp.uint32)
                    x0, _ = _threefry2x32(
                        k0, k1, c0, base + jnp.uint32(comp))
                    u = (x0 >> 8).astype(jnp.int32).astype(
                        jnp.float32) * scale
                    noise = u - 0.5
                    if lan_zero:
                        # zeroflag: random-force sum adjusted to zero
                        # over the group each step (fix_langevin.cpp
                        # post_force end) — subtract the group mean from
                        # noise before masking so only members feel it
                        noise = noise - jnp.sum(noise * wl) * sc_icnt
                    f = f + (sc_g1 * ov_ref[comp] + g2_s * noise) * wl
                of_ref[comp] = f
                # ---- final integrate: half kick ----
                ov_ref[comp] = ov_ref[comp] + sc_kick * f * valid

            # ---- skin monitor: max displacement vs rebuild reference ----
            dxr = ox_ref[0] - gxr_ref[0]
            dyr = ox_ref[1] - gxr_ref[1]
            dzr = ox_ref[2] - gxr_ref[2]
            dsq = (dxr * dxr + dyr * dyr + dzr * dzr) * valid
            dmax = jnp.max(dsq)
            # pairwise coverage bound: the two largest displacements
            # summing past the full skin margin (engine.skin_check)
            dmax2 = jnp.max(jnp.where(dsq == dmax, 0.0, dsq))
            bad_s = (jnp.sqrt(dmax) + jnp.sqrt(dmax2)
                     > 2.0 * float(np.sqrt(halfskin_sq)))
            # reactive rebuild trigger with PER-BEAD lookahead: the
            # trigger is served with a one-step lag (the NEXT launch
            # rebuilds), so predict each bead's next-step displacement
            # EXACTLY — the next drift moves by dt * (v + kick*f), both
            # already in refs — and trigger at 0.85 * half-skin (the 0.15
            # headroom absorbs the next force eval's change; the
            # pairwise full-margin flag above remains the correctness
            # backstop).  Pairing global dmax with global vmax instead
            # (different beads) over-triggered to rebuild-every-2.7-
            # steps on the 100k bench; the r2 dmax-only trigger at
            # 0.5 * half-skin lost the post-event-kick race and flagged
            # 0x4; a velocity-only per-bead lookahead missed during
            # force-ramp transients (lattice relaxation).
            vn0 = ov_ref[0] + sc_kick * of_ref[0]
            vn1 = ov_ref[1] + sc_kick * of_ref[1]
            vn2 = ov_ref[2] + sc_kick * of_ref[2]
            vsq = (vn0 * vn0 + vn1 * vn1 + vn2 * vn2) * valid
            pred = jnp.max(jnp.sqrt(dsq) + sc_dt * jnp.sqrt(vsq))
            trig_s = (pred > 0.85 * float(np.sqrt(halfskin_sq))).astype(
                jnp.int32)
            nb_found = jnp.sum(sacc_ref[2:3, :])
            reach_s = (0.5 * nb_found < n_links - 0.5).astype(jnp.int32)
            clamp_s = jnp.sum(sacc_ref[3:4, :])
            return (s + 1, stopped | trig_s, clamps_tot + clamp_s,
                    reach_bad | reach_s, skin_bad | bad_s.astype(jnp.int32),
                    trig_s)

        def step_cond(carry):
            s, stopped = carry[0], carry[1]
            return (s < limit) & (stopped == 0)

        z = jnp.zeros((), jnp.int32)
        (steps_done, _, clamps_tot, reach_bad, skin_bad, trig) = (
            jax.lax.while_loop(
                step_cond, step_body,
                (z, z, jnp.zeros((), jnp.float32), z, z, z)))

        stats = jnp.concatenate([
            jnp.full((1, 128), jnp.sum(sacc_ref[0:1, :]), jnp.float32),
            jnp.full((1, 128), jnp.sum(sacc_ref[1:2, :]), jnp.float32),
            jnp.full((1, 128), reach_bad.astype(jnp.float32), jnp.float32),
            jnp.full((1, 128), clamps_tot, jnp.float32),
            jnp.full((1, 128), n_links, jnp.float32),
            jnp.full((1, 128), skin_bad.astype(jnp.float32), jnp.float32),
            jnp.full((1, 128), trig.astype(jnp.float32), jnp.float32),
            jnp.full((1, 128), steps_done.astype(jnp.float32), jnp.float32),
        ], axis=0)
        stats_ref[...] = stats

    # one Mosaic compile per (geometry, energy, langevin-presence) — NOT
    # per Simulation: dt/damp enter via sc_ref at run time
    cache_key = (
        system.neighbor.nx, system.neighbor.ny, system.neighbor.nz,
        cap, P, n, EPAD, system.box_size,
        C.key(),
        # extruder-spring physics and the skin-derived trigger bound are
        # ALSO baked into the closure — omitting them let a second
        # Simulation with the same geometry silently reuse the first
        # one's spring constants (round-3 review finding)
        round(khe, 12), round(r0he, 12), round(epshe, 12),
        round(sighe, 12), bool(ex_harmonic),
        round(float(system.neighbor.skin), 12),
        energy, lan is not None, lan_zero, lan_group, has_ex, interpret,
        APPROX_RCP, near_split, ex_window(P),
    )
    grid_call = _CALL_CACHE.get(cache_key)
    if grid_call is None:
        plane = jax.ShapeDtypeStruct((3, cap, P), jnp.float32)
        grid_call = pl.pallas_call(
            kernel,
            out_shape=[plane, plane, plane,
                       jax.ShapeDtypeStruct((8, 128), jnp.float32)],
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 5 +
                     [pl.BlockSpec(memory_space=pltpu.VMEM)]
                     * (12 if lan_group else 11),
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            scratch_shapes=[
                pltpu.VMEM((3, cap, P), jnp.float32),   # force accumulators
                pltpu.VMEM((4, P), jnp.float32),        # e/eb/nb/clamp rows
            ],
            # v5e VMEM is 128 MiB/core; the default 120 MiB scoped cap
            # lost the 100k quick-bench geometry (cap 9, P 33664) by
            # 1.04 MiB on hardware (2026-08-18).  127 MiB leaves the
            # compiler 1 MiB for its own reservations; override with
            # LLE_VMEM_LIMIT_MB for other parts.
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(os.environ.get(
                    "LLE_VMEM_LIMIT_MB", "127")) * 1024 * 1024),
            interpret=interpret,
        )
        _CALL_CACHE[cache_key] = grid_call
    d_arr = jnp.asarray(deltas)
    aux_arr = jnp.asarray(aux_np)

    def call(gx, gv, gf, exf, gxref, bid, hn, pid,
             sstep, do_drift, key_words, t_target,
             t_slope=None, limit=None, ex_tab=None,
             ex_tabT=None, ex_bases=None, ex_nblk=None, ex_nwin=None,
             lgm=None, ex_inkernel=None):
        """key_words: (2,) uint32 RUN-constant PRNG words (the langevin
        key folded WITHOUT the step — engine step_pallas).

        The threefry counter base (sstep*4, matching engine._uniform3) is
        appended here so all scalar plumbing stays uint32 in SMEM; steps
        inside the launch advance the counter by 4 each.
        ``ex_tab``/``ex_tabT``: spring tables (engine._ex_block_table)
        — (2*EPAD, 8) stacked-anchor rows [row, col, active, 0...] (per
        block: W left-anchor rows then W right-anchor rows) and the
        lane-major (NBLK*8, 2*EX_BLOCK) twin the transposed one-hots
        are built from; ``ex_nblk``: leading blocks holding springs.
        ``t_target``/``t_slope``: thermostat target at ``sstep`` and its
        per-step ramp slope inside the launch.  ``limit``: max steps this
        launch may execute (default 1 — the single-step contract).
        """
        if limit is None:
            limit = jnp.ones((), jnp.int32)
        if ex_tab is None:
            ex_tab = jnp.zeros((2 * EPAD, 8), jnp.int32)
        if ex_tabT is None:
            ex_tabT = jnp.zeros((NBLK * 8, 2 * EX_BLOCK), jnp.int32)
        if ex_bases is None:
            ex_bases = jnp.zeros((NBLK,), jnp.int32)
        if ex_nblk is None:
            ex_nblk = jnp.zeros((), jnp.int32)
        if ex_nwin is None:
            ex_nwin = jnp.zeros((), jnp.int32)
        if ex_inkernel is None:
            # default: near-spring stencil term on whenever compiled in
            # (the engine passes 0 on the exf-fallback launch)
            ex_inkernel = jnp.ones((), jnp.int32)
        meta = jnp.stack([sstep, do_drift.astype(jnp.int32),
                          ex_inkernel.astype(jnp.int32),
                          limit.astype(jnp.int32),
                          ex_nblk.astype(jnp.int32),
                          ex_nwin.astype(jnp.int32)])
        keyw = jnp.stack([
            key_words[0], key_words[1],
            (sstep * 4).astype(jnp.uint32), jnp.zeros((), jnp.uint32),
        ])
        zf = jnp.zeros((), jnp.float32)
        if lan is not None:
            g1 = jnp.asarray(gamma1_v, jnp.float32)
            g2b = jnp.asarray(gamma2_base, jnp.float32)
            t0 = t_target.astype(jnp.float32)
            tsl = (zf if t_slope is None
                   else jnp.asarray(t_slope, jnp.float32))
        else:
            g1 = g2b = t0 = tsl = zf
        if lan_zero:
            # 1/count(group): the zero option's mean divisor (group
            # membership never changes; one reduce per launch)
            icnt = (jnp.asarray(1.0 / n, jnp.float32) if not lan_group
                    else 1.0 / jnp.maximum(jnp.sum(lgm), 1.0))
        else:
            icnt = zf
        sc = jnp.stack([
            jnp.asarray(dt, jnp.float32), jnp.asarray(kick, jnp.float32),
            g1, g2b, t0, tsl, icnt, zf,
        ])
        args = [d_arr, meta, keyw, sc, ex_bases,
                ex_tab, ex_tabT, gx, gv, gf, exf, gxref,
                bid, hn.astype(jnp.int32), pid, aux_arr]
        if lan_group:
            if lgm is None:
                raise ValueError(
                    "fix langevin names a group but the grid state has "
                    "no membership plane (to_fast needs groups=)")
            args.append(lgm)
        return grid_call(*args)

    return call


_CALL_CACHE: dict = {}
