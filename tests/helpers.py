"""Shared numpy reference implementations and system builders for tests.

These are independent re-derivations of the force formulas (LJ 12-6, FENE,
harmonic) used as golden references, in the spirit of the reference's
force-style YAML tests (reference: unittest/force-styles/test_bond_style.cpp).
"""

import numpy as np

from lammps_le_tpu.system import (
    BOND_FENE,
    BOND_HARMONIC,
    BondParams,
    PairLJCut,
    build_system,
    chain_topology,
)


def min_image_np(d, box):
    return d - box * np.round(d / box)


def lj_np(x, box, eps, sig, rc, shift=False, excl=None):
    """O(N^2) LJ forces + energy. excl: set of frozenset pairs fully excluded.

    Applies the engine's LJ evaluation floor at 0.75*sigma (see
    ops.pair._RSQ_FLOOR_FRAC) — part of the engine spec, keeping
    interpenetrating special pairs finite in f32.
    """
    n = len(x)
    f = np.zeros((n, 3))
    e = 0.0
    off = 0.0
    if shift:
        off = 4 * eps * ((sig / rc) ** 12 - (sig / rc) ** 6)
    for i in range(n):
        for j in range(i + 1, n):
            if excl and frozenset((i, j)) in excl:
                continue
            d = min_image_np(x[i] - x[j], box)
            r2 = d @ d
            if r2 >= rc * rc:
                continue
            r2 = max(r2, 0.5625 * sig * sig)
            sr6 = (sig * sig / r2) ** 3
            fpair = (48 * eps * sr6 * sr6 - 24 * eps * sr6) / r2
            f[i] += d * fpair
            f[j] -= d * fpair
            e += 4 * eps * (sr6 * sr6 - sr6) - off
    return f, e


def fene_np(x, box, bonds, k, r0, eps, sig):
    n = len(x)
    f = np.zeros((n, 3))
    e = 0.0
    for (i, j) in bonds:
        d = min_image_np(x[i] - x[j], box)
        r2 = d @ d
        rlog = 1.0 - r2 / (r0 * r0)
        rlog = max(rlog, 0.1)
        fbond = -k / rlog
        e += -0.5 * k * r0 * r0 * np.log(rlog)
        if r2 < 2 ** (1 / 3) * sig * sig:
            r2w = max(r2, 0.5625 * sig * sig)  # engine WCA floor
            sr6 = (sig * sig / r2w) ** 3
            fbond += 48 * eps * sr6 * (sr6 - 0.5) / r2w
            e += 4 * eps * sr6 * (sr6 - 1) + eps
        f[i] += d * fbond
        f[j] -= d * fbond
    return f, e


def harmonic_np(x, box, bonds, k, r0):
    n = len(x)
    f = np.zeros((n, 3))
    e = 0.0
    for (i, j) in bonds:
        d = min_image_np(x[i] - x[j], box)
        r = np.sqrt(d @ d)
        dr = r - r0
        fbond = -2 * k * dr / r
        f[i] += d * fbond
        f[j] -= d * fbond
        e += k * dr * dr
    return f, e


def lj_pair_params(n_types=1, eps=1.0, sig=1.0, rc=1.12, shift=True):
    ones = np.full((n_types, n_types), 1.0)
    return PairLJCut(
        epsilon=eps * ones, sigma=sig * ones, cutoff=rc * ones, shift=shift
    )


def fene_bonds(n_types=1, k=30.0, r0=1.5, eps=1.0, sig=1.0):
    style = np.full(n_types, BOND_FENE)
    coeffs = np.tile([k, r0, eps, sig], (n_types, 1))
    return BondParams(style=style, coeffs=coeffs)


def fene_harmonic_bonds(k1=30.0, r0_1=1.5, eps=1.0, sig=1.0, k2=10.0, r0_2=1.0):
    """Type 1 = FENE (backbone), type 2 = harmonic (extruder)."""
    style = np.array([BOND_FENE, BOND_HARMONIC])
    coeffs = np.array([[k1, r0_1, eps, sig], [k2, r0_2, 0.0, 0.0]])
    return BondParams(style=style, coeffs=coeffs)


def relaxed_chain_system(
    n_chains=2,
    chain_len=20,
    box_l=24.0,
    seed=0,
    dtype="float64",
    jitter=0.03,
    **kw,
):
    """Near-equilibrium straight chains (no overlaps): safe for NVE tests."""
    rng = np.random.default_rng(seed)
    nxt, prv, mol, btype = chain_topology([chain_len] * n_chains)
    n = n_chains * chain_len
    x = np.zeros((n, 3))
    for c in range(n_chains):
        idx = np.arange(c * chain_len, (c + 1) * chain_len)
        x[idx, 0] = 1.0 + 0.97 * np.arange(chain_len)
        x[idx, 1] = 2.0 + 2.0 * c
        x[idx, 2] = box_l / 2
    x += rng.normal(scale=jitter, size=x.shape)
    kw.setdefault("cell_cap", 16)
    kw.setdefault("max_neighbors", 48)
    system = build_system(
        n=n,
        n_types=1,
        box_lo=(0, 0, 0),
        box_hi=(box_l, box_l, box_l),
        next_bead=nxt,
        prev_bead=prv,
        molecule=mol,
        backbone_type=btype,
        masses=np.ones(1),
        pair=kw.pop("pair", None) or lj_pair_params(1),
        bonds=kw.pop("bonds", None) or fene_bonds(1),
        dtype=dtype,
        **kw,
    )
    return system, x


def random_chain_system(
    n_chains=4,
    chain_len=25,
    box_l=12.0,
    seed=0,
    dtype="float64",
    n_types=1,
    bonds=None,
    pair=None,
    max_extruders=0,
    **kw,
):
    """Random-walk chains with ~1.0 bond lengths inside a periodic box."""
    rng = np.random.default_rng(seed)
    nxt, prv, mol, btype = chain_topology([chain_len] * n_chains)
    n = n_chains * chain_len
    x = np.zeros((n, 3))
    off = 0
    for _ in range(n_chains):
        x[off] = rng.uniform(0, box_l, 3)
        for i in range(1, chain_len):
            step = rng.normal(size=3)
            step *= 0.97 / np.linalg.norm(step)
            x[off + i] = x[off + i - 1] + step
        off += chain_len
    x = x % box_l
    kw.setdefault("cell_cap", 48)       # random-walk chains are locally dense
    kw.setdefault("max_neighbors", 64)
    system = build_system(
        n=n,
        n_types=n_types,
        box_lo=(0, 0, 0),
        box_hi=(box_l, box_l, box_l),
        next_bead=nxt,
        prev_bead=prv,
        molecule=mol,
        backbone_type=btype,
        masses=np.ones(n_types),
        pair=pair if pair is not None else lj_pair_params(n_types),
        bonds=bonds if bonds is not None else fene_bonds(n_types),
        dtype=dtype,
        max_extruders=max_extruders,
        **kw,
    )
    return system, x
