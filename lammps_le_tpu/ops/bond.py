"""Bond forces: FENE and harmonic, over backbone chain and extruder table.

Physics parity:
* FENE — reference src/MOLECULE/bond_fene.cpp:52-128, including the WCA
  repulsive term below 2^(1/6) sigma and the rlogarg clamp for overstretched
  bonds (bond_fene.cpp:87-92; the reference warns/aborts, we clamp and set a
  sticky flag since aborting inside a compiled scan is not possible).
* Harmonic — reference src/MOLECULE/bond_harmonic.cpp:48-80.

TPU design: the backbone is implicit in chain order, so the bond between
``i`` and ``next[i] == i+1`` needs no gather/scatter at all — force and
reaction are computed with one shifted add.  Only the small extruder table
uses scatter-adds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..state import FLAG_FENE_CLAMP
from ..system import BOND_FENE, BOND_HARMONIC, System
from .cells import minimum_image

_TWO_1_3 = 2.0 ** (1.0 / 3.0)


def _bond_terms(rsq, btype, system: System, dtype):
    """(fbond, energy, clamp_flag) for bonds with squared length rsq.

    fbond is force/r along (x_i - x_j), per the reference convention:
    f_i += del * fbond with del = x_i - x_j.
    """
    coeffs = jnp.asarray(system.bonds.coeffs, dtype)  # (T, 4)
    styles = jnp.asarray(system.bonds.style, jnp.int32)
    bt = jnp.clip(btype, 0, coeffs.shape[0] - 1)
    k = coeffs[bt, 0]
    r0 = coeffs[bt, 1]
    eps = coeffs[bt, 2]
    sig = coeffs[bt, 3]
    style = styles[bt]

    rsq = jnp.maximum(rsq, 1e-12)

    # --- FENE ---
    r0sq = r0 * r0
    rlogarg = 1.0 - rsq / r0sq
    clamped = rlogarg < 0.1
    rlogarg = jnp.where(clamped, jnp.asarray(0.1, dtype), rlogarg)
    f_fene = -k / rlogarg
    e_fene = -0.5 * k * r0sq * jnp.log(rlogarg)
    # WCA term floored at (0.75 sigma)^2 like the pair kernels
    # (ops.pair._RSQ_FLOOR_FRAC): bounds the restoring force so hot beads
    # penetrating the wall cannot drive velocity-Verlet unstable
    rsq_w = jnp.maximum(rsq, 0.5625 * sig * sig)
    sr2 = sig * sig / rsq_w
    sr6 = sr2 * sr2 * sr2
    wca = rsq < _TWO_1_3 * sig * sig
    f_fene = f_fene + jnp.where(wca, 48.0 * eps * sr6 * (sr6 - 0.5) / rsq_w, 0.0)
    e_fene = e_fene + jnp.where(wca, 4.0 * eps * sr6 * (sr6 - 1.0) + eps, 0.0)

    # --- harmonic ---
    r = jnp.sqrt(rsq)
    dr = r - r0
    rk = k * dr
    f_harm = jnp.where(r > 0, -2.0 * rk / r, jnp.zeros_like(r))
    e_harm = rk * dr

    is_fene = style == BOND_FENE
    is_harm = style == BOND_HARMONIC
    fbond = jnp.where(is_fene, f_fene, jnp.where(is_harm, f_harm, 0.0))
    ebond = jnp.where(is_fene, e_fene, jnp.where(is_harm, e_harm, 0.0))
    clamp = jnp.any(clamped & is_fene)
    return fbond, ebond, clamp


def backbone_bond_force(x: jax.Array, system: System):
    """Forces + energy of all backbone bonds (i, next[i]) via shifted adds.

    Requires the builder invariant next[i] in {-1, i+1}; validated at
    system construction by the IO layer.
    """
    dtype = x.dtype
    n = system.n
    nxt = jnp.asarray(system.next_bead)
    btype = jnp.asarray(system.backbone_type)
    valid = nxt >= 0
    j = jnp.where(valid, nxt, jnp.arange(n, dtype=jnp.int32))
    d = minimum_image(x[j] - x, system.box_size)  # x_j - x_i
    rsq = jnp.sum(d * d, axis=-1)
    fbond, ebond, clamp = _bond_terms(rsq, btype, system, dtype)
    vf = jnp.where(valid, fbond, 0.0)
    ve = jnp.where(valid, ebond, 0.0)
    # f_i += (x_i - x_j) * fbond = -d * fbond ; reaction on j = i+1.
    rf = d * vf[:, None]
    f = -rf
    f = f.at[1:].add(rf[:-1])
    flags = jnp.where(clamp, jnp.uint32(FLAG_FENE_CLAMP), jnp.uint32(0))
    return f, jnp.sum(ve), flags


def extruder_bond_force(
    x: jax.Array,
    ex_left: jax.Array,
    ex_right: jax.Array,
    ex_btype: int,
    system: System,
):
    """Forces + energy of the dynamic extruder bonds (padded table)."""
    dtype = x.dtype
    n = system.n
    active = ex_left >= 0
    li = jnp.where(active, ex_left, 0)
    ri = jnp.where(active, ex_right, 0)
    d = minimum_image(x[ri] - x[li], system.box_size)  # x_r - x_l
    rsq = jnp.sum(d * d, axis=-1)
    bt = jnp.full(ex_left.shape, ex_btype, jnp.int32)
    fbond, ebond, clamp = _bond_terms(rsq, bt, system, dtype)
    fbond = jnp.where(active, fbond, 0.0)
    ebond = jnp.where(active, ebond, 0.0)
    rf = d * fbond[:, None]
    safe_l = jnp.where(active, ex_left, n)
    safe_r = jnp.where(active, ex_right, n)
    f = jnp.zeros((n, 3), dtype)
    f = f.at[safe_l].add(-rf, mode="drop")
    f = f.at[safe_r].add(rf, mode="drop")
    flags = jnp.where(
        clamp & jnp.any(active), jnp.uint32(FLAG_FENE_CLAMP), jnp.uint32(0)
    )
    return f, jnp.sum(ebond), flags
