"""Chain bending angles: harmonic and cosine styles.

Physics parity: src/MOLECULE/angle_harmonic.cpp:60-140 (E = K (theta -
theta0)^2, force via a = -2 K dtheta / sin theta) and
src/MOLECULE/angle_cosine.cpp:60-130 (E = K (1 + cos theta), a = K); the
a11/a12/a22 force decomposition onto the three atoms is the reference's.

TPU design: the engine validates chain topology as contiguous
(``next_bead[i] in {-1, i+1}``), so every angle triplet is (i-1, i, i+1)
and the whole pass is three shifted adds on the (N, 3) array — no angle
list, no gathers (the same trick the backbone bond pass uses,
ops/bond.py).  The per-center angle type lives in
``System.angle_center_type``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..system import ANGLE_COSINE, ANGLE_HARMONIC, System
from .cells import minimum_image

_SMALL = 0.001  # sin floor, angle_harmonic.cpp SMALL


def chain_angle_force(x, system: System, energy: bool = True):
    """(force (N,3), eangle ()) for all chain angles."""
    dtype = x.dtype
    ct = jnp.asarray(system.angle_center_type, jnp.int32)
    styles = jnp.asarray(system.angles.style, jnp.int32)
    coeffs = jnp.asarray(system.angles.coeffs, dtype)
    prv_ok = jnp.asarray(system.prev_bead >= 0)
    nxt_ok = jnp.asarray(system.next_bead >= 0)
    valid = (ct >= 0) & prv_ok & nxt_ok
    w = valid.astype(dtype)[:, None]

    box = jnp.asarray(system.box_size, dtype)
    # contiguous chains: row i-1 / i+1 are the triplet ends
    x_prev = jnp.concatenate([x[:1], x[:-1]], axis=0)
    x_next = jnp.concatenate([x[1:], x[-1:]], axis=0)
    del1 = minimum_image(x_prev - x, box)
    del2 = minimum_image(x_next - x, box)
    rsq1 = jnp.maximum(jnp.sum(del1 * del1, axis=1), 1e-12)
    rsq2 = jnp.maximum(jnp.sum(del2 * del2, axis=1), 1e-12)
    r1 = jnp.sqrt(rsq1)
    r2 = jnp.sqrt(rsq2)
    c = jnp.sum(del1 * del2, axis=1) / (r1 * r2)
    c = jnp.clip(c, -1.0, 1.0)

    t = jnp.clip(ct, 0, coeffs.shape[0] - 1)
    k = coeffs[t, 0]
    style = styles[t]

    # harmonic branch
    s = jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0))
    s = jnp.maximum(s, _SMALL)
    dtheta = jnp.arccos(c) - coeffs[t, 1]
    tk = k * dtheta
    a_h = -2.0 * tk / s
    e_h = tk * dtheta
    # cosine branch
    a_c = k
    e_c = k * (1.0 + c)

    is_h = style == ANGLE_HARMONIC
    a = jnp.where(is_h, a_h, a_c)
    e = jnp.where(is_h, e_h, e_c)

    a11 = (a * c / rsq1)[:, None]
    a12 = (-a / (r1 * r2))[:, None]
    a22 = (a * c / rsq2)[:, None]
    f1 = (a11 * del1 + a12 * del2) * w   # on bead i-1
    f3 = (a22 * del2 + a12 * del1) * w   # on bead i+1

    f = -(f1 + f3)                       # center bead
    f = f.at[:-1].add(f1[1:])
    f = f.at[1:].add(f3[:-1])
    if not energy:
        return f, jnp.zeros((), dtype)
    styles_ok = jnp.where(valid, e, 0.0)
    return f, jnp.sum(styles_ok)
