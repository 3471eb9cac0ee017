"""Jit-safe extruder unloading: TPU reimplementation of
``FixExUnload::post_integrate`` (reference: src/USER-LE/fix_ex_unload.cpp:172-372).

Candidates are extruder bonds whose length exceeds ``cutoff`` (the test is
inverted relative to load — only *long* bonds unload, fix_ex_unload.cpp:236);
each candidate breaks independently with probability ``fraction`` (one
uniform per bond, matching the smaller-tag draw of the reference, 282-288).
The per-atom longest-partner election of the reference is vacuous here
because a bead holds at most one extruder.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.cells import minimum_image
from ..system import System
from .config import ExUnload


def make_ex_unload_update(system: System, fix: ExUnload):
    cutsq = fix.cutoff * fix.cutoff

    def update(x, ex_left, ex_right, key):
        e = ex_left.shape[0]
        active = ex_left >= 0
        li = jnp.where(active, ex_left, 0)
        ri = jnp.where(active, ex_right, 0)
        d = minimum_image(x[ri] - x[li], system.box_size)
        rsq = jnp.sum(d * d, axis=-1)
        candidate = active & (rsq > cutsq)
        if fix.fraction < 1.0:
            u = jax.random.uniform(key, (e,), jnp.float32)
            candidate &= u < fix.fraction
        new_left = jnp.where(candidate, -1, ex_left)
        new_right = jnp.where(candidate, -1, ex_right)
        nbroken = jnp.sum(candidate).astype(jnp.int32)
        return new_left, new_right, nbroken

    return update
