"""Checkpoint/resume: the full State pytree as one .npz archive.

Strictly stronger than the reference restart files
(src/write_restart.cpp:208-286): positions, velocities, images, types, the
extruder table, PRNG key, step counter and sticky flags are all saved, so a
restored run is a bitwise continuation (the reference loses RanMars streams
and fix bondcount on restart — SURVEY.md §5.4).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..state import State

MAGIC = "lammps-le-tpu-ckpt-v1"

_FIELDS = [
    "x", "v", "f", "img", "type", "ex_left", "ex_right",
    "key", "step", "flags", "epair", "ebond",
    "n_moves", "n_loads", "n_unloads", "last_event", "therm_e",
]


def save_checkpoint(path: str, state: State):
    arrs = {name: np.asarray(getattr(state, name)) for name in _FIELDS}
    arrs["__magic__"] = np.array(MAGIC)
    np.savez_compressed(path, **arrs)


def load_checkpoint(path: str, like: State) -> State:
    with np.load(path, allow_pickle=False) as z:
        if str(z["__magic__"]) != MAGIC:
            raise ValueError(f"{path} is not a lammps_le_tpu checkpoint")
        kw = {}
        for name in _FIELDS:
            ref = getattr(like, name)
            if name not in z.files:  # older checkpoints lack last_event
                continue
            kw[name] = jnp.asarray(z[name], ref.dtype)
    return like.replace(nbr=None, **kw)
