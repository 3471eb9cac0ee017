"""fix momentum: periodic linear-momentum zeroing.

Reference: src/fix_momentum.cpp (end_of_step subtracts the group COM
velocity every ``nevery`` steps; the ``linear x y z`` flags select which
components).  Registered through the extensible fix-style registry, so
it runs as a fused end_of_step hook on the general engine — the usual
companion of long NVE production runs where thermostat noise would
otherwise random-walk the COM.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp

from .registry import FIX_STYLES, register_fix_style


@dataclasses.dataclass(frozen=True)
class Momentum:
    nevery: int
    linear: Tuple[int, int, int] = (1, 1, 1)
    group: Optional[str] = None  # group handling: 'all' only (see parse)


def _momentum_end_of_step(system, fix):
    import numpy as np

    sel = np.asarray(fix.linear, np.float64)

    def hook(state, step_no):
        fire = (step_no % fix.nevery) == 0
        # mass-weighted COM velocity (fix_momentum.cpp: vcm = sum(m v) /
        # masstotal) — unweighted mean would leave momentum nonzero for
        # mixed masses
        m = jnp.asarray(system.masses, state.v.dtype)[state.type][:, None]
        vcm = jnp.sum(m * state.v, axis=0) / jnp.sum(m)
        vcm = vcm * jnp.asarray(sel, state.v.dtype)
        v = jnp.where(fire, state.v - vcm, state.v)
        return state.replace(v=v)

    return hook


def _parse(group, args):
    if group is not None:
        raise ValueError("fix momentum: only group 'all' is supported")
    nevery = int(args[0])
    linear = (1, 1, 1)
    rest = list(args[1:])
    while rest:
        k = rest.pop(0)
        if k == "linear" and len(rest) >= 3:
            linear = tuple(int(rest.pop(0)) for _ in range(3))
        elif k in ("angular", "rescale"):
            raise ValueError(f"fix momentum {k} is unsupported")
        else:
            raise ValueError(f"fix momentum keyword {k!r}")
    return Momentum(nevery=nevery, linear=linear)


if "momentum" not in FIX_STYLES:
    register_fix_style("momentum", Momentum, parse=_parse,
                       end_of_step=_momentum_end_of_step)
