"""Extensible fix-style registry — Modify's plugin mechanism reimagined
for a traced engine.

The reference grows by dropping a ``FixFoo`` class into ``src/`` and
registering it in ``fix_map`` (src/modify.cpp:789 add_fix factory); at run
time ``Modify`` dispatches per-hook fix lists at fixed lifecycle points
(fix.h:248-264: POST_INTEGRATE, POST_FORCE, END_OF_STEP, ...).  Here a
style registers a frozen config dataclass plus PURE hook *builders*; the
jitted step composes registered hooks at trace time at the same lifecycle
points, so a custom fix costs nothing it doesn't use and fuses with the
rest of the step.

Hook builder signatures (all optional):

    post_integrate(system, fix) -> (state, step_no) -> state
        after drift + the LE fixes (fix_extrusion.cpp:256's slot)
    post_force(system, fix) -> (state, f_total, step_no) -> f_total
        after pair/bond forces + Langevin (fix_langevin.cpp:438's slot)
    end_of_step(system, fix) -> (state, step_no) -> state
        after the final half-kick (modify.cpp:481's slot)

Hooks must be jit-pure: fixed shapes, no Python control flow on traced
values.  Stochastic fixes should draw from ``state.key`` with
``jax.random.fold_in(state.key, step_no)`` plus a style-unique salt, the
same stream-separation discipline the built-ins use.

Custom fixes run on the general path; the grid-resident fast engine
declines sims containing them (``fast.engine.fast_supported``) exactly
like the reference's accelerator packages fall back to the plain style
when a variant is missing.

Example::

    @dataclasses.dataclass(frozen=True)
    class Viscous:
        gamma: float
        group: str | None = None

    def _viscous_post_force(system, fix):
        def hook(state, f, step_no):
            return f - fix.gamma * state.v
        return hook

    register_fix_style(
        "viscous", Viscous,
        parse=lambda group, args: Viscous(float(args[0]), group=group),
        post_force=_viscous_post_force,
    )

after which ``fix 1 all viscous 0.5`` works in decks (the reference's
fix viscous, src/fix_viscous.cpp) and ``Simulation(fixes=(Viscous(0.5),
...))`` works in the Python API.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

from .config import NVE, NVELimit, Langevin, Extrusion, ExLoad, ExUnload


@dataclasses.dataclass(frozen=True)
class FixStyle:
    name: str
    config_cls: type
    # deck-layer parser: (group: Optional[str], args: [str]) -> config.
    # None for built-ins (the runner parses those in cmd_fix).
    parse: Optional[Callable] = None
    post_integrate: Optional[Callable] = None
    post_force: Optional[Callable] = None
    end_of_step: Optional[Callable] = None
    builtin: bool = False


FIX_STYLES: Dict[str, FixStyle] = {}
_BY_TYPE: Dict[type, FixStyle] = {}


def register_fix_style(name: str, config_cls: type,
                       parse: Optional[Callable] = None, *,
                       post_integrate: Optional[Callable] = None,
                       post_force: Optional[Callable] = None,
                       end_of_step: Optional[Callable] = None,
                       builtin: bool = False) -> FixStyle:
    """Register a fix style (modify.cpp:789 add_fix analog)."""
    if name in FIX_STYLES and not builtin:
        raise ValueError(f"fix style {name!r} already registered")
    style = FixStyle(name=name, config_cls=config_cls, parse=parse,
                     post_integrate=post_integrate, post_force=post_force,
                     end_of_step=end_of_step, builtin=builtin)
    FIX_STYLES[name] = style
    _BY_TYPE[config_cls] = style
    return style


def style_of(fix) -> Optional[FixStyle]:
    """Registered style for a fix config instance (None if unknown)."""
    return _BY_TYPE.get(type(fix))


def custom_hooks(fixes, hook: str):
    """(fix, builder) pairs for non-builtin fixes carrying ``hook``."""
    out = []
    for f in fixes:
        st = _BY_TYPE.get(type(f))
        if st is not None and not st.builtin:
            b = getattr(st, hook)
            if b is not None:
                out.append((f, b))
    return out


# built-ins: handled by dedicated fused code paths (integrate/verlet.py,
# fast/engine.py); registered for introspection and so style_of() is total
for _name, _cls in [("nve", NVE), ("nve/limit", NVELimit),
                    ("langevin", Langevin), ("extrusion", Extrusion),
                    ("ex_load", ExLoad), ("ex_unload", ExUnload)]:
    register_fix_style(_name, _cls, builtin=True)
