"""Dynamic simulation state: one immutable pytree advanced by ``step``.

This replaces the reference's mutable per-atom arrays plus per-fix side
state (reference: src/atom.h:67-94, src/USER-LE/fix_extrusion.h bondcount)
with a single fixed-shape pytree.  Unlike the reference, a checkpoint of
this pytree is a *bitwise* resume point: PRNG key and extruder table are
part of it (reference restart files drop RNG state and bondcount,
src/write_restart.cpp:208-286 — see SURVEY.md §5.4).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from .system import System

# Bits in State.flags — sticky error indicators accumulated inside jit
# (TPU analog of the reference's error->one() runtime assertions,
#  e.g. fix_extrusion.cpp:292,808).
FLAG_CELL_OVERFLOW = 1       # a cell held more beads than cell_cap
FLAG_NEIGHBOR_OVERFLOW = 2   # a bead had more candidates than max_neighbors
FLAG_SKIN_VIOLATION = 4      # displacement since rebuild exceeded skin/2
FLAG_FENE_CLAMP = 8          # FENE rlogarg clamped (bond_fene.cpp:87-92)
FLAG_EXTRUDER_OVERFLOW = 16  # ex_load wanted more extruders than table slots
FLAG_NON_FINITE = 32         # non-finite energy observed (blown-up dynamics)
FLAG_BOND_REACH = 64         # a backbone bond exceeded the cell-stencil reach
                             # (fast path: its force would be silently missed)


@struct.dataclass
class NeighborList:
    """Compact verlet list: full (symmetric) neighbor candidates per bead.

    ``idx[i, k]`` is a candidate neighbor of bead ``i`` found within
    ``cutoff + skin`` at the last rebuild; padding slots hold ``N``.
    ``x_ref`` are positions at rebuild time, for half-skin violation checks.
    """

    idx: jax.Array      # (N, K) int32, padded with N
    x_ref: jax.Array    # (N, 3)


@struct.dataclass
class State:
    x: jax.Array                 # (N, 3) wrapped positions
    v: jax.Array                 # (N, 3) velocities
    f: jax.Array                 # (N, 3) forces from the last evaluation
    img: jax.Array               # (N, 3) int32 periodic image counters
    type: jax.Array              # (N,) int32 0-based atom type (mutable: ex_load
                                 #   can convert types, fix_ex_load.cpp:594-598)
    ex_left: jax.Array           # (E,) int32 left anchor bead, -1 = inactive slot
    ex_right: jax.Array          # (E,) int32 right anchor bead
    key: jax.Array               # PRNG key (threefry), folded per step/substream
    step: jax.Array              # () int32 current timestep
    flags: jax.Array             # () uint32 sticky error bits
    epair: jax.Array = None      # () pair energy at the last force evaluation
    ebond: jax.Array = None      # () bond energy at the last force evaluation
    # LE event counters — the thermo-visible analog of the reference's
    # breakcount/createcount fix vectors (fix_extrusion.cpp:1496-1501)
    n_moves: jax.Array = None    # () int32 total extruder shifts
    n_loads: jax.Array = None    # () int32 total extruders loaded
    n_unloads: jax.Array = None  # () int32 total extruders unloaded
    # counts at the MOST RECENT event of each kind (moves, loads, unloads):
    # the reference's f_ID[1] reports this, not a delta since the last
    # thermo row (fix_extrusion.cpp:1496-1501)
    last_event: jax.Array = None  # (3,) int32
    # ``fix langevin tally yes`` accumulator: -sum(f_langevin . v) dt over
    # the run (the reference's FixLangevin::compute_scalar sign,
    # fix_langevin.cpp end_of_step); thermo f_ID reads it
    therm_e: jax.Array = None    # () cumulative thermostat energy
    nbr: Optional[NeighborList] = None

    @property
    def n_extruders(self) -> jax.Array:
        return jnp.sum(self.ex_left >= 0)


def init_state(
    system: System,
    x,
    v=None,
    types=None,
    seed: int = 0,
    img=None,
) -> State:
    """Build an initial State from host arrays (no neighbor list yet)."""
    dtype = jnp.dtype(system.dtype)
    n = system.n
    x = jnp.asarray(x, dtype)
    assert x.shape == (n, 3), x.shape
    v = jnp.zeros((n, 3), dtype) if v is None else jnp.asarray(v, dtype)
    if types is None:
        types = jnp.zeros((n,), jnp.int32)
    else:
        types = jnp.asarray(types, jnp.int32)
    if img is None:
        img = jnp.zeros((n, 3), jnp.int32)
    else:
        img = jnp.asarray(img, jnp.int32)
    e = max(system.max_extruders, 1)
    return State(
        x=x,
        v=v,
        f=jnp.zeros((n, 3), dtype),
        img=img,
        type=types,
        ex_left=jnp.full((e,), -1, jnp.int32),
        ex_right=jnp.full((e,), -1, jnp.int32),
        key=jax.random.PRNGKey(seed),
        step=jnp.zeros((), jnp.int32),
        flags=jnp.zeros((), jnp.uint32),
        epair=jnp.zeros((), dtype),
        ebond=jnp.zeros((), dtype),
        n_moves=jnp.zeros((), jnp.int32),
        n_loads=jnp.zeros((), jnp.int32),
        n_unloads=jnp.zeros((), jnp.int32),
        last_event=jnp.zeros((3,), jnp.int32),
        therm_e=jnp.zeros((), dtype),
        nbr=None,
    )


def extruder_partner(state: State, n: int) -> jax.Array:
    """Per-bead extruder partner index, or -1.

    The TPU replacement for the reference's per-atom ``bondcount`` plus
    special-list bookkeeping (fix_extrusion.cpp:281-295): with the invariant
    of at most one extruder anchor per bead, a single (N,) gather answers
    both "is this bead occupied" and "who is it bonded to".
    """
    left = state.ex_left
    right = state.ex_right
    active = left >= 0
    safe_l = jnp.where(active, left, n)
    safe_r = jnp.where(active, right, n)
    partner = jnp.full((n,), -1, jnp.int32)
    partner = partner.at[safe_l].set(jnp.where(active, right, -1), mode="drop")
    partner = partner.at[safe_r].set(jnp.where(active, left, -1), mode="drop")
    return partner


def extruder_occupancy(state: State, n: int) -> jax.Array:
    """(N,) bool — bead currently carries an extruder anchor."""
    return extruder_partner(state, n) >= 0
