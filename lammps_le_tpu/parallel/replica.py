"""Replica-ensemble parallelism: vmap over trajectories, sharded over chips.

The MD analog of data parallelism.  The reference runs replica ensembles as
separate MPI partitions (reference: src/universe.cpp, ``-partition`` flag,
src/REPLICA/temper.cpp); here a replica axis is added to the State pytree
with ``vmap`` and laid out across a device mesh with ``NamedSharding`` —
XLA then runs R independent trajectories with zero communication, which is
the primary chip-saturation axis for chromatin runs (SURVEY.md §2.4).

Chain runs are embarrassingly parallel across trajectories: contact maps
need many replicas, so per-chip throughput multiplies by R at constant
wall-clock until the chip saturates.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..integrate.verlet import Simulation, make_step, setup
from ..state import State


def replicate_state(state: State, n_replicas: int, seed: int = 0) -> State:
    """Broadcast a single-trajectory State to (R, ...) with per-replica keys."""
    def bcast(leaf):
        return jnp.broadcast_to(leaf[None], (n_replicas,) + leaf.shape)

    rep = jax.tree.map(bcast, state)
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(seed), i))(
        jnp.arange(n_replicas)
    )
    return rep.replace(key=keys)


def sharded_replica_state(state: State, mesh: Mesh, axis: str = "dp") -> State:
    """Place a replicated State with the replica axis sharded over ``axis``."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda leaf: jax.device_put(leaf, sharding), state)


def make_replica_runner(
    sim: Simulation,
    groups: Optional[dict] = None,
    mesh: Optional[Mesh] = None,
    axis: str = "dp",
):
    """Compiled (setup_fn, segment_fn) operating on (R, ...) states.

    With a mesh, inputs/outputs are constrained to replica-axis sharding so
    XLA keeps trajectories chip-local (no collectives at all).
    """
    step = make_step(sim, groups)
    vstep = jax.vmap(step)
    vsetup = jax.vmap(lambda s: setup(sim, s))

    if mesh is None:
        seg = jax.jit(
            lambda st, k: jax.lax.fori_loop(0, k, lambda i, s: vstep(s), st)
        )
        return jax.jit(vsetup), seg

    sh = NamedSharding(mesh, P(axis))

    def constrain(st):
        return jax.tree.map(
            lambda leaf: jax.lax.with_sharding_constraint(leaf, sh), st
        )

    @jax.jit
    def setup_sharded(st):
        return constrain(vsetup(constrain(st)))

    @jax.jit
    def segment(st, k):
        st = constrain(st)
        return jax.lax.fori_loop(0, k, lambda i, s: vstep(s), st)

    return setup_sharded, segment
