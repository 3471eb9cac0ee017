"""Spatial (sp) sharding of the fast engine's cell planes.

The reference scales out through brick domain decomposition with explicit
6-way halo exchange (reference: src/comm_brick.cpp:150-700 setup/forward/
reverse/exchange/borders; src/procmap.cpp:44).  The TPU-native equivalent
shards the fast engine's flat halo-padded cell axis (the minor axis of
every (cap, P) plane) across a mesh axis:

* the flat cell order is x-major, so contiguous column ranges ARE spatial
  x-slabs — the same decomposition geometry as the reference's bricks;
* the per-step halo refresh is a whole-column gather with a static source
  map (engine._halo_refresh); under GSPMD the columns whose source lives
  on another shard lower to collective permutes over ICI — forward_comm
  without any hand-written messaging;
* the kernel's static stencil shifts become shard-edge halo exchanges the
  same way (reverse_comm has no analog: the full stencil accumulates
  complete forces locally);
* rebuild's sort/scatter are global ops (the analog of exchange+borders),
  amortized over the rebuild cadence;
* the extruder table, LE counters, and all per-bead (N,) arrays stay
  REPLICATED — they are global-small state updated deterministically on
  every shard (SURVEY §2.4: "extruder table is global-small, replicate").

Correctness is proven by tests/test_spatial.py: a sharded step over an
8-device mesh reproduces the unsharded trajectory exactly.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fast.engine import FastState


def fast_state_specs(fs: FastState, sp_axis: Optional[str] = "sp",
                     dp_axis: Optional[str] = None):
    """PartitionSpec pytree for a FastState (optionally replica-batched).

    Plane leaves shard their minor (flat cell) axis over ``sp_axis``;
    everything else replicates (or shards only the leading replica axis
    over ``dp_axis`` when batched).
    """
    lead = (dp_axis,) if dp_axis else ()

    def spec(leaf):
        nd = leaf.ndim - len(lead)
        if nd == 3:      # (3, cap, P) coordinate planes
            return P(*lead, None, None, sp_axis)
        if nd == 2 and leaf.shape[-1] == fs.bid.shape[-1]:
            return P(*lead, None, sp_axis)   # (cap, P) int planes
        return P(*lead)

    return jax.tree.map(spec, fs)


def shard_fast_state(fs: FastState, mesh: Mesh, sp_axis="sp",
                     dp_axis: Optional[str] = None) -> FastState:
    """device_put the state with cell-slab sharding over the mesh."""
    specs = fast_state_specs(fs, sp_axis=sp_axis, dp_axis=dp_axis)
    return jax.tree.map(
        lambda leaf, sp: jax.device_put(leaf, NamedSharding(mesh, sp)),
        fs, specs,
    )


def make_sharded_segment(sim, mesh: Mesh, sp_axis="sp"):
    """Compiled segment whose outputs stay slab-sharded.

    The step function itself is unchanged (fast.engine.make_fast_segment);
    GSPMD propagates the input shardings and inserts the halo collectives.
    Output shardings are constrained so the layout is stable across the
    scan (no silent re-replication between segments).  For a combined
    replica x space mesh use make_replicated_sharded_segment.
    """
    from ..fast.engine import make_fast_segment

    # XLA step core: the fused Pallas kernel cannot run over GSPMD-sharded
    # planes (a pallas_call would force a gather); the XLA chain lets
    # GSPMD insert halo collectives
    segment, _ = make_fast_segment(sim, pallas=False, reactive=False)

    def sharded(fs, step0, length, run_begin, run_end):
        out = segment(fs, step0, length, run_begin, run_end)
        specs = fast_state_specs(out, sp_axis=sp_axis)
        return jax.tree.map(
            lambda leaf, sp: jax.lax.with_sharding_constraint(
                leaf, NamedSharding(mesh, sp)
            ),
            out, specs,
        )

    return jax.jit(sharded)


def make_replicated_sharded_segment(sim, mesh: Mesh, dp_axis="dp",
                                    sp_axis="sp"):
    """(dp x sp) segment: vmapped replicas over dp, cell slabs over sp."""
    from ..fast.engine import make_fast_segment

    segment, _ = make_fast_segment(sim, pallas=False, reactive=False)
    vseg = jax.vmap(segment, in_axes=(0, None, None, None, None))

    def sharded(fs, step0, length, run_begin, run_end):
        out = vseg(fs, step0, length, run_begin, run_end)
        specs = fast_state_specs(
            jax.tree.map(lambda leaf: leaf[0], out),
            sp_axis=sp_axis, dp_axis=None,
        )
        specs = jax.tree.map(
            lambda sp: P(dp_axis, *sp), specs
        )
        return jax.tree.map(
            lambda leaf, sp: jax.lax.with_sharding_constraint(
                leaf, NamedSharding(mesh, sp)
            ),
            out, specs,
        )

    return jax.jit(sharded)
