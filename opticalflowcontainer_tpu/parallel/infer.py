"""Sharded batched inference over the ICI mesh (shard_map + collectives).

The streaming runtime scales across chips by sharding the frame-pair batch on
the mesh 'data' axis with ``shard_map``; per-chip flow stays local (no
communication on the hot path) and only the scalar velocity aggregation rides
an ICI ``psum`` — the TPU-native replacement for the reference's
one-process-per-model concurrency (SURVEY.md §2.3 mapping table).
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def make_sharded_flow_fn(flow_fn: Callable, mesh: Mesh):
    """``flow_fn``: (prev [b, H, W], cur [b, H, W]) -> flow [b, H, W, 2]
    per-chip.  Returns a jitted fn over the global batch (sharded on 'data')
    that yields (flow [B, H, W, 2] sharded, mean_u scalar psum-reduced)."""

    def local(prev, cur):
        flow = flow_fn(prev, cur)
        # global mean of u across all chips: ICI collective
        local_sum = jnp.sum(flow[..., 0])
        local_n = jnp.asarray(flow[..., 0].size, jnp.float32)
        gsum = jax.lax.psum(local_sum, "data")
        gn = jax.lax.psum(local_n, "data")
        return flow, gsum / gn

    shmapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=(P("data"), P()),
        # check_vma=False: the TPU Farneback path contains a pallas_call,
        # whose abstract eval carries no varying-mesh-axes info; the per-chip
        # body is trivially correct under DP (purely local rows + one psum)
        check_vma=False,
    )
    return jax.jit(shmapped)


def make_sharded_stream_fn(mesh: Mesh, share: str = "all", **fb_kwargs):
    """Multi-STREAM scale-out: N camera streams sharded on the mesh 'data'
    axis, each chip running the stateful Farneback stream step
    (classical.farneback.farneback_stream_step — every frame's expansion
    computed once, planes carried as device state) on its local streams.
    State leaves and frames are [N, ...] sharded on their leading dim; no
    communication on the hot path (per-stream scalars stay local to their
    chip).  This is the sharded twin of
    runtime.multistream.make_stateful_batched_fused_farneback's steady
    program — the DP row of SURVEY §2.3 applied to live streams.

    Returns a jitted ``(state, gray [N, H, W]) -> (du [N], state2)``.
    Seed the state with ``farneback_stream_planes`` on the [N, H, W] gray
    stack (sharded the same way)."""
    from ..classical import farneback as fb

    def local(state, gray):
        flow, state2 = fb.farneback_stream_step(state, gray, share=share,
                                                **fb_kwargs)
        return jnp.mean(flow[..., 0], axis=(1, 2)), state2

    shmapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=(P("data"), P("data")),
        # same pallas_call caveat as make_sharded_flow_fn
        check_vma=False,
    )
    return jax.jit(shmapped)


def make_spatial_sharded_flow_fn(flow_fn: Callable, mesh: Mesh):
    """Big-frame variant: batch on 'data' AND image height on 'model' using
    jit sharding constraints (XLA SPMD inserts the conv/warp halo exchanges,
    unlike shard_map which would need manual halos).

    .. warning:: lax-path only.  The TPU Farneback hot path is a
       ``pallas_call`` (classical/farneback.py BLOCK_WARP), which XLA SPMD
       cannot partition spatially — under this wrapper it would force a
       full all-gather of the frame onto every chip (or fail to lower).
       Use :func:`make_sharded_flow_fn` (per-chip local batch rows via
       shard_map — the Pallas kernel runs unpartitioned inside each shard,
       proven by tests/test_parallel_infer.py) for the TPU Farneback path,
       and keep spatial sharding for learned-model forwards whose ops are
       all XLA-partitionable."""
    from jax.sharding import NamedSharding

    img_s = NamedSharding(mesh, P("data", "model"))

    @functools.partial(jax.jit, out_shardings=None)
    def run(prev, cur):
        prev = jax.lax.with_sharding_constraint(prev, img_s)
        cur = jax.lax.with_sharding_constraint(cur, img_s)
        return flow_fn(prev, cur)

    return run
