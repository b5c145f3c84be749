"""Pipeline parallelism (PP): GPipe over a 'pipe' mesh axis via shard_map +
ppermute, differentiable end-to-end.

The reference has no distributed layer at all (SURVEY §2.6); this is the
TPU-native pipelining pattern from the public scaling playbook: place stage
i's weights on pipe-device i, stream M microbatches through S stages in
M + S - 1 ticks, and hand activations to the next stage with a single
`lax.ppermute` per tick. Because ppermute/scan/psum all have transposes,
`jax.grad` through `pipeline_apply` yields exactly the pipelined backward
schedule — no hand-written backward pass.

Scope: stages must share one activation shape (transformer towers — e.g.
the ViT/MCTformer block stacks — or any repeated block). The FPN-topology
detectors keep using DP/TP/SP (parallel/mesh.py); a multi-scale skip
topology does not map onto a linear pipe.

Composable with data parallelism: on a ('data', 'pipe') mesh the microbatch
dim shards over 'pipe' ticks while the batch rows within each microbatch
shard over 'data' (see tests/test_parallel_pp.py::test_pp_composes_with_dp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def stack_stage_params(param_trees: list):
    """Stack S per-stage param pytrees along a new leading axis (stage i at
    index i) — the layout pipeline_apply shards over 'pipe'."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *param_trees)


def pipeline_apply(stage_fn, stacked_params, x, *, mesh: Mesh,
                   axis: str = "pipe", microbatches: int | None = None,
                   batch_axis: str | None = None):
    """Run x through S = mesh.shape[axis] sequential stages, GPipe-style.

    stage_fn(stage_params, x_mb) -> y_mb with y_mb.shape == x_mb.shape.
    stacked_params: pytree with leading axis S (stack_stage_params).
    x: [B, ...]; B % microbatches == 0. microbatches defaults to S (the
    minimum that keeps every stage busy outside the fill/drain bubble).
    batch_axis: optional mesh axis to additionally shard the rows of each
    microbatch over (data parallelism inside the pipe).

    Returns y [B, ...] replicated over 'pipe' (and sharded over batch_axis
    if given).
    """
    S = mesh.shape[axis]
    M = microbatches if microbatches is not None else S
    B = x.shape[0]
    if B % M:
        raise ValueError(f"batch {B} % microbatches {M} != 0")
    x_mb = x.reshape((M, B // M) + x.shape[1:])

    def spmd(params_local, xs):
        # params_local: [1, ...] (this device's stage); xs: [M, mb_local, ...]
        me = jax.tree.map(lambda p: p[0], params_local)
        stage = jax.lax.axis_index(axis)
        fwd = [(d, d + 1) for d in range(S - 1)]

        def tick(carry, t):
            prev, outbuf = carry
            # hand the previous tick's activation to the next stage
            recv = jax.lax.ppermute(prev, axis, fwd)
            feed = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, M - 1), 0, keepdims=False)
            y = stage_fn(me, jnp.where(stage == 0, feed, recv))
            # the last stage drains microbatch t-(S-1) at tick t
            idx = jnp.clip(t - (S - 1), 0, M - 1)
            cur = jax.lax.dynamic_index_in_dim(outbuf, idx, 0, keepdims=False)
            keep = (stage == S - 1) & (t >= S - 1)
            outbuf = jax.lax.dynamic_update_index_in_dim(
                outbuf, jnp.where(keep, y, cur), idx, 0)
            return (y, outbuf), None

        zero = jnp.zeros(xs.shape[1:], xs.dtype)
        (_, outbuf), _ = jax.lax.scan(
            tick, (zero, jnp.zeros_like(xs)), jnp.arange(M + S - 1))
        # only the last stage holds real outputs; psum replicates them
        outbuf = jnp.where(stage == S - 1, outbuf, jnp.zeros_like(outbuf))
        return jax.lax.psum(outbuf, axis)

    xspec = P(None, batch_axis) if batch_axis else P()
    y_mb = jax.shard_map(
        spmd, mesh=mesh,
        in_specs=(P(axis), xspec), out_specs=xspec,
        check_vma=False)(stacked_params, x_mb)
    return y_mb.reshape((B,) + y_mb.shape[2:])
