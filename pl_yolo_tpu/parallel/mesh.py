"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's (absent) distributed layer (SURVEY.md §2.6).

The reference trains single-GPU (train.py:32-33) with latent, unused
rank/world_size hooks (models/data/samplers.py:62-66). Here data parallelism
is first-class: one jit-compiled train step over a `jax.sharding.Mesh`, with
the batch sharded along the 'data' axis and parameters replicated. XLA/GSPMD
inserts the gradient all-reduces over ICI, and BatchNorm's batch reductions
become *global* (cross-replica synced BN) for free.

Tensor parallelism is user-reachable via the model yaml:

    parallel:
        model: 2        # 'model'-axis size; devices = data x model

Conv kernels [kh,kw,cin,cout] (and their optimizer moments / EMA copies,
which share the leaf structure) are sharded on cout over 'model'
(`shard_tp`); GSPMD propagates the channel sharding through the network and
inserts the collectives. The train step function itself never changes.

Spatial partitioning (SP) — the TPU-idiomatic way to scale a single large
image across chips — is likewise a yaml key:

    parallel:
        spatial: 2      # 'spatial'-axis size; devices = data x model x spatial

Activations [B,H,W,C] shard on H over 'spatial' (`sp_constraint`, applied to
the augmented images inside the train step); GSPMD inserts the halo
exchanges every conv window needs at the shard boundaries and keeps the
whole conv pyramid spatially partitioned — no manual ppermute/collective
code, exactly the "annotate shardings, let XLA insert collectives" recipe.
BatchNorm's (B,H,W) reductions stay global, so numerics match pure DP.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int | None = None, model: int = 1, spatial: int = 1,
              pipe: int = 1, expert: int = 1,
              devices: list | None = None) -> Mesh:
    """Build a ('data', 'model', 'spatial', 'pipe', 'expert') mesh.
    Defaults to all devices on 'data'; trivial axes (size 1) are harmless —
    every P spec that omits them replicates over them."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // (model * spatial * pipe * expert)
    if data * model * spatial * pipe * expert != n:
        raise ValueError(
            f"mesh {data}x{model}x{spatial}x{pipe}x{expert} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model, spatial, pipe,
                                            expert)
    return Mesh(dev_array,
                axis_names=("data", "model", "spatial", "pipe", "expert"))


# Ambient mesh for pipeline-parallel towers (parallel/pipeline.py): modules
# deep inside the model (e.g. models/backbones/vit.py) cannot receive the
# Trainer's mesh as an argument without threading it through every layer, so
# the Trainer activates it around the model apply at TRACE time — the same
# trace-time-ambient idiom as layers/blocks.py::set_compute_dtype. Outside
# the context (init, eval, export) pipeline_mesh() is None and pipelined
# towers fall back to the sequential lax.scan — identical math and params.
_PIPELINE_MESH = [None]


class use_pipeline_mesh:
    """Context manager: towers traced inside see `mesh` via pipeline_mesh().
    A mesh without a non-trivial 'pipe' axis is ignored (sequential path)."""

    def __init__(self, mesh: Mesh | None):
        if mesh is not None and mesh.shape.get("pipe", 1) <= 1:
            mesh = None
        self._mesh = mesh

    def __enter__(self):
        self._prev = _PIPELINE_MESH[0]
        _PIPELINE_MESH[0] = self._mesh
        return self

    def __exit__(self, *exc):
        _PIPELINE_MESH[0] = self._prev
        return False


def pipeline_mesh() -> Mesh | None:
    return _PIPELINE_MESH[0]


def _spatial_size(mesh: Mesh) -> int:
    return mesh.shape["spatial"] if "spatial" in mesh.axis_names else 1


def sp_constraint(mesh: Mesh):
    """with_sharding_constraint hook for NHWC activations under spatial
    partitioning: H shards over 'spatial' (batch stays on 'data'). Returns
    None when the mesh has no non-trivial spatial axis so callers can skip
    the constraint entirely (the common pure-DP/TP case)."""
    if _spatial_size(mesh) == 1:
        return None
    sharding = NamedSharding(mesh, P("data", "spatial"))

    def constrain(x):
        return jax.lax.with_sharding_constraint(x, sharding)
    return constrain


def tp_spec(x, model_size: int) -> P:
    """PartitionSpec for one state leaf under cout tensor parallelism:
    4D conv kernels whose cout divides the 'model' axis shard on cout;
    everything else (biases, BN stats, scalars) replicates."""
    if getattr(x, "ndim", 0) == 4 and x.shape[-1] % model_size == 0:
        return P(None, None, None, "model")
    return P()


def ep_spec(path, x, expert_size: int) -> P | None:
    """PartitionSpec for expert parallelism, or None if the leaf is not an
    expert weight. MoE expert weights/biases (models/backbones/vit.py::
    moe_ffn) are stacked [L, E, ...] with leaf names `blocks_moe_w1` etc.;
    the E axis shards over 'expert'. The router ([L, d, E]) is tiny and
    needed by every token, so it replicates (the `moe_w`/`moe_b` name
    filter excludes it). GSPMD then partitions the [E, C, ...] dispatch
    buffers and expert matmuls to match — each device runs only its own
    experts' FFNs and all-reduces the combine."""
    import jax.tree_util as jtu
    name = jtu.keystr(path)
    if (("moe_w" in name or "moe_b" in name)
            and getattr(x, "ndim", 0) >= 2 and x.shape[1] % expert_size == 0):
        return P(None, "expert")
    return None


def zero_spec(path, x, base: P, data_size: int, level: int = 1) -> P:
    """ZeRO-style spec for one TrainState leaf, sharding redundant
    per-replica state over 'data' on the first axis that divides it and is
    not already taken by the tp/ep spec.

    level 1 (`parallel: {zero: true}`): optimizer moments and EMA copies
    (paths starting `.opt_state` / `.ema_`). Params and batch stats stay
    replicated, so the step's only extra collective is the all-gather of
    the (elementwise) update term — the classic ZeRO-1 trade.

    level 3 (`parallel: {zero: 3}`): additionally shards the PARAMS at
    rest (`.params`). GSPMD then inserts the per-step param all-gather in
    the forward and the matching reduce-scatter of the gradients, and the
    optimizer update runs shard-wise — per-chip params+moments+EMA memory
    all drop ~data_par x at the cost of one parameter-sized all-gather +
    reduce-scatter per step (see PERF.md ICI table; the GSPMD formulation
    of ZeRO-3 / FSDP). Batch stats stay replicated (tiny, and the BN
    update mutates them in-forward).

    Leaves with no divisible free axis just stay on `base` (replicated
    over 'data'): correctness never depends on the rule firing."""
    import jax.tree_util as jtu
    name = jtu.keystr(path)
    roots = ((".opt_state", ".ema_", ".params") if level >= 3
             else (".opt_state", ".ema_"))
    if not name.startswith(roots):
        return base
    used = tuple(base) + (None,) * (getattr(x, "ndim", 0) - len(tuple(base)))
    for ax in range(getattr(x, "ndim", 0)):
        if used[ax] is None and x.shape[ax] % data_size == 0:
            return P(*(used[:ax] + ("data",) + used[ax + 1:]))
    return base


def state_specs(tree, mesh: Mesh, zero: bool | int = False):
    """PartitionSpec pytree for a TrainState (or any sub-tree): cout-sharded
    conv kernels over 'model', expert-sharded MoE weights over 'expert',
    and — with zero truthy — ZeRO-sharded redundant state over 'data'
    (zero_spec; True/1 = moments+EMA, 3 = params too). One path-based rule
    covers the whole TrainState because moments and EMA copies mirror the
    param tree's leaf names."""
    import jax.tree_util as jtu
    model_size = mesh.shape["model"]
    expert_size = mesh.shape.get("expert", 1)
    data_size = mesh.shape["data"]
    level = int(zero or 0)

    def spec(path, x):
        s = (ep_spec(path, x, expert_size) if expert_size > 1 else None)
        if s is None:
            # a trivial 'model' axis must not claim cout — it would block
            # zero_spec from sharding it over 'data'
            s = tp_spec(x, model_size) if model_size > 1 else P()
        if level and data_size > 1:
            s = zero_spec(path, x, s, data_size, level=level)
        return s
    return jtu.tree_map_with_path(spec, tree)


def shard_tp(tree, mesh: Mesh, zero: bool | int = False):
    """Place a pytree (TrainState / params / opt moments) onto the mesh with
    cout-sharded conv kernels ('model' axis) and expert-sharded MoE weights
    ('expert' axis); zero=True/1 additionally shards optimizer moments and
    EMA copies over 'data', zero=3 the params too (zero_spec). With trivial
    axes this is plain replication, so it is safe to call unconditionally."""
    specs = state_specs(tree, mesh, zero=zero)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs)


def zero_constraint(tree, mesh: Mesh, zero: bool | int = True):
    """with_sharding_constraint hook pinning a new TrainState to its ZeRO
    layout INSIDE the jitted step — without it GSPMD is free to replicate
    the updated moments (and, at zero=3, params) on output and the memory
    saving evaporates. Returns a fn(state)->state (or None when the mesh
    has one data device)."""
    if mesh.shape["data"] <= 1:
        return None
    specs = state_specs(tree, mesh, zero=zero)

    def constrain(state):
        return jax.tree.map(
            lambda x, s: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, s)), state, specs)
    return constrain


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim across 'data', replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (pytree of arrays with leading batch dim) onto the
    mesh, sharded along 'data'.

    Under spatial partitioning, 4D [B,H,W,C] image leaves additionally shard
    H over 'spatial' so the h2d DMA already lands each row block on its
    owning device (labels and other <4D leaves stay batch-sharded only).

    Multi-host: each process holds its LOCAL shard of the global batch, so
    the global array is assembled with make_array_from_process_local_data
    (global batch = local batch x process_count); device_put would wrongly
    treat the local shard as the whole global array."""
    sharding = batch_sharding(mesh)
    sp = _spatial_size(mesh)
    img_sharding = (NamedSharding(mesh, P("data", "spatial")) if sp > 1
                    else sharding)

    def pick(x):
        return img_sharding if getattr(x, "ndim", 0) == 4 else sharding

    if jax.process_count() > 1:
        def put(x):
            x = np.asarray(x)
            gshape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
            return jax.make_array_from_process_local_data(pick(x), x, gshape)
        return jax.tree.map(put, batch)
    return jax.tree.map(lambda x: jax.device_put(x, pick(x)), batch)
