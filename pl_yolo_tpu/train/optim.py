"""Optimizer factory (reference pl_detection.py:107-112 + model-yaml
`optimizer` section).

The reference constructs torch SGD(lr, momentum) with a CosineWarmupScheduler
and silently drops the yaml's weight_decay (pl_detection.py:108 passes only
lr+momentum — a noted quirk). Here weight_decay is honored (applied to conv/
dense kernels only, the YOLO convention), and the same cosine-warmup schedule
drives the learning rate.

Two capabilities of the reference's Lightning Trainer surface (its L6 host,
pytorch_lightning.Trainer(gradient_clip_val=..., accumulate_grad_batches=...)
— unused by the shipped configs but part of the trainer contract) are yaml
keys here:

    optimizer:
        clip_grad_norm: 10.0    # optax.clip_by_global_norm before the update
        accumulate_steps: 4     # optax.MultiSteps: average grads over N
                                # micro-batches, apply one update (effective
                                # batch = N x batch_size). The LR schedule
                                # ticks per UPDATE, so its horizon is
                                # total_steps/N — the cosine still lands at
                                # its floor on the last batch.

Both compose with ZeRO sharding: MultiSteps' accumulation buffer mirrors the
param tree under `.opt_state`, so parallel/mesh.py::zero_spec shards it too.
"""

from __future__ import annotations

import optax

from ..layers.schedules import cosine_warmup_schedule


def _kernel_mask(params):
    """True for leaves named 'kernel' (conv/dense weights); biases and
    BN scale/bias are excluded from weight decay."""
    import flax
    flat = flax.traverse_util.flatten_dict(params)
    mask = {k: (k[-1] == "kernel") for k in flat}
    return flax.traverse_util.unflatten_dict(mask)


def build_optimizer(opt_cfg: dict, total_steps: int):
    """Create (optax tx, schedule fn) from the model-yaml optimizer section."""
    name = opt_cfg.get("name", "SGD").lower()
    lr = float(opt_cfg.get("learning_rate", 0.01))
    accum = int(opt_cfg.get("accumulate_steps", 1))
    # total_steps counts micro-batches; under accumulation the inner
    # optimizer (and thus the schedule) only steps every `accum`-th one
    sched_steps = max(total_steps // accum, 1)
    schedule = cosine_warmup_schedule(
        base_lr=lr,
        warmup_steps=float(opt_cfg.get("warmup", 0.1)) * sched_steps,
        max_steps=sched_steps,
    )
    wd = float(opt_cfg.get("weight_decay", 0.0))
    chain = []
    clip = float(opt_cfg.get("clip_grad_norm", 0.0))
    if clip > 0:
        chain.append(optax.clip_by_global_norm(clip))
    if name == "sgd":
        if wd:
            chain.append(optax.add_decayed_weights(wd, mask=_kernel_mask))
        chain.append(optax.sgd(schedule, momentum=float(opt_cfg.get("momentum", 0.9)),
                               nesterov=bool(opt_cfg.get("nesterov", False))))
    elif name == "adamw":
        chain.append(optax.adamw(schedule, weight_decay=wd, mask=_kernel_mask))
    elif name == "adam":
        chain.append(optax.adam(schedule))
    else:
        raise ValueError(f"Unsupported optimizer: {opt_cfg.get('name')}")
    tx = optax.chain(*chain)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx, schedule
