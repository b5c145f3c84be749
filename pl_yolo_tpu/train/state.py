"""Train state + jit-compiled train/eval steps.

Capability parity with the reference LitDetection training loop
(PL_Modules/pl_detection.py:51-64: manual backward, optimizer step, EMA
update, per-step LR schedule) — as ONE pure jitted function:

    state, metrics = train_step(state, images, labels, rng)

executed under a jax.sharding.Mesh with the batch sharded on 'data'. The
EMA update (reference ema.py:48-60) and BN running stats live inside the
same compiled program, so a full optimization step is a single device
launch with no host round-trips.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .ema import ema_update


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any          # EMA of params (reference averages the whole
    ema_batch_stats: Any     # state_dict, ema.py:57-60 — stats included)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, variables: dict, tx: optax.GradientTransformation,
               use_ema: bool = True) -> "TrainState":
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            ema_params=jax.tree.map(jnp.copy, params) if use_ema else None,
            ema_batch_stats=jax.tree.map(jnp.copy, batch_stats) if use_ema else None,
            tx=tx,
        )

    @property
    def eval_variables(self) -> dict:
        """Variables for validation — EMA weights if enabled (reference
        pl_detection.py:68-71 prefers ema_model)."""
        if self.ema_params is not None:
            return {"params": self.ema_params, "batch_stats": self.ema_batch_stats}
        return {"params": self.params, "batch_stats": self.batch_stats}

    @property
    def raw_variables(self) -> dict:
        return {"params": self.params, "batch_stats": self.batch_stats}


def make_train_step(
    apply_fn: Callable,
    loss_fn: Callable,
    ema_decay: float = 0.9999,
    use_ema: bool = True,
    augment_fn: Callable | None = None,
    donate: bool = True,
    sanitize: bool = False,
    constrain_images: Callable | None = None,
    constrain_state: Callable | None = None,
):
    """Build the jitted train step.

    apply_fn(variables, images, train, mutable) -> (head_outputs, mutated)
    loss_fn(head_outputs, labels) -> dict with 'loss' + metrics
    augment_fn(rng, images, labels[, enable]) -> (images, labels)
    constrain_images: optional with_sharding_constraint hook applied to the
    augmented images (parallel/mesh.py::sp_constraint) — pins the H axis to
    the 'spatial' mesh axis so GSPMD keeps the whole conv pyramid spatially
    partitioned (augmentation's global gathers would otherwise make the
    propagated sharding collapse to replicated).
    constrain_state: optional hook applied to the updated TrainState before
    return (parallel/mesh.py::zero_constraint) — pins optimizer moments and
    EMA copies to their ZeRO 'data'-sharded layout so GSPMD cannot
    replicate them on output.

    The returned step takes two optional traced flags for the epoch-gated
    YOLOX no-aug schedule — step(state, images, labels, rng,
    aug_enable=..., use_l1=...) — threaded to augment_fn/loss_fn only when
    those accept them (inspected once here), so all call sites and loss
    families that predate the schedule keep working unchanged."""
    import inspect

    def _accepts(fn, name):
        try:
            return name in inspect.signature(fn).parameters
        except (TypeError, ValueError):
            return False

    aug_takes_enable = augment_fn is not None and _accepts(augment_fn, "enable")
    loss_takes_l1 = _accepts(loss_fn, "use_l1")

    def step_fn(state: TrainState, images, labels, rng,
                aug_enable=None, use_l1=None):
        # independent streams for augmentation and in-model stochastic
        # layers (DropPath/DropBlock consume the 'dropout' collection)
        k_aug, k_drop = jax.random.split(rng)
        if augment_fn is not None:
            if aug_takes_enable and aug_enable is not None:
                images, labels = augment_fn(k_aug, images, labels,
                                            enable=aug_enable)
            else:
                images, labels = augment_fn(k_aug, images, labels)
        if constrain_images is not None:
            images = constrain_images(images)

        def compute_loss(params):
            outputs, mutated = apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                images, True, mutable=["batch_stats"],
                rngs={"dropout": k_drop})
            if loss_takes_l1 and use_l1 is not None:
                losses = loss_fn(outputs, labels, use_l1=use_l1)
            else:
                losses = loss_fn(outputs, labels)
            return losses["loss"], (losses, mutated["batch_stats"])

        grads, (losses, new_stats) = jax.grad(compute_loss, has_aux=True)(state.params)
        if sanitize:
            # in-step sanitizer (beyond the reference's detect_anomaly flag,
            # SURVEY §5): global grad norm + non-finite leaf-element count,
            # computed device-side and logged with the losses — no host sync
            sq = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                     for g in jax.tree.leaves(grads))
            bad = sum(jnp.sum(~jnp.isfinite(g))
                      for g in jax.tree.leaves(grads))
            losses = dict(losses,
                          grad_norm=jnp.sqrt(sq),
                          nonfinite_grads=bad.astype(jnp.float32))
        updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_step = state.step + 1

        if use_ema and state.ema_params is not None:
            new_ema_p = ema_update(state.ema_params, new_params, new_step, ema_decay)
            new_ema_s = ema_update(state.ema_batch_stats, new_stats, new_step, ema_decay)
        else:
            new_ema_p, new_ema_s = state.ema_params, state.ema_batch_stats

        new_state = state.replace(
            step=new_step, params=new_params, batch_stats=new_stats,
            opt_state=new_opt_state, ema_params=new_ema_p, ema_batch_stats=new_ema_s)
        if constrain_state is not None:
            new_state = constrain_state(new_state)
        return new_state, losses

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(apply_fn: Callable, decode_fn: Callable):
    """Jitted eval step: forward in eval mode + decode (sigmoid/xyxy).
    NMS happens in the (also jitted) postprocess with static thresholds."""

    @jax.jit
    def eval_fn(variables, images):
        outputs = apply_fn(variables, images, False)
        return decode_fn(outputs)

    return eval_fn
