"""Model summary: params + FLOPs via XLA HLO cost analysis.

Capability parity with reference utils/flops.py:5-10 (thop-based profile on a
dummy input) — the TPU-native equivalent reads the compiled program's own
cost analysis instead of hand-counted module hooks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def model_summary(module, variables, input_size=(640, 640), batch_size: int = 1):
    """Returns (num_params, flops_per_image or None, text)."""
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    dummy = jnp.zeros((batch_size, input_size[0], input_size[1], 3), jnp.float32)

    flops = None
    try:
        compiled = jax.jit(
            lambda v, x: module.apply(v, x, False)).lower(variables, dummy).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        if cost and "flops" in cost:
            flops = float(cost["flops"]) / batch_size
    except Exception as e:  # cost analysis can fail through the tunnel —
        import warnings      # summarize without FLOPs but say so loudly

        warnings.warn(f"XLA cost analysis failed; summary has no FLOPs: {e}",
                      RuntimeWarning, stacklevel=2)

    txt = f"Params: {n_params / 1e6:.2f}M"
    if flops is not None:
        txt += f", FLOPs: {flops / 1e9:.2f}G @ {input_size[0]}x{input_size[1]}"
    return n_params, flops, txt
