"""Learnable NeuS variance (inv_s) parameter.

Reference: ``VarianceNetwork`` (``models/split_mixed_occ.py:21-56``) —
``inv_s = exp(10 * variance)`` with optional modulation schedule.
"""

from __future__ import annotations

import jax.numpy as jnp


class Variance:
    def __init__(self, config):
        self.init_val = float(config["init_val"])
        self.modulate = bool(config.get("modulate", False))
        if self.modulate:
            self.mod_start_steps = int(config["mod_start_steps"])
            self.reach_max_steps = int(config["reach_max_steps"])
            self.max_inv_s = float(config["max_inv_s"])

    def init(self, key):
        return {"variance": jnp.asarray(self.init_val, jnp.float32)}

    def inv_s(self, params, step=None):
        val = jnp.exp(params["variance"] * 10.0)
        if self.modulate and step is not None:
            # linear ramp cap after mod_start_steps (reference :45-56)
            step = jnp.asarray(step, jnp.float32)
            ramp = (step / self.reach_max_steps) * self.max_inv_s
            cap = jnp.minimum(jnp.maximum(ramp, 1.0), self.max_inv_s)
            val = jnp.where(step > self.mod_start_steps,
                            jnp.minimum(val, cap), val)
        return jnp.clip(val, 1e-6, 1e6)
