"""Learnable NeuS variance (inv_s) parameter.

Reference: ``VarianceNetwork`` (``models/split_mixed_occ.py:21-56``) —
``inv_s = exp(10 * variance)`` with optional modulation schedule: after
``mod_start_steps`` the output is capped by a linear ramp from
``prev_inv_s`` (the value when modulation started) to ``max_inv_s``:
``cap = min((step / reach_max_steps) * (max_inv_s - prev_inv_s)
+ prev_inv_s, max_inv_s)``.  ``prev_inv_s`` is a non-trained buffer
frozen at the last pre-modulation value via :meth:`post_update` (the
functional analog of the reference's ``update_step`` side effect).
"""

from __future__ import annotations

import jax
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
        params = {"variance": jnp.asarray(self.init_val, jnp.float32)}
        if self.modulate:
            params["prev_inv_s"] = jnp.exp(
                jnp.asarray(self.init_val * 10.0, jnp.float32))
        return params

    def inv_s(self, params, step=None):
        val = jnp.exp(params["variance"] * 10.0)
        if self.modulate and step is not None:
            # continuous ramp from the pre-modulation value to max_inv_s
            # (reference split_mixed_occ.py:45-56)
            step_f = jnp.asarray(step, jnp.float32)
            prev = jax.lax.stop_gradient(params["prev_inv_s"])
            cap = jnp.minimum(
                (step_f / self.reach_max_steps) * (self.max_inv_s - prev)
                + prev,
                self.max_inv_s)
            val = jnp.where(step_f > self.mod_start_steps,
                            jnp.minimum(val, cap), val)
        return jnp.clip(val, 1e-6, 1e6)

    def post_update(self, params, step):
        """Track inv_s into ``prev_inv_s`` while ``step <= mod_start_steps``
        (it freezes at the last pre-modulation value, like the reference's
        ``update_step``).  Call after the optimizer update each step."""
        if not self.modulate:
            return params
        step_f = jnp.asarray(step, jnp.float32)
        raw = jnp.exp(jax.lax.stop_gradient(params["variance"]) * 10.0)
        prev = jnp.where(step_f <= self.mod_start_steps, raw,
                         params["prev_inv_s"])
        return {**params, "prev_inv_s": prev}
