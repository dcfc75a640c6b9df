"""Optimizer / LR-schedule construction on optax.

Reproduces the reference's optimizer surface (``systems/utils.py:314-346``):
Adam with per-submodule param groups (each with its own lr) and a
SequentialLR(LinearLR warmup -> ExponentialLR decay) schedule, expressed
as one optax chain with a per-group lr multiplier and a scalar schedule.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import optax


def make_lr_schedule(config) -> optax.Schedule:
    """system.scheduler -> callable(step) -> multiplicative factor."""
    sched = config.get("scheduler", None)
    if sched is None:
        return lambda step: 1.0
    name = sched["name"]
    if name == "SequentialLR":
        milestones = [int(m) for m in sched["milestones"]]
        subs = [make_lr_schedule({"scheduler": s}) for s in sched["schedulers"]]

        def fn(step):
            out = subs[0](step)
            prev = 0
            for ms, sub in zip(milestones, subs[1:]):
                # torch SequentialLR restarts each scheduler at its milestone
                out = jnp.where(step >= ms, sub(step - ms), out)
                prev = ms
            return out

        return fn
    if name == "LinearLR":
        args = sched["args"]
        start = float(args.get("start_factor", 1.0 / 3))
        end = float(args.get("end_factor", 1.0))
        total = int(args.get("total_iters", 5))

        def fn(step):
            t = jnp.clip(jnp.asarray(step, jnp.float32) / total, 0.0, 1.0)
            return start + (end - start) * t

        return fn
    if name == "ExponentialLR":
        gamma = float(sched["args"]["gamma"])
        return lambda step: gamma ** jnp.asarray(step, jnp.float32)
    if name == "ChainedScheduler":
        subs = [make_lr_schedule({"scheduler": s})
                for s in sched["schedulers"]]

        def chained(step):
            out = 1.0
            for sub in subs:
                out = out * sub(step)
            return out

        return chained
    if name == "ConstantLR":
        factor = float(sched["args"].get("factor", 1.0 / 3))
        total = int(sched["args"].get("total_iters", 5))
        return lambda step: jnp.where(jnp.asarray(step) < total, factor, 1.0)
    raise ValueError(f"Unknown scheduler '{name}'")


def make_optimizer(config, params) -> optax.GradientTransformation:
    """system.optimizer (+ scheduler) -> optax transformation.

    ``config.optimizer.params.<group>.lr`` sets the lr of the top-level
    param subtree ``<group>`` (geometry/texture/variance/emitter).
    """
    opt = config["optimizer"]
    args = opt.get("args", {})
    base_lr = float(args.get("lr", 1e-3))
    betas = args.get("betas", [0.9, 0.999])
    eps = float(args.get("eps", 1e-8))
    name = opt.get("name", "Adam")
    if name not in ("Adam", "AdamW", "FusedAdam"):
        raise ValueError(f"Unknown optimizer '{name}'")

    group_lrs: Dict[str, float] = {}
    for g, sub in opt.get("params", {}).items():
        group_lrs[g] = float(sub.get("lr", base_lr))

    def group_scale(updates):
        def scale_tree(tree, lr):
            return jax.tree_util.tree_map(lambda u: u * lr, tree)

        return {
            k: scale_tree(v, group_lrs.get(k, base_lr))
            for k, v in updates.items()
        }

    schedule = make_lr_schedule(config)

    chain = [optax.scale_by_adam(b1=float(betas[0]), b2=float(betas[1]),
                                 eps=eps)]
    if name == "AdamW":
        wd = float(args.get("weight_decay", 1e-2))
        chain.append(optax.add_decayed_weights(wd))
    chain += [
        optax.stateless(lambda updates, params=None: group_scale(updates)),
        optax.scale_by_schedule(lambda step: schedule(step)),
        optax.scale(-1.0),
    ]
    return optax.chain(*chain)
