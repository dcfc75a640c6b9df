"""Data-parallel training over a device mesh (TPU ICI).

Replaces the reference's PyTorch-Lightning DDP/NCCL layer
(``launch.py:84-97``): the ray batch is sharded over a 1-D ``data`` mesh
axis with ``shard_map``; each device marches/shades its own rays with a
per-device sample budget (compaction stays device-local — no cross-chip
cumsum), computes the per-device-mean loss, and gradients are ``pmean``-ed
over ICI — the exact semantics of DDP gradient averaging.  Params,
dataset tensors and the occupancy grid are replicated; the optimizer
update is computed redundantly on every device (replicated), like DDP.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def make_sharded_train_step(system, mesh: Mesh, stage: Optional[int] = None):
    """Jitted multi-device train step for a NeuS/SplitOcc system.

    Per-device ray count = train_num_rays / D, per-device sample capacity
    = capacity / D.  Returns ``f(state, rngs[D], data) -> (state, aux)``
    where ``rngs`` carries one PRNG key per device.
    """
    from jax.experimental.shard_map import shard_map

    model = system.model
    tx = system.tx
    ndev = int(np.prod(mesh.devices.shape))
    local_rays = max(system.train_num_rays // ndev, 1)
    local_cap = max(system.capacity // ndev, 16)
    is_split = stage is not None

    def per_device(params, opt_state, occ_binary, occs, step, rngs, data):
        rng = rngs[0]
        k_batch, k_model = jax.random.split(rng)
        saved_rays = system.train_num_rays
        system.train_num_rays = local_rays  # static under trace
        try:
            batch = system.sample_batch(k_batch, data, bg_srgb=is_split)
        finally:
            system.train_num_rays = saved_rays

        def loss_fn(params):
            if is_split:
                mips = model.emitter.build_mips(params["emitter"]) \
                    if stage != 0 else None
                out = model.forward(
                    params, batch["rays"], occ_binary=occ_binary, mips=mips,
                    step=step, rng=k_model, stage=stage, train=True,
                    capacity=local_cap, background_color=batch["bg"])
                loss, losses = system.compute_losses(out, batch, step, stage)
            else:
                out = model.forward(
                    params, batch["rays"], occ_binary=occ_binary, step=step,
                    rng=k_model, train=True, capacity=local_cap,
                    background_color=batch["bg"])
                loss, losses = system.compute_losses(out, batch, step)
            aux = dict(losses)
            aux["inv_s"] = out["inv_s"]
            aux["num_samples"] = out["num_samples"]
            aux["num_rays"] = out["ray_included"].sum()
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        # DDP-equivalent gradient averaging over ICI
        grads = jax.lax.pmean(grads, "data")
        aux = jax.tree_util.tree_map(
            lambda x: jax.lax.pmean(jnp.asarray(x, jnp.float32), "data"), aux)
        aux["loss"] = jax.lax.pmean(loss, "data")
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                            updates)
        return new_params, new_opt_state, aux

    sharded = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P("data"), P()),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )

    @jax.jit
    def train_step(state, rngs, data):
        params, opt_state, aux = sharded(
            state["params"], state["opt_state"], state["occ_binary"],
            state["occs"], state["step"], rngs, data)
        new_state = {
            "params": params, "opt_state": opt_state,
            "occs": state["occs"], "occ_binary": state["occ_binary"],
            "step": state["step"] + 1,
        }
        return new_state, aux

    return train_step


def per_device_rngs(rng, n_devices: int):
    return jax.random.split(rng, n_devices)
