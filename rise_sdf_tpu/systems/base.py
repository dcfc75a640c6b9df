"""Base system: functional train/eval harness.

Replaces the reference's PyTorch-Lightning ``BaseSystem``
(``systems/base.py``) with an explicit JAX training loop:

* ``TrainState`` is a plain pytree (params, optax state, occupancy grid,
  step) — checkpointed by flattening to npz (replaces Lightning ckpt).
* schedule state (hash level, fd eps, cos anneal, loss-weight ramps) is
  computed *inside* jit from the step scalar, so the whole training step
  is one compiled function (two, counting the stage flip).
* ray batches are sampled on-device inside jit; on a multi-chip mesh the
  batch is sharded over the ``data`` axis and XLA inserts the gradient
  all-reduce (replaces Lightning DDP + NCCL).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import models
from ..ops import grid as occ_grid
from ..utils.saving import Saver


class BaseSystem:
    def __init__(self, config, datamodule, save_dir: str = "exp_out",
                 ckpt_dir: Optional[str] = None):
        self.config = config
        self.datamodule = datamodule
        self.model = models.make(config["model"]["name"], config["model"])
        self.saver = Saver(save_dir)
        self.ckpt_dir = ckpt_dir or os.path.join(save_dir, "ckpt")
        self.prepare()
        self._jit_cache: Dict[Any, Any] = {}
        self.mesh = None  # optional jax.sharding.Mesh for data parallelism

    def prepare(self):
        pass

    # ------------------------------------------------------------------ #
    def C(self, value, step):
        """Scalar schedule (reference systems/base.py:28-45).

        ``value`` is a number or ``[start_step, start, end, end_step]``
        (3-element lists get start_step=0).  Returns a traced scalar.
        """
        if isinstance(value, (int, float)):
            return value
        value = list(value)
        if len(value) == 3:
            value = [0] + value
        start_step, start_value, end_value, end_step = value
        assert isinstance(end_step, int), "epoch-based schedules unsupported"
        t = jnp.clip(
            (jnp.asarray(step, jnp.float32) - start_step)
            / max(end_step - start_step, 1), 0.0, 1.0)
        return start_value + (end_value - start_value) * t

    # ------------------------------------------------------------------ #
    # checkpointing: leaves keyed by their tree path (structure changes
    # fail loudly on load instead of silently misassigning weights)
    @staticmethod
    def _path_str(path) -> str:
        parts = []
        for p in path:
            if isinstance(p, jax.tree_util.DictKey):
                parts.append(str(p.key))
            elif isinstance(p, jax.tree_util.SequenceKey):
                parts.append(str(p.idx))
            elif isinstance(p, jax.tree_util.GetAttrKey):
                parts.append(p.name)
            else:
                parts.append(str(p))
        return "/".join(parts)

    def save_checkpoint(self, state, path: Optional[str] = None,
                        async_write: bool = False) -> str:
        """Checkpoint ``state`` to ``path`` (atomically: tmp + rename, so
        a kill mid-write can never corrupt an existing checkpoint — the
        watchdog/auto-resume machinery depends on ``latest.ckpt.npz``
        always being loadable).  ``async_write`` moves the serialization
        + disk write to a background thread (the device→host transfer
        stays synchronous); at production scale the file is ~270 MB, a
        measurable slice of the train loop every save interval."""
        path = path or os.path.join(self.ckpt_dir,
                                    f"step_{int(state['step'])}.ckpt.npz")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        flat, _ = jax.tree_util.tree_flatten_with_path(state)
        arrs = {"k:" + self._path_str(p): np.asarray(l) for p, l in flat}

        def write():
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                np.savez(f, **arrs)
            os.replace(tmp, path)

        self.wait_checkpoint_writer()  # at most one writer in flight
        if async_write:
            import threading

            self._ckpt_writer = threading.Thread(target=write, daemon=True)
            self._ckpt_writer.start()
        else:
            write()
        return path

    def wait_checkpoint_writer(self):
        """Join a pending async checkpoint write (no-op if none)."""
        t = getattr(self, "_ckpt_writer", None)
        if t is not None:
            t.join()
            self._ckpt_writer = None

    def load_checkpoint(self, path: str, template_state):
        data = np.load(path)
        flat, treedef = jax.tree_util.tree_flatten_with_path(template_state)
        if any(k.startswith("leaf_") for k in data.files):
            # legacy positional format (round-1 checkpoints)
            new_leaves = [jnp.asarray(data[f"leaf_{i}"])
                          for i in range(len(flat))]
            return jax.tree_util.tree_unflatten(treedef, new_leaves)
        new_leaves = []
        for p, leaf in flat:
            key = "k:" + self._path_str(p)
            if key not in data:
                raise KeyError(
                    f"checkpoint {path} has no entry for state path "
                    f"'{self._path_str(p)}' — was it saved from a different "
                    "model/optimizer config?")
            arr = data[key]
            want = tuple(np.shape(leaf))
            if tuple(arr.shape) != want:
                raise ValueError(
                    f"checkpoint shape mismatch at '{self._path_str(p)}': "
                    f"saved {tuple(arr.shape)}, state expects {want}")
            new_leaves.append(jnp.asarray(arr, dtype=np.asarray(leaf).dtype))
        return jax.tree_util.tree_unflatten(treedef, new_leaves)

    def load_weights_only(self, path: str, template_state):
        """Restore params + occupancy + step; keep fresh optimizer state.

        Mirrors ``--resume_weights_only`` / test-time state-dict load
        (reference launch.py:109).
        """
        full = self.load_checkpoint(path, template_state)
        out = dict(template_state)
        for k in ("params", "occs", "occ_binary", "step"):
            if k in full:
                out[k] = full[k]
        return out

    # ------------------------------------------------------------------ #
    def occupancy_update_fn(self, subset_fraction: int = 4):
        """Jitted occupancy-grid EMA sweep.

        Evaluates a rotating 1/``subset_fraction`` of the cells per update
        (all cells refresh within 4 updates = 64 steps), the TPU analog of
        nerfacc's 1/4-uniform + 1/4-occupied subsampling
        (``lib/nerfacc/grid.py:196-239``) with static shapes.
        """
        model = self.model
        res = model.grid_resolution
        thre = float(self.config["model"].get("grid_prune_occ_thre", 0.01))
        n_cells = res ** 3
        k = max(subset_fraction, 1)

        @jax.jit
        def update(params, occs, step, rng):
            phase = (step // 16) % k
            idx = jnp.arange(n_cells // k, dtype=jnp.int32) * k + phase
            kk = idx % res
            jj = (idx // res) % res
            ii = idx // (res * res)
            u = jax.random.uniform(rng, (n_cells // k, 3))
            unit = (jnp.stack([ii, jj, kk], -1).astype(jnp.float32) + u) / res
            pos = model.aabb_min + unit * (model.aabb_max - model.aabb_min)
            occ = model.occ_eval(params, pos, step)
            new_vals = jnp.maximum(occs[idx] * 0.95, occ.reshape(-1))
            occs = occs.at[idx].set(new_vals)
            binary = occs > jnp.minimum(occs.mean(), thre)
            return occs, binary

        return update

    # ------------------------------------------------------------------ #
    def masked_mean(self, x, mask):
        """Mean over masked entries; broadcast mask over trailing dims."""
        while mask.ndim < x.ndim:
            mask = mask[..., None]
        num = jnp.sum(jnp.where(mask, x, 0.0))
        den = jnp.maximum(jnp.sum(jnp.broadcast_to(mask, x.shape)), 1.0)
        return num / den
