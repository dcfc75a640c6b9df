"""Data-parallel training over a device mesh (TPU ICI).

Replaces the reference's PyTorch-Lightning DDP/NCCL layer
(``launch.py:84-97``): the ray batch is sharded over a 1-D ``data`` mesh
axis with ``shard_map``; each device marches/shades its own rays with a
per-device sample budget (compaction stays device-local — no cross-chip
cumsum), computes the per-device-mean loss, and gradients are ``pmean``-ed
over ICI — the exact semantics of DDP gradient averaging.  Params,
dataset tensors and the occupancy grid are replicated; the optimizer
update is computed redundantly on every device (replicated), like DDP.

The actual train-step body lives in ``systems/neus.py:make_train_step``
(one body shared by the single-device and sharded paths); this module
keeps the mesh helpers and the stable ``make_sharded_train_step`` entry.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed() -> bool:
    """Guarded multi-host (DCN) init — call once before device queries.

    The reference is single-node DDP (rank from env,
    ``utils/misc.py:44-52``); the TPU-pod analog is
    ``jax.distributed.initialize``, which JAX auto-configures on TPU
    pods from the runtime metadata.  We only attempt it when a
    coordinator is configured (TPU pod env or explicit
    JAX_COORDINATOR_ADDRESS), so single-host runs never pay for, or
    break on, the distributed runtime.  Returns True when the
    distributed runtime is live.
    """
    import os

    if jax.process_count() > 1:
        return True  # already initialized
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    want = os.environ.get("JAX_COORDINATOR_ADDRESS") \
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS") \
        or ("," in hostnames)  # single-worker hosts set this var too
    if not want:
        return False
    try:
        jax.distributed.initialize()
        return jax.process_count() > 1
    except Exception as e:  # mis-set env on a single host: stay local
        print(f"jax.distributed.initialize failed ({e}); "
              "continuing single-process", flush=True)
        return False


def is_main_process() -> bool:
    """Host-0 gate for artifact writes (the rank-zero-only pattern of
    the reference, ``systems/neus.py:204``)."""
    try:
        return jax.process_index() == 0
    except Exception:
        return True


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
    return system.make_train_step(stage, mesh=mesh)


def per_device_rngs(rng, n_devices: int):
    return jax.random.split(rng, n_devices)
