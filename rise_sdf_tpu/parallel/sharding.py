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

import contextlib
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P


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


def get_mesh(n_devices: Optional[int] = None, devices=None,
             table_shards: int = 1) -> Mesh:
    """Device mesh.  1-D ``('data',)`` by default (pure data parallel);
    with ``table_shards`` > 1, a 2-D ``('data', 'model')`` mesh whose
    ``model`` axis shards the hash-table rows (tensor parallelism for
    the encoding — see ``table_sharding``), laid out so the ``model``
    axis rides contiguous (fastest) ICI neighbours."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    devices = np.asarray(devices)
    if table_shards <= 1:
        return Mesh(devices, ("data",))
    assert devices.size % table_shards == 0, \
        f"{devices.size} devices not divisible by table_shards={table_shards}"
    return Mesh(devices.reshape(-1, table_shards), ("data", "model"))


# --------------------------------------------------------------------- #
# Hash-table tensor parallelism (the 'model' mesh axis).
#
# The multiresolution hash table is by far the largest parameter tensor
# (L * 2^log2_hashmap_size * F: ~34 MB at the reference 2^19 config, but
# GBs at the 2^22+ scales instant-ngp supports), and its optimizer state
# triples that.  Sharding its *rows* over a 'model' axis is classic
# embedding-table tensor parallelism: each device stores rows
# [r*T/tp, (r+1)*T/tp), gathers the corners it owns (others contribute
# zeros), and one psum over 'model' reassembles the interpolated
# features.  The backward of that masked gather scatter-adds only into
# the locally-owned rows, so table gradients (and Adam moments) stay
# sharded end-to-end — table memory and scatter traffic scale 1/tp.
# Rays are sharded over 'data' and replicated over 'model' (the psum is
# the only cross-shard communication per encode).
#
# The context is ambient (set while *tracing* the per-device body inside
# shard_map) rather than threaded through the model call chain: the same
# encoding objects serve the single-device path, the occupancy-update
# jit, and eval rendering, which all run with the full (replicated)
# table and no collective.
_TABLE_SHARD_CTX: Optional[tuple] = None


@contextlib.contextmanager
def table_sharding(axis: str, num_shards: int):
    """Activate sharded-table encoding while tracing a shard_map body."""
    global _TABLE_SHARD_CTX
    prev = _TABLE_SHARD_CTX
    _TABLE_SHARD_CTX = (axis, int(num_shards))
    try:
        yield
    finally:
        _TABLE_SHARD_CTX = prev


def current_table_sharding() -> Optional[tuple]:
    return _TABLE_SHARD_CTX


def table_shard_count(mesh: Optional[Mesh]) -> int:
    if mesh is None:
        return 1
    return int(mesh.shape.get("model", 1))


def data_shard_count(mesh: Optional[Mesh]) -> int:
    if mesh is None:
        return 1
    return int(mesh.shape.get("data", 1))


def table_specs(tree, axis: str = "model"):
    """PartitionSpec tree for a params/opt-state pytree: hash-table
    leaves (path key 'table', rank-3 [L, T, F]) shard their row axis
    over ``axis``; everything else is replicated.  Optimizer states
    mirror the param tree inside their moment pytrees, so the same rule
    shards Adam's mu/nu alongside the table."""
    def spec(path, leaf):
        keys = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        if "table" in keys and getattr(leaf, "ndim", 0) == 3:
            return P(None, axis, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec, tree)


def make_sharded_train_step(system, mesh: Mesh, stage: Optional[int] = None):
    """Jitted multi-device train step for a NeuS/SplitOcc system.

    Per-device ray count = train_num_rays / D, per-device sample capacity
    = capacity / D.  Returns ``f(state, rngs[D], data) -> (state, aux)``
    where ``rngs`` carries one PRNG key per device.
    """
    return system.make_train_step(stage, mesh=mesh)


def per_device_rngs(rng, n_devices: int):
    return jax.random.split(rng, n_devices)
