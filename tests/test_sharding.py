"""Multi-device data-parallel tests on the virtual 8-CPU mesh.

The conftest forces ``xla_force_host_platform_device_count=8`` so the
full sharded train step (shard_map over a 1-D ``data`` mesh + pmean
gradients — the framework's DDP equivalent, reference launch.py:84-97)
compiles and executes without real multi-chip hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rise_sdf_tpu import datasets, systems
from rise_sdf_tpu.parallel import get_mesh, make_sharded_train_step
from rise_sdf_tpu.parallel.sharding import per_device_rngs
from rise_sdf_tpu.presets import tiny_neus_config, tiny_split_config

pytestmark = pytest.mark.slow  # multi-device e2e: excluded from the fast gate

NDEV = 4


@pytest.fixture(scope="module")
def neus_system(tmp_path_factory):
    cfg = tiny_neus_config()
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    sys_ = systems.make(cfg.system.name, cfg, dm,
                        save_dir=str(tmp_path_factory.mktemp("shard")))
    return sys_


def test_sharded_step_matches_manual_pmean(neus_system):
    """Sharded new-params == optimizer applied to the hand-averaged
    per-device gradients (DDP grad-averaging semantics)."""
    system = neus_system
    assert len(jax.devices()) >= NDEV
    state = system.init_state(0)
    data = system.device_data(system.datamodule.train())
    mesh = get_mesh(NDEV)
    step_fn = make_sharded_train_step(system, mesh)
    rngs = per_device_rngs(jax.random.PRNGKey(7), NDEV)

    local_rays = max(system.train_num_rays // NDEV, 1)
    local_cap = max(system.capacity // NDEV, 16)

    def one_dev_grads(params, occ_binary, step, key):
        kb, km = jax.random.split(key)
        batch = system.sample_batch(kb, data, num_rays=local_rays)

        def loss_fn(p):
            return system.forward_loss(p, batch, occ_binary, step, km,
                                       None, local_cap)

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, grads

    # manual reference: mean of per-device grads, one optax update
    losses, grads = [], []
    gfn = jax.jit(one_dev_grads)
    for d in range(NDEV):
        l, g = gfn(state["params"], state["occ_binary"], state["step"],
                   rngs[d])
        losses.append(float(l))
        grads.append(g)
    mean_grads = jax.tree_util.tree_map(
        lambda *gs: sum(gs) / len(gs), *grads)
    updates, _ = system.tx.update(mean_grads, state["opt_state"],
                                  state["params"])
    want_params = jax.tree_util.tree_map(lambda p, u: p + u,
                                         state["params"], updates)

    state_copy = jax.tree_util.tree_map(jnp.asarray, state)
    new_state, aux = step_fn(state_copy, rngs, data)
    assert np.isfinite(float(aux["loss"]))
    np.testing.assert_allclose(float(aux["loss"]), np.mean(losses),
                               rtol=1e-5)
    for got, want in zip(jax.tree_util.tree_leaves(new_state["params"]),
                         jax.tree_util.tree_leaves(want_params)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-6)


def test_sharded_multi_step_runs_and_improves(neus_system):
    """A few sharded steps run end-to-end, keep finite params, and step
    advances (rng discipline: fresh per-device keys each step)."""
    system = neus_system
    state = system.init_state(1)
    data = system.device_data(system.datamodule.train())
    mesh = get_mesh(NDEV)
    step_fn = make_sharded_train_step(system, mesh)
    rng = jax.random.PRNGKey(3)
    losses = []
    for _ in range(4):
        rng, k = jax.random.split(rng)
        state, aux = step_fn(state, per_device_rngs(k, NDEV), data)
        losses.append(float(aux["loss"]))
    assert int(state["step"]) == 4
    assert all(np.isfinite(l) for l in losses)
    for leaf in jax.tree_util.tree_leaves(state["params"]):
        assert np.isfinite(np.asarray(leaf)).all()


def test_sharded_uneven_ray_count(neus_system):
    """train_num_rays not divisible by the device count still runs
    (per-device count floors; capacity floors at 16)."""
    system = neus_system
    saved = system.train_num_rays
    system.train_num_rays = 30  # 30 // 4 = 7 rays per device
    try:
        state = system.init_state(2)
        data = system.device_data(system.datamodule.train())
        mesh = get_mesh(NDEV)
        step_fn = system.make_train_step(mesh=mesh)
        state, aux = step_fn(state, per_device_rngs(jax.random.PRNGKey(0),
                                                    NDEV), data)
        assert np.isfinite(float(aux["loss"]))
    finally:
        system.train_num_rays = saved


def test_sharded_split_occ_full_graph(tmp_path):
    """The flagship stage-1 graph (emitter mips + secondary rays +
    pmean) compiles and executes on the mesh — the driver's
    dryrun_multichip path as a pytest."""
    cfg = tiny_split_config()
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    system = systems.make(cfg.system.name, cfg, dm, save_dir=str(tmp_path))
    state = system.init_state(0)
    data = system.device_data(dm.train())
    mesh = get_mesh(NDEV)
    step_fn = make_sharded_train_step(system, mesh, stage=1)
    state, aux = step_fn(state, per_device_rngs(jax.random.PRNGKey(0), NDEV),
                         data)
    assert np.isfinite(float(aux["loss"]))
    assert int(state["step"]) == 1
