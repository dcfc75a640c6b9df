import jax
import jax.numpy as jnp
import numpy as np

from rise_sdf_tpu.systems.optim import make_lr_schedule, make_optimizer


def ref_scheduler_cfg(max_steps=80000, warmup=500):
    gamma = 0.1 ** (1.0 / (max_steps - warmup))
    return {
        "scheduler": {
            "name": "SequentialLR", "interval": "step",
            "milestones": [warmup],
            "schedulers": [
                {"name": "LinearLR",
                 "args": {"start_factor": 0.01, "end_factor": 1.0,
                          "total_iters": warmup}},
                {"name": "ExponentialLR", "args": {"gamma": gamma}},
            ],
        }
    }


def test_warmup_then_exp_decay():
    cfg = ref_scheduler_cfg(80000, 500)
    s = make_lr_schedule(cfg)
    np.testing.assert_allclose(float(s(0)), 0.01, rtol=1e-5)
    np.testing.assert_allclose(float(s(250)), 0.505, rtol=1e-4)
    np.testing.assert_allclose(float(s(500)), 1.0, rtol=1e-5)
    # at the end of training the exp branch reaches the 0.1 factor
    np.testing.assert_allclose(float(s(80000)), 0.1, rtol=1e-3)


def test_per_group_lrs():
    params = {"geometry": {"w": jnp.ones((3,))},
              "variance": {"v": jnp.ones(())},
              "emitter": {"base": jnp.ones((2,))}}
    cfg = {
        "optimizer": {
            "name": "Adam",
            "args": {"lr": 0.005, "betas": [0.9, 0.999], "eps": 1e-12},
            "params": {"geometry": {"lr": 0.005},
                       "variance": {"lr": 0.001},
                       "emitter": {"lr": 0.01}},
        }
    }
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    # adam normalizes grad magnitude to ~1 at step 1 -> update = -lr
    np.testing.assert_allclose(np.asarray(updates["geometry"]["w"]),
                               -0.005, rtol=1e-3)
    np.testing.assert_allclose(float(updates["variance"]["v"]),
                               -0.001, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(updates["emitter"]["base"]),
                               -0.01, rtol=1e-3)


def test_schedule_applies_over_steps():
    params = {"g": {"w": jnp.ones((2,))}}
    cfg = {
        "optimizer": {"name": "Adam", "args": {"lr": 1.0},
                      "params": {"g": {"lr": 1.0}}},
        "scheduler": {"name": "ExponentialLR", "args": {"gamma": 0.5}},
    }
    tx = make_optimizer(cfg, params)
    st = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    u0, st = tx.update(grads, st, params)
    u1, st = tx.update(grads, st, params)
    u2, st = tx.update(grads, st, params)
    r1 = float(u1["g"]["w"][0] / u0["g"]["w"][0])
    r2 = float(u2["g"]["w"][0] / u1["g"]["w"][0])
    np.testing.assert_allclose([r1, r2], [0.5, 0.5], rtol=2e-2)


def test_group_lr_zero_freezes_group():
    """A param group with lr=0 receives exactly zero updates — the
    mechanism behind the r4 ripple rescue (freezing the learned inv_s
    by setting system.optimizer.params.variance.lr=0 on resume) and a
    general fine-tuning facility."""
    params = {"geometry": {"w": jnp.ones((3,))},
              "variance": {"v": jnp.asarray(0.67)}}
    cfg = {
        "optimizer": {"name": "Adam", "args": {"lr": 0.005},
                      "params": {"geometry": {"lr": 0.005},
                                 "variance": {"lr": 0.0}}},
    }
    tx = make_optimizer(cfg, params)
    st = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    for _ in range(3):
        updates, st = tx.update(grads, st, params)
        assert float(jnp.abs(updates["variance"]["v"])) == 0.0
        assert float(jnp.abs(updates["geometry"]["w"]).max()) > 0.0
