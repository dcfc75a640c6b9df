"""Variance modulation semantics (reference VarianceNetwork,
models/split_mixed_occ.py:21-56): the cap ramps from prev_inv_s — the
value when modulation starts — to max_inv_s, not from zero."""

import jax
import jax.numpy as jnp
import numpy as np

from rise_sdf_tpu.models.variance import Variance


def _ref_inv_s(variance_by_step, cfg, step):
    """Oracle: replay the reference's update_step/prev_inv_s logic."""
    prev = None
    for s in range(step + 1):
        do_mod = s > cfg["mod_start_steps"]
        if not do_mod:
            prev = float(np.exp(variance_by_step[s] * 10.0))
    val = float(np.exp(variance_by_step[step] * 10.0))
    if step > cfg["mod_start_steps"]:
        cap = min((step / cfg["reach_max_steps"])
                  * (cfg["max_inv_s"] - prev) + prev, cfg["max_inv_s"])
        val = min(val, cap)
    return val


def test_modulation_ramps_from_prev_inv_s():
    cfg = {"init_val": 0.3, "modulate": True, "mod_start_steps": 5,
           "reach_max_steps": 20, "max_inv_s": 1024.0}
    var = Variance(cfg)
    params = var.init(jax.random.PRNGKey(0))
    # simulate training: variance grows linearly step by step
    variance_by_step = [0.3 + 0.05 * s for s in range(30)]
    for s in range(30):
        params["variance"] = jnp.asarray(variance_by_step[s], jnp.float32)
        got = float(var.inv_s(params, s))
        want = _ref_inv_s(variance_by_step, cfg, s)
        np.testing.assert_allclose(got, want, rtol=1e-4, err_msg=f"step {s}")
        params = var.post_update(params, s)


def test_no_collapse_at_mod_start():
    """At mod_start+1 the cap must sit at ~prev_inv_s, not near zero
    (the round-1 bug clamped a trained inv_s of ~300 down to the ramp)."""
    cfg = {"init_val": 0.3, "modulate": True, "mod_start_steps": 100,
           "reach_max_steps": 100000, "max_inv_s": 1024.0}
    var = Variance(cfg)
    params = var.init(jax.random.PRNGKey(0))
    params["variance"] = jnp.asarray(0.57, jnp.float32)  # inv_s ~ 300
    params = var.post_update(params, 100)  # capture prev at mod start
    got = float(var.inv_s(params, 101))
    assert got > 290.0, f"inv_s collapsed to {got} at mod start"


def test_unmodulated_passthrough():
    var = Variance({"init_val": 0.3, "modulate": False})
    params = var.init(jax.random.PRNGKey(0))
    assert "prev_inv_s" not in params
    np.testing.assert_allclose(float(var.inv_s(params, 50)),
                               float(np.exp(3.0)), rtol=1e-5)
    assert var.post_update(params, 50) is params


def test_ssim_bounded_on_constant_background():
    """SSIM must never exceed 1 (near-zero-variance windows previously
    pushed it to ~1.03 via negative float-error variances)."""
    import jax.numpy as jnp

    from rise_sdf_tpu.systems.criterions import ssim

    a = jnp.ones((64, 64, 3))
    b = jnp.ones((64, 64, 3))
    a = a.at[30:34, 30:34].set(0.5)
    b = b.at[30:34, 30:34].set(0.48)
    val = float(ssim(a, b))
    assert val <= 1.0 + 1e-6, val
    assert val > 0.9
    assert float(ssim(a, a)) <= 1.0 + 1e-6


def test_mean_angular_error_degrees_and_mask():
    """30-degree rotation reads as 30 deg; masked-out garbage is ignored
    (reference criterions.py:161-181 masks by GT alpha)."""
    import jax.numpy as jnp
    import numpy as np

    from rise_sdf_tpu.systems.criterions import mean_angular_error

    th = np.deg2rad(30.0)
    gt = np.tile([0.0, 0.0, 1.0], (16, 1)).astype(np.float32)
    pred = np.tile([np.sin(th), 0.0, np.cos(th)], (16, 1)).astype(np.float32)
    err = float(mean_angular_error(jnp.asarray(pred), jnp.asarray(gt),
                                   degrees=True))
    np.testing.assert_allclose(err, 30.0, atol=0.05)

    # poison the second half, mask it out
    pred2 = pred.copy()
    pred2[8:] = [-1.0, 0.0, 0.0]
    mask = np.zeros((16, 1), np.float32)
    mask[:8] = 1.0
    err_m = float(mean_angular_error(jnp.asarray(pred2), jnp.asarray(gt),
                                     mask=jnp.asarray(mask), degrees=True))
    np.testing.assert_allclose(err_m, 30.0, atol=0.05)
    # unmasked mean must be pulled up by the poisoned rows
    assert float(mean_angular_error(jnp.asarray(pred2), jnp.asarray(gt),
                                    degrees=True)) > 50.0
