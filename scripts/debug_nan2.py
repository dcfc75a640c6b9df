"""Reproduce the step-6 NaN and dissect the forward tensor by tensor."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("OMP_NUM_THREADS", "1")

import jax
import jax.numpy as jnp
import numpy as np


def chk(name, v):
    v = np.asarray(v)
    finite = np.isfinite(v)
    print(f"{name}: finite={finite.all()} ({(~finite).sum()} bad) "
          f"min={v[finite].min() if finite.any() else '-'} "
          f"max={v[finite].max() if finite.any() else '-'}", flush=True)
    return finite.all()


def main():
    from rise_sdf_tpu import datasets, systems
    from rise_sdf_tpu.presets import tiny_split_config
    from rise_sdf_tpu.ops import march as march_ops

    cfg = tiny_split_config()
    cfg.dataset.merge({"img_wh": [96, 96], "n_images": 16})
    cfg.model.geometry.xyz_encoding_config.merge(
        {"n_levels": 12, "log2_hashmap_size": 17, "base_resolution": 16,
         "per_level_scale": 1.447269237440378,
         "start_level": 4, "start_step": 50, "update_steps": 25})
    cfg.model.geometry.mlp_network_config.merge({"n_neurons": 64,
                                                 "n_hidden_layers": 1})
    cfg.model.geometry.feature_dim = 16
    cfg.model.merge({"num_samples_per_ray": 512, "train_num_rays": 1024,
                     "max_train_num_rays": 1024,
                     "train_sample_capacity": 65536,
                     "eval_samples_per_ray": 96, "ray_chunk": 4096,
                     "grid_resolution": 64, "cos_anneal_end": 200,
                     "split_sum_kick_in_step": 200,
                     "num_samples_per_secondary_ray": 48})
    cfg.model.texture.input_feature_dim = 16
    for head in ["metallic", "albedo", "spec", "roughness", "secondary"]:
        cfg.model.texture[f"{head}_mlp_network_config"].merge(
            {"n_neurons": 64, "n_hidden_layers": 2})
    cfg.model.light.envlight_config.base_res = 128

    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    system = systems.make(cfg.system.name, cfg, dm, save_dir="/tmp/dbg2")
    model = system.model
    state = system.init_state(0)
    data = system.device_data(dm.train())
    ts_fn = system.make_train_step(0)
    occ_update = system.occupancy_update_fn()
    rng = jax.random.PRNGKey(1)
    k6 = None
    for step in range(7):
        if step % 16 == 0:
            rng, k = jax.random.split(rng)
            occs, binary = occ_update(state["params"], state["occs"],
                                      state["step"], k)
            state["occs"], state["occ_binary"] = occs, binary
        rng, k = jax.random.split(rng)
        if step == 6:
            k6 = k
            break
        state, aux = ts_fn(state, k, data)
    print("reached step 6; params finite:",
          all(bool(jnp.all(jnp.isfinite(l)).item())
              for l in jax.tree_util.tree_leaves(state["params"])), flush=True)

    # replicate the train step's forward piecewise
    k_batch, k_model = jax.random.split(k6)
    batch = jax.jit(lambda kb: system.sample_batch(kb, data, bg_srgb=True))(
        k_batch)
    chk("rays", batch["rays"])
    params = state["params"]
    step_arr = state["step"]
    rng2, k1, k2 = jax.random.split(k_model, 3)
    rays_o, rays_d = batch["rays"][:, 0:3], batch["rays"][:, 3:6]

    rs = jax.jit(lambda d, krng: march_ops.march_rays(
        rays_o, d, aabb_min=model.aabb_min, aabb_max=model.aabb_max,
        step_size=model.render_step_size, num_samples=512, capacity=65536,
        grid_binary=state["occ_binary"], grid_resolution=64, rng=krng))(
            rays_d, k1)
    chk("t_starts", rs.t_starts)
    chk("t_ends", rs.t_ends)
    t_mid = 0.5 * (rs.t_starts + rs.t_ends)
    ridx = jnp.clip(rs.ray_indices, 0, 1023)
    positions = rays_o[ridx] + rays_d[ridx] * t_mid[:, None]
    chk("positions", positions)

    raw = jax.jit(lambda p, pos: model.geometry.raw(p["geometry"], pos,
                                                    step_arr))(params,
                                                               positions)
    chk("raw(feature)", raw)

    geo = jax.jit(lambda p, pos, kr: model.geometry.forward(
        p["geometry"], pos, step_arr, with_grad=True, with_feature=True,
        with_laplace=True, rng=kr))(params, positions, k2)
    chk("sdf", geo["sdf"])
    ok_grad = chk("fd grad", geo["grad"])
    chk("laplace", geo["laplace"])

    if not ok_grad:
        # which probe? recompute probes eagerly
        eps = float(jax.jit(lambda: model.geometry.fd_eps(step_arr))())
        print("fd_eps =", eps, flush=True)
        offs = np.asarray([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                           [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.float32)
        xd = np.asarray(positions)[:, None, :] + eps * offs[None]
        xd = np.clip(xd, -1.5, 1.5)
        sdf_d = jax.jit(lambda p, q: model.geometry.sdf(p["geometry"], q,
                                                        step_arr))(
            params, jnp.asarray(xd.reshape(-1, 3)))
        chk("probe sdf", sdf_d)

    # alpha / weights
    from rise_sdf_tpu.models.neus import neus_alpha
    normal = np.asarray(geo["grad"])
    normal = normal / np.sqrt((normal ** 2).sum(-1, keepdims=True) + 1e-12)
    inv_s = float(jax.jit(lambda p: model.variance.inv_s(p["variance"],
                                                         step_arr))(params))
    t_dirs = np.asarray(rays_d)[np.asarray(ridx)]
    true_cos = (t_dirs * normal).sum(-1)
    dists = np.asarray(rs.t_ends - rs.t_starts)
    alpha = jax.jit(neus_alpha)(jnp.asarray(np.asarray(geo["sdf"])),
                                inv_s, jnp.asarray(true_cos),
                                jnp.asarray(dists), 6.0 / 200)
    chk("alpha", alpha)


if __name__ == "__main__":
    main()
