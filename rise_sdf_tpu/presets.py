"""Small self-contained config presets (tests, graft entry, bench)."""

from __future__ import annotations

from .config import ConfigNode


def tiny_mlp(layers=1, neurons=16, sphere=False):
    cfg = {"otype": "VanillaMLP", "activation": "ReLU",
           "output_activation": "none", "n_neurons": neurons,
           "n_hidden_layers": layers}
    if sphere:
        cfg.update({"sphere_init": True, "sphere_init_radius": 0.5,
                    "weight_norm": True})
    return cfg


def geometry_cfg(grad_type="analytic", progressive=False, levels=4,
                 feature_dim=13, neurons=16):
    enc = {"otype": "ProgressiveBandHashGrid" if progressive else "HashGrid",
           "n_levels": levels, "n_features_per_level": 2,
           "log2_hashmap_size": 12, "base_resolution": 8,
           "per_level_scale": 1.6, "include_xyz": True}
    if progressive:
        enc.update({"start_level": 2, "start_step": 10, "update_steps": 10})
    g = {"name": "volume-sdf", "radius": 1.5, "feature_dim": feature_dim,
         "grad_type": grad_type,
         "isosurface": {"method": "mc", "resolution": 32, "chunk": 65536,
                        "threshold": 0.0},
         "xyz_encoding_config": enc,
         "mlp_network_config": tiny_mlp(1, neurons, sphere=True)}
    if grad_type == "finite_difference":
        g["finite_difference_eps"] = "progressive" if progressive else 0.01
    return g


def tiny_neus_config():
    return ConfigNode({
        "dataset": {"name": "synthetic-sphere", "img_wh": [32, 32],
                    "n_images": 3},
        "model": {
            "name": "neus", "radius": 1.5, "num_samples_per_ray": 64,
            "train_num_rays": 64, "max_train_num_rays": 64,
            "train_sample_capacity": 1024, "eval_samples_per_ray": 32,
            "grid_prune": True, "grid_prune_occ_thre": 0.001,
            "dynamic_ray_sampling": False, "randomized": True,
            "ray_chunk": 256, "cos_anneal_end": 20,
            "grid_resolution": 32,
            "learned_background": False, "background_color": "random",
            "variance": {"init_val": 0.3, "modulate": False},
            "geometry": geometry_cfg("analytic"),
            "texture": {
                "name": "volume-radiance", "input_feature_dim": 16,
                "dir_encoding_config": {"otype": "SphericalHarmonics",
                                        "degree": 4},
                "mlp_network_config": tiny_mlp(2, 16),
                "color_activation": "sigmoid"},
        },
        "system": {
            "name": "neus-system",
            "loss": {"lambda_rgb_mse": 10.0, "lambda_rgb_l1": 0.0,
                     "lambda_mask": 0.1, "lambda_eikonal": 0.1,
                     "lambda_sparsity": 0.01, "lambda_distortion": 0.0,
                     "lambda_opaque": 0.0, "sparsity_scale": 1.0},
            "optimizer": {"name": "Adam",
                          "args": {"lr": 0.01, "betas": [0.9, 0.99],
                                   "eps": 1e-15},
                          "params": {"geometry": {"lr": 0.01},
                                     "texture": {"lr": 0.01},
                                     "variance": {"lr": 0.001}}},
            "scheduler": {"name": "ExponentialLR",
                          "args": {"gamma": 0.999}},
        },
        "export": {"chunk_size": 65536, "export_vertex_color": True},
        "trainer": {"max_steps": 25, "log_every_n_steps": 10},
    })


def tiny_split_config():
    tex_mlp = tiny_mlp(1, 16)
    cfg = tiny_neus_config()
    cfg.model.merge({
        "name": "split-mixed-occ", "indirect_pred": True,
        "relighting_threshold": 0.3, "num_samples_per_secondary_ray": 16,
        "split_sum_kick_in_step": 10,
        "geometry": geometry_cfg("finite_difference", progressive=True),
        "texture": {
            "name": "volume-mixed-mip-split-occ", "input_feature_dim": 13,
            "other_dim": 3,
            "dir_encoding_config": {"otype": "SphericalHarmonics",
                                    "degree": 4},
            "xyz_encoding_config": {"otype": "VanillaFrequency",
                                    "n_frequencies": 3},
            "metallic_mlp_network_config": tex_mlp,
            "albedo_mlp_network_config": tex_mlp,
            "spec_mlp_network_config": tex_mlp,
            "roughness_mlp_network_config": tex_mlp,
            "secondary_mlp_network_config": tex_mlp,
            "color_activation": "sigmoid"},
        "light": {"name": "envlight-mip-cube",
                  "envlight_config": {"hdr_filepath": None, "clamp": True,
                                      "nmf_format": False, "scale": 0.5,
                                      "bias": 0.25, "base_res": 32}},
    })
    cfg.system.merge({
        "name": "split-occ-system",
        "loss": {"lambda_rgb_phys_mse": 10.0, "lambda_rgb_phys_l1": 0.0,
                 "lambda_curvature": 0.5, "lambda_normal_orientation": 0.05,
                 "lambda_emitter_distillation": 0.0,
                 "lambda_eikonal": 0.05},
        "optimizer": {"params": {"emitter": {"lr": 0.01}}},
    })
    cfg["dataset"]["relight_list"] = []
    cfg["dataset"]["has_albedo"] = True
    cfg["dataset"]["has_roughness"] = True
    return cfg
