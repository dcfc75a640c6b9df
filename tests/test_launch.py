"""End-to-end CLI test: launch.py --train on a tiny synthetic config."""

import os
import subprocess
import sys

import yaml
import pytest

pytestmark = pytest.mark.slow  # e2e: excluded from the fast gate (-m 'not slow')


TINY_YAML = {
    "name": "launch-test",
    "tag": "t",
    "seed": 7,
    "dataset": {"name": "synthetic-sphere", "img_wh": [24, 24],
                "n_images": 2},
    "model": {
        "name": "neus", "radius": 1.5, "num_samples_per_ray": 32,
        "train_num_rays": 32, "max_train_num_rays": 32,
        "train_sample_capacity": 256, "eval_samples_per_ray": 16,
        "grid_prune": True, "grid_prune_occ_thre": 0.001,
        "dynamic_ray_sampling": False, "randomized": True,
        "ray_chunk": 144, "cos_anneal_end": 10, "grid_resolution": 16,
        "learned_background": False, "background_color": "white",
        "variance": {"init_val": 0.3, "modulate": False},
        "geometry": {
            "name": "volume-sdf", "radius": 1.5, "feature_dim": 9,
            "grad_type": "analytic",
            "isosurface": {"method": "mc", "resolution": 16,
                           "chunk": 8192, "threshold": 0.0},
            "xyz_encoding_config": {
                "otype": "HashGrid", "n_levels": 2,
                "n_features_per_level": 2, "log2_hashmap_size": 8,
                "base_resolution": 4, "per_level_scale": 2.0,
                "include_xyz": True},
            "mlp_network_config": {
                "otype": "VanillaMLP", "activation": "ReLU",
                "output_activation": "none", "n_neurons": 8,
                "n_hidden_layers": 1, "sphere_init": True,
                "sphere_init_radius": 0.5, "weight_norm": True}},
        "texture": {
            "name": "volume-radiance", "input_feature_dim": 12,
            "dir_encoding_config": {"otype": "SphericalHarmonics",
                                    "degree": 2},
            "mlp_network_config": {
                "otype": "VanillaMLP", "activation": "ReLU",
                "output_activation": "none", "n_neurons": 8,
                "n_hidden_layers": 1},
            "color_activation": "sigmoid"},
    },
    "system": {
        "name": "neus-system",
        "loss": {"lambda_rgb_mse": 10.0, "lambda_rgb_l1": 0.0,
                 "lambda_mask": 0.1, "lambda_eikonal": 0.1,
                 "lambda_sparsity": 0.01, "lambda_distortion": 0.0,
                 "lambda_opaque": 0.0, "sparsity_scale": 1.0},
        "optimizer": {"name": "Adam",
                      "args": {"lr": 0.01},
                      "params": {"geometry": {"lr": 0.01},
                                 "texture": {"lr": 0.01},
                                 "variance": {"lr": 0.001}}},
    },
    "export": {"chunk_size": 8192, "export_vertex_color": True},
    "trainer": {"max_steps": 3, "log_every_n_steps": 1,
                "val_check_interval": None},
}


def test_launch_train(tmp_path):
    cfg_path = tmp_path / "tiny.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(TINY_YAML, f)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "launch.py"),
         "--config", str(cfg_path), "--train",
         "--exp_dir", str(tmp_path / "exp")],
        env=env, capture_output=True, text=True, timeout=3000, cwd=repo)
    assert res.returncode == 0, res.stderr[-3000:]
    exp = tmp_path / "exp" / "launch-test"
    trials = list(exp.iterdir())
    assert len(trials) == 1
    trial = trials[0]
    assert (trial / "config" / "parsed.yaml").exists()
    assert (trial / "config" / "raw.yaml").exists()
    ckpts = list((trial / "ckpt").glob("*.npz"))
    assert ckpts, "no checkpoint written"
    # test artifacts (renders + mesh) in save/
    saves = list((trial / "save").rglob("*"))
    assert any(p.suffix == ".png" for p in saves), saves
