"""COLMAP real-capture dataset (reference datasets/colmap.py) in numpy.

Pose normalization (center: camera/lookat/point + robust trimming, up:
camera mean or RANSAC ground plane), hold-every-N train/test split, and
a spheric trajectory for --predict.
"""

from __future__ import annotations

import math
import os

import numpy as np
from PIL import Image

from . import register
from .colmap_utils import (
    qvec2rotmat,
    ransac_plane,
    read_cameras_binary,
    read_images_binary,
    read_points3d_binary,
)
from ..utils.rays import get_ray_directions


def _normalize(v, axis=-1):
    return v / np.maximum(np.linalg.norm(v, axis=axis, keepdims=True), 1e-12)


def get_center(pts: np.ndarray) -> np.ndarray:
    """Robust center: trim by std + IQR (reference colmap.py:20-27)."""
    center = pts.mean(0)
    dis = np.linalg.norm(pts - center[None], axis=-1)
    mean, std = dis.mean(), dis.std()
    q25, q75 = np.quantile(dis, 0.25), np.quantile(dis, 0.75)
    valid = ((dis > mean - 1.5 * std) & (dis < mean + 1.5 * std)
             & (dis > mean - (q75 - q25) * 1.5)
             & (dis < mean + (q75 - q25) * 1.5))
    return pts[valid].mean(0)


def normalize_poses(poses, pts, up_est_method="camera",
                    center_est_method="camera"):
    """Reference colmap.py:29-110 (numpy)."""
    if center_est_method in ("camera", "point"):
        center = poses[..., 3].mean(0)
    elif center_est_method == "lookat":
        cams_ori = poses[..., 3]
        cams_dir = _normalize(poses[:, :3, :3] @ np.array([0.0, 0.0, -1.0]))
        rolled_dir = np.roll(cams_dir, 1, axis=0)
        rolled_ori = np.roll(cams_ori, 1, axis=0)
        a = np.stack([cams_dir, -rolled_dir], axis=-1)
        b = -cams_ori + rolled_ori
        t = np.stack([np.linalg.lstsq(a[i], b[i], rcond=None)[0]
                      for i in range(len(a))])
        pts_a = cams_ori + cams_dir * t[:, 0:1]
        pts_b = rolled_ori + rolled_dir * t[:, 1:2]
        center = np.concatenate([pts_a, pts_b], 0).mean(0)
    else:
        raise NotImplementedError(center_est_method)

    if up_est_method == "ground":
        plane_eq = ransac_plane(pts, thresh=0.01)
        z = _normalize(plane_eq[:3], axis=0)
        signed = (np.concatenate([pts, np.ones_like(pts[:, :1])], -1)
                  * plane_eq).sum(-1)
        if signed.mean() < 0:
            z = -z
    elif up_est_method == "camera":
        z = _normalize((poses[..., 3] - center).mean(0), axis=0)
    else:
        raise NotImplementedError(up_est_method)

    y_ = np.array([z[1], -z[0], 0.0])
    x = _normalize(np.cross(y_, z), axis=0)
    y = np.cross(z, x)

    n = poses.shape[0]
    poses_homo = np.concatenate(
        [poses, np.tile(np.array([[[0.0, 0.0, 0.0, 1.0]]]), (n, 1, 1))], 1)

    if center_est_method == "point":
        rc = np.stack([x, y, z], axis=1)
        inv = np.eye(4)
        inv[:3, :3] = rc.T
        poses_norm = (inv @ poses_homo)[:, :3]
        pts = (inv[:3, :3] @ pts.T).T
        pmin = poses_norm[..., 3].min(0)
        pmax = poses_norm[..., 3].max(0)
        fg = pts[(pmin[0] < pts[:, 0]) & (pts[:, 0] < pmax[0])
                 & (pmin[1] < pts[:, 1]) & (pts[:, 1] < pmax[1])]
        center = get_center(fg if len(fg) else pts)
        poses_norm[..., 3] -= center
        pts = pts - center
        scale = np.linalg.norm(poses_norm[..., 3], axis=-1).min()
        poses_norm[..., 3] /= scale
        pts = pts / scale
    else:
        rc = np.stack([x, y, z], axis=1)
        inv = np.eye(4)
        inv[:3, :3] = rc.T
        inv[:3, 3] = (-rc.T @ center.reshape(3, 1))[:, 0]
        poses_norm = (inv @ poses_homo)[:, :3]
        scale = np.linalg.norm(poses_norm[..., 3], axis=-1).min()
        poses_norm[..., 3] /= scale
        pts = (inv[:3, :3] @ pts.T).T + inv[:3, 3]
        pts = pts / scale
    return poses_norm.astype(np.float32), pts.astype(np.float32)


def create_spheric_poses(cameras: np.ndarray, n_steps=120) -> np.ndarray:
    """Reference colmap.py:112-130."""
    center = np.zeros(3)
    mean_d = np.linalg.norm(cameras - center[None], axis=-1).mean()
    mean_h = cameras[:, 2].mean()
    r = math.sqrt(max(mean_d ** 2 - mean_h ** 2, 1e-6))
    up = np.array([0.0, 0.0, 1.0])
    out = []
    for theta in np.linspace(0, 2 * math.pi, n_steps):
        cam_pos = np.array([r * math.cos(theta), r * math.sin(theta), mean_h])
        l = _normalize(center - cam_pos, axis=0)
        s = _normalize(np.cross(l, up), axis=0)
        u = _normalize(np.cross(s, l), axis=0)
        c2w = np.concatenate([np.stack([s, u, -l], 1), cam_pos[:, None]], 1)
        out.append(c2w)
    return np.stack(out).astype(np.float32)


class ColmapSplit:
    def __init__(self, config, split):
        self.config = config
        self.split = split
        hold_every = int(config.get("hold_every", 8))
        root = config["root_dir"]
        camdata = read_cameras_binary(os.path.join(root, "sparse/0/cameras.bin"))
        cam = camdata[min(camdata.keys())]
        H, W = int(cam.height), int(cam.width)
        if "img_wh" in config:
            w, h = config["img_wh"]
            assert round(W / w * h) == H
        elif "img_downscale" in config:
            w = int(W / config["img_downscale"] + 0.5)
            h = int(H / config["img_downscale"] + 0.5)
        else:
            raise KeyError("Either img_wh or img_downscale must be specified")
        self.w, self.h = int(w), int(h)
        self.img_wh = (self.w, self.h)
        factor = w / W
        if cam.model == "SIMPLE_RADIAL":
            fx = fy = cam.params[0] * factor
            cx, cy = cam.params[1] * factor, cam.params[2] * factor
        elif cam.model in ("PINHOLE", "OPENCV"):
            fx, fy = cam.params[0] * factor, cam.params[1] * factor
            cx, cy = cam.params[2] * factor, cam.params[3] * factor
        elif cam.model == "SIMPLE_PINHOLE":
            fx = fy = cam.params[0] * factor
            cx, cy = cam.params[1] * factor, cam.params[2] * factor
        else:
            raise ValueError(f"Unsupported camera model {cam.model}")
        self.directions = get_ray_directions(self.w, self.h, fx, fy, cx, cy)
        self.near = float(config.get("near_plane", 0.1))
        self.far = float(config.get("far_plane", 1e3))

        imdata = read_images_binary(os.path.join(root, "sparse/0/images.bin"))
        mask_dir = os.path.join(root, "masks")
        self.has_mask = os.path.isdir(mask_dir)
        self.apply_mask = self.has_mask and bool(config.get("apply_mask", True))

        c2ws, images, masks = [], [], []
        for d in imdata.values():
            r = qvec2rotmat(d.qvec)
            t = d.tvec.reshape(3, 1)
            c2w = np.concatenate([r.T, -r.T @ t], axis=1).astype(np.float32)
            c2w[:, 1:3] *= -1.0  # COLMAP -> OpenGL
            c2ws.append(c2w)
            img_path = os.path.join(root, "images", d.name)
            img = Image.open(img_path).convert("RGB").resize(
                self.img_wh, Image.BICUBIC)
            images.append(np.asarray(img, np.float32) / 255.0)
            if self.has_mask:
                for mp in (os.path.join(mask_dir, d.name),
                           os.path.join(mask_dir, d.name[3:])):
                    if os.path.exists(mp):
                        m = Image.open(mp).convert("L").resize(
                            self.img_wh, Image.BICUBIC)
                        masks.append(np.asarray(m, np.float32) / 255.0)
                        break
            else:
                masks.append(np.ones((self.h, self.w), np.float32))

        all_c2w = np.stack(c2ws)
        pts3d_map = read_points3d_binary(
            os.path.join(root, "sparse/0/points3D.bin"))
        pts3d = np.stack([p.xyz for p in pts3d_map.values()]).astype(np.float32)
        all_c2w, self.pts3d = normalize_poses(
            all_c2w, pts3d,
            up_est_method=config.get("up_est_method", "camera"),
            center_est_method=config.get("center_est_method", "camera"))

        n = len(all_c2w)
        if split == "predict":
            steps = int(config.get("n_test_traj_steps", 120))
            self.all_c2w = create_spheric_poses(all_c2w[:, :, 3], steps)
            self.all_images = np.zeros((steps, self.h, self.w, 3), np.float32)
            self.all_fg_masks = np.zeros((steps, self.h, self.w), np.float32)
        else:
            if split in ("train", "val"):
                idx = [i for i in range(n) if i % hold_every != 0]
            else:
                idx = [i for i in range(n) if i % hold_every == 0]
            self.all_c2w = all_c2w[idx]
            self.all_images = np.stack(images)[idx]
            self.all_fg_masks = np.stack(masks)[idx]

    def __len__(self):
        return len(self.all_images)


@register("colmap")
class ColmapDataModule:
    def __init__(self, config):
        self.config = config

    def split(self, name):
        return ColmapSplit(self.config, name)

    def train(self):
        return self.split("train")

    def val(self):
        return self.split(self.config.get("val_split", "train"))

    def test(self):
        return self.split(self.config.get("test_split", "test"))

    def predict(self):
        return self.split("predict")
