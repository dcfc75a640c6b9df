"""TensoIR-synthetic dataset loader (reference datasets/tensoir_synthetic.py).

Per-frame directories ``{split}_NNN/`` with ``metadata.json``
(``cam_transform_mat``, ``cam_angle_x``), ``rgba.png``, optional
``albedo.exr|png``, ``roughness.exr``, ``normal.exr`` (alpha-composited
over a +z background then normalized), and relighting ground truth
``rgba_{light}.png`` per entry of ``relight_list``.

EXR/HDR files are read via OpenCV (replaces pyexr).  Note: the reference
has a latent bug reading png roughness (``tensoir_synthetic.py:121-127``
checks ``albedo_format`` and clobbers the path variable); we implement
the clean behavior.
"""

from __future__ import annotations

import json
import math
import os
from pathlib import Path

import numpy as np
from PIL import Image

from . import register
from ..utils.rays import get_ray_directions

os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")


def _read_exr(path: str) -> np.ndarray:
    """EXR via the built-in reader; cv2 for other float formats."""
    if str(path).endswith(".exr"):
        from ..utils.exr import read_exr

        return read_exr(str(path))
    import cv2

    img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    img = img.astype(np.float32)
    if img.ndim == 3 and img.shape[-1] >= 3:
        # BGR(A) -> RGB(A)
        img = np.concatenate(
            [img[..., 2:3], img[..., 1:2], img[..., 0:1], img[..., 3:]],
            axis=-1) if img.shape[-1] == 4 else img[..., ::-1]
    return np.ascontiguousarray(img)


class TensoIRSplit:
    def __init__(self, config, split):
        self.config = config
        self.split = split
        self.has_mask = True
        self.apply_mask = True

        root = Path(config["root_dir"])
        split_list = sorted(x for x in root.iterdir()
                            if x.stem.startswith(split))
        with open(split_list[0] / "metadata.json") as f:
            meta = json.load(f)
        W, H = int(meta.get("w", 800)), int(meta.get("h", 800))
        if "img_wh" in config:
            w, h = config["img_wh"]
            assert round(W / w * h) == H
        elif "img_downscale" in config:
            w, h = W // config["img_downscale"], H // config["img_downscale"]
        else:
            raise KeyError("Either img_wh or img_downscale must be specified")
        self.w, self.h = int(w), int(h)
        self.img_wh = (self.w, self.h)
        self.near = float(config.get("near_plane", 2.0))
        self.far = float(config.get("far_plane", 6.0))
        self.focal = 0.5 * self.w / math.tan(0.5 * meta["cam_angle_x"])
        self.directions = get_ray_directions(
            self.w, self.h, self.focal, self.focal, self.w // 2, self.h // 2,
            openGL_camera=bool(config.get("openGL_camera", True)))

        has_albedo = bool(config.get("has_albedo", False))
        has_roughness = bool(config.get("has_roughness", False))
        relight_list = list(config.get("relight_list", []))

        c2ws, images, masks, normals = [], [], [], []
        albedos, roughs = [], []
        relight = {l: [] for l in relight_list}
        for item in split_list:
            with open(item / "metadata.json") as f:
                m = json.load(f)
            c2w = np.asarray(
                list(map(float, m["cam_transform_mat"].split(","))),
                np.float32).reshape(4, 4)[:3, :4]
            c2ws.append(c2w)
            img = Image.open(item / "rgba.png").resize(self.img_wh,
                                                       Image.BICUBIC)
            img = np.asarray(img, np.float32) / 255.0
            masks.append(img[..., -1])
            images.append(img[..., :3])

            if has_albedo:
                fmt = config.get("albedo_format", "exr")
                if fmt == "exr":
                    alb = _read_exr(item / "albedo.exr")
                else:
                    a = Image.open(item / f"albedo.{fmt}").resize(
                        self.img_wh, Image.BICUBIC)
                    alb = np.asarray(a, np.float32) / 255.0
                albedos.append(alb[..., :3])
            if has_roughness:
                fmt = config.get("roughness_format", "exr")
                if fmt == "exr":
                    rough = _read_exr(item / "roughness.exr")
                else:
                    r = Image.open(item / f"roughness.{fmt}").resize(
                        self.img_wh, Image.BICUBIC)
                    rough = np.asarray(r, np.float32) / 255.0
                if rough.ndim == 2:
                    rough = rough[..., None]
                roughs.append(rough[..., :1])

            normal_img = _read_exr(item / "normal.exr")
            normal_bg = np.array([0.0, 0.0, 1.0], np.float32)
            na = normal_img[..., -1:]
            nrm = normal_img[..., :3] * na + normal_bg * (1.0 - na)
            nrm = nrm / np.maximum(
                np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9)
            normals.append(nrm)

            for light in relight_list:
                ri = Image.open(item / f"rgba_{light}.png").resize(
                    self.img_wh, Image.BICUBIC)
                ri = np.asarray(ri, np.float32) / 255.0
                relight[light].append(ri[..., :3])

        self.all_c2w = np.stack(c2ws)
        self.all_images = np.stack(images)
        self.all_fg_masks = np.stack(masks)
        self.all_normals = np.stack(normals)
        if has_albedo:
            self.all_albedo = np.stack(albedos)
        if has_roughness:
            self.all_roughness = np.stack(roughs)
        self.relight_images = {l: np.stack(v) for l, v in relight.items()}

    def __len__(self):
        return len(self.all_images)


@register("tensoir")
class TensoIRDataModule:
    def __init__(self, config):
        self.config = config

    def split(self, name):
        return TensoIRSplit(self.config, name)

    def train(self):
        return self.split(self.config.get("train_split", "train"))

    def val(self):
        return self.split(self.config.get("val_split", "test"))

    def test(self):
        return self.split(self.config.get("test_split", "test"))
