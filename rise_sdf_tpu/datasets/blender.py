"""NeRF-synthetic (blender) dataset loader (reference datasets/blender.py).

Numpy-based eager loader exposing the same attribute surface the systems
consume: ``all_images [N,H,W,3]``, ``all_fg_masks [N,H,W]``,
``all_c2w [N,3,4]``, ``directions [H,W,3]``, ``img_wh``, ``near/far``,
``has_mask``, ``apply_mask``.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
from PIL import Image

from . import register
from ..utils.rays import get_ray_directions


class BlenderSplit:
    def __init__(self, config, split):
        self.config = config
        self.split = split
        self.has_mask = True
        self.apply_mask = True

        with open(os.path.join(config["root_dir"],
                               f"transforms_{split}.json")) as f:
            meta = json.load(f)

        if "w" in meta and "h" in meta:
            W, H = int(meta["w"]), int(meta["h"])
        else:
            W, H = 800, 800
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
        self.focal = 0.5 * self.w / math.tan(0.5 * meta["camera_angle_x"])
        self.directions = get_ray_directions(
            self.w, self.h, self.focal, self.focal, self.w // 2, self.h // 2,
            openGL_camera=bool(config.get("openGL_camera", True)))

        c2ws, images, masks = [], [], []
        for frame in meta["frames"]:
            c2ws.append(np.asarray(frame["transform_matrix"],
                                   np.float32)[:3, :4])
            img_path = os.path.join(config["root_dir"],
                                    f"{frame['file_path']}.png")
            img = Image.open(img_path).resize(self.img_wh, Image.BICUBIC)
            img = np.asarray(img, np.float32) / 255.0
            if img.ndim == 2:
                img = np.stack([img] * 3 + [np.ones_like(img)], -1)
            if img.shape[-1] == 3:
                img = np.concatenate([img, np.ones_like(img[..., :1])], -1)
            masks.append(img[..., -1])
            images.append(img[..., :3])
        self.all_c2w = np.stack(c2ws)
        self.all_images = np.stack(images)
        self.all_fg_masks = np.stack(masks)

    def __len__(self):
        return len(self.all_images)


@register("blender")
class BlenderDataModule:
    def __init__(self, config):
        self.config = config

    def split(self, name):
        return BlenderSplit(self.config, name)

    def train(self):
        return self.split(self.config.get("train_split", "train"))

    def val(self):
        return self.split(self.config.get("val_split", "val"))

    def test(self):
        return self.split(self.config.get("test_split", "test"))
