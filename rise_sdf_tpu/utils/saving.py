"""Artifact saving (images, HDR, sequences, meshes, arrays).

Equivalent of the reference ``SaverMixin`` (``utils/mixins.py``) without
torch/trimesh/pyexr: PNG grids via cv2, EXR/HDR via cv2, mp4/gif
sequences via imageio (gif fallback when no ffmpeg), PLY meshes via a
small built-in writer.
"""

from __future__ import annotations

import os
import re
from typing import List, Optional

import numpy as np

os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")


class Saver:
    def __init__(self, save_dir: str):
        self.save_dir = save_dir

    def get_save_path(self, filename: str) -> str:
        path = os.path.join(self.save_dir, filename)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        return path

    # -- images ---------------------------------------------------------- #
    def _img_to_u8(self, spec: dict) -> np.ndarray:
        img = np.asarray(spec["img"], np.float32)
        kwargs = spec.get("kwargs", {})
        typ = spec["type"]
        if typ == "rgb":
            rng = kwargs.get("data_range", (0, 1))
            img = (img - rng[0]) / (rng[1] - rng[0])
            img = np.clip(img, 0, 1)
            return (img * 255).astype(np.uint8)
        if typ == "grayscale":
            rng = kwargs.get("data_range", "auto")
            if rng is None:
                img = np.clip(img, 0, 1)
            elif rng == "auto" or rng == ():
                lo, hi = float(img.min()), float(img.max())
                img = (img - lo) / max(hi - lo, 1e-8)
            else:
                img = np.clip((img - rng[0]) / (rng[1] - rng[0]), 0, 1)
            import cv2

            cmap = kwargs.get("cmap", "jet")
            u8 = (img * 255).astype(np.uint8)
            if cmap == "jet":
                return cv2.cvtColor(cv2.applyColorMap(u8, cv2.COLORMAP_JET),
                                    cv2.COLOR_BGR2RGB)
            return np.stack([u8] * 3, -1)
        raise ValueError(typ)

    def save_image_grid(self, filename: str, specs: List[dict]) -> str:
        """Horizontally-concatenated grid like the reference mixin."""
        path = self.get_save_path(filename)
        if filename.endswith(".exr") or filename.endswith(".hdr"):
            imgs = [np.asarray(s["img"], np.float32) for s in specs]
            imgs = [i if i.ndim == 3 else i[..., None] for i in imgs]
            imgs = [np.repeat(i, 3, -1) if i.shape[-1] == 1 else i for i in imgs]
            grid = np.concatenate(imgs, axis=1)
            self._write_hdr(path, grid)
            return path
        imgs = [self._img_to_u8(s) for s in specs]
        h = max(i.shape[0] for i in imgs)
        imgs = [np.pad(i, ((0, h - i.shape[0]), (0, 0), (0, 0))) for i in imgs]
        grid = np.concatenate(imgs, axis=1)
        import cv2

        cv2.imwrite(path, cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))
        return path

    def save_cubemap(self, filename: str, img, data_range=(0, 1)) -> str:
        """Cubemap [6, S, S, C] as a horizontal-cross layout png, one
        cross per 3-channel group (reference utils/mixins.py:164-184:
        row layout [_, +y, _, _] / [-x, +z, +x, -z] / [_, -y, _, _])."""
        img = np.asarray(img, np.float32)
        assert img.ndim == 4 and img.shape[0] == 6 \
            and img.shape[1] == img.shape[2], img.shape
        crosses = []
        for start in range(0, img.shape[-1], 3):
            group = img[..., start:start + 3]
            faces = np.stack([
                self._img_to_u8({"type": "rgb", "img": group[i],
                                 "kwargs": {"data_range": data_range}})
                for i in range(6)], axis=0)
            size = faces.shape[1]
            blank = np.zeros((size, size, 3), np.uint8)
            cross = np.concatenate([
                np.concatenate([blank, faces[2], blank, blank], axis=1),
                np.concatenate([faces[1], faces[4], faces[0], faces[5]],
                               axis=1),
                np.concatenate([blank, faces[3], blank, blank], axis=1),
            ], axis=0)
            crosses.append(cross)
        import cv2

        path = self.get_save_path(filename)
        cv2.imwrite(path, cv2.cvtColor(np.concatenate(crosses, axis=1),
                                       cv2.COLOR_RGB2BGR))
        return path

    def _write_hdr(self, path: str, img: np.ndarray):
        if path.endswith(".exr"):
            from .exr import write_exr

            write_exr(path, np.asarray(img, np.float32))
            return
        import cv2

        bgr = np.ascontiguousarray(img[..., ::-1]).astype(np.float32)
        try:
            ok = cv2.imwrite(path, bgr)
        except Exception:
            ok = False
        if not ok:
            np.save(path + ".npy", img)

    # -- sequences ------------------------------------------------------- #
    def save_img_sequence(self, filename: str, img_dir: str, matcher: str,
                          save_format: str = "mp4", fps: int = 30) -> Optional[str]:
        """Collect images matching ``matcher`` under ``img_dir`` into a video.

        Reference ``utils/mixins.py:199-217``; falls back to GIF when no
        ffmpeg backend is available.
        """
        import imageio

        pattern = re.compile(matcher)
        src_dir = os.path.join(self.save_dir, img_dir)
        if not os.path.isdir(src_dir):
            return None
        frames = []
        for f in sorted(os.listdir(src_dir)):
            m = pattern.search(f)
            if m:
                frames.append((int(m.groups()[0]), os.path.join(src_dir, f)))
        if not frames:
            return None
        frames.sort()
        imgs = [imageio.imread(p) for _, p in frames]
        for fmt in ([save_format, "gif"] if save_format != "gif" else ["gif"]):
            path = self.get_save_path(f"{filename}.{fmt}")
            try:
                if fmt == "gif":
                    imageio.mimsave(path, imgs, duration=1.0 / fps)
                else:
                    imageio.mimsave(path, imgs, fps=fps)
                return path
            except Exception:
                continue
        return None

    # -- data ------------------------------------------------------------ #
    def save_npy(self, filename: str, arr: np.ndarray) -> str:
        path = self.get_save_path(filename)
        np.save(path, np.asarray(arr))
        return path

    def save_mesh(self, filename: str, v_pos, t_pos_idx, v_rgb=None) -> str:
        path = self.get_save_path(filename)
        write_ply(path, np.asarray(v_pos), np.asarray(t_pos_idx),
                  None if v_rgb is None else np.asarray(v_rgb))
        return path


def write_ply(path: str, verts: np.ndarray, faces: np.ndarray,
              colors: Optional[np.ndarray] = None):
    """Minimal binary-little-endian PLY writer (replaces trimesh export)."""
    n_v, n_f = len(verts), len(faces)
    with open(path, "wb") as f:
        header = ["ply", "format binary_little_endian 1.0",
                  f"element vertex {n_v}",
                  "property float x", "property float y", "property float z"]
        if colors is not None:
            header += ["property uchar red", "property uchar green",
                       "property uchar blue"]
        header += [f"element face {n_f}",
                   "property list uchar int vertex_indices", "end_header"]
        f.write(("\n".join(header) + "\n").encode())
        if colors is not None:
            c8 = np.clip(colors * 255, 0, 255).astype(np.uint8)
            rec = np.zeros(n_v, dtype=[("v", "<f4", 3), ("c", "u1", 3)])
            rec["v"] = verts.astype(np.float32)
            rec["c"] = c8
            f.write(rec.tobytes())
        else:
            f.write(verts.astype("<f4").tobytes())
        frec = np.zeros(n_f, dtype=[("n", "u1"), ("i", "<i4", 3)])
        frec["n"] = 3
        frec["i"] = faces.astype(np.int32)
        f.write(frec.tobytes())


def load_ply(path: str):
    """Minimal reader for the files produced by ``write_ply`` (tests)."""
    with open(path, "rb") as f:
        line = b""
        n_v = n_f = 0
        has_color = False
        while not line.startswith(b"end_header"):
            line = f.readline().strip()
            if line.startswith(b"element vertex"):
                n_v = int(line.split()[-1])
            elif line.startswith(b"element face"):
                n_f = int(line.split()[-1])
            elif line.startswith(b"property uchar red"):
                has_color = True
        if has_color:
            rec = np.frombuffer(
                f.read(n_v * (12 + 3)),
                dtype=[("v", "<f4", 3), ("c", "u1", 3)])
            verts = rec["v"].copy()
        else:
            verts = np.frombuffer(f.read(n_v * 12), "<f4").reshape(n_v, 3).copy()
        frec = np.frombuffer(f.read(n_f * 13), dtype=[("n", "u1"),
                                                      ("i", "<i4", 3)])
        return verts, frec["i"].copy()
