"""LPIPS perceptual metric (VGG16 backbone) in jnp.

The reference uses torchmetrics' LPIPS (``systems/split_occ.py:9``),
which downloads pretrained VGG weights.  This environment has no
network egress, so the metric activates only when a weights file is
present at ``load/lpips/vgg16_lpips.npz`` (keys: ``conv{i}_{j}_w/b``
for the VGG features and ``lin{k}`` for the linear calibration layers).
``lpips()`` returns ``None`` when unavailable; metric aggregation skips
it.  The architecture is implemented fully so dropping in a weights
file enables exact LPIPS(VGG).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

_WEIGHTS_PATH = os.environ.get("RISE_SDF_LPIPS_WEIGHTS",
                               "load/lpips/vgg16_lpips.npz")
_CACHE = {"weights": None, "checked": False, "warned": False}

# VGG16 feature config: (out_channels, n_convs) per block
_BLOCKS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _load_weights():
    if _CACHE["checked"]:
        return _CACHE["weights"]
    _CACHE["checked"] = True
    path = os.environ.get("RISE_SDF_LPIPS_WEIGHTS", _WEIGHTS_PATH)
    if os.path.exists(path):
        _CACHE["weights"] = dict(np.load(path))
    return _CACHE["weights"]


def available() -> bool:
    ok = _load_weights() is not None
    if not ok and not _CACHE["warned"]:
        _CACHE["warned"] = True
        print("NOTE: LPIPS disabled — no VGG16 weights at "
              f"'{_WEIGHTS_PATH}' (set RISE_SDF_LPIPS_WEIGHTS to enable); "
              "PSNR/SSIM are still reported", flush=True)
    return ok


def reset_cache():
    """Re-check the weights file (tests / late weight drops)."""
    _CACHE.update({"weights": None, "checked": False, "warned": False})


def lpips(img0: np.ndarray, img1: np.ndarray) -> Optional[float]:
    """img0/img1: [H, W, 3] in [0, 1]. Returns None if no weights."""
    w = _load_weights()
    if w is None:
        return None
    import jax
    import jax.numpy as jnp

    def norm_input(x):
        x = x * 2.0 - 1.0
        return (x - _SHIFT) / _SCALE

    def conv(x, kw, kb):
        out = jax.lax.conv_general_dilated(
            x[None], jnp.asarray(kw), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
        return jax.nn.relu(out + jnp.asarray(kb))

    def features(x):
        feats = []
        h = norm_input(x)
        ci = 0
        for bi, (cout, n) in enumerate(_BLOCKS):
            for j in range(n):
                h = conv(h, w[f"conv{ci}_w"], w[f"conv{ci}_b"])
                ci += 1
            feats.append(h)
            if bi < len(_BLOCKS) - 1:
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (2, 2, 1), (2, 2, 1), "VALID")
        return feats

    f0 = features(jnp.asarray(img0, jnp.float32))
    f1 = features(jnp.asarray(img1, jnp.float32))
    total = 0.0
    for k, (a, b) in enumerate(zip(f0, f1)):
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
        b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
        d = (a - b) ** 2
        lin = jnp.asarray(w[f"lin{k}"]).reshape(1, 1, -1)
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1))
    return float(total)
