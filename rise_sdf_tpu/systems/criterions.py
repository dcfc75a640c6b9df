"""Quality metrics and loss helpers (reference systems/criterions.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred, gt, valid_mask=None):
    """-10 log10(mse) (reference criterions.py:40-52)."""
    if valid_mask is not None:
        diff2 = jnp.where(valid_mask, (pred - gt) ** 2, 0.0)
        mse = diff2.sum() / jnp.maximum(valid_mask.sum() *
                                        (pred.size / valid_mask.size
                                         if valid_mask.ndim < pred.ndim else 1),
                                        1)
    else:
        mse = jnp.mean((pred - gt) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def binary_cross_entropy(x, y):
    """Numerically-stable BCE (reference criterions.py:155-159)."""
    return -(y * jnp.log(x) + (1 - y) * jnp.log(1 - x)).mean()


def mean_angular_error(pred, gt, mask=None, degrees: bool = False):
    """Mean angular error between unit-ish normal maps
    (reference criterions.py:161-181).

    ``mask`` (foreground alpha, broadcastable to the ray axis) restricts
    the mean to foreground pixels like the reference.  The reference
    clamps the dot product to ``[1e-8, 1-1e-8]`` — capping opposite
    normals at 90° — a latent quirk we do NOT replicate (SURVEY §
    quirks); we clamp to the full ``[-1, 1]`` range, which only differs
    when normals disagree by more than 90°.
    """
    dot = jnp.sum(pred * gt, axis=-1)
    dot = dot / jnp.maximum(
        jnp.linalg.norm(pred, axis=-1) * jnp.linalg.norm(gt, axis=-1), 1e-9)
    err = jnp.arccos(jnp.clip(dot, -1.0 + 1e-7, 1.0 - 1e-7))
    if degrees:
        err = err * (180.0 / jnp.pi)
    if mask is not None:
        m = mask.reshape(err.shape)
        return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)
    return err.mean()


def _gaussian_kernel(size: int, sigma: float):
    x = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return jnp.asarray(g, jnp.float32)


def ssim(img0, img1, max_val: float = 1.0, filter_size: int = 11,
         filter_sigma: float = 1.5, k1: float = 0.01, k2: float = 0.03):
    """SSIM over [H, W, C] images (hand-rolled, reference
    criterions.py:55-152 / jaxNeRF)."""
    kern = _gaussian_kernel(filter_size, filter_sigma)

    def blur(x):  # separable conv over H then W, per channel
        x = jnp.moveaxis(x, -1, 0)  # [C,H,W]
        pad = filter_size // 2

        def conv1d(z, axis):
            zp = jnp.pad(z, [(0, 0)] * axis + [(pad, pad)]
                         + [(0, 0)] * (z.ndim - axis - 1), mode="symmetric")
            return jnp.apply_along_axis(
                lambda v: jnp.convolve(v, kern, mode="valid"), axis, zp)

        x = conv1d(x, 1)
        x = conv1d(x, 2)
        return jnp.moveaxis(x, 0, -1)

    mu0, mu1 = blur(img0), blur(img1)
    sigma00 = blur(img0 ** 2) - mu0 ** 2
    sigma11 = blur(img1 ** 2) - mu1 ** 2
    sigma01 = blur(img0 * img1) - mu0 * mu1
    # float error makes variances slightly negative on near-constant
    # windows, which pushed SSIM above 1; clamp like jaxNeRF
    sigma00 = jnp.maximum(sigma00, 0.0)
    sigma11 = jnp.maximum(sigma11, 0.0)
    sigma01 = jnp.sign(sigma01) * jnp.minimum(
        jnp.sqrt(sigma00 * sigma11), jnp.abs(sigma01))
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    numer = (2 * mu0 * mu1 + c1) * (2 * sigma01 + c2)
    denom = (mu0 ** 2 + mu1 ** 2 + c1) * (sigma00 + sigma11 + c2)
    return jnp.mean(numer / denom)


def weighted_mse(pred, gt, weights=None):
    """Weighted MSE (reference criterions.py WeightedMSE)."""
    e = (pred - gt) ** 2
    if weights is None:
        return e.mean()
    return (e * weights).sum() / jnp.maximum(jnp.broadcast_to(
        weights, e.shape).sum(), 1e-8)


def weighted_l1(pred, gt, weights=None):
    """Weighted L1 (reference criterions.py WeightedL1)."""
    e = jnp.abs(pred - gt)
    if weights is None:
        return e.mean()
    return (e * weights).sum() / jnp.maximum(jnp.broadcast_to(
        weights, e.shape).sum(), 1e-8)
