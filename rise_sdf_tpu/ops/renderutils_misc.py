"""jnp mirrors of the reference's remaining renderutils kernels.

Covers the parts of the vendored nvdiffrec plugin the shipped RISE-SDF
pipeline never calls but that complete the inventory
(``lib/renderutils/c_src/{normal,mesh,loss}.cu`` and their python
oracles in ``lib/renderutils/bsdf.py`` / ``loss.py``):

* shading-normal preparation (perturb by a tangent-space normal map,
  two-sided bending, geometric/smooth normal blend near grazing),
* point/vector transforms (``xfm_points`` / ``xfm_vectors``),
* tonemapped HDR image losses (mse / l1 / smape / relmse, log-sRGB).

Everything is plain jnp, infinitely differentiable by construction —
the CUDA backward kernels have no TPU analog to write.
"""

from __future__ import annotations

import jax.numpy as jnp

NORMAL_THRESHOLD = 0.1


def _dot(x, y):
    return jnp.sum(x * y, -1, keepdims=True)


def _safe_normalize(x, eps=1e-20):
    return x / jnp.sqrt(jnp.maximum(jnp.sum(x * x, -1, keepdims=True), eps))


def reflect(x, n):
    return 2.0 * _dot(x, n) * n - x


# --------------------------------------------------------------------- #
# normal.cu mirrors (python oracle bsdf.py:28-54)
# --------------------------------------------------------------------- #


def _bend_normal(view_vec, smooth_nrm, geom_nrm, two_sided_shading):
    if two_sided_shading:
        flip = _dot(geom_nrm, view_vec) > 0
        smooth_nrm = jnp.where(flip, smooth_nrm, -smooth_nrm)
        geom_nrm = jnp.where(flip, geom_nrm, -geom_nrm)
    t = jnp.clip(_dot(view_vec, smooth_nrm) / NORMAL_THRESHOLD, 0.0, 1.0)
    return geom_nrm + t * (smooth_nrm - geom_nrm)


def _perturb_normal(perturbed_nrm, smooth_nrm, smooth_tng, opengl):
    smooth_bitang = _safe_normalize(jnp.cross(smooth_tng, smooth_nrm))
    sign = -1.0 if opengl else 1.0
    shading_nrm = (smooth_tng * perturbed_nrm[..., 0:1]
                   + sign * smooth_bitang * perturbed_nrm[..., 1:2]
                   + smooth_nrm * jnp.clip(perturbed_nrm[..., 2:3], 0.0,
                                           None))
    return _safe_normalize(shading_nrm)


def prepare_shading_normal(pos, view_pos, perturbed_nrm, smooth_nrm,
                           smooth_tng, geom_nrm, two_sided_shading=True,
                           opengl=True):
    """Bend/perturb the shading normal (bsdf_prepare_shading_normal
    mirror): apply a tangent-space normal map, optionally flip for
    two-sided shading, and blend toward the geometric normal at grazing
    view angles."""
    smooth_nrm = _safe_normalize(smooth_nrm)
    smooth_tng = _safe_normalize(smooth_tng)
    view_vec = _safe_normalize(view_pos - pos)
    shading_nrm = _perturb_normal(perturbed_nrm, smooth_nrm, smooth_tng,
                                  opengl)
    return _bend_normal(view_vec, shading_nrm, geom_nrm, two_sided_shading)


# --------------------------------------------------------------------- #
# mesh.cu mirrors
# --------------------------------------------------------------------- #


def xfm_points(points, matrix):
    """Transform [..., N, 3] points by a [..., 4, 4] matrix -> homogeneous
    [..., N, 4] (matches renderutils xfm_points semantics)."""
    ones = jnp.ones(points.shape[:-1] + (1,), points.dtype)
    hom = jnp.concatenate([points, ones], axis=-1)
    return jnp.matmul(hom, jnp.swapaxes(matrix, -1, -2))


def xfm_vectors(vectors, matrix):
    """Transform [..., N, 3] vectors by the rotational part of a
    [..., 4, 4] matrix -> [..., N, 3]."""
    rot = matrix[..., :3, :3]
    return jnp.matmul(vectors, jnp.swapaxes(rot, -1, -2))


# --------------------------------------------------------------------- #
# loss.cu mirrors (python oracle loss.py)
# --------------------------------------------------------------------- #


def _tonemap_srgb(f):
    return jnp.where(f > 0.0031308,
                     jnp.power(jnp.clip(f, 0.0031308, None), 1.0 / 2.4)
                     * 1.055 - 0.055,
                     12.92 * f)


def _smape(img, target):
    return jnp.mean(jnp.abs(img - target)
                    / (jnp.abs(img) + jnp.abs(target) + 0.01))


def _relmse(img, target):
    return jnp.mean((img - target) ** 2
                    / (img * img + target * target + 0.1))


def image_loss(img, target, loss: str = "l1", tonemapper: str = "none"):
    """Tonemapped HDR image loss (image_loss_fn mirror).

    loss: 'mse' | 'l1' | 'smape' | 'relmse'; tonemapper: 'none' |
    'log_srgb' (log1p then sRGB curve, clamped to [0, 65535])."""
    if tonemapper == "log_srgb":
        img = _tonemap_srgb(jnp.log(jnp.clip(img, 0.0, 65535.0) + 1.0))
        target = _tonemap_srgb(jnp.log(jnp.clip(target, 0.0, 65535.0) + 1.0))
    if loss == "mse":
        return jnp.mean((img - target) ** 2)
    if loss == "smape":
        return _smape(img, target)
    if loss == "relmse":
        return _relmse(img, target)
    return jnp.mean(jnp.abs(img - target))
