"""Implicit geometry fields (neural SDF / density) as pure functions.

Functional re-design of the reference ``models/geometry.py``:

* ``VolumeSDF`` — hash-encoded SDF with feature head; gradients either
  analytic (``jax.grad``) or 6-point central finite differences with a
  progressive eps tied to the currently-open hash level (reference
  ``models/geometry.py:206-320``); PermutoSDF-style curvature probe
  ("laplace") via an analytic gradient at a random tangent offset
  (reference ``models/geometry.py:246-282``).
* Schedule quantities (hash mask, fd eps) are pure functions of the
  global step, so they trace under jit — the reference instead mutates
  module state in ``update_step``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from . import register
from ..nn import get_activation, get_encoding, get_mlp


def _normalize(v, eps=1e-6):
    """Zero-safe normalize: sqrt(sumsq + eps^2) keeps the gradient finite
    at v = 0 (the max(norm, eps) form leaks NaN through sqrt'(0))."""
    return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + eps * eps)


def contract_to_unisphere(x, radius):
    """MipNeRF-360 unbounded-sphere contraction to [0,1]^3 (reference
    models/geometry.py:17-29, UN_BOUNDED_SPHERE branch)."""
    x = x / radius  # [-inf, inf], unit sphere at 1
    mag = jnp.linalg.norm(x, axis=-1, keepdims=True)
    x = jnp.where(mag > 1.0, (2.0 - 1.0 / jnp.maximum(mag, 1e-9)) * (x / jnp.maximum(mag, 1e-9)), x)
    return x / 4.0 + 0.5


@register("volume-sdf")
class VolumeSDF:
    def __init__(self, config):
        self.config = config
        self.radius = float(config["radius"])
        self.feature_dim = int(config["feature_dim"])
        self.grad_type = config.get("grad_type", "analytic")
        self.encoding = get_encoding(3, config["xyz_encoding_config"])
        self.mlp = get_mlp(self.encoding.n_output_dims, self.feature_dim,
                           config["mlp_network_config"])
        self.sdf_activation = config.get("sdf_activation", None)
        self.sdf_bias = float(config.get("sdf_bias", 0.0))
        self.fd_eps_cfg = config.get("finite_difference_eps", 1e-3)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"encoding": self.encoding.init(k1), "mlp": self.mlp.init(k2)}

    # ------------------------------------------------------------------ #
    def contract(self, x):
        """World [-r, r]^3 -> unit cube [0, 1]^3 (AABB contraction)."""
        return (x + self.radius) / (2.0 * self.radius)

    def raw(self, params, x_world, step=None, grad_impl="plain"):
        """-> [N, feature_dim]; channel 0 is the SDF.

        grad_impl: 'plain' = ordinary autodiff (default; also needed
        wherever the result's gradient is differentiated again);
        'sorted' = deterministic segment-reduction table gradients."""
        # clamp into the unit cube: padded/garbage sample slots may lie
        # outside the AABB, where trilinear extrapolation weights blow up
        u = jnp.clip(self.contract(x_world), 0.0, 1.0)
        enc = self.encoding.apply(params["encoding"], u, step,
                                  grad_impl=grad_impl)
        out = self.mlp.apply(params["mlp"], enc)
        if self.sdf_activation is not None:
            sdf = get_activation(self.sdf_activation)(out[..., 0] + self.sdf_bias)
            out = jnp.concatenate([sdf[..., None], out[..., 1:]], axis=-1)
        return out

    def sdf(self, params, x_world, step=None, grad_impl="plain"):
        return self.raw(params, x_world, step, grad_impl=grad_impl)[..., 0]

    def forward_level(self, params, x_world, step=None):
        """SDF level for marching cubes (reference geometry.py:294-299)."""
        return self.sdf(params, x_world, step)

    # ------------------------------------------------------------------ #
    def fd_eps(self, step):
        """Finite-difference eps; 'progressive' ties it to the current
        hash-grid cell size (reference geometry.py:304-320)."""
        if isinstance(self.fd_eps_cfg, (int, float)):
            return jnp.asarray(float(self.fd_eps_cfg), jnp.float32)
        assert self.fd_eps_cfg == "progressive"
        hg = self.encoding.encoding  # HashGridEncoding
        cur = hg.current_level(step if step is not None else 10 ** 9)
        grid_res = hg.base_resolution * jnp.power(
            jnp.asarray(hg.per_level_scale, jnp.float32),
            cur.astype(jnp.float32) - 1.0,
        )
        return 2.0 * self.radius / grid_res

    def analytic_grad(self, params, x_world, step=None):
        # 'plain' encode: this gradient is itself differentiated by the
        # losses (second-order), which custom_vjp does not support
        g = jax.grad(lambda p: self.sdf(params, p, step,
                                        grad_impl="plain").sum())(x_world)
        return g

    def forward(self, params, x_world, step=None, with_grad=True,
                with_feature=True, with_laplace=False,
                rng: Optional[jax.Array] = None,
                grad_mode: Optional[str] = None):
        """Returns dict with sdf [N], grad [N,3], feature [N,F], laplace [N].

        ``grad_mode`` overrides the configured grad type per call-site:
        eval/secondary paths use 'analytic' even under FD training configs
        because the analytic VJP reuses the forward's gathered hash-table
        rows (zero extra gathers) while FD costs 6 extra encodes — and FD
        converges to the analytic gradient as eps -> 0 anyway.
        """
        grad_type = grad_mode or self.grad_type
        out = {}
        if with_grad and grad_type == "analytic":
            # one forward + one VJP: features, sdf and position-gradient
            # share the hash-table gathers (the VJP reuses the gathered
            # corners as residuals — no second encode).  'plain' encode:
            # training losses may differentiate through this gradient.
            raw, vjp = jax.vjp(
                lambda p: self.raw(params, p, step, grad_impl="plain"),
                x_world)
            cot = jnp.zeros_like(raw).at[..., 0].set(1.0)
            out["grad"] = vjp(cot)[0]
        else:
            raw = self.raw(params, x_world, step)
        sdf = raw[..., 0]
        out["sdf"] = sdf
        if with_feature:
            out["feature"] = raw

        if with_grad:
            if grad_type == "analytic":
                pass  # computed above
            elif grad_type == "finite_difference":
                eps = self.fd_eps(step)
                offsets = jnp.asarray(
                    [[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                     [0, -1, 0], [0, 0, 1], [0, 0, -1]], jnp.float32)
                xd = x_world[:, None, :] + eps * offsets[None, :, :]
                xd = jnp.clip(xd, -self.radius, self.radius)
                sdf_d = self.sdf(params, xd.reshape(-1, 3), step)
                sdf_d = sdf_d.reshape(-1, 6)
                out["grad"] = 0.5 * (sdf_d[:, 0::2] - sdf_d[:, 1::2]) / eps
            else:
                raise ValueError(self.grad_type)

        if with_laplace:
            # PermutoSDF curvature probe (reference geometry.py:246-282)
            assert with_grad and rng is not None
            eps2 = 1e-4
            rand_dirs = _normalize(jax.random.uniform(rng, x_world.shape))
            normal = _normalize(out["grad"])
            tangent = jnp.cross(normal, rand_dirs)
            xd = x_world + eps2 * tangent
            grad_d = self.analytic_grad(params, xd, step)
            dot = jnp.sum(_normalize(out["grad"]) * _normalize(grad_d), -1)
            angle = jnp.arccos(jnp.clip(dot, -1.0 + 1e-6, 1.0 - 1e-6))
            out["laplace"] = angle / jnp.pi
        return out


@register("volume-density")
class VolumeDensity:
    """Density field for learned backgrounds (reference geometry.py:115-190)."""

    def __init__(self, config):
        self.config = config
        self.radius = float(config["radius"])
        self.feature_dim = int(config["feature_dim"])
        self.encoding = get_encoding(
            3, config["xyz_encoding_config"])
        self.mlp = get_mlp(self.encoding.n_output_dims, self.feature_dim,
                           config["mlp_network_config"])
        self.density_activation = config.get("density_activation", None)
        self.density_bias = float(config.get("density_bias", 0.0))

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"encoding": self.encoding.init(k1), "mlp": self.mlp.init(k2)}

    def forward(self, params, x_unit, step=None):
        """x already contracted to [0,1]^3. Returns (density, feature)."""
        enc = self.encoding.apply(params["encoding"], x_unit, step)
        out = self.mlp.apply(params["mlp"], enc)
        density = out[..., 0]
        if self.density_activation is not None:
            density = get_activation(self.density_activation)(
                density + self.density_bias)
        return density, out
