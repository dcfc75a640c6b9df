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
        # hybrid FD: coarse hash levels are (multi)linear within a cell, so
        # a first-order Taylor from the base point reproduces FD exactly
        # there — only the finest levels (cell size <= ~4*eps) need true
        # probe encodes.  Cuts the probes' gather/scatter volume ~L/k.
        self.fd_taylor_coarse = bool(config.get("fd_taylor_coarse", True))
        # 'central6' (reference) or 'tetra4': 4 probes at regular-
        # tetrahedron vertices — grad = 3/(4 eps) * sum_i s(x+eps v_i) v_i
        # (1.5x fewer probe rows; first-order accurate instead of second)
        self.fd_probe_mode = str(config.get("fd_probe_mode", "central6"))
        # curvature-probe trim: the PermutoSDF curvature loss is a MEAN
        # over samples, so probing a strided 1/s subset gives an unbiased
        # estimate at 1/s of the probe's encode+grad cost.  Samples arrive
        # ray-major from the marcher, so a stride sweeps uniformly across
        # rays.  1.0 (default) = probe every sample (reference behavior,
        # geometry.py:246-282).
        frac = float(config.get("curvature_probe_frac", 1.0))
        self.laplace_stride = max(int(round(1.0 / max(frac, 1e-6))), 1)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"encoding": self.encoding.init(k1), "mlp": self.mlp.init(k2)}

    # ------------------------------------------------------------------ #
    def contract(self, x):
        """World [-r, r]^3 -> unit cube [0, 1]^3 (AABB contraction)."""
        return (x + self.radius) / (2.0 * self.radius)

    def _head(self, params, enc):
        out = self.mlp.apply(params["mlp"], enc)
        if self.sdf_activation is not None:
            sdf = get_activation(self.sdf_activation)(out[..., 0] + self.sdf_bias)
            out = jnp.concatenate([sdf[..., None], out[..., 1:]], axis=-1)
        return out

    def raw(self, params, x_world, step=None, grad_impl="plain",
            levels=None):
        """-> [N, feature_dim]; channel 0 is the SDF.

        grad_impl: 'plain' = ordinary autodiff (default; also needed
        wherever the result's gradient is differentiated again);
        'sorted' = deterministic segment-reduction table gradients.
        ``levels``: static open-level count — closed hash levels skip
        their gathers entirely (one recompile per opened band)."""
        # clamp into the unit cube: padded/garbage sample slots may lie
        # outside the AABB, where trilinear extrapolation weights blow up
        u = jnp.clip(self.contract(x_world), 0.0, 1.0)
        enc = self.encoding.apply(params["encoding"], u, step,
                                  grad_impl=grad_impl, levels=levels)
        return self._head(params, enc)

    def sdf(self, params, x_world, step=None, grad_impl="plain",
            levels=None):
        return self.raw(params, x_world, step, grad_impl=grad_impl,
                        levels=levels)[..., 0]

    def forward_level(self, params, x_world, step=None):
        """SDF level for marching cubes (reference geometry.py:294-299)."""
        return self.sdf(params, x_world, step)

    # ------------------------------------------------------------------ #
    def open_levels(self, step: int):
        """Static open-level count at ``step`` (None when the encoding is
        not a progressive hash grid) — python-side mirror of
        ``HashGridEncoding.current_level`` for compile-time specialization."""
        hg = getattr(self.encoding, "encoding", None)
        if hg is None or not getattr(hg, "progressive", False):
            return None
        lvl = hg.start_level + max(int(step) - hg.start_step, 0) \
            // hg.update_steps
        return int(min(lvl, hg.n_levels))

    def fd_eps(self, step, levels=None):
        """Finite-difference eps; 'progressive' ties it to the current
        hash-grid cell size (reference geometry.py:304-320).  Static when
        ``levels`` is a static open-level count."""
        if isinstance(self.fd_eps_cfg, (int, float)):
            return jnp.asarray(float(self.fd_eps_cfg), jnp.float32)
        assert self.fd_eps_cfg == "progressive"
        hg = self.encoding.encoding  # HashGridEncoding
        if isinstance(levels, int):
            grid_res = hg.base_resolution * hg.per_level_scale ** (levels - 1)
            return jnp.asarray(2.0 * self.radius / grid_res, jnp.float32)
        cur = hg.current_level(step if step is not None else 10 ** 9)
        grid_res = hg.base_resolution * jnp.power(
            jnp.asarray(hg.per_level_scale, jnp.float32),
            cur.astype(jnp.float32) - 1.0,
        )
        return 2.0 * self.radius / grid_res

    def analytic_grad(self, params, x_world, step=None, levels=None):
        # 'plain' encode: this gradient is itself differentiated by the
        # losses (second-order), which custom_vjp does not support
        g = jax.grad(lambda p: self.sdf(params, p, step, grad_impl="plain",
                                        levels=levels).sum())(x_world)
        return g

    # ------------------------------------------------------------------ #
    # regular tetrahedron vertices (unit vectors)
    _TETRA = ((1.0, 1.0, 1.0), (1.0, -1.0, -1.0),
              (-1.0, 1.0, -1.0), (-1.0, -1.0, 1.0))

    def _fd_offsets(self):
        """Probe directions: 6-point central (reference) or 4-point
        tetrahedral (sum v_i v_i^T = 4/3 I, sum v_i = 0)."""
        if self.fd_probe_mode == "tetra4":
            v = jnp.asarray(self._TETRA, jnp.float32)
            return v / jnp.sqrt(3.0)
        return jnp.asarray(
            [[1, 0, 0], [-1, 0, 0], [0, 1, 0],
             [0, -1, 0], [0, 0, 1], [0, 0, -1]], jnp.float32)

    def _fd_combine(self, sdf_d, eps):
        """[P,N] probe sdfs -> [N,3] gradient estimate."""
        if self.fd_probe_mode == "tetra4":
            v = jnp.asarray(self._TETRA, jnp.float32) / jnp.sqrt(3.0)
            # E[s(x+eps v)] = s + eps v.grad; sum_i v_i = 0 kills s,
            # sum_i v_i v_i^T = (4/3) I -> grad = 3/(4 eps) sum s_i v_i
            return (3.0 / (4.0 * eps)) * jnp.einsum("pn,pd->nd", sdf_d, v)
        return 0.5 * (sdf_d[0::2] - sdf_d[1::2]).T / eps

    def _fd_fine_k(self) -> int:
        """Number of finest levels whose cell size is within ~4x of the
        progressive eps (eps = finest open cell): these need true FD
        probes; coarser levels are linear at that scale.  ``fd_fine_k``
        in the config overrides the derived count (perf/quality A/B —
        each dropped level cuts its share of the 6 probes' gathers)."""
        import math

        override = self.config.get("fd_fine_k", None)
        if override is not None:
            return max(int(override), 1)
        hg = self.encoding.encoding
        return max(int(math.ceil(math.log(4.0)
                                 / math.log(hg.per_level_scale))), 1)

    def _shared_probes_ok(self, levels: int) -> bool:
        """Static gate for the shared-neighborhood probe encode: only the
        axis-aligned central-6 stencil fits the 32-point layout, and the
        probe displacement must stay within one cell of every fine-band
        level.  Progressive eps == the finest open cell guarantees it;
        a numeric eps is checked against the finest level in range.
        ``fd_shared_probes: false`` opts out (A/B escape hatch)."""
        if not bool(self.config.get("fd_shared_probes", True)):
            return False
        if self.fd_probe_mode != "central6":
            return False
        hg = getattr(self.encoding, "encoding", None)
        if hg is None or not hasattr(hg, "encode_axis_probes"):
            return False
        if self.fd_eps_cfg == "progressive":
            return True
        res = float(hg.resolutions[min(levels, hg.n_levels) - 1])
        return float(self.fd_eps_cfg) / (2.0 * self.radius) * res <= 1.0

    def _hybrid_fd(self, params, x_world, step, levels, with_laplace,
                   rng):
        """FD gradient with Taylor-approximated coarse levels.

        The coarse band [0, fine_lo) is linearized once at the base point
        (``jax.linearize`` reuses the base gathers; probe evaluations are
        elementwise); only the fine band [fine_lo, levels) is re-encoded
        at the 6 probe points.  The curvature probe's offset (1e-4) is far
        below any cell size, so its gradient uses the same linearization
        plus exact fine levels.  All of it is plain traceable jax, so the
        losses differentiate through the gradients as usual.
        """
        comp = self.encoding
        hg = comp.encoding
        fine_lo = max(levels - self._fd_fine_k(), 0)
        u = jnp.clip(self.contract(x_world), 0.0, 1.0)
        enc_params = params["encoding"]

        # coarse band: features + u-space Jacobian columns from ONE gather
        # (the [N, D]-shaped columns keep TPU-friendly layouts; see
        # HashGridEncoding.encode_with_grad)
        c0, (jx, jy, jz) = hg.encode_with_grad(enc_params, u, step,
                                               levels=(0, fine_lo))

        def enc_fine(uu):
            return hg.apply(enc_params, uu, step,
                            levels=(fine_lo, levels))

        def full_enc(uu, du, fine_feats, base=None):
            """Taylor(coarse at u, offset du) + exact fine + xyz prefix.
            Leading (probe) axes broadcast against the [N, D] base arrays.
            ``base`` overrides the (c0, jx, jy, jz) closure for subset
            (curvature-trim) evaluations."""
            b0, bx, by, bz = (c0, jx, jy, jz) if base is None else base
            e = (b0 + bx * du[..., 0:1] + by * du[..., 1:2]
                 + bz * du[..., 2:3] + fine_feats)
            if comp.include_xyz:
                e = jnp.concatenate(
                    [uu * comp.xyz_scale + comp.xyz_offset, e], -1)
            return e

        eps = self.fd_eps(step, levels)
        offsets = self._fd_offsets()
        p = offsets.shape[0]
        xd = x_world[None, :, :] + eps * offsets[:, None, :]
        xd = jnp.clip(xd, -self.radius, self.radius)
        ud = jnp.clip(self.contract(xd), 0.0, 1.0)  # [P,N,3]
        n = x_world.shape[0]

        if self._shared_probes_ok(levels):
            # central-6 probes displace one axis by <= 1 cell of every
            # fine-band level, so base + probes share one 32-point
            # neighborhood gather (43% of the fine rows removed in both
            # the forward gather and the backward scatter-add)
            fine_all = hg.encode_axis_probes(
                enc_params, u, ud, (0, 0, 1, 1, 2, 2), step,
                levels=(fine_lo, levels))
            fine_u, fine_d = fine_all[0], fine_all[1:]
        else:
            fine_u = enc_fine(u)
            fine_d = enc_fine(ud.reshape(-1, 3)).reshape(p, n, -1)

        raw0 = self._head(params, full_enc(u, jnp.zeros_like(u), fine_u))
        enc_d = full_enc(ud, ud - u[None], fine_d)  # [P,N,D] broadcast
        sdf_d = self._head(params, enc_d.reshape(p * n, -1)
                           )[..., 0].reshape(p, n)
        grad = self._fd_combine(sdf_d, eps)

        laplace = None
        if with_laplace:
            eps2 = 1e-4
            s = self.laplace_stride
            xs, us, grad_s = x_world[::s], u[::s], grad[::s]
            base_s = (c0[::s], jx[::s], jy[::s], jz[::s])
            rand_dirs = _normalize(jax.random.uniform(rng, xs.shape))
            normal = _normalize(grad_s)
            tangent = jnp.cross(normal, rand_dirs)
            ut = jnp.clip(self.contract(xs + eps2 * tangent), 0.0, 1.0)

            def sdf_at_u(uu):
                return jnp.sum(self._head(
                    params,
                    full_enc(uu, uu - us, enc_fine(uu), base=base_s)
                )[..., 0])

            # d sdf / d u / (2r): coarse term is the frozen Jacobian,
            # fine term is the exact trilinear gradient at the offset
            grad_d = jax.grad(sdf_at_u)(ut) / (2.0 * self.radius)
            dot = jnp.sum(_normalize(grad_s) * _normalize(grad_d), -1)
            angle = jnp.arccos(jnp.clip(dot, -1.0 + 1e-6, 1.0 - 1e-6))
            laplace = angle / jnp.pi
        return raw0, grad, laplace

    def forward(self, params, x_world, step=None, with_grad=True,
                with_feature=True, with_laplace=False,
                rng: Optional[jax.Array] = None,
                grad_mode: Optional[str] = None, levels=None):
        """Returns dict with sdf [N], grad [N,3], feature [N,F], laplace [N].

        ``grad_mode`` overrides the configured grad type per call-site:
        eval/secondary paths use 'analytic' even under FD training configs
        because the analytic VJP reuses the forward's gathered hash-table
        rows (zero extra gathers) while FD costs 6 extra encodes — and FD
        converges to the analytic gradient as eps -> 0 anyway.
        """
        grad_type = grad_mode or self.grad_type
        out = {}
        if (with_grad and grad_type == "finite_difference"
                and self.fd_taylor_coarse and isinstance(levels, int)
                and getattr(self.encoding, "encoding", None) is not None
                and hasattr(self.encoding.encoding, "per_level_scale")):
            raw, grad, laplace = self._hybrid_fd(
                params, x_world, step, levels, with_laplace, rng)
            out["sdf"] = raw[..., 0]
            out["grad"] = grad
            if with_feature:
                out["feature"] = raw
            if with_laplace:
                out["laplace"] = laplace
            return out

        if with_grad and grad_type == "analytic":
            # one forward + one VJP: features, sdf and position-gradient
            # share the hash-table gathers (the VJP reuses the gathered
            # corners as residuals — no second encode).  'plain' encode:
            # training losses may differentiate through this gradient.
            raw, vjp = jax.vjp(
                lambda p: self.raw(params, p, step, grad_impl="plain",
                                   levels=levels),
                x_world)
            cot = jnp.zeros_like(raw).at[..., 0].set(1.0)
            out["grad"] = vjp(cot)[0]
        else:
            raw = self.raw(params, x_world, step, levels=levels)
        sdf = raw[..., 0]
        out["sdf"] = sdf
        if with_feature:
            out["feature"] = raw

        if with_grad:
            if grad_type == "analytic":
                pass  # computed above
            elif grad_type == "finite_difference":
                eps = self.fd_eps(step, levels)
                offsets = self._fd_offsets()
                p = offsets.shape[0]
                xd = x_world[None, :, :] + eps * offsets[:, None, :]
                xd = jnp.clip(xd, -self.radius, self.radius)
                n = x_world.shape[0]
                sdf_d = self.sdf(params, xd.reshape(-1, 3), step,
                                 levels=levels).reshape(p, n)
                out["grad"] = self._fd_combine(sdf_d, eps)
            else:
                raise ValueError(self.grad_type)

        if with_laplace:
            # PermutoSDF curvature probe (reference geometry.py:246-282)
            assert with_grad and rng is not None
            eps2 = 1e-4
            s = self.laplace_stride
            xs, grad_s = x_world[::s], out["grad"][::s]
            rand_dirs = _normalize(jax.random.uniform(rng, xs.shape))
            normal = _normalize(grad_s)
            tangent = jnp.cross(normal, rand_dirs)
            xd = xs + eps2 * tangent
            grad_d = self.analytic_grad(params, xd, step, levels=levels)
            dot = jnp.sum(_normalize(grad_s) * _normalize(grad_d), -1)
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
