"""Texture / appearance fields (radiance, split-sum PBR heads).

Functional re-design of the reference ``models/texture.py``:

* ``VolumeRadiance`` — classic NeuS color head (feature ⊕ SH(dirs) ⊕
  extras -> rgb), reference ``texture.py:15-41``.
* ``VolumeMixedMipSplitOcc`` — the paper's 5-head appearance model
  (albedo+diffuse, roughness, blend+metallic, NN specular, secondary
  radiance) with split-sum IBL shading against the mip-cubemap emitter
  and the pre-integrated FG LUT, reference ``texture.py:234-434``.

The FG LUT is generated from the defining split-sum integral instead of
loading the reference's opaque ``bsdf_256_256.bin`` (see
``ops/fg_lut.py``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from . import register
from ..nn import get_activation, get_encoding, get_mlp
from ..ops.cubemap import sample_texture2d
from ..ops.fg_lut import fg_lut


def _reflect(wi, n):
    """Mirror wi about n (both [..., 3])."""
    return 2.0 * jnp.sum(wi * n, -1, keepdims=True) * n - wi


@register("volume-radiance")
class VolumeRadiance:
    def __init__(self, config):
        self.config = config
        self.n_dir_dims = int(config.get("n_dir_dims", 3))
        self.n_output_dims = 3
        self.encoding = get_encoding(self.n_dir_dims,
                                     config["dir_encoding_config"])
        self.n_input_dims = int(config["input_feature_dim"]) + \
            self.encoding.n_output_dims
        self.mlp = get_mlp(self.n_input_dims, 3, config["mlp_network_config"])
        self.color_activation = get_activation(
            config.get("color_activation", None))

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"encoding": self.encoding.init(k1), "mlp": self.mlp.init(k2)}

    def apply(self, params, features, dirs, *args, step=None):
        d = (dirs + 1.0) / 2.0
        enc = self.encoding.apply(params["encoding"], d, step)
        inp = jnp.concatenate([features, enc] + list(args), axis=-1)
        return self.color_activation(self.mlp.apply(params["mlp"], inp))


@register("volume-color")
class VolumeColor:
    def __init__(self, config):
        self.config = config
        self.mlp = get_mlp(int(config["input_feature_dim"]), 3,
                           config["mlp_network_config"])
        self.color_activation = get_activation(
            config.get("color_activation", None))

    def init(self, key):
        return {"mlp": self.mlp.init(key)}

    def apply(self, params, features, *args, step=None):
        return self.color_activation(self.mlp.apply(params["mlp"], features))


@register("volume-mixed-mip-split-occ")
class VolumeMixedMipSplitOcc:
    """5-head appearance model with split-sum PBR (texture.py:234-434).

    ``apply`` returns a dict of per-sample channels; the renderer packs
    them for accumulation.  Stage 0 produces the NN radiance split
    (diffuse, specular, blend); stage 1 additionally produces the
    physically-based branch.
    """

    # material_cache / shade_cached split available (multi-emitter eval)
    supports_multi_emitter = True

    def __init__(self, config):
        self.config = config
        self.n_dir_dims = int(config.get("n_dir_dims", 3))
        self.n_pos_dims = int(config.get("n_pos_dims", 3))
        self.dir_encoding = get_encoding(self.n_dir_dims,
                                         config["dir_encoding_config"])
        self.xyz_encoding = get_encoding(self.n_pos_dims,
                                         config["xyz_encoding_config"])
        fdim = int(config["input_feature_dim"])
        other = int(config.get("other_dim", 3))
        xdim = self.xyz_encoding.n_output_dims
        ddim = self.dir_encoding.n_output_dims
        self.secondary_mlp = get_mlp(fdim + other + ddim, 3,
                                     config["secondary_mlp_network_config"])
        self.albedo_mlp = get_mlp(fdim + xdim, 6,
                                  config["albedo_mlp_network_config"])
        self.roughness_mlp = get_mlp(fdim + xdim, 1,
                                     config["roughness_mlp_network_config"])
        self.metallic_mlp = get_mlp(fdim + xdim, 2,
                                    config["metallic_mlp_network_config"])
        self.env_mlp = get_mlp(fdim + ddim, 3,
                               config["spec_mlp_network_config"])
        self.color_activation = get_activation(
            config.get("color_activation", None))
        self._fg = jnp.asarray(fg_lut(256))

    def init(self, key):
        ks = jax.random.split(key, 7)
        return {
            "dir_encoding": self.dir_encoding.init(ks[0]),
            "xyz_encoding": self.xyz_encoding.init(ks[1]),
            "secondary": self.secondary_mlp.init(ks[2]),
            "albedo": self.albedo_mlp.init(ks[3]),
            "roughness": self.roughness_mlp.init(ks[4]),
            "metallic": self.metallic_mlp.init(ks[5]),
            "env": self.env_mlp.init(ks[6]),
        }

    # ------------------------------------------------------------------ #
    def _material_heads(self, params, features, positions, step=None):
        xyz_embd = self.xyz_encoding.apply(params["xyz_encoding"], positions,
                                           step)
        inp = jnp.concatenate([features, xyz_embd], axis=-1)
        act = self.color_activation
        alb6 = self.albedo_mlp.apply(params["albedo"], inp)
        diff_rgb = act(alb6[..., :3])
        albedo = act(alb6[..., 3:])
        roughness = act(self.roughness_mlp.apply(params["roughness"], inp))
        met2 = self.metallic_mlp.apply(params["metallic"], inp)
        blend = act(met2[..., :1])
        metallic = act(met2[..., 1:])
        return diff_rgb, albedo, roughness, blend, metallic

    def _split_sum(self, albedo, roughness, metallic, normals, wo, nov,
                   emitter, mips):
        diffuse_albedo = (1 - metallic) * albedo
        diffuse_light = emitter.eval_mip(mips, normals)
        diff_rgb_pbr = diffuse_albedo * diffuse_light
        specular_albedo = 0.04 * (1 - metallic) + metallic * albedo
        specular_light = emitter.eval_mip(mips, wo, specular=True,
                                          roughness=roughness)
        fg_uv = jnp.concatenate([jnp.clip(nov, 0.0, 1.0),
                                 jnp.clip(roughness, 0.0, 1.0)], -1)
        fg = sample_texture2d(self._fg, fg_uv)
        specular_ref = specular_albedo * fg[..., 0:1] + fg[..., 1:2]
        spec_rgb_pbr = specular_ref * specular_light
        return diff_rgb_pbr, spec_rgb_pbr, specular_ref, specular_light

    def material_cache(self, params, features, dirs, normals, positions,
                       stage: int = 0, step=None):
        """Everything in ``apply`` that does NOT depend on the emitter:
        material MLP heads, the NN radiance branch, and the FG-LUT term
        of the split sum.  One cache serves any number of environment
        lights via ``shade_cached`` — the basis of the multi-emitter
        eval that renders NVS + all relights from one geometry pass
        (the reference re-renders fully per light,
        ``systems/split_occ.py:402-430``)."""
        wi = -dirs
        wo = _reflect(wi, normals)
        nov = jnp.sum(normals * wi, -1, keepdims=True)

        diff_rgb, albedo, roughness, blend, metallic = self._material_heads(
            params, features, positions, step)

        wo_enc = self.dir_encoding.apply(params["dir_encoding"],
                                         (wo + 1.0) / 2.0, step)
        env_inp = jnp.concatenate([features, wo_enc], axis=-1)
        spec_rgb = self.color_activation(self.env_mlp.apply(params["env"],
                                                            env_inp))
        spec_rgb = blend * spec_rgb
        diff_rgb = (1 - blend) * diff_rgb

        cache = {"diff_rgb": diff_rgb, "spec_rgb": spec_rgb, "blend": blend}
        if stage == 0:
            return cache

        diffuse_albedo = (1 - metallic) * albedo
        specular_albedo = 0.04 * (1 - metallic) + metallic * albedo
        fg_uv = jnp.concatenate([jnp.clip(nov, 0.0, 1.0),
                                 jnp.clip(roughness, 0.0, 1.0)], -1)
        fg = sample_texture2d(self._fg, fg_uv)
        specular_ref = specular_albedo * fg[..., 0:1] + fg[..., 1:2]
        cache.update({
            "albedo": albedo, "metallic": metallic, "roughness": roughness,
            "diffuse_albedo": diffuse_albedo, "spec_ref": specular_ref,
            "normals": normals, "wo": wo,
        })
        return cache

    def shade_cached(self, cache, emitter, mips, stage: int = 0):
        """The emitter-dependent remainder of ``apply``: two mip-cubemap
        lookups + per-sample arithmetic.  Per extra light this is the
        ONLY per-sample work."""
        out = {"diff_rgb": cache["diff_rgb"], "spec_rgb": cache["spec_rgb"],
               "blend": cache["blend"]}
        if stage == 0:
            return out
        diffuse_light = emitter.eval_mip(mips, cache["normals"])
        specular_light = emitter.eval_mip(mips, cache["wo"], specular=True,
                                          roughness=cache["roughness"])
        out.update({
            "diff_rgb_pbr": cache["diffuse_albedo"] * diffuse_light,
            "spec_rgb_pbr": cache["spec_ref"] * specular_light,
            "spec_ref": cache["spec_ref"], "spec_light": specular_light,
            "albedo": cache["albedo"], "metallic": cache["metallic"],
            "roughness": cache["roughness"],
        })
        return out

    def apply(self, params, features, dirs, normals, positions, emitter=None,
              mips=None, stage: int = 0, step=None):
        """Per-sample appearance. All inputs [N, .]; returns channel dict.
        Built as ``material_cache`` + ``shade_cached`` so the single- and
        multi-emitter paths share one set of numerics."""
        cache = self.material_cache(params, features, dirs, normals,
                                    positions, stage=stage, step=step)
        return self.shade_cached(cache, emitter, mips, stage=stage)

    # ------------------------------------------------------------------ #
    def secondary_shading(self, params, features, rays_d, *args, step=None):
        """NN radiance for indirect rays (texture.py:347-354)."""
        d = (rays_d + 1.0) / 2.0
        enc = self.dir_encoding.apply(params["dir_encoding"], d, step)
        inp = jnp.concatenate([features, enc] + list(args), axis=-1)
        return self.color_activation(
            self.secondary_mlp.apply(params["secondary"], inp))

    def secondary_pbr_cache(self, params, features, dirs, normals,
                            positions, step=None):
        """Emitter-independent half of ``secondary_shading_pbr`` (the
        material heads at the third-bounce hit)."""
        wi = -dirs
        nov = jnp.sum(normals * wi, -1, keepdims=True)
        _, albedo, roughness, _, metallic = self._material_heads(
            params, features, positions, step)
        return {"albedo": albedo, "roughness": roughness,
                "metallic": metallic, "normals": normals, "dirs": dirs,
                "nov": nov}

    def secondary_shade_pbr_cached(self, cache, emitter, mips):
        diff_pbr, spec_pbr, _, _ = self._split_sum(
            cache["albedo"], cache["roughness"], cache["metallic"],
            cache["normals"], cache["dirs"], cache["nov"], emitter, mips)
        return diff_pbr + spec_pbr

    def secondary_shading_pbr(self, params, features, dirs, normals,
                              positions, emitter, mips, step=None):
        """Full split-sum at a secondary hit (texture.py:386-427).

        Note: matches the reference in evaluating the specular light in
        the *incoming* ray direction ``dirs`` (mirror bounce).
        """
        cache = self.secondary_pbr_cache(params, features, dirs, normals,
                                         positions, step)
        return self.secondary_shade_pbr_cached(cache, emitter, mips)


@register("volume-pbr")
class VolumePBR:
    """Monte-Carlo GGX path (reference texture.py:436-537, the MC
    alternative to split-sum).  Uses the ``brdf-ggx`` scatterer for
    sample/pdf/eval and the emitter's raw base lookup."""

    def __init__(self, config):
        from . import make as _make

        self.config = config
        self.scatterer = _make(config["scatterer"]["name"],
                               config["scatterer"])
        self.global_illumination = bool(config.get("global_illumination",
                                                   True))

    def init(self, key):
        return {"scatterer": self.scatterer.init(key)}

    def apply(self, params, positions, dirs, normals, albedo, roughness,
              metallic, compute_indirect, emitter, emitter_params, rng):
        wi = -dirs
        secondary_d = jax.lax.stop_gradient(self.scatterer.sample(
            rng, n=normals, wi=wi, alpha_x=roughness[..., 0],
            alpha_y=roughness[..., 0], albedo=albedo, metallic=metallic))
        secondary_o = positions
        secondary_tr, secondary_rgb = compute_indirect(secondary_o,
                                                       secondary_d)
        pdf = self.scatterer.pdf(
            n=normals, wi=wi, wo=secondary_d, alpha_x=roughness[..., 0],
            alpha_y=roughness[..., 0], albedo=albedo, metallic=metallic)
        pdf = jnp.where(pdf > 0, pdf, jnp.ones_like(pdf))
        diff, spec = self.scatterer.eval(
            wi=wi, n=normals, wo=secondary_d, alpha_x=roughness[..., 0],
            alpha_y=roughness[..., 0], albedo=albedo, metallic=metallic)
        em_li = emitter.eval_base(emitter_params, secondary_d)
        li = em_li * secondary_tr
        if self.global_illumination:
            li = li + secondary_rgb
        lo_diff = (1.0 - metallic) * albedo * li * diff / pdf
        lo_spec = li * spec / pdf
        return {"rgb_phys": lo_diff + lo_spec, "diffuse_color": lo_diff,
                "specular_color": lo_spec}


@register("volume-split-sum-mip-occ")
class VolumeSplitSumMip(VolumeMixedMipSplitOcc):
    """Pure split-sum variant (no NN radiance branch), texture.py:96-232.

    Heads: albedo(3), roughness(1), metallic(1), secondary; forward
    returns only the PBR channels.
    """

    # no NN radiance branch: material_cache's env/blend path doesn't apply
    supports_multi_emitter = False

    def __init__(self, config):
        self.config = config
        self.n_dir_dims = int(config.get("n_dir_dims", 3))
        self.n_pos_dims = int(config.get("n_pos_dims", 3))
        self.dir_encoding = get_encoding(self.n_dir_dims,
                                         config["dir_encoding_config"])
        self.xyz_encoding = get_encoding(self.n_pos_dims,
                                         config["xyz_encoding_config"])
        fdim = int(config["input_feature_dim"])
        other = int(config.get("other_dim", 3))
        xdim = self.xyz_encoding.n_output_dims
        ddim = self.dir_encoding.n_output_dims
        self.secondary_mlp = get_mlp(fdim + other + ddim, 3,
                                     config["secondary_mlp_network_config"])
        self.albedo_mlp = get_mlp(fdim + xdim, 3,
                                  config["albedo_mlp_network_config"])
        self.roughness_mlp = get_mlp(fdim + xdim, 1,
                                     config["roughness_mlp_network_config"])
        self.metallic_mlp = get_mlp(fdim + xdim, 1,
                                    config["metallic_mlp_network_config"])
        self.color_activation = get_activation(
            config.get("color_activation", None))
        self._fg = jnp.asarray(fg_lut(256))

    def init(self, key):
        ks = jax.random.split(key, 6)
        return {
            "dir_encoding": self.dir_encoding.init(ks[0]),
            "xyz_encoding": self.xyz_encoding.init(ks[1]),
            "secondary": self.secondary_mlp.init(ks[2]),
            "albedo": self.albedo_mlp.init(ks[3]),
            "roughness": self.roughness_mlp.init(ks[4]),
            "metallic": self.metallic_mlp.init(ks[5]),
        }

    def _material_heads(self, params, features, positions, step=None):
        xyz_embd = self.xyz_encoding.apply(params["xyz_encoding"], positions,
                                           step)
        inp = jnp.concatenate([features, xyz_embd], axis=-1)
        act = self.color_activation
        albedo = act(self.albedo_mlp.apply(params["albedo"], inp))
        roughness = act(self.roughness_mlp.apply(params["roughness"], inp))
        metallic = act(self.metallic_mlp.apply(params["metallic"], inp))
        return None, albedo, roughness, None, metallic

    def apply(self, params, features, dirs, normals, positions, emitter=None,
              mips=None, stage: int = 1, step=None):
        wi = -dirs
        wo = _reflect(wi, normals)
        nov = jnp.sum(normals * wi, -1, keepdims=True)
        _, albedo, roughness, _, metallic = self._material_heads(
            params, features, positions, step)
        diff_pbr, spec_pbr, spec_ref, spec_light = self._split_sum(
            albedo, roughness, metallic, normals, wo, nov, emitter, mips)
        return {
            "diff_rgb_pbr": diff_pbr, "spec_rgb_pbr": spec_pbr,
            "spec_ref": spec_ref, "spec_light": spec_light,
            "albedo": albedo, "metallic": metallic, "roughness": roughness,
        }
