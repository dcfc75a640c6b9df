"""Mesh + material export (reference models/geometry.py:83-112 isosurface,
systems/split_occ.py:553-561 material baking).

Coarse-to-fine marching over the SDF: coarse pass over [-r, r]^3 finds
the object bbox, fine pass (+10% margin) extracts the final mesh; vertex
attributes (normal, albedo/metallic/roughness or radiance color) are
baked by chunked field evals.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ops.mcubes import marching_cubes


def _grid_levels(model, state, vmin, vmax, resolution, chunk, step):
    """Evaluate the SDF on a dense grid, chunked; returns [R,R,R] numpy."""
    r = resolution
    axes = [np.linspace(vmin[i], vmax[i], r, dtype=np.float32)
            for i in range(3)]
    x, y, z = np.meshgrid(*axes, indexing="ij")
    pts = np.stack([x, y, z], -1).reshape(-1, 3)
    fn = jax.jit(lambda p: model.forward_level(state["params"], p,
                                               state["step"]))
    out = np.empty((pts.shape[0],), np.float32)
    for s in range(0, pts.shape[0], chunk):
        end = min(s + chunk, pts.shape[0])
        block = pts[s:end]
        pad = 0
        if end - s < chunk and s > 0:
            pad = chunk - (end - s)
            block = np.concatenate([block, np.zeros((pad, 3), np.float32)])
        res = np.asarray(fn(jnp.asarray(block)))
        out[s:end] = res[: end - s]
    return out.reshape(r, r, r), axes


def isosurface(model, state, config) -> Optional[Dict[str, np.ndarray]]:
    iso = config["model"]["geometry"].get("isosurface", None)
    if iso is None:
        return None
    resolution = int(iso.get("resolution", 512))
    chunk = int(iso.get("chunk", 2097152))
    threshold = float(iso.get("threshold", 0.0))
    radius = float(config["model"]["radius"])
    step = int(state["step"])

    def run(vmin, vmax, res):
        level, axes = _grid_levels(model, state, vmin, vmax, res, chunk, step)
        verts_idx, faces = marching_cubes(level, threshold)
        if len(verts_idx) == 0:
            return None
        scale = np.asarray([(vmax[i] - vmin[i]) / (res - 1)
                            for i in range(3)], np.float32)
        verts = verts_idx * scale[None, :] + np.asarray(vmin, np.float32)
        return {"v_pos": verts, "t_pos_idx": faces}

    coarse = run([-radius] * 3, [radius] * 3, min(resolution, 128))
    if coarse is None:
        return None
    vmin = coarse["v_pos"].min(0)
    vmax = coarse["v_pos"].max(0)
    pad = (vmax - vmin) * 0.1
    vmin = np.clip(vmin - pad, -radius, radius)
    vmax = np.clip(vmax + pad, -radius, radius)
    return run(vmin, vmax, resolution)


def export_mesh(model, state, config) -> Optional[Dict[str, np.ndarray]]:
    """Mesh + baked vertex attributes.

    For the PBR model returns albedo/metallic/roughness arrays alongside
    the mesh (reference models/split_mixed_occ.py:472-493); for NeuS
    bakes a pseudo-albedo vertex color by viewing along -normal
    (reference models/neus.py:343-351).
    """
    mesh = isosurface(model, state, config)
    if mesh is None:
        return None
    export_cfg = config.get("export", {})
    if not export_cfg.get("export_vertex_color", True):
        return mesh
    chunk = int(export_cfg.get("chunk_size", 2097152))
    chunk = min(chunk, 262144)
    params = state["params"]
    step = state["step"]
    verts = mesh["v_pos"]
    has_pbr = hasattr(model, "emitter")

    geo_fn = jax.jit(lambda p: model.geometry.forward(
        params["geometry"], p, step, with_grad=True, with_feature=True))
    mips = model.emitter.build_mips(params["emitter"]) if has_pbr else None

    colors, albedos, metallics, roughs = [], [], [], []
    for s in range(0, len(verts), chunk):
        block = jnp.asarray(verts[s:s + chunk])
        geo = geo_fn(block)
        normal = np.asarray(geo["grad"])
        normal = normal / np.maximum(
            np.linalg.norm(normal, axis=-1, keepdims=True), 1e-6)
        if has_pbr:
            tex = model.texture.apply(
                params["texture"], geo["feature"], -jnp.asarray(normal),
                jnp.asarray(normal), block, emitter=model.emitter, mips=mips,
                stage=1, step=step)
            albedos.append(np.asarray(tex["albedo"]))
            metallics.append(np.asarray(tex["metallic"]))
            roughs.append(np.asarray(tex["roughness"]))
            colors.append(np.asarray(tex["albedo"]))
        else:
            rgb = model.texture.apply(
                params["texture"], geo["feature"], -jnp.asarray(normal),
                jnp.asarray(normal), step=step)
            colors.append(np.asarray(rgb))
    mesh["v_rgb"] = np.concatenate(colors, 0)
    if has_pbr:
        mesh["albedo"] = np.concatenate(albedos, 0)
        mesh["metallic"] = np.concatenate(metallics, 0)
        mesh["roughness"] = np.concatenate(roughs, 0)
    return mesh
