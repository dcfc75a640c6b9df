"""Eval-time dense SDF bake: trade hash-grid gathers for one packed row.

The eval pipeline's dominant cost on TPU is random hash-table gather
*issue rate* (~4-5 ns/row, measured by bench.py), and its dominant row
producers are the coarse visibility probe (~55% of rows: 64 probes/ray
x 16 levels x 8 corners) and the secondary occlusion march (~31%), both
of which only need *SDF values* (plus a direction cosine) — not
features.  The reference has no analog because tcnn gathers are
near-memory-speed on GPU (``lib/nerfacc`` marching calls the full field
per sample, ``models/split_mixed_occ.py:179-222``); on TPU, converting
those samples' 128 hash rows + MLP into ONE packed gather row is the
architecture-appropriate fix.

Once per checkpoint (params are frozen during eval), the full geometry
SDF (hash encode + MLP) is evaluated on a dense ``(R+1)^3`` vertex
lattice over the model AABB, then repacked so entry ``[i, j, k]`` holds
all 8 corner values of cell ``(i, j, k)``:

* ``bake_sdf_vertices``  — lattice evaluation (chunked, jit-per-chunk)
* ``pack_corners``       — ``[V,V,V] -> [V,V,V,8]`` corner-packed grid
* ``sample_packed``      — trilinear SDF (one gather row per sample)
* ``sample_packed_grad`` — trilinear SDF + analytic cell gradient

Accuracy: trilinear interpolation of a smooth SDF has O(h^2 |Hess|)
error — at the default 128-cell bake over [-1.5, 1.5]^3 (h = 0.0234)
that is ~7e-5 x curvature, two orders of magnitude under the probe's
one-coarse-interval safety margin (0.02), so band placement is
unaffected; the secondary pass only needs transmittance through the
(baked) surface.  Both uses are gated by quality-parity A/Bs on a
converged checkpoint before any default flip (BASELINE.md protocol).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

# corner order: bit 2 = dx, bit 1 = dy, bit 0 = dz  (c = 4*dx + 2*dy + dz)
_CORNERS = [(dx, dy, dz) for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)]


def bake_sdf_vertices(sdf_fn, aabb_min, aabb_max, cells: int,
                      chunk: int = 1 << 18, jit_fn: bool = True):
    """Evaluate ``sdf_fn`` on the ``(cells+1)^3`` vertex lattice.

    ``sdf_fn`` maps ``[N, 3]`` world positions to ``[N]`` SDF values
    (the *full* geometry field — all hash levels + MLP, so the bake is
    strictly more accurate than any probe-side level cut).  Chunked so
    the one-off bake fits alongside eval buffers; each chunk is one
    device dispatch of ``chunk`` points.  Pass ``jit_fn=False`` when
    ``sdf_fn`` is already jitted (repeated bakes then reuse its compile
    cache instead of re-tracing a fresh wrapper per bake).
    """
    v = cells + 1
    aabb_min = jnp.asarray(aabb_min, jnp.float32)
    aabb_max = jnp.asarray(aabb_max, jnp.float32)
    lin = jnp.arange(v, dtype=jnp.float32) / cells
    # vertex (i, j, k) -> aabb_min + (i, j, k)/cells * extent
    n = v * v * v
    idx = jnp.arange(n, dtype=jnp.int32)
    kz = idx % v
    ky = (idx // v) % v
    kx = idx // (v * v)
    u = jnp.stack([lin[kx], lin[ky], lin[kz]], axis=-1)
    pts = aabb_min + u * (aabb_max - aabb_min)

    vals = []
    fn = jax.jit(sdf_fn) if jit_fn else sdf_fn
    for s in range(0, n, chunk):
        p = pts[s:s + chunk]
        pad = chunk - p.shape[0]
        if pad:
            p = jnp.pad(p, ((0, pad), (0, 0)))
        out = fn(p)
        vals.append(out[:out.shape[0] - pad] if pad else out)
    return jnp.concatenate(vals, axis=0).reshape(v, v, v)


def pack_corners(vertices):
    """``[V, V, V]`` vertex SDF -> ``[V^3, 8]`` corner-packed cell table.

    Row ``(i*V + j)*V + k`` holds the 8 corners of the cell whose low
    vertex is ``(i, j, k)``; rows at the high boundary (i/j/k = V-1)
    repeat the clamped edge (never sampled: cell indices are clamped to
    ``V-2``).  One trilinear sample then costs ONE 32-byte gather row
    instead of 8 scalar rows — gathers are issue-rate-bound on TPU, so
    this is ~8x fewer issue slots for the same information.
    """
    v = vertices.shape[0]
    packed = []
    for dx, dy, dz in _CORNERS:
        shifted = vertices[dx:v - 1 + dx if dx else v,
                           dy:v - 1 + dy if dy else v,
                           dz:v - 1 + dz if dz else v]
        # pad the trailing face back to [V, V, V] (edge-clamped)
        shifted = jnp.pad(shifted,
                          [(0, v - shifted.shape[0]),
                           (0, v - shifted.shape[1]),
                           (0, v - shifted.shape[2])], mode="edge")
        packed.append(shifted.reshape(-1))
    return jnp.stack(packed, axis=-1)


def bake_packed(sdf_fn, aabb_min, aabb_max, cells: int,
                chunk: int = 1 << 18, jit_fn: bool = True):
    """One-call bake: vertex lattice -> corner-packed table.

    Returns the bake pytree consumed by :func:`sample_packed`:
    ``{"packed": [V^3, 8] f32, "cells": int32 scalar}`` (aabb comes from
    the model at sample time — it is static per model).
    """
    verts = bake_sdf_vertices(sdf_fn, aabb_min, aabb_max, cells, chunk,
                              jit_fn=jit_fn)
    return {"packed": pack_corners(verts),
            "cells": jnp.asarray(cells, jnp.int32)}


def bake_for_model(model, params, step):
    """Shared model-level bake entry (NeuS + split-mixed-occ).

    Evaluates the model's full geometry SDF on the configured lattice
    (``model.eval_sdf_bake_cells``) and returns the packed bake, or
    ``None`` when ``model.eval_sdf_bake`` is "off".  The per-chunk SDF
    evaluation is jitted once and cached on the model so repeated bakes
    (one per val) reuse the compile.
    """
    if getattr(model, "eval_sdf_bake", "off") == "off":
        return None
    if not hasattr(model, "_jit_bake_sdf"):
        model._jit_bake_sdf = jax.jit(
            lambda gp, p, s: model.geometry.sdf(gp, p, s))
    fn = lambda p: model._jit_bake_sdf(params["geometry"], p,
                                       jnp.asarray(step, jnp.int32))
    return bake_packed(fn, model.aabb_min, model.aabb_max,
                       model.eval_sdf_bake_cells, jit_fn=False)


def _cell_coords(pos, aabb_min, aabb_max, cells):
    extent = aabb_max - aabb_min
    u = (pos - aabb_min) / extent * cells
    i = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, cells - 1)
    f = jnp.clip(u - i.astype(jnp.float32), 0.0, 1.0)
    return i, f


def _corner_weights(f):
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    w = []
    for dx, dy, dz in _CORNERS:
        w.append((fx if dx else 1.0 - fx)
                 * (fy if dy else 1.0 - fy)
                 * (fz if dz else 1.0 - fz))
    return jnp.stack(w, axis=-1)  # [..., 8]


def sample_packed(bake, pos, aabb_min, aabb_max):
    """Trilinear SDF at world ``pos`` [N, 3] from a packed bake. [N]."""
    cells = bake["cells"]
    v = cells + 1
    i, f = _cell_coords(pos, aabb_min, aabb_max, cells)
    flat = (i[..., 0] * v + i[..., 1]) * v + i[..., 2]
    rows = bake["packed"][flat]                       # [N, 8] — ONE gather
    return jnp.sum(rows * _corner_weights(f), axis=-1)


def sample_packed_grad(bake, pos, aabb_min, aabb_max):
    """Trilinear SDF and its analytic world-space gradient.

    The gradient of the trilinear interpolant within the cell — exact
    for the interpolant, piecewise (bi)linear for the field; sufficient
    for the secondary pass's direction-cosine (NeuS alpha) where the
    eikonal property makes |grad| ~ 1 anyway.  Returns ``(sdf [N],
    grad [N, 3])``.
    """
    cells = bake["cells"]
    v = cells + 1
    extent = jnp.asarray(aabb_max, jnp.float32) - jnp.asarray(
        aabb_min, jnp.float32)
    i, f = _cell_coords(pos, aabb_min, aabb_max, cells)
    flat = (i[..., 0] * v + i[..., 1]) * v + i[..., 2]
    rows = bake["packed"][flat]                       # [N, 8]
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    w = _corner_weights(f)
    sdf = jnp.sum(rows * w, axis=-1)

    def axis_weight(frac, hot):
        return jnp.ones_like(frac) if hot else -jnp.ones_like(frac)

    grads = []
    for axis in range(3):
        dw = []
        for ci, (dx, dy, dz) in enumerate(_CORNERS):
            hot = (dx, dy, dz)[axis]
            term = axis_weight(f[..., axis], hot)
            for other in range(3):
                if other == axis:
                    continue
                oh = (dx, dy, dz)[other]
                fo = f[..., other]
                term = term * (fo if oh else 1.0 - fo)
            dw.append(term)
        dw = jnp.stack(dw, axis=-1)                  # [N, 8]
        # d/dworld = d/dfrac * cells / extent[axis]
        grads.append(jnp.sum(rows * dw, axis=-1)
                     * (cells.astype(jnp.float32) / extent[axis]))
    return sdf, jnp.stack(grads, axis=-1)
