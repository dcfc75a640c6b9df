"""Isosurface extraction via marching tetrahedra (table-light, exact dedup).

Replaces the reference's PyMCubes CPU marching cubes
(``models/geometry.py:32-66``).  Each active cube (sign change across its
corners) is split into 6 tetrahedra around the main diagonal; each tet
emits 0-2 triangles with vertices linearly interpolated on edges.
Vertices are deduplicated globally by edge id, so the mesh is watertight
where the field is.  A C++ fast path (``native/mcubes.cpp``) is used when
built; the numpy path is the reference implementation and test oracle.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

# cube corner i has offsets ((i>>2)&1, (i>>1)&1, i&1) in (x, y, z)
_CORNER_OFFSETS = np.array(
    [[(i >> 2) & 1, (i >> 1) & 1, i & 1] for i in range(8)], np.int64)

# 6-tet decomposition around diagonal corner0 (000) -> corner7 (111)
_TETS = np.array([
    [0, 5, 1, 7],
    [0, 1, 3, 7],
    [0, 3, 2, 7],
    [0, 2, 6, 7],
    [0, 6, 4, 7],
    [0, 4, 5, 7],
], np.int64)


def _tet_case_tables():
    """For each of 16 sign cases: up to 2 triangles, each vertex an edge
    (pair of local tet-corner indices 0..3), padded with -1."""
    tris = np.full((16, 2, 3, 2), -1, np.int64)
    for case in range(1, 15):
        inside = [i for i in range(4) if case & (1 << i)]
        outside = [i for i in range(4) if not case & (1 << i)]
        if len(inside) == 1:
            a = inside[0]
            e = [(a, o) for o in outside]
            tris[case, 0] = [e[0], e[1], e[2]]
        elif len(inside) == 3:
            a = outside[0]
            e = [(i, a) for i in inside]
            # flip orientation vs the 1-inside case
            tris[case, 0] = [e[0], e[2], e[1]]
        else:  # two inside: quad -> 2 triangles
            i0, i1 = inside
            o0, o1 = outside
            e00, e01 = (i0, o0), (i0, o1)
            e10, e11 = (i1, o0), (i1, o1)
            tris[case, 0] = [e00, e01, e11]
            tris[case, 1] = [e00, e11, e10]
    return tris


_TET_TRIS = _tet_case_tables()


def marching_tets(level: np.ndarray, threshold: float = 0.0
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Extract {level == threshold}. level: [Rx, Ry, Rz] float.

    Returns (verts [V,3] in index coordinates [0, R-1], faces [F,3]).
    Triangles are oriented so normals point toward *decreasing* level
    (outward for an SDF with negative interior).
    """
    level = np.asarray(level, np.float32)
    rx, ry, rz = level.shape
    f = level - threshold
    inside = f < 0

    # active cubes: any corner sign differs
    cs = np.zeros((rx - 1, ry - 1, rz - 1), np.int64)
    for i, (ox, oy, oz) in enumerate(_CORNER_OFFSETS):
        cs += inside[ox:rx - 1 + ox, oy:ry - 1 + oy, oz:rz - 1 + oz]
    active = np.argwhere((cs > 0) & (cs < 8))
    if len(active) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)

    # global corner ids + values for each active cube [A, 8]
    corner_idx3 = active[:, None, :] + _CORNER_OFFSETS[None, :, :]
    gid = (corner_idx3[..., 0] * ry + corner_idx3[..., 1]) * rz \
        + corner_idx3[..., 2]
    vals = f.reshape(-1)[gid]

    # tets [A, 6, 4] of global corner ids / values
    tet_gid = gid[:, _TETS]
    tet_val = vals[:, _TETS]
    a = len(active)
    tet_gid = tet_gid.reshape(a * 6, 4)
    tet_val = tet_val.reshape(a * 6, 4)

    case = ((tet_val[:, 0] < 0).astype(np.int64)
            | ((tet_val[:, 1] < 0) << 1)
            | ((tet_val[:, 2] < 0) << 2)
            | ((tet_val[:, 3] < 0) << 3))
    tris = _TET_TRIS[case]                      # [T, 2, 3, 2] local edges
    valid_tri = tris[:, :, 0, 0] >= 0           # [T, 2]
    t_idx, k_idx = np.nonzero(valid_tri)
    if len(t_idx) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)
    tri_edges = tris[t_idx, k_idx]              # [F, 3, 2] local corner pairs
    tri_gid = np.take_along_axis(
        tet_gid[t_idx][:, None, :].repeat(3, 1), tri_edges, axis=2)  # [F,3,2]
    tri_val = np.take_along_axis(
        tet_val[t_idx][:, None, :].repeat(3, 1), tri_edges, axis=2)

    # dedupe edge vertices by (min_gid, max_gid)
    e0 = np.minimum(tri_gid[..., 0], tri_gid[..., 1])
    e1 = np.maximum(tri_gid[..., 0], tri_gid[..., 1])
    ekey = e0.astype(np.int64) * (rx * ry * rz) + e1
    uniq, first, inv = np.unique(ekey.reshape(-1), return_index=True,
                                 return_inverse=True)
    faces = inv.reshape(-1, 3)
    g0 = tri_gid[..., 0].reshape(-1)[first]
    g1 = tri_gid[..., 1].reshape(-1)[first]
    v0 = tri_val[..., 0].reshape(-1)[first]
    v1 = tri_val[..., 1].reshape(-1)[first]

    def gid_to_xyz(g):
        z = g % rz
        y = (g // rz) % ry
        x = g // (rz * ry)
        return np.stack([x, y, z], -1).astype(np.float32)

    p0, p1 = gid_to_xyz(g0), gid_to_xyz(g1)
    denom = v1 - v0
    t = np.where(np.abs(denom) > 1e-12, -v0 / np.where(denom == 0, 1, denom),
                 0.5)
    t = np.clip(t, 0.0, 1.0)[:, None]
    verts = p0 + t * (p1 - p0)

    # drop degenerate faces (two identical vertex ids)
    good = (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) \
        & (faces[:, 0] != faces[:, 2])
    return verts, faces[good]


def marching_cubes(level: np.ndarray, threshold: float = 0.0):
    """Dispatch to the native C++ implementation when available."""
    try:
        from .mcubes_native import marching_tets_native

        return marching_tets_native(level, threshold)
    except Exception:
        return marching_tets(level, threshold)
