import numpy as np
import pytest

from rise_sdf_tpu.ops.mcubes import marching_tets


def sphere_level(r=33, radius=0.6):
    g = np.linspace(-1, 1, r)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    return np.sqrt(x ** 2 + y ** 2 + z ** 2) - radius


def test_marching_tets_sphere():
    r = 33
    level = sphere_level(r)
    verts, faces = marching_tets(level)
    assert len(verts) > 1000 and len(faces) > 2000
    c = (r - 1) / 2
    rad = np.linalg.norm(verts - c, axis=-1) * (2 / (r - 1))
    assert np.abs(rad - 0.6).max() < 0.01
    assert faces.min() >= 0 and faces.max() < len(verts)
    # closed surface: every edge shared by exactly 2 faces
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                            faces[:, [2, 0]]])
    ekey = np.sort(edges, axis=1)
    _, counts = np.unique(ekey, axis=0, return_counts=True)
    assert (counts == 2).all()


def test_native_matches_numpy():
    try:
        from rise_sdf_tpu.ops.mcubes_native import marching_tets_native
    except Exception:
        pytest.skip("native lib unavailable")
    level = sphere_level(17)
    v1, f1 = marching_tets(level)
    v2, f2 = marching_tets_native(level)
    assert v1.shape == v2.shape and f1.shape == f2.shape
    # same vertex sets (ordering may differ)
    s1 = np.lexsort(v1.T)
    s2 = np.lexsort(v2.T)
    np.testing.assert_allclose(v1[s1], v2[s2], atol=1e-5)


def test_empty_and_full():
    level = np.ones((8, 8, 8), np.float32)
    v, f = marching_tets(level)
    assert len(v) == 0 and len(f) == 0
    v, f = marching_tets(-level)
    assert len(v) == 0 and len(f) == 0
