"""Inventory-tail utilities: gaussian histogram + cubemap-cross saver."""

import os

import jax.numpy as jnp
import numpy as np

from rise_sdf_tpu.utils.misc import gaussian_histogram
from rise_sdf_tpu.utils.saving import Saver


def test_gaussian_histogram_mass_and_location():
    # sample at a bin center; sigma ~ bin width so the soft histogram
    # conserves mass (narrow sigma between centers loses it — same
    # behavior as the reference module)
    x = jnp.asarray([0.45] * 100, jnp.float32)
    h = np.asarray(gaussian_histogram(x, bins=10, vmin=0.0, vmax=1.0,
                                      sigma=0.1))
    assert h.argmax() == 4
    np.testing.assert_allclose(h.sum(), 100.0, rtol=0.05)
    # wider sigma spreads mass flatter
    h2 = np.asarray(gaussian_histogram(x, 10, 0.0, 1.0, sigma=0.4))
    assert h2.max() < h.max()


def test_save_cubemap_cross_layout(tmp_path):
    import cv2

    saver = Saver(str(tmp_path))
    img = np.zeros((6, 8, 8, 3), np.float32)
    for i in range(6):
        img[i, :, :, 0] = (i + 1) / 6.0  # distinct red level per face
    path = saver.save_cubemap("cube.png", img)
    assert os.path.exists(path)
    out = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
    assert out.shape == (24, 32, 3)  # 3x4 faces of 8px
    # center of the cross = face 4 (+z), middle row second column
    np.testing.assert_allclose(out[12, 12, 0] / 255.0, 5 / 6.0, atol=0.01)
    # corners blank
    assert out[0, 0].sum() == 0 and out[-1, -1].sum() == 0
