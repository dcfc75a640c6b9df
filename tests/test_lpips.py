"""LPIPS(VGG16) structural test with synthetic weights.

Real pretrained weights cannot exist in this environment (no network
egress, no local torchvision/keras caches — documented in BASELINE.md),
so the full architecture is exercised end-to-end with random weights:
metric properties (zero on identical inputs, positive and symmetric on
different ones) hold for any weight values.
"""

import os

import numpy as np
import pytest

from rise_sdf_tpu.systems import lpips as L

_BLOCK_CHANNELS = [(3, 64), (64, 64), (64, 128), (128, 128),
                   (128, 256), (256, 256), (256, 256),
                   (256, 512), (512, 512), (512, 512),
                   (512, 512), (512, 512), (512, 512)]
_FEAT_CHANNELS = [64, 128, 256, 512, 512]


def _write_random_weights(path):
    rng = np.random.RandomState(0)
    w = {}
    for i, (cin, cout) in enumerate(_BLOCK_CHANNELS):
        w[f"conv{i}_w"] = rng.randn(3, 3, cin, cout).astype(np.float32) \
            * np.sqrt(2.0 / (9 * cin))
        w[f"conv{i}_b"] = np.zeros((cout,), np.float32)
    for k, c in enumerate(_FEAT_CHANNELS):
        w[f"lin{k}"] = np.abs(rng.randn(c)).astype(np.float32) / c
    np.savez(path, **w)


@pytest.fixture()
def synthetic_weights(tmp_path, monkeypatch):
    path = str(tmp_path / "vgg16_lpips.npz")
    _write_random_weights(path)
    monkeypatch.setenv("RISE_SDF_LPIPS_WEIGHTS", path)
    L.reset_cache()
    yield path
    monkeypatch.delenv("RISE_SDF_LPIPS_WEIGHTS")
    L.reset_cache()


def test_unavailable_without_weights():
    L.reset_cache()
    if not os.path.exists("load/lpips/vgg16_lpips.npz"):
        assert not L.available()
        assert L.lpips(np.zeros((8, 8, 3)), np.ones((8, 8, 3))) is None


def test_metric_properties(synthetic_weights):
    assert L.available()
    rng = np.random.RandomState(1)
    a = rng.rand(32, 32, 3).astype(np.float32)
    b = rng.rand(32, 32, 3).astype(np.float32)
    d_aa = L.lpips(a, a)
    d_ab = L.lpips(a, b)
    d_ba = L.lpips(b, a)
    assert d_aa == pytest.approx(0.0, abs=1e-6)
    assert d_ab > 1e-5
    assert d_ab == pytest.approx(d_ba, rel=1e-4)


def test_monotone_in_noise(synthetic_weights):
    rng = np.random.RandomState(2)
    a = rng.rand(32, 32, 3).astype(np.float32) * 0.5 + 0.25
    n = rng.randn(32, 32, 3).astype(np.float32)
    d_small = L.lpips(a, np.clip(a + 0.02 * n, 0, 1))
    d_large = L.lpips(a, np.clip(a + 0.2 * n, 0, 1))
    assert d_small < d_large
