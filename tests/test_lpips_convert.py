"""Round-trip test for the LPIPS weights-conversion script: a synthetic
torchvision-layout VGG16 checkpoint + LPIPS linear checkpoint convert to
the npz our metric loads, and the metric activates on it."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from convert_lpips_weights import (  # noqa: E402
    TORCHVISION_CONV_IDX,
    extract_convs,
    extract_lins,
    main,
)

_CHAIN = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
          (256, 256), (256, 512), (512, 512), (512, 512), (512, 512),
          (512, 512), (512, 512)]
_LIN_C = [64, 128, 256, 512, 512]


def _fake_vgg_state():
    rng = np.random.RandomState(0)
    sd = {}
    for n, (cin, cout) in zip(TORCHVISION_CONV_IDX, _CHAIN):
        sd[f"features.{n}.weight"] = torch.from_numpy(
            rng.randn(cout, cin, 3, 3).astype(np.float32) * 0.05)
        sd[f"features.{n}.bias"] = torch.zeros(cout)
    return sd


def _fake_lin_state():
    rng = np.random.RandomState(1)
    return {f"lin{k}.model.1.weight": torch.from_numpy(
        np.abs(rng.randn(1, c, 1, 1)).astype(np.float32) / c)
        for k, c in enumerate(_LIN_C)}


def test_extract_layouts():
    convs = extract_convs({k: v.numpy() for k, v in _fake_vgg_state().items()})
    assert convs["conv0_w"].shape == (3, 3, 3, 64)  # HWIO
    assert convs["conv12_w"].shape == (3, 3, 512, 512)
    lins = extract_lins({k: v.numpy() for k, v in _fake_lin_state().items()})
    assert lins["lin4"].shape == (512,)
    # slice layout (torchmetrics) maps identically
    slice_sd = {}
    ci = 0
    per_slice = [2, 2, 3, 3, 3]
    for s, n in enumerate(per_slice):
        for j in range(n):
            cin, cout = _CHAIN[ci]
            slice_sd[f"net.slice{s + 1}.{j * 2}.weight"] = \
                np.zeros((cout, cin, 3, 3), np.float32)
            slice_sd[f"net.slice{s + 1}.{j * 2}.bias"] = \
                np.zeros((cout,), np.float32)
            ci += 1
    convs2 = extract_convs(slice_sd)
    assert convs2["conv12_w"].shape == (3, 3, 512, 512)


def test_end_to_end_conversion_activates_metric(tmp_path, monkeypatch):
    vgg_p = tmp_path / "vgg16.pth"
    lin_p = tmp_path / "lin.pth"
    out_p = tmp_path / "vgg16_lpips.npz"
    torch.save(_fake_vgg_state(), vgg_p)
    torch.save(_fake_lin_state(), lin_p)
    main(["--vgg", str(vgg_p), "--lin", str(lin_p), "--out", str(out_p)])
    assert out_p.exists()

    from rise_sdf_tpu.systems import lpips as lp

    monkeypatch.setenv("RISE_SDF_LPIPS_WEIGHTS", str(out_p))
    lp.reset_cache()
    try:
        assert lp.available()
        a = np.zeros((32, 32, 3), np.float32)
        b = np.ones((32, 32, 3), np.float32) * 0.5
        v_same = lp.lpips(a, a)
        v_diff = lp.lpips(a, b)
        assert v_same == pytest.approx(0.0, abs=1e-6)
        assert np.isfinite(v_diff) and v_diff > 0
    finally:
        lp.reset_cache()
