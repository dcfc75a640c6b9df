#!/usr/bin/env python
"""Convert torch LPIPS(VGG16) checkpoints to the npz our metric expects.

The reference computes LPIPS via torchmetrics (``systems/split_occ.py:9``),
which composes (a) torchvision's pretrained VGG16 features and (b) the
LPIPS v0.1 linear calibration layers.  This environment has no network
egress, so those checkpoints cannot be downloaded here — but the moment
either file reaches the host (scp, mounted cache, ...), this script
closes the gap:

    python scripts/convert_lpips_weights.py \
        --vgg /path/to/vgg16-397923af.pth \
        --lin /path/to/lpips_vgg_v0.1.pth \
        --out load/lpips/vgg16_lpips.npz

Accepted inputs:
  --vgg  torchvision VGG16 state dict (keys ``features.N.weight/bias``),
         or a full torchmetrics LPIPS state dict (keys
         ``net.slice{K}.N.weight`` / ``pretrained.slice...``) — in the
         latter case --lin may be omitted if the same file carries
         ``lin{K}.model.1.weight`` entries.
  --lin  LPIPS v0.1 linear layers (keys ``lin{K}.model.1.weight``,
         shape [1, C, 1, 1]).

Output keys (see ``rise_sdf_tpu/systems/lpips.py``): ``conv{i}_w`` in
HWIO layout, ``conv{i}_b``, and ``lin{k}`` as a flat [C] vector.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

# VGG16 conv layers inside torchvision's ``features`` Sequential
TORCHVISION_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
N_CONVS = 13
N_LINS = 5


def _to_numpy(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _load_torch(path):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "state_dict" in obj \
            and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    return {k: _to_numpy(v) for k, v in obj.items()}


def extract_convs(sd):
    """-> {conv{i}_w (HWIO), conv{i}_b} from any supported layout."""
    out = {}
    # layout 1: torchvision features.N.{weight,bias}
    if any(k.startswith("features.") for k in sd):
        for i, n in enumerate(TORCHVISION_CONV_IDX):
            w = sd[f"features.{n}.weight"]  # OIHW
            b = sd[f"features.{n}.bias"]
            out[f"conv{i}_w"] = np.transpose(w, (2, 3, 1, 0)).astype(
                np.float32)
            out[f"conv{i}_b"] = b.astype(np.float32)
        return out
    # layout 2: torchmetrics/lpips ``net.sliceK.N.weight`` (or
    # ``pretrained.sliceK...``) — slices hold convs in order
    conv_ws = []
    pat = re.compile(r"(?:net\.|pretrained\.)?slice(\d+)\.(\d+)\.weight$")
    entries = []
    for k in sd:
        m = pat.search(k)
        if m:
            entries.append((int(m.group(1)), int(m.group(2)), k))
    entries.sort()
    for _, _, k in entries:
        conv_ws.append((sd[k], sd[k.replace(".weight", ".bias")]))
    if len(conv_ws) == N_CONVS:
        for i, (w, b) in enumerate(conv_ws):
            out[f"conv{i}_w"] = np.transpose(w, (2, 3, 1, 0)).astype(
                np.float32)
            out[f"conv{i}_b"] = b.astype(np.float32)
        return out
    raise SystemExit(
        f"unrecognized VGG checkpoint layout ({len(conv_ws)} convs found); "
        "expected torchvision 'features.N.*' or LPIPS 'sliceK.N.*' keys")


def extract_lins(sd):
    out = {}
    for k in range(N_LINS):
        for cand in (f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight",
                     f"lin{k}.weight", f"lin{k}"):
            if cand in sd:
                out[f"lin{k}"] = np.asarray(sd[cand], np.float32).reshape(-1)
                break
        else:
            return None
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--vgg", required=True,
                    help="VGG16 (or full LPIPS) torch checkpoint")
    ap.add_argument("--lin", default=None,
                    help="LPIPS v0.1 linear-layer checkpoint "
                         "(optional if --vgg carries lin weights)")
    ap.add_argument("--out", default="load/lpips/vgg16_lpips.npz")
    args = ap.parse_args(argv)

    sd = _load_torch(args.vgg)
    weights = extract_convs(sd)
    lins = extract_lins(sd)
    if lins is None and args.lin:
        lins = extract_lins(_load_torch(args.lin))
    if lins is None:
        raise SystemExit("no lin{k} calibration weights found — pass --lin")
    weights.update(lins)

    # sanity: channel chain 3->64->...->512, lin widths match block outputs
    expect_out = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512,
                  512]
    for i, c in enumerate(expect_out):
        assert weights[f"conv{i}_w"].shape[-1] == c, \
            f"conv{i} out={weights[f'conv{i}_w'].shape[-1]} != {c}"
    for k, c in enumerate([64, 128, 256, 512, 512]):
        assert weights[f"lin{k}"].shape == (c,), \
            f"lin{k} shape {weights[f'lin{k}'].shape} != ({c},)"

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez(args.out, **weights)
    print(f"wrote {args.out} ({len(weights)} arrays); LPIPS is now active")


if __name__ == "__main__":
    main(sys.argv[1:])
