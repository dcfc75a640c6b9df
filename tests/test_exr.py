import struct
import zlib

import numpy as np
import pytest

from rise_sdf_tpu.utils.exr import (
    _predictor_decode,
    _predictor_encode,
    read_exr,
    write_exr,
)


def test_roundtrip(tmp_path):
    img = np.random.default_rng(0).uniform(0, 10, (17, 23, 3)).astype(np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, img)
    back = read_exr(p)
    np.testing.assert_allclose(back, img, rtol=1e-7)


def test_roundtrip_1ch(tmp_path):
    img = np.random.default_rng(1).uniform(size=(8, 9)).astype(np.float32)
    p = str(tmp_path / "t1.exr")
    write_exr(p, img)
    back = read_exr(p)
    np.testing.assert_allclose(back[..., 0], img, rtol=1e-7)


def test_predictor_roundtrip():
    rng = np.random.default_rng(2)
    for n in [1, 2, 7, 256, 1001]:
        data = rng.integers(0, 256, n).astype(np.uint8).tobytes()
        enc = _predictor_encode(data)
        dec = _predictor_decode(bytearray(enc))
        assert dec == data, n


def test_read_zips_compressed(tmp_path):
    """Build a ZIPS-compressed EXR by hand and read it back."""
    img = np.random.default_rng(3).uniform(size=(5, 6, 3)).astype(np.float32)
    h, w, c = img.shape
    names = ["B", "G", "R"]  # alphabetical storage order
    src = {"R": img[..., 0], "G": img[..., 1], "B": img[..., 2]}

    def attr(name, typ, val):
        return (name.encode() + b"\x00" + typ.encode() + b"\x00"
                + struct.pack("<i", len(val)) + val)

    chans = b""
    for nm in names:
        chans += nm.encode() + b"\x00" + struct.pack("<iiii", 2, 0, 1, 1)
    chans += b"\x00"
    header = attr("channels", "chlist", chans)
    header += attr("compression", "compression", b"\x02")  # ZIPS
    header += attr("dataWindow", "box2i", struct.pack("<4i", 0, 0, w - 1, h - 1))
    header += attr("displayWindow", "box2i",
                   struct.pack("<4i", 0, 0, w - 1, h - 1))
    header += attr("lineOrder", "lineOrder", b"\x00")
    header += attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += attr("screenWindowCenter", "v2f", struct.pack("<2f", 0, 0))
    header += attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\x00"
    pre = struct.pack("<ii", 20000630, 2) + header

    blocks = []
    for y in range(h):
        raw = b"".join(src[nm][y].tobytes() for nm in names)
        comp = zlib.compress(_predictor_encode(raw))
        if len(comp) >= len(raw):
            comp = raw
        blocks.append(struct.pack("<ii", y, len(comp)) + comp)
    start = len(pre) + 8 * h
    offsets, pos = [], start
    for b in blocks:
        offsets.append(pos)
        pos += len(b)
    p = str(tmp_path / "zips.exr")
    with open(p, "wb") as f:
        f.write(pre)
        f.write(struct.pack(f"<{h}Q", *offsets))
        for b in blocks:
            f.write(b)
    back = read_exr(p)
    np.testing.assert_allclose(back, img, rtol=1e-6)
