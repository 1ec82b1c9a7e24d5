"""Minimal OpenEXR scanline codec (uncompressed, float32, RGB/arbitrary).

The reference saves frames with `Image::save` to EXR (base repo; call site
/root/reference/src/render/renderer.cpp:2053-2059) and the training pipeline
reads EXRs via OpenCV (/root/reference/trainingcode/datasets.py:14-15). No
OpenEXR binding is available in this environment, so this is a small pure-numpy
implementation of the EXR 2.0 scanline format with compression=NONE — enough
for round-tripping our own frames and training datasets.
"""
from __future__ import annotations

import struct

import numpy as np

_MAGIC = 20000630
_VERSION = 2

# pixel type enum: 0=uint, 1=half, 2=float
_PT_HALF = 1
_PT_FLOAT = 2


def _write_attr(f, name: bytes, type_: bytes, value: bytes):
    f.write(name + b"\x00" + type_ + b"\x00" + struct.pack("<i", len(value)) + value)


def write_exr(path: str, image: np.ndarray, channel_names=None):
    """Write (H, W) or (H, W, C) float32 image as uncompressed scanline EXR."""
    img = np.asarray(image, np.float32)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if channel_names is None:
        channel_names = {1: ["Y"], 3: ["R", "G", "B"], 4: ["R", "G", "B", "A"]}.get(
            c, [f"channel{i}" for i in range(c)]
        )
    assert len(channel_names) == c
    # EXR stores channels per scanline sorted by name.
    order = sorted(range(c), key=lambda i: channel_names[i])

    with open(path, "wb") as f:
        f.write(struct.pack("<ii", _MAGIC, _VERSION))

        chl = b""
        for i in order:
            chl += channel_names[i].encode() + b"\x00"
            chl += struct.pack("<iiii", _PT_FLOAT, 0, 1, 1)  # type, pLinear+resv, xs, ys
        chl += b"\x00"
        _write_attr(f, b"channels", b"chlist", chl)
        _write_attr(f, b"compression", b"compression", b"\x00")  # NONE
        box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
        _write_attr(f, b"dataWindow", b"box2i", box)
        _write_attr(f, b"displayWindow", b"box2i", box)
        _write_attr(f, b"lineOrder", b"lineOrder", b"\x00")  # increasing Y
        _write_attr(f, b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
        _write_attr(f, b"screenWindowCenter", b"v2f", struct.pack("<ff", 0.0, 0.0))
        _write_attr(f, b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
        f.write(b"\x00")  # end of header

        # scanline offset table
        table_pos = f.tell()
        line_data_size = w * c * 4
        line_block_size = 8 + line_data_size  # y + size + data
        first_line = table_pos + 8 * h
        for y in range(h):
            f.write(struct.pack("<Q", first_line + y * line_block_size))

        planar = img[:, :, order]  # (h, w, c) in name order
        for y in range(h):
            f.write(struct.pack("<ii", y, line_data_size))
            # channel-planar within the scanline
            f.write(np.ascontiguousarray(planar[y].T).tobytes())


def read_exr(path: str):
    """Read an uncompressed scanline EXR (float32 or half channels).

    Returns (image (H, W, C) float32, channel_names list in file order)."""
    with open(path, "rb") as f:
        data = f.read()

    magic, version = struct.unpack_from("<ii", data, 0)
    assert magic == _MAGIC, f"not an EXR file: {path}"
    pos = 8

    def read_cstr(p):
        end = data.index(b"\x00", p)
        return data[p:end].decode(), end + 1

    channels = []
    data_window = None
    compression = None
    while True:
        if data[pos] == 0:
            pos += 1
            break
        name, pos = read_cstr(pos)
        type_, pos = read_cstr(pos)
        (size,) = struct.unpack_from("<i", data, pos)
        pos += 4
        value = data[pos : pos + size]
        pos += size
        if name == "channels":
            q = 0
            while value[q] != 0:
                cname_end = value.index(b"\x00", q)
                cname = value[q:cname_end].decode()
                q = cname_end + 1
                ptype, _resv, _xs, _ys = struct.unpack_from("<iiii", value, q)
                q += 16
                channels.append((cname, ptype))
        elif name == "dataWindow":
            data_window = struct.unpack("<iiii", value)
        elif name == "compression":
            compression = value[0]

    assert compression == 0, "only compression=NONE supported"
    x0, y0, x1, y1 = data_window
    w, h = x1 - x0 + 1, y1 - y0 + 1
    c = len(channels)

    pos += 8 * h  # skip offset table
    img = np.zeros((h, w, c), np.float32)
    for _ in range(h):
        y, size = struct.unpack_from("<ii", data, pos)
        pos += 8
        q = pos
        for ci, (cname, ptype) in enumerate(channels):
            if ptype == _PT_FLOAT:
                arr = np.frombuffer(data, "<f4", w, q)
                q += 4 * w
            elif ptype == _PT_HALF:
                arr = np.frombuffer(data, "<f2", w, q).astype(np.float32)
                q += 2 * w
            else:
                arr = np.frombuffer(data, "<u4", w, q).astype(np.float32)
                q += 4 * w
            img[y - y0, :, ci] = arr
        pos += size

    return img, [c[0] for c in channels]
