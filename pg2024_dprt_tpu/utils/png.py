"""Minimal PNG writer (pure stdlib zlib) for quick tone-mapped previews —
the role of the reference eval scripts' cv2 image dumps
(/root/reference/trainingcode/utils/post_png.py)."""
from __future__ import annotations

import struct
import zlib

import numpy as np


def tonemap(img: np.ndarray, exposure: float = 1.0, gamma: float = 2.2) -> np.ndarray:
    """Simple reinhard + gamma -> uint8."""
    x = np.asarray(img, np.float32) * exposure
    x = x / (1.0 + x)
    x = np.clip(x, 0.0, 1.0) ** (1.0 / gamma)
    return (x * 255.0 + 0.5).astype(np.uint8)


def write_png(path: str, img: np.ndarray):
    """img: (H, W, 3) uint8 (use tonemap() for HDR input)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = tonemap(img)
    h, w = img.shape[:2]
    if img.ndim == 2:
        img = img[:, :, None].repeat(3, axis=2)

    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))
