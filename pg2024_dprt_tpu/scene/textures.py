"""Albedo texture pipeline.

Replaces the reference's per-mesh PNG/EXR -> pitched CUDA texture loop
(/root/reference/src/render/renderer.cpp:1613-1723). TPUs have no texture
units, so textures live in ONE flat packed texel buffer at their NATIVE
resolutions (per-texture offset/height/width tables) and are sampled with a
vectorized bilinear gather (wrap addressing, matching the reference's
cudaAddressModeWrap + bilinear filter setup; large-index gathers are fast on
this backend).  Textures larger than `max_res` are box-filtered down to it;
everything else keeps full fidelity.  The alpha channel drives the cutout
test of the reference anyhit programs (opacity < 0.05 -> ignore hit,
/root/reference/optix/kernel.cu:349-355).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

MAX_TEXTURE_RES = 2048

# static limits of the Pallas-kernel texel pool (pallas_frame.py in-kernel
# texture fetch): scanline rows must fit the per-tile one-hot row matrix,
# the pool itself must fit the VMEM budget next to the trace tables
POOL_ROWS_LIMIT = 2048
POOL_BYTES_LIMIT = 6 * 2**20


class PackedTextures(NamedTuple):
    """Flat texel pool + per-texture geometry tables (a jax pytree)."""

    texels: jnp.ndarray   # (T, 4) f32 RGBA, row-major per texture
    offset: jnp.ndarray   # (NT,) i32 start row in texels
    height: jnp.ndarray   # (NT,) i32
    width: jnp.ndarray    # (NT,) i32
    # indices of textures with any alpha < 0.05 — its SHAPE is the static
    # has-cutout signal (shape survives jit tracing; a bool field would not),
    # so fully-opaque texture pools statically skip the cutout re-trace loop
    cutout_rows: jnp.ndarray
    # Pallas-kernel pool (pallas_frame.py): every texture's scanlines
    # stacked into (R, 3*Wmax) with channel-major lanes
    # (pool[r, c*Wmax + x] = channel c of texel (row r, col x)), so the
    # megakernel fetches a bilinear sample as ONE fy-weighted two-hot MXU
    # row extraction + an fx-weighted two-tap column mix on the VPU.
    # None when the pool exceeds the static kernel limits (the engine then
    # takes the composed pipeline).  pool_meta (8, NTp) f32 rows:
    # [row_offset, height, width, 0...] per texture, lane-padded.
    pool: jnp.ndarray = None
    pool_meta: jnp.ndarray = None

    @property
    def count(self) -> int:
        return self.offset.shape[0]

    @property
    def has_cutout(self) -> bool:
        return self.cutout_rows.shape[0] > 0


def _box_down(img: np.ndarray, max_res: int) -> np.ndarray:
    """Integer box-filter an (H, W, C) image down until both dims <= max_res."""
    while img.shape[0] > max_res or img.shape[1] > max_res:
        h, w = img.shape[:2]
        h2, w2 = (h + 1) // 2, (w + 1) // 2
        pad_h, pad_w = h2 * 2 - h, w2 * 2 - w
        if pad_h or pad_w:
            img = np.pad(img, ((0, pad_h), (0, pad_w), (0, 0)), mode="edge")
        img = (
            img[0::2, 0::2] + img[1::2, 0::2] + img[0::2, 1::2] + img[1::2, 1::2]
        ) * 0.25
    return img


def build_textures(images, max_res: int = MAX_TEXTURE_RES) -> PackedTextures:
    """Pack (H, W, 3|4) float arrays into a PackedTextures pool at native
    resolution (box-downsampled only past `max_res`; alpha defaults to 1)."""
    if not images:
        z = np.zeros((0,), np.int32)
        return PackedTextures(
            texels=jnp.zeros((0, 4), jnp.float32),
            offset=jnp.asarray(z), height=jnp.asarray(z), width=jnp.asarray(z),
            cutout_rows=jnp.asarray(z),
        )
    rows, offs, hs, ws, cut = [], [], [], [], []
    pos = 0
    for i, img in enumerate(images):
        img = np.asarray(img, np.float32)
        if img.ndim == 2:
            img = img[:, :, None].repeat(3, axis=2)
        img = _box_down(img, max_res)
        h, w = img.shape[:2]
        rgba = np.ones((h, w, 4), np.float32)
        rgba[:, :, : min(img.shape[2], 4)] = img[:, :, :4]
        if rgba[:, :, 3].min() < 0.05:
            cut.append(i)
        rows.append(rgba.reshape(h * w, 4))
        offs.append(pos)
        hs.append(h)
        ws.append(w)
        pos += h * w
    pool, pool_meta = _build_kernel_pool(rows, hs, ws)
    return PackedTextures(
        texels=jnp.asarray(np.concatenate(rows, axis=0)),
        offset=jnp.asarray(np.asarray(offs, np.int32)),
        height=jnp.asarray(np.asarray(hs, np.int32)),
        width=jnp.asarray(np.asarray(ws, np.int32)),
        cutout_rows=jnp.asarray(np.asarray(cut, np.int32)),
        pool=pool, pool_meta=pool_meta,
    )


def _build_kernel_pool(rows, hs, ws):
    """Scanline-stacked (R, 3*Wmax) pool + (8, NTp) meta for the megakernel
    texture fetch (see PackedTextures.pool).  Returns (None, None) past the
    static kernel limits."""
    wmax = -(-max(ws) // 128) * 128              # lane-aligned channel blocks
    r_total = sum(hs)
    r_pad = -(-max(r_total, 1) // 8) * 8
    if r_pad > POOL_ROWS_LIMIT or r_pad * 3 * wmax * 4 > POOL_BYTES_LIMIT:
        return None, None
    pool = np.zeros((r_pad, 3 * wmax), np.float32)
    roffs = []
    pos = 0
    for flat, h, w in zip(rows, hs, ws):
        img = flat.reshape(h, w, 4)
        for c in range(3):
            pool[pos:pos + h, c * wmax:c * wmax + w] = img[:, :, c]
        roffs.append(pos)
        pos += h
    ntp = max(8, -(-len(hs) // 8) * 8)
    meta = np.zeros((8, ntp), np.float32)
    meta[0, :len(hs)] = roffs
    meta[1, :len(hs)] = hs
    meta[2, :len(hs)] = ws
    return jnp.asarray(pool), jnp.asarray(meta)


def sample_textures(tex: PackedTextures, tex_index: jnp.ndarray,
                    u: jnp.ndarray, v: jnp.ndarray):
    """Bilinear wrap sample at native per-texture resolution.
    tex_index (N,) (entries < 0 are clamped to 0 — callers mask the result),
    u/v (N,) in texture space.  Returns (N, 4) RGBA.

    The v flip matches the reference's stbi vertical flip
    (renderer.cpp:1632)."""
    ti = jnp.maximum(tex_index, 0)
    h = jnp.take(tex.height, ti)
    w = jnp.take(tex.width, ti)
    off = jnp.take(tex.offset, ti)
    hf = h.astype(jnp.float32)
    wf = w.astype(jnp.float32)

    x = u * wf - 0.5
    y = (1.0 - v) * hf - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    x1i = jnp.mod(x0i + 1, w)
    y0i = jnp.mod(y0.astype(jnp.int32), h)
    y1i = jnp.mod(y0i + 1, h)

    def at(yi, xi):
        return jnp.take(tex.texels, off + yi * w + xi, axis=0)

    return (
        at(y0i, x0i) * (1 - fx) * (1 - fy)
        + at(y0i, x1i) * fx * (1 - fy)
        + at(y1i, x0i) * (1 - fx) * fy
        + at(y1i, x1i) * fx * fy
    )


def checkerboard(res: int = 64, color_a=(0.9, 0.9, 0.9), color_b=(0.2, 0.2, 0.2), tiles: int = 8):
    """Procedural test texture."""
    yy, xx = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    mask = ((yy * tiles // res) + (xx * tiles // res)) % 2 == 0
    img = np.where(mask[:, :, None], np.asarray(color_a, np.float32), np.asarray(color_b, np.float32))
    return img
