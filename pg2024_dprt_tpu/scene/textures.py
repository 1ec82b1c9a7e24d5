"""Albedo texture pipeline.

Replaces the reference's per-mesh PNG/EXR -> pitched CUDA texture loop
(/root/reference/src/render/renderer.cpp:1613-1723). TPUs have no texture
units, so textures are resampled to one fixed-resolution RGBA atlas
(NT, R, R, 4) and sampled with a vectorized bilinear gather (wrap
addressing, matching the reference's cudaAddressModeWrap + bilinear setup).
The alpha channel drives the stochastic cutout test of the reference anyhit
programs (opacity < 0.05 -> ignore hit, /root/reference/optix/kernel.cu:349-355).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

ATLAS_RES = 128


def build_atlas(images, res: int = ATLAS_RES) -> np.ndarray:
    """Resample a list of (H, W, 3|4) float arrays to an (NT, res, res, 4)
    atlas (nearest resampling; alpha defaults to 1)."""
    if not images:
        return np.zeros((0, res, res, 4), np.float32)
    out = np.zeros((len(images), res, res, 4), np.float32)
    out[..., 3] = 1.0
    for i, img in enumerate(images):
        img = np.asarray(img, np.float32)
        if img.ndim == 2:
            img = img[:, :, None].repeat(3, axis=2)
        h, w = img.shape[:2]
        ys = (np.arange(res) * h // res).clip(0, h - 1)
        xs = (np.arange(res) * w // res).clip(0, w - 1)
        resampled = img[ys][:, xs]
        out[i, :, :, : resampled.shape[2]] = resampled[:, :, :4]
    return out


def sample_atlas(atlas: jnp.ndarray, tex_index: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Bilinear wrap sample: atlas (NT, R, R, 4), tex_index (N,) (clamped >=0
    by caller), u/v (N,) in texture space. Returns (N, 4) RGBA.

    The v flip matches the reference's stbi vertical flip
    (renderer.cpp:1632)."""
    r = atlas.shape[1]
    x = u * r - 0.5
    y = (1.0 - v) * r - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    x0i = jnp.mod(x0.astype(jnp.int32), r)
    x1i = jnp.mod(x0i + 1, r)
    y0i = jnp.mod(y0.astype(jnp.int32), r)
    y1i = jnp.mod(y0i + 1, r)

    ti = jnp.maximum(tex_index, 0)
    # flatten to one gather axis: idx = ((t * R) + y) * R + x
    flat = atlas.reshape(-1, 4)

    def at(yi, xi):
        return jnp.take(flat, (ti * r + yi) * r + xi, axis=0)

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
