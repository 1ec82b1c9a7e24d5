"""Camera path generation — TPU port of the PathGen pipeline
(/root/reference/optix/path_gen_kernel.cu:46-105): one path per pixel with
TEA-seeded sub-pixel jitter, throughput 1, tMax = +inf, currentNode = -1.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.camera import Camera
from ..core.rng import rnd2, tea
from ..core.types import PathState


def tiled_pixel_order_np(width: int, height: int, block: int = 16):
    """Pixel ids in block-major (block x block) order, as a host numpy array
    (static per (w, h) — safe to consume under jit tracing). Ray buffers
    ordered this way give the tile tracer spatially coherent tiles;
    accumulation is unaffected because paths carry their pixel_index."""
    import numpy as np

    if width % block or height % block:
        return np.arange(width * height, dtype=np.int32)
    ids = np.arange(width * height)
    by, bx = ids // (width * block), ids % (width * block)
    blk, inner = bx // (block * block), bx % (block * block)
    rows = by * block + inner // block
    cols = blk * block + inner % block
    return (rows * width + cols).astype(np.int32)


def tiled_pixel_order(width: int, height: int, block: int = 16) -> jnp.ndarray:
    """Traced form of `tiled_pixel_order_np`: pure jnp integer arithmetic,
    so programs that embed the order carry NO hoisted (W*H,) constant —
    hidden executable const-params break AOT Compiled calls and were
    implicated in jit fast-path buffer-count corruption
    (parallel/distributed.py docstring)."""
    if width % block or height % block:
        return jnp.arange(width * height, dtype=jnp.int32)
    ids = jnp.arange(width * height, dtype=jnp.int32)
    by, bx = ids // (width * block), ids % (width * block)
    blk, inner = bx // (block * block), bx % (block * block)
    rows = by * block + inner // block
    cols = blk * block + inner % block
    return rows * width + cols


def generate_camera_paths(camera: Camera, sample_count, tile_block: int = 16) -> PathState:
    """Generate width*height camera paths for one sample (spp iteration)."""
    w, h = camera.width, camera.height
    n = w * h
    pixel_index = tiled_pixel_order(w, h, tile_block)
    rows = pixel_index // w
    cols = pixel_index % w

    seed = tea(pixel_index.astype(jnp.uint32), jnp.uint32(sample_count))
    _, xi1, xi2 = rnd2(seed)

    origin, direction = camera.generate_rays(rows, cols, xi1, xi2)

    return PathState(
        origin=origin,
        direction=direction,
        tmax=jnp.full((n,), jnp.float32(3.402823466e38)),
        throughput=jnp.ones((n, 3), jnp.float32),
        pixel_index=pixel_index,
        shadow_path_id=jnp.full((n,), -1, jnp.int32),
        visited_mask=jnp.zeros((n,), jnp.uint32),
        current_node=jnp.full((n,), -1, jnp.int32),
        target_node=jnp.full((n,), -1, jnp.int32),
        is_shadow=jnp.zeros((n,), bool),
        is_delta=jnp.zeros((n,), bool),
        is_valid=jnp.ones((n,), bool),
        is_hit=jnp.zeros((n,), bool),
        hit_tri=jnp.full((n,), -1, jnp.int32),
        hit_u=jnp.zeros((n,), jnp.float32),
        hit_v=jnp.zeros((n,), jnp.float32),
    )
