"""Pinhole camera.

The reference camera (`moana/core/camera.hpp`) is not in the snapshot; only its
call pattern survives: `params.camera.generateRay(row, col, {xi1, xi2})` with
sub-pixel jitter (/root/reference/optix/path_gen_kernel.cu:54-61). This is a
standard look-at pinhole camera with vertical FOV, generating one ray per
(row, col) pixel, vectorized over the whole image.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .math import normalize


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    origin: jnp.ndarray      # (3,)
    forward: jnp.ndarray     # (3,) unit
    right: jnp.ndarray       # (3,) unit
    up: jnp.ndarray          # (3,) unit
    tan_half_fov: jnp.ndarray  # scalar
    # static metadata (not traced): image resolution
    width: int = dataclasses.field(metadata=dict(static=True), default=0)
    height: int = dataclasses.field(metadata=dict(static=True), default=0)

    @staticmethod
    def look_at(origin, target, up, fov_degrees: float, width: int, height: int) -> "Camera":
        origin = jnp.asarray(origin, jnp.float32)
        target = jnp.asarray(target, jnp.float32)
        up = jnp.asarray(up, jnp.float32)
        forward = normalize(target - origin)
        right = normalize(jnp.cross(forward, up))
        true_up = jnp.cross(right, forward)
        tan_half_fov = jnp.tan(jnp.deg2rad(jnp.float32(fov_degrees)) * 0.5)
        return Camera(origin, forward, right, true_up, tan_half_fov, width, height)

    def generate_rays(self, rows, cols, xi1, xi2):
        """Rays through pixel centers jittered by (xi1, xi2) in [0,1).

        rows/cols are int arrays (row 0 = top of image). Returns
        (origins (N,3), directions (N,3))."""
        aspect = self.width / self.height
        # NDC in [-1, 1], y flipped so row 0 is the top scanline.
        px = (cols.astype(jnp.float32) + xi1) / self.width * 2.0 - 1.0
        py = 1.0 - (rows.astype(jnp.float32) + xi2) / self.height * 2.0
        d = (
            self.forward[None, :]
            + px[:, None] * (self.tan_half_fov * aspect) * self.right[None, :]
            + py[:, None] * self.tan_half_fov * self.up[None, :]
        )
        directions = normalize(d)
        origins = jnp.broadcast_to(self.origin, directions.shape)
        return origins, directions
