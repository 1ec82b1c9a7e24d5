"""Emissive triangle lights + lat-long environment map.

Replaces the reference's hardcoded per-scene light tables
(/root/reference/src/render/renderer.cpp:1725-1808) and the env-texture path
(/root/reference/src/cuda/environment_light.cu:13-61). Lights are a small
replicated table; env lookup is a bilinear gather implemented in jnp (TPU has
no texture units — a fused gather is the native equivalent).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core.math import cartesian_to_spherical


class LightTable(NamedTuple):
    p0: jnp.ndarray        # (L,3) f32
    p1: jnp.ndarray        # (L,3)
    p2: jnp.ndarray        # (L,3)
    radiance: jnp.ndarray  # (L,3) Le

    @property
    def count(self) -> int:
        return self.p0.shape[0]

    @staticmethod
    def from_arrays(tris, radiance) -> "LightTable":
        tris = np.asarray(tris, np.float32)  # (L,3,3)
        return LightTable(
            p0=jnp.asarray(tris[:, 0]),
            p1=jnp.asarray(tris[:, 1]),
            p2=jnp.asarray(tris[:, 2]),
            radiance=jnp.asarray(np.asarray(radiance, np.float32)),
        )


class EnvironmentMap(NamedTuple):
    """Lat-long radiance map. `rotation_offset` rotates azimuth (the reference
    bakes 115 deg for its scenes, /root/reference/src/cuda/environment_light.cu:11)."""

    image: jnp.ndarray           # (H, W, 3) f32
    rotation_offset: jnp.ndarray  # scalar radians

    @staticmethod
    def constant(color, h: int = 4, w: int = 8, rotation_offset: float = 0.0) -> "EnvironmentMap":
        img = np.broadcast_to(np.asarray(color, np.float32), (h, w, 3)).copy()
        return EnvironmentMap(jnp.asarray(img), jnp.float32(rotation_offset))

    @staticmethod
    def from_image(img: np.ndarray, rotation_offset: float = 0.0) -> "EnvironmentMap":
        return EnvironmentMap(jnp.asarray(img, jnp.float32), jnp.float32(rotation_offset))

    def sample(self, directions: jnp.ndarray) -> jnp.ndarray:
        """Bilinear lookup of radiance for (N,3) directions -> (N,3).

        Matches the reference lookup: u = phi/2pi (after rotation, wrapped),
        v = theta/pi (/root/reference/optix/kernel.cu:28-48)."""
        phi, theta = cartesian_to_spherical(directions)
        phi = phi + self.rotation_offset
        phi = jnp.where(phi > 2.0 * jnp.pi, phi - 2.0 * jnp.pi, phi)
        u = phi / (2.0 * jnp.pi)
        v = theta / jnp.pi

        h, w = self.image.shape[0], self.image.shape[1]
        x = u * w - 0.5
        y = v * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[:, None]
        fy = (y - y0)[:, None]
        x0i = jnp.mod(x0.astype(jnp.int32), w)
        x1i = jnp.mod(x0i + 1, w)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
        y1i = jnp.clip(y0i + 1, 0, h - 1)

        img = self.image
        c00 = img[y0i, x0i]
        c01 = img[y0i, x1i]
        c10 = img[y1i, x0i]
        c11 = img[y1i, x1i]
        return (
            c00 * (1 - fx) * (1 - fy)
            + c01 * fx * (1 - fy)
            + c10 * (1 - fx) * fy
            + c11 * fx * fy
        )
