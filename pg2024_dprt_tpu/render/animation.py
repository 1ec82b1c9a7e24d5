"""Per-frame light / camera animation.

Port of the reference's LIGHT_MOVE / CAMERA_MOVE frame hooks
(/root/reference/src/render/renderer.cpp:1941-1985): simple parametric motion
applied before each frame. The reference hardcodes per-scene trajectories
behind compile-time macros; here they are pure functions of the frame index.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.camera import Camera
from ..scene.lights import LightTable


def translate_lights(lights: LightTable, offset) -> LightTable:
    off = jnp.asarray(offset, jnp.float32)
    return LightTable(
        p0=lights.p0 + off, p1=lights.p1 + off, p2=lights.p2 + off,
        radiance=lights.radiance,
    )


def animate_lights(lights: LightTable, frame: int, velocity=(0.0, 0.0, 0.0)) -> LightTable:
    """LIGHT_MOVE: linear light motion, `frame * velocity` offset."""
    return translate_lights(lights, jnp.asarray(velocity, jnp.float32) * frame)


def orbit_camera(camera: Camera, frame: int, center, radius: float,
                 height: float, degrees_per_frame: float, fov_degrees: float) -> Camera:
    """CAMERA_MOVE: orbit around `center` at fixed radius/height."""
    import numpy as np

    ang = np.deg2rad(degrees_per_frame * frame)
    center = np.asarray(center, np.float32)
    eye = center + np.asarray(
        [radius * np.cos(ang), height, radius * np.sin(ang)], np.float32
    )
    return Camera.look_at(eye, center, [0, 1, 0], fov_degrees, camera.width, camera.height)


def dolly_camera(camera: Camera, frame: int, velocity=(0.0, 0.0, 0.0)) -> Camera:
    """CAMERA_MOVE: linear dolly along `velocity` per frame."""
    off = jnp.asarray(velocity, jnp.float32) * frame
    return Camera(
        origin=camera.origin + off,
        forward=camera.forward,
        right=camera.right,
        up=camera.up,
        tan_half_fov=camera.tan_half_fov,
        width=camera.width,
        height=camera.height,
    )
