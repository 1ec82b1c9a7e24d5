"""Frame-sequence driver: the full `Renderer::launch` loop
(/root/reference/src/render/renderer.cpp:1938-2060): per-frame animation,
spp accumulation, timing sections, EXR output."""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from ..utils.exr import write_exr
from ..utils.timing import TimedSection, Timing
from .animation import animate_lights, dolly_camera
from .config import RenderConfig
from .engine import render_image


def render_frames(
    scene,
    lights,
    env,
    camera,
    cfg: RenderConfig,
    num_frames: int = 1,
    out_dir: Optional[str] = None,
    light_velocity=None,
    camera_velocity=None,
    timing: Optional[Timing] = None,
    distributed=None,  # (partitioned, models, mesh) -> multi-partition path
):
    """Render `num_frames` frames; returns list of (H, W, 3) numpy images.
    Saves `frame{i}.exr` into out_dir when given (renderer.cpp:2053-2059)."""
    timing = timing or Timing()
    images = []
    for frame in range(num_frames):
        f_lights = animate_lights(lights, frame, light_velocity) if light_velocity else lights
        f_camera = dolly_camera(camera, frame, camera_velocity) if camera_velocity else camera

        with timing.section(TimedSection.Sample):
            if distributed is not None:
                from ..parallel.distributed import render_image_distributed

                partitioned, models, mesh = distributed
                img = render_image_distributed(
                    partitioned, models, f_lights, env, f_camera, cfg, mesh,
                    base_sample=frame * cfg.spp,
                )
            else:
                img = render_image(
                    scene, f_lights, env, f_camera, cfg, base_sample=frame * cfg.spp
                )
            jax.block_until_ready(img)

        img_np = np.asarray(img)
        images.append(img_np)
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            write_exr(os.path.join(out_dir, f"frame{frame}.exr"), img_np)
    return images
