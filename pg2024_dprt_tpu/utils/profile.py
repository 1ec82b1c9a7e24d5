"""Per-stage wall-clock profiling of one render sample.

The reference brackets scan/MPI/NN/launch phases with `Timing` sections and
prints them (/root/reference/src/render/renderer.cpp:1245-1283, 2024-2025).
A jitted sample is one fused program, so this utility runs the single-device
stages eagerly with `block_until_ready` fences to produce the same style of
report (use for tuning; production rendering stays fully jitted)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.trace_api import trace_closest_cutout, trace_occlusion_cutout
from ..render.pathgen import generate_camera_paths
from ..render.shade import shade
from .timing import TimedSection, Timing


def profile_sample(scene, lights, env, camera, cfg, sample_count: int = 0) -> Timing:
    timing = Timing()
    npix = cfg.frame_buffer_size
    paths = generate_camera_paths(camera, sample_count)
    direct = jnp.zeros((npix, 3), jnp.float32)
    env_img = jnp.zeros((npix, 3), jnp.float32)

    for bounce in range(cfg.bounces):
        with timing.section(TimedSection.Traversal) as _:
            hits, _diag = trace_closest_cutout(
                scene, paths.origin, paths.direction, cfg.t_epsilon,
                paths.tmax, paths.is_valid, tracer=cfg.tracer,
            )
            jax.block_until_ready(hits)

        with timing.section(TimedSection.Shade):
            next_paths, shadow_paths, env_add = shade(
                scene, lights, env, paths, hits, sample_count, bounce,
                cfg.shadow_path_count, npix,
            )
            jax.block_until_ready(env_add)
        env_img = env_img + env_add

        with timing.section(TimedSection.Shadow):
            occ, _diag2 = trace_occlusion_cutout(
                scene, shadow_paths.origin, shadow_paths.direction,
                cfg.t_epsilon, shadow_paths.tmax * (1.0 - 1e-3),
                shadow_paths.is_valid, tracer=cfg.tracer,
            )
            contrib = jnp.where(
                (shadow_paths.is_valid & (~occ))[:, None],
                shadow_paths.throughput / cfg.shadow_path_count, 0.0,
            )
            direct = direct + jax.ops.segment_sum(
                contrib, shadow_paths.pixel_index, num_segments=npix
            )
            jax.block_until_ready(direct)

        paths = next_paths

    return timing
