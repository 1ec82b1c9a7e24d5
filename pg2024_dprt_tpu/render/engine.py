"""Single-device render driver: frame -> spp -> bounce loops.

TPU port of `Renderer::launch`/`runSample`
(/root/reference/src/render/renderer.cpp:1457-2070) for one partition. The
multi-partition driver (parallel/distributed.py) wraps the same stages in
shard_map; this module is both the 1-device fast path and the oracle for the
"N-partition == 1-partition" equivalence test (SURVEY.md §4d).

Per bounce (mirrors runSample, renderer.cpp:1530-1570, with worldSize == 1 so
the migration loop degenerates):
  1. traverse: closest hit of every live path against local geometry
  2. shade:    env-on-miss, BSDF sample, next paths + NEE shadow paths
  3. occlude:  shadow paths vs local geometry; unoccluded add their
               contribution / shadow_path_count to the direct image
               (/root/reference/optix/shadow_ray_kernel.cu:344-349)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from ..ops.trace_api import trace_closest_cutout as trace_closest, trace_occlusion_cutout as trace_occlusion
from ..scene.geometry import DeviceScene
from ..scene.lights import EnvironmentMap, LightTable
from .config import RenderConfig
from .pathgen import generate_camera_paths
from .shade import shade


def _fused_active(scene, lights, env, cfg: RenderConfig) -> bool:
    """Static gate for the whole-sample megakernel (ops/pallas_frame.py):
    "on" forces it (interpret mode off-accelerator); "auto" requires an
    accelerator backend, a resident-family tracer selection, and a scene
    within the kernel's static limits."""
    from ..ops.pallas_frame import fused_frame_supported

    return cfg.fused_frame == "on" or (
        cfg.fused_frame == "auto"
        and jax.default_backend() != "cpu"
        and cfg.tracer in ("auto", "resident")
        and fused_frame_supported(scene, lights, env, cfg)
    )


_SCOPED_FALLBACK = {}


def render_sample(scene, lights, env, camera, sample_count,
                  cfg: RenderConfig):
    """Public entry: the jitted sample program below, with the same
    self-healing scoped-VMEM AOT fallback as ops/pallas_resident.py —
    giant-cluster scenes (c=2048, e.g. 33.5M effective instanced
    triangles) push the trace kernel's Mosaic compiler stack past the
    default 16 MiB carve-out INSIDE the whole-sample program, so on that
    failure the program is lowered once with the limit raised and cached
    per (scene shape, cfg) signature."""
    if any(isinstance(x, jax.core.Tracer)
           for x in jax.tree.leaves((scene, lights, env, camera))):
        return _render_sample_jit(scene, lights, env, camera, sample_count,
                                  cfg)
    key = (scene.num_clusters, scene.tris_per_cluster,
           getattr(scene, "cl_xf", None) is not None, cfg)
    fb = _SCOPED_FALLBACK.get(key)
    sc = jnp.asarray(sample_count, jnp.int32)
    if fb is not None:
        try:
            return fb(scene, lights, env, camera, sc)
        except TypeError:
            pass
    try:
        return _render_sample_jit(scene, lights, env, camera, sc, cfg)
    except Exception as e:  # pragma: no cover (chip-compiler path)
        msg = str(e)
        if not ("Scoped allocation" in msg or "scoped vmem" in msg
                or ("remote_compile" in msg and "500" in msg)):
            raise
        import time as _time

        lowered = _render_sample_jit.lower(scene, lights, env, camera, sc,
                                           cfg)
        for attempt in range(3):
            try:
                compiled = lowered.compile(compiler_options={
                    "xla_tpu_scoped_vmem_limit_kib": 24576})
                break
            except Exception:
                if attempt == 2:
                    raise e
                _time.sleep(2.0)
        _SCOPED_FALLBACK[key] = compiled
        return compiled(scene, lights, env, camera, sc)


@partial(jax.jit, static_argnames=("cfg",))
def _render_sample_jit(
    scene: DeviceScene,
    lights: LightTable,
    env: EnvironmentMap,
    camera: Camera,
    sample_count,
    cfg: RenderConfig,
):
    """One spp: returns (direct_image, env_image, diag) — the images are
    (npix, 3) accumulators; diag counts rays whose result may be affected by
    tracer budget residue (0 in a healthy render; see ops/trace_api.py)."""
    from ..ops.pallas_frame import render_sample_fused

    if _fused_active(scene, lights, env, cfg):
        return render_sample_fused(scene, lights, env, camera, sample_count, cfg)

    npix = cfg.frame_buffer_size
    paths = generate_camera_paths(camera, sample_count)
    direct = jnp.zeros((npix, 3), jnp.float32)
    env_img = jnp.zeros((npix, 3), jnp.float32)

    def bounce_body(bounce, carry, sort_rays, rr=False):
        paths, direct, env_img, diag = carry
        live = paths.is_valid

        hits, d1 = trace_closest(
            scene, paths.origin, paths.direction, cfg.t_epsilon, paths.tmax, live,
            tracer=cfg.tracer, sort_rays=sort_rays,
        )

        next_paths, shadow_paths, env_add = shade(
            scene,
            lights,
            env,
            paths,
            hits,
            sample_count,
            bounce,
            cfg.shadow_path_count,
            npix,
            nee_mode=cfg.nee_mode,
            rr=rr,
        )
        env_img = env_img + env_add

        # Shadow occlusion vs local geometry. tmax is shaved slightly so the
        # light sample point itself never registers as a blocker.
        occluded, d2 = trace_occlusion(
            scene,
            shadow_paths.origin,
            shadow_paths.direction,
            cfg.t_epsilon,
            shadow_paths.tmax * (1.0 - 1e-3),
            shadow_paths.is_valid,
            tracer=cfg.tracer,
            sort_rays=sort_rays,
        )
        unoccluded = shadow_paths.is_valid & (~occluded)
        contrib = jnp.where(
            unoccluded[:, None],
            shadow_paths.throughput / cfg.shadow_path_count,
            0.0,
        )
        direct = direct + jax.ops.segment_sum(
            contrib, shadow_paths.pixel_index, num_segments=npix
        )
        return next_paths, direct, env_img, diag + d1 + d2

    # Sort policy (measured on the real chip, scripts/ab_bounce_sort.py and
    # scripts/sweep_occl.py): path-traced wavefronts KEEP PIXEL ORDER at
    # every bounce.  Adjacent pixels' paths stay spatially adjacent after a
    # bounce (origins = parent hit points) and NEE directions converge on
    # the lights, so pixel-order tiles inherit the parents' frustum
    # coherence — the morton sort both costs its fixed dependent-launch
    # latency AND produces WORSE tiles (b1 closest 7.6 -> 5.8 ms, b1 shadow
    # 25 -> 9.6 ms).  Sorting remains essential only for genuinely
    # unstructured wavefronts (random control: 20 vs 74 ms), e.g. migrated
    # arrivals in the distributed loop (parallel/distributed.py).
    carry = (paths, direct, env_img, jnp.int32(0))
    for bounce in range(cfg.bounces):
        rr = bool(cfg.russian_roulette) and \
            cfg.russian_roulette <= bounce + 1 < cfg.bounces
        carry = bounce_body(jnp.int32(bounce), carry, sort_rays=False, rr=rr)
    paths, direct, env_img, diag = carry
    return direct, env_img, diag


def render_image(scene, lights, env, camera, cfg: RenderConfig, base_sample: int = 0,
                 return_stats: bool = False):
    """Full frame: average over spp. Returns (height, width, 3) float32, or
    (image, stats) with stats = {"tracer_diag": int} when return_stats.

    On the megakernel path ALL spp run in ONE kernel launch (the grid's
    inner dim; ops/pallas_frame.render_frame_fused)."""
    from ..ops.pallas_frame import render_frame_fused

    npix = cfg.frame_buffer_size
    if _fused_active(scene, lights, env, cfg):
        direct, env_img, diag = render_frame_fused(
            scene, lights, env, camera, base_sample, cfg, spp=cfg.spp)
    else:
        direct = jnp.zeros((npix, 3), jnp.float32)
        env_img = jnp.zeros((npix, 3), jnp.float32)
        diag = jnp.int32(0)
        for s in range(cfg.spp):
            d, e, dg = render_sample(scene, lights, env, camera, base_sample + s, cfg)
            direct = direct + d
            env_img = env_img + e
            diag = diag + dg
    img = ((direct + env_img) / cfg.spp).reshape(cfg.height, cfg.width, 3)
    if return_stats:
        return img, {"tracer_diag": int(diag)}
    return img


class Renderer:
    """Convenience object bundling scene + lights + env + camera + config
    (the `moana::Renderer` role, /root/reference/src/render/renderer.cpp:1576)."""

    def __init__(self, scene: DeviceScene, lights: LightTable, env: EnvironmentMap,
                 camera: Camera, cfg: RenderConfig):
        self.scene = scene
        self.lights = lights
        self.env = env
        self.camera = camera
        self.cfg = cfg

    def render(self, base_sample: int = 0):
        return render_image(self.scene, self.lights, self.env, self.camera, self.cfg, base_sample)
