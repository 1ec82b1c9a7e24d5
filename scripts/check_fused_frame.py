"""A-B the whole-sample megakernel (interpret mode) against the composed
render_sample across edge cases: padding, water BSDF, multi-light,
non-constant rotated env map, bounce counts.

Usage: JAX_PLATFORMS=cpu python scripts/check_fused_frame.py
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.render import RenderConfig
from pg2024_dprt_tpu.render.engine import render_sample
from pg2024_dprt_tpu.ops.pallas_frame import render_sample_fused, fused_frame_supported
from pg2024_dprt_tpu.scene import cornell_box, device_scene_from_meshes
from pg2024_dprt_tpu.scene.lights import EnvironmentMap, LightTable


def compare(tag, scene, lights, env, camera, cfg, sample=0, tol=2e-3):
    d0, e0, _ = render_sample(scene, lights, env, camera, sample, cfg)
    d1, e1, _ = render_sample_fused(scene, lights, env, camera, sample, cfg,
                                    interpret=True)
    ok = True
    for name, a, b in (("direct", np.asarray(d0), np.asarray(d1)),
                       ("env", np.asarray(e0), np.asarray(e1))):
        err = np.abs(a - b)
        rel = err / np.maximum(np.abs(a), 1e-2)
        bad = rel.max() > tol
        ok &= not bad
        print(f"{tag:28s} {name:6s} mean={a.mean():.6f}/{b.mean():.6f} "
              f"max_abs={err.max():.3e} max_rel={rel.max():.3e} "
              f"{'FAIL' if bad else 'ok'}")
    return ok


def main():
    ok = True

    # 1. diffuse cornell, constant env, 3 bounces
    meshes, lights = cornell_box()
    scene = device_scene_from_meshes(meshes)
    env = EnvironmentMap.constant((0.2, 0.3, 0.4))
    cam32 = Camera.look_at([0.5, 0.5, 2.4], [0.5, 0.5, 0.0], [0, 1, 0],
                           40.0, 32, 32)
    cfg = RenderConfig(width=32, height=32, spp=1, bounces=3,
                       fused_frame="off", tracer="stackless")
    assert fused_frame_supported(scene, lights, env, cfg)
    ok &= compare("cornell/b3", scene, lights, env, cam32, cfg)

    # 2. water box (dielectric BSDF, delta paths skip NEE)
    meshes_w, lights_w = cornell_box(with_water_sphere=True)
    scene_w = device_scene_from_meshes(meshes_w)
    ok &= compare("water/b3", scene_w, lights_w, env, cam32, cfg, sample=3)

    # 3. non-divisible frame (24x24 = 576 rays -> tile padding) + 1 bounce
    cam24 = Camera.look_at([0.5, 0.5, 2.4], [0.5, 0.5, 0.0], [0, 1, 0],
                           40.0, 24, 24)
    cfg24 = RenderConfig(width=24, height=24, spp=1, bounces=1,
                         fused_frame="off", tracer="stackless")
    ok &= compare("pad24/b1", scene, lights, env, cam24, cfg24, sample=7)

    # 4. multi-light table (one-hot light selection path)
    tris = np.asarray([
        [[0.3, 0.99, 0.3], [0.7, 0.99, 0.3], [0.7, 0.99, 0.7]],
        [[0.1, 0.99, 0.1], [0.3, 0.99, 0.1], [0.3, 0.99, 0.3]],
        [[0.7, 0.99, 0.7], [0.9, 0.99, 0.7], [0.9, 0.99, 0.9]],
    ], np.float32)
    lights3 = LightTable.from_arrays(
        tris, np.asarray([[40, 40, 40], [10, 30, 10], [30, 10, 10]],
                         np.float32))
    ok &= compare("lights3/b2", scene, lights3, env,
                  cam32, RenderConfig(width=32, height=32, spp=1, bounces=2,
                                      fused_frame="off", tracer="stackless"),
                  sample=11)

    # 5. rotated lat-long env map (polynomial atan2/acos path)
    rng = np.random.default_rng(0)
    img = (rng.uniform(0.0, 1.0, (16, 32, 3)).astype(np.float32)) ** 2 * 2.0
    env_ll = EnvironmentMap.from_image(img, rotation_offset=2.007)
    ok &= compare("envmap/b2", scene, lights, env_ll, cam32,
                  RenderConfig(width=32, height=32, spp=1, bounces=2,
                               fused_frame="off", tracer="stackless"),
                  sample=5, tol=5e-3)

    print("ALL OK" if ok else "FAILURES")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
