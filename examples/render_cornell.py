"""Render the cornell test scene to EXR, single-device and distributed.

Usage: python examples/render_cornell.py [out_dir] [size] [spp] [parts]
"""
import sys

import jax

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.models import random_proxy_models
from pg2024_dprt_tpu.render import RenderConfig
from pg2024_dprt_tpu.render.frames import render_frames
from pg2024_dprt_tpu.scene import build_partitioned_scene, cornell_box, device_scene_from_meshes
from pg2024_dprt_tpu.scene.lights import EnvironmentMap
from pg2024_dprt_tpu.utils.timing import Timing


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cornell"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    spp = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    parts = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    meshes, lights = cornell_box()
    env = EnvironmentMap.constant((0.15, 0.2, 0.3))
    camera = Camera.look_at([0.5, 0.5, 2.4], [0.5, 0.5, 0.0], [0, 1, 0], 40.0, size, size)
    cfg = RenderConfig(width=size, height=size, spp=spp, bounces=4)
    timing = Timing()

    if parts > 1:
        from pg2024_dprt_tpu.parallel import make_mesh

        part = build_partitioned_scene(meshes, parts)
        mesh = make_mesh(parts)
        models = random_proxy_models(jax.random.PRNGKey(0), parts)
        imgs = render_frames(
            None, lights, env, camera, cfg, out_dir=out, timing=timing,
            distributed=(part, models, mesh),
        )
    else:
        scene = device_scene_from_meshes(meshes)
        imgs = render_frames(scene, lights, env, camera, cfg, out_dir=out, timing=timing)

    print(timing.report())
    print(f"wrote {len(imgs)} frame(s) to {out}; mean luminance "
          f"{float(imgs[0].mean()):.4f}")


if __name__ == "__main__":
    main()
