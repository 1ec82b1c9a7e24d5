"""Render the large procedural city scene (terrain + buildings) to EXR.

Exercises the large-scene path end to end: adaptive cluster packing
(scene/geometry.py auto tris_per_cluster), the fused frame megakernel where
its gate admits the scene (ops/pallas_frame.py, grouped two-level dispatch
at giant K), and HBM cluster-table streaming.  The architectural stand-in
mirrors the reference's target scenes (Bistro / San Miguel / City,
/root/reference/src/render/renderer.cpp:1726-1796).

Usage: python examples/render_city.py [out_dir] [n_tris] [size] [spp]
"""
import sys

import numpy as np

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.render import RenderConfig
from pg2024_dprt_tpu.render.frames import render_frames
from pg2024_dprt_tpu.scene import city_scene, device_scene_from_meshes
from pg2024_dprt_tpu.scene.lights import EnvironmentMap, LightTable
from pg2024_dprt_tpu.utils.timing import Timing


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/city"
    n_tris = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    spp = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    mesh = city_scene(n_tris, seed=0)
    scene = device_scene_from_meshes([mesh])
    print(f"city: {mesh.num_triangles} tris, {scene.num_clusters} clusters "
          f"of {scene.tris_per_cluster}")

    # late-afternoon sun: one emissive quad high over the town + sky env
    lt = np.asarray(
        [[[0.2, 1.5, 0.2], [0.6, 1.5, 0.2], [0.6, 1.5, 0.6]],
         [[0.2, 1.5, 0.2], [0.6, 1.5, 0.6], [0.2, 1.5, 0.6]]], np.float32)
    lights = LightTable.from_arrays(
        lt, np.asarray([[60.0, 52.0, 40.0]] * 2, np.float32))
    env = EnvironmentMap.constant((0.25, 0.38, 0.62))
    # oblique aerial view across the town (terrain tops out at y=0.15)
    camera = Camera.look_at([0.3, 0.3, 1.05], [0.55, 0.03, 0.45],
                            [0, 1, 0], 50.0, size, size)
    cfg = RenderConfig(width=size, height=size, spp=spp, bounces=4)
    timing = Timing()

    imgs = render_frames(scene, lights, env, camera, cfg, out_dir=out,
                         timing=timing)
    print(timing.report())
    print(f"wrote {len(imgs)} frame(s) to {out}; mean luminance "
          f"{float(imgs[0].mean()):.4f}")


if __name__ == "__main__":
    main()
