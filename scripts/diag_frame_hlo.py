"""Count entry-computation ops of the compiled 256x256 frame (launch count
is THE cost on this backend — CLAUDE.md).  Prints the op-category histogram
and the largest repeated op shapes.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/diag_frame_hlo.py
"""
import collections
import re

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.render import RenderConfig
from pg2024_dprt_tpu.render.engine import render_sample
from pg2024_dprt_tpu.scene import device_scene_from_meshes, random_tri_soup
from pg2024_dprt_tpu.scene.lights import EnvironmentMap, LightTable


def main():
    size = 256
    cfg = RenderConfig(width=size, height=size, spp=1, bounces=4)
    mesh = random_tri_soup(65536, seed=0)
    scene = device_scene_from_meshes([mesh], tris_per_cluster=512)
    light_tris = np.asarray(
        [[[0.3, 2.0, 0.3], [0.7, 2.0, 0.3], [0.7, 2.0, 0.7]]], np.float32)
    lights = LightTable.from_arrays(
        light_tris, np.asarray([[60.0, 60.0, 60.0]], np.float32))
    env = EnvironmentMap.constant((0.4, 0.5, 0.7))
    camera = Camera.look_at([0.5, 0.5, 3.0], [0.5, 0.5, 0.5], [0, 1, 0],
                            45.0, size, size)

    fn = jax.jit(lambda sc, s: render_sample(sc, lights, env, camera, s, cfg))
    txt = fn.lower(scene, 0).compile().as_text()

    entry = txt.split("ENTRY", 1)[1] if "ENTRY" in txt else txt
    entry = entry.split("\n}", 1)[0]
    hist = collections.Counter()
    shapes = collections.Counter()
    for line in entry.splitlines():
        m = re.match(r"\s*(%?[\w.-]+) = ([a-z0-9_]+)\[?", line.strip())
        if not m or "=" not in line:
            continue
        sm = re.match(r"\s*%?[\w.-]+ = (\S+?) ([a-z0-9_-]+)", line.strip())
        if sm:
            op = sm.group(2)
            hist[op] += 1
            if op in ("fusion", "copy", "custom-call"):
                shapes[(op, sm.group(1))] += 1
    total = sum(hist.values())
    print(f"entry ops: {total}")
    for op, n in hist.most_common(15):
        print(f"  {op:20s} {n}")
    print("\nlargest fusion/copy shapes:")
    for (op, shp), n in shapes.most_common(20):
        print(f"  {n:4d} x {op:12s} {shp}")


if __name__ == "__main__":
    main()
