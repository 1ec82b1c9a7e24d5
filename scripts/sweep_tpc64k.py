"""Cluster-width sweep at 64k-triangle scale: tpc in {128, 256, 512}.

Motivation: at 1M-tri scale the adaptive 512-tri clusters beat 128 for
sorted-incoherent wavefronts (103 -> 62 ms), and the frame megakernel
measured tpc=512 ~30% faster than tpc=128 at 64k — yet the bench-suite
64k trace rows still pack at tpc=128 (the round-2-early sweep only covered
tpc in {64, 128}).  This script settles whether bigger clusters win the
standalone 64k rows too.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/sweep_tpc64k.py
"""
import json

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.ops.pallas_resident import trace_resident
from pg2024_dprt_tpu.scene import device_scene_from_meshes, random_tri_soup
from pg2024_dprt_tpu.utils.benchmarking import chained_time


def camera_rays(n, side):
    cam = Camera.look_at([0.5, 0.5, 3.0], [0.5, 0.5, 0.5], [0, 1, 0], 45.0, side, side)
    bs = 16
    ids = np.arange(n)
    by, bx = ids // (side * bs), ids % (side * bs)
    blk, inner = bx // (bs * bs), bx % (bs * bs)
    pix = jnp.asarray(((by * bs + inner // bs) * side + (blk * bs + inner % bs)).astype(np.int32))
    return cam.generate_rays(pix // side, pix % side, jnp.zeros(n), jnp.zeros(n))


def main():
    n = 65536
    co, cd = camera_rays(n, 256)
    rng = np.random.RandomState(1)
    ro = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    rd = rng.randn(n, 3).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
    tmx = jnp.full((n,), 3.4e38, jnp.float32)
    act = jnp.ones((n,), bool)

    def t_cam(o, d, tmx, act, sc):
        return trace_resident(sc, o, d, 1e-3, tmx, act, tile_rays=128)[0].t

    def t_sorted(o, d, tmx, act, sc):
        return trace_resident(sc, o, d, 1e-3, tmx, act, tile_rays=128,
                              sort_rays=True)[0].t

    def t_occl(o, d, tmx, act, sc):
        return trace_resident(sc, o, d, 1e-3, tmx, act, tile_rays=128,
                              any_hit=True)[0].astype(jnp.float32)

    for tpc in (128, 256, 512):
        scene = device_scene_from_meshes([random_tri_soup(65536, seed=0)],
                                         tris_per_cluster=tpc)
        for name, fn, o, d in (("camera", t_cam, co, cd),
                               ("incoherent", t_sorted, ro, rd),
                               ("anyhit", t_occl, co, cd)):
            per = chained_time(fn, o, d, tmx, act, scene)
            print(json.dumps({"tpc": tpc, "wavefront": name,
                              "ms": round(per * 1e3, 3),
                              "mrays": round(n / per / 1e6, 2)}), flush=True)


if __name__ == "__main__":
    main()
