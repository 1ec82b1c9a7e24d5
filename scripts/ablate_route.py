"""Decompose route_fused time: bare trace vs p=1 vs p=8 NN share.

PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ablate_route.py [n] [width]
"""
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from pg2024_dprt_tpu.models.mlp import MLPConfig
from pg2024_dprt_tpu.models.proxy import random_proxy_models
from pg2024_dprt_tpu.ops.pallas_resident import trace_resident
from pg2024_dprt_tpu.ops.pallas_route import route_fused
from pg2024_dprt_tpu.scene import device_scene_from_meshes, random_tri_soup
from pg2024_dprt_tpu.scene.geometry import ProxyTable
from pg2024_dprt_tpu.utils.benchmarking import chained_time


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    scene = device_scene_from_meshes(
        [random_tri_soup(65536, seed=0)], tris_per_cluster=128)
    rng = np.random.RandomState(2)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    tmx = jnp.full((n,), 3.4e38, jnp.float32)
    act = jnp.ones((n,), bool)

    def t_trace(o, d, tmx, act, sc):
        return trace_resident(sc, o, d, 1e-3, tmx, act, sort_rays=True,
                              rich=False)[0].t

    per = chained_time(t_trace, o, d, tmx, act, scene, short=1, long=4,
                       reps=2)
    print(f"bare trace (cluster sort): {per*1e3:7.2f} ms", flush=True)

    offs8 = np.asarray(
        [[-1.05, 0, 0], [1.05, 0, 0], [0, -1.05, 0], [0, 1.05, 0],
         [0, 0, -1.05], [0, 0, 1.05], [-1.05, -1.05, 0], [1.05, 1.05, 0]],
        np.float32)
    cfg = MLPConfig(width=width, depth=2)
    for p in (1, 8):
        offs = offs8[:p]
        proxies = ProxyTable(
            aabb_min=jnp.asarray(offs), aabb_max=jnp.asarray(offs + 1.0),
            max_length=jnp.asarray(np.full(p, 3 ** 0.5, np.float32)))
        models = random_proxy_models(jax.random.PRNGKey(1), p, cfg, cfg)

        for mh in (1, 4):
            def f(o, d, tmx, act, proxies=proxies, models=models, mh=mh):
                dd = route_fused(scene, proxies, models, o, d, 1e-3, tmx,
                                 act, jnp.int32(0), mh, 1e-4)
                return dd["new_t"]

            per = chained_time(f, o, d, tmx, act, short=1, long=4, reps=2)
            print(f"route p={p} max_hits={mh} width={width}: "
                  f"{per*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
