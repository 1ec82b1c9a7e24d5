"""Fused-route megakernel on the real chip: compile check + chained timing.

Compares against the composed secondary_route timing row in
scripts/bench_suite.py (neural_route_64k).  Usage:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_route.py [n]
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from pg2024_dprt_tpu.models.mlp import MLPConfig
from pg2024_dprt_tpu.models.proxy import random_proxy_models
from pg2024_dprt_tpu.ops.pallas_route import route_fused
from pg2024_dprt_tpu.scene import device_scene_from_meshes, random_tri_soup
from pg2024_dprt_tpu.scene.geometry import ProxyTable
from pg2024_dprt_tpu.utils.benchmarking import chained_time


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    print("backend:", jax.default_backend(), flush=True)
    scene = device_scene_from_meshes(
        [random_tri_soup(65536, seed=0)], tris_per_cluster=128)
    offs = np.asarray(
        [[-1.05, 0, 0], [1.05, 0, 0], [0, -1.05, 0], [0, 1.05, 0],
         [0, 0, -1.05], [0, 0, 1.05], [-1.05, -1.05, 0], [1.05, 1.05, 0]],
        np.float32)
    proxies = ProxyTable(
        aabb_min=jnp.asarray(offs), aabb_max=jnp.asarray(offs + 1.0),
        max_length=jnp.asarray(np.full(8, 3 ** 0.5, np.float32)))
    cfg = MLPConfig(width=64, depth=2)
    models = random_proxy_models(jax.random.PRNGKey(1), 8, cfg, cfg)
    rng = np.random.RandomState(2)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    tmx = jnp.full((n,), 3.4e38, jnp.float32)
    act = jnp.ones((n,), bool)

    t0 = time.time()
    dec = route_fused(scene, proxies, models, o, d, 1e-3, tmx, act,
                      jnp.int32(0), 4, 1e-4)
    s = np.asarray(dec["settled_node"])
    print("compiled+ran in", round(time.time() - t0, 1), "s", flush=True)
    print("settled hist:",
          dict(zip(*map(list, np.unique(s, return_counts=True)))), flush=True)
    print("local_hit:", int(np.asarray(dec["local_hit"]).sum()),
          "env_miss:", int(np.asarray(dec["env_miss"]).sum()),
          "has_node:", int(np.asarray(dec["has_node"]).sum()), flush=True)

    def f(o, d, tmx, act):
        dd = route_fused(scene, proxies, models, o, d, 1e-3, tmx, act,
                         jnp.int32(0), 4, 1e-4)
        return dd["new_t"]

    per = chained_time(f, o, d, tmx, act, short=1, long=4, reps=2)
    print("fused route:", round(n / per / 1e6, 2), "Mpaths/s  (",
          round(per * 1e3, 2), "ms )", flush=True)


if __name__ == "__main__":
    main()
