"""A-B the route kernel's valid-row NN chunking on the real chip.

PROD nets, p=8, max_hits=3 — the committed bench_suite neural_route_64k
configuration, on route_fused directly (honest chained slope).

PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_route_compact.py
"""
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from pg2024_dprt_tpu.models.proxy import random_proxy_models
from pg2024_dprt_tpu.ops.pallas_route import route_fused
from pg2024_dprt_tpu.scene import device_scene_from_meshes, random_tri_soup
from pg2024_dprt_tpu.scene.geometry import ProxyTable
from pg2024_dprt_tpu.utils.benchmarking import chained_time


def main():
    n = 65536
    scene = device_scene_from_meshes(
        [random_tri_soup(65536, seed=0)], tris_per_cluster=128)
    rng = np.random.RandomState(1)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    tmx = jnp.full((n,), 3.4e38, jnp.float32)
    act = jnp.ones((n,), bool)

    offs = np.asarray(
        [[-1.05, 0, 0], [1.05, 0, 0], [0, -1.05, 0], [0, 1.05, 0],
         [0, 0, -1.05], [0, 0, 1.05], [-1.05, -1.05, 0], [1.05, 1.05, 0]],
        np.float32)
    proxies = ProxyTable(
        aabb_min=jnp.asarray(offs), aabb_max=jnp.asarray(offs + 1.0),
        max_length=jnp.asarray(np.linalg.norm(np.ones((8, 3)), axis=1)
                               .astype(np.float32)))
    models = random_proxy_models(jax.random.PRNGKey(1), 8)   # PROD nets

    for compact in (False, True):
        def f(o, d, tmx, act, compact=compact):
            dd = route_fused(scene, proxies, models, o, d, 1e-3, tmx, act,
                             jnp.int32(0), 3, 1e-3, nn_compact=compact)
            return dd["new_t"]

        per = chained_time(f, o, d, tmx, act, short=1, long=4, reps=2)
        print(f"route PROD p=8 mh=3 nn_compact={compact}: {per*1e3:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
