"""Per-tile valid-query distribution for the fused route kernel.

The route kernel's NN stage runs _forward_all_objects over ALL mh*tm
stacked rows per tile even though rays that hit local geometry record no
proxy queries (rows ride zeroed).  This measures, for the committed
bench_suite neural_route_64k wavefront, how many rows per 128-ray tile
are actually valid after the cluster-schedule sort — the data for a
static in-kernel row-compaction budget.

PYTHONPATH=/root/repo:$PYTHONPATH python scripts/study_route_rows.py
"""
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from pg2024_dprt_tpu.ops.pallas_resident import schedule_keys, trace_resident
from pg2024_dprt_tpu.render.proxy_stages import march_proxies_xla
from pg2024_dprt_tpu.scene import device_scene_from_meshes, random_tri_soup
from pg2024_dprt_tpu.scene.geometry import ProxyTable

FMAX = 3.402823466e38


def main():
    n, mh, tm = 65536, 3, 128
    scene = device_scene_from_meshes(
        [random_tri_soup(65536, seed=0)], tris_per_cluster=128)
    rng = np.random.RandomState(1)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    tmx = jnp.full((n,), FMAX, jnp.float32)
    act = jnp.ones((n,), bool)

    offs = np.asarray(
        [[-1.05, 0, 0], [1.05, 0, 0], [0, -1.05, 0], [0, 1.05, 0],
         [0, 0, -1.05], [0, 0, 1.05], [-1.05, -1.05, 0], [1.05, 1.05, 0]],
        np.float32)
    p_lo, p_hi = offs, offs + 1.0
    proxies = ProxyTable(
        aabb_min=jnp.asarray(p_lo), aabb_max=jnp.asarray(p_hi),
        max_length=jnp.asarray(np.linalg.norm(p_hi - p_lo, axis=1)))

    hit, t = (lambda r: (r[0].tri_index >= 0, r[0].t))(
        trace_resident(scene, o, d, 1e-3, tmx, act))
    cmp_t = jnp.where(hit, t, tmx)
    q = march_proxies_xla(proxies, o, d, cmp_t, act, jnp.int32(0), mh, 1e-3)
    valid = np.asarray(q.is_valid).reshape(n, mh)   # row n*mh+k = ray n hit k

    # the kernel's cluster-schedule sorted tile order
    prepass = jnp.stack(
        [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
         jnp.full((n,), 1e-3), cmp_t * 0 + FMAX], axis=0)
    key = schedule_keys(scene.cl_boxes, prepass)
    perm = np.asarray(jax.lax.sort(
        (key, jnp.arange(n, dtype=jnp.int32)), num_keys=1)[1])

    per_ray = valid.sum(1)                      # 0..mh queries per ray
    per_tile = per_ray[perm].reshape(n // tm, tm).sum(1)  # of mh*tm possible
    print(f"rays with >=1 query: {(per_ray > 0).mean():.3f}  "
          f"mean queries/ray: {per_ray.mean():.3f}")
    print(f"per-tile valid rows (of {mh * tm}): mean {per_tile.mean():.1f}  "
          f"p50 {np.percentile(per_tile, 50):.0f}  "
          f"p90 {np.percentile(per_tile, 90):.0f}  "
          f"p99 {np.percentile(per_tile, 99):.0f}  max {per_tile.max()}")
    for budget in (64, 128, 192, 256):
        print(f"  tiles over budget {budget}: "
              f"{(per_tile > budget).mean() * 100:.2f}%")


if __name__ == "__main__":
    main()
