"""On-chip sweep: cluster-schedule sort vs morton x tile size, incoherent 64k.

PYTHONPATH=/root/repo:$PYTHONPATH python scripts/sweep_sched.py
"""
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from pg2024_dprt_tpu.ops.pallas_resident import trace_resident
from pg2024_dprt_tpu.scene import device_scene_from_meshes, random_tri_soup
from pg2024_dprt_tpu.utils.benchmarking import chained_time


def main():
    n = 65536
    scene = device_scene_from_meshes([random_tri_soup(65536, seed=0)],
                                     tris_per_cluster=128)
    rng = np.random.RandomState(1)
    ro = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    rd = rng.randn(n, 3).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
    tmx = jnp.full((n,), 3.4e38, jnp.float32)
    act = jnp.ones((n,), bool)

    import sys
    stage = sys.argv[1] if len(sys.argv) > 1 else "mode"
    if stage == "mode":
        combos = [dict(sort_mode=m, tile_rays=tm)
                  for m in ("morton", "cluster") for tm in (128, 256)]
    else:  # knobs under the cluster sort
        combos = [dict(sort_mode="cluster", tile_rays=128, recull=rc, rich=rich)
                  for rc in (4, 8, 16) for rich in (False, True)]

    for kw in combos:
        def t(o, d, tmx, act, sc, kw=kw):
            return trace_resident(sc, o, d, 1e-3, tmx, act,
                                  sort_rays=True, **kw)[0].t
        per = chained_time(t, ro, rd, tmx, act, scene, short=2, long=10)
        print(f"incoherent {kw}: {per*1e3:7.2f} ms "
              f"({n/per/1e6:6.2f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main()
