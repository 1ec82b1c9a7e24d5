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
    elif stage == "knobs":  # knobs under the cluster sort
        combos = [dict(sort_mode="cluster", tile_rays=128, recull=rc, rich=rich)
                  for rc in (4, 8, 16) for rich in (False, True)]
    elif stage == "ssub":  # in-kernel sub-block retiling (narrower loops)
        combos = [dict(sort_mode="cluster", tile_rays=128, ssub=ss)
                  for ss in (1, 2, 4, 8, 16)]
    else:  # WIDER tiles with 128-ray sub-blocks: same unions per loop,
           # fewer grid steps (per-grid-step overhead probe)
        combos = [dict(sort_mode="cluster", tile_rays=256, ssub=2),
                  dict(sort_mode="cluster", tile_rays=512, ssub=4),
                  dict(sort_mode="cluster", tile_rays=1024, ssub=8),
                  dict(camera=True, tile_rays=128, ssub=1),
                  dict(camera=True, tile_rays=256, ssub=2),
                  dict(camera=True, tile_rays=512, ssub=4)]

    cam_o = cam_d = None
    for kw in combos:
        kw = dict(kw)
        camera = kw.pop("camera", False)
        if camera and cam_o is None:
            from pg2024_dprt_tpu.core.camera import Camera
            cam = Camera.look_at([0.5, 0.5, 3.0], [0.5, 0.5, 0.5],
                                 [0, 1, 0], 45.0, 256, 256)
            bs, side = 16, 256
            ids = np.arange(n)
            by, bx = ids // (side * bs), ids % (side * bs)
            blk, inner = bx // (bs * bs), bx % (bs * bs)
            pix = jnp.asarray(((by * bs + inner // bs) * side
                               + (blk * bs + inner % bs)).astype(np.int32))
            cam_o, cam_d = cam.generate_rays(
                pix // side, pix % side, jnp.zeros(n), jnp.zeros(n))
        o_, d_ = (cam_o, cam_d) if camera else (ro, rd)

        def t(o, d, tmx, act, sc, kw=kw, camera=camera):
            return trace_resident(sc, o, d, 1e-3, tmx, act,
                                  sort_rays=not camera, **kw)[0].t
        per = chained_time(t, o_, d_, tmx, act, scene, short=2, long=10)
        name = "camera" if camera else "incoherent"
        print(f"{name} {kw}: {per*1e3:7.2f} ms "
              f"({n/per/1e6:6.2f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main()
