"""Tile-width sweep for the tiny-scene (K<=4) straight-line kernels on the
cornell headline workload (bench.py's exact configuration).

The K<=4 path is bound by per-grid-step overhead, which larger tiles
amortize (512 was measured better than 128 round-2-late); this checks
whether 1024/2048-ray tiles push further.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/sweep_cornell_tiles.py
"""
import json

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.ops.pallas_resident import trace_resident
from pg2024_dprt_tpu.scene import cornell_box, device_scene_from_meshes
from pg2024_dprt_tpu.utils.benchmarking import chained_time


def main():
    n = 65536
    side = 256
    meshes, _ = cornell_box()
    scene = device_scene_from_meshes(meshes, tris_per_cluster=128)
    cam = Camera.look_at([0.5, 0.5, 2.4], [0.5, 0.5, 0.0], [0, 1, 0],
                         40.0, side, side)
    bs = 16
    ids = np.arange(n)
    by, bx = ids // (side * bs), ids % (side * bs)
    blk, inner = bx % (side * bs) // (bs * bs), bx % (bs * bs)
    rows = by * bs + inner // bs
    cols = blk * bs + inner % bs
    pix = jnp.asarray((rows * side + cols).astype(np.int32))
    o, d = cam.generate_rays(pix // side, pix % side, jnp.zeros(n), jnp.zeros(n))
    tmx = jnp.full((n,), 3.4e38, jnp.float32)
    act = jnp.ones((n,), bool)

    for tr in (256, 512, 1024, 2048):
        def t(o, d, tmx, act, sc, tr=tr):
            return trace_resident(sc, o, d, 1e-3, tmx, act, tile_rays=tr)[0].t
        try:
            per = min(chained_time(t, o, d, tmx, act, scene) for _ in range(3))
        except Exception as e:  # noqa: BLE001 — report unsupported widths
            print(json.dumps({"tile_rays": tr, "error": str(e)[:200]}), flush=True)
            continue
        print(json.dumps({"tile_rays": tr, "ms": round(per * 1e3, 4),
                          "mrays": round(n / per / 1e6, 1)}), flush=True)


if __name__ == "__main__":
    main()
