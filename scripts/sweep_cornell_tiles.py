"""Tile-width sweep on the cornell headline workload (bench.py's exact
configuration): the TRANSPOSED small-scene kernel (the production path for
this scene) across tile widths, plus the straight-line (TM, C) kernel it
replaced (forced via cl_mt_table_t=None) as the baseline.

Chain lengths 10/110: per-call times on this workload are ~0.05-0.5 ms,
below the tunnel's RTT noise at the default 2/12 chain (measured negative
slopes — CLAUDE.md benchmark methodology).

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
    straight = scene._replace(cl_mt_table_t=None)
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

    cases = [("transposed", scene, (512, 1024, 2048)),
             ("straight", straight, (512,))]
    for name, sc, widths in cases:
        for tr in widths:
            def t(o, d, tmx, act, sc, tr=tr):
                return trace_resident(sc, o, d, 1e-3, tmx, act,
                                      tile_rays=tr)[0].t
            per = min(chained_time(t, o, d, tmx, act, sc,
                                   short=10, long=110)
                      for _ in range(3))
            print(json.dumps({"kernel": name, "tile_rays": tr,
                              "ms": round(per * 1e3, 4),
                              "mrays": round(n / per / 1e6, 1)}), flush=True)


if __name__ == "__main__":
    main()
