"""Diagnose the chained-timing fold: does a miss-sentinel t (3.4e38) folded
into the chained origin distort measured cost, and is the measurement
seed-stable within one session?

Rows (same compiled HLO, only data differs):
  * incoherent seed1 raw-fold   (artifact bench_suite conditions; ray0 hits)
  * incoherent seed2 raw-fold   (ray0 misses -> origins jump by s*1e-30=3.4e8)
  * incoherent seed1/2 clip-fold (s clipped to [-1,1]: origins bit-stable)
  * camera raw-fold vs clip-fold (bench.py conditions; camera ray0 misses)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/diag_chain.py
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.ops.pallas_resident import trace_resident
from pg2024_dprt_tpu.scene import device_scene_from_meshes, random_tri_soup


def make_chain(fn, clip: bool):
    @jax.jit
    def chain(o, nc, *args):
        def step(i, carry):
            o_c, acc = carry
            out = fn(o_c, *args)
            s = jnp.reshape(out, (-1,))[0].astype(jnp.float32)
            if clip:
                s = jnp.clip(s, -1.0, 1.0)
            return o_c + s * 1e-30, acc + s
        _, acc = jax.lax.fori_loop(0, nc, step, (o, jnp.float32(0)))
        return acc
    return chain


def slope(chain, o, *args, short=2, long=12, reps=3):
    rng = np.random.RandomState(int(time.time() * 1e6) % 2**31)
    ts = {}
    for nc in (short, long):
        best = float("inf")
        for _ in range(reps):
            oo = o + jnp.asarray(rng.rand(1).astype(np.float32) * 1e-5)
            float(np.asarray(chain(oo, 1, *args)))
            t0 = time.time()
            float(np.asarray(chain(oo, nc, *args)))
            best = min(best, time.time() - t0)
        ts[nc] = best
    return (ts[long] - ts[short]) / (long - short)


def main():
    n = 65536
    scene = device_scene_from_meshes(
        [random_tri_soup(65536, seed=0)], tris_per_cluster=128)
    tmx = jnp.full((n,), 3.4e38, jnp.float32)
    act = jnp.ones((n,), bool)

    def t_sorted(o, d, tmx, act):
        return trace_resident(scene, o, d, 1e-3, tmx, act, tile_rays=128,
                              sort_rays=True)[0].t

    def t_cam(o, d, tmx, act):
        return trace_resident(scene, o, d, 1e-3, tmx, act, tile_rays=128,
                              sort_rays=False)[0].t

    rays = {}
    for seed in (1, 2):
        rng = np.random.RandomState(seed)
        ro = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
        rd = rng.randn(n, 3).astype(np.float32)
        rays[seed] = (ro, jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True)))

    side = 256
    cam = Camera.look_at([0.5, 0.5, 3.0], [0.5, 0.5, 0.5], [0, 1, 0], 45.0, side, side)
    bs = 16
    ids = np.arange(n)
    by, bx = ids // (side * bs), ids % (side * bs)
    blk, inner = bx // (bs * bs), bx % (bs * bs)
    pix = jnp.asarray(((by * bs + inner // bs) * side + (blk * bs + inner % bs)).astype(np.int32))
    co, cd = cam.generate_rays(pix // side, pix % side, jnp.zeros(n), jnp.zeros(n))

    from pg2024_dprt_tpu.utils.benchmarking import chained_time

    for seed in (1, 2):
        o, d = rays[seed]
        per = chained_time(t_sorted, o, d, tmx, act)
        print(f"incoherent seed{seed} fixed-fold: {per*1e3:8.2f} ms", flush=True)
    per = chained_time(t_cam, co, cd, tmx, act)
    print(f"camera           fixed-fold: {per*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
