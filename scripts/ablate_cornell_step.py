"""Decompose the per-grid-step cost of the resident tracer at CORNELL scale
(K=1 cluster, C=128, tm=512, 64k rays -> 128 grid steps).

The headline bench (bench.py) is bound by this step body: all static knobs
(recull, exact_cull, tile_rays 256..1024) measure within noise of 0.78 ms,
so the time is in load/MT/refine/store, not in cull or selection.  Five
cumulative kernel variants isolate each stage:

  copy      — read the (8, TM) ray rows, write a data-dependent row
  load      — + _load_rays (scene-exit cap + transpose to (TM, 8))
  mt        — + ONE dense MT visit of cluster 0 + packed-key argmin
  refine    — + _refine_winners (one-hot MXU extraction + exact t/u/v)
  full      — the production trace_resident rich path

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ablate_cornell_step.py
"""
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.ops.pallas_resident import (
    _lane_bits, _load_rays, _mt_body, _refine_winners, trace_resident,
)
from pg2024_dprt_tpu.scene import cornell_box, device_scene_from_meshes
from pg2024_dprt_tpu.utils.benchmarking import chained_time

_F32_MAX = 3.402823466e38


def _kernel_var(rays_ref, boxes_ref, table_ref, out_ref, *, c, tm, mode):
    if mode == "copy":
        rows = rays_ref[:]
        out_ref[:] = rows * 0.5
        return
    rays = _load_rays(rays_ref, boxes_ref, tm)
    if mode == "load":
        out_ref[:] = jnp.transpose(rays, (1, 0))
        return
    lb = _lane_bits(c)
    lane_mask = jnp.int32((1 << lb) - 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (tm, c), 1)
    tmax = rays[:, 7:8]
    kb0 = (
        jax.lax.bitcast_convert_type(jnp.maximum(tmax, 0.0), jnp.int32)
        & ~lane_mask
    ) | lane_mask
    tri = table_ref[0]
    t, tri_ok = _mt_body(rays, tri, c, tm)
    tb = jax.lax.bitcast_convert_type(
        jnp.where(tri_ok, jnp.maximum(t, 0.0), _F32_MAX), jnp.int32)
    key = (tb & ~lane_mask) | lanes
    kmin = jnp.min(key, axis=1, keepdims=True)
    improved = kmin < kb0
    s_slot = jnp.where(improved, kmin & lane_mask, -1)
    if mode == "mt":
        t_approx = jax.lax.bitcast_convert_type(
            jnp.where(improved, kmin, kb0) & ~lane_mask, jnp.float32)
        out_ref[:] = jnp.broadcast_to(jnp.transpose(t_approx, (1, 0)), (8, tm))
        return
    assert mode == "refine"
    _refine_winners(rays, s_slot, out_ref, lambda cur: table_ref[cur],
                    c=c, tm=tm)


def run_variant(scene, origin, direction, tmax, active, mode, tm=512):
    n = origin.shape[0]
    c = scene.tris_per_cluster
    k = scene.num_clusters
    table = scene.cl_mt_table.reshape(k, 16, c)
    boxes = scene.cl_boxes

    def call(o, d, tmx, act):
        rays_packed = jnp.stack(
            [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             jnp.where(act, 1e-3, _F32_MAX), jnp.where(act, tmx, 0.0)],
            axis=0)
        (out,) = pl.pallas_call(
            partial(_kernel_var, c=c, tm=tm, mode=mode),
            grid=(n // tm,),
            in_specs=[
                pl.BlockSpec((8, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec((8, tm), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((8, n), jnp.float32)],
        )(rays_packed, boxes, table)
        return jnp.clip(out[0], -1.0, 1.0)

    per = min(chained_time(call, origin, direction, tmax, active)
              for _ in range(3))
    return per


def main():
    n, side = 65536, 256
    meshes, _ = cornell_box()
    scene = device_scene_from_meshes(meshes, tris_per_cluster=128)
    cam = Camera.look_at([0.5, 0.5, 2.4], [0.5, 0.5, 0.0], [0, 1, 0],
                         40.0, side, side)
    bs = 16
    ids = np.arange(n)
    by, bx = ids // (side * bs), ids % (side * bs)
    blk, inner = bx // (bs * bs), bx % (bs * bs)
    rows = by * bs + inner // bs
    cols = blk * bs + inner % bs
    pix = jnp.asarray((rows * side + cols).astype(np.int32))
    origin, direction = cam.generate_rays(pix // side, pix % side,
                                          jnp.zeros(n), jnp.zeros(n))
    tmax = jnp.full((n,), _F32_MAX, jnp.float32)
    active = jnp.ones((n,), bool)

    prev = 0.0
    for mode in ("copy", "load", "mt", "refine"):
        per = run_variant(scene, origin, direction, tmax, active, mode)
        print(f"{mode:8s} {per*1e3:7.3f} ms  (+{(per-prev)*1e3:6.3f})")
        prev = per

    def full(o, d, tmx, act):
        h, _ = trace_resident(scene, o, d, 1e-3, tmx, act, tile_rays=512,
                              sort_rays=False)
        return h.t
    per = min(chained_time(full, origin, direction, tmax, active)
              for _ in range(3))
    print(f"{'full':8s} {per*1e3:7.3f} ms  (+{(per-prev)*1e3:6.3f})")


if __name__ == "__main__":
    main()
