"""Decompose the resident tracer's per-visit cost on the real chip.

Five kernels over the same 64k sorted-incoherent wavefront (tpc=128,
tile=128, VMEM-resident table), the first four doing EXACTLY fixed_j visits
per tile (fori_loop, no early termination) so their deltas are per-visit
component costs:

  * fixed_mt      — visit clusters 0..J-1 in order, dense MT only
  * fixed_chain   — + the selection-sort vector chain (min + mask per
                    visit), result consumed only at the end
  * fixed_extract — + a per-visit vector->scalar extract of the selection
                    (used arithmetically, NOT for addressing)
  * fixed_dynaddr — + the extracted index drives table_ref[idx] (the real
                    selection-ordered visit sequence)
  * full          — the production while_loop (early termination, per-visit
                    stale horizon) — fewer visits but all machinery

Deltas:  chain = fixed_chain - fixed_mt;  extract = fixed_extract -
fixed_chain;  dyn-addressing = fixed_dynaddr - fixed_extract;  the
while/horizon machinery and the early-termination win show up in full vs
fixed_dynaddr.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ablate_visit_cost.py
"""
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pg2024_dprt_tpu.ops.pallas_resident import (
    _cluster_enters, _lane_bits, _mt_body, _next_cluster, _selection_keys,
)
from pg2024_dprt_tpu.ops.pallas_tracer import _morton_key
from pg2024_dprt_tpu.scene import device_scene_from_meshes, random_tri_soup
from pg2024_dprt_tpu.utils.benchmarking import chained_time

_F32_MAX = 3.402823466e38


def _kernel_var(rays_ref, boxes_ref, table_ref, out_ref, *, c, tm, k,
                mode: str, fixed_j: int):
    rays = rays_ref[:]
    tmax = rays[:, 7:8]
    lb = _lane_bits(c)
    cb = _lane_bits(k)
    lane_mask = jnp.int32((1 << lb) - 1)
    cmask = jnp.int32((1 << cb) - 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (tm, c), 1)

    kb0 = (
        jax.lax.bitcast_convert_type(jnp.maximum(tmax, 0.0), jnp.int32)
        & ~lane_mask
    ) | lane_mask

    en0 = _cluster_enters(rays, boxes_ref[:], k, tm, exact=True)
    keys0 = _selection_keys(en0, k, cb)

    if mode != "full":
        def body(j, carry):
            s_kb, s_slot, keys = carry
            if mode == "fixed_mt":
                idx = j
            else:
                kv = jnp.min(keys, axis=1, keepdims=True)
                keys = jnp.where(keys == jnp.broadcast_to(kv, keys.shape),
                                 jnp.int32(0x7FFFFFFF), keys)
                if mode == "fixed_chain":
                    idx = j
                else:
                    sel = kv[0, 0]                     # the extract
                    if mode == "fixed_extract":
                        idx = j                        # extract unused for
                        extra = sel & cmask            # addressing
                    else:                              # fixed_dynaddr
                        idx = jnp.minimum(sel & cmask, k - 1)
            tri = table_ref[idx]
            t, tri_ok = _mt_body(rays, tri, c, tm)
            tb = jax.lax.bitcast_convert_type(
                jnp.where(tri_ok, jnp.maximum(t, 0.0), _F32_MAX), jnp.int32)
            key = (tb & ~lane_mask) | lanes
            kmin = jnp.min(key, axis=1, keepdims=True)
            improved = kmin < s_kb
            slot_w = idx * c + (kmin & lane_mask)
            if mode == "fixed_extract":
                slot_w = slot_w | (extra & 0)          # keep extract live
            return (jnp.where(improved, kmin, s_kb),
                    jnp.where(improved, slot_w, s_slot), keys)

        s_kb, s_slot, _ = jax.lax.fori_loop(
            0, fixed_j, body,
            (kb0, jnp.full((tm, 1), -1, jnp.int32), keys0))
        out_ref[:, 0:1] = jax.lax.bitcast_convert_type(
            s_kb & ~lane_mask, jnp.float32)
        out_ref[:, 1:2] = s_slot.astype(jnp.float32)
        return

    worst0 = jnp.max(kb0, axis=0, keepdims=True)[0, 0]
    sel0, keys1 = _next_cluster(keys0)

    def cond(carry):
        sel, _, _, worst, _ = carry
        return (sel & ~cmask) < worst

    def body(carry):
        sel, keys, s_kb, worst, s_slot = carry
        sel2, keys2 = _next_cluster(keys)
        worst2 = jnp.max(s_kb, axis=0, keepdims=True)[0, 0]
        idx = sel & cmask
        tri = table_ref[idx]
        t, tri_ok = _mt_body(rays, tri, c, tm)
        tb = jax.lax.bitcast_convert_type(
            jnp.where(tri_ok, jnp.maximum(t, 0.0), _F32_MAX), jnp.int32)
        key = (tb & ~lane_mask) | lanes
        kmin = jnp.min(key, axis=1, keepdims=True)
        improved = kmin < s_kb
        slot_w = idx * c + (kmin & lane_mask)
        s_kb = jnp.where(improved, kmin, s_kb)
        s_slot = jnp.where(improved, slot_w, s_slot)
        return sel2, keys2, s_kb, worst2, s_slot

    _, _, s_kb, _, s_slot = jax.lax.while_loop(
        cond, body,
        (sel0, keys1, kb0, worst0, jnp.full((tm, 1), -1, jnp.int32)))
    out_ref[:, 0:1] = jax.lax.bitcast_convert_type(
        s_kb & ~lane_mask, jnp.float32)
    out_ref[:, 1:2] = s_slot.astype(jnp.float32)


@partial(jax.jit, static_argnames=("mode", "fixed_j", "tm"))
def run_variant(scene, origin, direction, t_max, active, mode, fixed_j=57,
                tm=128):
    n = origin.shape[0]
    mkey = _morton_key(scene, origin, direction)
    _, perm = jax.lax.sort((mkey, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    origin = jnp.take(origin, perm, axis=0)
    direction = jnp.take(direction, perm, axis=0)
    t_max = jnp.take(t_max, perm, axis=0)

    k = scene.num_clusters
    c = scene.tris_per_cluster
    o, d = origin, direction
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    s_valid = scene.cl_count > 0
    s_lo = jnp.min(jnp.where(s_valid[:, None], scene.cl_aabb_min, _F32_MAX), axis=0)
    s_hi = jnp.max(jnp.where(s_valid[:, None], scene.cl_aabb_max, -_F32_MAX), axis=0)
    tt0 = (s_lo[None] - o) * inv
    tt1 = (s_hi[None] - o) * inv
    scene_exit = jnp.min(jnp.maximum(tt0, tt1), axis=-1)
    tmax_eff = jnp.minimum(t_max, jnp.maximum(scene_exit, 0.0) * 1.001 + 1e-4)
    rays = jnp.stack(
        [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
         jnp.full((n,), 1e-3, jnp.float32), tmax_eff], axis=-1)
    boxes = jnp.concatenate(
        [scene.cl_aabb_min.T, scene.cl_aabb_max.T,
         (scene.cl_count > 0).astype(jnp.float32)[None, :],
         jnp.zeros((1, k), jnp.float32)], axis=0)
    boxes = jnp.where(jnp.isfinite(boxes), boxes, 0.0)
    src = scene.cl_tri_table.reshape(k, 10, c)
    v0 = src[:, 0:3]
    e1 = src[:, 3:6] - v0
    e2 = src[:, 6:9] - v0
    nrm = jnp.cross(e1, e2, axis=1)
    table = jnp.concatenate([v0, e1, e2, nrm], axis=1)

    ray_spec = pl.BlockSpec((tm, 8), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tm, 2), lambda i: (i, 0), memory_space=pltpu.VMEM)
    (out,) = pl.pallas_call(
        partial(_kernel_var, c=c, tm=tm, k=k, mode=mode, fixed_j=fixed_j),
        grid=(n // tm,),
        in_specs=[ray_spec, vmem, vmem],
        out_specs=[out_spec],
        out_shape=[jax.ShapeDtypeStruct((n, 2), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )(rays, boxes, table)
    return out[:, 0]


def main():
    n = 65536
    scene = device_scene_from_meshes([random_tri_soup(65536, seed=0)],
                                     tris_per_cluster=128)
    rng = np.random.RandomState(1)
    o = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    tmx = jnp.full((n,), 3.4e38, jnp.float32)
    act = jnp.ones((n,), bool)

    prev = None
    for mode in ("fixed_mt", "fixed_chain", "fixed_extract", "fixed_dynaddr",
                 "full"):
        def f(o, d, tmx, act, sc, mode=mode):
            return run_variant(sc, o, d, tmx, act, mode)
        per = chained_time(f, o, d, tmx, act, scene, short=2, long=8, reps=2)
        delta = "" if prev is None else f"  (+{(per - prev)*1e3:6.2f})"
        print(f"{mode:14s}: {per*1e3:8.2f} ms{delta}", flush=True)
        if mode != "full":
            prev = per


if __name__ == "__main__":
    main()
