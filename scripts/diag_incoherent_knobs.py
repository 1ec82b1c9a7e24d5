"""Decompose the 11.4 ms incoherent kernel (cluster-presorted) by knob.

All rows pre-sort rays on the host by the production schedule key so every
row measures ONLY kernel+epilogue variation (no sort machinery):
  base       rich=False recull=8   (the production sorted path)
  rich       rich=True  recull=8   (in-kernel winner refinement — winners are
                                    CONCENTRATED under the cluster sort, so the
                                    per-distinct-winner loop should be short)
  recull=4 / recull=16              (re-cull granularity under cluster sort)
  grouped    two-level group->member loop (wins at 1M, auto-off at 64k)
  fixed      tmax=2e-3 (cull runs, ~no visits) -> per-pass fixed cost

PYTHONPATH=/root/repo:$PYTHONPATH python scripts/diag_incoherent_knobs.py
"""
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from pg2024_dprt_tpu.ops.pallas_resident import schedule_keys, trace_resident
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

    rays_packed = jnp.stack(
        [ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
         jnp.full((n,), 1e-3, jnp.float32), tmx], axis=0)
    key = np.asarray(schedule_keys(scene.cl_boxes, rays_packed))
    perm = np.argsort(key, kind="stable")
    ro_s, rd_s = ro[perm], rd[perm]

    def row(name, **kw):
        tmx_row = kw.pop("tmax", tmx)

        def f(o, d, tmx_, act_, sc):
            return trace_resident(sc, o, d, 1e-3, tmx_, act_,
                                  sort_rays=False, tile_rays=128, **kw)[0].t

        per = chained_time(f, ro_s, rd_s, tmx_row, act, scene,
                           short=2, long=10)
        print(f"{name:24s}: {per*1e3:7.2f} ms ({n/per/1e6:6.2f} Mrays/s)",
              flush=True)

    row("base rich=F recull=8", rich=False, recull=8)
    row("rich=True recull=8", rich=True, recull=8)
    row("rich=F recull=4", rich=False, recull=4)
    row("rich=F recull=16", rich=False, recull=16)
    row("grouped", rich=False, grouped=True)
    row("fixed (tmax=2e-3)", rich=False, recull=8,
        tmax=jnp.full((n,), 2e-3, jnp.float32))


if __name__ == "__main__" and len(__import__("sys").argv) == 1:
    main()


def tpc_sweep():
    """K-reduction: the exact (TM,K) cull is ~3 ms at K=735; higher tpc
    shrinks K (and the cull) at the cost of wider MT rows per visit."""
    n = 65536
    rng = np.random.RandomState(1)
    ro = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    rd = rng.randn(n, 3).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
    tmx = jnp.full((n,), 3.4e38, jnp.float32)
    act = jnp.ones((n,), bool)
    for tpc in (128, 256, 512):
        scene = device_scene_from_meshes([random_tri_soup(65536, seed=0)],
                                         tris_per_cluster=tpc)
        k = scene.cl_aabb_min.shape[0]

        def f(o, d, tmx_, act_, sc):
            return trace_resident(sc, o, d, 1e-3, tmx_, act_, sort_rays=True,
                                  sort_mode="cluster", tile_rays=128)[0].t

        per = chained_time(f, ro, rd, tmx, act, scene, short=2, long=10)
        print(f"tpc={tpc:3d} K={k:4d} full    : {per*1e3:7.2f} ms "
              f"({n/per/1e6:6.2f} Mrays/s)", flush=True)

        def ffix(o, d, tmx_, act_, sc):
            return trace_resident(sc, o, d, 1e-3, tmx_, act_, sort_rays=True,
                                  sort_mode="cluster", tile_rays=128)[0].t

        tfix = jnp.full((n,), 2e-3, jnp.float32)
        per = chained_time(ffix, ro, rd, tfix, act, scene, short=2, long=10)
        print(f"tpc={tpc:3d} K={k:4d} fixed   : {per*1e3:7.2f} ms", flush=True)




def chunk_sweep():
    """_CULL_CHUNK: vreg-resident cull chunks vs the one-big-chunk spill."""
    import pg2024_dprt_tpu.ops.pallas_resident as pr
    n = 65536
    scene = device_scene_from_meshes([random_tri_soup(65536, seed=0)],
                                     tris_per_cluster=128)
    rng = np.random.RandomState(1)
    ro = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    rd = rng.randn(n, 3).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
    tmx = jnp.full((n,), 3.4e38, jnp.float32)
    act = jnp.ones((n,), bool)
    ref = None
    for ck in (4096, 512, 256, 128):
        pr._CULL_CHUNK = ck

        def f(o, d, tmx_, act_, sc, _ck=ck):
            return trace_resident(sc, o, d, 1e-3, tmx_, act_, sort_rays=True,
                                  sort_mode="cluster", tile_rays=128)[0].t

        per = chained_time(f, ro, rd, tmx, act, scene, short=2, long=10)
        print(f"chunk={ck:5d} full : {per*1e3:7.2f} ms "
              f"({n/per/1e6:6.2f} Mrays/s)", flush=True)

        tfix = jnp.full((n,), 2e-3, jnp.float32)
        per = chained_time(f, ro, rd, tfix, act, scene, short=2, long=10)
        print(f"chunk={ck:5d} fixed: {per*1e3:7.2f} ms", flush=True)

        t = np.asarray(jax.jit(f, static_argnums=())(ro, rd, tmx, act, scene))
        if ref is None:
            ref = t
        else:
            same = np.array_equal(np.nan_to_num(t, posinf=1e38),
                                  np.nan_to_num(ref, posinf=1e38))
            print(f"chunk={ck:5d} bit-identical vs first: {same}", flush=True)


def fixed_split():
    """Split the 5.36 ms presorted fixed cost: exact cull vs everything else.

    Rows (all presorted by cluster key, tmax=2e-3 -> zero visits):
      exact   : production cull (TM,K) + keep_rows + 1 rekeys pass
      interval: exact_cull=False — launch + (1,K) interval cull + epilogue
      anyhit  : exact cull, any-hit kernel (no closest epilogue)
    exact - interval ~= the exact cull's true cost; exact - anyhit ~= the
    closest epilogue's."""
    n = 65536
    scene = device_scene_from_meshes([random_tri_soup(65536, seed=0)],
                                     tris_per_cluster=128)
    rng = np.random.RandomState(1)
    ro = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    rd = rng.randn(n, 3).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
    tmx = jnp.full((n,), 3.4e38, jnp.float32)
    act = jnp.ones((n,), bool)
    rays_packed = jnp.stack(
        [ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
         jnp.full((n,), 1e-3, jnp.float32), tmx], axis=0)
    key = np.asarray(schedule_keys(scene.cl_boxes, rays_packed))
    perm = np.argsort(key, kind="stable")
    ro_s, rd_s = ro[perm], rd[perm]
    tfix = jnp.full((n,), 2e-3, jnp.float32)

    def row(name, **kw):
        def f(o, d, tmx_, act_, sc):
            out = trace_resident(sc, o, d, 1e-3, tmx_, act_,
                                 sort_rays=False, tile_rays=128, **kw)[0]
            return out.t if hasattr(out, "t") else out.astype(jnp.float32)

        per = chained_time(f, ro_s, rd_s, tfix, act, scene, short=2, long=10)
        print(f"fixed {name:22s}: {per*1e3:7.2f} ms", flush=True)

    row("exact rich=F", rich=False, recull=8)
    row("interval rich=F", rich=False, recull=8, exact_cull=False)
    row("exact anyhit", any_hit=True)
    row("interval anyhit", any_hit=True, exact_cull=False)




def bigtile_sweep():
    """Grid-step amortization: per-grid-step overhead measured ~6 us (anyhit
    fixed 3.95 ms / 512 tiles with only ~0.9 ms of cull).  Big tiles with
    ssub = tm/128 keep the selection union and MT rows at the measured
    128-ray optimum while dividing the number of grid steps."""
    n = 65536
    scene = device_scene_from_meshes([random_tri_soup(65536, seed=0)],
                                     tris_per_cluster=128)
    rng = np.random.RandomState(1)
    ro = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    rd = rng.randn(n, 3).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
    tmx = jnp.full((n,), 3.4e38, jnp.float32)
    act = jnp.ones((n,), bool)
    rays_packed = jnp.stack(
        [ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
         jnp.full((n,), 1e-3, jnp.float32), tmx], axis=0)
    key = np.asarray(schedule_keys(scene.cl_boxes, rays_packed))
    perm = np.argsort(key, kind="stable")
    ro_s, rd_s = ro[perm], rd[perm]
    tfix = jnp.full((n,), 2e-3, jnp.float32)
    ref = None
    for tr, ss in ((128, 1), (256, 2), (512, 4), (1024, 8), (512, 1)):
        def f(o, d, tmx_, act_, sc, _t=tr, _s=ss):
            return trace_resident(sc, o, d, 1e-3, tmx_, act_,
                                  sort_rays=False, rich=False, recull=8,
                                  tile_rays=_t, ssub=_s)[0].t

        per = chained_time(f, ro_s, rd_s, tmx, act, scene, short=2, long=10)
        print(f"tm={tr:4d} ssub={ss} full : {per*1e3:7.2f} ms "
              f"({n/per/1e6:6.2f} Mrays/s)", flush=True)
        per = chained_time(f, ro_s, rd_s, tfix, act, scene, short=2, long=10)
        print(f"tm={tr:4d} ssub={ss} fixed: {per*1e3:7.2f} ms", flush=True)
        t = np.asarray(jax.jit(f)(ro_s, rd_s, tmx, act, scene))
        if ref is None:
            ref = t
        else:
            print(f"tm={tr:4d} ssub={ss} bit-identical: "
                  f"{np.array_equal(t, ref)}", flush=True)




def epilogue_split():
    """Kernel-only vs epilogue: call the pallas kernel via trace_resident
    but consume RAW packed output (monkeypatched epilogue bypass is not
    available, so approximate: compare classic vs rich vs anyhit at full
    and zero visits, plus a packed-only variant via pallas_resident
    internals)."""
    import pg2024_dprt_tpu.ops.pallas_resident as pr
    n = 65536
    scene = device_scene_from_meshes([random_tri_soup(65536, seed=0)],
                                     tris_per_cluster=128)
    rng = np.random.RandomState(1)
    ro = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    rd = rng.randn(n, 3).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
    tmx = jnp.full((n,), 3.4e38, jnp.float32)
    act = jnp.ones((n,), bool)
    rays_packed = jnp.stack(
        [ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
         jnp.full((n,), 1e-3, jnp.float32), tmx], axis=0)
    key = np.asarray(schedule_keys(scene.cl_boxes, rays_packed))
    perm = np.argsort(key, kind="stable")
    ro_s, rd_s = ro[perm], rd[perm]
    tfix = jnp.full((n,), 2e-3, jnp.float32)

    from functools import partial as _partial
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k = scene.cl_aabb_min.shape[0]
    c = scene.cl_mt_table.shape[2]
    table = scene.cl_mt_table
    boxes = scene.cl_boxes
    tm = 128
    tiles = n // tm

    def kernel_only(o, d, tmx_, rich):
        rp = jnp.stack(
            [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             jnp.full((n,), 1e-3, jnp.float32), tmx_], axis=0)
        ray_spec = pl.BlockSpec((8, tm), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        boxes_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        if rich:
            out_spec = pl.BlockSpec((8, tm), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)
            out_struct = jax.ShapeDtypeStruct((8, n), jnp.float32)
        else:
            out_spec = pl.BlockSpec((tm, 2), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
            out_struct = jax.ShapeDtypeStruct((n, 2), jnp.float32)
        scratch = [
            pltpu.VMEM((tm, 1), jnp.int32), pltpu.VMEM((tm, 1), jnp.int32),
            pltpu.VMEM((1, k), jnp.int32), pltpu.VMEM((1, k), jnp.int32),
        ]
        (out,) = pl.pallas_call(
            _partial(pr._kernel, c=c, tm=tm, k=k, exact=True, recull=8,
                     rich=rich, ssub=1),
            grid=(tiles,),
            in_specs=[ray_spec, boxes_spec, boxes_spec],
            out_specs=[out_spec], out_shape=[out_struct],
            scratch_shapes=scratch,
        )(rp, boxes, table)
        return out[0] if rich else out[:, 0]

    for name, rich in (("classic", False), ("rich", True)):
        f = lambda o, d, t_, a_, sc, _r=rich: kernel_only(o, d, t_, _r)
        per = chained_time(f, ro_s, rd_s, tmx, act, scene, short=2, long=10)
        print(f"kernel-only {name:8s} full : {per*1e3:7.2f} ms", flush=True)
        per = chained_time(f, ro_s, rd_s, tfix, act, scene, short=2, long=10)
        print(f"kernel-only {name:8s} fixed: {per*1e3:7.2f} ms", flush=True)




def init_split():
    """Zero-visit in-kernel fixed cost, stage by stage: load-only floor,
    + exact keep_rows cull, + the rekeys(kb0) init pass."""
    import pg2024_dprt_tpu.ops.pallas_resident as pr
    from functools import partial as _partial
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = 65536
    scene = device_scene_from_meshes([random_tri_soup(65536, seed=0)],
                                     tris_per_cluster=128)
    rng = np.random.RandomState(1)
    ro = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    rd = rng.randn(n, 3).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
    k = scene.cl_aabb_min.shape[0]
    tm = 128
    tiles = n // tm
    boxes = scene.cl_boxes

    def make(kern_body):
        def f(o, d, t_, a_, sc):
            rp = jnp.stack(
                [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                 jnp.full((n,), 1e-3, jnp.float32), t_], axis=0)
            ray_spec = pl.BlockSpec((8, tm), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)
            (out,) = pl.pallas_call(
                kern_body, grid=(tiles,),
                in_specs=[ray_spec, pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=[pl.BlockSpec((tm, 2), lambda i: (i, 0),
                                        memory_space=pltpu.VMEM)],
                out_shape=[jax.ShapeDtypeStruct((n, 2), jnp.float32)],
            )(rp, boxes)
            return out[:, 0]
        return f

    def k_load(rays_ref, boxes_ref, out_ref):
        rays = pr._load_rays(rays_ref, boxes_ref, tm)
        out_ref[:] = jnp.broadcast_to(rays[:, 7:8], (tm, 2))

    def k_cull(rays_ref, boxes_ref, out_ref):
        rays = pr._load_rays(rays_ref, boxes_ref, tm)
        en = pr._cluster_enters(rays, boxes_ref[:], k, tm, exact=True,
                                keep_rows=True)
        out_ref[:] = jnp.broadcast_to(
            jnp.min(en, axis=1, keepdims=True), (tm, 2))

    def k_init(rays_ref, boxes_ref, out_ref):
        rays = pr._load_rays(rays_ref, boxes_ref, tm)
        en = pr._cluster_enters(rays, boxes_ref[:], k, tm, exact=True,
                                keep_rows=True)
        tmax = rays[:, 7:8]
        lb = pr._lane_bits(128)
        lane_mask = jnp.int32((1 << lb) - 1)
        kb0 = (jax.lax.bitcast_convert_type(
            jnp.maximum(tmax, 0.0), jnp.int32) & ~lane_mask) | lane_mask
        t_best = jax.lax.bitcast_convert_type(kb0 & ~lane_mask, jnp.float32)
        t_g = t_best * (1.0 + 1e-4) + 1e-7
        inf = jnp.float32(float("inf"))
        en_eff = jnp.where(en <= jnp.broadcast_to(t_g, (tm, k)), en, inf)
        en_min = jnp.min(en_eff, axis=0, keepdims=True)
        keys = pr._selection_keys(en_min, k, pr._lane_bits(k))
        out_ref[:] = jnp.broadcast_to(
            jnp.min(keys, axis=1, keepdims=True).astype(jnp.float32),
            (tm, 2))

    tmx = jnp.full((n,), 3.4e38, jnp.float32)
    act = jnp.ones((n,), bool)
    for name, kb in (("load-only", k_load), ("+cull", k_cull),
                     ("+rekeys-init", k_init)):
        f = make(kb)
        per = chained_time(f, ro, rd, tmx, act, scene, short=2, long=10)
        print(f"init {name:14s}: {per*1e3:7.2f} ms", flush=True)


if __name__ == "__main__" and len(__import__("sys").argv) > 1:
    import sys
    {"tpc": tpc_sweep, "chunk": chunk_sweep, "fixed": fixed_split, "bigtile": bigtile_sweep, "epi": epilogue_split, "init": init_split}[sys.argv[1]]()
