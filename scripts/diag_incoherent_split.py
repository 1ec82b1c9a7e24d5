"""Decompose the incoherent_64k trace time: sort machinery vs kernel+epilogue.

The production path (sort_mode=cluster, tm=128, recull=8) measured 13.0 ms;
the visit-cost model (study_perray.py) accounts for ~8.0.  This splits the
measured total into
  (a) full production call (schedule prepass + sort + gather + kernel +
      classic epilogue + inverse gather),
  (b) kernel + epilogue only — rays PRE-SORTED by the same schedule key,
      sort_rays=False (exact cull + recull=8 still on, rich=False to match
      the production sorted path),
  (c) sort machinery only — schedule_keys + lax.sort + the (8, mp) gather +
      the inverse-permutation build, folded bit-changing.

PYTHONPATH=/root/repo:$PYTHONPATH python scripts/diag_incoherent_split.py
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

    def t_full(o, d, tmx, act, sc):
        return trace_resident(sc, o, d, 1e-3, tmx, act, sort_rays=True,
                              sort_mode="cluster", tile_rays=128)[0].t

    per = chained_time(t_full, ro, rd, tmx, act, scene, short=2, long=10)
    print(f"(a) full production        : {per*1e3:7.2f} ms "
          f"({n/per/1e6:6.2f} Mrays/s)", flush=True)

    # pre-sort on host by the same schedule key
    boxes = scene.cl_boxes
    rays_packed = jnp.stack(
        [ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
         jnp.full((n,), 1e-3, jnp.float32), tmx], axis=0)
    key = np.asarray(schedule_keys(boxes, rays_packed))
    perm = np.argsort(key, kind="stable")
    ro_s = ro[perm]
    rd_s = rd[perm]

    def t_kernel(o, d, tmx, act, sc):
        return trace_resident(sc, o, d, 1e-3, tmx, act, sort_rays=False,
                              rich=False, tile_rays=128)[0].t

    per = chained_time(t_kernel, ro_s, rd_s, tmx, act, scene, short=2, long=10)
    print(f"(b) kernel+epilogue only   : {per*1e3:7.2f} ms "
          f"({n/per/1e6:6.2f} Mrays/s)", flush=True)

    def t_sort(o, d, tmx, act, sc):
        rp = jnp.stack(
            [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             jnp.full((n,), 1e-3, jnp.float32), tmx], axis=0)
        k = schedule_keys(sc.cl_boxes, rp)
        k = jnp.where(rp[7, :] > 0.0, k, jnp.int32(0x7FFFFFFF))
        _, prm = jax.lax.sort((k, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
        rp_s = jnp.take(rp, prm, axis=1)
        inv = jnp.zeros((n,), jnp.int32).at[prm].set(
            jnp.arange(n, dtype=jnp.int32))
        # consume both the gathered rays and the inverse perm so neither is
        # dead-code-eliminated; inverse-gather a derived row to match the
        # epilogue's unsel cost
        back = jnp.take(rp_s[0, :] + rp_s[7, :] * 0.0, inv, axis=0)
        return back

    per = chained_time(t_sort, ro, rd, tmx, act, scene, short=2, long=10)
    print(f"(c) sort machinery only    : {per*1e3:7.2f} ms", flush=True)

    # (d) recull off, for the round-machinery share
    def t_rc0(o, d, tmx, act, sc):
        return trace_resident(sc, o, d, 1e-3, tmx, act, sort_rays=False,
                              rich=False, recull=0, tile_rays=128)[0].t

    per = chained_time(t_rc0, ro_s, rd_s, tmx, act, scene, short=2, long=10)
    print(f"(d) kernel recull=0        : {per*1e3:7.2f} ms "
          f"({n/per/1e6:6.2f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main()
