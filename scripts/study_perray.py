"""Size the per-ray-scheduling prize for incoherent wavefronts (VERDICT r2 #1).

Simulates EXACT per-ray front-to-back cluster traversal (each ray visits its
own clusters in enter order, stopping once the next enter exceeds its own
committed t) on the bench_suite incoherent_64k workload, then asks:

  1. How many cluster visits does each ray actually NEED?  (The per-ray
     lower bound of any scheduler.)
  2. Under tile-dispatch (the resident kernel: one (TM, C) MT per DISTINCT
     cluster needed by any ray of the tile), what per-tile union does each
     candidate ray ORDERING give?  morton (production today) vs
     first-visited-cluster vs visit-signature orderings.

Pure numpy/CPU; run: JAX_PLATFORMS=cpu PYTHONPATH=. python scripts/study_perray.py
"""
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from pg2024_dprt_tpu.scene import device_scene_from_meshes, random_tri_soup  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    tpc = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    scene = device_scene_from_meshes([random_tri_soup(65536, seed=0)],
                                     tris_per_cluster=tpc)
    k = scene.cl_aabb_min.shape[0]
    c = scene.cl_tri_table.shape[1] // 10
    print(f"K={k} clusters, C={c} tris/cluster")

    rng = np.random.RandomState(1)
    o = rng.rand(65536, 3).astype(np.float32) * 1.4 - 0.2
    d = rng.randn(65536, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = o[:n], d[:n]

    cmin = np.asarray(scene.cl_aabb_min)  # (K,3)
    cmax = np.asarray(scene.cl_aabb_max)
    ccount = np.asarray(scene.cl_count)
    mt = np.asarray(scene.cl_mt_table).reshape(k, 16, c)

    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    t0 = (cmin[None, :, :] - o[:, None, :]) * inv[:, None, :]
    t1 = (cmax[None, :, :] - o[:, None, :]) * inv[:, None, :]
    enter = np.maximum(np.minimum(t0, t1).max(axis=2), 0.0)  # (N,K)
    exit_ = np.maximum(t0, t1).min(axis=2)
    ok = (enter <= exit_ * (1 + 4e-7) + 1e-7) & (exit_ > 0) & (ccount[None, :] > 0)
    enter = np.where(ok, enter, np.inf)

    entered_count = np.isfinite(enter).sum(axis=1)
    print(f"per-ray clusters ENTERED (no pruning): mean {entered_count.mean():.1f} "
          f"p50 {np.percentile(entered_count, 50):.0f} p95 {np.percentile(entered_count, 95):.0f}")

    # exact per-ray front-to-back sim, vectorized by visit round
    order = np.argsort(enter, axis=1)  # (N,K) cluster ids, front-to-back
    en_sorted = np.take_along_axis(enter, order, axis=1)
    t_com = np.full((n,), np.float32(np.inf))
    visits = np.zeros((n,), np.int64)
    visited = []  # per-round (ray_ids, cluster_ids)
    for j in range(k):
        act = en_sorted[:, j] < np.minimum(t_com, np.inf)
        act &= np.isfinite(en_sorted[:, j])
        if not act.any():
            break
        r = np.nonzero(act)[0]
        cl = order[r, j]
        visits[r] += 1
        visited.append((r, cl))
        # dense MT of each active ray against its cluster
        tri = mt[cl]  # (R, 16, C)
        ox, dx = o[r][:, :, None], d[r][:, :, None]
        s = ox - tri[:, 0:3]
        m = np.cross(s, dx, axis=1)
        nrm = tri[:, 9:12]
        det = -(dx * nrm).sum(axis=1)
        u = (tri[:, 6:9] * m).sum(axis=1)
        v = -(tri[:, 3:6] * m).sum(axis=1)
        t_raw = (nrm * s).sum(axis=1)
        okd = np.abs(det) > 1e-12
        t = np.where(okd, t_raw / np.where(okd, det, 1.0), np.inf)
        neg = det < 0
        su, sv = np.where(neg, -u, u), np.where(neg, -v, v)
        hit = okd & (su >= 0) & (sv >= 0) & (su + sv <= np.abs(det)) & (t > 1e-3)
        tmin = np.where(hit, t, np.inf).min(axis=1)
        t_com[r] = np.minimum(t_com[r], tmin)
    print(f"per-ray visits NEEDED (front-to-back, exact pruning): "
          f"mean {visits.mean():.2f} p50 {np.percentile(visits, 50):.0f} "
          f"p95 {np.percentile(visits, 95):.0f} max {visits.max()}")
    print(f"hit rate {np.isfinite(t_com).mean():.3f}")

    # needed sets per ray
    need = [[] for _ in range(n)]
    for r, cl in visited:
        for ri, ci in zip(r, cl):
            need[ri].append(ci)
    first = np.asarray([s[0] if s else k for s in need])
    second = np.asarray([s[1] if len(s) > 1 else k for s in need])

    def tile_unions(perm, tm=128):
        tot = 0
        tiles = 0
        for i in range(0, n, tm):
            ids = perm[i : i + tm]
            u = set()
            for ri in ids:
                u.update(need[ri])
            tot += len(u)
            tiles += 1
        return tot / tiles

    from pg2024_dprt_tpu.ops.pallas_tracer import _morton_key

    mk = np.asarray(_morton_key(scene, jnp.asarray(o), jnp.asarray(d)))
    orderings = {
        "arrival (unsorted)": np.arange(n),
        "morton (production)": np.argsort(mk, kind="stable"),
        "first-cluster": np.argsort(first, kind="stable"),
        "(first, morton)": np.lexsort((mk, first)),
        "(first, second)": np.lexsort((second, first)),
    }
    tm = 128
    for name, perm in orderings.items():
        au = tile_unions(perm, tm)
        ms = au * (n / tm) * 0.35e-3  # measured 0.35 us/visit at (128,128)
        print(f"union/tile tm={tm} {name:22s}: {au:7.1f}  (-> ~{ms:.1f} ms/64k "
              f"at 0.35us/visit, scaled {au * (65536 / tm) * 0.35e-3:.1f})")
    # per-ray floor in dense-pair terms
    pair_visits = visits.sum() / (n / tm)
    print(f"dense per-ray pair floor: {visits.mean():.2f} visits/ray = "
          f"{pair_visits:.0f} pair-rows/tile-of-{tm} "
          f"(~{visits.sum() / tm * 0.35e-3 * (65536 / n):.1f} ms/64k if packed dense)")

    # (ordering x tile size) cost matrix with the row-scaled visit model:
    # per visit = 0.09us table fetch + 0.30us * rows/128 MT + 0.02us sel
    for oname, perm in (("morton", np.argsort(mk, kind="stable")),
                        ("(first, second)", np.lexsort((second, first)))):
        for s in (16, 32, 64, 128, 256):
            tot = 0
            for i in range(0, n, s):
                ids = perm[i : i + s]
                u = set()
                for ri in ids:
                    u.update(need[ri])
                tot += len(u)
            sub = tot / (n / s)
            ms = (65536 / s) * sub * (0.09 + 0.30 * max(s, 8) / 128 + 0.02) * 1e-3
            print(f"tiles S={s:3d} {oname:16s} union {sub:6.2f} -> ~{ms:5.1f} ms/64k "
                  "(row-scaled model)")

    # pair-list scheduling: pairs sorted by cluster, dense tiles of TM pairs,
    # one (TM, C) MT per distinct cluster per tile
    def pair_tiles(pairs_cl, tmp):
        srt = np.sort(pairs_cl)
        nv = 0
        for i in range(0, srt.shape[0], tmp):
            nv += len(np.unique(srt[i : i + tmp]))
        return nv

    ent_pairs = np.nonzero(np.isfinite(enter))[1]  # cluster ids of all entered pairs
    need_pairs = np.concatenate([cl for _, cl in visited])
    for tag, pc in (("entered (no pruning)", ent_pairs), ("needed (oracle)", need_pairs)):
        for tmp in (128, 256):
            nv = pair_tiles(pc, tmp)
            ms = nv * 0.35e-3 * (65536 / n)
            print(f"pair-list {tag:20s} TM={tmp}: {pc.shape[0]/n:5.2f} pairs/ray, "
                  f"{nv} visits -> ~{ms:.2f} ms/64k kernel work")

    # 2-phase: phase 1 visits each ray's first 2 clusters (dense pair list),
    # committed t from those; phase 2 = entered pairs with enter < t_phase1
    t_p1 = np.full((n,), np.float32(np.inf))
    for j in (0, 1):
        act = np.isfinite(en_sorted[:, j])
        r = np.nonzero(act)[0]
        cl = order[r, j]
        tri = mt[cl]
        ox, dx = o[r][:, :, None], d[r][:, :, None]
        s_ = ox - tri[:, 0:3]
        m = np.cross(s_, dx, axis=1)
        nrm = tri[:, 9:12]
        det = -(dx * nrm).sum(axis=1)
        u = (tri[:, 6:9] * m).sum(axis=1)
        v = -(tri[:, 3:6] * m).sum(axis=1)
        t_raw = (nrm * s_).sum(axis=1)
        okd = np.abs(det) > 1e-12
        t = np.where(okd, t_raw / np.where(okd, det, 1.0), np.inf)
        neg = det < 0
        su, sv = np.where(neg, -u, u), np.where(neg, -v, v)
        hit = okd & (su >= 0) & (sv >= 0) & (su + sv <= np.abs(det)) & (t > 1e-3)
        t_p1[r] = np.minimum(t_p1[r], np.where(hit, t, np.inf).min(axis=1))
    p1_pairs = np.isfinite(en_sorted[:, :2]).sum()
    surv = enter < np.minimum(t_p1, np.inf)[:, None]
    surv[np.arange(n)[:, None], order[:, :2]] = False  # already visited
    p2_cl = np.nonzero(surv)[1]
    nv1 = pair_tiles(order[np.isfinite(en_sorted[:, 0]), 0], 128) + pair_tiles(
        order[np.isfinite(en_sorted[:, 1]), 1], 128)
    nv2 = pair_tiles(p2_cl, 128)
    ms = (nv1 + nv2) * 0.35e-3 * (65536 / n)
    print(f"2-phase: p1 {p1_pairs/n:.2f} pairs/ray + p2 {p2_cl.shape[0]/n:.2f} "
          f"pairs/ray = {nv1}+{nv2} visits -> ~{ms:.2f} ms/64k kernel work")


if __name__ == "__main__":
    main()
