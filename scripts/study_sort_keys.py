"""CPU study: which wavefront sort key minimizes the resident tracer's
per-tile cluster-union work for scattered rays?

The kernel's cost model is sum over tiles of U(tile) x rows(tile), where
U = number of clusters any ray in the tile must visit (approximated here
as clusters whose slab interval intersects [0, t_hit(ray)] — the
front-to-back horizon stops visits past the first proven hit).

Candidate keys (all 32-bit):
  * oct3_pos24   — current production key (_morton_key): direction octant
                   (3 bits) major, 8-bit/axis interleaved origin cells
  * dir6_pos18   — 2-bit/axis signed direction bins major, 6-bit/axis origin
  * dir9_pos15   — 3-bit/axis direction bins major, 5-bit/axis origin
  * pos12_dir12  — origin major (4-bit/axis), direction minor
  * pos24_only   — pure position morton (no direction)

Usage: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/study_sort_keys.py [n_rays]
"""
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from pg2024_dprt_tpu.ops.trace_api import trace_closest
from pg2024_dprt_tpu.scene import device_scene_from_meshes, random_tri_soup


def spread3(x, bits):
    out = np.zeros_like(x)
    for b in range(bits):
        out |= ((x >> b) & 1) << (3 * b)
    return out


def morton3(q, bits):
    return (spread3(q[:, 0], bits) | (spread3(q[:, 1], bits) << 1)
            | (spread3(q[:, 2], bits) << 2))


def keys_for(name, o, d, lo, span):
    qn = lambda v, bits: np.clip(((v - lo) / span) * (2 ** bits - 1), 0,
                                 2 ** bits - 1).astype(np.uint32)
    dq = lambda bits: np.clip(((d * 0.5 + 0.5) * (2 ** bits - 1)), 0,
                              2 ** bits - 1).astype(np.uint32)
    if name == "oct3_pos24":
        oc = ((d[:, 0] >= 0).astype(np.uint32)
              + 2 * (d[:, 1] >= 0).astype(np.uint32)
              + 4 * (d[:, 2] >= 0).astype(np.uint32))
        return (oc << 24) | morton3(qn(o, 8), 8)
    if name == "dir6_pos18":
        return (morton3(dq(2), 2) << 18) | morton3(qn(o, 6), 6)
    if name == "dir9_pos15":
        return (morton3(dq(3), 3) << 15) | morton3(qn(o, 5), 5)
    if name == "pos12_dir12":
        return (morton3(qn(o, 4), 4) << 12) | morton3(dq(4), 4)
    if name == "pos24_only":
        return morton3(qn(o, 8), 8)
    if name == "pos18_dir6":
        return (morton3(qn(o, 6), 6) << 6) | morton3(dq(2), 2)
    raise ValueError(name)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    scene = device_scene_from_meshes([random_tri_soup(65536, seed=0)],
                                     tris_per_cluster=128)
    rng = np.random.RandomState(1)
    o = rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    hits = trace_closest(scene, jnp.asarray(o), jnp.asarray(d), 1e-3,
                         jnp.full((n,), 3.4e38, jnp.float32),
                         jnp.ones((n,), bool), tracer="stackless")
    t_hit = np.asarray(hits.t)
    print(f"{n} rays, hit rate {float(np.asarray(hits.is_hit).mean()):.3f}",
          flush=True)

    cmin = np.asarray(scene.cl_aabb_min)
    cmax = np.asarray(scene.cl_aabb_max)
    cnt = np.asarray(scene.cl_count)
    valid = cnt > 0
    k = cmin.shape[0]
    lo = cmin[valid].min(axis=0)
    hi = cmax[valid].max(axis=0)
    span = np.maximum(hi - lo, 1e-12)

    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    # (n, k) slab intervals
    t0 = (cmin[None] - o[:, None]) * inv[:, None]
    t1 = (cmax[None] - o[:, None]) * inv[:, None]
    enter = np.minimum(t0, t1).max(axis=2)
    exit_ = np.maximum(t0, t1).min(axis=2)
    entered = valid[None] & (enter <= exit_) & (exit_ > 0)
    needed = entered & (enter <= np.minimum(t_hit[:, None], 3e38) * 1.001 + 1e-4)
    per_ray = needed.sum(axis=1)
    print(f"clusters needed per ray: mean {per_ray.mean():.1f} "
          f"p50 {np.percentile(per_ray, 50):.0f} p95 {np.percentile(per_ray, 95):.0f}"
          f" | entered (no horizon): mean {entered.sum(axis=1).mean():.1f}",
          flush=True)

    for tm in (64, 128):
        print(f"-- tile={tm} (cost model: sum_u(tile) x tm/128; "
              f"{n // tm} tiles) --", flush=True)
        for name in ("oct3_pos24", "dir6_pos18", "dir9_pos15",
                     "pos12_dir12", "pos24_only", "pos18_dir6", "random"):
            if name == "random":
                perm = rng.permutation(n)
            else:
                key = keys_for(name, o, d, lo, span)
                perm = np.argsort(key, kind="stable")
            nd = needed[perm]
            ne = entered[perm]
            unions = np.asarray([nd[i: i + tm].any(axis=0).sum()
                                 for i in range(0, n, tm)])
            u_all = np.asarray([ne[i: i + tm].any(axis=0).sum()
                                for i in range(0, n, tm)])
            cost = unions.sum() * (tm / 128.0)
            print(f"  {name:12s}: U mean {unions.mean():7.1f} "
                  f"p95 {np.percentile(unions, 95):6.0f}  relcost {cost:9.0f}"
                  f"  U_all mean {u_all.mean():7.1f} p95 {np.percentile(u_all, 95):6.0f}",
                  flush=True)


if __name__ == "__main__":
    main()
