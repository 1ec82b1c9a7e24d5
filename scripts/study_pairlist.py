"""Machinery-cost study for the global dense ray×cluster pair-list scheduler
(VERDICT r3 item 8 — the one untried incoherent-wavefront idea).

DESIGN ANALYSIS (why "in-kernel pair list" cannot win WITHIN a tile): MT
vector ops fill the full 8x128 vreg regardless of how many lanes/sublanes
are live, so per-tile ray compaction per visit only re-shapes the same
(#union-clusters x tile-width x cluster-tris) work — the 5.7x ray-tri-test
reduction (entered 8.3/ray vs union ~47/tile) is only realizable by packing
cluster-c enterers from MANY tiles into full 128-wide rows, i.e. a GLOBAL
group-by-cluster.  In-kernel global grouping needs either ~47 dynamic-
offset HBM DMAs per tile (~24k tiny DMAs) or scalar-core scatter loops
(~540k scalar stores), both order-of-magnitude losers.  So the only viable
form is the XLA machinery chain:

  slab cull (N,K) -> per-ray top-MAXC entered clusters -> flatten to pairs
  -> sort pairs by cluster -> gather ray rows -> transposed chunk kernel
  -> scatter-min per ray

This script MEASURES each machinery stage honestly (chained fold,
utils/benchmarking.py) at the 64k x 512-cluster production shape.  The MT
win bound is visit-work (9.6 of 12.8 ms) x (1 - 8.3/47) ~ 7.9 ms; the
machinery must come in well under that for the scheduler to pay.

Result (v5e via tunnel, 2026-08-21, best-of-3 chained slopes, MEASURED):
    cull_mask_64kx512       0.50 ms   ((N,K) slab test alone — cheap)
    topk16_64kx512          7.63 ms   (top-16 entered extraction — DOMINANT)
    sort_1m_pairs           1.01 ms   (u32 key-value sort of N*16 slots)
    gather_540k_rows        0.88 ms   (8-f32 ray rows by sorted pair index)
    scatter_min_540k        3.58 ms   (per-ray closest merge)
    TOTAL machinery        13.09 ms   vs ~7.9 ms best-case MT win
CONCLUSION: negative — the machinery alone exceeds the entire incoherent
trace (12.8 ms).  The surprise is WHERE it dies: the sort is cheap (1 ms);
per-ray entered-cluster EXTRACTION (top_k over 512-wide rows, 7.6 ms) and
the per-ray closest scatter-merge (3.6 ms) dominate.  Extraction could
move in-kernel (the resident cull already materializes the (TM, K) enter
matrix per tile), but the scatter-min + gather + sort residue (~5.5 ms)
still buys at most ~2 ms net on a 12.8 ms trace — inside tunnel variance
— and the in-kernel global group-by-cluster alternatives were analyzed
above as order-of-magnitude losers (24k dynamic DMAs / 540k scalar
stores).  Recorded as the measured negative result closing VERDICT r3
item 8; the cluster-schedule-sorted resident kernel stays the production
incoherent path at its ~90%-of-union-floor plateau.
"""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from pg2024_dprt_tpu.utils.benchmarking import chained_time

N = 65536
K = 512
MAXC = 16
P = N * MAXC  # pair slots


def main():
    rng = np.random.RandomState(0)
    o = jnp.asarray(rng.rand(N, 3).astype(np.float32))
    d = jnp.asarray(rng.rand(N, 3).astype(np.float32) - 0.5)
    lo = jnp.asarray(rng.rand(K, 3).astype(np.float32) * 0.9)
    hi = lo + 0.1
    rows = []

    def cull(o, d, lo, hi):
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
        t0 = (lo[None] - o[:, None]) * inv[:, None]
        t1 = (hi[None] - o[:, None]) * inv[:, None]
        te = jnp.max(jnp.minimum(t0, t1), -1)
        tx = jnp.min(jnp.maximum(t0, t1), -1)
        return jnp.where((tx >= te) & (tx > 0), te, jnp.float32(3.4e38))

    t = chained_time(lambda oo: cull(oo, d, lo, hi)[:, 0], o)
    rows.append(("cull_mask_64kx512", t * 1e3))

    def topk(o, d, lo, hi):
        te = cull(o, d, lo, hi)
        v, idx = jax.lax.top_k(-te, MAXC)
        return -v  # (N, MAXC) nearest entered

    t = chained_time(lambda oo: topk(oo, d, lo, hi)[:, 0], o)
    rows.append(("topk16_64kx512", t * 1e3))

    keys0 = jnp.asarray(rng.randint(0, K, P).astype(np.uint32))
    vals0 = jnp.asarray(np.arange(P, dtype=np.uint32))

    def sort_pairs(o, keys, vals):
        # key perturbed from o so the relay can't memoize identical sorts
        k = keys ^ jnp.uint32(jnp.abs(o[0, 0]) * 7)
        sk, sv = jax.lax.sort((k, vals), num_keys=1)
        return sv[:8].astype(jnp.float32)

    t = chained_time(lambda oo: sort_pairs(oo, keys0, vals0), o)
    rows.append(("sort_1m_pairs", t * 1e3))

    ridx = jnp.asarray(rng.randint(0, N, 540_000).astype(np.int32))
    rays8 = jnp.asarray(rng.rand(N, 8).astype(np.float32))

    def gather_rows(o, rays8, ridx):
        r = rays8.at[0, 0].set(o[0, 0])
        return jnp.take(r, ridx, axis=0)[:4, 0]

    t = chained_time(lambda oo: gather_rows(oo, rays8, ridx), o)
    rows.append(("gather_540k_rows", t * 1e3))

    tvals = jnp.asarray(rng.rand(540_000).astype(np.float32))

    def scatter_min(o, tvals, ridx):
        tv = tvals * (1.0 + o[0, 0] * 1e-7)
        out = jnp.full((N,), 3.4e38, jnp.float32).at[ridx].min(tv)
        return out[:4]

    t = chained_time(lambda oo: scatter_min(oo, tvals, ridx), o)
    rows.append(("scatter_min_540k", t * 1e3))

    total = sum(v for _, v in rows[2:]) + rows[1][1]  # topk includes cull
    for name, v in rows:
        print(f"{name:24s} {v:8.3f} ms")
    print(f"{'TOTAL machinery':24s} {total:8.3f} ms  (win bound ~7.9 ms)")


if __name__ == "__main__":
    main()
