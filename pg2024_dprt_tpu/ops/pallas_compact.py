"""In-kernel compaction primitives: lane prefix sums + one-hot MXU permutes.

The reference compacts work queues with a standalone GPU scan-kernel family
(Hillis-Steele / Blelloch, /root/reference/src/cuda/cuda_compaction.cu:37-138
and :441-530 for the NN query grouping).  On this backend every extra launch
costs more than the scan itself, so the same primitive moves INSIDE the
Pallas programs that need it:

  * `lane_cumsum_exclusive` — Hillis-Steele log-shift scan along the lane
    axis of an (R, L) block (vector concat+add steps; no MXU, no scratch).
  * `object_ranks` — per-object membership masks and exclusive ranks for a
    row of small integer ids: the in-kernel equivalent of the reference's
    `Work_Efficient_Scan_For_NN` query grouping (queries keep their slots;
    consumers gather rank-compacted rows with one-hot matmuls at HIGHEST
    precision, which is exact for 0/1 selectors).

Canonical pattern — gather `rows_of(rank in [c*CH, (c+1)*CH))` with a
(CH, Q) one-hot, run the dense stage on CH rows, scatter back with the
transposed one-hot.

MEASURED NOTE (round 3): query-compaction-by-object in the route megakernel
(ops/pallas_route.py) cut NN rows 6x but saved only ~4 of 12 ms — that
stage is LAYER-LATENCY-bound (dependent matmul count), so it now uses
one concatenated matmul per layer instead.  These primitives remain for
stages whose dense work genuinely scales with rows.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def lane_cumsum_exclusive(x, l: int):
    """Exclusive prefix sum along axis 1 of an (R, L) f32 block (Hillis-
    Steele log-shift form; L is the static lane count).  Exact for counts
    below 2^24."""
    acc = x
    s = 1
    while s < l:
        acc = acc + jnp.concatenate(
            [jnp.zeros((x.shape[0], s), x.dtype), acc[:, : l - s]], axis=1)
        s *= 2
    return acc - x


def object_ranks(ids_row, p: int, q: int):
    """Membership masks and exclusive ranks for a (1, Q) f32 row of object
    ids in [0, p) (negative = unassigned).  Returns (S, ranks), both (p, Q)
    f32: S[o, j] = 1 iff ids[j] == o; ranks[o, j] = #{i < j : ids[i] == o}.
    Row o's total count is ranks[o, -1] + S[o, -1]."""
    # Mosaic has no f32 iota: build i32 and convert
    rows = jax.lax.broadcasted_iota(jnp.int32, (p, q), 0).astype(jnp.float32)
    sel = (jnp.broadcast_to(ids_row, (p, q)) == rows).astype(jnp.float32)
    return sel, lane_cumsum_exclusive(sel, q)


def chunk_onehot(rank_col, sel_col, base, ch: int):
    """(Q, CH) one-hot selector for the rows whose rank falls in
    [base, base + ch): entry [j, i] = 1 iff sel[j] and rank[j] == base + i.
    rank_col/sel_col are (Q, 1) f32 columns, base a traced scalar.  The
    transpose is the gather operand; this orientation is the scatter
    operand."""
    q = rank_col.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (q, ch), 1).astype(jnp.float32)
    r = jnp.broadcast_to(rank_col, (q, ch)) - base
    s = jnp.broadcast_to(sel_col, (q, ch))
    return jnp.where((r == lane) & (s > 0.5), 1.0, 0.0)
