"""In-kernel compaction primitives (ops/pallas_compact.py) vs numpy."""
import numpy as np
import jax.numpy as jnp

from pg2024_dprt_tpu.ops.pallas_compact import (
    chunk_onehot, lane_cumsum_exclusive, object_ranks)


def test_lane_cumsum_exclusive():
    rng = np.random.RandomState(0)
    for r, l in ((1, 384), (8, 512), (3, 128), (8, 100)):
        x = rng.randint(0, 2, size=(r, l)).astype(np.float32)
        got = np.asarray(lane_cumsum_exclusive(jnp.asarray(x), l))
        want = np.cumsum(x, axis=1) - x
        np.testing.assert_array_equal(got, want)


def test_object_ranks_and_chunks():
    rng = np.random.RandomState(1)
    p, q = 8, 384
    ids = rng.randint(-1, p, size=(q,)).astype(np.float32)
    sel, ranks = object_ranks(jnp.asarray(ids)[None, :], p, q)
    sel = np.asarray(sel)
    ranks = np.asarray(ranks)
    for o in range(p):
        m = ids == o
        np.testing.assert_array_equal(sel[o], m.astype(np.float32))
        np.testing.assert_array_equal(ranks[o], np.cumsum(m) - m)
    # chunked gather/scatter round-trip: values land in rank order and
    # scatter back to their original rows exactly
    vals = rng.randn(q, 5).astype(np.float32)
    o = 3
    cnt = int((ids == o).sum())
    ch = 64
    out = np.zeros((q, 5), np.float32)
    gathered = []
    for c0 in range(0, cnt + ch - 1, ch):
        if c0 >= cnt:
            break
        ohT = np.asarray(chunk_onehot(
            jnp.asarray(ranks[o])[:, None], jnp.asarray(sel[o])[:, None],
            jnp.float32(c0), ch))                       # (Q, CH)
        g = ohT.T @ vals                                # (CH, 5)
        gathered.append(g)
        out += ohT @ g
    rows = np.nonzero(ids == o)[0]
    np.testing.assert_array_equal(out[rows], vals[rows])
    others = np.nonzero(ids != o)[0]
    assert (out[others] == 0).all()
    g_all = np.concatenate(gathered)[:cnt]
    np.testing.assert_array_equal(g_all, vals[rows])
