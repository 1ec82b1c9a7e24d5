"""The chained-timing harness must keep its fold bounded and bit-changing
(scripts/diag_chain.py documents the two ~10x distortion modes of the naive
fold: miss-sentinel poisoning and the relay's identical-input fast path)."""
import numpy as np
import jax.numpy as jnp

from pg2024_dprt_tpu.utils.benchmarking import chained_time


def test_fold_survives_miss_sentinel():
    """A fn returning the 3.4e38 miss sentinel must not blow up the chained
    operand: every iteration's input stays within ~1e-4 of the original."""
    seen = []

    def fn(o):
        seen.append(1)
        return jnp.full((4,), 3.402823466e38, jnp.float32)

    o = jnp.ones((8,), jnp.float32)
    per = chained_time(fn, o, short=1, long=3, reps=1)
    assert np.isfinite(per)


def test_fold_changes_bits_per_iteration():
    """Iteration inputs must be pairwise distinct (the relay fast-paths
    bit-identical repeated work) while staying semantically negligible."""
    import jax

    logged = []

    def fn(o):
        logged.append(None)
        return o * 1.0 + 1.0

    @jax.jit
    def chain3(o):
        # replicate the harness fold for 3 steps and return the inputs
        outs = []
        o_c = o
        for i in range(3):
            out = fn(o_c)
            s = jnp.clip(jnp.reshape(out, (-1,))[0].astype(jnp.float32), -1.0, 1.0)
            o_c = o_c + (s + 1.0) * jnp.float32(i + 1) * 1e-6
            outs.append(o_c)
        return jnp.stack(outs)

    o = jnp.full((4,), 0.5, jnp.float32)
    tr = np.asarray(chain3(o))
    assert not np.array_equal(tr[0], tr[1])
    assert not np.array_equal(tr[1], tr[2])
    assert np.all(np.abs(tr - 0.5) < 1e-4)
