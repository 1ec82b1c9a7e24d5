"""Honest timing on the axon TPU tunnel.

The relay defers, memoizes, and can merge in-flight work whose results are
never fetched to the host — `jax.block_until_ready` alone does NOT force
execution (measured: a fixed-trip-count Pallas loop "ran" at 0.006 us/iter
under naive batch timing).  `chained_time` forces real sequential execution
by chaining each call's input on the previous call's output inside one jit,
fetches the final scalar to host, and reports the slope between a short and
a long chain (cancelling the fixed ~30 ms tunnel round-trip latency).

THE FOLD MUST BE BOUNDED AND BIT-CHANGING (round-2 discovery,
scripts/diag_chain.py).  Two silent failure modes of the naive
`o + out[0] * 1e-30` fold, each measured at ~10x distortion:

  * POISONING — if chain-fold ray 0 *misses*, out[0] is the 3.4e38 miss
    sentinel, so the fold shifts every origin by +3.4e8 per iteration and
    all subsequent iterations trace degenerate rays that cull everything
    (camera chains read 2.4 ms for a true 4.6 ms wavefront; bench.py's
    camera ray 0 is off-scene).
  * IDENTITY FAST-PATH — if out[0] is a small hit t, the product
    underflows against O(1) origins, every iteration is bit-identical, and
    the relay services repeated identical work ~10x fast (incoherent
    chains read 5.2 ms for a true 51.9 ms wavefront, seed-dependent).

The fix folds a CLIPPED scalar scaled by the iteration index: bounded (a
miss sentinel becomes 1.0), bit-real (~1e-6 origin shift per iteration —
semantically negligible, but every iteration's input is distinct), and
still sequentially dependent on the previous output.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def chained_time(fn, o, *args, short: int = 2, long: int = 12, reps: int = 3):
    """Per-call wall time of `fn(o, *args) -> scalar-reducible array`.

    fn must return an array; a bounded scalar of it is folded back into `o`
    (a float array) to chain iterations.  Returns seconds per call."""
    @jax.jit
    def chain(o, nc, *args):
        def step(i, carry):
            o_c, acc = carry
            out = fn(o_c, *args)
            s = jnp.reshape(out, (-1,))[0].astype(jnp.float32)
            s = jnp.clip(s, -1.0, 1.0)          # miss sentinels must not poison
            # iteration-indexed, bit-changing, ~1e-6-negligible perturbation:
            # defeats the relay's identical-input fast path while preserving
            # the sequential dependency on the previous call's output
            return o_c + (s + 1.0) * (i + 1).astype(jnp.float32) * 1e-6, acc + s
        _, acc = jax.lax.fori_loop(0, nc, step, (o, jnp.float32(0)))
        return acc

    rng = np.random.RandomState(int(time.time() * 1e6) % 2**31)
    ts = {}
    for nc in (short, long):
        best = float("inf")
        for _ in range(reps):
            oo = o + jnp.asarray(rng.rand(1).astype(np.float32) * 1e-5)
            float(np.asarray(chain(oo, 1, *args)))   # warm / fill caches
            t0 = time.time()
            acc = chain(oo, nc, *args)
            float(np.asarray(acc))                   # force execution
            best = min(best, time.time() - t0)
        ts[nc] = best
    return (ts[long] - ts[short]) / (long - short)
