"""Probe Mosaic support for ops the frame megakernel needs:
  * jnp.arctan2 / jnp.arccos on f32 vectors (env-map lookup)
  * dot_general contracting dim1 x dim1 (one-hot attribute fetch, A @ B^T)
  * int32 multiply + logical right shift (in-kernel TEA/LCG)
  * sqrt, sigmoid-free — sanity

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_mosaic_ops.py
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def k_trig(x_ref, o_ref):
    x = x_ref[:]
    a = jnp.arctan2(x, 1.0 - x)
    b = jnp.arccos(jnp.clip(x, -1.0, 1.0))
    o_ref[:] = a + b


def k_dotT(a_ref, b_ref, o_ref):
    a = a_ref[:]            # (128, 256)
    b = b_ref[:]            # (12, 256)
    o_ref[:] = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                        # (128, 12)


def k_tea(x_ref, o_ref):
    v0 = x_ref[:]
    v1 = v0 * jnp.int32(7)
    s0 = jnp.int32(0)
    C = lambda u: jnp.int32(np.int32(np.uint32(u)))
    for _ in range(4):
        s0 = s0 + C(0x9E3779B9)
        v0 = v0 + ((((v1 << 4) + C(0xA341316C)) ^ (v1 + s0))
                   ^ (jax.lax.shift_right_logical(v1, 5) + C(0xC8013EA4)))
        v1 = v1 + ((((v0 << 4) + C(0xAD90777D)) ^ (v0 + s0))
                   ^ (jax.lax.shift_right_logical(v0, 5) + C(0x7E95761E)))
    nxt = C(1664525) * v0 + C(1013904223)
    o_ref[:] = (nxt & C(0x00FFFFFF)).astype(jnp.float32) / jnp.float32(1 << 24)


def run(name, kern, args, out_shape):
    try:
        f = pl.pallas_call(kern, out_shape=out_shape)
        r = np.asarray(f(*args))
        print(f"{name}: OK  sample={r.ravel()[:3]}")
        return r
    except Exception as e:
        print(f"{name}: FAIL  {type(e).__name__}: {str(e)[:300]}")
        return None


def main():
    x = jnp.linspace(-0.9, 0.9, 128 * 128).reshape(128, 128)
    r = run("trig", k_trig, [x], jax.ShapeDtypeStruct((128, 128), jnp.float32))
    if r is not None:
        ref = np.arctan2(np.asarray(x), 1 - np.asarray(x)) + np.arccos(np.clip(np.asarray(x), -1, 1))
        print("  trig max err:", np.abs(r - ref).max())

    a = jax.random.uniform(jax.random.PRNGKey(0), (128, 256))
    b = jax.random.uniform(jax.random.PRNGKey(1), (12, 256))
    r = run("dotT", k_dotT, [a, b], jax.ShapeDtypeStruct((128, 12), jnp.float32))
    if r is not None:
        ref = np.asarray(a) @ np.asarray(b).T
        print("  dotT max err:", np.abs(r - ref).max())

    xi = jnp.arange(128 * 128, dtype=jnp.int32).reshape(128, 128)
    r = run("tea", k_tea, [xi], jax.ShapeDtypeStruct((128, 128), jnp.float32))
    if r is not None:
        from pg2024_dprt_tpu.core.rng import rnd, tea
        seeds = tea(jnp.asarray(xi, jnp.uint32).ravel(), jnp.asarray(xi, jnp.uint32).ravel() * 0 + jnp.uint32(0))
        # cross-check the int32 kernel TEA against the uint32 oracle
        v0 = np.asarray(xi, np.uint32) * 7  # mirrors kernel's v1 = 7*v0
        print("  tea sample:", np.asarray(r).ravel()[:4])


if __name__ == "__main__":
    main()


def k_trig2(x_ref, o_ref):
    x = x_ref[:]
    a = jnp.cos(x * 3.0) + jnp.sin(x * 2.0)
    b = jnp.floor(x * 7.0)
    i = b.astype(jnp.int32)
    r = jax.lax.rem(i, jnp.int32(5))
    o_ref[:] = a + b + r.astype(jnp.float32) + jnp.sqrt(jnp.abs(x))


def k_dotT_hi(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def main2():
    x = jnp.linspace(-0.9, 0.9, 128 * 128).reshape(128, 128)
    r = run("trig2", k_trig2, [x], jax.ShapeDtypeStruct((128, 128), jnp.float32))
    if r is not None:
        xn = np.asarray(x)
        ref = (np.cos(xn * 3) + np.sin(xn * 2) + np.floor(xn * 7)
               + np.fmod(np.floor(xn * 7).astype(np.int32), 5) + np.sqrt(np.abs(xn)))
        print("  trig2 max err:", np.abs(r - ref).max())
    # exact one-hot extraction at HIGHEST
    oh = jnp.zeros((128, 256)).at[jnp.arange(128), jnp.arange(128) * 2].set(1.0)
    b = jax.random.uniform(jax.random.PRNGKey(1), (12, 256))
    r = run("dotT_hi", k_dotT_hi, [oh, b], jax.ShapeDtypeStruct((128, 12), jnp.float32))
    if r is not None:
        ref = np.asarray(oh) @ np.asarray(b).T
        print("  dotT_hi max err:", np.abs(r - ref).max())


main2()


def k_layout(x_ref, o_ref):
    x = x_ref[:]                       # (128, 8)
    xt = jnp.transpose(x, (1, 0))      # (8, 128)
    row = xt[0:1, :] + xt[1:2, :]      # (1, 128) row math
    back = jnp.transpose(row * 2.0, (1, 0))  # (128, 1)
    o_ref[:] = x + jnp.broadcast_to(back, (128, 8))


def k_reshape(x_ref, o_ref):
    x = x_ref[:]                       # (4, 128)
    f = x.reshape(1, 512)              # row-major flatten
    o_ref[:] = f


def k_iota0(x_ref, o_ref):
    idx = x_ref[:]                     # (1, 128) i32
    oh = (jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0)
          == jnp.broadcast_to(idx, (256, 128))).astype(jnp.float32)
    o_ref[:] = oh


def main3():
    x = jax.random.uniform(jax.random.PRNGKey(2), (128, 8))
    r = run("layout", k_layout, [x], jax.ShapeDtypeStruct((128, 8), jnp.float32))
    if r is not None:
        xn = np.asarray(x)
        back = ((xn[:, 0] + xn[:, 1]) * 2.0)[:, None]
        print("  layout max err:", np.abs(r - (xn + back)).max())
    y = jnp.arange(512, dtype=jnp.float32).reshape(4, 128)
    r = run("reshape", k_reshape, [y], jax.ShapeDtypeStruct((1, 512), jnp.float32))
    if r is not None:
        print("  reshape ok:", bool((np.asarray(r).ravel() == np.arange(512)).all()))
    idx = jnp.arange(128, dtype=jnp.int32).reshape(1, 128) * 2
    r = run("iota0", k_iota0, [idx], jax.ShapeDtypeStruct((256, 128), jnp.float32))
    if r is not None:
        ref = np.zeros((256, 128), np.float32)
        ref[np.arange(128) * 2, np.arange(128)] = 1.0
        print("  iota0 ok:", bool((np.asarray(r) == ref).all()))


main3()
