"""Bit-exact TEA/LCG random number generation.

Reimplements the RNG used by the reference renderer so that per-pixel sampling
decisions are reproducible (reference: /root/reference/optix/random.hpp:31-67,
consumed e.g. at /root/reference/optix/kernel.cu:54-56,75-78).

All ops are uint32 arithmetic; everything is vectorized over arrays of seeds so
one call services a whole wavefront. Runs under jit on TPU (uint32 supported
natively by the VPU).
"""
from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32


def tea(val0, val1, rounds: int = 4):
    """TEA-4 hash of two uint32 values -> uint32 seed (vectorized)."""
    v0 = jnp.asarray(val0).astype(_U32)
    v1 = jnp.asarray(val1).astype(_U32)
    s0 = _U32(0)
    for _ in range(rounds):
        s0 = _U32(s0 + _U32(0x9E3779B9))
        v0 = v0 + ((((v1 << 4) + _U32(0xA341316C)) ^ (v1 + s0)) ^ ((v1 >> 5) + _U32(0xC8013EA4)))
        v1 = v1 + ((((v0 << 4) + _U32(0xAD90777D)) ^ (v0 + s0)) ^ ((v0 >> 5) + _U32(0x7E95761E)))
    return v0


def _lcg(prev):
    """LCG step; returns (new_state, 24 random bits)."""
    nxt = _U32(1664525) * prev + _U32(1013904223)
    return nxt, nxt & _U32(0x00FFFFFF)


def rnd(seed):
    """One float in [0,1) per seed; returns (new_seed, x)."""
    seed, bits = _lcg(seed)
    return seed, bits.astype(jnp.float32) / jnp.float32(0x01000000)


def rnd2(seed):
    """Two floats in [0,1) per seed; returns (new_seed, x1, x2)."""
    seed, x1 = rnd(seed)
    seed, x2 = rnd(seed)
    return seed, x1, x2


def rnd3(seed):
    """Three floats in [0,1) per seed; returns (new_seed, x1, x2, x3)."""
    seed, x1 = rnd(seed)
    seed, x2 = rnd(seed)
    seed, x3 = rnd(seed)
    return seed, x1, x2, x3
