"""Ablate the two-level instanced tracer's camera_4m_instanced row:
base (non-instanced) vs 1-instance vs 8-instance, tpc 128/512.

Usage: PYTHONPATH=. python scripts/study_instanced.py

RESULTS (v5e tunnel, 2026-08-20, 64k-ray wavefront, honest chained slope):
  BEFORE instance-aware grouping (flat selection, K = I x KB):
    inst8_4m_tpc512   307.9 ms   (0.21 Mrays/s; bench_suite r4 first run)
    inst8_4m_tpc128   VMEM OOM   (48k-cluster xf + boxes blew the 16 MB cap)
  AFTER (grouped two-level cull instance-aware + per-INSTANCE cl_xf):
    base_512k_tpc512     8.06 ms   K=1487
    inst1_512k_tpc512    9.99 ms   (transform overhead ~24%)
    inst8_4m_tpc512     12.84 ms   K=11896  -> 5.1 Mrays/s, 24x
    base_512k_tpc128    11.00 ms   K=6024
    inst1_512k_tpc128   15.32 ms
    inst8_4m_tpc128     17.46 ms   K=48192 (no longer OOMs)
  The flat instanced path had no affordable cull at K ~ 10k (group_ok was
  gated off for instanced scenes); the per-visit object-space transform
  itself costs ~25%.

KNOB SWEEP (8-inst grazing bench view, scale mode): auto (grouped exact
  group cull) 27.9 ms is the optimum — interval group keys 52.1 (looser
  front-to-back), recull=16 28.5 (wash), flat+interval 293.6 (the old
  default).  SCALE CEILING (measured): K=95168 (64 inst x tpc512) fails
  Mosaic compile flat AND grouped; K=47680 (tpc1024) fails too
  (tpu_compile_helper crash); K=24768 (auto tpc=2048, kg=3136) COMPILES
  and a 64k wavefront over the 33.5M-effective-tri scene RUNS on one chip
  (~244 ms single-call wall incl tunnel RTT; the chained-slope harness
  itself pushes scoped VMEM 1.5M over the 16M cap at c=2048, so no honest
  chained number at this scale).  The adaptive tpc rule (128/512/2048 at
  256k/8M boundaries) keeps instanced scenes inside the compile envelope.
"""
import sys

sys.path.insert(0, ".")

import numpy as np
import jax.numpy as jnp

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.ops.trace_api import trace_closest_checked
from pg2024_dprt_tpu.scene.geometry import (
    device_scene_from_instances, device_scene_from_meshes)
from pg2024_dprt_tpu.scene.procedural import random_tri_soup
from pg2024_dprt_tpu.utils.benchmarking import chained_time

N = 65536


def rays_for(lo, hi, w=256, h=256):
    c = 0.5 * (lo + hi)
    ext = float(np.max(hi - lo))
    cam = Camera.look_at([c[0], c[1] + 0.5 * ext, c[2] + 2.2 * ext],
                         list(c), [0, 1, 0], 55.0, w, h)
    pix = jnp.arange(N, dtype=jnp.int32)
    o, d = cam.generate_rays(pix // w, pix % w, jnp.zeros(N), jnp.zeros(N))
    return o, d


def time_scene(name, scene):
    lo, hi = np.asarray(scene.scene_aabb)
    o, d = rays_for(lo, hi)
    tmx = jnp.full((N,), 3.4e38, jnp.float32)
    act = jnp.ones((N,), bool)

    def f(oo, d, tmx, act, scene):
        h, _ = trace_closest_checked(scene, oo, d, 1e-3, tmx, act,
                                     tracer="resident", sort_rays=False)
        return jnp.where(h.is_hit, jnp.minimum(h.t, 1.0), 1.0)

    per = chained_time(f, o, d, tmx, act, scene, short=1, long=4, reps=2)
    k = scene.num_clusters
    print(f"{name:28s} {per*1e3:9.2f} ms  K={k} C={scene.tris_per_cluster}")


def main():
    base = random_tri_soup(1 << 19, seed=9)
    for tpc in (512, 128):
        scene_b = device_scene_from_meshes([base], tris_per_cluster=tpc)
        time_scene(f"base_512k_tpc{tpc}", scene_b)

        ident = np.zeros((1, 3, 4), np.float32)
        ident[0, :, :3] = np.eye(3)
        time_scene(f"inst1_512k_tpc{tpc}",
                   device_scene_from_instances([base], ident, tpc))

        im = np.zeros((8, 3, 4), np.float32)
        for i in range(8):
            im[i, :, :3] = np.eye(3, dtype=np.float32)
            im[i, :, 3] = [2.2 * (i % 4), 0.0, 2.2 * (i // 4)]
        time_scene(f"inst8_4m_tpc{tpc}",
                   device_scene_from_instances([base], im, tpc))


def scale_and_knobs():
    """64-instance (33.5M effective tris) scale probe + grouped-cull knob
    sweep on the grazing bench framing."""
    import jax

    from pg2024_dprt_tpu.ops.pallas_resident import trace_resident

    base = random_tri_soup(1 << 19, seed=9)
    im = np.zeros((8, 3, 4), np.float32)
    for i in range(8):
        im[i, :, :3] = np.eye(3, dtype=np.float32)
        im[i, :, 3] = [2.2 * (i % 4), 0.0, 2.2 * (i // 4)]
    s8 = device_scene_from_instances([base], im, 512)

    # bench framing (grazing): same camera as bench_suite camera_4m_instanced
    cam = Camera.look_at([3.3, 1.5, 9.0], [3.3, 0.5, 1.0], [0, 1, 0],
                         55.0, 256, 256)
    pix = jnp.arange(N, dtype=jnp.int32)
    o, d = cam.generate_rays(pix // 256, pix % 256, jnp.zeros(N), jnp.zeros(N))
    tmx = jnp.full((N,), 3.4e38, jnp.float32)
    act = jnp.ones((N,), bool)

    def run(name, **kw):
        def f(oo, d, tmx, act, scene):
            h, _ = trace_resident(scene, oo, d, 1e-3, tmx, act, **kw)
            return jnp.where(h.is_hit, jnp.minimum(h.t, 1.0), 1.0)
        per = chained_time(f, o, d, tmx, act, s8, short=1, long=4, reps=2)
        print(f"{name:32s} {per*1e3:9.2f} ms")

    run("bench_view_auto")
    run("bench_view_interval_gcull", grouped=True, exact_cull=False)
    run("bench_view_recull16", grouped=True, recull=16)
    run("bench_view_flat_interval", grouped=False, exact_cull=False)

    im64 = np.zeros((64, 3, 4), np.float32)
    for i in range(64):
        im64[i, :, :3] = np.eye(3, dtype=np.float32)
        im64[i, :, 3] = [2.2 * (i % 8), 2.4 * (i // 32), 2.2 * ((i // 8) % 4)]
    s64 = device_scene_from_instances([base], im64)  # auto tpc -> 2048
    time_scene("inst64_33m_auto", s64)


def inst64_only():
    base = random_tri_soup(1 << 19, seed=9)
    im64 = np.zeros((64, 3, 4), np.float32)
    for i in range(64):
        im64[i, :, :3] = np.eye(3, dtype=np.float32)
        im64[i, :, 3] = [2.2 * (i % 8), 2.4 * (i // 32), 2.2 * ((i // 8) % 4)]
    s64 = device_scene_from_instances([base], im64)
    time_scene("inst64_33m_auto", s64)


if __name__ == "__main__":
    import sys as _s
    if len(_s.argv) > 1 and _s.argv[1] == "scale":
        scale_and_knobs()
    elif len(_s.argv) > 1 and _s.argv[1] == "scale64":
        inst64_only()
    else:
        main()
