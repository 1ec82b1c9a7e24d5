"""FULL FRAME at 33.5M effective triangles (VERDICT r4 #4) — real chip.

Round 4 traced one 64k wavefront over the 64 x 512k instanced scene but
never RENDERED it, and the chained bench harness busts scoped VMEM at
c=2048 (the fori body holding the kernel chain).  This script:

  * renders complete 256x256 1spp frames (camera closest + shade + NEE
    occlusion per bounce, composed pipeline — the fused megakernel gates
    off for instanced scenes) over the 33.5M-effective-tri scene;
  * times them PER CALL, best-of-3 with distinct sample ids (a full frame
    runs ~seconds, 100x above tunnel RTT, and distinct samples defeat the
    relay's identical-call memoization — honest at this scale; the chained
    harness remains infeasible at c=2048 and that is now a DIAGNOSED
    compiler scoped-VMEM stack limit, scripts/probe_k100k.py);
  * spot-checks the on-chip camera-ray hits against a per-instance
    CPU threaded-BVH oracle on a 256-ray probe set.

Writes artifacts/frame_33m.json.
Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_frame_33m.py
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.ops.pallas_resident import trace_resident
from pg2024_dprt_tpu.ops.traversal import traverse_bvh
from pg2024_dprt_tpu.render import RenderConfig
from pg2024_dprt_tpu.render.engine import render_sample
from pg2024_dprt_tpu.scene.geometry import (
    device_scene_from_instances, device_scene_from_meshes)
from pg2024_dprt_tpu.scene.procedural import random_tri_soup
from pg2024_dprt_tpu.scene.lights import EnvironmentMap, LightTable

NI = 64
BASE_TRIS = 1 << 19           # 512k -> 33.5M effective


def main():
    assert jax.default_backend() != "cpu", "must run on the TPU backend"
    t0 = time.time()
    base_mesh = random_tri_soup(BASE_TRIS, seed=9)
    tf = np.zeros((NI, 3, 4), np.float32)
    for i in range(NI):
        tf[i, :, :3] = np.eye(3, dtype=np.float32)
        tf[i, :, 3] = [2.2 * (i % 8), 2.2 * ((i // 8) % 2), 2.2 * (i // 16)]
    scene = device_scene_from_instances([base_mesh], tf)
    print(f"scene: {NI}x{BASE_TRIS} = {NI*BASE_TRIS/1e6:.1f}M eff tris, "
          f"K={scene.num_clusters} c={scene.tris_per_cluster} "
          f"({time.time()-t0:.0f}s)", flush=True)

    lo, hi = np.asarray(scene.scene_aabb)
    c = 0.5 * (lo + hi)
    ext = float(np.max(hi - lo))
    camera = Camera.look_at([c[0], c[1] + 0.6 * ext, c[2] + 1.8 * ext],
                            list(c), [0, 1, 0], 55.0, 256, 256)
    quad = np.asarray(
        [[[c[0] - 2, hi[1] + 3, c[2] - 2], [c[0] + 2, hi[1] + 3, c[2] - 2],
          [c[0] + 2, hi[1] + 3, c[2] + 2]],
         [[c[0] - 2, hi[1] + 3, c[2] - 2], [c[0] + 2, hi[1] + 3, c[2] + 2],
          [c[0] - 2, hi[1] + 3, c[2] + 2]]], np.float32)
    lights = LightTable.from_arrays(quad, np.full((2, 3), 400.0, np.float32))
    env = EnvironmentMap.constant((0.35, 0.4, 0.5))

    report = {"instances": NI, "base_tris": BASE_TRIS,
              "eff_tris": NI * BASE_TRIS, "K": int(scene.num_clusters),
              "tris_per_cluster": int(scene.tris_per_cluster)}

    # the engine program at c=2048 needs a raised scoped-VMEM carve-out:
    # the grouped trace kernel's compiler stack is 17.67M inside the frame
    # program (16M default limit; standalone it fits) — ship the option
    # with the computation (probe_k100k.py has the scoped-OOM diagnosis)
    copts = {"xla_tpu_scoped_vmem_limit_kib": 24576}
    for bounces in (1, 2, 4):
        cfg = RenderConfig(width=256, height=256, spp=1, bounces=bounces)
        fn = jax.jit(
            lambda sc, s, cfg=cfg: render_sample(sc, lights, env, camera,
                                                 s, cfg))
        compiled = fn.lower(scene, jnp.int32(0)).compile(
            compiler_options=copts)

        def frame(s):
            d, e, diag = compiled(scene, jnp.int32(s))
            return d + e

        img = np.asarray(frame(0))
        assert np.isfinite(img).all() and img.max() > 0, "broken frame"
        best = float("inf")
        for s in range(1, 4):
            t1 = time.time()
            np.asarray(frame(s))
            best = min(best, time.time() - t1)
        report[f"frame_b{bounces}_ms"] = round(best * 1e3, 1)
        report[f"frame_b{bounces}_mean_lum"] = float(img.mean())
        print(f"frame bounces={bounces}: {best*1e3:.0f} ms "
              f"(mean lum {img.mean():.4f})", flush=True)

    # --- oracle spot-check: 256 camera rays, per-instance CPU traversal ---
    n = 2048
    pix = jnp.asarray(
        np.random.RandomState(0).choice(256 * 256, n, replace=False)
        .astype(np.int32))
    o, d = camera.generate_rays(pix // 256, pix % 256,
                                jnp.zeros(n), jnp.zeros(n))
    tmx = jnp.full((n,), 3.4e38, jnp.float32)
    act = jnp.ones((n,), bool)
    # chip: pad the probe wavefront to a full tile multiple
    pad = 65536 - n
    h, _ = trace_resident(
        scene,
        jnp.pad(o, ((0, pad), (0, 0))), jnp.pad(d, ((0, pad), (0, 0))),
        1e-3, jnp.pad(tmx, (0, pad)), jnp.pad(act, (0, pad)),
        tile_rays=128)
    t_chip = np.asarray(h.t)[:n]
    hit_chip = np.asarray(h.is_hit)[:n]

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        base_scene = device_scene_from_meshes([base_mesh])
        inv_lin = np.linalg.inv(tf[:, :, :3])
        inv_tr = -np.einsum("iab,ib->ia", inv_lin, tf[:, :, 3])
        on, dn = np.asarray(o), np.asarray(d)
        best_t = np.full(n, 3.4e38, np.float32)
        for i in range(NI):
            ol = on @ inv_lin[i].T + inv_tr[i]
            dl = dn @ inv_lin[i].T
            hh = traverse_bvh(base_scene, jnp.asarray(ol), jnp.asarray(dl),
                              1e-3, jnp.asarray(best_t),
                              jnp.ones((n,), bool))
            ht = np.asarray(hh.t)
            ok = np.asarray(hh.is_hit) & (ht < best_t)
            best_t = np.where(ok, ht, best_t)
    hit_oracle = best_t < 3e38
    agree = (hit_chip == hit_oracle).mean()
    m = hit_chip & hit_oracle
    rel = (np.abs(t_chip[m] - best_t[m]) / np.maximum(best_t[m], 1e-6)
           if m.any() else np.zeros(1))
    # this probe CAUGHT a real bug in round 5: winner slots
    # (cluster << lane_bits) | lane were written astype(f32) and exceed
    # 2^24 at K*c > 16M, decoding phantom closer hits (rel err up to 0.5);
    # the kernels now bitcast the slot and the epilogue re-validates
    # barycentrics.  Residual tolerance: the in-kernel front-to-back
    # compare quantizes t by lane_bits mantissa bits (2^-12 at c=2048), so
    # near-ties may legitimately pick either of two close winners.
    report["oracle_spotcheck"] = {
        "rays": n, "hits": int(m.sum()), "hit_agree": float(agree),
        "t_rel_max": float(rel.max()),
        "t_rel_p50": float(np.percentile(rel, 50)),
        "pass": bool(agree == 1.0 and rel.max() < 1e-3),
    }
    print(json.dumps(report["oracle_spotcheck"]), flush=True)

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/frame_33m.json", "w") as f:
        json.dump(report, f, indent=1)
    assert report["oracle_spotcheck"]["pass"]
    print("FRAME_33M PASS")


if __name__ == "__main__":
    main()
