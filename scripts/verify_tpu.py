"""TPU-side correctness gate: compiled tracer kernels vs the CPU oracle.

Traces fixed scenes on the real chip with the COMPILED Mosaic kernels (the
test suite only exercises interpret mode) and compares hit-for-hit against
the stackless threaded-BVH oracle evaluated on the CPU backend.  Writes
artifacts/verify_tpu.json; exits non-zero on any mismatch beyond exact-t
ties (a ray on the shared edge of two coplanar triangles may legitimately
report either).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/verify_tpu.py
"""
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.ops.pallas_resident import trace_resident
from pg2024_dprt_tpu.ops.pallas_tracer import trace_pallas
from pg2024_dprt_tpu.ops.traversal import traverse_bvh
from pg2024_dprt_tpu.scene import cornell_box, device_scene_from_meshes, random_tri_soup


def compare(name, scene, o, d, tmax, act, results):
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        want = traverse_bvh(
            jax.device_put(scene, cpu), jax.device_put(o, cpu), jax.device_put(d, cpu),
            1e-3, jax.device_put(tmax, cpu), jax.device_put(act, cpu),
        )
    want = jax.tree.map(np.asarray, want)

    for kern, fn in (
        ("resident", lambda: trace_resident(scene, o, d, 1e-3, tmax, act)),
        ("streaming", lambda: trace_pallas(scene, o, d, 1e-3, tmax, act,
                                           tile_rays=256, region=64)),
    ):
        got, dropped = fn()
        got = jax.tree.map(np.asarray, got)
        n = o.shape[0]
        hit_match = int((got.is_hit == want.is_hit).sum())
        both = got.is_hit & want.is_hit
        dt = np.abs(got.t - want.t)
        tol = 1e-4 * np.maximum(1.0, np.abs(want.t))
        t_ok = int((dt[both] <= tol[both]).sum())
        tri_same = got.tri_index == want.tri_index
        # mismatched winners must be exact-t ties
        tie_ok = int((tri_same | (dt <= tol))[both].sum())
        row = {
            "scene": name, "kernel": kern, "rays": n,
            "hits_oracle": int(want.is_hit.sum()),
            "is_hit_match": hit_match, "t_match": t_ok,
            "tri_or_tie_match": tie_ok, "dropped": int(dropped),
            "pass": hit_match == n and t_ok == int(both.sum())
                    and tie_ok == int(both.sum()) and int(dropped) == 0,
        }
        results.append(row)
        print(json.dumps(row), flush=True)


def main():
    assert jax.default_backend() != "cpu", "must run on the TPU backend"
    results = []

    # structured scene: cornell camera wavefront
    meshes, _ = cornell_box()
    scene = device_scene_from_meshes(meshes, tris_per_cluster=16)
    cam = Camera.look_at([0.5, 0.5, 2.4], [0.5, 0.5, 0.0], [0, 1, 0], 40.0, 64, 64)
    pix = jnp.arange(4096, dtype=jnp.int32)
    o, d = cam.generate_rays(pix // 64, pix % 64, jnp.zeros(4096), jnp.zeros(4096))
    compare("cornell_camera", scene, o, d,
            jnp.full((4096,), 1e30, jnp.float32), jnp.ones((4096,), bool), results)

    # soup scene: incoherent rays, some inactive, finite tmax
    scene2 = device_scene_from_meshes([random_tri_soup(4096, seed=7)], tris_per_cluster=64)
    rng = np.random.RandomState(8)
    n = 8192
    ro = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 1.4 - 0.2)
    rd = rng.randn(n, 3).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
    tmax = jnp.asarray((rng.rand(n) * 2.0 + 0.1).astype(np.float32))
    act = jnp.asarray(rng.rand(n) > 0.2)
    compare("soup_incoherent", scene2, ro, rd, tmax, act, results)

    os.makedirs("artifacts", exist_ok=True)
    ok = all(r["pass"] for r in results)
    with open("artifacts/verify_tpu.json", "w") as f:
        json.dump({"backend": jax.default_backend(), "pass": ok, "rows": results}, f, indent=1)
    print("VERIFY_TPU", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
