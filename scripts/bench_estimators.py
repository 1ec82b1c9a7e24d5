"""Equal-budget estimator quality evidence (VERDICT r4 #3 and #8) — real chip.

Question 1 (RIS, justifies the nee_mode='ris' DEFAULT): at EQUAL wall-clock,
is the reservoir single-shadow-ray estimator's image error <= the
reference's shadow_path_count-sum estimator's?  sum renders spp_base
samples; RIS renders floor(spp_base * t_sum / t_ris) samples in the same
time; both are compared (tone-mapped RMSE) against a 1024-spp sum reference.

Question 2 (Russian roulette, identical-convergence evidence): same
protocol for russian_roulette=2 vs rr=0 at equal wall-clock.

Writes artifacts/estimator_budget.json with measured per-spp times, the
equal-budget spp counts, and the errors; asserts RIS wins (or ties within
2%) since it is the shipped default.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_estimators.py
"""
import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from pg2024_dprt_tpu.core import Camera
from pg2024_dprt_tpu.ops.pallas_frame import render_frame_fused
from pg2024_dprt_tpu.render import RenderConfig
from pg2024_dprt_tpu.scene import device_scene_from_meshes, random_tri_soup
from pg2024_dprt_tpu.scene.lights import EnvironmentMap, LightTable

SIDE = 128
SPP_BASE = 32
SPP_REF = 1024


def main():
    assert jax.default_backend() != "cpu", "must run on the TPU backend"
    scene = device_scene_from_meshes([random_tri_soup(65536, seed=0)],
                                     tris_per_cluster=512)
    lt = np.asarray([[[0.3, 2.0, 0.3], [0.7, 2.0, 0.3], [0.7, 2.0, 0.7]]],
                    np.float32)
    lights = LightTable.from_arrays(lt, np.asarray([[60.0] * 3], np.float32))
    env = EnvironmentMap.constant((0.4, 0.5, 0.7))
    camera = Camera.look_at([0.5, 0.5, 3.0], [0.5, 0.5, 0.5], [0, 1, 0],
                            45.0, SIDE, SIDE)

    def render(mode_cfg, spp, base):
        d, e, _ = render_frame_fused(scene, lights, env, camera, base,
                                     mode_cfg, spp=spp)
        return (np.asarray(d) + np.asarray(e)) / spp

    def timed(mode_cfg, spp, base):
        # distinct base samples per call so the relay cannot memoize; whole
        # multi-spp frame = ONE kernel launch, far above RTT noise
        render(mode_cfg, spp, base)  # warm/compile
        best = float("inf")
        for i in range(3):
            t0 = time.time()
            render(mode_cfg, spp, base + 1000 + i)
            best = min(best, time.time() - t0)
        return best

    cfg = RenderConfig(width=SIDE, height=SIDE, spp=1, bounces=4,
                       shadow_path_count=4)
    cfg_sum = dataclasses.replace(cfg, nee_mode="sum")
    cfg_ris = dataclasses.replace(cfg, nee_mode="ris")

    # ground truth: high-spp sum render
    ref = render(cfg_sum, SPP_REF, 50_000)
    tm = lambda x: x / (1.0 + x)

    def rmse(img):
        return float(np.sqrt(np.mean((tm(img) - tm(ref)) ** 2)))

    report = {"side": SIDE, "spp_base": SPP_BASE, "spp_ref": SPP_REF,
              "bounces": cfg.bounces, "spc": cfg.shadow_path_count}

    # --- Q1: RIS vs sum at equal wall-clock ---
    t_sum = timed(cfg_sum, SPP_BASE, 0)
    t_ris1 = timed(cfg_ris, SPP_BASE, 0)
    spp_ris = max(SPP_BASE, int(SPP_BASE * t_sum / t_ris1))
    t_ris = timed(cfg_ris, spp_ris, 0)
    err_sum = rmse(render(cfg_sum, SPP_BASE, 0))
    err_ris = rmse(render(cfg_ris, spp_ris, 0))
    report["ris"] = {
        "t_sum_s": t_sum, "t_ris_at_base_s": t_ris1,
        "spp_sum": SPP_BASE, "spp_ris": spp_ris, "t_ris_s": t_ris,
        "rmse_sum": err_sum, "rmse_ris": err_ris,
        "ris_wins": err_ris <= err_sum * 1.02,
    }
    print(json.dumps(report["ris"]), flush=True)

    # --- Q2: RR vs no-RR at equal wall-clock ---
    cfg_rr = dataclasses.replace(cfg_ris, russian_roulette=2)
    t_plain = timed(cfg_ris, SPP_BASE, 0)
    t_rr1 = timed(cfg_rr, SPP_BASE, 0)
    spp_rr = max(SPP_BASE, int(SPP_BASE * t_plain / t_rr1))
    err_plain = rmse(render(cfg_ris, SPP_BASE, 0))
    err_rr = rmse(render(cfg_rr, spp_rr, 0))
    report["rr"] = {
        "t_plain_s": t_plain, "t_rr_at_base_s": t_rr1,
        "spp_plain": SPP_BASE, "spp_rr": spp_rr,
        "rmse_plain": err_plain, "rmse_rr": err_rr,
        "rr_equal_or_better": err_rr <= err_plain * 1.05,
    }
    print(json.dumps(report["rr"]), flush=True)

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/estimator_budget.json", "w") as f:
        json.dump(report, f, indent=1)
    assert report["ris"]["ris_wins"], \
        "RIS default not justified at equal budget"
    print("ESTIMATOR_BUDGET PASS")


if __name__ == "__main__":
    main()
