"""Declarative render configuration.

Replaces the reference's compile-time macro system (`MOANA/BISTRO/...`,
`maxCount=3`, `shadowPathCount=4` hardcoded at
/root/reference/src/render/renderer.cpp:1602-1603; `RenderRequest{width,
height, spp, bounces}` at the API boundary) with one dataclass consumed by
every stage.
"""
from __future__ import annotations

import dataclasses
import json


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    width: int = 256
    height: int = 256
    spp: int = 1
    bounces: int = 4
    # NEE shadow rays per shading point (reference shadowPathCount=4).
    shadow_path_count: int = 4
    # Max proxy-AABB marching steps per ray (reference maxCount=3).
    max_proxy_hits: int = 3
    # Ray epsilon (reference util::Epsilon, 1e-2 for Moana / 1e-3 otherwise,
    # /root/reference/optix/util.hpp:5-10).
    t_epsilon: float = 1e-3
    # Neural-proxy routing for secondary/shadow rays (bounce >= 1).
    use_neural_proxies: bool = False
    # Wavefront migration iterations safety bound (the psum termination test
    # exits earlier; worst case ~2x partitions for arrive-then-reroute chains).
    max_migrations: int = 32
    # Traversal backend: "auto" | "stackless" | "cluster" | "resident"
    # (ops/trace_api.py; auto = resident on accelerators, stackless on CPU).
    tracer: str = "auto"
    # Whole-sample frame megakernel (ops/pallas_frame.py): "auto" | "on" |
    # "off".  auto = on for accelerator backends when the scene qualifies
    # (untextured, small env map/light table — fused_frame_supported);
    # "on" forces it (interpret mode on CPU).  Launch count dominates this
    # backend, so the fused path is the production frame path.
    fused_frame: str = "auto"
    # Per-destination all_to_all bucket capacity as a fraction of path capacity.
    bucket_fraction: float = 1.0
    # NEE estimator: "ris" (default) draws shadow_path_count light candidates
    # but traces ONE occlusion ray chosen by weighted reservoir sampling
    # (streaming RIS, Talbot et al. 2005) — same expectation as the
    # reference's shadowPathCount-sum at 1/S the shadow-trace cost; "sum"
    # is the reference's estimator (frame_buffer_update.cu / kernel.cu:444)
    # with S occlusion rays per shading point.
    nee_mode: str = "ris"
    # Russian roulette: paths ENTERING bounce >= this index are survival-
    # tested on clip(max next-throughput channel, RR_FLOOR, 1) with 1/p
    # compensation (render/shade.py; in-kernel in ops/pallas_frame.py with
    # bit-identical draws).  0 = off (reference parity: kernel.cu:424-439
    # has no RR).  Unbiased — expectation gated by tests/test_rr.py; shrinks
    # the dominant bounce-closest wavefronts on deep-bounce frames.
    russian_roulette: int = 0
    # Exact-mode cross-partition culling via conservative per-partition
    # visibility grids (ProxyTable.vis_grid, built with
    # build_partitioned_scene(visibility_grids=True)): pre-filters migration
    # candidates in the TraRay routing pick and ring-shadow hop traces.
    # Conservative by construction, so the image is unchanged (reference
    # legacy grid path: bvh_intersection.cu:234-310).
    use_visibility_grids: bool = False

    @property
    def frame_buffer_size(self) -> int:
        return self.width * self.height

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    @staticmethod
    def from_json(s: str) -> "RenderConfig":
        return RenderConfig(**json.loads(s))
