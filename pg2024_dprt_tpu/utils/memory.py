"""Device-buffer accounting — the `arena.printMemoryStatus()` equivalent
(/root/reference/src/render/renderer.cpp:740,1721). XLA owns allocation; this
reports the static capacities the renderer committed to."""
from __future__ import annotations

import jax
import numpy as np


def buffer_bytes(tree) -> int:
    return sum(
        int(np.prod(a.shape)) * a.dtype.itemsize
        for a in jax.tree.leaves(tree)
        if hasattr(a, "shape")
    )


def memory_report(scene=None, paths=None, shadow_paths=None, models=None) -> str:
    lines = []
    total = 0
    for name, tree in (
        ("scene", scene),
        ("paths", paths),
        ("shadow_paths", shadow_paths),
        ("proxy_models", models),
    ):
        if tree is None:
            continue
        b = buffer_bytes(tree)
        total += b
        lines.append(f"{name:14s} {b / 1e6:10.2f} MB")
    lines.append(f"{'total':14s} {total / 1e6:10.2f} MB")
    return "\n".join(lines)
