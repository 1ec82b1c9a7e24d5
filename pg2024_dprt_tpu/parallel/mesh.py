"""Device mesh setup.

The reference's topology is `MPI_Comm_rank/size`
(/root/reference/src/render/renderer.cpp:1860-1861); here it is a 1-D
`jax.sharding.Mesh` over the partition axis. Intra-slice exchange rides ICI;
multi-slice (DCN) would extend the same axis.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

NODES_AXIS = "nodes"


def make_mesh(num_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    n = num_devices or len(devices)
    assert n <= len(devices), f"need {n} devices, have {len(devices)}"
    return Mesh(np.asarray(devices[:n]), (NODES_AXIS,))
