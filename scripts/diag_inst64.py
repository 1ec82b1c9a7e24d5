"""Compile-only diagnosis of the 64-instance grouped kernel VMEM OOM."""
import os
import sys

sys.path.insert(0, ".")
os.environ["PG2024_TRACE_POLICY"] = "1"

import numpy as np
import jax
import jax.numpy as jnp

from pg2024_dprt_tpu.ops.pallas_resident import trace_resident
from pg2024_dprt_tpu.scene.geometry import device_scene_from_instances
from pg2024_dprt_tpu.scene.procedural import random_tri_soup

N = 65536
base = random_tri_soup(1 << 19, seed=9)
NI = int(os.environ.get("PG_NI", "64"))
TPC = int(os.environ.get("PG_TPC", "512"))
im64 = np.zeros((NI, 3, 4), np.float32)
for i in range(NI):
    im64[i, :, :3] = np.eye(3, dtype=np.float32)
    im64[i, :, 3] = [2.2 * (i % 8), 2.4 * (i // 32), 2.2 * ((i // 8) % 4)]
s64 = device_scene_from_instances([base], im64, TPC)
print("built scene: K", s64.num_clusters, "kg", s64.cl_gboxes.shape[1])

o = jnp.zeros((N, 3), jnp.float32)
d = jnp.ones((N, 3), jnp.float32)
tmx = jnp.full((N,), 3.4e38, jnp.float32)
act = jnp.ones((N,), bool)

kw = {}
if len(sys.argv) > 1:
    for a in sys.argv[1:]:
        k_, v = a.split("=")
        kw[k_] = {"True": True, "False": False}.get(v, int(v) if v.isdigit() else v)
print("kwargs:", kw)
try:
    low = jax.jit(lambda *a: trace_resident(*a, **kw)).lower(
        s64, o, d, 1e-3, tmx, act)
    low.compile()
    print("COMPILE OK")
except Exception as e:
    print("COMPILE FAIL:", str(e)[:400])
