"""Test config: run everything on a virtual 8-device CPU mesh so distributed
paths (shard_map / all_to_all / psum) execute without TPU hardware
(SURVEY.md §4c)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)

# the environment's sitecustomize force-registers the TPU platform and
# overrides JAX_PLATFORMS; override it back before any backend is initialized
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


# The full suite compiles hundreds of 8-device CPU programs in one process;
# jit executable caches accumulate for the whole run and the suite has
# segfaulted inside an XLA:CPU compile near the end (resource exhaustion —
# reproducible at ~155 tests, absent for any subset).  Dropping compiled
# executables between test MODULES bounds the high-water mark; modules are
# independent, so the only cost is intra-suite recompiles.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
