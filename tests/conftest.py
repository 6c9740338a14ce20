"""Test harness: force an 8-virtual-device CPU platform before JAX inits.

The bench path runs on the real (tunneled) TPU; tests run on CPU with
8 virtual devices so sharding/mesh tests exercise real multi-device
program partitioning (SPMD) without hardware.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402
import pytest  # noqa: E402

# The axon sitecustomize force-registers the TPU backend via JAX_PLATFORMS;
# override programmatically (env var alone is ignored after register()).
jax.config.update("jax_platforms", "cpu")


def _n_memory_maps() -> int:
    try:
        with open("/proc/self/maps") as fh:
            return sum(1 for _ in fh)
    except OSError:  # non-Linux
        return 0


# Every XLA:CPU executable JIT-allocates ~3 anonymous mappings
# (r-xp/r--p/rw-p code triple) that live as long as the executable is
# cached. The full suite compiles thousands of programs in one process,
# so the map count marches toward vm.max_map_count (65530 default) and
# the NEXT LLVM compile segfaults once mmap fails (measured: the suite
# died at ~84% inside backend_compile_and_load; maps grew ~3k/min).
# Dropping the jit caches unmaps the code (measured 1101 -> 501 maps),
# at the cost of recompiles in later modules — so only clear when the
# process is actually approaching the limit.
_MAPS_CLEAR_THRESHOLD = 45_000


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_code_maps():
    yield
    if _n_memory_maps() > _MAPS_CLEAR_THRESHOLD:
        jax.clear_caches()
