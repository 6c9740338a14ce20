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

# The axon sitecustomize force-registers the TPU backend via JAX_PLATFORMS;
# override programmatically (env var alone is ignored after register()).
jax.config.update("jax_platforms", "cpu")
