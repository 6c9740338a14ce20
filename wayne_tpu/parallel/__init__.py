"""Multi-chip scaling: mesh construction + sharded Monte-Carlo ensembles.

The reference has no parallelism of any kind (SURVEY.md section 2.3: a
serial Python loop over exposures). The TPU-native scaling story for this
domain is pure data parallelism: visits are independent along the
Monte-Carlo axis and exposures are independent within a visit, so both
shard over a `jax.sharding.Mesh` with zero cross-device collectives in
the compute — collectives appear only if summary statistics are reduced
on-device (psum over the mesh).
"""

from wayne_tpu.parallel.mesh import make_mesh, shard_scenes  # noqa: F401
from wayne_tpu.parallel.ensemble import (  # noqa: F401
    mc_scenes, simulate_ensemble_spectra, extract_spectra,
)
