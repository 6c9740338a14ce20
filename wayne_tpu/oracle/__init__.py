"""fp64 NumPy oracle implementations for validating the JAX/TPU path."""

from wayne_tpu.oracle.numpy_oracle import (  # noqa: F401
    oracle_transit_flux, oracle_ideal_frame, oracle_nonlinearity,
)
