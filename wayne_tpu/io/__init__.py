"""Host-side I/O: FITS ima-style output (reference: wayne/exposure.py)."""

from wayne_tpu.io.fits import FitsHDU, read_fits, write_fits  # noqa: F401
from wayne_tpu.io.ima import (  # noqa: F401
    write_ima, read_ima, cr_dq_planes, saturation_dq, default_primary_header,
    DQ_COSMIC_RAY, DQ_SATURATED,
)
