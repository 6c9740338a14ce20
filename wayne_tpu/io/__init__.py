"""Host-side I/O: FITS ima-style output (reference: wayne/exposure.py)."""

from wayne_tpu.io.fits import FitsHDU, read_fits, write_fits  # noqa: F401
from wayne_tpu.io.ima import (  # noqa: F401
    write_ima, read_ima, cr_dq_planes, saturation_dq, static_dq_plane,
    default_primary_header,
    DQ_COSMIC_RAY, DQ_SATURATED, DQ_HOT_PIXEL, DQ_REF_PIXEL,
)
