"""Host-side I/O: FITS ima-style output (reference: wayne/exposure.py)."""

from wayne_tpu.io.fits import FitsHDU, read_fits, write_fits  # noqa: F401
from wayne_tpu.io.ima import write_ima, read_ima  # noqa: F401
