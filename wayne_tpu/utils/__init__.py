"""Host-side numeric utilities (reference: wayne/tools.py)."""

from wayne_tpu.utils.spectra import (  # noqa: F401
    rebin_spectrum, interp_to_grid, crop_spectrum, blackbody_flam_um,
)
