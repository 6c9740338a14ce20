"""wayne_tpu — a TPU-native rebuild of the Wayne HST/WFC3 IR grism simulator.

Wayne (ucl-exoplanets/wayne; Varley, Tsiaras & Waldmann, arXiv:1511.09108)
simulates raw Hubble WFC3 IR grism (G102/G141) spectroscopy of exoplanet
transits: dispersed stellar spectra modulated by a limb-darkened transit
light curve, splatted onto the detector with wavelength-dependent PSFs,
integrated through spatial-scan motion, and read out up-the-ramp with the
instrument's full noise budget (photon, read, dark, sky, cosmic rays,
flat-field, non-linearity, gain) plus time-domain systematics (scan-speed
variations, pointing drift, visit-long ramps).

This package is NOT a port: the reference is a serial NumPy/Python
simulator (reference: wayne/exposure_generator.py :: ExposureGenerator);
here the entire per-exposure inner loop is a fused JAX program built for
the TPU MXU (the PSF splat is a dense matmul over the wavelength axis),
whole visits vmap over the exposure axis, and Monte-Carlo ensembles shard
over a `jax.sharding.Mesh`.

Layout
------
- :mod:`wayne_tpu.config`       — typed configs + reference-style YAML loader
- :mod:`wayne_tpu.calibration`  — calibration tables (aXe-style polys, sensitivity,
  flat cube, master sky, read-time tables); synthetic generator + file loaders
- :mod:`wayne_tpu.models`       — grism (G102/G141), detector, star, planet
- :mod:`wayne_tpu.ops`          — device compute: Kepler/transit, PSF math,
  dispersion, MXU splat, up-the-ramp readout, full exposure kernel
- :mod:`wayne_tpu.parallel`     — mesh/sharding for visit & Monte-Carlo axes
- :mod:`wayne_tpu.observation`  — visit planning and orchestration
- :mod:`wayne_tpu.trends`       — scan-speed variations, ramps, pointing drift
- :mod:`wayne_tpu.io`           — FITS (ima-style) writer/reader, native fast path
- :mod:`wayne_tpu.reduction`    — on-device reduction: extraction, DQ repair,
  alignment, divide-white / parametric ramp detrending, depth fitting
- :mod:`wayne_tpu.mcmc`         — on-device affine-invariant ensemble MCMC
  (posterior depths; vmap-able over channels)
- :mod:`wayne_tpu.oracle`       — fp64 NumPy reference implementation for tests
"""

__version__ = "0.1.0"

from wayne_tpu import config as config  # noqa: F401
