"""Grism models: G102 / G141 (reference: wayne/grism.py :: Grism, G141, G102).

The reference's Grism object owns the aXe trace/dispersion polynomials,
sensitivity curve, PSF-width table and wavelength-dependent flat field,
and exposes get_trace()/flux_to_psf()/get_sensitivity(). Here the same
data lives in the Tables pytree (device-side); this class is the host
handle that builds those tables, optionally from real STScI products,
and offers the reference-style query API for tests and tooling.
"""

from __future__ import annotations

import numpy as np

from wayne_tpu import calibration as cal
from wayne_tpu.ops import dispersion as disp

import jax.numpy as jnp


class Grism:
    """Host handle for one WFC3 IR grism."""

    name: str = "G141"

    def __init__(self, subarray: int = 512, n_lambda: int = 512,
                 samp_seq: str = "SPARS10", nsamp: int = 15,
                 conf_file: str | None = None, sens_file: str | None = None,
                 **detector_kwargs):
        self.subarray = subarray
        self.n_lambda = n_lambda
        self.samp_seq = samp_seq
        self.nsamp = nsamp
        self.tables = cal.synthetic_tables(
            self.name, subarray=subarray, n_lambda=n_lambda,
            samp_seq=samp_seq, nsamp=nsamp, **detector_kwargs)
        if conf_file or sens_file:
            self.tables = cal.with_loaded_grism(self.tables, conf_file, sens_file)
        defaults = cal._GRISM_DEFAULTS[self.name]
        self.wl_min = defaults["wl_min"]
        self.wl_max = defaults["wl_max"]

    # -- reference-style query API (host, for tests/diagnostics) ---------

    def get_trace(self, x_ref: float, y_ref: float) -> disp.TraceParams:
        """Trace solution at a reference position (reference: Grism.get_trace)."""
        return disp.trace_params(self.tables, jnp.float32(x_ref),
                                 jnp.float32(y_ref))

    def wl_to_x(self, wl, x_ref: float, y_ref: float):
        return np.asarray(disp.wl_to_x(jnp.asarray(wl, jnp.float32),
                                       self.get_trace(x_ref, y_ref)))

    def x_to_wl(self, x, x_ref: float, y_ref: float):
        return np.asarray(disp.x_to_wl(jnp.asarray(x, jnp.float32),
                                       self.get_trace(x_ref, y_ref)))

    def get_sensitivity(self, wl) -> np.ndarray:
        """Sensitivity interpolated at wl (reference: Grism.get_sensitivity)."""
        return np.interp(np.asarray(wl), np.asarray(self.tables.wl_centers),
                         np.asarray(self.tables.sensitivity))

    def psf_sigma(self, wl) -> np.ndarray:
        """Cross-dispersion Gaussian sigma (reference: Grism.flux_to_psf width)."""
        return np.interp(np.asarray(wl), np.asarray(self.tables.wl_centers),
                         np.asarray(self.tables.psf_sigma))


class G141(Grism):
    name = "G141"


class G102(Grism):
    name = "G102"


def make_grism(name: str, **kwargs) -> Grism:
    try:
        return {"G141": G141, "G102": G102}[name.upper()](**kwargs)
    except KeyError:
        raise ValueError(f"unknown grism {name!r}") from None


def make_calibrated_grism(cfg) -> Grism:
    """The visit's grism handle with any real STScI calibration products
    from the YAML ``calibration:`` block applied (loader seams in
    :mod:`wayne_tpu.calibration`). Shared by Observation and the
    run_reduce CLI so the simulator and the reducer always see the same
    wavelength solution / detector tables.

    A ``sequence_file`` is NOT loaded here: callers must wrap every
    timing-dependent derivation in
    :func:`wayne_tpu.calibration.sequence_tables_scope` (Observation
    does) so loaded timing cannot leak across visits.
    """
    calib = cfg.calibration
    grism = make_grism(cfg.grism, subarray=cfg.subarray,
                       n_lambda=cfg.n_lambda, samp_seq=cfg.samp_seq,
                       nsamp=cfg.nsamp,
                       dead_frac=getattr(cfg, "dead_pixel_frac", 0.0),
                       n_blobs=getattr(cfg, "n_blobs", 0),
                       blob_atten=getattr(cfg, "blob_attenuation", 0.12),
                       rts_frac=getattr(cfg, "unstable_pixel_frac", 0.0),
                       rts_amplitude=getattr(cfg, "rts_amplitude", 0.08))
    if calib.any_set():
        tables = cal.with_loaded_grism(
            grism.tables,
            conf_path=calib.axe_conf or None,
            sens_path=calib.sensitivity_file or None,
            flat_path=calib.flat_file or None,
            sky_path=calib.sky_file or None,
            sky_he_path=calib.sky_he_file or None)
        if calib.nonlin_file:
            tables = cal.with_loaded_nonlin(tables, calib.nonlin_file)
        if calib.qe_file:
            tables = cal.with_loaded_qe(tables, calib.qe_file)
        grism.tables = tables
    return grism
