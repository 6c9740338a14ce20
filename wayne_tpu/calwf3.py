"""calwf3-equivalent IR calibration: raw multiaccum ima -> FLT product.

Real WFC3 users never analyse raw ramps directly — STScI's calwf3
pipeline turns each ima into a single calibrated count-rate frame (flt):
one SCI plane in e-/s with ERR, a collapsed DQ, and per-pixel SAMP/TIME
bookkeeping. This module is the in-repo equivalent for the simulator's
products, executing the WF3IR steps in calwf3's order:

  DQICORR   DQ planes initialised at write time (io/ima.py) — consumed.
  BLEVCORR  per-read per-amplifier bias drift off the DQ-128 reference
            border (reduction.ref_pixel_correct; full-frame products).
  NLINCORR  per-pixel cubic non-linearity inversion
            (reduction.linearize_reads), gated by the product's
            calwf3-style NLINCORR header switch.
  DARKCORR  dark-reference subtraction per read (Tables.dark_map x t).
  CRCORR    DQ-flagged read intervals (cosmic rays / saturation / hot
            pixels) rebuilt by the interval-difference reconstruction
            (reduction.repair_read_stack), then the rate estimator:
            the per-pixel up-the-ramp least-squares slope
            (reduction.ramp_slope_frame) for STARING exposures — what
            real calwf3 fits after rejecting hits — but the repaired
            last-minus-zeroth net for SPATIAL SCANS (header SCAN_TYP
            'C'): a scanned pixel's ramp is intrinsically nonlinear
            (charge arrives only while the scan crosses it), which is
            exactly why real scan analyses bypass calwf3's CRCORR and
            work from the ima; the CDS net IS the time-averaged rate.
  FLATCORR  OMITted for grism data, exactly like real calwf3 (grism
            flats are wavelength-dependent and belong to the spectral
            extraction layer; the simulator applies them photon-side).
  UNITCORR  SCI/ERR in ELECTRONS/S.

The whole per-exposure chain is ONE jitted program reused across the
visit (TPU/CPU agnostic; frames are (NR, S, S) elementwise + one
tensordot, VPU work).

Reference: the reference simulator writes raw ima only (wayne/exposure.py
:: Exposure.generate_fits); flt-level calibration is what its users run
calwf3 for — in-repo here so simulated visits round-trip to the product
tier real analyses start from.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

__all__ = ["calibrate_ima", "write_flt", "read_flt", "FltProduct"]


@dataclasses.dataclass
class FltProduct:
    """One calibrated exposure (all host-side NumPy)."""

    sci: np.ndarray      # (S, S) count rate, e-/s
    err: np.ndarray      # (S, S) 1-sigma rate error, e-/s
    dq: np.ndarray       # (S, S) int16, OR of all read DQ planes
    samp: np.ndarray     # (S, S) int16, clean samples used per pixel
    time: np.ndarray     # (S, S) f32, clean integration seconds per pixel
    header: dict[str, Any]


def _calibration_fn(tables, *, nlincorr: bool, darkcorr: bool,
                    blevcorr: bool, use_gain_map: bool, has_bias: bool,
                    read_noise_e: float, ramp_fit: bool):
    """The jitted ima->flt chain (hoisted once per visit; CLAUDE.md
    jit-in-loop rule)."""
    import jax
    import jax.numpy as jnp

    from wayne_tpu.reduction import (
        good_diff_masks_from_dq, linearize_reads, ramp_slope_frame,
        read_noise_var_e2, ref_pixel_correct, repair_read_stack)

    gain = tables.gain_map if use_gain_map else tables.gain
    bias = tables.bias_map if has_bias else None

    @jax.jit
    def run(reads_dn, times, dq):
        reads = jnp.asarray(reads_dn, jnp.float32)
        if blevcorr:
            ref_mask = (dq[0] & 128) != 0
            reads = ref_pixel_correct(reads, ref_mask)[0]
        if nlincorr:
            reads_e = linearize_reads(reads, tables.nonlin_coeffs,
                                      tables.full_well_e, gain,
                                      bias_e=bias)
        else:
            reads_e = reads * gain
            if bias is not None:
                reads_e = reads_e - bias
        t = jnp.asarray(times, jnp.float32)
        if darkcorr:
            reads_e = reads_e - tables.dark_map[None] * t[:, None, None]
        good = good_diff_masks_from_dq(dq)                 # (NR-1, S, S)
        reads_e = repair_read_stack(reads_e, good)
        T = t[-1] - t[0]
        if ramp_fit:
            net_e = ramp_slope_frame(reads_e, t)           # slope * T, e-
        else:
            net_e = reads_e[-1] - reads_e[0]               # scan: CDS net
        rate = net_e / T
        nr = reads.shape[0]
        rn_var = read_noise_var_e2(read_noise_e, nr, ramp=ramp_fit)
        err = jnp.sqrt(jnp.maximum(net_e, 0.0) + rn_var) / T
        dq_flt = jnp.bitwise_or.reduce(dq, axis=0).astype(jnp.int16)
        samp = (1 + good.sum(axis=0)).astype(jnp.int16)
        dt = (t[1:] - t[:-1])[:, None, None]
        time_px = jnp.sum(jnp.where(good, dt, 0.0), axis=0)
        return rate, err, dq_flt, samp, time_px

    return run


# one compiled chain per (tables identity, switch combo, read-noise)
_FN_CACHE: dict = {}


def calibrate_ima(path: str, tables, noise_flags,
                  read_noise_e: float | None = None) -> FltProduct:
    """Calibrate one raw-DN ima file to an FLT product (host I/O +
    one device program; see module docstring for the step order).

    ``noise_flags`` (config.NoiseFlags, normally from the same YAML the
    visit was generated with) tells the chain which reference planes the
    product actually carries: the per-pixel gain map
    (``gain_variations``), the bias pedestal plane (``bias``) and the
    dark reference (``dark``). The NLINCORR switch itself comes from the
    product header (calwf3 convention; absent = PERFORM).
    """
    from wayne_tpu.io.ima import read_ima

    hdr, reads, times, dq = read_ima(path, with_dq=True)
    if str(hdr.get("BUNIT", "COUNTS")).upper().startswith("ELECTRONS"):
        raise ValueError(
            f"{path!r} is already a count-rate product — calwf3-style "
            "calibration starts from raw-DN ima files "
            "(output_units: counts)")
    # spatial scans (SCAN_TYP 'C') get the CDS net: their per-pixel
    # ramps are nonlinear by construction, so the LS slope is the wrong
    # estimator of the time-averaged rate (see module docstring)
    ramp_fit = str(hdr.get("SCAN_TYP", "N")).strip() != "C"
    if ramp_fit and reads.shape[0] < 3:
        raise ValueError(
            f"{path!r} has NSAMP={reads.shape[0] - 1}: the up-the-ramp "
            "fit needs at least 2 sampled reads after the zeroth "
            "(scan-mode products use CDS and accept NSAMP=1)")
    if reads.shape[0] < 2:
        raise ValueError(
            f"{path!r} has NSAMP={reads.shape[0] - 1}: at least one "
            "sampled read after the zeroth is needed for a CDS net")
    if reads.shape[-1] != int(np.asarray(tables.dark_map).shape[-1]):
        raise ValueError(
            f"{reads.shape[-1]}^2 frames vs "
            f"{np.asarray(tables.dark_map).shape[-1]}^2 calibration "
            "planes — does the YAML subarray match the visit?")
    nlincorr = str(hdr.get("NLINCORR", "PERFORM")).upper() != "OMIT"
    blevcorr = bool((dq[0] & 128).any())
    rn = float(read_noise_e if read_noise_e is not None
               else tables.read_noise_e)
    key = (id(tables), nlincorr, noise_flags.dark, blevcorr,
           noise_flags.gain_variations, noise_flags.bias, rn, ramp_fit)
    fn = _FN_CACHE.get(key)
    if fn is None:
        fn = _FN_CACHE[key] = _calibration_fn(
            tables, nlincorr=nlincorr, darkcorr=noise_flags.dark,
            blevcorr=blevcorr, use_gain_map=noise_flags.gain_variations,
            has_bias=noise_flags.bias, read_noise_e=rn,
            ramp_fit=ramp_fit)
    rate, err, dq_flt, samp, time_px = (np.asarray(x) for x in
                                        fn(reads, times, dq))
    out_hdr = dict(hdr)
    out_hdr.update({
        "FILETYPE": "SCI", "BUNIT": "ELECTRONS/S",
        "NLINCORR": "COMPLETE" if nlincorr else "OMIT",
        "BLEVCORR": "COMPLETE" if blevcorr else "OMIT",
        "DARKCORR": "COMPLETE" if noise_flags.dark else "OMIT",
        "CRCORR": "COMPLETE", "UNITCORR": "COMPLETE",
        "FLATCORR": "OMIT",   # grism: flats belong to spectral extraction
    })
    return FltProduct(sci=rate.astype(np.float32),
                      err=err.astype(np.float32), dq=dq_flt,
                      samp=samp, time=time_px.astype(np.float32),
                      header=out_hdr)


def write_flt(path: str, flt: FltProduct) -> None:
    """Write an flt-style FITS file (primary header + one SCI/ERR/DQ/
    SAMP/TIME extension group, like the real product)."""
    from wayne_tpu.io.fits import FitsHDU, write_fits

    hdus = [FitsHDU(name="", data=None, header=flt.header)]
    for name, data in (("SCI", flt.sci), ("ERR", flt.err),
                       ("DQ", flt.dq), ("SAMP", flt.samp),
                       ("TIME", flt.time)):
        extra = {"BUNIT": "ELECTRONS/S"} if name in ("SCI", "ERR") else {}
        hdus.append(FitsHDU(name, 1, data, extra))
    write_fits(path, hdus)


def read_flt(path: str):
    """(primary_header, sci, err, dq) from an flt file."""
    from wayne_tpu.io.fits import read_fits

    hdus = read_fits(path)
    primary = hdus[0][0]
    by_name = {h.get("EXTNAME"): d for h, d in hdus[1:]}
    return primary, by_name["SCI"], by_name["ERR"], by_name["DQ"]
