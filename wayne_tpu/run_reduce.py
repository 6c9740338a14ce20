"""Reduce a generated visit's ima FITS files back to science products.

The reference's validation story is "simulate, then reduce with a
standard WFC3 pipeline (Iraclis)". This CLI is the in-repo form of that
consumer: it reads the ima files a visit wrote to disk (proving the
products are consumable from the file level up), repairs DQ-flagged
reads, subtracts per-read amplifier bias drift from full-frame products
via the DQ-128 reference-pixel border (the calwf3 BLEVCORR step),
extracts background-subtracted spectra (box or Horne-optimal,
CDS or up-the-ramp), aligns dispersion drifts, removes systematics
(divide-white or the parametric Iraclis ramp fit, optionally with free
ephemeris), and fits per-channel science: Rp/Rs (transit, autodiff
Newton + optional MCMC posteriors), Fp/Fs (eclipse, closed-form linear
fit), or the full thermal phase curve (closed-form harmonic fit).

Usage:
    python -m wayne_tpu.run_reduce -d out_visit/ -p pars.yml \
        [--n-chan 8] [--mode transit|eclipse|phase]
        [--estimator cds|ramp] [--extract box|optimal] [--align]
        [--detrend divide-white|ramp|recte|none] [--fit-geometry]
        [--mcmc [N]] [--direct-image] [--save-spectra]
        [--rows Y0:Y1 --cols X0:X1 --bg-rows B0:B1]
        [--plot] [-o reduced.json]

Outputs a JSON report (docs/REDUCTION.md walks the full loop):
per-channel wavelength ranges, fitted depths and uncertainties, white
fit/posterior blocks, the white light curve and exposure mid-times.
"""

from __future__ import annotations

import argparse
import glob
import json
import logging
import os
import sys

import numpy as np


def collect_visit(visit_dir: str) -> list[str]:
    """The visit's ima files in exposure order (direct image excluded)."""
    paths = sorted(glob.glob(os.path.join(visit_dir, "*_ima.fits")))
    if not paths:
        raise FileNotFoundError(f"no *_ima.fits files in {visit_dir!r}")
    return paths


def centroid_direct_image(path: str) -> tuple[float, float]:
    """Source centroid (x, y) from a visit-opening direct image.

    What real pipelines (Iraclis) do with the undispersed imaging-filter
    exposure: locate the star and anchor the grism wavelength solution
    at its position (the aXe trace/dispersion polynomials are functions
    of the DIRECT-image reference pixel). Works on the CDS frame of the
    multiaccum ima, masks DQ-flagged pixels (a cosmic ray can out-peak
    the star on a single pixel), finds the peak of a 3x3 box sum, and
    returns the flux-weighted centroid of an 8-px window around it.
    """
    from wayne_tpu.io.ima import read_ima
    from wayne_tpu.reduction import DQ_BAD_BITS

    _, reads, _, dq = read_ima(path, with_dq=True)
    frame = (reads[-1] - reads[0]).astype(np.float64)
    bad = (dq[-1] & DQ_BAD_BITS) != 0
    frame[bad] = 0.0
    frame -= np.median(frame)
    # 3x3 box sum by shifted adds on a zero-padded frame (no scipy):
    # np.roll would WRAP, mixing opposite-edge flux into edge pixels and
    # displacing the peak for sources within 1 px of the frame boundary
    pad = np.pad(frame, 1)
    s = np.zeros_like(frame)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            s += pad[dy:dy + frame.shape[0], dx:dx + frame.shape[1]]
    iy, ix = np.unravel_index(int(np.argmax(s)), s.shape)
    w = 8
    y0, y1 = max(iy - w, 0), min(iy + w + 1, frame.shape[0])
    x0, x1 = max(ix - w, 0), min(ix + w + 1, frame.shape[1])
    sub = np.clip(frame[y0:y1, x0:x1], 0.0, None)
    tot = sub.sum()
    if tot <= 0:
        raise ValueError(f"no source flux in direct image {path!r}")
    ys, xs = np.mgrid[y0:y1, x0:x1]
    return float((sub * xs).sum() / tot), float((sub * ys).sum() / tot)


def extract_from_files(paths: list[str], gain: float,
                       estimator: str = "cds", use_dq: bool = True,
                       extract: str = "box", read_noise_e: float = 12.0,
                       windows: tuple | None = None,
                       nlin: dict | None = None,
                       sky_components: dict | None = None,
                       quad_map: "np.ndarray | None" = None):
    """Host-side spectral extraction from ima files.

    ``extract='optimal'`` replaces the box sum with Horne (1986)
    profile-weighted extraction: the cross-dispersion profile comes
    from the visit-mean frame, the per-pixel variance from the shot
    term plus the estimator's read-noise floor
    (reduction.read_noise_var_e2).

    Returns (spectra_e (n_exp, S), mid_times_s relative to the first
    exposure start, (y_window, x_window, bg_rows) auto-detected from the
    stacked CDS signal, scan_ang_deg (n_exp,) from the SCAN_ANG
    headers — forward/reverse visits differ by 180 deg and the caller
    normalises each direction separately). ``estimator='ramp'`` fits
    the calwf3-style
    up-the-ramp least-squares slope per pixel instead of CDS (raw-DN
    products only — rate products lack the zeroth-read pedestal).

    ``use_dq=True`` (default) consumes the products' DQ planes the way
    real WFC3 pipelines do: reads flagged with cosmic rays (8192),
    saturation (256) or hot pixels (16) are repaired per pixel by the
    interval-difference reconstruction (reduction.repair_read_stack)
    before either estimator runs, and full-frame products' reference
    pixels (128) drive the per-read per-amplifier bias-drift
    subtraction (reduction.ref_pixel_correct, the calwf3 BLEVCORR
    step) — a no-op on subarray products, which carry no reference
    pixels.

    ``nlin`` enables the calwf3 NLINCORR step
    (reduction.linearize_reads): a dict with ``coeffs`` (3, S, S) cubic
    planes, ``fw`` full well (e-) and optional ``bias_e`` pedestal plane
    (e-, only if the products carry one). Applied per file AFTER
    BLEVCORR and BEFORE the DQ repair and flux estimators — calwf3's
    order — but only when the product's NLINCORR header switch is not
    'OMIT' (products simulated without non-linearity must not be
    "corrected"). Files without the keyword are assumed compressed, like
    real raw data.
    """
    import jax
    import jax.numpy as jnp

    from wayne_tpu.io.ima import read_ima
    from wayne_tpu.reduction import (
        DQ_BAD_BITS, DQ_REF_PIXEL, good_diff_masks_from_dq,
        linearize_reads, ramp_slope_frame, ref_pixel_correct,
        repair_read_stack)

    # one jitted repair program reused across exposures (hot-pixel DQ
    # bits flag essentially EVERY exposure, so this runs per file —
    # eager op-by-op execution cost minutes on long visits; CLAUDE.md
    # jit-hoisting rule)
    repair_fn = jax.jit(
        lambda stack, dq_: repair_read_stack(
            stack, good_diff_masks_from_dq(dq_)))
    refpix_fn = jax.jit(lambda stack, ref: ref_pixel_correct(stack, ref)[0])
    lin_fn = None
    if nlin is not None:
        _coeffs = jnp.asarray(nlin["coeffs"], jnp.float32)
        _fw = float(nlin["fw"])
        _bias = (jnp.asarray(nlin["bias_e"], jnp.float32)
                 if nlin.get("bias_e") is not None else None)
        # raw-DN products convert with the per-pixel gain map when the
        # visit simulated gain variations (calwf3 gain-corrects from the
        # same reference file); rate products were already converted
        # with the scalar gain at write time, so they invert at g=1.
        _g_dn = (jnp.asarray(nlin["gain_map"], jnp.float32)
                 if nlin.get("gain_map") is not None else None)
        lin_fn = jax.jit(lambda stack, g: linearize_reads(
            stack, _coeffs, _fw,
            _g_dn if (_g_dn is not None and g is None) else
            (gain if g is None else g), bias_e=_bias))

    nets, starts, exptimes, n_reads = [], [], [], []
    scan_angs = []
    n_repaired = 0
    n_refpix = 0
    n_linearized = 0
    for p in paths:
        hdr, reads, times, dq = read_ima(p, with_dq=True)
        flagged = use_dq and bool((dq & DQ_BAD_BITS).any())
        if flagged:
            n_repaired += 1
        ref_mask = ((dq[0] & DQ_REF_PIXEL) != 0) if use_dq else None
        has_ref = use_dq and bool(ref_mask.any())
        if has_ref:
            n_refpix += 1

        def refpix(stack):
            return np.asarray(refpix_fn(jnp.asarray(stack, jnp.float32),
                                        jnp.asarray(ref_mask)))

        def repair(stack):
            return np.asarray(repair_fn(jnp.asarray(stack, jnp.float32),
                                        jnp.asarray(dq)))

        # calwf3 switch: 'OMIT' products were simulated without the
        # cubic compression; 'PERFORM' (or absent, like real raw files)
        # means the reads are compressed and should be linearized.
        do_nlin = (lin_fn is not None
                   and str(hdr.get("NLINCORR", "PERFORM")).upper()
                   != "OMIT")
        if do_nlin and reads.shape[-1] != nlin["coeffs"].shape[-1]:
            # reference planes were built for the YAML's subarray; a
            # directory of different-sized frames can't be corrected
            # with them (the windows check below reports the mismatch
            # for extraction; NLINCORR just stands down)
            print(f"warning: NLINCORR skipped — {reads.shape[-1]}^2 "
                  f"frames vs {nlin['coeffs'].shape[-1]}^2 calibration "
                  "planes (YAML subarray mismatch?)")
            lin_fn = None
            do_nlin = False
        if do_nlin:
            n_linearized += 1

        def linearize(stack, g=None):
            # g=None -> the product's native DN gain (map or scalar)
            return np.asarray(lin_fn(
                jnp.asarray(stack, jnp.float32),
                None if g is None else jnp.float32(g)))

        if str(hdr.get("BUNIT", "COUNTS")).upper().startswith("ELECTRONS"):
            if estimator == "ramp":
                raise SystemExit(
                    "--estimator ramp needs raw-DN (counts) products; "
                    "this visit was written as a count-rate ima")
            if len(reads) < 3:
                raise SystemExit(
                    "count-rate product with NSAMP=1: the zeroth read's "
                    "rate plane is empty and the only sampled read IS the "
                    "last read, so no CDS-able signal exists — regenerate "
                    "the visit with nsamp >= 2 or output_units: counts")
            # Count-rate product: convert back to accumulated electrons.
            # The zeroth read's rate plane is zero (t = 0), so it cannot
            # CDS-subtract the bias pedestal — difference against the
            # FIRST SAMPLED read instead. The lost 0..t1 signal interval
            # is a per-exposure-constant fraction, so depths (flux
            # ratios) are unaffected.
            acc = reads * np.asarray(times, np.float64)[:, None, None]
            if has_ref:
                acc = refpix(acc)
            if do_nlin:
                # rate planes are already gain-converted electrons/s, so
                # the accumulated stack inverts with unit gain
                acc = linearize(acc, 1.0)
            if flagged:
                acc = repair(acc)
            net = acc[-1] - acc[1]
        else:
            if has_ref:
                reads = refpix(reads)
            if do_nlin:
                # NLINCORR converts DN -> linearized electrons (bias
                # subtracted inside); estimators below must not apply
                # the gain again
                reads_e = linearize(reads)
                if flagged:
                    reads_e = repair(reads_e)
                if estimator == "ramp":
                    net = np.asarray(ramp_slope_frame(
                        jnp.asarray(reads_e),
                        jnp.asarray(times, jnp.float32)))
                else:
                    net = reads_e[-1] - reads_e[0]
            else:
                if flagged:
                    reads = repair(reads)
                if estimator == "ramp":
                    net = np.asarray(ramp_slope_frame(
                        jnp.asarray(reads),
                        jnp.asarray(times, jnp.float32))) * gain
                else:
                    net = (reads[-1] - reads[0]) * gain
        nets.append(net)
        starts.append(float(hdr["EXPSTART"]))
        exptimes.append(float(hdr.get("EXPTIME", times[-1])))
        n_reads.append(int(reads.shape[0]))
        scan_angs.append(float(hdr.get("SCAN_ANG", 0.0)))
    if n_repaired:
        print(f"DQ repair: rebuilt flagged reads in {n_repaired}/"
              f"{len(paths)} exposures (CR/saturation/hot bits)")
    if n_refpix:
        print(f"reference pixels: per-read amplifier bias drift "
              f"subtracted in {n_refpix}/{len(paths)} exposures "
              f"(DQ bit 128 border)")
    if n_linearized:
        print(f"NLINCORR: per-pixel cubic non-linearity inverted in "
              f"{n_linearized}/{len(paths)} exposures")
    nets = np.stack(nets)                      # (n_exp, S, S) electrons
    starts = np.asarray(starts)
    exptimes = np.asarray(exptimes)
    # Per-exposure mid-times: a directory mixing NSAMP/EXPTIME (e.g. a
    # shortened first exposure) must not inherit the LAST header's
    # exposure time for every epoch — that shifts t0-sensitive fits.
    mids = (starts - starts.min()) * 86400.0 + exptimes / 2.0
    if not np.allclose(exptimes, exptimes[0]):
        print(f"warning: mixed EXPTIME across exposures "
              f"({exptimes.min():.1f}..{exptimes.max():.1f} s) — "
              "per-exposure mid-times used; the optimal-extraction "
              "read-noise floor uses the smallest read count")

    S = nets.shape[1]
    if windows is not None:
        # Explicit windows (``--rows/--cols/--bg-rows``) bypass
        # detection — needed when the auto heuristics misjudge an
        # unusual visit (very long scans, crowded frames, partial
        # subarray illumination). Bounds are checked against the ACTUAL
        # frame size here (the YAML's subarray may not match the files).
        y_window, x_window, bg_rows = windows
        for name, (lo, hi) in zip(("--rows", "--cols", "--bg-rows"),
                                  windows):
            if hi > S:
                raise SystemExit(
                    f"{name} {lo}:{hi} outside the {S}^2 frames in this "
                    "directory — does the parameter file's subarray match "
                    "the visit being reduced?")
    else:
        # Auto windows from the median frame: first the rows carrying
        # the scanned spectrum (summed over all columns), then the
        # illuminated columns WITHIN those rows (a full-frame column
        # statistic would be swamped by the background rows).
        med = np.median(nets, axis=0)
        pad = 3
        row_sig = med.sum(axis=1)
        row_sig = row_sig - np.median(row_sig)
        rows = np.where(row_sig > 0.05 * row_sig.max())[0]
        if rows.size == 0:
            raise SystemExit(
                "no signal rows detected — the frames look background-only "
                "(was the spectrum off the detector? the simulator warns "
                "'spectrum lands outside the subarray' at generation time)")
        y_window = (max(int(rows.min()) - pad, 0),
                    min(int(rows.max()) + pad + 1, S))
        col_sig = med[y_window[0]: y_window[1]].sum(axis=0)
        col_sig = col_sig - np.median(col_sig)
        cols = np.where(col_sig > 0.1 * col_sig.max())[0]
        if cols.size == 0:
            raise SystemExit(
                "no illuminated columns detected inside the signal rows — "
                "frames appear to carry no dispersed spectrum")
        x_window = (max(int(cols.min()) - pad, 0),
                    min(int(cols.max()) + pad + 1, S))
        # Background rows: the larger sky-only margin above or below
        # the spectrum, with a generous gap against PSF tails. When the
        # scan fills the frame neither margin is usable — refuse rather
        # than silently 'subtract' rows inside the extraction window.
        gap = 4 * pad
        top = (min(y_window[1] + gap, S), S)
        bot = (0, max(y_window[0] - gap, 0))
        bg_rows = max(top, bot, key=lambda r: r[1] - r[0])
        if bg_rows[1] - bg_rows[0] < 2:
            raise SystemExit(
                f"no sky-only rows left outside the detected spectrum "
                f"(rows {y_window} of {S}) — the scan fills the frame; "
                "pass explicit --bg-rows (with --rows/--cols)")

    sky_fit = None
    if sky_components is not None:
        # Iraclis/aXe-style background: fit per-exposure weights of the
        # component FRAMES (constant + master sky + He airglow + dark)
        # on every off-trace pixel and subtract the model over the
        # whole frame — the components' spatial structure extrapolates
        # into the trace rows, which a row median cannot do. One
        # robust-clip iteration protects against unmasked stars / CR
        # survivors (reduction.fit_sky_model).
        from wayne_tpu.reduction import fit_sky_model

        gap = 12
        mask = np.ones((S, S), np.float32)
        mask[max(y_window[0] - gap, 0): min(y_window[1] + gap, S), :] = 0.0
        frames = np.asarray(sky_components["frames"], np.float32)
        w, model = fit_sky_model(jnp.asarray(nets, jnp.float32),
                                 jnp.asarray(frames), jnp.asarray(mask))
        w = np.asarray(w)
        nets = nets - np.asarray(model)
        names = list(sky_components["names"])
        sky_fit = {
            "components": names,
            "mean_weights": [round(float(v), 4) for v in w.mean(axis=0)],
            "weights_per_exposure": {
                n: [round(float(v), 4) for v in w[:, k]]
                for k, n in enumerate(names)},
        }
        print("sky-component fit: " + ", ".join(
            f"{n}={w[:, k].mean():.3g}" for k, n in enumerate(names)))
    else:
        bg = np.median(nets[:, bg_rows[0]: bg_rows[1], :],
                       axis=1)                             # per-col sky
        nets = nets - bg[:, None, :]
    if quad_map is not None:
        # per-exposure per-AMPLIFIER offset removal: IR subarrays carry
        # no reference pixels and the background rows may sit in a
        # DIFFERENT amplifier quadrant than the spectrum — the leaked
        # per-exposure offset is additive, so its normalised imprint is
        # chromatic (~1/F_c) and biases relative depths. ONE algorithm:
        # the jitted library helper (reduction.amp_offset_correct) is
        # the implementation of record for both reduce paths.
        from wayne_tpu.reduction import amp_offset_correct

        import jax.numpy as jnp

        nets = np.asarray(amp_offset_correct(
            jnp.asarray(nets, jnp.float32), jnp.asarray(quad_map),
            tuple(y_window), tuple(x_window)))
    if extract == "optimal":
        from wayne_tpu.reduction import (
            optimal_extract, read_noise_var_e2, spatial_profile)

        prof = spatial_profile(jnp.asarray(nets.mean(axis=0), jnp.float32),
                               y_window)
        floor = read_noise_var_e2(read_noise_e, min(n_reads),
                                  ramp=estimator == "ramp")
        spectra = np.asarray(optimal_extract(
            jnp.asarray(nets, jnp.float32), prof, y_window, floor))
    else:
        spectra = nets[:, y_window[0]: y_window[1], :].sum(axis=1)  # (n_exp, S)
    return (spectra, mids, (y_window, x_window, bg_rows),
            np.asarray(scan_angs), sky_fit)


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="wayne_tpu.run_reduce",
        description="Reduce a simulated WFC3 visit from its ima files.")
    parser.add_argument("-d", "--visit-dir", required=True,
                        help="directory of *_ima.fits files")
    parser.add_argument("-p", "--parameter-file", required=True,
                        help="the visit's YAML (system model for the fit)")
    parser.add_argument("-o", "--output", default=None,
                        help="JSON report path (default <dir>/reduced.json)")
    parser.add_argument("--n-chan", type=int, default=8)
    parser.add_argument("--mode", choices=("transit", "eclipse", "phase"),
                        default="transit",
                        help="transit: fit per-channel Rp/Rs; eclipse: fit "
                             "per-channel Fp/Fs (secondary-eclipse "
                             "visits); phase: closed-form thermal "
                             "phase-curve fit per channel — Fp/Fs, "
                             "modulation amplitude and hot-spot offset "
                             "(full-orbit visits)")
    parser.add_argument("--estimator", choices=("cds", "ramp"),
                        default="cds",
                        help="per-pixel charge estimator: CDS (last minus "
                             "zeroth read) or calwf3-style up-the-ramp "
                             "least-squares slope")
    parser.add_argument("--extract", choices=("box", "optimal"),
                        default="box",
                        help="column extraction: plain box sum over the "
                             "detected rows, or Horne (1986) "
                             "inverse-variance profile weighting (lower "
                             "read-noise/background scatter)")
    parser.add_argument("--align", action="store_true",
                        help="fit per-exposure dispersion-direction drifts "
                             "against the visit-mean spectrum and realign "
                             "before channel binning (removes pointing-"
                             "drift trends from the channel curves)")
    parser.add_argument("--no-divide-white", action="store_true",
                        help="skip the white common-mode correction")
    parser.add_argument("--detrend",
                        choices=("divide-white", "ramp", "recte", "none"),
                        default=None,
                        help="systematics removal before the channel fits: "
                             "divide-white (empirical common-mode template, "
                             "the default), ramp (joint Iraclis-style white "
                             "fit of transit x slope x per-orbit exponential "
                             "ramp, then divide the fitted parametric "
                             "template — also reports the ABSOLUTE white "
                             "Rp/Rs), recte (transit mode only: the same "
                             "joint fit with the PHYSICAL Zhou+17 two-trap "
                             "charge-trapping ramp, floating the per-visit "
                             "initial trap fills), or none. Overrides "
                             "--no-divide-white.")
    parser.add_argument("--fit-geometry", action="store_true",
                        help="with --detrend ramp: free the transit "
                             "geometry (t0, a/Rs, inclination) in the "
                             "white-light fit and hold the FITTED "
                             "ephemeris for the channel fits, like real "
                             "analyses do (YAML values seed the fit)")
    parser.add_argument("--clip-sigma", type=float, default=None,
                        metavar="K",
                        help="robust white fit (--detrend ramp, transit "
                             "or eclipse mode): sigma-clip residual "
                             "outliers at K robust sigmas (1.4826 x "
                             "MAD) and refit; "
                             "the clipped exposures are skipped by the "
                             "channel depth fits too — survives what "
                             "the ramp model cannot represent (starspot "
                             "crossings, residual cosmic rays)")
    parser.add_argument("--sky-fit", action="store_true",
                        help="Iraclis/aXe-style background: fit "
                             "per-exposure weights of the calibration "
                             "sky COMPONENT frames (constant + master "
                             "sky + He airglow + dark) on the off-trace "
                             "pixels and subtract the model over the "
                             "whole frame, instead of the per-column "
                             "row-median; weights land in reduced.json")
    parser.add_argument("--mcmc", type=int, nargs="?", const=1500,
                        default=0, metavar="N_STEPS",
                        help="also sample posterior depths on device "
                             "(transit mode): joint ramp+transit white "
                             "posterior plus every channel's depth "
                             "posterior, vmapped into one program "
                             "(default 1500 steps when given bare)")
    parser.add_argument("--no-dq", action="store_true",
                        help="ignore the DQ planes (skip the cosmic-ray/"
                             "saturation/hot-pixel read repair)")
    parser.add_argument("--no-nlincorr", action="store_true",
                        help="skip the calwf3 NLINCORR step (per-pixel "
                             "cubic non-linearity inversion; applied by "
                             "default to products whose header says the "
                             "detector chain compressed them)")
    parser.add_argument("--no-amp-offset", action="store_true",
                        help="skip the per-exposure per-amplifier "
                             "offset removal (on by default: subarrays "
                             "have no reference pixels, and amplifier "
                             "bias wander in a different quadrant than "
                             "the background rows leaks a chromatic "
                             "additive term into the channel curves)")
    parser.add_argument("--rows", default=None, metavar="Y0:Y1",
                        help="extraction rows (overrides auto-detection;"
                             " must be given together with --cols and "
                             "--bg-rows)")
    parser.add_argument("--wl-range", default=None, metavar="LO:HI",
                        help="clip the channel band to this WAVELENGTH "
                             "range in microns (e.g. 1.125:1.65, the "
                             "published G141 convention) — the "
                             "sensitivity-cliff edge bins are honestly "
                             "~6x noisier; intersects the illuminated/"
                             "--cols window via the trace solution")
    parser.add_argument("--cols", default=None, metavar="X0:X1",
                        help="dispersion columns carrying signal")
    parser.add_argument("--bg-rows", default=None, metavar="B0:B1",
                        help="sky-only rows for background subtraction")
    parser.add_argument("--direct-image", action="store_true",
                        help="anchor the wavelength solution at the "
                             "source centroid measured from the visit's "
                             "*_direct.fits (what real pipelines do) "
                             "instead of the YAML x_ref/y_ref")
    parser.add_argument("--save-spectra", action="store_true",
                        help="also write spectra.fits: the per-exposure "
                             "extracted spectra (SPECTRA (n_exp, S) e-), "
                             "the column wavelength solution "
                             "(WAVELENGTH um) and exposure mid-times "
                             "(TIME s) as image extensions")
    parser.add_argument("--save-lc", action="store_true",
                        help="include the per-channel light curves in "
                             "the JSON report (channel_lc, n_exp x "
                             "n_chan): the DETRENDED, normalised curves "
                             "the depths were fitted on — raw spectra "
                             "cannot reproduce them without re-running "
                             "the detrend chain; feed them to external "
                             "fitters with the report's per-channel "
                             "sigmas")
    parser.add_argument("--plot", action="store_true",
                        help="also write a quicklook PNG (needs matplotlib)")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from wayne_tpu.calibration import sequence_tables_scope
    from wayne_tpu.config import load_yaml
    from wayne_tpu.models.grism import make_calibrated_grism
    from wayne_tpu.models.planet import Planet
    from wayne_tpu.io.ima import read_ima
    from wayne_tpu.reduction import common_mode_correct, fit_depths

    cfg = load_yaml(args.parameter_file)
    paths = collect_visit(args.visit_dir)
    hdr0, _, _ = read_ima(paths[0])
    # same calibration (incl. any loaded STScI products) as the simulator
    with sequence_tables_scope(cfg.calibration.sequence_file):
        grism = make_calibrated_grism(cfg)
    gain = float(grism.tables.gain)
    print(f"reducing {len(paths)} exposures from {args.visit_dir} "
          f"({hdr0.get('FILTER')}, SUBARRAY {cfg.subarray})")

    windows = None
    given = [args.rows, args.cols, args.bg_rows]
    if any(v is not None for v in given):
        if not all(v is not None for v in given):
            raise SystemExit("--rows, --cols and --bg-rows must be "
                             "given together (or none, for "
                             "auto-detection)")

        from wayne_tpu.utils.cli import parse_range as _rng

        windows = (_rng(args.rows, "--rows"), _rng(args.cols, "--cols"),
                   _rng(args.bg_rows, "--bg-rows"))
    # NLINCORR reference data: enabled when the products' header switch
    # says the detector chain compressed them (or, for pre-switch files,
    # when the YAML simulated with non-linearity on). The bias pedestal
    # plane only rides along if the products actually carry one.
    nlin = None
    if not args.no_nlincorr:
        hdr_switch = str(hdr0.get(
            "NLINCORR",
            "PERFORM" if cfg.noise.non_linearity else "OMIT")).upper()
        if hdr_switch != "OMIT":
            nlin = {"coeffs": grism.tables.nonlin_coeffs,
                    "fw": float(grism.tables.full_well_e),
                    "bias_e": (grism.tables.bias_map
                               if cfg.noise.bias else None),
                    "gain_map": (grism.tables.gain_map
                                 if cfg.noise.gain_variations else None)}
    sky_components = None
    if args.sky_fit:
        # component frames from the same calibration set the simulation
        # used (real-calibration YAML blocks load real frames here)
        # Structure components are fitted MEAN-REMOVED (frame - 1): the
        # mean-1 sky/He frames are otherwise collinear with the
        # constant and the per-component weights degenerate (the model
        # stays exact but the reported levels wander). With (frame - 1)
        # columns, "constant" is the total mean background and each
        # structure weight is exactly that component's level x exptime.
        names = ["constant", "master_sky"]
        frames = [np.ones((cfg.subarray, cfg.subarray), np.float32),
                  np.asarray(grism.tables.sky_frame, np.float32) - 1.0]
        if grism.tables.sky_he_frame is not None:
            names.append("he_airglow")
            frames.append(np.asarray(grism.tables.sky_he_frame,
                                     np.float32) - 1.0)
        names.append("dark")
        frames.append(np.asarray(grism.tables.dark_map, np.float32))
        sky_components = {"names": names, "frames": np.stack(frames)}
    from wayne_tpu.calibration import quadrant_map

    qmap = (None if args.no_amp_offset else np.asarray(quadrant_map(
        cfg.subarray, grism.tables.subarray_corner)))
    spectra, mids, (yw, xw, bg), scan_angs, sky_fit = extract_from_files(
        paths, gain, args.estimator, use_dq=not args.no_dq,
        extract=args.extract,
        read_noise_e=float(grism.tables.read_noise_e),
        windows=windows, nlin=nlin, sky_components=sky_components,
        quad_map=qmap)
    label = "explicit" if windows is not None else "auto"
    print(f"{label} windows: rows {yw}, cols {xw}, background rows {bg}")

    # System model on the visit clock (first exposure start = 0).
    planet = Planet(cfg.planet, visit_start_mjd=float(hdr0["EXPSTART"]))
    orbit = planet.orbit_params()
    ld_grid = jnp.asarray(planet.ld_on_grid(
        np.asarray(grism.tables.wl_centers)), jnp.float32)
    # broadband (white-light) coefficients: band mean of a chromatic
    # table; per-channel rows are rebuilt after the channel edges are
    # known (fit_depths takes (n_chan, 4))
    ld = jnp.mean(ld_grid, axis=0) if ld_grid.ndim == 2 else ld_grid

    # Light curves: white + n_chan channels over the detected columns.
    from wayne_tpu.reduction import out_of_transit_mask

    t = jnp.asarray(mids, jnp.float32)
    oot = np.asarray(out_of_transit_mask(t, orbit))
    if oot.sum() < 2:
        raise SystemExit("not enough out-of-transit exposures to normalise")

    # Upstream/downstream correction: forward and reverse scans see
    # slightly different effective exposure times (a ~0.1-1% achromatic
    # flux offset between directions in real WFC3 spatial-scan visits).
    # Standard treatment: split the series on SCAN_ANG and normalise
    # each direction by its own out-of-transit baseline BEFORE any
    # drift decorrelation or fitting. The offset is achromatic, so one
    # white-flux factor per direction corrects every column exactly.
    scan_dir_offsets = None
    uniq_angs = np.unique(scan_angs)
    if uniq_angs.size > 1:
        if any(((scan_angs == a) & oot).sum() < 2 for a in uniq_angs):
            print("warning: a scan direction has <2 out-of-transit "
                  "exposures — skipping per-direction normalisation "
                  "(the upstream/downstream offset, if any, remains)")
        else:
            white_all = spectra.sum(axis=1)
            ref_ang = uniq_angs[0]
            base = white_all[(scan_angs == ref_ang) & oot].mean()
            scan_dir_offsets = {}
            for a in uniq_angs[1:]:
                sel = scan_angs == a
                fac = white_all[sel & oot].mean() / base
                spectra = np.where(sel[:, None], spectra / fac, spectra)
                scan_dir_offsets[f"{a:g}"] = round(float(fac - 1.0), 6)
            offs = ", ".join(f"SCAN_ANG {a}: {o * 100:+.3f}%"
                             for a, o in scan_dir_offsets.items())
            print(f"scan-direction normalisation vs SCAN_ANG "
                  f"{ref_ang:g}: {offs} (upstream/downstream offset "
                  "removed)")

    def normalise(flux):
        return flux / flux[oot].mean(axis=0)

    shifts = None
    if args.align:
        from wayne_tpu.reduction import spectral_shifts

        shifts = np.asarray(spectral_shifts(
            jnp.asarray(spectra, jnp.float32), xw))
        print(f"dispersion drift: {shifts.min():+.4f}..{shifts.max():+.4f} "
              f"px, decorrelating the light curves")

    if args.n_chan < 1:
        raise SystemExit(f"--n-chan must be >= 1, got {args.n_chan}")
    n_cols = xw[1] - xw[0]
    if args.n_chan > n_cols:
        print(f"only {n_cols} illuminated columns: clamping --n-chan "
              f"{args.n_chan} -> {n_cols}")
        args.n_chan = n_cols
    # SAME edge computation as the on-device library path (CLAUDE.md
    # invariant: _channel_edges in BOTH paths, or f32 linspace + int
    # truncation can disagree with host edges by one column).
    from wayne_tpu.reduction import _channel_edges

    edges = np.asarray(_channel_edges(xw, args.n_chan))
    # Channel wavelengths from the configured dispersion solution.
    xref_used, yref_used, wl_source = cfg.x_ref, cfg.y_ref, "yaml"
    if args.direct_image:
        dpaths = sorted(glob.glob(
            os.path.join(args.visit_dir, "*_direct.fits")))
        if not dpaths:
            raise SystemExit(
                f"--direct-image: no *_direct.fits in {args.visit_dir!r} "
                "(Observation.generate() writes one at visit start)")
        xref_used, yref_used = centroid_direct_image(dpaths[0])
        wl_source = "direct_image"
        print(f"direct-image centroid: x_ref={xref_used:.3f}, "
              f"y_ref={yref_used:.3f} (YAML: {cfg.x_ref:.3f}, "
              f"{cfg.y_ref:.3f}) — anchoring the wavelength solution")
    tp = grism.get_trace(xref_used, yref_used)
    from wayne_tpu.ops.dispersion import wl_to_x, x_to_wl

    if args.wl_range:
        # Clip the channel band to a WAVELENGTH range (e.g. 1.125:1.65,
        # the published convention for G141): the sensitivity-cliff
        # edge bins are honestly ~6x noisier (docs/REDUCTION.md
        # "Error-bar calibration") and real analyses exclude them.
        try:
            lo_um, hi_um = sorted(float(v)
                                  for v in args.wl_range.split(":"))
        except ValueError:
            raise SystemExit("--wl-range must look like LO:HI in "
                             f"microns, got {args.wl_range!r}")
        if not 0.0 < lo_um < hi_um:
            raise SystemExit(f"--wl-range {args.wl_range!r} is not an "
                             "increasing positive range")
        xs = np.asarray(wl_to_x(jnp.asarray([lo_um, hi_um], jnp.float32),
                                tp))
        clip = (int(np.floor(xs.min())), int(np.ceil(xs.max())) + 1)
        new_xw = (max(xw[0], clip[0]), min(xw[1], clip[1]))
        if new_xw[1] - new_xw[0] < max(args.n_chan, 2):
            raise SystemExit(
                f"--wl-range {args.wl_range} um maps to columns {clip} "
                f"— fewer than {max(args.n_chan, 2)} columns overlap "
                f"the illuminated window {xw}")
        if new_xw != xw:
            print(f"wavelength clip {lo_um:.3f}-{hi_um:.3f} um: columns "
                  f"{xw} -> {new_xw}")
            xw = new_xw
            edges = np.asarray(_channel_edges(xw, args.n_chan))
    wl_edges = np.asarray(x_to_wl(jnp.asarray(edges, jnp.float32), tp))

    # White-light limb darkening from the rows INSIDE the illuminated
    # band only — a full-table mean is tilted by out-of-band rows when
    # the chromatic table spans more than the extraction window, and
    # would be inconsistent with the band-selected per-channel rows
    # built below.
    if ld_grid.ndim == 2:
        wl_c_all = np.asarray(grism.tables.wl_centers)
        lo_w = float(min(wl_edges[0], wl_edges[-1]))
        hi_w = float(max(wl_edges[0], wl_edges[-1]))
        in_band = (wl_c_all >= lo_w) & (wl_c_all < hi_w)
        if in_band.any():
            ld = jnp.asarray(np.asarray(ld_grid)[in_band].mean(axis=0),
                             jnp.float32)

    # Per-channel limb darkening when a chromatic table is configured:
    # average the grid rows falling in each channel's wavelength range
    # (band-mean LD tilts the recovered spectrum at the band edges).
    ld_chan = ld
    if ld_grid.ndim == 2:
        wl_c = np.asarray(grism.tables.wl_centers)
        g = np.asarray(ld_grid)
        rows = []
        for lo_um, hi_um in zip(wl_edges[:-1], wl_edges[1:]):
            lo_um, hi_um = min(lo_um, hi_um), max(lo_um, hi_um)
            sel = (wl_c >= lo_um) & (wl_c < hi_um)
            rows.append(g[sel].mean(axis=0) if sel.any()
                        else g[np.argmin(np.abs(
                            wl_c - 0.5 * (lo_um + hi_um)))])
        ld_chan = jnp.asarray(np.stack(rows), jnp.float32)
        print("chromatic limb darkening: per-channel coefficients "
              "from the configured ld table")

    white_flux = spectra[:, xw[0]: xw[1]].sum(axis=1)
    chan_flux = np.stack([spectra[:, lo:hi].sum(axis=1)
                          for lo, hi in zip(edges[:-1], edges[1:])], axis=1)
    if shifts is not None:
        # linear decorrelation against the transit-cleaned dispersion
        # centroid (affine in the true drift), OOT-fitted — removes the
        # bin-edge leak without eating a chromatic transit
        from wayne_tpu.reduction import (clean_drift_regressor,
                                         dispersion_centroid,
                                         drift_regressor, shift_detrend,
                                         transit_drift_basis)

        oot_j = jnp.asarray(oot)
        cen = dispersion_centroid(jnp.asarray(spectra, jnp.float32), xw)
        if args.mode == "transit":
            # model-basis clean: spans the chromatic transit's centroid
            # excursion exactly, estimated drift-orthogonally
            basis = transit_drift_basis(
                t, orbit, ld, jnp.float32(cfg.planet.rp_over_rs or 0.1))
            reg = clean_drift_regressor(cen, basis, t)
        else:
            # eclipse dips are achromatic to the fp level — the
            # white-dip projection suffices
            reg = drift_regressor(jnp.asarray(spectra, jnp.float32), xw,
                                  jnp.asarray(white_flux, jnp.float32),
                                  oot_j)
        white_flux = np.asarray(shift_detrend(
            jnp.asarray(white_flux, jnp.float32), reg, oot_j))
        chan_flux = np.asarray(shift_detrend(
            jnp.asarray(chan_flux, jnp.float32), reg, oot_j))
    white = normalise(white_flux)
    chan = np.stack([normalise(chan_flux[:, j])
                     for j in range(args.n_chan)], axis=1)

    rp0 = jnp.float32(cfg.planet.rp_over_rs or 0.1)
    chan_j = jnp.asarray(chan, jnp.float32)
    detrend = args.detrend or ("none" if args.no_divide_white
                               else "divide-white")
    depth_weights = None   # robust-clip keep mask (--clip-sigma)
    if args.clip_sigma is not None and (detrend != "ramp"
                                        or args.mode == "phase"):
        raise SystemExit("--clip-sigma requires --detrend ramp in "
                         "--mode transit or eclipse (the robust clip "
                         "lives in the white ramp fit and its mask "
                         "feeds the channel depth fits)")
    if args.clip_sigma is not None and args.clip_sigma <= 1.0:
        raise SystemExit(f"--clip-sigma {args.clip_sigma} would clip "
                         "most of the data; use K > 1 (typically 3-5)")
    if args.fit_geometry and (detrend != "ramp"
                              or args.mode != "transit"):
        raise SystemExit("--fit-geometry requires --mode transit with "
                         "--detrend ramp (the ephemeris is fitted "
                         "jointly with the white transit+ramp model; "
                         "eclipse/phase visits cannot constrain it)")
    white_fit_report = None
    t0_ref_shift_s = 0.0   # fitted-ephemeris offset vs the YAML zero point
    rp_sig_rel = None      # divide-white shape-error component
    sigma_white_dw = None  # divide-white common-mode (white-fit) sigma
    if args.mode == "eclipse":
        from wayne_tpu.ops.kepler import projected_separation
        from wayne_tpu.ops.transit import eclipse_visibility
        from wayne_tpu.reduction import fit_eclipse_depths

        z_t, infr_t = projected_separation(t, orbit)
        vis = eclipse_visibility(z_t, infr_t, rp0)
        # Without occultation coverage the eclipse fit's design matrix is
        # singular (vis constant) — fail loudly instead of writing NaNs.
        if float(jnp.max(vis) - jnp.min(vis)) < 0.1:
            raise SystemExit(
                "no secondary-eclipse coverage in this visit (planet "
                "visibility barely changes) — check start_mjd/t0/period "
                "or use --mode transit")
        white_j = jnp.asarray(white, jnp.float32)
        if detrend == "recte":
            raise SystemExit("--detrend recte is wired for --mode "
                             "transit only; use ramp (it has an "
                             "eclipse=True white model) or divide-white")
        if detrend == "ramp":
            from wayne_tpu.reduction import fit_white_ramp

            wfit = fit_white_ramp(white_j, t, orbit, ld, rp0,
                                  eclipse=True,
                                  clip_sigma=args.clip_sigma)
            if args.clip_sigma is not None:
                depth_weights = wfit.weights
                clipped = np.flatnonzero(np.asarray(wfit.weights) == 0.0)
                if clipped.size:
                    print(f"robust white fit clipped {clipped.size} "
                          f"exposure(s) at {args.clip_sigma} sigma: "
                          f"{clipped.tolist()}")
            # fit_eclipse_depths absorbs any per-channel baseline, so
            # dividing the parametric systematic template suffices
            chan_j = chan_j / wfit.template[:, None]
            white_fit_report = {
                "fp_over_fs": round(float(wfit.rp), 7),
                "fp_sigma": round(float(wfit.rp_sigma), 7),
                "slope_per_day": round(float(wfit.slope_per_day), 6),
                "hook_amp": round(float(wfit.hook_amp), 6),
                "hook_amp_first_orbit": round(float(wfit.hook_amp_first), 6),
                "hook_tau_s": round(float(wfit.hook_tau_s), 2),
                **({"clip_sigma": args.clip_sigma,
                    "clipped_exposures": np.flatnonzero(
                        np.asarray(wfit.weights) == 0.0).tolist()}
                   if args.clip_sigma is not None else {}),
            }
            print(f"white eclipse ramp fit: fp = "
                  f"{white_fit_report['fp_over_fs']:.6f} +- "
                  f"{white_fit_report['fp_sigma']:.6f}")
        elif detrend == "divide-white":
            # Eclipse-aware common mode: the transit-model template would
            # divide the eclipse signal itself out of the channels, so
            # build the template against the fitted white ECLIPSE model.
            # The white fit's Fp/Fs error deforms the template by the
            # visibility shape and shifts every channel coherently —
            # keep its sigma and add it in quadrature, exactly like the
            # transit divide-white path (divide_white_fit_depths).
            fp_w, fp_w_sig = fit_eclipse_depths(white_j[:, None], t,
                                                orbit, rp0)
            sigma_white_dw = fp_w_sig[0]
            chan_j = chan_j / (white_j / (1.0 + fp_w[0] * vis))[:, None]
        rp_hat, rp_sig = fit_eclipse_depths(chan_j, t, orbit, rp0,
                                            weights=depth_weights)
        if sigma_white_dw is not None:
            rp_sig_rel = rp_sig
            rp_sig = jnp.sqrt(rp_sig**2 + sigma_white_dw**2)
        value_key, sigma_key = "fp_over_fs", "fp_sigma"
    elif args.mode == "phase":
        from wayne_tpu.ops.kepler import (orbital_phase_angle,
                                          projected_separation)
        from wayne_tpu.ops.transit import eclipse_visibility
        from wayne_tpu.reduction import fit_phase_curve

        if detrend in ("ramp", "recte"):
            raise SystemExit(f"--detrend {detrend} is not wired for "
                             "--mode phase; use divide-white or none")
        white_j = jnp.asarray(white, jnp.float32)
        z_t, infr_t = projected_separation(t, orbit)
        vis = eclipse_visibility(z_t, infr_t, rp0)
        if float(jnp.max(vis) - jnp.min(vis)) < 0.1:
            raise SystemExit(
                "no secondary-eclipse coverage in this visit (planet "
                "visibility barely changes), so Fp/Fs cannot be "
                "separated from the baseline — cover the eclipse (an "
                "explicit exp_start_times schedule helps) or use "
                "--mode transit")
        phi = orbital_phase_angle(t, orbit)
        wfit = fit_phase_curve(white_j, t, orbit, rp0)
        white_fit_report = {
            "fp_over_fs": round(float(wfit.fp), 7),
            "fp_sigma": round(float(wfit.fp_sigma), 7),
            "phase_amplitude": round(float(wfit.amp), 4),
            "phase_amplitude_sigma": round(float(wfit.amp_sigma), 4),
            "hot_spot_offset_deg": round(
                float(np.rad2deg(np.asarray(wfit.offset_rad))), 2),
            "baseline_slope": round(float(wfit.slope), 6),
        }
        print(f"white phase fit: fp = {white_fit_report['fp_over_fs']:.6f}"
              f" +- {white_fit_report['fp_sigma']:.6f}, A = "
              f"{white_fit_report['phase_amplitude']:.3f}, offset "
              f"{white_fit_report['hot_spot_offset_deg']:.1f} deg")
        if detrend == "divide-white":
            # phase-aware common mode: divide by white / white-MODEL so
            # the template carries only the instrument systematics, not
            # the phase signal itself
            mod_w = 1.0 - wfit.amp * 0.5 * (
                1.0 - jnp.cos(phi + wfit.offset_rad))
            model_w = 1.0 + wfit.fp * mod_w * vis
            chan_j = chan_j / (white_j / model_w)[:, None]
        pf = fit_phase_curve(chan_j, t, orbit, rp0)
        rp_hat, rp_sig = pf.fp, pf.fp_sigma
        phase_extra = [
            {"phase_amplitude": round(float(pf.amp[i]), 4),
             "phase_amplitude_sigma": round(float(pf.amp_sigma[i]), 4),
             "hot_spot_offset_deg": round(
                 float(np.rad2deg(np.asarray(pf.offset_rad))[i]), 2)}
            for i in range(int(pf.fp.shape[0]))]
        value_key, sigma_key = "fp_over_fs", "fp_sigma"
    else:
        if detrend == "divide-white":
            # keep the white fit's depth sigma: the template is a model
            # at the FITTED white depth, so its error shifts every
            # channel depth coherently and invisibly to per-channel
            # residuals (reduction.divide_white_fit_depths rationale)
            chan_j, sigma_white_dw = common_mode_correct(
                jnp.asarray(white, jnp.float32), chan_j, t, orbit, ld,
                rp0, return_white_sigma=True)
        elif detrend == "ramp":
            from wayne_tpu.reduction import fit_white_ramp, ramp_detrend

            wfit = fit_white_ramp(jnp.asarray(white, jnp.float32), t,
                                  orbit, ld, rp0,
                                  fit_geometry=args.fit_geometry,
                                  clip_sigma=args.clip_sigma)
            if args.clip_sigma is not None:
                depth_weights = wfit.weights
                clipped = np.flatnonzero(np.asarray(wfit.weights) == 0.0)
                if clipped.size:
                    print(f"robust white fit clipped {clipped.size} "
                          f"exposure(s) at {args.clip_sigma} sigma: "
                          f"{clipped.tolist()}")
            if args.fit_geometry:
                # hold the white curve's fitted ephemeris per channel
                dt0 = abs(float(wfit.t0_offset_s))
                if dt0 > 600.0:
                    # the extraction-stage steps (OOT baseline, drift
                    # decorrelation) ran with the STALE YAML ephemeris —
                    # they treated true in-transit epochs as baseline
                    print(f"warning: fitted t0 is {dt0:.0f} s from the "
                          "parameter file's — the alignment/normalisation "
                          "above used the stale ephemeris; re-run with "
                          "the fitted t0 in the YAML for clean channels")
                orbit = wfit.orbit
                # downstream t0 posteriors sample around THIS fitted
                # ephemeris; shift them back so every reported
                # t0_offset_s shares the YAML zero point
                t0_ref_shift_s = float(wfit.t0_offset_s)
            chan_j = ramp_detrend(chan_j, wfit, t, orbit)
            white_fit_report = {
                "rp_over_rs": round(float(wfit.rp), 6),
                "rp_sigma": round(float(wfit.rp_sigma), 6),
                "slope_per_day": round(float(wfit.slope_per_day), 6),
                "hook_amp": round(float(wfit.hook_amp), 6),
                "hook_amp_first_orbit": round(float(wfit.hook_amp_first), 6),
                "hook_tau_s": round(float(wfit.hook_tau_s), 2),
                **({"fitted_geometry": {
                    "t0_offset_s": round(float(wfit.t0_offset_s), 2),
                    "sma_over_rs": round(float(wfit.orbit.sma_rs), 4),
                    "inclination_deg": round(float(
                        np.rad2deg(np.asarray(wfit.orbit.inc_rad))), 3)}}
                   if args.fit_geometry else {}),
                **({"clip_sigma": args.clip_sigma,
                    "clipped_exposures": np.flatnonzero(
                        np.asarray(wfit.weights) == 0.0).tolist()}
                   if args.clip_sigma is not None else {}),
            }
            print(f"white ramp fit: rp={white_fit_report['rp_over_rs']:.5f}"
                  f" +- {white_fit_report['rp_sigma']:.5f}, slope "
                  f"{white_fit_report['slope_per_day']:+.5f}/day, hook "
                  f"{white_fit_report['hook_amp']:.5f}"
                  f" (x{wfit.hook_amp_first / jnp.maximum(wfit.hook_amp, 1e-9):.2f}"
                  f" orbit 1), tau {white_fit_report['hook_tau_s']:.0f} s")
        elif detrend == "recte":
            from wayne_tpu.reduction import fit_white_recte, ramp_detrend

            # effective illuminated-pixel rate of the white aperture;
            # the fit's rate_scale calibrates the bright/faint mix
            exptime = float(hdr0.get("EXPTIME", mids[0] * 2.0))
            n_ap = max((yw[1] - yw[0]) * (xw[1] - xw[0]), 1)
            rate0 = float(np.asarray(white_flux)[oot].mean()
                          / n_ap / exptime)
            wfit = fit_white_recte(jnp.asarray(white, jnp.float32), t,
                                   orbit, ld, rp0, rate_e_s=rate0,
                                   exptime_s=exptime)
            chan_j = ramp_detrend(chan_j, wfit, t, orbit)
            white_fit_report = {
                "rp_over_rs": round(float(wfit.rp), 6),
                "rp_sigma": round(float(wfit.rp_sigma), 6),
                "slope_per_day": round(float(wfit.slope_per_day), 6),
                "f0_slow": round(float(wfit.f0_s), 4),
                "f0_fast": round(float(wfit.f0_f), 4),
                "rate_e_s_supplied": round(rate0, 3),
                "rate_scale_fitted": round(float(wfit.rate_scale), 4),
            }
            print(f"white RECTE fit: rp="
                  f"{white_fit_report['rp_over_rs']:.5f} +- "
                  f"{white_fit_report['rp_sigma']:.5f}, trap fill "
                  f"f0_s={white_fit_report['f0_slow']:.3f} "
                  f"f0_f={white_fit_report['f0_fast']:.3f}, rate "
                  f"{rate0:.1f} e-/s x "
                  f"{white_fit_report['rate_scale_fitted']:.2f}")
        rp_hat, rp_sig = fit_depths(chan_j, t, orbit, ld_chan, rp0,
                                    weights=depth_weights)
        if sigma_white_dw is not None:
            # decomposition kept: sigma_rel is the channel-to-channel
            # SHAPE error (what transmission spectroscopy uses — the
            # common term shifts all channels together and cancels in
            # differences); the quadrature total is the absolute error.
            # Cov = diag(rel^2) + common^2 * ones (docs/REDUCTION.md).
            rp_sig_rel = rp_sig
            rp_sig = jnp.sqrt(rp_sig**2 + sigma_white_dw**2)
        value_key, sigma_key = "rp_over_rs", "rp_sigma"

    white_post_report, chan_post = None, None
    if args.mcmc and args.mode == "phase":
        raise SystemExit("--mcmc is not wired for --mode phase (the "
                         "closed-form fit already returns sigmas)")
    if args.mcmc:
        import jax

        from wayne_tpu.mcmc import (sample_channel_posteriors,
                                    sample_white_posterior)

        eclipse = args.mode == "eclipse"
        # keep at least half the chain after burn-in for short runs
        n_burn = max(0, min(max(args.mcmc // 4, 100),
                            args.mcmc // 2, args.mcmc - 1))
        wpost = sample_white_posterior(
            jnp.asarray(white, jnp.float32), t, orbit, ld, rp0,
            jax.random.PRNGKey(20250817), n_steps=args.mcmc,
            n_burn=n_burn, fit_geometry=args.fit_geometry,
            eclipse=eclipse, weights=depth_weights)
        chan_post = sample_channel_posteriors(
            chan_j, t, orbit, ld_chan,
            (jnp.asarray(rp_hat, jnp.float32) if eclipse else rp0),
            jax.random.PRNGKey(43), n_steps=args.mcmc, n_burn=n_burn,
            eclipse=eclipse, rp_geom=rp0, weights=depth_weights)
        dkey = "fp_over_fs" if eclipse else "rp_over_rs"
        white_post_report = {
            "n_steps": args.mcmc, "n_burn": n_burn,
            f"{dkey}_median": round(float(wpost.rp_median), 7),
            "depth_plus": round(float(wpost.rp_plus), 7),
            "depth_minus": round(float(wpost.rp_minus), 7),
            "acceptance": round(float(wpost.acceptance), 3),
            # convergence: worst split R-hat / smallest ESS over all
            # sampled dims (mcmc.chain_diagnostics)
            "rhat_max": round(float(np.max(np.asarray(wpost.rhat))), 4),
            "ess_min": round(float(np.min(np.asarray(wpost.ess))), 1),
        }
        if args.fit_geometry:
            samp = np.asarray(wpost.samples)
            q = lambda v: [round(float(x), 4) for x in
                           np.percentile(v, [16, 50, 84])]
            # samples are drawn around the CURRENT orbit (the fitted
            # ephemeris when --detrend ramp --fit-geometry reassigned
            # it); add the fit's offset back so this t0_offset_s shares
            # the YAML zero point with white_ramp_fit's
            white_post_report["geometry_percentiles_16_50_84"] = {
                "t0_offset_s": q(samp[:, 6] + t0_ref_shift_s),
                "sma_over_rs": q(samp[:, 7]),
                "inclination_deg": q(np.rad2deg(np.arccos(
                    np.clip(samp[:, 8], 0.0, 0.6)))),
            }
        print(f"white posterior: depth = "
              f"{white_post_report[dkey + '_median']:.6f} "
              f"+{white_post_report['depth_plus']:.6f} "
              f"-{white_post_report['depth_minus']:.6f} "
              f"(acc {white_post_report['acceptance']:.2f}; channel "
              f"posteriors sampled in one vmapped program)")

    mcmc_prefix = "fp" if args.mode == "eclipse" else "rp"
    if args.mode != "phase":
        phase_extra = None
    # Per-channel quality flag: a dead channel (no in-window flux,
    # curvature at the numerical floor) must be MARKED unusable, not
    # left for the consumer to infer from an absurd sigma.
    from wayne_tpu.reduction import constrained_mask

    if args.mode == "transit":
        constrained = constrained_mask(rp_hat, rp_sig)
    else:   # Fp/Fs contrasts: smaller scale, linear (unclipped) fits
        constrained = constrained_mask(rp_hat, rp_sig,
                                       sigma_floor=0.02, bounds=None)
    constrained = np.asarray(constrained)
    if not constrained.all():
        bad = np.flatnonzero(~constrained).tolist()
        print(f"warning: channel(s) {bad} are unconstrained (no "
              "in-window flux or sigma above the floor) — flagged "
              "constrained: false; consider --wl-range to clip the "
              "band edges")
    report = {
        "n_exposures": len(paths),
        "grism": cfg.grism,
        "mode": args.mode,
        "estimator": args.estimator,
        "extraction": args.extract,
        "windows": {"rows": list(yw), "cols": list(xw),
                    "background_rows": list(bg)},
        "detrend": detrend,
        "divide_white": detrend == "divide-white",
        "wavelength_zero_point": {
            "source": wl_source, "x_ref": round(float(xref_used), 3),
            "y_ref": round(float(yref_used), 3)},
        **({("white_phase_fit" if args.mode == "phase"
             else "white_recte_fit" if detrend == "recte"
             else "white_ramp_fit"): white_fit_report}
           if white_fit_report is not None else {}),
        "dq_repair": not args.no_dq,
        "nlincorr": nlin is not None,
        **({"scan_direction_offsets": scan_dir_offsets}
           if scan_dir_offsets is not None else {}),
        **({"sky_fit": sky_fit} if sky_fit is not None else {}),
        "aligned": bool(args.align),
        **({"x_shifts_px": [round(float(s), 4) for s in shifts]}
           if shifts is not None else {}),
        **({"white_posterior": white_post_report}
           if white_post_report is not None else {}),
        **({f"{sigma_key}_common": round(float(sigma_white_dw), 6)}
           if sigma_white_dw is not None else {}),
        "channels": [
            {"wl_lo_um": round(float(wl_edges[i]), 4),
             "wl_hi_um": round(float(wl_edges[i + 1]), 4),
             value_key: round(float(rp_hat[i]), 6),
             sigma_key: round(float(rp_sig[i]), 6),
             **({f"{sigma_key}_rel": round(float(rp_sig_rel[i]), 6)}
                if rp_sig_rel is not None else {}),
             "constrained": bool(constrained[i]),
             **(phase_extra[i] if phase_extra is not None else {}),
             **({f"{mcmc_prefix}_mcmc_median":
                     round(float(chan_post.rp_median[i]), 7),
                 f"{mcmc_prefix}_mcmc_plus":
                     round(float(chan_post.rp_plus[i]), 7),
                 f"{mcmc_prefix}_mcmc_minus":
                     round(float(chan_post.rp_minus[i]), 7),
                 f"{mcmc_prefix}_mcmc_rhat":
                     round(float(chan_post.rhat[i]), 4),
                 f"{mcmc_prefix}_mcmc_ess":
                     round(float(chan_post.ess[i]), 1)}
                if chan_post is not None else {})}
            for i in range(args.n_chan)],
        "white_lc": [round(float(v), 6) for v in white],
        **({"channel_lc": [[round(float(chan_j[i, j]), 6)
                            for j in range(args.n_chan)]
                           for i in range(len(mids))]}
           if args.save_lc else {}),
        "mid_times_s": [round(float(v), 2) for v in mids],
    }
    out = args.output or os.path.join(args.visit_dir, "reduced.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=2)
    if args.save_spectra:
        from wayne_tpu.io.fits import FitsHDU, write_fits

        wl_cols = np.asarray(x_to_wl(
            jnp.arange(spectra.shape[1], dtype=jnp.float32), tp))
        spath = os.path.join(args.visit_dir, "spectra.fits")
        write_fits(spath, [
            FitsHDU(header={"PRODUCT": "wayne_tpu extracted spectra",
                            "WLSRC": wl_source}),
            FitsHDU(name="SPECTRA", data=spectra.astype(np.float32),
                    header={"BUNIT": "ELECTRONS"}),
            FitsHDU(name="WAVELENGTH",
                    data=wl_cols.astype(np.float32),
                    header={"BUNIT": "MICRONS"}),
            FitsHDU(name="TIME",
                    data=np.asarray(mids, np.float64),
                    header={"BUNIT": "SECONDS"}),
        ])
        print(f"extracted spectra -> {spath}")
    rp = [c[value_key] for c in report["channels"]]
    label = "Rp/Rs" if args.mode == "transit" else "Fp/Fs"
    print(f"channel {label}: {min(rp):.6g}..{max(rp):.6g} -> {out}")
    if args.plot:
        from wayne_tpu.diagnostics import quicklook_reduction

        png = quicklook_reduction(report, out.rsplit(".", 1)[0] + ".png")
        print(f"quicklook -> {png}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
