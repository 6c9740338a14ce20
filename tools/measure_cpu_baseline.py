#!/usr/bin/env python
"""Measure the single-core CPU oracle baseline -> BASELINE_CPU.json.

The reference (ucl-exoplanets/wayne) publishes no throughput numbers and
its code was unavailable in this environment (SURVEY.md Provenance), so
the baseline is our fp64 NumPy oracle, which implements the reference's
own per-exposure algorithm: a fine temporal-subsample loop of static erf
splats (scan moves <= max_step_px per step), full wavelength grid, exact
transit evaluation per step. This is the honest stand-in for "reference
wall-clock per exposure on one CPU core".

Usage: python tools/measure_cpu_baseline.py [--full]
  default: one NSAMP=15 512x512 G141 scan exposure at 512 lambda bins
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--step", type=float, default=0.1,
                        help="max scan motion per subsample (px)")
    args = parser.parse_args()

    from wayne_tpu.calibration import synthetic_tables
    from wayne_tpu.config import ExposureStatic
    from wayne_tpu.oracle.numpy_oracle import oracle_ideal_frame

    cfg = ExposureStatic(subarray=512, n_lambda=512, n_sub=8, nsamp=15,
                         samp_seq="SPARS10", scan=True)
    tables = synthetic_tables("G141", subarray=512, n_lambda=512,
                              samp_seq="SPARS10", nsamp=15)
    wl = np.asarray(tables.wl_centers, np.float64)
    stellar = 3.13e-10 * (wl / 1.25) ** -2
    rp = np.full(wl.shape, 0.1595)
    ld = np.array([0.65, -0.25, 0.45, -0.2])
    orbit = dict(period_s=0.813475 * 86400.0, t0_s=7200.0, sma_rs=4.855,
                 inc_rad=np.deg2rad(82.1), ecc=0.0, omega_rad=np.pi / 2)

    print(f"measuring oracle exposure (step={args.step}px)...",
          file=sys.stderr, flush=True)
    t0 = time.time()
    frame = oracle_ideal_frame(
        tables, cfg, x_ref=180.0, y_ref=100.0, scan_speed=1.0,
        exp_start_s=0.0, stellar_flux=stellar, rp_over_rs=rp, ld=ld,
        orbit=orbit, max_step_px=args.step)
    dt = time.time() - t0
    out = {
        "description": "fp64 NumPy oracle, reference-style fine-subsample "
                       "algorithm; G141 scan exposure NSAMP=15 512^2, "
                       "512 lambda bins, noise-free signal path only "
                       "(noise chain would add cost)",
        "seconds_per_exposure": round(dt, 3),
        "exposures_per_sec": round(1.0 / dt, 6),
        "max_step_px": args.step,
        "frame_total_e": float(frame.sum()),
        "host": "single CPU core",
    }
    path = os.path.join(REPO, "BASELINE_CPU.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
