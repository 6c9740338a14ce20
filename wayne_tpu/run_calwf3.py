"""calwf3-equivalent CLI: calibrate a visit's raw ima files to FLT.

Usage:
    python -m wayne_tpu.run_calwf3 -d visit_dir -p pars.yml [--cpu] [-o out]

For every ``*_ima.fits`` in the visit directory (the direct image
included — it calibrates like any multiaccum exposure) an ``*_flt.fits``
sibling is written: one SCI plane in e-/s with ERR, collapsed DQ and
per-pixel SAMP/TIME, after BLEVCORR / NLINCORR / DARKCORR / CRCORR in
calwf3's order (see wayne_tpu/calwf3.py). The parameter file supplies
the same calibration tables the simulation used — exactly how real
calwf3 consumes CRDS reference files.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="calibrate simulated raw ima products to flt")
    parser.add_argument("-d", "--visit-dir", required=True)
    parser.add_argument("-p", "--parameter-file", required=True)
    parser.add_argument("-o", "--outdir", default=None,
                        help="output directory (default: next to the "
                             "input files)")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from wayne_tpu.calibration import sequence_tables_scope
    from wayne_tpu.calwf3 import calibrate_ima, write_flt
    from wayne_tpu.config import load_yaml
    from wayne_tpu.models.grism import make_calibrated_grism

    cfg = load_yaml(args.parameter_file)
    with sequence_tables_scope(cfg.calibration.sequence_file):
        grism = make_calibrated_grism(cfg)
    paths = sorted(glob.glob(os.path.join(args.visit_dir, "*_ima.fits")))
    direct = sorted(glob.glob(os.path.join(args.visit_dir,
                                           "*_direct.fits")))
    if not paths:
        raise SystemExit(f"no *_ima.fits files in {args.visit_dir!r}")
    outdir = args.outdir or args.visit_dir
    os.makedirs(outdir, exist_ok=True)
    n = 0
    for p in paths:
        out = os.path.join(
            outdir, os.path.basename(p).replace("_ima.fits", "_flt.fits"))
        flt = calibrate_ima(p, grism.tables, cfg.noise)
        write_flt(out, flt)
        n += 1
        print(f"flt {n}/{len(paths)}: {os.path.basename(out)}",
              file=sys.stderr, flush=True)
    if direct:
        print(f"note: {len(direct)} direct image(s) skipped — imaging-"
              "filter exposures calibrate against imaging tables "
              "(Observation.simulate_direct_image keeps them raw)",
              file=sys.stderr)
    print(f"calwf3: {n} flt products -> {outdir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
