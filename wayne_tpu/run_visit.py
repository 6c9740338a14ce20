"""Command-line entry point (reference: wayne/run_visit.py, console entry
``wayne -p parameter_file.yml``).

Usage:
    python -m wayne_tpu.run_visit -p pars.yml [-o outdir] [--chunk N]
    python -m wayne_tpu.run_visit --example > example_pars.yml
"""

from __future__ import annotations

import argparse
import logging
import sys

EXAMPLE_YAML = """\
# wayne_tpu parameter file (reference-compatible keys accepted)
observation:
  grism: G141
  subarray: 512
  NSAMP: 15
  SAMPSEQ: SPARS10
  scan: true
  scan_speed: 1.0          # pixels / s
  x_ref: 180.0
  y_ref: 100.0
  num_orbits: 4
  start_mjd: 55999.86
  seed: 0
  sky_level: 1.2           # e-/s/px
  outdir: wayne_out
target:
  name: WASP-43
  star_temperature: 4520.0
  mag_J: 9.995
planet:
  planet_name: WASP-43 b
  period: 0.813475         # days
  t0: 56000.0              # MJD of mid-transit
  sma_over_rs: 4.855
  inclination: 82.1
  rp_over_rs: 0.1595
  ld_coeffs: [0.65, -0.25, 0.45, -0.2]
  # eclipse_depth: 5.0e-4  # dayside Fp/Fs -> secondary-eclipse visits
  # phase_amplitude: 0.9   # day-night thermal phase-curve contrast
noise:
  read_noise: true
  dark: true
  sky: true
  flat: true
  non_linearity: true
  cosmic_rays: true
  ssv: true
  visit_trend: true
  pointing_drift: true
# calibration:                 # optional real STScI products (else synthetic)
#   axe_conf: WFC3.IR.G141.V2.5.conf
#   sensitivity_file: G141.sens.txt
#   flat_file: G141.flat.fits
#   sky_file: G141.sky.fits
#   nonlin_file: nlin.fits
#   sequence_file: sequences.json
"""


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="wayne_tpu",
        description="Simulate an HST WFC3 IR grism transit visit on TPU.")
    parser.add_argument("-p", "--parameter-file", help="YAML parameter file")
    parser.add_argument("-o", "--outdir", help="override output directory")
    parser.add_argument("--chunk", type=int, default=8,
                        help="exposures computed concurrently on device")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend")
    parser.add_argument("--no-resume", action="store_true",
                        help="rewrite exposures even if files exist")
    parser.add_argument("--quicklook", action="store_true",
                        help="also write diagnostic PNGs (needs matplotlib)")
    parser.add_argument("--debug", action="store_true",
                        help="run NaN/saturation guards + visit_summary.json")
    parser.add_argument("--all-devices", action="store_true",
                        help="shard the visit's exposures over every "
                             "visible device (chunk exposures per device "
                             "per step; files identical to single-device)")
    parser.add_argument("--example", action="store_true",
                        help="print an example parameter file and exit")
    args = parser.parse_args(argv)

    if args.example:
        print(EXAMPLE_YAML, end="")
        return 0
    if not args.parameter_file:
        parser.error("-p parameter_file.yml is required (or --example)")

    logging.basicConfig(level=logging.INFO, format="%(message)s")

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from wayne_tpu.config import load_yaml
    from wayne_tpu.observation import Observation

    cfg = load_yaml(args.parameter_file)
    if args.outdir:
        cfg.outdir = args.outdir
    obs = Observation(cfg)
    print(f"{cfg.grism} {'scan' if cfg.scan else 'staring'} visit: "
          f"{obs.plan.n_exposures} exposures x NSAMP={cfg.nsamp} "
          f"({obs.detector_exptime:.1f}s each) over {cfg.n_orbits} orbits")
    mesh = None
    if args.all_devices:
        import jax

        from wayne_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(jax.devices())
        print(f"sharding exposures over {mesh.devices.size} devices")
    paths = obs.generate(cfg.outdir, chunk=args.chunk, progress=print,
                         resume=not args.no_resume, debug=args.debug,
                         mesh=mesh)
    print(f"wrote {len(paths)} exposures to {cfg.outdir}")
    if args.quicklook:
        # Quicklook from the files just written — re-simulating the
        # visit on device would double the wall-clock (and recompile on
        # this backend) for frames already on disk.
        from types import SimpleNamespace

        import numpy as np

        from wayne_tpu.diagnostics import visit_quicklooks
        from wayne_tpu.io.ima import read_ima

        stacks = []
        for i in range(obs.plan.n_exposures):
            hdr, reads, times = read_ima(obs._exp_path(cfg.outdir, i))
            if str(hdr.get("BUNIT", "COUNTS")).upper().startswith(
                    "ELECTRONS"):   # rate product -> accumulated DN
                reads = (reads * np.asarray(times)[:, None, None]
                         / float(obs.tables.gain))
            stacks.append(reads)
        res = SimpleNamespace(reads_dn=np.stack(stacks))
        pngs = visit_quicklooks(obs, res, cfg.outdir)
        print(f"quicklooks: {', '.join(pngs)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
