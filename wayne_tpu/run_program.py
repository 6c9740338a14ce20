"""Multi-visit program runner (see :mod:`wayne_tpu.program`).

Usage:
    python -m wayne_tpu.run_program -p pars.yml -o prog_out/

The YAML is an ordinary visit parameter file plus a ``program:`` block:

    program:
      num_visits: 3
      visit_spacing_days: 0     # 0 -> whole periods (next transits)
      carry_persistence: true   # needs persistence: enabled
      t0_drift_s_per_visit: 0.0

Each visit lands in ``visit_00/ visit_01/ ...`` as standard ima
products — reduce them with run_reduce visit by visit; the carried
fluence maps and a program_summary.json record the cross-visit state.
"""

from __future__ import annotations

import argparse
import logging
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="wayne_tpu.run_program",
        description="Simulate a multi-visit HST WFC3 observing program.")
    parser.add_argument("-p", "--parameter-file", required=True)
    parser.add_argument("-o", "--outdir", help="program output directory "
                                               "(default: YAML outdir)")
    parser.add_argument("--chunk", type=int, default=8)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument("--debug", action="store_true")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from wayne_tpu.config import load_yaml
    from wayne_tpu.program import Program

    cfg = load_yaml(args.parameter_file)
    outdir = args.outdir or cfg.outdir
    prog = Program(cfg)
    print(f"{cfg.program.num_visits}-visit program "
          f"(MJD {prog.starts[0]:.3f} .. {prog.starts[-1]:.3f}; "
          f"persistence carry: {'on' if prog.carry else 'off'}; "
          f"t0 drift {cfg.program.t0_drift_s_per_visit:+.1f} s/visit)")
    all_paths = prog.generate(outdir, chunk=args.chunk, progress=print,
                              resume=not args.no_resume, debug=args.debug)
    total = sum(len(p) for p in all_paths)
    print(f"wrote {total} exposures over {len(all_paths)} visits "
          f"to {outdir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
