#!/usr/bin/env python
"""Recover a program's ephemeris drift from its reduced visits.

The reason multi-visit transit programs exist: each visit's fitted
mid-transit time, measured against the ASSUMED linear ephemeris (the
stale YAML t0 the reducer uses), exposes any drift in the true
ephemeris. This tool closes that loop on a `run_program` output:

  1. reduce every visit with the parametric ramp fit + free geometry
     (`run_reduce --detrend ramp --fit-geometry`), which reports the
     fitted `t0_offset_s` per visit;
  2. fit a line to t0_offset vs visit index: the slope estimates
     `program.t0_drift_s_per_visit`, the intercept any constant t0
     error;
  3. compare against `program_summary.json`'s per-visit true t0s;
  4. combine the per-visit channel depths into the PROGRAM-level
     transmission spectrum (inverse-variance weighted mean) with a
     per-channel repeatability chi2 — the visit-to-visit consistency
     statistic multi-visit programs publish.

Usage:
  python tools/program_ephemeris.py -d prog_out/ -p pars.yml [--cpu]
        [--n-chan 4]

Writes <program dir>/ephemeris.json. Library form:
``measure_program_ephemeris`` (used by tests/test_program.py's
closed-loop drift test).
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def measure_program_ephemeris(program_dir: str, parameter_file: str,
                              n_chan: int = 4,
                              cpu: bool = False) -> dict:
    """Reduce each visit_NN/ and fit the linear ephemeris residual."""
    import numpy as np

    from wayne_tpu.run_reduce import main as reduce_main

    summary = json.load(open(os.path.join(program_dir,
                                          "program_summary.json")))
    visits = summary["visits"]
    offsets = []
    chans, chan_sigs, chan_ok, wl_ranges = [], [], [], None
    for v in visits:
        vdir = os.path.join(program_dir, v["dir"])
        red_path = os.path.join(vdir, "reduced_ephemeris.json")
        argv = ["-d", vdir, "-p", parameter_file, "--n-chan",
                str(n_chan), "--detrend", "ramp", "--fit-geometry",
                "-o", red_path]
        if cpu:
            argv.append("--cpu")
        rc = reduce_main(argv)
        if rc != 0:
            raise RuntimeError(f"run_reduce failed for {vdir} (rc={rc})")
        red = json.load(open(red_path))
        geo = red["white_ramp_fit"]["fitted_geometry"]
        offsets.append(float(geo["t0_offset_s"]))
        chans.append([c["rp_over_rs"] for c in red["channels"]])
        chan_sigs.append([c["rp_sigma"] for c in red["channels"]])
        chan_ok.append([bool(c.get("constrained", True))
                        for c in red["channels"]])
        wl_ranges = [(c["wl_lo_um"], c["wl_hi_um"])
                     for c in red["channels"]]
    idx = np.arange(len(offsets), dtype=float)
    off = np.array(offsets)
    if len(off) > 1:
        slope, intercept = np.polyfit(idx, off, 1)
    else:
        slope, intercept = 0.0, float(off[0])
    injected = [(v["true_t0_mjd"] - summary["assumed_t0_mjd"]) * 86400.0
                for v in visits]
    # program-level combined spectrum: inverse-variance weighted mean
    # per channel across visits, with a repeatability chi2 per channel
    # (the visit-to-visit consistency statistic real multi-visit
    # programs publish — astrophysical variability or an unmodelled
    # per-visit systematic shows up here first)
    rp = np.asarray(chans, np.float64)            # (n_vis, n_chan)
    sg = np.maximum(np.asarray(chan_sigs, np.float64), 1e-12)
    w = 1.0 / sg**2
    rp_comb = (w * rp).sum(axis=0) / w.sum(axis=0)
    sig_comb = 1.0 / np.sqrt(w.sum(axis=0))
    n_vis = rp.shape[0]
    chi2_rep = (((rp - rp_comb[None, :]) / sg) ** 2).sum(axis=0)
    dof_rep = max(n_vis - 1, 1)
    out = {
        "per_visit_t0_offset_s": [round(v, 2) for v in offsets],
        "per_visit_injected_offset_s": [round(v, 2) for v in injected],
        "drift_s_per_visit_fitted": round(float(slope), 2),
        "drift_s_per_visit_injected": summary["t0_drift_s_per_visit"],
        "t0_intercept_s": round(float(intercept), 2),
        "combined_spectrum": [
            {"wl_lo_um": wl_ranges[j][0], "wl_hi_um": wl_ranges[j][1],
             "rp_over_rs": round(float(rp_comb[j]), 7),
             "rp_sigma": round(float(sig_comb[j]), 7),
             # a combined channel is only trustworthy if EVERY visit's
             # fit constrained it (per-visit reduced.json flag)
             "constrained": bool(np.all(np.asarray(chan_ok)[:, j])),
             "repeatability_chi2_per_dof": round(
                 float(chi2_rep[j]) / dof_rep, 3)}
            for j in range(rp.shape[1])],
    }
    with open(os.path.join(program_dir, "ephemeris.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    return out


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-d", "--program-dir", required=True)
    parser.add_argument("-p", "--parameter-file", required=True)
    parser.add_argument("--n-chan", type=int, default=4)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()
    out = measure_program_ephemeris(args.program_dir,
                                    args.parameter_file,
                                    n_chan=args.n_chan, cpu=args.cpu)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
