"""Forward-model retrieval from a visit's ima FITS files.

The file-level CLI for wayne_tpu/retrieval.py: instead of the classic
extract -> background-subtract -> detrend -> analytic-fit chain
(run_reduce), this fits the transmission spectrum DIRECTLY to raw
extracted column sums by Levenberg-Marquardt with exact jacfwd
Jacobians THROUGH the full exposure engine. The visit's own parameter
file rebuilds the observing state (plan, drift, trends, calibration)
exactly as the simulator ran it; the stochastic noise sources are
switched off in the model twin (retrieval.deterministic_cfg), so flat,
sky, dark, non-linearity and beam contamination are *modeled*, never
subtracted.

Usage:
    python -m wayne_tpu.run_retrieve -d out_visit/ -p pars.yml \
        [--n-chan 8] [--estimator cds|ramp] [--rows Y0:Y1]
        [--cols X0:X1] [--fit-ramp] [--n-lm 10] [--chunk 2]
        [-o retrieved.json] [--cpu]

Outputs a JSON report: per-channel wavelength ranges, retrieved Rp/Rs
with curvature errors, chi^2, and (with --fit-ramp) the fitted
[visit slope, hook amplitude] nuisances.
"""

from __future__ import annotations

import argparse
import glob
import json
import logging
import os
import sys

import numpy as np


from wayne_tpu.utils.cli import parse_range as _range


def raw_column_sums(paths: list[str], estimator: str,
                    y_window: tuple[int, int] | None):
    """RAW column sums (n_exp, S) in DN + EXPSTART MJDs — no gain, no
    background subtraction, no DQ repair: the forward model predicts
    the raw expectation (stochastic CR outliers average into the noise;
    run_reduce is the DQ-consuming path)."""
    from wayne_tpu.io.ima import read_ima
    from wayne_tpu.reduction import ramp_slope_frame

    import jax.numpy as jnp

    spectra, starts = [], []
    for p in paths:
        hdr, reads, times = read_ima(p)
        if str(hdr.get("BUNIT", "COUNTS")).upper().startswith("ELECTRONS"):
            raise SystemExit(
                "forward-model retrieval needs raw-DN (counts) products — "
                "this visit was written as count-rate imas; regenerate "
                "with output_units: counts (or use run_reduce)")
        if estimator == "ramp":
            net = np.asarray(ramp_slope_frame(
                jnp.asarray(reads), jnp.asarray(times, jnp.float32)))
        else:
            net = (reads[-1] - reads[0]).astype(np.float64)
        if y_window is not None:
            net = net[y_window[0]: y_window[1]]
        spectra.append(net.sum(axis=0))
        starts.append(float(hdr["EXPSTART"]))
    return np.stack(spectra), np.asarray(starts)


def _main_program(args, cfg) -> int:
    """--program: joint retrieval across a run_program output."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from wayne_tpu.calibration import sequence_tables_scope
    from wayne_tpu.observation import Observation
    from wayne_tpu.ops.dispersion import trace_params, wl_to_x, x_to_wl
    from wayne_tpu.program import visit_config, visit_start_mjds
    from wayne_tpu.reduction import _channel_edges
    from wayne_tpu.retrieval import retrieve_transmission_joint

    if args.mcmc and args.mode == "eclipse":
        # reject up front: discovering this AFTER the (expensive) joint
        # LM fit would throw the completed retrieval away
        raise SystemExit("--mcmc on the program path is wired for "
                         "transit mode")
    summary_path = os.path.join(args.visit_dir, "program_summary.json")
    if not os.path.exists(summary_path):
        raise SystemExit(f"{summary_path} not found — is -d a "
                         "run_program output directory?")
    summary = json.load(open(summary_path))
    # the MODEL must carry the ASSUMED linear ephemeris (drift zeroed):
    # the fitted per-visit t0 offsets ARE the drift measurement
    cfg_assumed = dataclasses.replace(
        cfg, program=dataclasses.replace(cfg.program,
                                         t0_drift_s_per_visit=0.0))
    starts = visit_start_mjds(cfg_assumed)
    y_window = _range(args.rows, "--rows") if args.rows else None

    spectra_list, scenes_list = [], []
    tables = static = None
    for i, entry in enumerate(summary["visits"]):
        vdir = os.path.join(args.visit_dir, entry["dir"])
        paths = sorted(glob.glob(os.path.join(vdir, "*_ima.fits")))
        if not paths:
            raise SystemExit(f"no *_ima.fits files in {vdir!r}")
        vcfg = visit_config(cfg_assumed, i, starts)
        if (i > 0 and cfg.persistence.enabled
                and cfg.program.carry_persistence):
            # the data opened with visit i-1's afterglow (run_program
            # threaded the carried fluence into the simulation) — the
            # model must carry the SAME prior stimulus or the
            # unmodelled first-orbit ramp biases rp and dt0
            from wayne_tpu.program import SECONDS_PER_DAY, Program

            prev = os.path.join(args.visit_dir,
                                summary["visits"][i - 1]["dir"])
            carry_map = os.path.join(prev, Program.CARRY_FILE)
            meta_path = os.path.join(prev, Program.CARRY_META)
            if not (os.path.exists(carry_map)
                    and os.path.exists(meta_path)):
                raise SystemExit(
                    f"{prev} lacks {Program.CARRY_FILE}: this program "
                    "was generated with carry_persistence but the "
                    "carried-fluence products are missing — re-run "
                    "run_program (resume recomputes them)")
            meta = json.load(open(meta_path))
            vcfg = dataclasses.replace(
                vcfg, persistence=dataclasses.replace(
                    vcfg.persistence, prior_fluence_file=carry_map,
                    prior_end_s=float(
                        (meta["end_mjd"] - vcfg.start_mjd)
                        * SECONDS_PER_DAY)))
        with sequence_tables_scope(vcfg.calibration.sequence_file):
            obs = Observation(vcfg)
            obs._ensure_persistence()
            obs._ensure_recte()
        spectra, starts_mjd = raw_column_sums(paths, args.estimator,
                                              y_window)
        plan_mjd = np.asarray(obs.plan.exp_start_mjd(), np.float64)
        idx = np.argmin(np.abs(plan_mjd[None, :] - starts_mjd[:, None]),
                        axis=1)
        dt_s = np.abs(plan_mjd[idx] - starts_mjd) * 86400.0
        if len(set(idx.tolist())) != idx.size or dt_s.max() > 1.0:
            raise SystemExit(
                f"{entry['dir']}: ima EXPSTARTs do not match the visit "
                f"plan (worst offset {dt_s.max():.1f} s) — wrong YAML?")
        scenes_list.append(jax.tree_util.tree_map(
            lambda x: x[jnp.asarray(idx)], obs.scenes))
        spectra_list.append(jnp.asarray(spectra, jnp.float32))
        tables, static = obs.tables, obs.static

    S = int(spectra_list[0].shape[1])
    if args.cols:
        x_window = _range(args.cols, "--cols")
    else:
        tp0 = trace_params(tables, scenes_list[0].x_ref[0],
                           scenes_list[0].y_ref[0])
        xs = np.asarray(wl_to_x(tables.wl_edges, tp0))
        x_window = (int(max(np.floor(xs.min()) - 3, 0)),
                    int(min(np.ceil(xs.max()) + 4, S)))
    n_vis = len(spectra_list)
    eclipse = args.mode == "eclipse"
    label = "Fp/Fs" if eclipse else "Rp/Rs"
    print(f"joint retrieval over {n_vis} visits "
          f"({sum(int(s.shape[0]) for s in spectra_list)} exposures), "
          f"channels over cols {x_window}; shared {label} + per-visit "
          f"t0{' + ramp' if args.fit_ramp else ''}")

    res = retrieve_transmission_joint(
        spectra_list, scenes_list, tables, static,
        x_window=x_window, n_chan=args.n_chan,
        rp_init=(1e-3 if eclipse
                 else float(cfg.planet.rp_over_rs or 0.1)),
        estimator=args.estimator, y_window=y_window,
        fit_t0=True, fit_ramp=args.fit_ramp, mode=args.mode,
        n_lm=args.n_lm, chunk=args.chunk)

    tp0 = trace_params(tables, scenes_list[0].x_ref[0],
                       scenes_list[0].y_ref[0])
    edges = np.asarray(_channel_edges(x_window, args.n_chan))
    wl_edges = np.asarray(x_to_wl(jnp.asarray(edges, jnp.float32), tp0))
    drift = None
    if n_vis > 1:
        drift = float(np.polyfit(np.arange(n_vis),
                                 res.t0_offsets_s, 1)[0])

    prog_post = None
    if args.mcmc:
        # Joint Goodman-Weare posterior over (shared spectrum,
        # per-visit t0, per-visit-channel baselines, noise scale) on
        # the binned channel curves, seeded from the LM solution — the
        # TTV result ships with credible intervals, not just an LM
        # sigma (mcmc.sample_program_posterior).
        import dataclasses as _dc

        from wayne_tpu.mcmc import sample_program_posterior
        from wayne_tpu.ops.kepler import projected_separation
        from wayne_tpu.ops.transit import transit_depth_curve
        from wayne_tpu.reduction import out_of_transit_mask

        n_exps = {int(s.shape[0]) for s in spectra_list}
        if len(n_exps) != 1:
            raise SystemExit("program posterior needs equal-length "
                             f"visits (got {sorted(n_exps)})")
        exptime = float(tables.read_times[-1])
        orbit0 = jax.tree_util.tree_map(lambda x: x[0],
                                        scenes_list[0].orbit)
        # TEMPLATE-CLEANED curves: divide each visit by the forward
        # model AT THE LM SOLUTION (instrument structure — persistence
        # afterglow, trends, cross-talk — that the analytic model
        # cannot express) and re-multiply by the analytic transit at
        # the same solution, so the sampler explores the (rp, dt0)
        # GEOMETRY around the fit with everything else held at LM
        # accuracy. Without this the chain walks off through unmodelled
        # afterglow ramps (measured: t0 medians at the prior edge on a
        # carried-persistence program).
        lcs, mids_all, sigs, n_oots = [], [], [], []
        ld0 = scenes_list[0].ld[0]
        for v, sc in enumerate(scenes_list):
            mid = sc.exp_start_s + 0.5 * exptime
            orb_v = _dc.replace(
                orbit0, t0_s=orbit0.t0_s + float(res.t0_offsets_s[v]))
            z_v, infr_v = projected_separation(mid, orb_v)
            ana = np.stack([
                np.asarray(1.0 - (1.0 - transit_depth_curve(
                    z_v, jnp.float32(res.rp[c]), ld0, 32)) * infr_v)
                for c in range(args.n_chan)], axis=1)   # (n_exp, K)
            dn = np.asarray(res.data_chan[v])
            mdl = np.asarray(res.model_chan[v])
            lcs.append(dn / np.maximum(mdl, 1e-6) * ana)
            sigs.append(np.asarray(res.sigma_chan[v]))
            mids_all.append(np.asarray(mid))
            oot_np = np.asarray(
                out_of_transit_mask(mid, orbit0)) > 0.5
            n_oots.append(float(oot_np.sum()))
        n_burn = max(0, min(max(args.mcmc // 3, 300),
                            args.mcmc // 2, args.mcmc - 1))
        post = sample_program_posterior(
            jnp.asarray(np.stack(lcs), jnp.float32),
            jnp.asarray(np.stack(mids_all), jnp.float32),
            orbit0, scenes_list[0].ld[0],
            jnp.asarray(res.rp, jnp.float32),
            jnp.asarray(res.t0_offsets_s, jnp.float32),
            jnp.asarray(np.stack(sigs), jnp.float32),
            jnp.asarray(n_oots, jnp.float32),
            jax.random.PRNGKey(20250820), n_steps=args.mcmc,
            n_burn=n_burn)
        prog_post = {
            "n_steps": args.mcmc, "n_burn": n_burn,
            "acceptance": round(float(post.acceptance), 3),
            "rhat_max": round(float(np.max(np.asarray(post.rhat))), 4),
            "ess_min": round(float(np.min(np.asarray(post.ess))), 1),
            "t0_offsets_percentiles_16_50_84_s": [
                [round(float(m - lo), 2), round(float(m), 2),
                 round(float(m + hi), 2)]
                for m, lo, hi in zip(post.t0_median_s, post.t0_minus_s,
                                     post.t0_plus_s)],
            "rp_percentiles_16_50_84": [
                [round(float(m - lo), 6), round(float(m), 6),
                 round(float(m + hi), 6)]
                for m, lo, hi in zip(post.rp_median, post.rp_minus,
                                     post.rp_plus)],
        }
        print(f"program posterior: t0 = "
              f"{prog_post['t0_offsets_percentiles_16_50_84_s']} s "
              f"(acc {prog_post['acceptance']:.2f}, R-hat "
              f"{prog_post['rhat_max']:.3f})")
    report = {
        "method": "joint_forward_model_retrieval",
        "mode": args.mode,
        "n_visits": n_vis,
        "chi2": round(res.chi2, 3),
        "n_points": res.n_points,
        "lm_iterations": res.n_iter,
        "t0_offsets_s": [round(float(v), 2) for v in res.t0_offsets_s],
        "t0_offsets_sigma_s": [round(float(v), 2)
                               for v in res.t0_offsets_sigma_s],
        **({"drift_s_per_visit_fitted": round(drift, 2)}
           if drift is not None else {}),
        **({"program_posterior": prog_post}
           if prog_post is not None else {}),
        **({"visit_trend_fits": [
            {"slope_per_day": round(float(r0) * 86400.0, 6),
             "hook_amp": round(float(r1), 6)}
            for r0, r1 in res.ramp]} if res.ramp is not None else {}),
        "channels": [
            {"wl_lo_um": round(float(wl_edges[i]), 4),
             "wl_hi_um": round(float(wl_edges[i + 1]), 4),
             ("fp_over_fs" if eclipse else "rp_over_rs"):
                 round(float(res.rp[i]), 7),
             ("fp_sigma" if eclipse else "rp_sigma"):
                 round(float(res.rp_sigma[i]), 7),
             "constrained": bool(res.constrained[i])}
            for i in range(args.n_chan)],
    }
    out = args.output or os.path.join(args.visit_dir,
                                      "retrieved_joint.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=2)
    print(f"joint {label}: {res.rp.min():.6g}..{res.rp.max():.6g}; "
          f"t0 offsets {report['t0_offsets_s']} s"
          + (f" (drift {report['drift_s_per_visit_fitted']:+.1f} "
             "s/visit)" if drift is not None else "")
          + f" -> {out}")
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="wayne_tpu.run_retrieve",
        description="Fit a visit's transmission spectrum through the "
                    "full differentiable forward model.")
    parser.add_argument("-d", "--visit-dir", required=True)
    parser.add_argument("-p", "--parameter-file", required=True,
                        help="the visit's YAML (rebuilds the observing "
                             "state the model twin simulates)")
    parser.add_argument("-o", "--output", default=None,
                        help="JSON report (default <dir>/retrieved.json)")
    parser.add_argument("--n-chan", type=int, default=8)
    parser.add_argument("--mode", choices=("transit", "eclipse"),
                        default="transit",
                        help="transit: retrieve per-channel Rp/Rs; "
                             "eclipse: per-channel Fp/Fs dayside "
                             "emission (secondary-eclipse visits)")
    parser.add_argument("--estimator", choices=("cds", "ramp"),
                        default="cds")
    parser.add_argument("--rows", default=None, metavar="Y0:Y1",
                        help="restrict the column sums (data AND model) "
                             "to these rows — less accumulated read "
                             "noise than the full-frame default")
    parser.add_argument("--cols", default=None, metavar="X0:X1",
                        help="dispersion-column channel window (default: "
                             "the illuminated columns from the trace)")
    parser.add_argument("--fit-ramp", action="store_true",
                        help="jointly fit [visit slope, hook amplitude] "
                             "through the model's visit-trend physics")
    parser.add_argument("--fit-scan-offset", action="store_true",
                        help="jointly fit the reverse-scan flux offset "
                             "(upstream/downstream effect) as one "
                             "achromatic nuisance; needs a forward/"
                             "reverse alternating visit")
    parser.add_argument("--fit-spots", action="store_true",
                        help="jointly fit one spot-deficit scale "
                             "(contrast -> 1 - s*(1 - contrast0)) "
                             "through the simulator's starspot physics; "
                             "needs a spots: block in the YAML")
    parser.add_argument("--program", action="store_true",
                        help="-d is a run_program output directory "
                             "(visit_00/ ... + program_summary.json): "
                             "fit ONE shared transmission spectrum "
                             "jointly across all visits, with a free "
                             "per-visit mid-transit offset against the "
                             "ASSUMED ephemeris (the transit-timing "
                             "measurement) and optional per-visit "
                             "--fit-ramp nuisances; writes "
                             "<dir>/retrieved_joint.json")
    parser.add_argument("--mcmc", type=int, default=0, nargs="?",
                        const=4000, metavar="N",
                        help="--program path: joint Goodman-Weare "
                             "posterior over (shared spectrum, "
                             "per-visit t0, baselines, noise scale) "
                             "seeded from the LM fit; N ensemble "
                             "steps (bare flag: 4000 — the joint "
                             "chain needs length, ndim ~ K+V+V*K)")
    parser.add_argument("--n-lm", type=int, default=10)
    parser.add_argument("--chunk", type=int, default=2,
                        help="exposures per forward-pass chunk (jacfwd "
                             "multiplies the working set by n_params; "
                             "keep small on big subarrays)")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from wayne_tpu.calibration import sequence_tables_scope
    from wayne_tpu.config import load_yaml
    from wayne_tpu.observation import Observation
    from wayne_tpu.ops.dispersion import trace_params, wl_to_x, x_to_wl
    from wayne_tpu.reduction import _channel_edges
    from wayne_tpu.retrieval import retrieve_transmission

    cfg = load_yaml(args.parameter_file)
    if args.program:
        return _main_program(args, cfg)
    paths = sorted(glob.glob(os.path.join(args.visit_dir, "*_ima.fits")))
    if not paths:
        raise SystemExit(f"no *_ima.fits files in {args.visit_dir!r}")

    with sequence_tables_scope(cfg.calibration.sequence_file):
        obs = Observation(cfg)
        # charge-memory physics the data carried must be in the model too
        obs._ensure_persistence()
        obs._ensure_recte()
    scenes, tables, static = obs.scenes, obs.tables, obs.static

    y_window = _range(args.rows, "--rows") if args.rows else None
    spectra, starts_mjd = raw_column_sums(paths, args.estimator, y_window)
    S = spectra.shape[1]
    if y_window is not None and y_window[1] > int(tables.sky_frame.shape[0]):
        raise SystemExit(f"--rows {args.rows} outside the {S}^2 frames")

    # Match files to planned exposures by EXPSTART (a resumed/partial
    # directory may not hold the full plan). Same mapping generate()
    # used to write the headers (observation.py: plan.exp_start_mjd()).
    plan_mjd = np.asarray(obs.plan.exp_start_mjd(), np.float64)
    idx = np.argmin(np.abs(plan_mjd[None, :] - starts_mjd[:, None]), axis=1)
    dt_s = np.abs(plan_mjd[idx] - starts_mjd) * 86400.0
    if len(set(idx.tolist())) != idx.size or dt_s.max() > 1.0:
        raise SystemExit(
            "ima EXPSTARTs do not match the parameter file's visit plan "
            f"(worst offset {dt_s.max():.1f} s) — wrong YAML for this "
            "directory?")
    if idx.size != np.asarray(scenes.exp_start_s).size:
        print(f"partial visit: {idx.size} of "
              f"{np.asarray(scenes.exp_start_s).size} planned exposures "
              "on disk — retrieving from those")
    import jax

    scenes = jax.tree_util.tree_map(lambda x: x[jnp.asarray(idx)], scenes)

    # Channel window: explicit --cols, else the illuminated columns
    # from the exposure-0 trace (pad for PSF tails).
    if args.cols:
        x_window = _range(args.cols, "--cols")
        if x_window[1] > S:
            raise SystemExit(f"--cols {args.cols} outside the {S}-px frame")
    else:
        tp0 = trace_params(tables, scenes.x_ref[0], scenes.y_ref[0])
        xs = np.asarray(wl_to_x(tables.wl_edges, tp0))
        x_window = (int(max(np.floor(xs.min()) - 3, 0)),
                    int(min(np.ceil(xs.max()) + 4, S)))
    print(f"retrieving {idx.size} exposures, channels over cols "
          f"{x_window}, rows {y_window or ('all',)}; estimator "
          f"{args.estimator}; {args.n_chan} channels")

    if args.mode == "eclipse":
        d0 = float(cfg.planet.eclipse_depth or 1e-3)
    else:
        d0 = float(cfg.planet.rp_over_rs or 0.1)
    res = retrieve_transmission(
        jnp.asarray(spectra, jnp.float32), scenes, tables, static,
        x_window=x_window, n_chan=args.n_chan, rp_init=d0,
        estimator=args.estimator, y_window=y_window, mode=args.mode,
        fit_ramp=args.fit_ramp, fit_scan_offset=args.fit_scan_offset,
        fit_spots=args.fit_spots,
        n_lm=args.n_lm, chunk=args.chunk)

    tp0 = trace_params(tables, scenes.x_ref[0], scenes.y_ref[0])
    edges = np.asarray(_channel_edges(x_window, args.n_chan))
    wl_edges = np.asarray(x_to_wl(jnp.asarray(edges, jnp.float32), tp0))
    dof = max(res.n_points - res.rp.size
              - (2 if args.fit_ramp else 0)
              - (1 if args.fit_scan_offset else 0)
              - (1 if args.fit_spots else 0), 1)
    dkey = "fp_over_fs" if args.mode == "eclipse" else "rp_over_rs"
    skey = "fp_sigma" if args.mode == "eclipse" else "rp_sigma"
    report = {
        "method": "forward_model_retrieval",
        "n_exposures": int(idx.size),
        "grism": cfg.grism,
        "mode": args.mode,
        "estimator": args.estimator,
        "windows": {"rows": (list(y_window) if y_window else None),
                    "cols": list(x_window)},
        "chi2": round(res.chi2, 3),
        "chi2_per_dof": round(res.chi2 / dof, 4),
        "lm_iterations": res.n_iter,
        **({"visit_trend_fit": {
            "slope_per_day": round(float(res.ramp[0]) * 86400.0, 6),
            "slope_sigma_per_day": round(float(res.ramp_sigma[0])
                                         * 86400.0, 6),
            "hook_amp": round(float(res.ramp[1]), 6),
            "hook_amp_sigma": round(float(res.ramp_sigma[1]), 6)}}
           if res.ramp is not None else {}),
        **({"scan_offset_fit": {
            "reverse_flux_offset": round(res.scan_offset, 6),
            "reverse_flux_offset_sigma": round(res.scan_offset_sigma,
                                               6)}}
           if res.scan_offset is not None else {}),
        **({"spot_fit": {
            "spot_deficit_scale": round(res.spot_scale, 4),
            "spot_deficit_scale_sigma": round(res.spot_scale_sigma, 4)}}
           if res.spot_scale is not None else {}),
        "channels": [
            {"wl_lo_um": round(float(wl_edges[i]), 4),
             "wl_hi_um": round(float(wl_edges[i + 1]), 4),
             dkey: round(float(res.rp[i]), 7),
             skey: round(float(res.rp_sigma[i]), 7),
             "constrained": bool(res.constrained[i])}
            for i in range(args.n_chan)],
    }
    out = args.output or os.path.join(args.visit_dir, "retrieved.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=2)
    label = "Fp/Fs" if args.mode == "eclipse" else "Rp/Rs"
    print(f"retrieved {label}: {res.rp.min():.6g}..{res.rp.max():.6g} "
          f"(chi2/dof {report['chi2_per_dof']:.3f}, {res.n_iter} LM "
          f"iterations) -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
