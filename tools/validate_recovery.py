#!/usr/bin/env python
"""Ensemble-scale science validation -> VALIDATION.json.

Simulates N independent noisy realisations of a WASP-43b-like G141 scan
transit visit, reduces EVERY realisation on-device (extraction, channel
light curves, autodiff depth fits), and tests per channel:

  1. noise adds no bias: |mean(rp_hat) - rp_hat(noise-free)| < 3 SEM.
     The noise-free visit is reduced by the SAME pipeline, so the simple
     reduction's own smoothing/time-integration systematics cancel;
  2. the noise-free recovery itself sits within a documented systematic
     envelope of the injected channel depths (box extraction + mid-time
     model evaluation smooth the spectrum at the ~1e-3 level).

This is the statistical form of the BASELINE requirement ("agreement
with the reference within noise") executed end-to-end through the full
instrument model + a reduction, at ensemble scale.

A second ensemble then turns the time-domain systematics ON (sinusoidal
+ random-walk SSV, orbit hook, visit slope) and reduces with the
standard WFC3 divide-white analysis (common_mode_correct): recovered
channel depths must stay noise-unbiased and the divide-white residual
below the documented envelope — i.e. a realistic pipeline recovers the
injected spectrum from fully-corrupted frames. The SAME frames are
also reduced with the parametric alternative (fit_white_ramp +
ramp_detrend — the Iraclis-style joint transit x ramp white fit),
which must additionally recover the ABSOLUTE white-light depth.

A further ensemble swaps the parametric hook for the PHYSICAL RECTE
charge-trap ramp (ops/recte.py trap maps attached to the Scenes) and
reduces with the same joint ramp fit — the physically-generated
systematic must detrend out just like the parametric one.

Every depth-fitting ensemble additionally gates ERROR-BAR CALIBRATION:
the pipeline's reported per-channel sigma against the realised ensemble
scatter. Complete-model paths (main, eclipse, phase curve) gate the
ratio two-sided into [0.7, 1.5] plus a 68% empirical-coverage
cross-check; detrended paths whose sigma legitimately includes
unmodelled-systematic residual power (divide-white under SSV+drift,
parametric/RECTE ramp fits, staring, scan-direction) gate
OVERCONFIDENCE only (ratio <= 1.5) — conservative is correct there.
This is the uncertainty half of "recover within error bars": bias
gates alone pass with arbitrarily wrong sigmas. fit_depths carries the
OOT-normalisation variance term and the Pont+2006 red-noise beta
scaling this validated (reduction.fit_depths ``baseline_var`` /
``red_noise``); tests/test_sigma_calibration.py holds the estimators
at unit scale.

Usage: python tools/validate_recovery.py [--n-mc 32] [--cpu]
       [--sections with_systematics,retrieval_mode]

``--sections`` (default all) runs a subset and MERGES its results into
the existing VALIDATION.json — iteration on one ensemble must not pay
every other ensemble's compile/run time on the flaky remote TPU
compiler. The exit gate covers only the sections run.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ALL_SECTIONS = (
    "main", "with_systematics", "with_pointing_drift", "with_recte",
    "eclipse_mode", "staring_mode", "scan_direction", "phase_curve_mode",
    "g102_mode", "retrieval_mode", "program_mode", "spots_mode")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-mc", type=int, default=32)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--sections", default="all",
                        help="comma list of sections to (re)run; "
                             f"all = {','.join(ALL_SECTIONS)}")
    args = parser.parse_args()
    if args.sections == "all":
        selected = set(ALL_SECTIONS)
    else:
        selected = set(s.strip() for s in args.sections.split(","))
        unknown = selected - set(ALL_SECTIONS)
        if unknown:
            raise SystemExit(f"unknown sections: {sorted(unknown)}")

    def want(name: str) -> bool:
        return name in selected

    out: dict = {}
    gates: dict[str, bool] = {}

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    from wayne_tpu.calibration import synthetic_tables
    from wayne_tpu.config import ExposureStatic, NoiseFlags
    from wayne_tpu.ops.exposure import simulate_exposure
    from wayne_tpu.reduction import (
        cr_bad_diff_masks, divide_white_fit_depths, fit_depths,
        fit_white_ramp,
        ramp_detrend, reduce_visit)
    from wayne_tpu.scene import example_scene

    S, NL, NSAMP, N_EXP, N_CHAN = 256, 256, 5, 48, 8
    # photon + read + sky + dark noise + COSMIC RAYS (repaired by the
    # DQ-aware reduction) + NON-LINEARITY and the bias pedestal (inverted
    # by the calwf3 NLINCORR step, reduction.linearize_reads — the cubic
    # compression is flux-dependent, so it would NOT cancel in depth
    # ratios if left uncorrected); deterministic systematics off so the
    # simple reduction's residual systematics don't masquerade as bias
    flags = dataclasses.replace(
        NoiseFlags.none(), poisson=True, read_noise=True, sky=True, dark=True,
        cosmic_rays=True, non_linearity=True, bias=True)
    cfg = ExposureStatic(subarray=S, n_lambda=NL, n_sub=4, nsamp=NSAMP,
                         samp_seq="SPARS25", scan=True, noise=flags,
                         band_px=64,
                         use_pallas=jax.default_backend() == "tpu")
    tables = synthetic_tables("G141", subarray=S, n_lambda=NL,
                              samp_seq="SPARS25", nsamp=NSAMP)
    # amplifier-quadrant map: every reduce_visit call below applies the
    # per-exposure per-amp offset correction (subarrays have no
    # reference pixels; with bias_drift on, background rows in another
    # quadrant leak a chromatic additive term — see
    # reduction.amp_offset_correct)
    from wayne_tpu.calibration import quadrant_map
    quad = quadrant_map(S, tables.subarray_corner)
    base = example_scene(NL, scan_speed=0.5)
    wl = np.asarray(tables.wl_centers)
    rp_inj = 0.1595 + 0.003 * np.sin(8.0 * wl)
    base = dataclasses.replace(
        base, x_ref=jnp.float32(40.0), y_ref=jnp.float32(60.0),
        rp_over_rs=jnp.asarray(rp_inj, jnp.float32),
        # enable the stochastic random-walk SSV on top of the sinusoid
        # (the systematics-on ensemble claims sin+rw)
        trends=dataclasses.replace(base.trends,
                                   ssv_rw_amp=jnp.float32(0.005)))
    starts = np.linspace(0.0, 4.0 * 3600.0, N_EXP)   # transit at 2 h
    exptime = float(tables.read_times[-1])
    mid = jnp.asarray(starts + exptime / 2.0, jnp.float32)

    visit = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (N_EXP,) + x.shape), base)
    visit = dataclasses.replace(
        visit, exp_start_s=jnp.asarray(starts, jnp.float32))

    x_window = (104, 232)   # the illuminated dispersion columns
    y_window = (40, 100)    # scan band + margins
    bg_rows = (180, 250)

    def sim_reads(s, local_cfg):
        """One exposure + the calwf3 NLINCORR step when simulated: the
        cubic compression is inverted (reduction.linearize_reads) and
        the stack returned in linearized DN, so every reduction below is
        unit-unchanged whether or not non_linearity is on."""
        from wayne_tpu.reduction import linearize_reads

        res = simulate_exposure(s, tables, local_cfg)
        reads = res.reads_dn
        if local_cfg.noise.non_linearity:
            reads = linearize_reads(
                reads, tables.nonlin_coeffs, tables.full_well_e,
                tables.gain,
                bias_e=(tables.bias_map if local_cfg.noise.bias
                        else None)) / tables.gain
        return reads, res.cr_pos, res.cr_count

    def make_run(local_cfg, detrend: str = "none", base_visit=None):
        # One jitted program reused across all realisations (a fresh
        # jax.jit per call would re-trace the whole visit every time).
        src_visit = visit if base_visit is None else base_visit

        @jax.jit
        def run(m):
            keys = jax.vmap(lambda e: jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(123), m), e)
            )(jnp.arange(N_EXP))
            scenes = dataclasses.replace(src_visit, key=keys)

            def sim(s):
                return sim_reads(s, local_cfg)

            reads, cr_pos, cr_count = jax.lax.map(sim, scenes)
            good = None
            if local_cfg.noise.cosmic_rays:
                # DQ-aware reduction: repair CR-hit read intervals from
                # the simulator's own hit lists (= the ima DQ planes).
                good = jax.vmap(lambda p, c: ~cr_bad_diff_masks(
                    p, c, S))(cr_pos, cr_count)
            red = reduce_visit(reads, tables.gain, mid, base.orbit,
                               y_window=y_window, x_window=x_window,
                               bg_rows=bg_rows, n_chan=N_CHAN,
                               good_diffs=good, quad_map=quad)
            chan = red.channel_lc
            if detrend == "both":
                # one simulate+reduce pass feeds BOTH detrenders (the
                # frames are identical by construction; simulating them
                # twice doubled the ensemble wall-clock and the flaky-
                # compile count)
                rp_dw, sig_dw, sig_dw_rel, sig_dw_com = (
                    divide_white_fit_depths(
                        red.white_lc, chan, mid, base.orbit, base.ld,
                        jnp.float32(0.155), return_components=True))
                wfit = fit_white_ramp(red.white_lc, mid, base.orbit,
                                      base.ld, jnp.float32(0.155))
                chan_rd = ramp_detrend(chan, wfit, mid, base.orbit)
                rp_rd, sig_rd = fit_depths(chan_rd, mid, base.orbit,
                                           base.ld, jnp.float32(0.155))
                return (rp_dw, sig_dw, sig_dw_rel, sig_dw_com,
                        rp_rd, sig_rd, red.channel_cols, wfit.rp)
            white_rp = jnp.float32(jnp.nan)
            if detrend == "divide-white":
                rp_hat, rp_sig = divide_white_fit_depths(
                    red.white_lc, chan, mid, base.orbit, base.ld,
                    jnp.float32(0.155))
                return rp_hat, rp_sig, red.channel_cols, white_rp
            elif detrend == "ramp":
                wfit = fit_white_ramp(red.white_lc, mid, base.orbit,
                                      base.ld, jnp.float32(0.155))
                chan = ramp_detrend(chan, wfit, mid, base.orbit)
                white_rp = wfit.rp
            rp_hat, rp_sig = fit_depths(chan, mid, base.orbit,
                                        base.ld, jnp.float32(0.155))
            return rp_hat, rp_sig, red.channel_cols, white_rp

        return run

    # injected spectrum per channel (unweighted column mean — host-side
    # via the same _channel_edges convention reduce_visit bins with)
    from wayne_tpu.ops.dispersion import trace_params, wl_to_x
    from wayne_tpu.reduction import _channel_edges as _ch_edges
    tp = trace_params(tables, base.x_ref, base.y_ref)
    xc = np.asarray(wl_to_x(tables.wl_centers, tp))
    edges_np = np.asarray(_ch_edges(x_window, N_CHAN))
    rp_true = np.array([
        rp_inj[(xc >= lo) & (xc < hi)].mean()
        for lo, hi in zip(edges_np[:-1], edges_np[1:])])

    # Noise-free reference through the identical pipeline (shared by
    # the main and pointing-drift sections).
    rp_ref = None
    if want("main") or want("with_pointing_drift"):
        rp_ref = np.asarray(make_run(dataclasses.replace(
            cfg, noise=NoiseFlags.none()))(0)[0])

    # --- error-bar calibration (per channel) ---------------------------
    # The pipeline's REPORTED sigma must match the REALISED ensemble
    # scatter channel by channel, or every downstream consumer of
    # rp_sigma is mis-calibrated. fit_depths' sigma includes the
    # OOT-baseline-normalisation term (reduction.fit_depths
    # baseline_var) — validated here end-to-end through the full noise
    # chain. NOTE channel 8 (the reddest) is intrinsically ~6x noisier
    # than its siblings: it straddles the G141 red sensitivity cutoff
    # (only ~10 of 29 lambda bins carry flux, 23-54x less channel flux,
    # while read+sky noise per column is constant), so its scatter AND
    # its reported sigma are both large — the RATIO is what must be ~1.
    # Two gate shapes (docs/REDUCTION.md "Error-bar calibration"):
    # - complete-model paths (main, eclipse, phase): two-sided
    #   [0.7, 1.5] — the sigma must MATCH the scatter;
    # - detrended paths with unmodelled residual structure (divide-white
    #   under SSV+drift, parametric/RECTE ramp fits, narrow-window
    #   staring, per-direction normalisation): sigma legitimately
    #   includes constant systematic-residual power (the chi2-inflation
    #   convention) and is therefore deliberately CONSERVATIVE — gate
    #   overconfidence only (ratio <= 1.5), never "too safe".
    # A channel may be honestly UNCONSTRAINED (the staring-mode red-edge
    # channel: essentially no flux in the window, curvature at the
    # numerical floor, reported sigma astronomically large): its ratio
    # is meaningless and must not mask a real failure elsewhere — so a
    # huge sigma only passes when the realised scatter is ALSO huge
    # (genuinely no information). A fit that blows its sigma up while
    # the ensemble scatter stays small (a regression, not physics)
    # FAILS the gate.
    def sigma_calibration(scat, sig_mean, lo=0.7, hi=1.5):
        ratio = scat / np.maximum(sig_mean, 1e-12)
        in_range = (ratio >= lo) & (ratio <= hi)
        unconstrained = (sig_mean > 0.3) & (scat > 0.02)
        return ([round(float(v), 3) for v in np.atleast_1d(ratio)],
                bool(np.all(in_range | unconstrained)))

    def pairwise_rel_ratio(rp_stack, sig_rel, keep=None):
        """Per-channel relative-calibration ratio via PAIRWISE channel
        differences — the estimator relative-inference consumers
        actually form: d_c - d_k with sqrt(sigma_rel_c^2 +
        sigma_rel_k^2) error bars. The common-mode term cancels
        exactly, and so does the divide-white white-noise coupling
        (every corrected channel shares -eps_white): a channel-MEAN
        subtraction only approximates that cancellation, and with
        unequal channel fluxes it overstated bright channels' relative
        scatter by up to 2x under pure noise (measured,
        tools/probe_dw_sigma.py). Returns, per kept channel, the
        median over partners of realised/claimed difference scatter.
        ``keep`` drops unconstrained channels (a dead channel's wild
        scatter is not a valid partner)."""
        if keep is not None:
            rp_stack = rp_stack[:, keep]
            sig_rel = sig_rel[keep]
        n_ch = rp_stack.shape[1]
        out = []
        for c in range(n_ch):
            rr = [rp_stack[:, c] - rp_stack[:, k]
                  for k in range(n_ch) if k != c]
            claimed = [np.sqrt(sig_rel[c]**2 + sig_rel[k]**2)
                       for k in range(n_ch) if k != c]
            out.append(float(np.median(
                [d.std(ddof=1) / max(s, 1e-12)
                 for d, s in zip(rr, claimed)])))
        return np.array(out)

    if want("main"):
        realisation = make_run(cfg)
        t0 = time.time()
        rp_hats, rp_sigs = [], []
        for m in range(args.n_mc):
            rp_hat, rp_sig, _, _ = realisation(m)
            rp_hats.append(np.asarray(rp_hat))
            rp_sigs.append(np.asarray(rp_sig))
            print(f"realisation {m + 1}/{args.n_mc}", file=sys.stderr,
                  flush=True)
        wall = time.time() - t0

        rp_hats = np.stack(rp_hats)          # (N, n_chan)
        rp_sigs = np.stack(rp_sigs)

        mean = rp_hats.mean(axis=0)
        scatter = rp_hats.std(axis=0, ddof=1)
        sem = scatter / np.sqrt(args.n_mc)
        noise_bias = mean - rp_ref
        ok_noise = bool(np.all(np.abs(noise_bias)
                               < np.maximum(3.0 * sem, 5e-5)))
        reduction_sys = rp_ref - rp_true
        ok_sys = bool(np.all(np.abs(reduction_sys) < 3e-3))
        sigma_chan = rp_sigs.mean(axis=0)
        cal_ratio, ok_sigma_cal = sigma_calibration(scatter, sigma_chan)
        # empirical 68% coverage of |rp - noise-free ref| by the
        # reported per-realisation sigma (cross-check on the ratio)
        coverage = float(np.mean(np.abs(rp_hats - rp_ref[None, :])
                                 < rp_sigs))
        ok_coverage = bool(0.55 <= coverage <= 0.80)
        gates.update(main_noise=ok_noise, main_sys=ok_sys,
                     main_sigma=ok_sigma_cal, main_coverage=ok_coverage)
        out.update({
            "n_mc": args.n_mc, "n_exp": N_EXP, "n_chan": N_CHAN,
            "flags": "poisson+read+sky+dark+cosmic_rays(DQ-repaired)"
                     "+nonlin+bias(NLINCORR)",
            "backend": jax.default_backend(),
            "wallclock_s": round(wall, 1),
            "rp_injected": [round(float(v), 6) for v in rp_true],
            "rp_noise_free_recovery": [round(float(v), 6)
                                       for v in rp_ref],
            "rp_recovered_mean": [round(float(v), 6) for v in mean],
            "noise_induced_bias": [round(float(v), 6)
                                   for v in noise_bias],
            "reduction_systematic": [round(float(v), 6)
                                     for v in reduction_sys],
            "rp_scatter": [round(float(v), 6) for v in scatter],
            "reported_sigma": [round(float(v), 6) for v in sigma_chan],
            "reported_sigma_median": round(float(np.median(rp_sigs)), 6),
            "sigma_calibration_ratio": cal_ratio,
            "sigma_coverage_1sigma": round(coverage, 3),
            "channel8_note": "reddest channel straddles the G141 red "
                             "sensitivity cutoff (23-54x less flux, "
                             "constant read+sky noise per column): ~6x "
                             "noisier AND ~6x larger reported sigma — "
                             "the calibration ratio is what is gated "
                             "(docs/REDUCTION.md)",
            "noise_unbiased_within_3sem": ok_noise,
            "reduction_systematic_below_3e-3": ok_sys,
            "sigma_calibrated_0.7_1.5": ok_sigma_cal,
            "sigma_coverage_in_0.55_0.80": ok_coverage,
        })

    # --- systematics-on ensemble, reduced like a real pipeline ---------
    # Full time-domain systematics (sinusoidal + random-walk SSV, orbit
    # hook, visit slope) plus the noise chain; the reduction divides the
    # white-light common-mode template out of the channels (the standard
    # WFC3 divide-white analysis) before fitting depths. Tests that the
    # simulated systematics are achromatic-multiplicative like the real
    # instrument's, and that a realistic analysis recovers the injected
    # spectrum from fully-corrupted frames.
    if want("with_systematics"):
        flags_sys = dataclasses.replace(
            flags, ssv=True, visit_trend=True,
            # per-read amplifier bias wander too: subarrays carry no
            # reference pixels, so the analysis chain (windowed
            # background rows + white normalisation) must absorb it as
            # noise — the no-bias gates below prove it does
            # (tests/test_bias_drift.py holds the same at unit scale)
            bias_drift=True)
        # full n_mc (not n_mc//2): the per-channel sigma-calibration
        # ratio gates need the scatter estimated to ~13%
        # (SE = 1/sqrt(2(n-1))), or a perfectly calibrated channel
        # trips the [0.7, 1.5] bound by chance; loop count only — no
        # recompiles.
        n_sys = max(args.n_mc, 8)
        # ONE simulate+reduce pass per realisation feeds both
        # reductions (divide-white AND the Iraclis-style parametric
        # ramp fit): the frames are identical by construction, so
        # simulating them per detrender doubled the ensemble
        # wall-clock and compile count.
        run_sys = make_run(dataclasses.replace(cfg, noise=flags_sys),
                           detrend="both")
        # Per-realisation noise-free counterpart: realisation m's
        # random-walk SSV draw is keyed by m alone (scene.key), so
        # running the SAME m with the stochastic noise off isolates the
        # noise-induced deviation per realisation — a draw-to-draw
        # divide-white residual does not masquerade as noise bias. Same
        # frames => the ramp comparison is paired too.
        run_clean = make_run(
            dataclasses.replace(cfg, noise=dataclasses.replace(
                NoiseFlags.none(), ssv=True, visit_trend=True)),
            detrend="both")
        t0 = time.time()
        sys_out = [run_sys(m) for m in range(n_sys)]
        clean_out = [run_clean(m) for m in range(n_sys)]
        wall_sys = time.time() - t0
        rp_sys = np.stack([np.asarray(o[0]) for o in sys_out])
        sig_sys = np.stack([np.asarray(o[1]) for o in sys_out])
        sig_sys_rel = np.stack([np.asarray(o[2]) for o in sys_out])
        sig_sys_com = np.array([float(o[3]) for o in sys_out])
        rp_ramp = np.stack([np.asarray(o[4]) for o in sys_out])
        sig_ramp_ch = np.stack([np.asarray(o[5]) for o in sys_out])
        white_ramp = np.array([float(o[7]) for o in sys_out])
        rp_clean = np.stack([np.asarray(o[0]) for o in clean_out])
        rp_ramp_clean = np.stack([np.asarray(o[4]) for o in clean_out])
        white_ramp_clean = np.array([float(o[7]) for o in clean_out])
        wall_ramp = wall_sys   # shared pass: one simulation, two reductions
        dev = rp_sys - rp_clean            # noise effect, walk held fixed
        mean_sys = rp_sys.mean(axis=0)
        bias_sys = dev.mean(axis=0)
        sem_sys = dev.std(axis=0, ddof=1) / np.sqrt(n_sys)
        ok_sys_noise = bool(np.all(np.abs(bias_sys)
                                   < np.maximum(3.0 * sem_sys, 1e-4)))
        resid_sys = rp_clean.mean(axis=0) - rp_true
        ok_divide_white = bool(np.all(np.abs(resid_sys) < 3e-3))
        dev_ramp = rp_ramp - rp_ramp_clean
        bias_ramp = dev_ramp.mean(axis=0)
        sem_ramp = dev_ramp.std(axis=0, ddof=1) / np.sqrt(n_sys)
        ok_ramp_noise = bool(np.all(np.abs(bias_ramp)
                                    < np.maximum(3.0 * sem_ramp, 1e-4)))
        resid_ramp = rp_ramp_clean.mean(axis=0) - rp_true
        ok_ramp_resid = bool(np.all(np.abs(resid_ramp) < 3e-3))
        # sigma calibration on the paired noise deviations (the clean
        # run shares realisation m's RW-SSV draw, so dev isolates
        # exactly the stochastic scatter the reported sigma claims to
        # measure)
        cal_ratio_sys, ok_sigma_sys = sigma_calibration(
            dev.std(axis=0, ddof=1), sig_sys.mean(axis=0), lo=0.0)
        cal_ratio_ramp, ok_sigma_ramp = sigma_calibration(
            dev_ramp.std(axis=0, ddof=1), sig_ramp_ch.mean(axis=0),
            lo=0.0)
        # RELATIVE (shape) sigma, gated TWO-SIDED: the common-mode term
        # cancels when each realisation's channel mean is removed, so
        # the relative scatter of the paired deviations must MATCH the
        # reported sigma_rel — the round-4 one-sided 0.135-0.28 ratios
        # were the undecomposed sigma_common, not honest conservatism.
        # (Requires the amp-offset correction below: without it the
        # per-quadrant amplifier wander leaks a chromatic additive
        # term the background rows — a DIFFERENT quadrant — cannot
        # see, and the relative scatter ran 3x the reported sigma.)
        rel_ratio_sys = pairwise_rel_ratio(dev,
                                           sig_sys_rel.mean(axis=0))
        cal_rel_sys = [round(float(v), 3) for v in rel_ratio_sys]
        ok_rel_sys = bool(np.all((rel_ratio_sys >= 0.7)
                                 & (rel_ratio_sys <= 1.5)))
        # common part: channel-mean deviation scatters by
        # sqrt(sigma_common^2 + mean(sigma_rel^2)/n_chan); the white
        # fit's sigma legitimately includes RW-SSV residual power the
        # paired noise deviations cannot contain (round-4 convention:
        # conservative is correct there), so overconfidence-only.
        com_scatter = dev.mean(axis=1).std(ddof=1)
        com_expect = float(np.sqrt(
            sig_sys_com.mean()**2
            + (sig_sys_rel.mean(axis=0)**2).mean() / N_CHAN))
        com_ratio = com_scatter / max(com_expect, 1e-12)
        ok_com_sys = bool(com_ratio <= 1.6)
        # absolute white depth: within the channel-depth envelope of
        # the flux-weighted injected value (rp_true's mean is a proxy)
        white_err = abs(float(white_ramp.mean())
                        - float(rp_true.mean()))
        ok_ramp_white = bool(white_err < 3e-3)
        # ramp path relative gate: sigma_rel == reported sigma (no
        # common term). The reported sigma's residual power includes
        # the achromatic RW-SSV leftover the ramp template cannot
        # absorb — which the relative transform removes from the
        # SCATTER but not from the REPORTED sigma, so the ratio is
        # legitimately conservative (measured 0.32-0.78): gate
        # overconfidence only, and record the ratios.
        rel_ratio_ramp = pairwise_rel_ratio(
            dev_ramp, sig_ramp_ch.mean(axis=0))
        cal_rel_ramp = [round(float(v), 3) for v in rel_ratio_ramp]
        ok_rel_ramp = bool(np.all(rel_ratio_ramp <= 1.5))
        gates.update(
            sys_noise=ok_sys_noise, sys_divide_white=ok_divide_white,
            sys_sigma=ok_sigma_sys, sys_sigma_rel=ok_rel_sys,
            sys_sigma_common=ok_com_sys,
            ramp_noise=ok_ramp_noise, ramp_resid=ok_ramp_resid,
            ramp_white=ok_ramp_white, ramp_sigma=ok_sigma_ramp,
            ramp_sigma_rel=ok_rel_ramp)
        out["with_systematics"] = {
            "n_mc": n_sys, "wallclock_s": round(wall_sys, 1),
            "flags": "poisson+read+sky+dark+cosmic_rays+nonlin"
                     "+bias(NLINCORR)+ssv(sin+rw)+visit_trend"
                     "+bias_drift",
            "reduction": "DQ-aware CR repair + divide-white "
                         "(common_mode_correct) + fit_depths",
            "rp_recovered_mean": [round(float(v), 6) for v in mean_sys],
            "noise_induced_bias": [round(float(v), 6) for v in bias_sys],
            "divide_white_residual": [round(float(v), 6)
                                      for v in resid_sys],
            "reported_sigma": [round(float(v), 6)
                               for v in sig_sys.mean(axis=0)],
            "reported_sigma_rel": [round(float(v), 6)
                                   for v in sig_sys_rel.mean(axis=0)],
            "reported_sigma_common": round(float(sig_sys_com.mean()), 6),
            "sigma_calibration_ratio": cal_ratio_sys,
            "sigma_rel_calibration_ratio": cal_rel_sys,
            "sigma_common_ratio": round(float(com_ratio), 3),
            "noise_unbiased_within_3sem": ok_sys_noise,
            "divide_white_residual_below_3e-3": ok_divide_white,
            "sigma_not_overconfident_max_1.5": ok_sigma_sys,
            "sigma_rel_calibrated_0.7_1.5": ok_rel_sys,
            "sigma_common_not_overconfident_max_1.6": ok_com_sys,
        }
        out["with_systematics_ramp_fit"] = {
            "n_mc": n_sys, "wallclock_s": round(wall_ramp, 1),
            "shared_simulation_pass": True,  # same frames/wall as above
            "flags": "poisson+read+sky+dark+cosmic_rays+nonlin"
                     "+bias(NLINCORR)+ssv(sin+rw)+visit_trend"
                     "+bias_drift",
            "reduction": "DQ-aware CR repair + joint white ramp fit "
                         "(fit_white_ramp) + ramp_detrend + fit_depths",
            "rp_recovered_mean": [round(float(v), 6)
                                  for v in rp_ramp.mean(axis=0)],
            "noise_induced_bias": [round(float(v), 6)
                                   for v in bias_ramp],
            "parametric_residual": [round(float(v), 6)
                                    for v in resid_ramp],
            "white_rp_recovered_mean": round(float(white_ramp.mean()), 6),
            "white_rp_noise_free": round(float(white_ramp_clean.mean()),
                                         6),
            "white_rp_injected_proxy": round(float(rp_true.mean()), 6),
            "reported_sigma": [round(float(v), 6)
                               for v in sig_ramp_ch.mean(axis=0)],
            "sigma_calibration_ratio": cal_ratio_ramp,
            "sigma_rel_calibration_ratio": cal_rel_ramp,
            "noise_unbiased_within_3sem": ok_ramp_noise,
            "parametric_residual_below_3e-3": ok_ramp_resid,
            "white_rp_within_3e-3": ok_ramp_white,
            "sigma_not_overconfident_max_1.5": ok_sigma_ramp,
            "sigma_rel_not_overconfident_max_1.5": ok_rel_ramp,
        }

    # --- pointing-drift ensemble: alignment closes the drift loop ------
    # HST visits drift along the dispersion axis (hundredths of a px per
    # orbit); with fixed column bins that modulates each channel by
    # delta_x * d(ln F)/dx — a CHROMATIC systematic divide-white cannot
    # touch (the white template is achromatic by construction). Inject a
    # 0.4 px linear drift, reduce with align=True (spectral_shifts +
    # centroid decorrelation): recovered depths must match the
    # drift-free pipeline's envelope, while align=False on the same
    # frames shows the systematic the alignment is removing.
    if want("with_pointing_drift"):
        drift_px = np.linspace(0.0, 0.4, N_EXP).astype(np.float32)
        visit_drift = dataclasses.replace(
            visit, x_ref=jnp.asarray(np.float32(40.0) + drift_px))

        def make_run_drift(local_cfg, align: bool):
            @jax.jit
            def run(m):
                keys = jax.vmap(lambda e: jax.random.fold_in(
                    jax.random.fold_in(jax.random.PRNGKey(777), m), e)
                )(jnp.arange(N_EXP))
                scenes = dataclasses.replace(visit_drift, key=keys)

                def sim(s):
                    return sim_reads(s, local_cfg)

                reads, cr_pos, cr_count = jax.lax.map(sim, scenes)
                good = None
                if local_cfg.noise.cosmic_rays:
                    good = jax.vmap(lambda p, c: ~cr_bad_diff_masks(
                        p, c, S))(cr_pos, cr_count)
                red = reduce_visit(reads, tables.gain, mid, base.orbit,
                                   y_window=y_window, x_window=x_window,
                                   bg_rows=bg_rows, n_chan=N_CHAN,
                                   good_diffs=good, align=align,
                                   ld=base.ld, rp0=jnp.float32(0.155),
                                   quad_map=quad)
                rp_hat, rp_sig = fit_depths(red.channel_lc, mid,
                                            base.orbit, base.ld,
                                            jnp.float32(0.155))
                return rp_hat, rp_sig, red.x_shifts

            return run

        clean_drift = dataclasses.replace(cfg, noise=NoiseFlags.none())
        rp_drift_raw = np.asarray(
            make_run_drift(clean_drift, False)(0)[0])
        rp_drift_al, _, shifts_fit = make_run_drift(clean_drift, True)(0)
        rp_drift_al = np.asarray(rp_drift_al)
        shifts_fit = np.asarray(shifts_fit)
        # 2x n_mc now that the ensemble IS sigma-gated: the drift
        # ensemble is cheap and the per-channel two-sided ratio gate
        # needs the scatter estimated to ~9% or a calibrated channel
        # trips [0.7, 1.5] by chance
        n_drift = max(2 * args.n_mc, 8)
        run_drift = make_run_drift(cfg, True)
        t0 = time.time()
        drift_out = [run_drift(m) for m in range(n_drift)]
        wall_drift = time.time() - t0
        rp_drifts = np.stack([np.asarray(o[0]) for o in drift_out])
        sig_drifts = np.stack([np.asarray(o[1]) for o in drift_out])
        bias_drift = rp_drifts.mean(axis=0) - rp_drift_al
        sem_drift = rp_drifts.std(axis=0, ddof=1) / np.sqrt(n_drift)
        ok_drift_noise = bool(np.all(np.abs(bias_drift)
                                     < np.maximum(3.0 * sem_drift, 1e-4)))
        # aligned systematic must sit in the same envelope as the
        # drift-free pipeline; the raw one shows what alignment removed
        sys_drift_al = np.abs(rp_drift_al - rp_ref).max()
        sys_drift_raw = np.abs(rp_drift_raw - rp_ref).max()
        ok_drift_sys = bool(sys_drift_al
                            < max(3.0e-4, 0.5 * sys_drift_raw))
        # fitted drift series tracks the injection (up to the visit mean)
        shift_err = np.abs((shifts_fit - shifts_fit.mean())
                           - (drift_px - drift_px.mean())).max()
        # sigma gate (round-4 weak item: this was the one ensemble with
        # only a prose note). shift_detrend removes ONE fitted
        # regressor (the model-basis-cleaned centroid) from each
        # channel curve — the absorbed noise DoF shrink the residual
        # variance fit_depths estimates by ~(n-1)/n, a ~1% sigma
        # effect at n=48, NOT a structural blind spot: the regressor is
        # cleaned of the transit basis (clean_drift_regressor), so the
        # noise it absorbs is orthogonal to the depth direction. The
        # paired scatter (clean run shares the drift scenes) must
        # therefore MATCH the reported sigma two-sided, like every
        # other complete-model path.
        cal_ratio_drift, ok_sigma_drift = sigma_calibration(
            rp_drifts.std(axis=0, ddof=1), sig_drifts.mean(axis=0))
        gates.update(drift_noise=ok_drift_noise, drift_sys=ok_drift_sys,
                     drift_sigma=ok_sigma_drift)
        out["with_pointing_drift"] = {
            "n_mc": n_drift, "wallclock_s": round(wall_drift, 1),
            "drift_injected_px": 0.4,
            "reduction": "spectral_shifts + model-basis-cleaned "
                         "centroid shift_detrend (reduce_visit "
                         "align=True, ld=)",
            "fitted_shift_max_err_px": round(float(shift_err), 4),
            "depth_systematic_raw": round(float(sys_drift_raw), 6),
            "depth_systematic_aligned": round(float(sys_drift_al), 6),
            "noise_induced_bias": [round(float(v), 6)
                                   for v in bias_drift],
            "reported_sigma": [round(float(v), 6)
                               for v in sig_drifts.mean(axis=0)],
            "sigma_calibration_ratio": cal_ratio_drift,
            "sigma_dof_note": "shift_detrend absorbs ~1 noise DoF per "
                              "channel curve (~1% sigma at n_exp=48); "
                              "the regressor is cleaned of the transit "
                              "basis, so the gate is two-sided",
            "noise_unbiased_within_3sem": ok_drift_noise,
            "aligned_systematic_within_envelope": ok_drift_sys,
            "sigma_calibrated_0.7_1.5": ok_sigma_drift,
        }

    # --- RECTE physical charge-trapping ensemble ------------------------
    # The physically-generated ramp (ops/recte.py: two-trap kinetics
    # driven by the illumination history, NOT the parametric hook) must
    # reduce out through the standard Iraclis-style joint white
    # transit x ramp fit: noise-unbiased depths and residuals in the
    # same envelope as the parametric-systematics ensemble. The trap
    # maps are deterministic (noise-free stimulus), so one solution is
    # shared across realisations, exactly as run_dataset does.
    if want("with_recte"):
        from wayne_tpu.config import RecteConfig
        from wayne_tpu.ops.recte import visit_trap_maps

        trap_mult, trap_rel = visit_trap_maps(visit, tables, cfg,
                                              RecteConfig(), chunk=8)
        visit_recte = dataclasses.replace(visit, trap_mult=trap_mult,
                                          persist_rate=trap_rel)
        run_recte = make_run(cfg, detrend="ramp", base_visit=visit_recte)
        # Uncorrected noise-free fit: shows the trap ramp actually
        # biases a naive reduction (else this ensemble gates nothing).
        rp_recte_raw = np.asarray(make_run(
            dataclasses.replace(cfg, noise=NoiseFlags.none()),
            base_visit=visit_recte)(0)[0])
        out_recte_ref = make_run(dataclasses.replace(
            cfg, noise=NoiseFlags.none()), detrend="ramp",
            base_visit=visit_recte)(0)
        rp_recte_ref = np.asarray(out_recte_ref[0])
        white_recte_ref = float(out_recte_ref[3])
        n_recte = max(args.n_mc, 8)
        t0 = time.time()
        recte_out = [run_recte(m) for m in range(n_recte)]
        wall_recte = time.time() - t0
        rp_rectes = np.stack([np.asarray(o[0]) for o in recte_out])
        sig_rectes = np.stack([np.asarray(o[1]) for o in recte_out])
        white_rectes = np.array([float(o[3]) for o in recte_out])
        bias_recte = rp_rectes.mean(axis=0) - rp_recte_ref
        sem_recte = rp_rectes.std(axis=0, ddof=1) / np.sqrt(n_recte)
        ok_recte_noise = bool(np.all(np.abs(bias_recte)
                                     < np.maximum(3.0 * sem_recte, 1e-4)))
        resid_recte = rp_recte_ref - rp_true
        ok_recte_resid = bool(np.all(np.abs(resid_recte) < 3e-3))
        raw_recte_err = float(np.abs(rp_recte_raw - rp_true).max())
        # The raw (un-detrended) error must be LARGE or the ensemble
        # gates nothing: if the trap maps silently stopped biasing the
        # naive reduction (e.g. a regression drops the trap_mult Scene
        # leaf), the corrected gates would pass vacuously. Mirrors
        # test_recte.py's raw_err > 0.002 assertion.
        ok_recte_raw = raw_recte_err > 2e-3
        ok_recte_white = bool(
            abs(float(white_rectes.mean()) - float(rp_true.mean()))
            < 3e-3)
        cal_ratio_recte, ok_sigma_recte = sigma_calibration(
            rp_rectes.std(axis=0, ddof=1), sig_rectes.mean(axis=0),
            lo=0.0)
        # relative gate: removing each realisation's channel mean
        # drops the achromatic template-error part from the SCATTER,
        # but the reported sigma's residual power keeps it — the ratio
        # is legitimately conservative on the red-edge channels
        # (measured 0.26-1.47): gate overconfidence only, record all.
        rel_ratio_recte = pairwise_rel_ratio(
            rp_rectes, sig_rectes.mean(axis=0))
        cal_rel_recte = [round(float(v), 3) for v in rel_ratio_recte]
        ok_rel_recte = bool(np.all(rel_ratio_recte <= 1.5))
        gates.update(recte_raw=ok_recte_raw, recte_noise=ok_recte_noise,
                     recte_resid=ok_recte_resid,
                     recte_white=ok_recte_white,
                     recte_sigma=ok_sigma_recte,
                     recte_sigma_rel=ok_rel_recte)
        out["with_recte"] = {
            "n_mc": n_recte, "wallclock_s": round(wall_recte, 1),
            "flags": "poisson+read+sky+dark+cosmic_rays+nonlin"
                     "+bias(NLINCORR)+recte(Zhou+17 physical trap maps)",
            "reduction": "DQ-aware CR repair + joint white ramp fit "
                         "(fit_white_ramp) + ramp_detrend + fit_depths",
            "uncorrected_depth_error_max": round(raw_recte_err, 6),
            "uncorrected_error_large_enough_to_gate": ok_recte_raw,
            "rp_recovered_mean": [round(float(v), 6)
                                  for v in rp_rectes.mean(axis=0)],
            "noise_induced_bias": [round(float(v), 6)
                                   for v in bias_recte],
            "physical_ramp_residual": [round(float(v), 6)
                                       for v in resid_recte],
            "white_rp_recovered_mean": round(float(white_rectes.mean()),
                                             6),
            "white_rp_noise_free": round(white_recte_ref, 6),
            "reported_sigma": [round(float(v), 6)
                               for v in sig_rectes.mean(axis=0)],
            "sigma_calibration_ratio": cal_ratio_recte,
            "sigma_rel_calibration_ratio": cal_rel_recte,
            "noise_unbiased_within_3sem": ok_recte_noise,
            "physical_ramp_residual_below_3e-3": ok_recte_resid,
            "white_rp_within_3e-3": ok_recte_white,
            "sigma_not_overconfident_max_1.5": ok_sigma_recte,
            "sigma_rel_not_overconfident_max_1.5": ok_rel_recte,
        }

    # --- eclipse-mode ensemble: emission-contrast recovery -------------
    # A secondary-eclipse visit (exposures spanning the occultation) with
    # the noise chain on; the closed-form linear eclipse fit must recover
    # the injected Fp/Fs noise-unbiased at ensemble scale.
    if want("eclipse_mode"):
        from wayne_tpu.reduction import fit_eclipse_depths

        fp_inj = 1.5e-3
        period_s = float(np.asarray(base.orbit.period_s))
        t0_s = float(np.asarray(base.orbit.t0_s))
        starts_ecl = (t0_s + period_s / 2.0
                      + np.linspace(-2.0 * 3600.0, 2.0 * 3600.0, N_EXP))
        mid_ecl = jnp.asarray(starts_ecl + exptime / 2.0, jnp.float32)
        visit_ecl = dataclasses.replace(
            visit, exp_start_s=jnp.asarray(starts_ecl, jnp.float32),
            fp_over_fs=jnp.broadcast_to(
                jnp.full((NL,), fp_inj, jnp.float32), (N_EXP, NL)))
        cfg_ecl = dataclasses.replace(cfg, eclipse=True)
        rp_geom = jnp.float32(float(rp_inj.mean()))

        def make_run_ecl(local_cfg):
            @jax.jit
            def run(m):
                keys = jax.vmap(lambda e: jax.random.fold_in(
                    jax.random.fold_in(jax.random.PRNGKey(321), m), e)
                )(jnp.arange(N_EXP))
                scenes = dataclasses.replace(visit_ecl, key=keys)

                def sim(s):
                    return sim_reads(s, local_cfg)

                reads, cr_pos, cr_count = jax.lax.map(sim, scenes)
                good = None
                if local_cfg.noise.cosmic_rays:
                    good = jax.vmap(lambda p, c: ~cr_bad_diff_masks(
                        p, c, S))(cr_pos, cr_count)
                red = reduce_visit(reads, tables.gain, mid_ecl,
                                   base.orbit,
                                   y_window=y_window, x_window=x_window,
                                   bg_rows=bg_rows, n_chan=N_CHAN,
                                   good_diffs=good, quad_map=quad)
                return fit_eclipse_depths(red.channel_lc, mid_ecl,
                                          base.orbit, rp_geom)

            return run

        n_ecl = max(args.n_mc, 8)
        run_ecl = make_run_ecl(cfg_ecl)
        fp_ref = np.asarray(make_run_ecl(dataclasses.replace(
            cfg_ecl, noise=NoiseFlags.none()))(0)[0])
        t0 = time.time()
        ecl_out = [run_ecl(m) for m in range(n_ecl)]
        wall_ecl = time.time() - t0
        fp_hats = np.stack([np.asarray(o[0]) for o in ecl_out])
        fp_sigs = np.stack([np.asarray(o[1]) for o in ecl_out])
        bias_ecl = fp_hats.mean(axis=0) - fp_ref
        sem_ecl = fp_hats.std(axis=0, ddof=1) / np.sqrt(n_ecl)
        ok_ecl_noise = bool(np.all(np.abs(bias_ecl)
                                   < np.maximum(3.0 * sem_ecl, 2e-5)))
        # Same class of envelope as the transit mode's
        # reduction_systematic (box extraction + normalisation
        # wavelength structure): ~1e-3 here, dominated by the low-flux
        # band-edge channels.
        resid_ecl = fp_ref - fp_inj
        ok_ecl_sys = bool(np.all(np.abs(resid_ecl) < 1e-3))
        cal_ratio_ecl, ok_sigma_ecl = sigma_calibration(
            fp_hats.std(axis=0, ddof=1), fp_sigs.mean(axis=0))
        gates.update(ecl_noise=ok_ecl_noise, ecl_sys=ok_ecl_sys,
                     ecl_sigma=ok_sigma_ecl)
        out["eclipse_mode"] = {
            "n_mc": n_ecl, "wallclock_s": round(wall_ecl, 1),
            "fp_injected": fp_inj,
            "fp_noise_free_recovery": [round(float(v), 7)
                                       for v in fp_ref],
            "fp_recovered_mean": [round(float(v), 7)
                                  for v in fp_hats.mean(axis=0)],
            "noise_induced_bias": [round(float(v), 7) for v in bias_ecl],
            "recovery_systematic": [round(float(v), 7)
                                    for v in resid_ecl],
            "reported_sigma": [round(float(v), 7)
                               for v in fp_sigs.mean(axis=0)],
            "sigma_calibration_ratio": cal_ratio_ecl,
            "noise_unbiased_within_3sem": ok_ecl_noise,
            "systematic_below_1e-3": ok_ecl_sys,
            "sigma_calibrated_0.7_1.5": ok_sigma_ecl,
        }

    # --- staring-mode ensemble (BASELINE config 2 class) ----------------
    # No scan: the spectrum stays on the trace rows, so the extraction
    # window is narrow and the per-exposure PSF width matters — exactly
    # where the intra-orbit environmental systematics (focus breathing,
    # sky orbit/scatter variation; Scene leaves) bite hardest. Noise
    # chain + CRs + amplifier bias drift on top; divide-white reduction;
    # same no-bias / residual gates as the scan ensembles.
    from wayne_tpu.visit_plan import HST_PERIOD_S

    if want("staring_mode"):
        orbit_ph = 2.0 * np.pi * (starts % HST_PERIOD_S) / HST_PERIOD_S
        rng_env = np.random.default_rng(9)
        sky_var = (np.asarray(visit.sky_level, np.float64)
                   * (1.0 + 0.10 * np.cos(orbit_ph)
                      + 0.03 * rng_env.standard_normal(N_EXP)))
        # Staring concentrates the whole spectrum on ~2 PSF rows: at the
        # scan ensemble's brightness the trace core SATURATES once the
        # full-well clamp is simulated (non_linearity on), and the
        # clamp destroys the in-transit signal — the physical reason
        # bright-star programs spatial-scan. Staring programs target
        # fainter stars: dim to 5% (peak charge guard below).
        visit_star = dataclasses.replace(
            visit,
            stellar_flux=visit.stellar_flux * jnp.float32(0.05),
            scan_speed=jnp.zeros((N_EXP,), jnp.float32),
            psf_scale=jnp.asarray(1.0 + 0.015 * np.sin(orbit_ph),
                                  jnp.float32),
            sky_level=jnp.asarray(sky_var, jnp.float32))
        cfg_star = dataclasses.replace(
            cfg, scan=False,
            noise=dataclasses.replace(flags, bias_drift=True))
        y_star = (48, 76)        # trace rows +- PSF tails, no scan smear
        n_star = max(args.n_mc, 8)
        peak_e = float(jnp.max(sim_reads(
            jax.tree_util.tree_map(lambda x: x[0], visit_star),
            dataclasses.replace(cfg_star, noise=NoiseFlags.none()))[0][-1])
            * tables.gain)
        if peak_e > 0.9 * float(tables.full_well_e):
            raise SystemExit(
                f"staring-mode scene peaks at {peak_e:.0f} e- "
                f"(full well {float(tables.full_well_e):.0f}): the "
                "full-well clamp would eat the transit — dim "
                "stellar_flux further")

        def make_run_star(local_cfg, xw=x_window):
            @jax.jit
            def run(m):
                keys = jax.vmap(lambda e: jax.random.fold_in(
                    jax.random.fold_in(jax.random.PRNGKey(555), m), e)
                )(jnp.arange(N_EXP))
                scenes = dataclasses.replace(visit_star, key=keys)

                def sim(s):
                    return sim_reads(s, local_cfg)

                reads, cr_pos, cr_count = jax.lax.map(sim, scenes)
                good = None
                if local_cfg.noise.cosmic_rays:
                    good = jax.vmap(lambda p, c: ~cr_bad_diff_masks(
                        p, c, S))(cr_pos, cr_count)
                red = reduce_visit(reads, tables.gain, mid, base.orbit,
                                   y_window=y_star, x_window=xw,
                                   bg_rows=bg_rows, n_chan=N_CHAN,
                                   good_diffs=good, quad_map=quad)
                return divide_white_fit_depths(
                    red.white_lc, red.channel_lc, mid, base.orbit,
                    base.ld, jnp.float32(0.155),
                    return_components=True)

            return run

        run_star = make_run_star(cfg_star)
        # Noise-free reference KEEPS the breathing/sky-variation leaves
        # (they are scene data, not noise flags): the comparison
        # isolates what the stochastic chain adds on top of the
        # environment.
        rp_star_ref = np.asarray(make_run_star(dataclasses.replace(
            cfg_star, noise=NoiseFlags.none()))(0)[0])
        t0 = time.time()
        star_out = [run_star(m) for m in range(n_star)]
        wall_star = time.time() - t0
        rp_stars = np.stack([np.asarray(o[0]) for o in star_out])
        sig_stars = np.stack([np.asarray(o[1]) for o in star_out])
        sig_star_rel = np.stack([np.asarray(o[2]) for o in star_out])
        sig_star_com = np.array([float(o[3]) for o in star_out])
        bias_star = rp_stars.mean(axis=0) - rp_star_ref
        sem_star = rp_stars.std(axis=0, ddof=1) / np.sqrt(n_star)
        ok_star_noise = bool(np.all(np.abs(bias_star)
                                    < np.maximum(3.0 * sem_star, 1e-4)))
        resid_star = rp_star_ref - rp_true
        ok_star_sys = bool(np.all(np.abs(resid_star) < 3e-3))
        cal_ratio_star, ok_sigma_star = sigma_calibration(
            rp_stars.std(axis=0, ddof=1), sig_stars.mean(axis=0), lo=0.0)
        # productised quality flag (reduction.constrained_mask). The
        # amp-offset correction HEALED the production window's red-edge
        # channel (round-4's sigma 3.2e8 was largely the cross-quadrant
        # amplifier leak corrupting the tiny 5%-flux staring fit; it
        # now reports an honest wide-but-finite sigma), so the
        # production-window gate is "flags match reality: all
        # constrained". Non-vacuity comes from a DEAD-WINDOW probe: the
        # same noisy visit refitted over a window extended past the
        # G141 red cutoff (columns to 250 — the reddest channel covers
        # truly dead columns) must flag ITS red channel and no healthy
        # one.
        from wayne_tpu.reduction import constrained_mask

        ok_ch_star = np.asarray(constrained_mask(
            rp_stars.mean(axis=0), sig_stars.mean(axis=0)))
        rp_dead, sig_dead = (np.asarray(a) for a in make_run_star(
            cfg_star, xw=(104, 250))(0)[:2])
        ok_ch_dead = np.asarray(constrained_mask(rp_dead, sig_dead))
        ok_flag_star = bool(ok_ch_star.all()
                            and (~ok_ch_dead[-1])
                            and ok_ch_dead[:-1].all())
        # relative (shape) gate over the CONSTRAINED channels two-sided
        # — the dead channel's wild scatter must not leak into the mean
        rel_ratio_star = pairwise_rel_ratio(
            rp_stars, sig_star_rel.mean(axis=0), keep=ok_ch_star)
        cal_rel_star = [round(float(v), 3) for v in rel_ratio_star]
        ok_rel_star = bool(np.all((rel_ratio_star >= 0.7)
                                  & (rel_ratio_star <= 1.5)))
        gates.update(star_noise=ok_star_noise, star_sys=ok_star_sys,
                     star_sigma=ok_sigma_star, star_flag=ok_flag_star,
                     star_sigma_rel=ok_rel_star)
        out["staring_mode"] = {
            "n_mc": n_star, "wallclock_s": round(wall_star, 1),
            "flags": "poisson+read+sky+dark+cosmic_rays+nonlin"
                     "+bias(NLINCORR)+bias_drift"
                     "+breathing(1.5%)+sky_var(10%orbit+3%scatter)",
            "reduction": "DQ-aware CR repair + narrow-window extraction "
                         "+ divide-white + fit_depths",
            "rp_recovered_mean": [round(float(v), 6)
                                  for v in rp_stars.mean(axis=0)],
            "noise_induced_bias": [round(float(v), 6)
                                   for v in bias_star],
            "recovery_systematic": [round(float(v), 6)
                                    for v in resid_star],
            "reported_sigma": [round(float(v), 6)
                               for v in sig_stars.mean(axis=0)],
            "reported_sigma_rel": [round(float(v), 6)
                                   for v in sig_star_rel.mean(axis=0)],
            "reported_sigma_common": round(float(sig_star_com.mean()),
                                           6),
            "sigma_calibration_ratio": cal_ratio_star,
            "sigma_rel_calibration_ratio": cal_rel_star,
            "constrained_flags": [bool(v) for v in ok_ch_star],
            "constrained_note": "all production-window channels are "
                                "genuinely constrained once the "
                                "amp-offset correction fixes the "
                                "cross-quadrant leak (round-4 red-edge "
                                "sigma 3.2e8 -> ~0.03)",
            "dead_window_flags": [bool(v) for v in ok_ch_dead],
            "dead_window_sigma": [round(float(v), 6) for v in sig_dead],
            "noise_unbiased_within_3sem": ok_star_noise,
            "recovery_systematic_below_3e-3": ok_star_sys,
            "sigma_not_overconfident_max_1.5": ok_sigma_star,
            "sigma_rel_calibrated_0.7_1.5": ok_rel_star,
            "constrained_flags_match_reality": ok_flag_star,
        }

    # --- forward/reverse scan-direction ensemble -----------------------
    # Real scan programs alternate direction; the two directions see
    # slightly different effective exposure times (the WFC3
    # upstream/downstream effect, achromatic ~0.1-1%). Inject +0.5% on
    # the reverse scans (stellar_flux Scene leaf — exactly how
    # Observation builds trends.reverse_flux_offset visits) with
    # alternating scan_speed sign and reverse start rows, and reduce
    # with reduce_visit(scan_dir=): per-direction out-of-transit
    # normalisation must remove the sawtooth. The uncorrected reduction
    # on the SAME noise-free frames must (a) measure the injected
    # offset off its own white curve and (b) show inflated fit sigmas —
    # or this ensemble would gate nothing.
    from wayne_tpu.reduction import out_of_transit_mask

    if want("scan_direction"):
        off_fr = 0.005
        rev_fr = np.arange(N_EXP) % 2 == 1
        visit_fr = dataclasses.replace(
            visit,
            scan_speed=jnp.asarray(np.where(rev_fr, -0.5, 0.5),
                                   jnp.float32),
            y_ref=jnp.asarray(np.where(rev_fr, 60.0 + 0.5 * exptime,
                                       60.0), jnp.float32),
            stellar_flux=visit.stellar_flux
            * jnp.asarray(np.where(rev_fr, 1.0 + off_fr, 1.0),
                          jnp.float32)[:, None])
        scan_dir_fr = jnp.asarray(rev_fr, jnp.float32)

        def make_run_fr(local_cfg, corrected: bool):
            @jax.jit
            def run(m):
                keys = jax.vmap(lambda e: jax.random.fold_in(
                    jax.random.fold_in(jax.random.PRNGKey(888), m), e)
                )(jnp.arange(N_EXP))
                scenes = dataclasses.replace(visit_fr, key=keys)

                def sim(s):
                    return sim_reads(s, local_cfg)

                reads, cr_pos, cr_count = jax.lax.map(sim, scenes)
                good = None
                if local_cfg.noise.cosmic_rays:
                    good = jax.vmap(lambda p, c: ~cr_bad_diff_masks(
                        p, c, S))(cr_pos, cr_count)
                red = reduce_visit(
                    reads, tables.gain, mid, base.orbit,
                    y_window=y_window, x_window=x_window,
                    bg_rows=bg_rows, n_chan=N_CHAN, good_diffs=good,
                    scan_dir=scan_dir_fr if corrected else None,
                    quad_map=quad)
                rp_hat, rp_sig = fit_depths(red.channel_lc, mid,
                                            base.orbit, base.ld,
                                            jnp.float32(0.155))
                return rp_hat, rp_sig, red.white_lc

            return run

        cfg_fr_nf = dataclasses.replace(cfg, noise=NoiseFlags.none())
        rp_fr_raw, sig_fr_raw, white_fr_raw = (
            np.asarray(a) for a in make_run_fr(cfg_fr_nf, False)(0))
        rp_fr_ref, sig_fr_ref, white_fr_ref = (
            np.asarray(a) for a in make_run_fr(cfg_fr_nf, True)(0))
    # The uncorrected white curve's per-direction OOT baselines must
    # show the direction systematic. NOTE the measured offset is MORE
    # than the injected flux factor: the reverse scans start ~39 rows
    # higher, and the aXe trace/throughput are field-dependent, so the
    # two directions also see a genuinely different system response
    # (real forward/reverse visits do too — the reason the standard
    # treatment normalises per direction rather than modelling the
    # offset). The correction must remove the TOTAL offset.
        oot_np = np.asarray(out_of_transit_mask(mid, base.orbit))

        def dir_offset(w):
            return float(w[rev_fr & oot_np].mean()
                         / w[~rev_fr & oot_np].mean() - 1.0)

        off_raw = dir_offset(white_fr_raw)
        off_corr = dir_offset(white_fr_ref)
        ok_fr_present = bool(abs(off_raw) > 0.5 * off_fr)
        ok_fr_removed = bool(abs(off_corr)
                             < max(0.1 * abs(off_raw), 5e-4))
        resid_fr = rp_fr_ref - rp_true
        ok_fr_sys = bool(np.all(np.abs(resid_fr) < 3e-3))
        n_fr = max(args.n_mc, 8)
        run_fr = make_run_fr(cfg, True)
        t0 = time.time()
        fr_out = [run_fr(m) for m in range(n_fr)]
        wall_fr = time.time() - t0
        rp_frs = np.stack([np.asarray(o[0]) for o in fr_out])
        sig_frs = np.stack([np.asarray(o[1]) for o in fr_out])
        bias_fr = rp_frs.mean(axis=0) - rp_fr_ref
        sem_fr = rp_frs.std(axis=0, ddof=1) / np.sqrt(n_fr)
        ok_fr_noise = bool(np.all(np.abs(bias_fr)
                                  < np.maximum(3.0 * sem_fr, 1e-4)))
        cal_ratio_fr, ok_sigma_fr = sigma_calibration(
            rp_frs.std(axis=0, ddof=1), sig_frs.mean(axis=0), lo=0.0)
        # relative gate: the per-direction normalisation error is
        # achromatic and cancels with the channel mean, but the
        # red-edge channels' sigma keeps honest residual power the
        # relative scatter does not (measured 0.07-1.32): gate
        # overconfidence only, record all.
        rel_ratio_fr = pairwise_rel_ratio(rp_frs,
                                          sig_frs.mean(axis=0))
        cal_rel_fr = [round(float(v), 3) for v in rel_ratio_fr]
        ok_rel_fr = bool(np.all(rel_ratio_fr <= 1.5))
        gates.update(fr_present=ok_fr_present, fr_removed=ok_fr_removed,
                     fr_noise=ok_fr_noise, fr_sys=ok_fr_sys,
                     fr_sigma=ok_sigma_fr, fr_sigma_rel=ok_rel_fr)
        out["scan_direction"] = {
            "n_mc": n_fr, "wallclock_s": round(wall_fr, 1),
            "flags": "poisson+read+sky+dark+cosmic_rays+nonlin"
                     "+bias(NLINCORR)"
                     f"+reverse_flux_offset({off_fr * 100:.1f}%)",
            "reduction": "DQ-aware CR repair + per-direction OOT "
                         "normalisation (reduce_visit scan_dir=) "
                         "+ fit_depths",
            "offset_injected_flux": off_fr,
            "offset_measured_uncorrected": round(off_raw, 6),
            "offset_note": "measured > injected: the reverse scans "
                           "start ~39 rows higher and the aXe "
                           "trace/throughput are field-dependent, so "
                           "the directions differ by geometry too — "
                           "both removed by per-direction "
                           "normalisation",
            "offset_after_correction": round(off_corr, 6),
            "direction_systematic_present": ok_fr_present,
            "correction_removes_offset": ok_fr_removed,
            "uncorrected_sigma_mean": round(float(sig_fr_raw.mean()), 6),
            "corrected_sigma_mean": round(float(sig_fr_ref.mean()), 6),
            "rp_uncorrected_noise_free": [round(float(v), 6)
                                          for v in rp_fr_raw],
            "rp_recovered_mean": [round(float(v), 6)
                                  for v in rp_frs.mean(axis=0)],
            "noise_induced_bias": [round(float(v), 6) for v in bias_fr],
            "recovery_systematic": [round(float(v), 6)
                                    for v in resid_fr],
            "reported_sigma": [round(float(v), 6)
                               for v in sig_frs.mean(axis=0)],
            "sigma_calibration_ratio": cal_ratio_fr,
            "sigma_rel_calibration_ratio": cal_rel_fr,
            "noise_unbiased_within_3sem": ok_fr_noise,
            "recovery_systematic_below_3e-3": ok_fr_sys,
            "sigma_not_overconfident_max_1.5": ok_sigma_fr,
            "sigma_rel_not_overconfident_max_1.5": ok_rel_fr,
        }

    # --- thermal phase-curve ensemble -----------------------------------
    # A full-orbit visit with the planet's dayside contrast modulated by
    # the sinusoidal thermal phase model (fp, A, hot-spot offset); the
    # closed-form harmonic fit (fit_phase_curve: 5-param linear LS with
    # a joint baseline slope, in-transit epochs weighted out) must
    # recover (fp, A, phi0) noise-unbiased from the white curve.
    if want("phase_curve_mode"):
        from wayne_tpu.reduction import fit_phase_curve

        fp_ph, amp_ph, off_ph = 2.0e-3, 0.5, 0.3
        period_s = float(np.asarray(base.orbit.period_s))
        starts_ph = np.linspace(0.0, period_s, N_EXP)
        mid_ph = jnp.asarray(starts_ph + exptime / 2.0, jnp.float32)
        visit_ph = dataclasses.replace(
            visit, exp_start_s=jnp.asarray(starts_ph, jnp.float32),
            fp_over_fs=jnp.broadcast_to(
                jnp.full((NL,), fp_ph, jnp.float32), (N_EXP, NL)),
            phase_amp=jnp.full_like(visit.phase_amp, amp_ph),
            phase_offset=jnp.full_like(visit.phase_offset, off_ph))
        cfg_ph = dataclasses.replace(cfg, eclipse=True)
        rp_geom_ph = jnp.float32(float(rp_inj.mean()))

        def make_run_ph(local_cfg):
            @jax.jit
            def run(m):
                keys = jax.vmap(lambda e: jax.random.fold_in(
                    jax.random.fold_in(jax.random.PRNGKey(246), m), e)
                )(jnp.arange(N_EXP))
                scenes = dataclasses.replace(visit_ph, key=keys)

                def sim(s):
                    return sim_reads(s, local_cfg)

                reads, cr_pos, cr_count = jax.lax.map(sim, scenes)
                good = None
                if local_cfg.noise.cosmic_rays:
                    good = jax.vmap(lambda p, c: ~cr_bad_diff_masks(
                        p, c, S))(cr_pos, cr_count)
                red = reduce_visit(reads, tables.gain, mid_ph,
                                   base.orbit,
                                   y_window=y_window, x_window=x_window,
                                   bg_rows=bg_rows, n_chan=N_CHAN,
                                   good_diffs=good, quad_map=quad)
                fit = fit_phase_curve(red.white_lc, mid_ph, base.orbit,
                                      rp_geom_ph)
                return fit.fp, fit.amp, fit.offset_rad, fit.fp_sigma

            return run

        run_ph = make_run_ph(cfg_ph)
        ref_ph = [float(a) for a in make_run_ph(dataclasses.replace(
            cfg_ph, noise=NoiseFlags.none()))(0)]
        ok_ph_fp = bool(abs(ref_ph[0] - fp_ph) < 1e-3)
        ok_ph_amp = bool(abs(ref_ph[1] - amp_ph) < 0.15)
        ok_ph_off = bool(abs(ref_ph[2] - off_ph) < 0.15)
        n_ph = max(args.n_mc, 8)
        t0 = time.time()
        ph_out = np.array([[float(a) for a in run_ph(m)]
                           for m in range(n_ph)])
        wall_ph = time.time() - t0
        bias_ph = ph_out[:, 0].mean() - ref_ph[0]
        sem_ph = ph_out[:, 0].std(ddof=1) / np.sqrt(n_ph)
        ok_ph_noise = bool(abs(bias_ph) < max(3.0 * sem_ph, 2e-5))
        bias_ph_amp = ph_out[:, 1].mean() - ref_ph[1]
        sem_ph_amp = ph_out[:, 1].std(ddof=1) / np.sqrt(n_ph)
        ok_ph_amp_noise = bool(abs(bias_ph_amp)
                               < max(3.0 * sem_ph_amp, 0.02))
        cal_ratio_ph, ok_sigma_ph = sigma_calibration(
            np.array([ph_out[:, 0].std(ddof=1)]),
            np.array([ph_out[:, 3].mean()]))
        gates.update(ph_fp=ok_ph_fp, ph_amp=ok_ph_amp, ph_off=ok_ph_off,
                     ph_noise=ok_ph_noise, ph_amp_noise=ok_ph_amp_noise,
                     ph_sigma=ok_sigma_ph)
        out["phase_curve_mode"] = {
            "n_mc": n_ph, "wallclock_s": round(wall_ph, 1),
            "fp_injected": fp_ph, "amp_injected": amp_ph,
            "offset_injected_rad": off_ph,
            "reduction": "DQ-aware CR repair + white extraction + "
                         "closed-form harmonic fit (fit_phase_curve)",
            "fp_noise_free": round(ref_ph[0], 7),
            "amp_noise_free": round(ref_ph[1], 4),
            "offset_noise_free_rad": round(ref_ph[2], 4),
            "fp_recovered_mean": round(float(ph_out[:, 0].mean()), 7),
            "amp_recovered_mean": round(float(ph_out[:, 1].mean()), 4),
            "fp_noise_bias": round(float(bias_ph), 7),
            "fp_reported_sigma_median": round(
                float(np.median(ph_out[:, 3])), 7),
            "fp_sigma_calibration_ratio": cal_ratio_ph[0],
            "fp_recovery_within_1e-3": ok_ph_fp,
            "amp_recovery_within_0.15": ok_ph_amp,
            "offset_recovery_within_0.15rad": ok_ph_off,
            "fp_noise_unbiased_within_3sem": ok_ph_noise,
            "amp_noise_unbiased_within_3sem": ok_ph_amp_noise,
            "fp_sigma_calibrated_0.7_1.5": ok_sigma_ph,
        }

    # --- G102 closed-loop ensemble (the second grism end to end) -------
    # Same visit shape and noise chain as the main ensemble, but the
    # blue grism's own synthetic calibration (trace/dispersion polys,
    # sensitivity, sky): proves depth recovery and sigma calibration are
    # not G141-specific. x_ref=20 keeps the G102 +1st order (columns
    # ~90-238 at 256^2) fully on the subarray.
    if want("g102_mode"):
        tables_g2 = synthetic_tables("G102", subarray=S, n_lambda=NL,
                                     samp_seq="SPARS25", nsamp=NSAMP)
        base_g2 = example_scene(NL, scan_speed=0.5)
        wl_g2 = np.asarray(tables_g2.wl_centers)
        rp_inj_g2 = 0.1595 + 0.003 * np.sin(8.0 * wl_g2)
        base_g2 = dataclasses.replace(
            base_g2, x_ref=jnp.float32(20.0), y_ref=jnp.float32(60.0),
            rp_over_rs=jnp.asarray(rp_inj_g2, jnp.float32),
            trends=dataclasses.replace(base_g2.trends,
                                       ssv_rw_amp=jnp.float32(0.005)))
        visit_g2 = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (N_EXP,) + x.shape),
            base_g2)
        visit_g2 = dataclasses.replace(
            visit_g2, exp_start_s=jnp.asarray(starts, jnp.float32))
        xw_g2 = (92, 236)

        def make_run_g2(local_cfg):
            @jax.jit
            def run(m):
                keys = jax.vmap(lambda e: jax.random.fold_in(
                    jax.random.fold_in(jax.random.PRNGKey(314), m), e)
                )(jnp.arange(N_EXP))
                scenes = dataclasses.replace(visit_g2, key=keys)

                def sim(s):
                    res = simulate_exposure(s, tables_g2, local_cfg)
                    reads = res.reads_dn
                    if local_cfg.noise.non_linearity:
                        from wayne_tpu.reduction import linearize_reads

                        reads = linearize_reads(
                            reads, tables_g2.nonlin_coeffs,
                            tables_g2.full_well_e, tables_g2.gain,
                            bias_e=(tables_g2.bias_map
                                    if local_cfg.noise.bias else None)
                        ) / tables_g2.gain
                    return reads, res.cr_pos, res.cr_count

                reads, cr_pos, cr_count = jax.lax.map(sim, scenes)
                good = None
                if local_cfg.noise.cosmic_rays:
                    good = jax.vmap(lambda p, c: ~cr_bad_diff_masks(
                        p, c, S))(cr_pos, cr_count)
                red = reduce_visit(reads, tables_g2.gain, mid,
                                   base_g2.orbit,
                                   y_window=y_window, x_window=xw_g2,
                                   bg_rows=bg_rows, n_chan=N_CHAN,
                                   good_diffs=good,
                                   quad_map=quadrant_map(
                                       S, tables_g2.subarray_corner))
                return divide_white_fit_depths(
                    red.white_lc, red.channel_lc, mid, base_g2.orbit,
                    base_g2.ld, jnp.float32(0.155),
                    return_components=True)

            return run

        run_g2 = make_run_g2(cfg)
        rp_g2_ref = np.asarray(make_run_g2(dataclasses.replace(
            cfg, noise=NoiseFlags.none()))(0)[0])
        n_g2 = max(args.n_mc, 8)
        t0 = time.time()
        g2_out = [run_g2(m) for m in range(n_g2)]
        wall_g2 = time.time() - t0
        rp_g2 = np.stack([np.asarray(o[0]) for o in g2_out])
        sig_g2 = np.stack([np.asarray(o[1]) for o in g2_out])
        sig_g2_rel = np.stack([np.asarray(o[2]) for o in g2_out])
        sig_g2_com = np.array([float(o[3]) for o in g2_out])
        bias_g2 = rp_g2.mean(axis=0) - rp_g2_ref
        sem_g2 = rp_g2.std(axis=0, ddof=1) / np.sqrt(n_g2)
        ok_g2_noise = bool(np.all(np.abs(bias_g2)
                                  < np.maximum(3.0 * sem_g2, 1e-4)))
        # injected per-channel truth (same convention as the G141
        # rp_true: unweighted mean of the injected bins per channel)
        tp_g2 = trace_params(tables_g2, base_g2.x_ref, base_g2.y_ref)
        xc_g2 = np.asarray(wl_to_x(tables_g2.wl_centers, tp_g2))
        edges_g2 = np.asarray(_ch_edges(xw_g2, N_CHAN))
        rp_true_g2 = np.array([
            rp_inj_g2[(xc_g2 >= lo) & (xc_g2 < hi)].mean()
            for lo, hi in zip(edges_g2[:-1], edges_g2[1:])])
        resid_g2 = rp_g2_ref - rp_true_g2
        ok_g2_sys = bool(np.all(np.abs(resid_g2) < 3e-3))
        cal_ratio_g2, ok_sigma_g2 = sigma_calibration(
            rp_g2.std(axis=0, ddof=1), sig_g2.mean(axis=0), lo=0.0)
        rel_ratio_g2 = pairwise_rel_ratio(rp_g2,
                                          sig_g2_rel.mean(axis=0))
        cal_rel_g2 = [round(float(v), 3) for v in rel_ratio_g2]
        ok_rel_g2 = bool(np.all((rel_ratio_g2 >= 0.7)
                                & (rel_ratio_g2 <= 1.5)))
        gates.update(g2_noise=ok_g2_noise, g2_sys=ok_g2_sys,
                     g2_sigma=ok_sigma_g2, g2_sigma_rel=ok_rel_g2)
        out["g102_mode"] = {
            "n_mc": n_g2, "wallclock_s": round(wall_g2, 1),
            "flags": "full noise chain incl. CR repair; G102 synthetic "
                     "calibration (own trace/dispersion/sensitivity/"
                     "sky), divide-white reduction",
            "rp_injected": [round(float(v), 6) for v in rp_true_g2],
            "rp_noise_free_recovery": [round(float(v), 6)
                                       for v in rp_g2_ref],
            "rp_recovered_mean": [round(float(v), 6)
                                  for v in rp_g2.mean(axis=0)],
            "noise_induced_bias": [round(float(v), 6) for v in bias_g2],
            "recovery_systematic": [round(float(v), 6)
                                    for v in resid_g2],
            "reported_sigma": [round(float(v), 6)
                               for v in sig_g2.mean(axis=0)],
            "reported_sigma_rel": [round(float(v), 6)
                                   for v in sig_g2_rel.mean(axis=0)],
            "reported_sigma_common": round(float(sig_g2_com.mean()), 6),
            "sigma_calibration_ratio": cal_ratio_g2,
            "sigma_rel_calibration_ratio": cal_rel_g2,
            "noise_unbiased_within_3sem": ok_g2_noise,
            "recovery_systematic_below_3e-3": ok_g2_sys,
            "sigma_not_overconfident_max_1.5": ok_sigma_g2,
            "sigma_rel_calibrated_0.7_1.5": ok_rel_g2,
        }

    # --- retrieval-mode ensemble: forward-model sigma calibration -------
    # Round-4 weak item 1: retrieve_transmission ships rp_sigma from the
    # LM curvature, and nothing had ever checked it against realised
    # scatter. N independent noisy visits (small 128^2 config — the
    # retrieval pays ~n_params tangents per forward pass), each fitted
    # THROUGH the simulator; per-channel scatter/reported-sigma gated
    # two-sided: the model IS the generator, so there is no unmodelled
    # residual power to hide behind.
    if (want("retrieval_mode") or want("program_mode")
            or want("spots_mode")):
        from wayne_tpu.ops.visit import simulate_visit
        from wayne_tpu.retrieval import (bin_channel_map,
                                         retrieve_transmission,
                                         retrieve_transmission_joint)

        S_R, NL_R, NSAMP_R, N_EXP_R, N_CHAN_R = 128, 64, 3, 18, 4
        XW_R = (72, 126)
        flags_r = dataclasses.replace(
            NoiseFlags.none(), poisson=True, read_noise=True, sky=True,
            dark=True)
        cfg_r = ExposureStatic(subarray=S_R, n_lambda=NL_R, n_sub=2,
                               nsamp=NSAMP_R, samp_seq="SPARS10",
                               scan=True, noise=flags_r, band_px=48)
        tables_r = synthetic_tables("G141", subarray=S_R, n_lambda=NL_R,
                                    samp_seq="SPARS10", nsamp=NSAMP_R)
        base_r = example_scene(NL_R, scan_speed=0.6)
        wl_r = np.asarray(tables_r.wl_centers)
        rp_inj_r = 0.1595 + 0.004 * np.sin(9.0 * wl_r)
        base_r = dataclasses.replace(
            base_r, x_ref=jnp.float32(30.0), y_ref=jnp.float32(30.0),
            rp_over_rs=jnp.asarray(rp_inj_r, jnp.float32))
        starts_r = np.linspace(0.0, 4.0 * 3600.0, N_EXP_R)
        visit_r = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (N_EXP_R,) + x.shape),
            base_r)
        visit_r = dataclasses.replace(
            visit_r, exp_start_s=jnp.asarray(starts_r, jnp.float32))

        def scenes_r_for(m, seed=4242, t0_shift_s=0.0):
            keys = jax.vmap(lambda e: jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(seed), m), e)
            )(jnp.arange(N_EXP_R))
            sc = dataclasses.replace(visit_r, key=keys)
            if t0_shift_s:
                orb = dataclasses.replace(
                    sc.orbit, t0_s=sc.orbit.t0_s + t0_shift_s)
                sc = dataclasses.replace(sc, orbit=orb)
            return sc

        @jax.jit
        def observe_r(scenes):
            res = simulate_visit(scenes, tables_r, cfg_r, chunk=6)
            net = res.reads_dn[:, -1] - res.reads_dn[:, 0]
            return net.sum(axis=1)                   # (n_exp, S)

        # The reference data MUST be the DETERMINISTIC TWIN of the
        # noisy config (sampling off, sky/dark background KEPT —
        # retrieval.deterministic_cfg), not NoiseFlags.none(): sky+dark
        # add ~1% chromatic mean flux, so none() is a DIFFERENT scene
        # whose fit is biased ~1e-3 in the bluest channel against the
        # noisy ensemble's mean (measured: E[noisy channel sums] sit
        # 0.8-1.5% above the none() frames, exactly the background).
        from wayne_tpu.retrieval import deterministic_cfg as _det_cfg

        cfg_r0 = _det_cfg(cfg_r)

        @jax.jit
        def observe_r0(scenes):
            res = simulate_visit(scenes, tables_r, cfg_r0, chunk=6)
            net = res.reads_dn[:, -1] - res.reads_dn[:, 0]
            return net.sum(axis=1)

        # injected per-channel truth (bin means of the wiggly spectrum)
        idx_r, in_win_r = bin_channel_map(visit_r, tables_r, XW_R,
                                          N_CHAN_R)
        rp_true_r = np.array([
            rp_inj_r[in_win_r & (idx_r == c)].mean()
            for c in range(N_CHAN_R)])

    if want("retrieval_mode"):
        # Deterministic reference: the same noise-free data, retrieved
        # identically. The data (simulate_visit) and the model
        # (forward_spectra) are DIFFERENT XLA programs computing the
        # same math — on TPU their bf16/fusion rounding differs, so the
        # noise-free recovery carries a small deterministic offset vs
        # the analytic truth (measured ~1e-3 in the lowest-flux
        # channel on hardware, <4e-4 on CPU) that is NOT a noise bias.
        # Same pattern as the main ensemble's rp_noise_free_recovery.
        n_ret = max(args.n_mc, 8)
        t0 = time.time()
        sc_nf = scenes_r_for(0)
        res_nf = retrieve_transmission(
            observe_r0(sc_nf), sc_nf, tables_r, cfg_r, x_window=XW_R,
            n_chan=N_CHAN_R, rp_init=0.15, chunk=6, n_lm=8,
            sigma=np.full(N_CHAN_R, 1e-4))
        rp_ref_ret = res_nf.rp
        env_ret = np.abs(rp_ref_ret - rp_true_r)
        ok_ret_env = bool(env_ret.max() < 1.5e-3)
        rp_rets, sig_rets, ok_flags_ret = [], [], []
        for m in range(n_ret):
            sc = scenes_r_for(m)
            obs_sp = observe_r(sc)
            res = retrieve_transmission(
                obs_sp, sc, tables_r, cfg_r, x_window=XW_R,
                n_chan=N_CHAN_R, rp_init=0.15, chunk=6, n_lm=8)
            rp_rets.append(res.rp)
            sig_rets.append(res.rp_sigma)
            ok_flags_ret.append(res.constrained)
            print(f"retrieval {m + 1}/{n_ret}", file=sys.stderr,
                  flush=True)
        wall_ret = time.time() - t0
        rp_rets = np.stack(rp_rets)
        sig_rets = np.stack(sig_rets)
        bias_ret = rp_rets.mean(axis=0) - rp_ref_ret
        sem_ret = rp_rets.std(axis=0, ddof=1) / np.sqrt(n_ret)
        ok_ret_bias = bool(np.all(np.abs(bias_ret)
                                  < np.maximum(3.0 * sem_ret, 1e-4)))
        cal_ratio_ret, ok_sigma_ret = sigma_calibration(
            rp_rets.std(axis=0, ddof=1), sig_rets.mean(axis=0))
        cov_ret = float(np.mean(
            np.abs(rp_rets - rp_ref_ret[None, :]) < sig_rets))
        ok_flag_ret = bool(np.all(ok_flags_ret))
        gates.update(ret_bias=ok_ret_bias, ret_env=ok_ret_env,
                     ret_sigma=ok_sigma_ret, ret_flags=ok_flag_ret)
        out["retrieval_mode"] = {
            "n_mc": n_ret, "wallclock_s": round(wall_ret, 1),
            "n_exp": N_EXP_R, "n_chan": N_CHAN_R,
            "flags": "poisson+read+sky+dark",
            "method": "retrieve_transmission (LM through the full "
                      "forward model, curvature sigma)",
            "rp_injected": [round(float(v), 6) for v in rp_true_r],
            "rp_noise_free_recovery": [round(float(v), 6)
                                       for v in rp_ref_ret],
            "deterministic_envelope_note":
                "noise-free recovery vs analytic truth bounds the "
                "data-program-vs-model-program XLA rounding difference "
                "(bf16/fusion-order on TPU); noise bias gates against "
                "the noise-free recovery, the envelope separately",
            "rp_recovered_mean": [round(float(v), 6)
                                  for v in rp_rets.mean(axis=0)],
            "noise_induced_bias": [round(float(v), 6) for v in bias_ret],
            "deterministic_envelope": [round(float(v), 6)
                                       for v in env_ret],
            "rp_scatter": [round(float(v), 6)
                           for v in rp_rets.std(axis=0, ddof=1)],
            "reported_sigma": [round(float(v), 6)
                               for v in sig_rets.mean(axis=0)],
            "sigma_calibration_ratio": cal_ratio_ret,
            "sigma_coverage_1sigma": round(cov_ret, 3),
            "noise_unbiased_within_3sem": ok_ret_bias,
            "deterministic_envelope_below_1.5e-3": ok_ret_env,
            "sigma_calibrated_0.7_1.5": ok_sigma_ret,
            "all_channels_constrained": ok_flag_ret,
        }

    # --- program-mode ensemble: TTV + combined-spectrum calibration ----
    # Round-4 weak item 1(b): the joint multi-visit retrieval ships
    # t0_offsets_sigma_s (the TTV error bar) and the program-level
    # combined spectrum ships rp_sigma + repeatability chi2 — none
    # ensemble-validated. N realisations of a 2-visit program whose
    # TRUE ephemeris walks 180 s/visit while the model assumes the
    # stale one: gate (a) the joint fit recovers [0, 180] s, (b)
    # scatter/sigma two-sided for the t0 offsets AND the shared
    # spectrum, (c) the inverse-variance combined spectrum of per-visit
    # fits is sigma-calibrated with repeatability chi2/dof ~ 1.
    if want("program_mode"):
        drift_s = 180.0
        n_prog = max(args.n_mc, 8)
        t0 = time.time()
        # noise-free joint reference (same deterministic
        # data-program-vs-model-program envelope as retrieval_mode)
        sc_a0 = scenes_r_for(0, seed=9100)
        sc_b0t = scenes_r_for(0, seed=9200, t0_shift_s=drift_s)
        joint_ref = retrieve_transmission_joint(
            [observe_r0(sc_a0), observe_r0(sc_b0t)],
            [sc_a0, scenes_r_for(0, seed=9200)], tables_r, cfg_r,
            x_window=XW_R, n_chan=N_CHAN_R, rp_init=0.15,
            fit_t0=True, t0_window_s=600.0, chunk=6, n_lm=8)
        rp_ref_joint = joint_ref.rp
        t0_ref_joint = joint_ref.t0_offsets_s
        env_joint = np.abs(rp_ref_joint - rp_true_r)
        ok_prog_env = bool(
            env_joint.max() < 1.5e-3
            and abs(t0_ref_joint[0]) < 10.0
            and abs(t0_ref_joint[1] - drift_s) < 10.0)
        t0_fits, t0_sigs, rp_joints, sig_joints = [], [], [], []
        rp_comb_all, sig_comb_all, chi2_rep_all = [], [], []
        for m in range(n_prog):
            # visit A at the assumed ephemeris, visit B walked +180 s
            # (different noise seeds per visit)
            sc_a = scenes_r_for(m, seed=9100)
            sc_b_true = scenes_r_for(m, seed=9200, t0_shift_s=drift_s)
            sp_a = observe_r(sc_a)
            sp_b = observe_r(sc_b_true)
            # the MODEL scenes assume the stale ephemeris for both
            sc_b_model = scenes_r_for(m, seed=9200)
            joint = retrieve_transmission_joint(
                [sp_a, sp_b], [sc_a, sc_b_model], tables_r, cfg_r,
                x_window=XW_R, n_chan=N_CHAN_R, rp_init=0.15,
                fit_t0=True, t0_window_s=600.0, chunk=6, n_lm=8)
            t0_fits.append(joint.t0_offsets_s)
            t0_sigs.append(joint.t0_offsets_sigma_s)
            rp_joints.append(joint.rp)
            sig_joints.append(joint.rp_sigma)
            # per-visit single-visit fits at each visit's TRUE
            # ephemeris -> program-level combined spectrum exactly as
            # tools/program_ephemeris.py publishes it
            rp_v, sig_v = [], []
            for sp, sc in ((sp_a, sc_a), (sp_b, sc_b_true)):
                r = retrieve_transmission(
                    sp, sc, tables_r, cfg_r, x_window=XW_R,
                    n_chan=N_CHAN_R, rp_init=0.15, chunk=6, n_lm=8)
                rp_v.append(r.rp)
                sig_v.append(r.rp_sigma)
            rp_v = np.stack(rp_v)
            sig_v = np.maximum(np.stack(sig_v), 1e-12)
            w = 1.0 / sig_v**2
            rp_c = (w * rp_v).sum(axis=0) / w.sum(axis=0)
            rp_comb_all.append(rp_c)
            sig_comb_all.append(1.0 / np.sqrt(w.sum(axis=0)))
            chi2_rep_all.append(
                (((rp_v - rp_c[None, :]) / sig_v) ** 2).sum(axis=0))
            print(f"program {m + 1}/{n_prog}", file=sys.stderr,
                  flush=True)
        wall_prog = time.time() - t0
        t0_fits = np.stack(t0_fits)          # (N, 2)
        t0_sigs = np.stack(t0_sigs)
        rp_joints = np.stack(rp_joints)
        sig_joints = np.stack(sig_joints)
        rp_comb_all = np.stack(rp_comb_all)
        sig_comb_all = np.stack(sig_comb_all)
        chi2_rep_all = np.stack(chi2_rep_all)   # dof = n_vis - 1 = 1

        # (a) the TTV measurement recovers the injected walk (against
        # the noise-free joint reference, which carries the
        # deterministic program-difference envelope, gated above)
        t0_mean = t0_fits.mean(axis=0)
        t0_sem = t0_fits.std(axis=0, ddof=1) / np.sqrt(n_prog)
        ok_ttv_bias = bool(
            abs(t0_mean[0] - t0_ref_joint[0]) < max(3.0 * t0_sem[0], 5.0)
            and abs(t0_mean[1] - t0_ref_joint[1])
            < max(3.0 * t0_sem[1], 5.0))
        # (b) TTV error bar + shared-spectrum sigma calibration
        cal_ttv, ok_ttv_sigma = sigma_calibration(
            t0_fits.std(axis=0, ddof=1), t0_sigs.mean(axis=0))
        cal_joint, ok_joint_sigma = sigma_calibration(
            rp_joints.std(axis=0, ddof=1), sig_joints.mean(axis=0))
        bias_joint = rp_joints.mean(axis=0) - rp_ref_joint
        sem_joint = rp_joints.std(axis=0, ddof=1) / np.sqrt(n_prog)
        ok_joint_bias = bool(np.all(np.abs(bias_joint)
                                    < np.maximum(3.0 * sem_joint, 1e-4)))
        # (c) combined-spectrum sigma + repeatability chi2 distribution
        cal_comb, ok_comb_sigma = sigma_calibration(
            rp_comb_all.std(axis=0, ddof=1), sig_comb_all.mean(axis=0))
        chi2_rep_mean = float(chi2_rep_all.mean())   # E[chi2_1] = 1
        # SE of the mean of N*n_chan chi2_1 draws is sqrt(2/(N*n_chan))
        se_rep = float(np.sqrt(2.0 / chi2_rep_all.size))
        ok_rep = bool(abs(chi2_rep_mean - 1.0) < 4.0 * se_rep)
        gates.update(prog_env=ok_prog_env,
                     prog_ttv_bias=ok_ttv_bias,
                     prog_ttv_sigma=ok_ttv_sigma,
                     prog_joint_sigma=ok_joint_sigma,
                     prog_joint_bias=ok_joint_bias,
                     prog_comb_sigma=ok_comb_sigma,
                     prog_repeatability=ok_rep)
        out["program_mode"] = {
            "n_mc": n_prog, "wallclock_s": round(wall_prog, 1),
            "n_visits": 2, "t0_drift_injected_s": drift_s,
            "flags": "poisson+read+sky+dark",
            "method": "retrieve_transmission_joint (shared spectrum + "
                      "per-visit dt0) + inverse-variance combined "
                      "spectrum of per-visit retrievals "
                      "(tools/program_ephemeris.py convention)",
            "rp_noise_free_recovery": [round(float(v), 6)
                                       for v in rp_ref_joint],
            "t0_noise_free_recovery_s": [round(float(v), 2)
                                         for v in t0_ref_joint],
            "deterministic_envelope": [round(float(v), 6)
                                       for v in env_joint],
            "deterministic_envelope_ok": ok_prog_env,
            "t0_offsets_recovered_mean_s": [round(float(v), 2)
                                            for v in t0_mean],
            "t0_offsets_scatter_s": [round(float(v), 2) for v in
                                     t0_fits.std(axis=0, ddof=1)],
            "t0_offsets_reported_sigma_s": [round(float(v), 2) for v in
                                            t0_sigs.mean(axis=0)],
            "t0_sigma_calibration_ratio": cal_ttv,
            "joint_rp_recovered_mean": [round(float(v), 6) for v in
                                        rp_joints.mean(axis=0)],
            "joint_rp_scatter": [round(float(v), 6) for v in
                                 rp_joints.std(axis=0, ddof=1)],
            "joint_reported_sigma": [round(float(v), 6) for v in
                                     sig_joints.mean(axis=0)],
            "joint_sigma_calibration_ratio": cal_joint,
            "combined_rp_scatter": [round(float(v), 6) for v in
                                    rp_comb_all.std(axis=0, ddof=1)],
            "combined_reported_sigma": [round(float(v), 6) for v in
                                        sig_comb_all.mean(axis=0)],
            "combined_sigma_calibration_ratio": cal_comb,
            "repeatability_chi2_per_dof_mean": round(chi2_rep_mean, 3),
            "ttv_recovers_injected_walk": ok_ttv_bias,
            "ttv_sigma_calibrated_0.7_1.5": ok_ttv_sigma,
            "joint_rp_unbiased": ok_joint_bias,
            "joint_sigma_calibrated_0.7_1.5": ok_joint_sigma,
            "combined_sigma_calibrated_0.7_1.5": ok_comb_sigma,
            "repeatability_chi2_consistent": ok_rep,
        }

    # --- active-star (spots) ensemble ----------------------------------
    # Round-4 item 4: spots were unit-tested but no ensemble proved the
    # advertised science loop. A spotted ROTATING star (one spot ON the
    # transit chord -> crossing bump, one unocculted -> chromatic
    # dilution) through the full noise chain: (a) a spot-UNAWARE
    # analysis of the noise-free frames shows a MATERIAL false
    # transmission signature (or this section gates nothing), (b) the
    # spot-AWARE retrieval with the deficit scale FITTED from a
    # spot-blind start (fit_spots) recovers depths unbiased and
    # s ~ 1, sigma-calibrated for both.
    if want("spots_mode"):
        from wayne_tpu.ops.spots import SpotParams

        b_imp = 4.855 * np.cos(np.deg2rad(82.1))
        contrast_sp = np.stack(
            [0.4 + 0.2 * (wl_r - wl_r.min()) / np.ptp(wl_r),
             np.full(NL_R, 0.6)]).astype(np.float32)
        spots_r = SpotParams.create(
            [float(np.arcsin(b_imp)), -0.5], [0.0, 0.4], [0.22, 0.12],
            contrast_sp, rot_omega=2.0 * np.pi / (10.0 * 86400.0))
        spots_b = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (N_EXP_R,) + x.shape),
            spots_r)

        def scenes_sp_for(m):
            return dataclasses.replace(scenes_r_for(m, seed=7300),
                                       spots=spots_b)

        @jax.jit
        def observe_sp0(scenes):
            # deterministic twin (background kept) — see observe_r0
            res = simulate_visit(scenes, tables_r, cfg_r0, chunk=6)
            net = res.reads_dn[:, -1] - res.reads_dn[:, 0]
            return net.sum(axis=1)

        t0 = time.time()
        sc0 = scenes_sp_for(0)
        obs0 = observe_sp0(sc0)
        kw0 = dict(x_window=XW_R, n_chan=N_CHAN_R, rp_init=0.15,
                   chunk=6, n_lm=10, sigma=np.full(N_CHAN_R, 1e-4))
        blind = retrieve_transmission(
            obs0, dataclasses.replace(sc0, spots=None), tables_r,
            cfg_r, **kw0)
        aware0 = retrieve_transmission(obs0, sc0, tables_r, cfg_r,
                                       **kw0)
        bias_blind = blind.rp - rp_true_r
        aware_err = float(np.abs(aware0.rp - rp_true_r).max())
        ok_sp_material = bool(
            np.abs(bias_blind).max() > 1e-3
            and np.abs(bias_blind).max() > 5.0 * max(aware_err, 1e-5))
        slope_blind = float(np.polyfit(np.arange(N_CHAN_R),
                                       bias_blind, 1)[0])

        n_sp = max(args.n_mc, 8)
        rp_sps, sig_sps, s_sps, ssig_sps = [], [], [], []
        for m in range(n_sp):
            sc = scenes_sp_for(m)
            obs_sp = observe_r(sc)
            res = retrieve_transmission(
                obs_sp, sc, tables_r, cfg_r, x_window=XW_R,
                n_chan=N_CHAN_R, rp_init=0.15, fit_spots=True,
                chunk=6, n_lm=10)
            rp_sps.append(res.rp)
            sig_sps.append(res.rp_sigma)
            s_sps.append(res.spot_scale)
            ssig_sps.append(res.spot_scale_sigma)
            print(f"spots {m + 1}/{n_sp}", file=sys.stderr, flush=True)
        wall_sp = time.time() - t0
        rp_sps = np.stack(rp_sps)
        sig_sps = np.stack(sig_sps)
        s_sps = np.array(s_sps)
        ssig_sps = np.array(ssig_sps)
        bias_sp = rp_sps.mean(axis=0) - rp_true_r
        sem_sp = rp_sps.std(axis=0, ddof=1) / np.sqrt(n_sp)
        ok_sp_bias = bool(np.all(np.abs(bias_sp)
                                 < np.maximum(3.0 * sem_sp, 4e-4)))
        cal_sp, ok_sp_sigma = sigma_calibration(
            rp_sps.std(axis=0, ddof=1), sig_sps.mean(axis=0))
        s_sem = s_sps.std(ddof=1) / np.sqrt(n_sp)
        ok_sp_scale = bool(abs(s_sps.mean() - 1.0)
                           < max(3.0 * s_sem, 0.02))
        ratio_s = float(s_sps.std(ddof=1)
                        / max(ssig_sps.mean(), 1e-12))
        ok_sp_scale_sigma = bool(0.7 <= ratio_s <= 1.5)
        gates.update(sp_material=ok_sp_material, sp_bias=ok_sp_bias,
                     sp_sigma=ok_sp_sigma, sp_scale=ok_sp_scale,
                     sp_scale_sigma=ok_sp_scale_sigma)
        out["spots_mode"] = {
            "n_mc": n_sp, "wallclock_s": round(wall_sp, 1),
            "flags": "poisson+read+sky+dark",
            "scene": "rotating star (P_rot = 10 d), one spot on the "
                     "transit chord (crossing bump) + one unocculted "
                     "(chromatic dilution), contrast 0.4-0.6",
            "method": "spot-blind analysis for materiality; "
                      "retrieve_transmission(fit_spots=True) for "
                      "recovery — deficit scale fitted from s = 0",
            "spot_unaware_bias": [round(float(v), 6)
                                  for v in bias_blind],
            "spot_unaware_false_slope_per_chan": round(slope_blind, 6),
            "spot_aware_noise_free_err_max": round(aware_err, 6),
            "rp_recovered_mean": [round(float(v), 6)
                                  for v in rp_sps.mean(axis=0)],
            "recovery_bias": [round(float(v), 6) for v in bias_sp],
            "rp_scatter": [round(float(v), 6)
                           for v in rp_sps.std(axis=0, ddof=1)],
            "reported_sigma": [round(float(v), 6)
                               for v in sig_sps.mean(axis=0)],
            "sigma_calibration_ratio": cal_sp,
            "spot_scale_recovered_mean": round(float(s_sps.mean()), 4),
            "spot_scale_scatter": round(float(s_sps.std(ddof=1)), 4),
            "spot_scale_reported_sigma": round(float(ssig_sps.mean()),
                                               4),
            "spot_scale_sigma_ratio": round(ratio_s, 3),
            "unaware_bias_material": ok_sp_material,
            "aware_recovery_unbiased": ok_sp_bias,
            "sigma_calibrated_0.7_1.5": ok_sp_sigma,
            "spot_scale_recovers_1": ok_sp_scale,
            "spot_scale_sigma_calibrated_0.7_1.5": ok_sp_scale_sigma,
        }

    ok = all(gates.values())
    failed = sorted(k for k, v in gates.items() if not v)
    path = os.path.join(REPO, "VALIDATION.json")
    if selected != set(ALL_SECTIONS) and os.path.exists(path):
        # partial run: merge into the existing artifact so untouched
        # sections keep their last full-run results
        existing = json.load(open(path))
        existing.update(out)
        out = existing
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))
    if failed:
        print(f"FAILED gates: {failed}", file=sys.stderr)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
