"""Error-bar calibration of the depth fitters at unit scale.

The ensemble gates in tools/validate_recovery.py hold
scatter/reported-sigma per channel through the full instrument model;
these tests hold the ESTIMATORS themselves on controlled white-noise
Monte Carlos, so a regression in the sigma formulas (not the physics)
fails fast on CPU.

Reference behaviour being modelled: the paper's "recover the injected
spectrum within error bars" validation (SURVEY.md section 4) — which is
only meaningful if the error bars are themselves calibrated.

Key effect under test: channel curves are normalised to their own noisy
out-of-transit mean before fitting, and fit_depths' transit model has
no free flux scale — so the baseline-normalisation error maps straight
into depth error. fit_depths(baseline_var=True) adds the delta-method
term for it; without it the true scatter exceeds the curvature sigma by
~sqrt(1 + N_in_eff/N_oot) (measured 1.19x for the standard 48-exposure
visit used here).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wayne_tpu.calibration import synthetic_tables
from wayne_tpu.ops.transit import projected_separation, transit_depth_curve
from wayne_tpu.reduction import (fit_depths, fit_eclipse_depths,
                                 out_of_transit_mask)
from wayne_tpu.scene import example_scene

N_EXP, N_CHAN, N_MC = 48, 8, 400
SIG_PT = 4e-4
RP_TRUE = 0.16


@pytest.fixture(scope="module")
def visit_model():
    tables = synthetic_tables("G141", subarray=256, n_lambda=64,
                              samp_seq="SPARS25", nsamp=5)
    base = example_scene(64, scan_speed=0.5)
    starts = np.linspace(0.0, 4.0 * 3600.0, N_EXP)
    mid = jnp.asarray(starts + float(tables.read_times[-1]) / 2.0,
                      jnp.float32)
    oot = np.asarray(out_of_transit_mask(mid, base.orbit)).astype(bool)
    z, in_front = projected_separation(mid, base.orbit)
    f = transit_depth_curve(z, jnp.float32(RP_TRUE), base.ld, 32)
    model = np.asarray(1.0 - (1.0 - f) * in_front, np.float64)
    return base, mid, oot, model


def _mc_curves(model, oot, normalise):
    rng = np.random.default_rng(7)
    lc = model[None, :, None] + SIG_PT * rng.standard_normal(
        (N_MC, N_EXP, N_CHAN))
    if normalise:
        lc = lc / lc[:, oot, :].mean(axis=1, keepdims=True)
    return jnp.asarray(lc, jnp.float32)


@pytest.mark.slow
def test_fit_depths_sigma_calibrated_on_normalised_curves(visit_model):
    """The production path: curves OOT-normalised, baseline_var on
    (red_noise off — the noise here IS white, so the exact-calibration
    assertion must not carry the deliberately-conservative beta floor).

    scatter/reported-sigma must sit at ~1 (SE of the mean ratio over
    8 x 400 fits is ~1.3%; the bounds leave ~6x that)."""
    base, mid, oot, model = visit_model
    lc = _mc_curves(model, oot, normalise=True)
    fit = jax.jit(jax.vmap(lambda c: fit_depths(
        c, mid, base.orbit, base.ld, jnp.float32(0.155),
        red_noise=False)))
    rp, sig = (np.asarray(a) for a in fit(lc))
    ratio = rp.std(axis=0, ddof=1) / sig.mean(axis=0)
    assert 0.92 < ratio.mean() < 1.10, ratio
    # every channel individually within MC fluctuation bounds
    assert np.all((ratio > 0.85) & (ratio < 1.18)), ratio
    # and the recovered depths are unbiased
    assert abs(rp.mean() - RP_TRUE) < 3.0 * SIG_PT


@pytest.mark.slow
def test_fit_depths_sigma_calibrated_without_normalisation(visit_model):
    """Independent-noise case: baseline_var=False is exact."""
    base, mid, oot, model = visit_model
    lc = _mc_curves(model, oot, normalise=False)
    fit = jax.jit(jax.vmap(lambda c: fit_depths(
        c, mid, base.orbit, base.ld, jnp.float32(0.155),
        baseline_var=False, red_noise=False)))
    rp, sig = (np.asarray(a) for a in fit(lc))
    ratio = rp.std(axis=0, ddof=1) / sig.mean(axis=0)
    assert 0.92 < ratio.mean() < 1.10, ratio


@pytest.mark.slow
def test_baseline_var_term_is_material(visit_model):
    """Dropping the normalisation term under-reports sigma by >10% —
    i.e. the term is load-bearing, not cosmetic — and the TRUE scatter
    of the normalised fit matches the corrected sigma, not the bare
    curvature one."""
    base, mid, oot, model = visit_model
    lc = _mc_curves(model, oot, normalise=True)
    fit_on = jax.jit(jax.vmap(lambda c: fit_depths(
        c, mid, base.orbit, base.ld, jnp.float32(0.155),
        red_noise=False)))
    fit_off = jax.jit(jax.vmap(lambda c: fit_depths(
        c, mid, base.orbit, base.ld, jnp.float32(0.155),
        baseline_var=False, red_noise=False)))
    rp, sig_on = (np.asarray(a) for a in fit_on(lc))
    _, sig_off = (np.asarray(a) for a in fit_off(lc))
    assert sig_on.mean() > 1.10 * sig_off.mean()
    ratio_off = rp.std(axis=0, ddof=1).mean() / sig_off.mean()
    assert ratio_off > 1.12          # bare curvature is optimistic ...
    ratio_on = rp.std(axis=0, ddof=1).mean() / sig_on.mean()
    assert 0.92 < ratio_on < 1.10    # ... corrected sigma is calibrated


@pytest.mark.slow
def test_red_noise_beta_catches_correlated_noise(visit_model):
    """The Pont+2006 beta scaling (red_noise=True, the default):

    - pure white noise: beta's max(1, .)-floor costs < ~20% mean
      inflation (ratio stays >= 0.8);
    - white + random-walk drift (the amplifier bias_drift class that
      measured 2.6x under-reporting in the staring ensemble): the bare
      sigma under-reports the realised scatter by > 1.5x, the
      beta-scaled sigma keeps the ratio at or below ~1.5 and never
      below what the bare sigma claims.
    """
    base, mid, oot, model = visit_model
    # white-noise cost of the floor
    lc_w = _mc_curves(model, oot, normalise=True)
    fit_beta = jax.jit(jax.vmap(lambda c: fit_depths(
        c, mid, base.orbit, base.ld, jnp.float32(0.155))))
    rp_w, sig_w = (np.asarray(a) for a in fit_beta(lc_w))
    ratio_w = rp_w.std(axis=0, ddof=1).mean() / sig_w.mean()
    assert 0.78 < ratio_w <= 1.05, ratio_w

    # random-walk red noise on top of white
    rng = np.random.default_rng(23)
    walk = np.cumsum(0.5 * SIG_PT * rng.standard_normal(
        (N_MC, N_EXP, N_CHAN)), axis=1)
    lc = (model[None, :, None]
          + SIG_PT * rng.standard_normal((N_MC, N_EXP, N_CHAN)) + walk)
    lc = lc / lc[:, oot, :].mean(axis=1, keepdims=True)
    lc = jnp.asarray(lc, jnp.float32)
    fit_bare = jax.jit(jax.vmap(lambda c: fit_depths(
        c, mid, base.orbit, base.ld, jnp.float32(0.155),
        red_noise=False)))
    rp, sig_beta = (np.asarray(a) for a in fit_beta(lc))
    _, sig_bare = (np.asarray(a) for a in fit_bare(lc))
    scatter = rp.std(axis=0, ddof=1).mean()
    assert scatter / sig_bare.mean() > 1.5      # bare sigma overconfident
    assert scatter / sig_beta.mean() < 1.5      # beta restores safety
    assert sig_beta.mean() > 1.4 * sig_bare.mean()


@pytest.mark.slow
def test_divide_white_common_mode_sigma(visit_model):
    """Divide-white must propagate the white fit's depth sigma.

    Channels carry independent noise PLUS a common per-exposure offset
    (the amplifier bias-drift class: quadrant-wide, so nearly identical
    across channels and NOT averaged down in the white curve). The
    divide-white step removes the common noise from every channel's
    residuals — but its projection onto the transit-depth direction has
    already been absorbed by the white fit, and dividing by the fitted
    template hands that depth error to every channel coherently. The
    naive per-channel sigma is therefore overconfident by construction;
    divide_white_fit_depths adds the white sigma in quadrature and is
    calibrated. (Measured in the staring ensemble: ratios 2.2-2.5
    naive, ~1 fixed; tools/validate_recovery.py.)"""
    from wayne_tpu.reduction import (common_mode_correct,
                                     divide_white_fit_depths)

    base, mid, oot, model = visit_model
    rng = np.random.default_rng(31)
    common = 2.0 * SIG_PT * rng.standard_normal((N_MC, N_EXP, 1))
    lc = (model[None, :, None] + common
          + SIG_PT * rng.standard_normal((N_MC, N_EXP, N_CHAN)))
    white = lc.mean(axis=2)
    white = white / white[:, oot].mean(axis=1, keepdims=True)
    lc = lc / lc[:, oot, :].mean(axis=1, keepdims=True)
    white = jnp.asarray(white, jnp.float32)
    lc = jnp.asarray(lc, jnp.float32)

    naive = jax.jit(jax.vmap(lambda w, c: fit_depths(
        common_mode_correct(w, c, mid, base.orbit, base.ld,
                            jnp.float32(0.155)),
        mid, base.orbit, base.ld, jnp.float32(0.155))))
    fixed = jax.jit(jax.vmap(lambda w, c: divide_white_fit_depths(
        w, c, mid, base.orbit, base.ld, jnp.float32(0.155))))
    rp_n, sig_n = (np.asarray(a) for a in naive(white, lc))
    rp_f, sig_f = (np.asarray(a) for a in fixed(white, lc))
    # same depths either way; only the sigma accounting differs
    np.testing.assert_allclose(rp_n, rp_f, atol=1e-6)
    ratio_n = rp_n.std(axis=0, ddof=1).mean() / sig_n.mean()
    ratio_f = rp_f.std(axis=0, ddof=1).mean() / sig_f.mean()
    assert ratio_n > 1.4, ratio_n       # naive: overconfident
    assert 0.80 < ratio_f < 1.15, ratio_f   # quadrature: calibrated
    # the common-mode errors really are coherent across channels
    err = rp_f - rp_f.mean(axis=0, keepdims=True)
    C = np.corrcoef(err.T)
    mean_corr = (C.sum() - np.trace(C)) / (N_CHAN * (N_CHAN - 1))
    assert mean_corr > 0.4, mean_corr


def test_eclipse_sigma_calibrated(visit_model):
    """fit_eclipse_depths' linear model has a free baseline c, so its
    sigma is calibrated on normalised curves with no extra term."""
    base, mid, oot, model = visit_model
    period_s = float(np.asarray(base.orbit.period_s))
    t0_s = float(np.asarray(base.orbit.t0_s))
    starts = (t0_s + period_s / 2.0
              + np.linspace(-2.0 * 3600.0, 2.0 * 3600.0, N_EXP))
    mid_ecl = jnp.asarray(starts, jnp.float32)
    from wayne_tpu.ops.transit import eclipse_visibility
    z, in_front = projected_separation(mid_ecl, base.orbit)
    vis = np.asarray(eclipse_visibility(z, in_front, jnp.float32(0.16)))
    fp_true = 1.5e-3
    model_ecl = 1.0 + fp_true * vis
    rng = np.random.default_rng(11)
    lc = model_ecl[None, :, None] + SIG_PT * rng.standard_normal(
        (N_MC, N_EXP, N_CHAN))
    lc = lc / lc.mean(axis=1, keepdims=True)
    fit = jax.jit(jax.vmap(lambda c: fit_eclipse_depths(
        c, mid_ecl, base.orbit, jnp.float32(0.16))))
    fp, sig = (np.asarray(a) for a in fit(jnp.asarray(lc, jnp.float32)))
    ratio = fp.std(axis=0, ddof=1) / sig.mean(axis=0)
    assert 0.90 < ratio.mean() < 1.12, ratio
    assert abs(fp.mean() - fp_true) < 1e-4


def test_constrained_mask_flags_dead_channels():
    """The productised 'unconstrained' criterion: huge sigma, clip-
    pinned depth or non-finite values flag False; healthy WFC3-scale
    fits flag True (reduction.constrained_mask)."""
    from wayne_tpu.reduction import constrained_mask

    rp = np.array([0.16, 0.1357, 0.01, 0.5, np.nan, 0.16])
    sig = np.array([4e-4, 3.2e8, 2e-4, 2e-4, 1e-4, np.inf])
    ok = np.asarray(constrained_mask(rp, sig))
    np.testing.assert_array_equal(
        ok, [True, False, False, False, False, False])
    # unclipped linear fitters (eclipse Fp/Fs): bounds off, tighter floor
    fp = np.array([1.5e-3, -0.01, 2e-3])
    fps = np.array([1e-4, 5e-2, 1e-4])
    ok_e = np.asarray(constrained_mask(fp, fps, sigma_floor=0.02,
                                       bounds=None))
    np.testing.assert_array_equal(ok_e, [True, False, True])


@pytest.mark.slow
def test_divide_white_sigma_decomposition(visit_model):
    """return_components splits the quadrature total into the
    channel-to-channel SHAPE term and the coherent common-mode term,
    and EACH part is calibrated against what it claims to measure:
    relative scatter (per-realisation channel mean removed) against
    sigma_rel, common-mode scatter (the channel-mean deviations)
    against sigma_common. This is the decomposition VERDICT round 4
    flagged: gating only the total made relative error bars ~5-7x
    conservative."""
    from wayne_tpu.reduction import divide_white_fit_depths

    base, mid, oot, model = visit_model
    rng = np.random.default_rng(31)
    common = 2.0 * SIG_PT * rng.standard_normal((N_MC, N_EXP, 1))
    lc = (model[None, :, None] + common
          + SIG_PT * rng.standard_normal((N_MC, N_EXP, N_CHAN)))
    white = lc.mean(axis=2)
    white = white / white[:, oot].mean(axis=1, keepdims=True)
    lc = lc / lc[:, oot, :].mean(axis=1, keepdims=True)
    fit = jax.jit(jax.vmap(lambda w, c: divide_white_fit_depths(
        w, c, mid, base.orbit, base.ld, jnp.float32(0.155),
        return_components=True)))
    rp, tot, rel, com = (np.asarray(a) for a in fit(
        jnp.asarray(white, jnp.float32), jnp.asarray(lc, jnp.float32)))
    # decomposition identity
    np.testing.assert_allclose(tot, np.sqrt(rel**2 + com[:, None]**2),
                               rtol=1e-5)
    # relative part: remove each realisation's channel mean -> the
    # common term cancels; scatter must match sigma_rel. (The mean
    # subtraction removes 1/N_CHAN of the independent variance too.)
    rp_rel = rp - rp.mean(axis=1, keepdims=True)
    scatter_rel = rp_rel.std(axis=0, ddof=1)
    expect_rel = rel.mean(axis=0) * np.sqrt(1.0 - 1.0 / N_CHAN)
    ratio_rel = (scatter_rel / expect_rel).mean()
    assert 0.85 < ratio_rel < 1.15, ratio_rel
    # common part: the channel-mean deviation from truth scatters by
    # sqrt(sigma_common^2 + sigma_rel^2/N_CHAN)
    com_scatter = rp.mean(axis=1).std(ddof=1)
    expect_com = np.sqrt(com.mean()**2
                         + (rel.mean(axis=0)**2).mean() / N_CHAN)
    assert 0.75 < com_scatter / expect_com < 1.3, (com_scatter,
                                                   expect_com)


@pytest.mark.slow
def test_spectra_to_depths_sigma_components(visit_model):
    """The dataset-QA fitter exposes the same decomposition; without
    divide-white the rel part IS the total and common is zero."""
    from wayne_tpu.reduction import spectra_to_depths

    base, mid, oot, model = visit_model
    rng = np.random.default_rng(5)
    n_mc, s_cols = 3, 64
    xw = (8, 56)
    flux = 500.0 * np.ones((1, N_EXP, s_cols))
    flux[:, :, xw[0]: xw[1]] *= model[None, :, None]
    sp = flux * (1.0 + 2e-4 * rng.standard_normal((n_mc, N_EXP, s_cols)))
    out = spectra_to_depths(
        jnp.asarray(sp, jnp.float32), mid, base.orbit, base.ld, 0.155,
        x_window=xw, n_chan=4, divide_white=True, subtract_bg=False,
        sigma_components=True)
    rp, tot, rel, com = (np.asarray(a) for a in out)
    assert rp.shape == (n_mc, 4) and com.shape == (n_mc,)
    np.testing.assert_allclose(tot, np.sqrt(rel**2 + com[:, None]**2),
                               rtol=1e-5)
    out_nd = spectra_to_depths(
        jnp.asarray(sp, jnp.float32), mid, base.orbit, base.ld, 0.155,
        x_window=xw, n_chan=4, divide_white=False, subtract_bg=False,
        sigma_components=True)
    rp2, tot2, rel2, com2 = (np.asarray(a) for a in out_nd)
    np.testing.assert_allclose(rel2, tot2)
    np.testing.assert_array_equal(com2, 0.0)
    # single-visit squeeze path keeps the 4-tuple shape contract
    one = spectra_to_depths(
        jnp.asarray(sp[0], jnp.float32), mid, base.orbit, base.ld,
        0.155, x_window=xw, n_chan=4, divide_white=True,
        subtract_bg=False, sigma_components=True)
    assert one[0].shape == (4,) and np.ndim(one[3]) == 0


def test_validation_artifact_has_inference_sections_green():
    """The committed VALIDATION.json must carry the round-5 inference
    sections (retrieval_mode / program_mode / spots_mode) with every
    gate green — the newest science outputs (forward-model retrieval
    rp_sigma, the joint TTV error bar, the program combined spectrum,
    the fitted spot scale) are held to the same ensemble
    sigma-calibration standard as the classic reductions."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..",
                        "VALIDATION.json")
    v = json.load(open(path))
    for section in ("retrieval_mode", "program_mode", "spots_mode"):
        assert section in v, f"VALIDATION.json missing {section}"
        gates = {k: b for k, b in v[section].items()
                 if isinstance(b, bool)}
        assert gates, f"{section} has no boolean gates"
        bad = [k for k, b in gates.items() if not b]
        assert not bad, f"{section} gates failed: {bad}"
    # the divide-white ensembles now gate the RELATIVE sigma two-sided
    for section in ("with_systematics", "staring_mode", "g102_mode"):
        assert "sigma_rel_calibration_ratio" in v[section], section


@pytest.mark.slow
def test_retrieval_sigma_small_ensemble():
    """Miniature of VALIDATION.json retrieval_mode: 8 noisy visits
    through retrieve_transmission; the MEAN scatter/reported-sigma
    ratio must sit near 1 (per-channel gating needs the tool's 32
    realisations — this regression catches estimator-scale breakage
    like the pre-fix global-chi2 miscalibration, ratios to 2.3)."""
    from wayne_tpu.config import ExposureStatic, NoiseFlags
    from wayne_tpu.ops.visit import simulate_visit
    from wayne_tpu.retrieval import bin_channel_map, retrieve_transmission

    S, NL, N_EXP_R, N_CHAN_R = 128, 64, 18, 4
    XW = (72, 126)
    flags = dataclasses.replace(NoiseFlags.none(), poisson=True,
                                read_noise=True, sky=True, dark=True)
    cfg = ExposureStatic(subarray=S, n_lambda=NL, n_sub=2, nsamp=3,
                         samp_seq="SPARS10", scan=True, noise=flags,
                         band_px=48)
    tables = synthetic_tables("G141", subarray=S, n_lambda=NL,
                              samp_seq="SPARS10", nsamp=3)
    base = example_scene(NL, scan_speed=0.6)
    wl = np.asarray(tables.wl_centers)
    rp = 0.1595 + 0.004 * np.sin(9.0 * wl)
    base = dataclasses.replace(
        base, x_ref=jnp.float32(30.0), y_ref=jnp.float32(30.0),
        rp_over_rs=jnp.asarray(rp, jnp.float32))
    visit = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (N_EXP_R,) + x.shape), base)
    visit = dataclasses.replace(
        visit, exp_start_s=jnp.asarray(
            np.linspace(0.0, 4.0 * 3600.0, N_EXP_R), jnp.float32))

    @jax.jit
    def observe(scenes):
        res = simulate_visit(scenes, tables, cfg, chunk=6)
        return (res.reads_dn[:, -1] - res.reads_dn[:, 0]).sum(axis=1)

    rps, sigs = [], []
    for m in range(8):
        keys = jax.vmap(lambda e: jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(4242), m), e)
        )(jnp.arange(N_EXP_R))
        sc = dataclasses.replace(visit, key=keys)
        res = retrieve_transmission(
            observe(sc), sc, tables, cfg, x_window=XW,
            n_chan=N_CHAN_R, rp_init=0.15, chunk=6, n_lm=8)
        rps.append(res.rp)
        sigs.append(res.rp_sigma)
    rps, sigs = np.stack(rps), np.stack(sigs)
    ratio = (rps.std(axis=0, ddof=1) / sigs.mean(axis=0)).mean()
    assert 0.6 < ratio < 1.5, ratio
    idx, in_win = bin_channel_map(visit, tables, XW, N_CHAN_R)
    truth = np.array([rp[in_win & (idx == c)].mean()
                      for c in range(N_CHAN_R)])
    assert np.all(np.abs(rps.mean(axis=0) - truth) < 1.5e-3)
