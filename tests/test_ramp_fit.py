"""Joint white-light ramp+transit fitting (reduction.fit_white_ramp).

The reference's validation pipeline (Iraclis; SURVEY.md section 4) fits
WFC3 white light curves as transit x (linear slope) x (per-orbit
exponential ramp) — the same parametric family the simulator injects
(trends.visit_trend_factor). These tests close that loop: inject the
trend, fit it back jointly with the transit, and recover absolute white
depths plus detrended channel depths without divide-white.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wayne_tpu.ops.transit import transit_depth_curve
from wayne_tpu.ops.kepler import projected_separation
from wayne_tpu.reduction import (fit_depths, fit_white_ramp, orbit_phase,
                                 ramp_detrend, reduce_visit)
from wayne_tpu.scene import example_scene
from wayne_tpu.trends import TrendParams, visit_trend_factor

ORBIT_S = 95.47 * 60.0          # HST orbital period
RP_W = 0.1595


def _orbit_times(n_orbits=4, per_orbit=14, cadence_s=90.0, offset_s=60.0):
    """Exposure mid-times + true orbit clocks for a gapped HST visit."""
    t, t_orb, first = [], [], []
    for k in range(n_orbits):
        start = k * ORBIT_S
        for i in range(per_orbit):
            ti = start + offset_s + i * cadence_s
            t.append(ti)
            t_orb.append(ti - start)
            first.append(1.0 if k == 0 else 0.0)
    return (np.asarray(t, np.float32), np.asarray(t_orb, np.float32),
            np.asarray(first, np.float32))


def _white_model(t, t_orb, first, trends, orbit, ld, rp):
    z, in_front = projected_separation(jnp.asarray(t), orbit)
    f = transit_depth_curve(z, jnp.float32(rp), ld, 32)
    tr = 1.0 - (1.0 - f) * in_front
    sys = visit_trend_factor(jnp.asarray(t), jnp.asarray(t_orb),
                             jnp.asarray(first), trends)
    return np.asarray(tr * sys)


def test_orbit_phase_segments_gapped_visit():
    t, t_orb_true, first_true = _orbit_times()
    t_orb, first = orbit_phase(jnp.asarray(t))
    # reducer's orbit clock zeroes on the first exposure of each orbit:
    # true clock minus the constant 60 s readout offset
    np.testing.assert_allclose(np.asarray(t_orb), t_orb_true - 60.0,
                               atol=1e-3)
    np.testing.assert_array_equal(np.asarray(first), first_true > 0.5)


def test_fit_white_ramp_noise_free():
    base = example_scene(64)
    trends = TrendParams.create(hook_amp=0.003, hook_tau_s=300.0,
                                visit_slope_per_s=0.01 / 86400.0,
                                hook_orbit1_scale=2.0)
    t, t_orb, first = _orbit_times()
    lc = _white_model(t, t_orb, first, trends, base.orbit, base.ld, RP_W)
    fit = fit_white_ramp(jnp.asarray(lc), jnp.asarray(t), base.orbit,
                         base.ld, 0.15)
    assert abs(float(fit.rp) - RP_W) < 5e-4, float(fit.rp)
    # slope recovered in frac/day; hook amplitudes keep orbit-1 ~2x
    assert abs(float(fit.slope_per_day) - 0.01) < 0.002
    # template matches the injected systematic up to a constant factor
    inj = np.asarray(visit_trend_factor(
        jnp.asarray(t), jnp.asarray(t_orb), jnp.asarray(first), trends))
    tpl = np.asarray(fit.template)
    ratio = inj / tpl
    assert np.abs(ratio / ratio.mean() - 1.0).max() < 1e-3
    # residual chi2 is tiny on noise-free data
    assert float(fit.chi2) < 1e-7 * lc.size


def test_fit_white_ramp_flat_visit_no_false_transit():
    """On a trend-only, transit-free window the fit must not hallucinate
    a deep transit (rp pinned near the clip floor; template still good)."""
    base = example_scene(64)
    trends = TrendParams.create(hook_amp=0.004, hook_tau_s=250.0,
                                visit_slope_per_s=0.02 / 86400.0)
    t, t_orb, first = _orbit_times(n_orbits=3)
    t = t + 4.0 * ORBIT_S                    # transit far outside window
    sys = np.asarray(visit_trend_factor(
        jnp.asarray(t), jnp.asarray(t_orb), jnp.asarray(first), trends))
    fit = fit_white_ramp(jnp.asarray(sys), jnp.asarray(t), base.orbit,
                         base.ld, 0.15)
    tpl = np.asarray(fit.template)
    ratio = sys / tpl
    assert np.abs(ratio / ratio.mean() - 1.0).max() < 2e-3


def test_ramp_detrend_recovers_channel_depths():
    base = example_scene(64)
    trends = TrendParams.create(hook_amp=0.003, hook_tau_s=300.0,
                                visit_slope_per_s=0.01 / 86400.0)
    t, t_orb, first = _orbit_times()
    rng = np.random.default_rng(5)
    rp_chan = RP_W + 0.003 * np.sin(np.arange(6))
    chans = np.stack([
        _white_model(t, t_orb, first, trends, base.orbit, base.ld, rp)
        + 2e-5 * rng.standard_normal(t.size).astype(np.float32)
        for rp in rp_chan], axis=1)
    white = chans.mean(axis=1)
    fit = fit_white_ramp(jnp.asarray(white), jnp.asarray(t), base.orbit,
                         base.ld, 0.15)
    corrected = ramp_detrend(jnp.asarray(chans), fit, jnp.asarray(t),
                             base.orbit)
    rp_hat, _ = fit_depths(corrected, jnp.asarray(t), base.orbit, base.ld,
                           jnp.float32(0.15))
    np.testing.assert_allclose(np.asarray(rp_hat), rp_chan, atol=5e-4)


@pytest.mark.slow
def test_ramp_fit_closes_simulator_loop():
    """End to end: simulate an orbit-structured visit with the hook+slope
    trend ON plus photon/read noise, reduce it, and recover the injected
    depths via the joint ramp fit — no divide-white anywhere."""
    from wayne_tpu.calibration import synthetic_tables
    from wayne_tpu.config import ExposureStatic, NoiseFlags
    from wayne_tpu.ops.visit import simulate_visit

    S, NL, NSAMP, N_ORB, PER_ORB = 128, 64, 4, 3, 12
    flags = dataclasses.replace(
        NoiseFlags.none(), poisson=True, read_noise=True, sky=True,
        dark=True, visit_trend=True)
    cfg = ExposureStatic(subarray=S, n_lambda=NL, n_sub=4, nsamp=NSAMP,
                         samp_seq="SPARS10", scan=True, noise=flags,
                         band_px=48)
    tables = synthetic_tables("G141", subarray=S, n_lambda=NL,
                              samp_seq="SPARS10", nsamp=NSAMP)
    base = example_scene(NL, scan_speed=1.0)
    wl = np.asarray(tables.wl_centers)
    rp = RP_W + 0.004 * np.sin(10.0 * wl)
    base = dataclasses.replace(
        base, x_ref=jnp.float32(30.0), y_ref=jnp.float32(30.0),
        rp_over_rs=jnp.asarray(rp, jnp.float32))
    n_exp = N_ORB * PER_ORB
    starts, orbit_starts, first = [], [], []
    # centre the transit (t0 = 7200 s on example_scene's clock) in orbit 2
    t_shift = 7200.0 - (1.5 * ORBIT_S)
    for k in range(N_ORB):
        o = k * ORBIT_S + t_shift
        for i in range(PER_ORB):
            starts.append(o + 90.0 + i * 120.0)
            orbit_starts.append(o)
            first.append(1.0 if k == 0 else 0.0)
    starts = np.asarray(starts, np.float32)
    scenes = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n_exp,) + x.shape), base)
    keys = jax.vmap(lambda i: jax.random.fold_in(
        jax.random.PRNGKey(17), i))(jnp.arange(n_exp))
    scenes = dataclasses.replace(
        scenes, exp_start_s=jnp.asarray(starts),
        orbit_start_s=jnp.asarray(orbit_starts, jnp.float32),
        is_first_orbit=jnp.asarray(first, jnp.float32), key=keys)
    out = simulate_visit(scenes, tables, cfg, chunk=6)
    exptime = float(tables.read_times[-1])
    mid = jnp.asarray(starts + exptime / 2.0)

    red = reduce_visit(out.reads_dn, tables.gain, mid, base.orbit,
                       y_window=(20, 75), x_window=(72, 126),
                       bg_rows=(100, 126), n_chan=6)
    fit = fit_white_ramp(red.white_lc, mid, base.orbit, base.ld, 0.15)
    # absolute white depth: something divide-white cannot provide
    assert abs(float(fit.rp) - RP_W) < max(4.0 * float(fit.rp_sigma),
                                           0.004), (
        float(fit.rp), float(fit.rp_sigma))
    corrected = ramp_detrend(red.channel_lc, fit, mid, base.orbit)
    rp_hat, rp_sig = fit_depths(corrected, mid, base.orbit, base.ld,
                                jnp.float32(0.15))
    rp_hat, rp_sig = np.asarray(rp_hat), np.asarray(rp_sig)
    tol = np.maximum(6.0 * rp_sig, 0.006)
    assert np.all(np.abs(rp_hat - RP_W) < tol), (rp_hat, rp_sig)


@pytest.mark.slow
def test_run_reduce_cli_detrend_ramp(tmp_path):
    """File-level loop with --detrend ramp: generate a visit (hook+slope
    on by default), reduce it with the joint parametric fit, and recover
    both the absolute white depth and the channel depths."""
    import json

    import yaml

    from wayne_tpu.config import load_yaml
    from wayne_tpu.observation import Observation
    from wayne_tpu.run_reduce import main as reduce_main

    pars = {"grism": "G141", "subarray": 128, "NSAMP": 4,
            "SAMPSEQ": "SPARS10", "scan": True, "x_ref": 30.0,
            "y_ref": 40.0, "num_orbits": 3, "exposures_per_orbit": 6,
            "n_lambda": 64, "n_sub": 4, "rp_over_rs": 0.14,
            "start_mjd": 55999.93, "t0": 56000.0, "period": 0.813475,
            "sma_over_rs": 4.855, "inclination": 82.1, "seed": 9}
    ppath = tmp_path / "pars.yml"
    ppath.write_text(yaml.safe_dump(pars))
    outdir = tmp_path / "visit"
    obs = Observation(load_yaml(str(ppath)))
    obs.generate(str(outdir), chunk=6, progress=lambda s: None)

    rc = reduce_main(["-d", str(outdir), "-p", str(ppath),
                      "--n-chan", "4", "--cpu", "--detrend", "ramp",
                      "--mcmc", "800"])
    assert rc == 0
    rep = json.loads((outdir / "reduced.json").read_text())
    assert rep["detrend"] == "ramp" and not rep["divide_white"]
    wf = rep["white_ramp_fit"]
    assert abs(wf["rp_over_rs"] - 0.14) < max(5.0 * wf["rp_sigma"],
                                              5e-3), wf
    # posterior depths ride along (--mcmc): median consistent with the
    # injected value within the quoted percentile widths
    wp = rep["white_posterior"]
    w_width = 0.5 * (wp["depth_plus"] + wp["depth_minus"])
    assert abs(wp["rp_over_rs_median"] - 0.14) < max(5.0 * w_width,
                                                     5e-3), wp
    for c in rep["channels"]:
        assert abs(c["rp_over_rs"] - 0.14) < max(5 * c["rp_sigma"], 4e-3), c
        cw = 0.5 * (c["rp_mcmc_plus"] + c["rp_mcmc_minus"])
        assert abs(c["rp_mcmc_median"] - 0.14) < max(5.0 * cw, 5e-3), c


@pytest.mark.slow
def test_fit_white_ramp_geometry():
    """fit_geometry frees (t0, a/Rs, cos i): data generated with a
    perturbed ephemeris must be recovered from the catalog starting
    point, and the fixed-geometry fit on the same data shows the bias
    the geometric fit removes."""
    import dataclasses as dc

    base = example_scene(64)
    trends = TrendParams.create(hook_amp=0.003, hook_tau_s=300.0,
                                visit_slope_per_s=0.01 / 86400.0)
    # Coverage matters: with this ~68-min transit, t0 must sit so that
    # INGRESS falls in one orbit's visibility window and EGRESS in the
    # next — ingress-only coverage leaves t0 vs (a/Rs, i) genuinely
    # degenerate (measured: a 90 s t0 shift absorbed to chi2 2e-8 by
    # symmetric geometry changes when egress fell in the Earth gap).
    t, t_orb, first = _orbit_times(n_orbits=5, per_orbit=30)
    catalog_orbit = dc.replace(base.orbit, t0_s=jnp.float32(9700.0))
    true_orbit = dc.replace(
        catalog_orbit,
        t0_s=catalog_orbit.t0_s + 90.0,
        sma_rs=catalog_orbit.sma_rs * 1.04,
        inc_rad=catalog_orbit.inc_rad - jnp.float32(np.deg2rad(0.4)))
    lc = _white_model(t, t_orb, first, trends, true_orbit, base.ld, RP_W)

    fixed = fit_white_ramp(jnp.asarray(lc), jnp.asarray(t), catalog_orbit,
                           base.ld, 0.15)
    free = fit_white_ramp(jnp.asarray(lc), jnp.asarray(t), catalog_orbit,
                          base.ld, 0.15, fit_geometry=True, n_iter=150)
    # The geometric fit lands in the right basin and converges to the
    # perturbed ephemeris within the (rp, a/Rs, i, t0) valley width for
    # this coverage — the residual chi2 sits far below any real visit's
    # photon-noise floor (n sigma^2 ~ 1e-5), so tighter agreement is
    # statistically meaningless even on noise-free data.
    assert abs(float(free.t0_offset_s) - 90.0) < 15.0, float(free.t0_offset_s)
    assert abs(float(free.orbit.sma_rs) / float(true_orbit.sma_rs)
               - 1.0) < 0.02
    assert abs(float(free.orbit.inc_rad)
               - float(true_orbit.inc_rad)) < np.deg2rad(0.5)
    assert abs(float(free.rp) - RP_W) < 5e-3, float(free.rp)
    assert float(free.chi2) < 1e-6 * lc.size
    # ...and beats the fixed-geometry depth on wrong-ephemeris data
    assert abs(float(fixed.rp) - RP_W) > 2.0 * abs(float(free.rp) - RP_W), (
        float(fixed.rp), float(free.rp))
    # fixed-geometry fit keeps the input ephemeris in .orbit
    assert abs(float(fixed.orbit.t0_s) - 9700.0) < 1e-3


def test_fit_white_ramp_eclipse_mode():
    """eclipse=True fits Fp/Fs x ramp on a secondary-eclipse visit: the
    same systematics family, the occultation visibility as the signal."""
    from wayne_tpu.ops.transit import eclipse_visibility

    base = example_scene(64)
    trends = TrendParams.create(hook_amp=0.003, hook_tau_s=300.0,
                                visit_slope_per_s=0.01 / 86400.0)
    t, t_orb, first = _orbit_times(n_orbits=5, per_orbit=20)
    # centre the secondary eclipse (t0 + P/2) in the sampled window
    t = t + (float(base.orbit.t0_s) + float(base.orbit.period_s) / 2.0
             - 0.5 * (t[0] + t[-1]))
    fp_true = 1.5e-3
    z, in_front = projected_separation(jnp.asarray(t), base.orbit)
    vis = eclipse_visibility(z, in_front, jnp.float32(RP_W))
    assert float(jnp.max(vis) - jnp.min(vis)) > 0.5   # coverage sanity
    sys = np.asarray(visit_trend_factor(
        jnp.asarray(t), jnp.asarray(t_orb), jnp.asarray(first), trends))
    lc = sys * np.asarray(1.0 + fp_true * vis)

    fit = fit_white_ramp(jnp.asarray(lc), jnp.asarray(t), base.orbit,
                         base.ld, RP_W, eclipse=True)
    assert abs(float(fit.rp) - fp_true) < 1e-4, float(fit.rp)
    tpl = np.asarray(fit.template)
    ratio = sys / tpl
    assert np.abs(ratio / ratio.mean() - 1.0).max() < 1e-3


@pytest.mark.slow
def test_fit_white_ramp_robust_clip():
    """clip_sigma survives model-unrepresentable outliers (a starspot
    crossing bump + a CR spike): the clipped fit recovers the unbiased
    depth, reports the outlier exposures in RampFit.weights, and the
    weights mask carries into the channel fits (fit_depths)."""
    rng = np.random.RandomState(5)
    base = example_scene(64)
    trends = TrendParams.create(hook_amp=0.003, hook_tau_s=300.0,
                                visit_slope_per_s=0.01 / 86400.0,
                                hook_orbit1_scale=2.0)
    t, t_orb, first = _orbit_times()
    lc = _white_model(t, t_orb, first, trends, base.orbit, base.ld, RP_W)
    noise = 8e-5
    lc = lc * (1.0 + noise * rng.standard_normal(lc.size))
    # in-transit spot-crossing bump (2 adjacent exposures) + one CR spike
    in_tr = np.abs(t - float(base.orbit.t0_s)) < 900.0
    bump_idx = np.flatnonzero(in_tr)[2:4]
    lc[bump_idx] *= 1.004            # ~50x the noise
    lc[5] *= 1.006                   # baseline spike
    outliers = sorted(bump_idx.tolist() + [5])

    plain = fit_white_ramp(jnp.asarray(lc, jnp.float32), jnp.asarray(t),
                           base.orbit, base.ld, 0.15)
    robust = fit_white_ramp(jnp.asarray(lc, jnp.float32), jnp.asarray(t),
                            base.orbit, base.ld, 0.15, clip_sigma=4.0)
    w = np.asarray(robust.weights)
    assert sorted(np.flatnonzero(w == 0.0).tolist()) == outliers, w
    assert np.all(np.asarray(plain.weights) == 1.0)
    err_plain = abs(float(plain.rp) - RP_W)
    err_robust = abs(float(robust.rp) - RP_W)
    assert err_robust < 5e-4, err_robust
    assert err_plain > 2.0 * err_robust, (err_plain, err_robust)

    # channel fits skip the same exposures: a biased channel curve
    # (same bump) fitted with the robust mask lands on truth
    z, in_front = projected_separation(jnp.asarray(t), base.orbit)
    f = transit_depth_curve(z, jnp.float32(RP_W), base.ld, 32)
    chan = np.asarray(1.0 - (1.0 - f) * in_front)[:, None].copy()
    chan[bump_idx, 0] *= 1.004
    chan[5, 0] *= 1.006
    rp_w, _ = fit_depths(jnp.asarray(chan, jnp.float32), jnp.asarray(t),
                         base.orbit, base.ld, jnp.float32(0.15),
                         weights=robust.weights)
    rp_no, _ = fit_depths(jnp.asarray(chan, jnp.float32), jnp.asarray(t),
                          base.orbit, base.ld, jnp.float32(0.15))
    assert abs(float(rp_w[0]) - RP_W) < 1e-4
    assert (abs(float(rp_no[0]) - RP_W)
            > 3.0 * max(abs(float(rp_w[0]) - RP_W), 3e-5))


def test_fit_white_ramp_eclipse_robust_clip():
    """clip_sigma in eclipse mode: a flare-like spike inside the eclipse
    (which the Fp x visibility model cannot represent) is rejected
    against the OUT-OF-ECLIPSE scatter, the recovered Fp/Fs moves back
    to truth, and the mask carries into fit_eclipse_depths."""
    from wayne_tpu.ops.transit import eclipse_visibility
    from wayne_tpu.reduction import fit_eclipse_depths

    rng = np.random.RandomState(7)
    base = example_scene(64)
    trends = TrendParams.create(hook_amp=0.003, hook_tau_s=300.0,
                                visit_slope_per_s=0.01 / 86400.0)
    t, t_orb, first = _orbit_times(n_orbits=5, per_orbit=20)
    t = t + (float(base.orbit.t0_s) + float(base.orbit.period_s) / 2.0
             - 0.5 * (t[0] + t[-1]))
    fp_true = 1.5e-3
    z, in_front = projected_separation(jnp.asarray(t), base.orbit)
    vis = eclipse_visibility(z, in_front, jnp.float32(RP_W))
    sys = np.asarray(visit_trend_factor(
        jnp.asarray(t), jnp.asarray(t_orb), jnp.asarray(first), trends))
    noise = 5e-5
    lc = sys * np.asarray(1.0 + fp_true * vis)
    lc = lc * (1.0 + noise * rng.standard_normal(lc.size))
    in_ecl = np.flatnonzero(np.asarray(vis) < 0.01)
    spike = [int(in_ecl[len(in_ecl) // 2]), 7]      # in-eclipse + baseline
    for i in spike:
        lc[i] *= 1.003                              # ~60x the noise

    plain = fit_white_ramp(jnp.asarray(lc, jnp.float32), jnp.asarray(t),
                           base.orbit, base.ld, RP_W, eclipse=True)
    robust = fit_white_ramp(jnp.asarray(lc, jnp.float32), jnp.asarray(t),
                            base.orbit, base.ld, RP_W, eclipse=True,
                            clip_sigma=4.0)
    w = np.asarray(robust.weights)
    assert sorted(np.flatnonzero(w == 0.0).tolist()) == sorted(spike), w
    err_plain = abs(float(plain.rp) - fp_true)
    err_robust = abs(float(robust.rp) - fp_true)
    assert err_robust < 5e-5, err_robust
    assert err_plain > 2.0 * err_robust, (err_plain, err_robust)

    # the mask carries into the closed-form channel eclipse fit
    chan = np.asarray(1.0 + fp_true * vis)[:, None].copy()
    for i in spike:
        chan[i, 0] *= 1.003
    fp_w, _ = fit_eclipse_depths(jnp.asarray(chan, jnp.float32),
                                 jnp.asarray(t), base.orbit,
                                 jnp.float32(RP_W), weights=robust.weights)
    fp_no, _ = fit_eclipse_depths(jnp.asarray(chan, jnp.float32),
                                  jnp.asarray(t), base.orbit,
                                  jnp.float32(RP_W))
    assert abs(float(fp_w[0]) - fp_true) < 2e-6, float(fp_w[0])
    assert abs(float(fp_no[0]) - fp_true) > 5.0 * abs(float(fp_w[0]) - fp_true)


def test_fit_white_ramp_eclipse_ignores_transit():
    """A long visit covering BOTH events: the eclipse-mode fit excludes
    in-transit epochs (its model has no transit factor), so the ~2.5%
    transit dip — ~15x the eclipse signal — cannot skew Fp/Fs or the
    systematics, with or without robust clipping."""
    from wayne_tpu.ops.transit import eclipse_visibility
    from wayne_tpu.reduction import out_of_transit_mask

    base = example_scene(64)
    trends = TrendParams.create(hook_amp=0.003, hook_tau_s=300.0,
                                visit_slope_per_s=0.01 / 86400.0)
    # 14 HST orbits span ~80 ks > the 70.3 ks planet period: the window
    # contains a full transit AND a full eclipse
    t, t_orb, first = _orbit_times(n_orbits=14, per_orbit=20)
    fp_true = 1.5e-3
    z, in_front = projected_separation(jnp.asarray(t), base.orbit)
    vis = eclipse_visibility(z, in_front, jnp.float32(RP_W))
    assert float(jnp.max(vis) - jnp.min(vis)) > 0.5   # eclipse covered
    oot = np.asarray(out_of_transit_mask(jnp.asarray(t), base.orbit))
    assert (~oot).sum() >= 10                         # transit covered
    f = transit_depth_curve(z, jnp.float32(RP_W), base.ld, 32)
    tr = np.asarray(1.0 - (1.0 - f) * in_front)
    sys = np.asarray(visit_trend_factor(
        jnp.asarray(t), jnp.asarray(t_orb), jnp.asarray(first), trends))
    lc = sys * tr * np.asarray(1.0 + fp_true * vis)

    fit = fit_white_ramp(jnp.asarray(lc, jnp.float32), jnp.asarray(t),
                         base.orbit, base.ld, RP_W, eclipse=True)
    assert abs(float(fit.rp) - fp_true) < 1e-4, float(fit.rp)
    # systematics recovered too: template matches sys outside transit
    tpl = np.asarray(fit.template)
    ratio = (sys / tpl)[oot]
    assert np.abs(ratio / ratio.mean() - 1.0).max() < 1e-3

    # robust clipping must not treat the transit dip as clippable
    # baseline scatter (the clip scale is out-of-eclipse AND
    # out-of-transit): no exposure is rejected on clean data
    robust = fit_white_ramp(jnp.asarray(lc, jnp.float32), jnp.asarray(t),
                            base.orbit, base.ld, RP_W, eclipse=True,
                            clip_sigma=4.0, clip_rounds=2)
    assert abs(float(robust.rp) - fp_true) < 1e-4, float(robust.rp)
