"""On-device ensemble MCMC: sampler correctness + white-light posterior.

The Gaussian test checks the Goodman-Weare stretch move against a known
target (the detailed-balance smoke test every sampler must pass); the
posterior test closes the loop with the white ramp+transit model:
posterior median ~ truth, width consistent with the LM curvature.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wayne_tpu.mcmc import ensemble_sample, sample_white_posterior
from wayne_tpu.scene import example_scene
from wayne_tpu.trends import TrendParams, visit_trend_factor

from tests.test_ramp_fit import _orbit_times, _white_model


def test_ensemble_sampler_recovers_gaussian():
    cov = jnp.asarray(np.array([[1.0, 0.6], [0.6, 0.8]], np.float32))
    prec = jnp.linalg.inv(cov)
    mu = jnp.asarray([1.5, -0.5], jnp.float32)

    def log_prob(x):
        d = x - mu
        return -0.5 * d @ prec @ d

    key = jax.random.PRNGKey(0)
    init = mu[None, :] + 0.1 * jax.random.normal(key, (32, 2))
    chain = ensemble_sample(log_prob, init, jax.random.PRNGKey(1), 3000)
    kept = np.asarray(chain.samples[500:]).reshape(-1, 2)
    acc = float(chain.acceptance)
    assert 0.15 < acc < 0.95, acc
    np.testing.assert_allclose(kept.mean(axis=0), np.asarray(mu),
                               atol=0.05)
    emp_cov = np.cov(kept.T)
    np.testing.assert_allclose(emp_cov, np.asarray(cov), rtol=0.2,
                               atol=0.05)


def test_chain_diagnostics_sane_and_catches_nonconvergence():
    """chain_diagnostics: near-iid chains give R-hat ~ 1 and a large
    ESS below the raw draw count; a deliberately non-stationary chain
    (two walker populations around different means, never mixing) is
    flagged by split R-hat >> 1."""
    from wayne_tpu.mcmc import chain_diagnostics

    rng = np.random.default_rng(5)
    # near-iid: pure white noise "chains"
    iid = jnp.asarray(rng.standard_normal((800, 16, 3)), jnp.float32)
    d = chain_diagnostics(iid)
    rhat, ess = np.asarray(d.rhat), np.asarray(d.ess)
    assert np.all(np.abs(rhat - 1.0) < 0.02), rhat
    assert np.all((ess > 0.25 * 800 * 16) & (ess <= 800 * 16 * 1.5)), ess

    # AR(1) with phi=0.9: ESS must be far below the draw count
    n = 2000
    ar = np.zeros((n, 8, 1), np.float32)
    eps = rng.standard_normal((n, 8, 1)).astype(np.float32)
    for i in range(1, n):
        ar[i] = 0.9 * ar[i - 1] + eps[i]
    d_ar = chain_diagnostics(jnp.asarray(ar))
    # theory: ACT = (1+phi)/(1-phi) = 19 -> ESS ~ n*m/19
    ess_ar = float(d_ar.ess[0])
    assert 0.3 * n * 8 / 19 < ess_ar < 3.0 * n * 8 / 19, ess_ar

    # stuck modes: half the walkers at +3, half at -3 (never mix);
    # per-walker halves agree, but the SPLIT convention still sees the
    # between-chain spread -> rhat >> 1... here walkers differ, so
    # between-chain variance is huge relative to within.
    stuck = 0.1 * rng.standard_normal((800, 16, 1)).astype(np.float32)
    stuck[:, :8] += 3.0
    stuck[:, 8:] -= 3.0
    d_bad = chain_diagnostics(jnp.asarray(stuck))
    assert float(d_bad.rhat[0]) > 2.0, float(d_bad.rhat[0])

    # slow common drift (burn-in leaking into the kept chain): each
    # walker's first and second half disagree -> split R-hat flags it
    drift = (0.1 * rng.standard_normal((800, 16, 1)).astype(np.float32)
             + np.linspace(0.0, 1.0, 800)[:, None, None].astype(
                 np.float32))
    d_drift = chain_diagnostics(jnp.asarray(drift))
    assert float(d_drift.rhat[0]) > 1.5, float(d_drift.rhat[0])


def test_ensemble_sampler_respects_support():
    """-inf log-prob regions are never entered (flat prior truncation)."""
    def log_prob(x):
        return jnp.where(jnp.all(x > 0.0), -0.5 * jnp.sum(x ** 2),
                         -jnp.inf)

    init = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (16, 2))) + 0.1
    chain = ensemble_sample(log_prob, init, jax.random.PRNGKey(3), 500)
    assert float(jnp.min(chain.samples)) > 0.0


@pytest.mark.slow
def test_white_posterior_recovers_depth():
    base = example_scene(64)
    trends = TrendParams.create(hook_amp=0.003, hook_tau_s=300.0,
                                visit_slope_per_s=0.01 / 86400.0)
    t, t_orb, first = _orbit_times()
    rng = np.random.default_rng(11)
    sigma = 3e-4
    rp_true = 0.1595
    lc = (_white_model(t, t_orb, first, trends, base.orbit, base.ld,
                       rp_true)
          + sigma * rng.standard_normal(t.size).astype(np.float32))
    post = sample_white_posterior(
        jnp.asarray(lc), jnp.asarray(t), base.orbit, base.ld, 0.15,
        jax.random.PRNGKey(4), n_steps=3000, n_burn=1000)
    med = float(post.rp_median)
    width = 0.5 * (float(post.rp_minus) + float(post.rp_plus))
    assert 0.1 < float(post.acceptance) < 0.95
    # median within 4 posterior sigmas of truth, width sane (not
    # collapsed, not orders of magnitude off the per-point noise level)
    assert abs(med - rp_true) < 4.0 * max(width, 1e-4), (med, width)
    assert 1e-5 < width < 3e-3, width
    # the noise scale is sampled too: exp(median log_sigma) ~ sigma
    ls = np.median(np.asarray(post.samples[:, 6]))
    assert abs(np.exp(ls) / sigma - 1.0) < 0.5
    # convergence diagnostics gated, not just recorded: the depth chain
    # must be well-mixed and carry real information
    assert float(post.rhat[1]) < 1.05, float(post.rhat[1])
    assert float(post.ess[1]) > 300.0, float(post.ess[1])
    assert float(np.max(np.asarray(post.rhat))) < 1.3


@pytest.mark.slow
def test_channel_posteriors_vmapped():
    """All channels sampled in one program: medians track the injected
    per-channel depths, widths are finite and sane."""
    from wayne_tpu.mcmc import sample_channel_posteriors
    from wayne_tpu.ops.kepler import projected_separation
    from wayne_tpu.ops.transit import transit_depth_curve

    base = example_scene(64)
    t, _, _ = _orbit_times()
    rng = np.random.default_rng(3)
    rp_chan = np.array([0.155, 0.158, 0.1595, 0.162], np.float32)
    z, in_front = projected_separation(jnp.asarray(t), base.orbit)
    chans = np.stack([
        np.asarray((1.0 - (1.0 - transit_depth_curve(z, jnp.float32(rp),
                                                     base.ld, 32))
                    * in_front))
        + 4e-4 * rng.standard_normal(t.size).astype(np.float32)
        for rp in rp_chan], axis=1)
    post = sample_channel_posteriors(
        jnp.asarray(chans), jnp.asarray(t), base.orbit, base.ld, 0.158,
        jax.random.PRNGKey(7), n_steps=2400, n_burn=600)
    med = np.asarray(post.rp_median)
    width = 0.5 * (np.asarray(post.rp_minus) + np.asarray(post.rp_plus))
    acc = np.asarray(post.acceptance)
    assert np.all((acc > 0.1) & (acc < 0.95)), acc
    assert np.all(np.abs(med - rp_chan) < 4.0 * np.maximum(width, 1e-4)), (
        med, rp_chan, width)
    assert np.all((width > 1e-5) & (width < 5e-3)), width
    # every channel's depth chain converged with real sample counts
    assert np.all(np.asarray(post.rhat) < 1.05), np.asarray(post.rhat)
    assert np.all(np.asarray(post.ess) > 200.0), np.asarray(post.ess)


@pytest.mark.slow
def test_posterior_width_matches_lm_sigma():
    """Uncertainty-estimate cross-validation at unit scale (the
    ensemble-scale three-way tie lives in tools/uncertainty_triangle.py
    / UNCERTAINTY.json): on the same clean white-noise channel curves,
    the MCMC posterior width and the LM/curvature sigma from fit_depths
    estimate the SAME quantity and must agree to ~20% per channel.
    (red_noise/baseline_var off: the noise here is white and the curves
    are not OOT-normalised, so the bare curvature sigma is the exact
    reference point.)"""
    from wayne_tpu.mcmc import sample_channel_posteriors
    from wayne_tpu.ops.kepler import projected_separation
    from wayne_tpu.ops.transit import transit_depth_curve
    from wayne_tpu.reduction import fit_depths

    base = example_scene(64)
    t, _, _ = _orbit_times()
    rng = np.random.default_rng(17)
    rp_chan = np.array([0.156, 0.158, 0.160, 0.162], np.float32)
    z, in_front = projected_separation(jnp.asarray(t), base.orbit)
    chans = np.stack([
        np.asarray((1.0 - (1.0 - transit_depth_curve(z, jnp.float32(rp),
                                                     base.ld, 32))
                    * in_front))
        + 4e-4 * rng.standard_normal(t.size).astype(np.float32)
        for rp in rp_chan], axis=1)
    post = sample_channel_posteriors(
        jnp.asarray(chans), jnp.asarray(t), base.orbit, base.ld, 0.158,
        jax.random.PRNGKey(29), n_steps=2000, n_burn=500)
    width = 0.5 * (np.asarray(post.rp_minus) + np.asarray(post.rp_plus))
    _, sig = fit_depths(jnp.asarray(chans), jnp.asarray(t), base.orbit,
                        base.ld, jnp.float32(0.158),
                        baseline_var=False, red_noise=False)
    ratio = width / np.asarray(sig)
    assert np.all((ratio > 0.75) & (ratio < 1.3)), ratio


@pytest.mark.slow
def test_white_posterior_with_geometry():
    """Joint (depth, systematics, ephemeris) posterior: a perturbed-t0
    dataset's posterior covers the true shift, and the geometry
    marginals have finite honest widths."""
    import dataclasses as dc

    from wayne_tpu.mcmc import sample_white_posterior

    base = example_scene(64)
    trends = TrendParams.create(hook_amp=0.003, hook_tau_s=300.0,
                                visit_slope_per_s=0.01 / 86400.0)
    t, t_orb, first = _orbit_times(n_orbits=5, per_orbit=30)
    cat = dc.replace(base.orbit, t0_s=jnp.float32(9700.0))
    true_orbit = dc.replace(cat, t0_s=cat.t0_s + 90.0)
    rng = np.random.default_rng(19)
    lc = (_white_model(t, t_orb, first, trends, true_orbit, base.ld,
                       0.1595)
          + 3e-4 * rng.standard_normal(t.size).astype(np.float32))
    post = sample_white_posterior(
        jnp.asarray(lc), jnp.asarray(t), cat, base.ld, 0.15,
        jax.random.PRNGKey(8), n_steps=1500, n_burn=500,
        fit_geometry=True)
    kept = np.asarray(post.samples)
    assert kept.shape[1] == 10
    dt0 = kept[:, 6]
    dt0_med, dt0_sig = np.median(dt0), dt0.std()
    assert abs(dt0_med - 90.0) < 4.0 * max(dt0_sig, 5.0), (dt0_med, dt0_sig)
    assert 1.0 < dt0_sig < 300.0, dt0_sig
    med = float(post.rp_median)
    width = 0.5 * (float(post.rp_minus) + float(post.rp_plus))
    assert abs(med - 0.1595) < 4.0 * max(width, 1e-4), (med, width)
    assert 0.1 < float(post.acceptance) < 0.95


@pytest.mark.slow
def test_white_posterior_t0_window_covers_stale_ephemeris():
    """A catalog t0 stale by MORE than the default 600 s seeding window
    is recoverable by widening t0_window_s: the LM t0 grid AND the flat
    prior both track it, so walkers start in the right chi2 basin
    instead of confidently sampling a wrong mode (regression: the prior
    spanned +-1800 s while the seed grid was hardcoded to +-600)."""
    import dataclasses as dc

    from wayne_tpu.mcmc import sample_white_posterior

    base = example_scene(64)
    trends = TrendParams.create(hook_amp=0.003, hook_tau_s=300.0,
                                visit_slope_per_s=0.01 / 86400.0)
    t, t_orb, first = _orbit_times(n_orbits=5, per_orbit=30)
    cat = dc.replace(base.orbit, t0_s=jnp.float32(9700.0))
    true_orbit = dc.replace(cat, t0_s=cat.t0_s + 1100.0)
    rng = np.random.default_rng(23)
    lc = (_white_model(t, t_orb, first, trends, true_orbit, base.ld,
                       0.1595)
          + 3e-4 * rng.standard_normal(t.size).astype(np.float32))
    post = sample_white_posterior(
        jnp.asarray(lc), jnp.asarray(t), cat, base.ld, 0.15,
        jax.random.PRNGKey(21), n_steps=1500, n_burn=500,
        fit_geometry=True, t0_window_s=1500.0)
    dt0 = np.asarray(post.samples)[:, 6]
    dt0_med, dt0_sig = np.median(dt0), dt0.std()
    assert abs(dt0_med - 1100.0) < 4.0 * max(dt0_sig, 10.0), (
        dt0_med, dt0_sig)
    med = float(post.rp_median)
    width = 0.5 * (float(post.rp_minus) + float(post.rp_plus))
    assert abs(med - 0.1595) < 4.0 * max(width, 1e-4), (med, width)


def test_white_posterior_eclipse_mode():
    """Eclipse-mode posterior: Fp/Fs sampled jointly with the ramp."""
    import dataclasses as dc

    from wayne_tpu.mcmc import sample_white_posterior
    from wayne_tpu.ops.kepler import projected_separation as psep
    from wayne_tpu.ops.transit import eclipse_visibility

    base = example_scene(64)
    trends = TrendParams.create(hook_amp=0.003, hook_tau_s=300.0,
                                visit_slope_per_s=0.01 / 86400.0)
    t, t_orb, first = _orbit_times(n_orbits=5, per_orbit=20)
    t = t + (float(base.orbit.t0_s) + float(base.orbit.period_s) / 2.0
             - 0.5 * (t[0] + t[-1]))
    fp_true = 1.5e-3
    z, infr = psep(jnp.asarray(t), base.orbit)
    vis = eclipse_visibility(z, infr, jnp.float32(0.1595))
    sys = np.asarray(visit_trend_factor(
        jnp.asarray(t), jnp.asarray(t_orb), jnp.asarray(first), trends))
    rng = np.random.default_rng(23)
    lc = (sys * np.asarray(1.0 + fp_true * vis)
          + 2e-4 * rng.standard_normal(t.size).astype(np.float32))
    post = sample_white_posterior(
        jnp.asarray(lc), jnp.asarray(t), base.orbit, base.ld, 0.1595,
        jax.random.PRNGKey(12), n_steps=1500, n_burn=500, eclipse=True)
    med = float(post.rp_median)
    width = 0.5 * (float(post.rp_minus) + float(post.rp_plus))
    assert abs(med - fp_true) < 4.0 * max(width, 2e-5), (med, width)
    assert 1e-6 < width < 1e-3, width
    assert 0.1 < float(post.acceptance) < 0.95


@pytest.mark.slow
def test_posterior_weights_exclude_clipped_outliers():
    """weights= (the --clip-sigma keep mask) must gate the MCMC
    likelihood: a masked outlier exposure cannot drag the posterior
    median or inflate the free noise scale — so the report's LM and
    MCMC depths agree on WHICH exposures were fit."""
    from wayne_tpu.mcmc import sample_channel_posteriors
    from wayne_tpu.ops.kepler import projected_separation
    from wayne_tpu.ops.transit import transit_depth_curve

    base = example_scene(64)
    trends = TrendParams.create(hook_amp=0.003, hook_tau_s=300.0,
                                visit_slope_per_s=0.01 / 86400.0)
    t, t_orb, first = _orbit_times()
    rng = np.random.default_rng(9)
    sigma = 3e-4
    rp_true = 0.1595
    lc = (_white_model(t, t_orb, first, trends, base.orbit, base.ld,
                       rp_true)
          + sigma * rng.standard_normal(t.size).astype(np.float32))
    # one in-transit outlier (a residual CR / spot bump): +1% flux
    z, in_front = projected_separation(jnp.asarray(t), base.orbit)
    it = int(np.flatnonzero(np.asarray(in_front) * (np.asarray(z) < 0.7))
             [0])
    lc = np.asarray(lc).copy()
    lc[it] *= 1.01
    w = np.ones_like(lc)
    w[it] = 0.0

    kw = dict(n_steps=1200, n_burn=300)
    post_w = sample_white_posterior(
        jnp.asarray(lc), jnp.asarray(t), base.orbit, base.ld, 0.15,
        jax.random.PRNGKey(4), weights=jnp.asarray(w), **kw)
    post_no = sample_white_posterior(
        jnp.asarray(lc), jnp.asarray(t), base.orbit, base.ld, 0.15,
        jax.random.PRNGKey(4), **kw)
    med_w, med_no = float(post_w.rp_median), float(post_no.rp_median)
    assert abs(med_w - rp_true) < 1e-3, med_w
    assert abs(med_no - rp_true) > 2.0 * abs(med_w - rp_true), (
        med_no, med_w)
    # the weighted run's noise scale stays at the injected sigma; the
    # unweighted one absorbs the outlier
    ls_w = np.exp(np.median(np.asarray(post_w.samples[:, 6])))
    ls_no = np.exp(np.median(np.asarray(post_no.samples[:, 6])))
    assert abs(ls_w / sigma - 1.0) < 0.5, ls_w
    assert ls_no > 1.5 * ls_w, (ls_no, ls_w)

    # channel posteriors take the same mask
    f = transit_depth_curve(z, jnp.float32(rp_true), base.ld, 32)
    chan = np.asarray(1.0 - (1.0 - f) * in_front)[:, None].copy()
    chan[it, 0] *= 1.01
    cp_w = sample_channel_posteriors(
        jnp.asarray(chan, jnp.float32), jnp.asarray(t), base.orbit,
        base.ld, 0.158, jax.random.PRNGKey(7), n_steps=900, n_burn=250,
        weights=jnp.asarray(w))
    cp_no = sample_channel_posteriors(
        jnp.asarray(chan, jnp.float32), jnp.asarray(t), base.orbit,
        base.ld, 0.158, jax.random.PRNGKey(7), n_steps=900, n_burn=250)
    err_w = abs(float(cp_w.rp_median[0]) - rp_true)
    err_no = abs(float(cp_no.rp_median[0]) - rp_true)
    assert err_w < 5e-4, err_w
    assert err_no > 2.0 * err_w, (err_no, err_w)


@pytest.mark.slow
def test_program_posterior_recovers_spectrum_and_ttv():
    """sample_program_posterior: one shared spectrum + per-visit t0
    offsets jointly sampled over a 2-visit program's channel curves —
    the TTV result ships with a posterior, not just an LM sigma.
    Analytic closed loop: synthetic transit curves with visit 2's true
    mid-time walked +120 s; gates recovery, credible-interval
    calibration scale and convergence."""
    import dataclasses

    from wayne_tpu.mcmc import sample_program_posterior
    from wayne_tpu.ops.kepler import projected_separation
    from wayne_tpu.ops.transit import transit_depth_curve
    from wayne_tpu.reduction import out_of_transit_mask
    from wayne_tpu.scene import example_scene

    base = example_scene(16)
    orbit = base.orbit
    V, n_exp, K = 2, 40, 4
    rp_true = np.array([0.158, 0.160, 0.162, 0.159], np.float32)
    dt0_true = np.array([0.0, 120.0], np.float32)
    sig_pt = 4e-4
    t = np.broadcast_to(np.linspace(0.0, 4.0 * 3600.0, n_exp),
                        (V, n_exp)).copy()
    rng = np.random.default_rng(7)
    lc = np.zeros((V, n_exp, K), np.float32)
    for v in range(V):
        orb = dataclasses.replace(
            orbit, t0_s=orbit.t0_s + dt0_true[v])
        z, infr = projected_separation(jnp.asarray(t[v], jnp.float32),
                                       orb)
        for c in range(K):
            f = transit_depth_curve(z, jnp.float32(rp_true[c]),
                                    base.ld, 32)
            lc[v, :, c] = (np.asarray(1.0 - (1.0 - f) * infr)
                           + sig_pt * rng.standard_normal(n_exp))
    n_oot = np.array([float(np.asarray(out_of_transit_mask(
        jnp.asarray(t[v], jnp.float32), orbit)).sum())
        for v in range(V)])
    post = sample_program_posterior(
        jnp.asarray(lc), jnp.asarray(t, jnp.float32), orbit, base.ld,
        jnp.asarray(rp_true + 1e-3), jnp.asarray(dt0_true + 10.0),
        jnp.full((V, K), sig_pt, jnp.float32), jnp.asarray(n_oot),
        jax.random.PRNGKey(5), n_steps=5000, n_burn=2000)
    rp_med = np.asarray(post.rp_median)
    rp_w = 0.5 * (np.asarray(post.rp_minus) + np.asarray(post.rp_plus))
    assert np.all(np.abs(rp_med - rp_true) < 4.0 * rp_w), (rp_med,
                                                           rp_true, rp_w)
    assert np.all(rp_w > 1e-5) and np.all(rp_w < 3e-3)
    t0_med = np.asarray(post.t0_median_s)
    t0_w = 0.5 * (np.asarray(post.t0_minus_s) + np.asarray(post.t0_plus_s))
    assert np.all(np.abs(t0_med - dt0_true) < 4.0 * np.maximum(t0_w, 2.0)), (
        t0_med, t0_w)
    assert np.all(t0_w > 0.5) and np.all(t0_w < 60.0)
    # converged: worst split R-hat over the physical dims
    assert float(np.max(np.asarray(post.rhat)[: K + V])) < 1.15
    assert 0.1 < float(post.acceptance) < 0.9
