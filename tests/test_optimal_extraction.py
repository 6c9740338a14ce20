"""Horne (1986) optimal extraction: exactness, variance win, pipeline
and CLI integration. Beyond the reference's validation loop — Iraclis
and calwf3-era pipelines use profile-weighted extraction; this is the
in-repo equivalent for the simulated products."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wayne_tpu.calibration import synthetic_tables
from wayne_tpu.config import ExposureStatic, NoiseFlags
from wayne_tpu.ops.visit import simulate_visit
from wayne_tpu.reduction import (
    fit_depths, optimal_extract, read_noise_var_e2, reduce_visit,
    spatial_profile,
)
from wayne_tpu.scene import example_scene


def _gauss_profile(w, s, row=16.0, sig=2.0):
    y = np.arange(w, dtype=np.float64)
    p = np.exp(-0.5 * ((y - row) / sig) ** 2)
    p = p / p.sum()
    return np.broadcast_to(p[:, None], (w, s)).copy()


def test_flux_conservation_exact():
    """When D is proportional to P the estimator returns the flux
    EXACTLY, for any variance model — the Horne identity."""
    w, s = 32, 40
    p = _gauss_profile(w, s)
    f = 100.0 + 10.0 * np.sin(np.arange(s))
    frame = np.zeros((48, s))
    frame[8: 8 + w] = p * f[None, :]
    got = np.asarray(optimal_extract(
        jnp.asarray(frame, jnp.float32), jnp.asarray(p, jnp.float32),
        (8, 8 + w), 288.0))
    np.testing.assert_allclose(got, f, rtol=1e-5)


def test_spatial_profile_normalised_with_flat_fallback():
    w, s = 24, 30
    frame = np.zeros((32, s), np.float32)
    frame[4: 4 + w, : 20] = _gauss_profile(w, 20, row=12.0) * 500.0
    prof = np.asarray(spatial_profile(jnp.asarray(frame), (4, 4 + w),
                                      smooth_x=0))
    np.testing.assert_allclose(prof.sum(axis=0), 1.0, rtol=1e-5)
    # columns >= 20 carry nothing: flat fallback
    np.testing.assert_allclose(prof[:, 25], 1.0 / w, rtol=1e-5)


def test_variance_win_read_noise_limited():
    """In the read-noise-limited regime the optimal estimator's scatter
    approaches 1/sum(P^2/V) — well below the box sum's W * rn^2."""
    rng = np.random.RandomState(11)
    w, s, n = 32, 16, 400
    rn = 20.0
    p = _gauss_profile(w, s)
    f = 150.0
    frames = f * p[None] + rn * rng.standard_normal((n, 48, s))[:, 8: 8 + w]
    full = np.zeros((n, 48, s), np.float32)
    full[:, 8: 8 + w] = frames
    prof = spatial_profile(jnp.asarray(full.mean(axis=0)), (8, 8 + w))
    floor = 2.0 * rn * rn
    opt = np.asarray(optimal_extract(jnp.asarray(full), prof, (8, 8 + w),
                                     floor))
    box = full[:, 8: 8 + w].sum(axis=1)
    r = opt.std(axis=0).mean() / box.std(axis=0).mean()
    assert r < 0.6, r            # theory ~0.47 for sigma_y = 2, W = 32
    # Bias stays below 1% of flux: the residual comes from estimating
    # the profile from the noisy mean frame, is MULTIPLICATIVE and
    # static across the visit, so it divides out of normalised light
    # curves (the quantity the depth fits consume).
    assert abs(opt.mean() - f) < 0.01 * f, opt.mean()


def test_read_noise_var_e2():
    assert read_noise_var_e2(12.0, 16) == 2.0 * 144.0
    ramp = read_noise_var_e2(12.0, 16, ramp=True)
    assert ramp == 144.0 * 12.0 * 15.0 / (16.0 * 17.0)
    assert ramp < 2.0 * 144.0 / 2.9          # ~3x variance win at NR=16


@pytest.mark.slow
def test_reduce_visit_optimal_recovers_depths():
    """The jitted pipeline with optimal=True closes the depth loop on a
    noisy scanned visit and does not inflate the white-light scatter."""
    S, NL, NSAMP, n_exp = 128, 64, 4, 40
    flags = dataclasses.replace(
        NoiseFlags.none(), poisson=True, read_noise=True, sky=True,
        dark=True)
    cfg = ExposureStatic(subarray=S, n_lambda=NL, n_sub=4, nsamp=NSAMP,
                         samp_seq="SPARS10", scan=True, noise=flags,
                         band_px=48)
    tables = synthetic_tables("G141", subarray=S, n_lambda=NL,
                              samp_seq="SPARS10", nsamp=NSAMP)
    base = dataclasses.replace(
        example_scene(NL, scan_speed=1.0), x_ref=jnp.float32(30.0),
        y_ref=jnp.float32(30.0))
    starts = np.linspace(0.0, 4.0 * 3600.0, n_exp)
    scenes = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n_exp,) + x.shape), base)
    keys = jax.vmap(lambda i: jax.random.fold_in(
        jax.random.PRNGKey(5), i))(jnp.arange(n_exp))
    scenes = dataclasses.replace(
        scenes, exp_start_s=jnp.asarray(starts, jnp.float32), key=keys)
    out = simulate_visit(scenes, tables, cfg, chunk=8)
    mid = jnp.asarray(starts + float(tables.read_times[-1]) / 2.0,
                      jnp.float32)
    kw = dict(y_window=(20, 75), x_window=(72, 126), bg_rows=(100, 126),
              n_chan=6)
    rn = float(tables.read_noise_e)
    red_o = reduce_visit(out.reads_dn, tables.gain, mid, base.orbit,
                         optimal=True, read_noise_e=rn, **kw)
    red_b = reduce_visit(out.reads_dn, tables.gain, mid, base.orbit, **kw)
    rp_o, sig_o = fit_depths(red_o.channel_lc, mid, base.orbit, base.ld,
                             jnp.float32(0.15))
    rp_o, sig_o = np.asarray(rp_o), np.asarray(sig_o)
    tol = np.maximum(6.0 * sig_o, 0.006)
    assert np.all(np.abs(rp_o - 0.1595) < tol), (rp_o, sig_o)
    # out-of-transit white scatter: optimal never pays more than a few
    # percent over box (scan visits are signal-dominated; the win shows
    # in the read-noise-limited regime, see test_variance_win)
    oot = np.asarray(mid) < 3600.0
    s_o = np.std(np.asarray(red_o.white_lc)[oot])
    s_b = np.std(np.asarray(red_b.white_lc)[oot])
    assert s_o < 1.15 * s_b, (s_o, s_b)


@pytest.mark.slow
def test_run_reduce_cli_optimal(tmp_path):
    """--extract optimal on a faint, read-noise-limited staring visit:
    recovers the depth and beats box extraction's fit uncertainty."""
    import json

    import yaml

    from wayne_tpu.config import load_yaml
    from wayne_tpu.observation import Observation
    from wayne_tpu.run_reduce import main as reduce_main

    # x_ref=30 puts the G141 +1st-order trace at columns ~72-126: fully
    # ON the 128 subarray (at x_ref=15/subarray 64 the trace is mostly
    # clipped and the reduction fits noise — caught by hand-driving the
    # CLI, hence the sigma sanity caps below). mag_J=10.5 keeps the
    # wings read-noise-limited so profile weighting has a real edge.
    pars = {"grism": "G141", "subarray": 128, "NSAMP": 2,
            "SAMPSEQ": "RAPID", "scan": False, "x_ref": 30.0,
            "y_ref": 30.0, "num_orbits": 3, "exposures_per_orbit": 6,
            "n_lambda": 64, "n_sub": 2, "mag_J": 10.5,
            "rp_over_rs": 0.14, "start_mjd": 55999.93, "t0": 56000.0,
            "period": 0.813475, "sma_over_rs": 4.855, "inclination": 82.1,
            "seed": 3}
    ppath = tmp_path / "pars.yml"
    ppath.write_text(yaml.safe_dump(pars))
    outdir = tmp_path / "visit"
    obs = Observation(load_yaml(str(ppath)))
    obs.generate(str(outdir), chunk=6, progress=lambda s: None)

    sig = {}
    for mode in ("box", "optimal"):
        rc = reduce_main(["-d", str(outdir), "-p", str(ppath),
                          "--n-chan", "4", "--cpu", "--extract", mode,
                          "-o", str(outdir / f"red_{mode}.json")])
        assert rc == 0
        rep = json.loads((outdir / f"red_{mode}.json").read_text())
        assert rep["extraction"] == mode
        for c in rep["channels"]:
            # sigma cap FIRST: a sigma-scaled tolerance alone lets a
            # noise-only fit (sigma ~ 1e7) pass trivially (0.1: the
            # faint bluest channel reports ~0.065 now that fit_depths
            # carries the OOT-baseline + red-noise terms)
            assert c["rp_sigma"] < 0.1, (mode, c)
            assert abs(c["rp_over_rs"] - 0.14) < max(5 * c["rp_sigma"],
                                                     0.01), (mode, c)
        sig[mode] = np.mean([c["rp_sigma"] for c in rep["channels"]])
    # measured: 0.0103 vs 0.0216 — profile weighting halves the fit
    # uncertainty on this read-noise-limited staring visit
    assert sig["optimal"] < 0.8 * sig["box"], sig
