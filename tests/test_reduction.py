"""End-to-end scientific validation: simulate -> reduce -> recover depths.

This is the closed loop the Wayne paper validates manually (simulate a
visit, reduce it, recover the injected transmission spectrum) — here as
an automated test (SURVEY.md section 4, item 4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from wayne_tpu.calibration import synthetic_tables
from wayne_tpu.config import ExposureStatic, NoiseFlags
from wayne_tpu.ops.visit import simulate_visit
from wayne_tpu.reduction import fit_depths, reduce_visit
from wayne_tpu.scene import example_scene
import pytest

S, NL, NSAMP = 128, 64, 4
N_EXP = 40


def _simulate(noise, rp_wiggle=0.004, seed=0, scan=True):
    flags = noise
    cfg = ExposureStatic(subarray=S, n_lambda=NL, n_sub=4, nsamp=NSAMP,
                         samp_seq="SPARS10", scan=scan, noise=flags,
                         band_px=48)
    tables = synthetic_tables("G141", subarray=S, n_lambda=NL,
                              samp_seq="SPARS10", nsamp=NSAMP)
    base = example_scene(NL, scan_speed=1.0 if scan else 0.0)
    wl = np.asarray(tables.wl_centers)
    rp = 0.1595 + rp_wiggle * np.sin(10.0 * wl)
    base = dataclasses.replace(
        base, x_ref=jnp.float32(30.0), y_ref=jnp.float32(30.0),
        rp_over_rs=jnp.asarray(rp, jnp.float32))
    starts = np.linspace(0.0, 4.0 * 3600.0, N_EXP)   # transit at t0=2h
    scenes = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (N_EXP,) + x.shape), base)
    keys = jax.vmap(lambda i: jax.random.fold_in(
        jax.random.PRNGKey(seed), i))(jnp.arange(N_EXP))
    scenes = dataclasses.replace(
        scenes, exp_start_s=jnp.asarray(starts, jnp.float32), key=keys)
    out = simulate_visit(scenes, tables, cfg, chunk=8)
    exptime = float(tables.read_times[-1])
    mid = jnp.asarray(starts + exptime / 2.0, jnp.float32)
    return out, tables, base, mid, rp


def test_depth_recovery_noise_free():
    out, tables, base, mid, rp_inj = _simulate(NoiseFlags.none())
    red = reduce_visit(out.reads_dn, tables.gain, mid, base.orbit,
                       y_window=(20, 75), x_window=(72, 126),
                       bg_rows=(100, 126), n_chan=6)
    # white-light curve shows the transit
    w = np.asarray(red.white_lc)
    assert w.min() < 1.0 - 0.8 * 0.1595**2
    assert abs(np.median(w[:5]) - 1.0) < 1e-3

    rp_hat, _ = fit_depths(red.channel_lc, mid, base.orbit, base.ld,
                           jnp.float32(0.15))
    rp_hat = np.asarray(rp_hat)
    # mean recovered depth close to the injected continuum
    assert abs(rp_hat.mean() - 0.1595) < 0.004


def test_depth_recovery_with_noise():
    flags = dataclasses.replace(
        NoiseFlags.none(), poisson=True, read_noise=True, sky=True, dark=True)
    out, tables, base, mid, rp_inj = _simulate(flags, seed=3)
    red = reduce_visit(out.reads_dn, tables.gain, mid, base.orbit,
                       y_window=(20, 75), x_window=(72, 126),
                       bg_rows=(100, 126), n_chan=6)
    rp_hat, rp_sig = fit_depths(red.channel_lc, mid, base.orbit, base.ld,
                                jnp.float32(0.15))
    rp_hat, rp_sig = np.asarray(rp_hat), np.asarray(rp_sig)
    assert np.all(rp_sig > 0)
    # every channel within 6 sigma-or-1% of the injected continuum value
    tol = np.maximum(6.0 * rp_sig, 0.01 * 0.1595)
    assert np.all(np.abs(rp_hat - 0.1595) < np.maximum(tol, 0.006)), (
        rp_hat, rp_sig)


def test_depth_recovery_staring_mode():
    """Staring-mode visits (no spatial scan, static pixel-integrated
    PSF) close the same loop: noisy frames reduce to the injected depth
    — the scientific counterpart of BASELINE config 2, which only
    benchmarks the staring path's speed."""
    flags = dataclasses.replace(
        NoiseFlags.none(), poisson=True, read_noise=True, sky=True,
        dark=True)
    out, tables, base, mid, rp_inj = _simulate(flags, seed=7, scan=False)
    # staring: all flux concentrates on the trace rows around y_ref=30
    red = reduce_visit(out.reads_dn, tables.gain, mid, base.orbit,
                       y_window=(24, 38), x_window=(72, 126),
                       bg_rows=(70, 126), n_chan=6)
    w = np.asarray(red.white_lc)
    assert w.min() < 1.0 - 0.8 * 0.1595**2      # transit present
    rp_hat, rp_sig = fit_depths(red.channel_lc, mid, base.orbit, base.ld,
                                jnp.float32(0.15))
    rp_hat, rp_sig = np.asarray(rp_hat), np.asarray(rp_sig)
    tol = np.maximum(6.0 * rp_sig, 0.006)
    assert np.all(np.abs(rp_hat - 0.1595) < tol), (rp_hat, rp_sig)


def test_common_mode_correction_recovers_depths_under_systematics():
    # Full systematics ON (hook ramp, visit slope, SSV, drift) + noise;
    # the white-light common-mode template must absorb them.
    flags = dataclasses.replace(
        NoiseFlags.none(), poisson=True, read_noise=True, sky=True,
        dark=True, ssv=True, visit_trend=True)
    out, tables, base, mid, rp_inj = _simulate(flags, seed=11)
    from wayne_tpu.reduction import common_mode_correct
    red = reduce_visit(out.reads_dn, tables.gain, mid, base.orbit,
                       y_window=(20, 75), x_window=(72, 126),
                       bg_rows=(100, 126), n_chan=6)

    # uncorrected fits are pulled by the ramp; corrected ones recover
    raw_rp, _ = fit_depths(red.channel_lc, mid, base.orbit, base.ld,
                           jnp.float32(0.15))
    corrected = common_mode_correct(red.white_lc, red.channel_lc, mid,
                                    base.orbit, base.ld, jnp.float32(0.15))
    cor_rp, cor_sig = fit_depths(corrected, mid, base.orbit, base.ld,
                                 jnp.float32(0.15))
    cor_rp, cor_sig = np.asarray(cor_rp), np.asarray(cor_sig)
    tol = np.maximum(6.0 * cor_sig, 0.006)
    assert np.all(np.abs(cor_rp - 0.1595) < tol), (cor_rp, cor_sig)
    # correction should not be worse than the raw fit on average
    raw_err = np.abs(np.asarray(raw_rp) - 0.1595).mean()
    cor_err = np.abs(cor_rp - 0.1595).mean()
    assert cor_err <= raw_err + 1e-3


def test_run_reduce_cli_recovers_depth(tmp_path):
    """The file-level loop: generate() writes ima FITS, run_reduce reads
    them back (auto windows, host extraction) and recovers the injected
    depth — the in-repo form of 'reduce with a standard pipeline'."""
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
            "sma_over_rs": 4.855, "inclination": 82.1, "seed": 3}
    ppath = tmp_path / "pars.yml"
    ppath.write_text(yaml.safe_dump(pars))
    outdir = tmp_path / "visit"
    obs = Observation(load_yaml(str(ppath)))
    obs.generate(str(outdir), chunk=6, progress=lambda s: None)

    rc = reduce_main(["-d", str(outdir), "-p", str(ppath),
                      "--n-chan", "4", "--cpu"])
    assert rc == 0
    rep = json.loads((outdir / "reduced.json").read_text())
    assert rep["n_exposures"] == 18
    for c in rep["channels"]:
        assert abs(c["rp_over_rs"] - 0.14) < max(5 * c["rp_sigma"], 4e-3), c
    assert rep["channels"][0]["wl_lo_um"] < rep["channels"][-1]["wl_hi_um"]
    assert rep["wavelength_zero_point"]["source"] == "yaml"

    # real-pipeline wavelength anchoring: --direct-image measures the
    # source centroid from the visit-opening imaging exposure and must
    # land on the commanded pointing through the full noise chain
    rc = reduce_main(["-d", str(outdir), "-p", str(ppath),
                      "--n-chan", "4", "--cpu", "--detrend", "none",
                      "--direct-image", "--save-spectra", "--save-lc"])
    assert rc == 0
    rep = json.loads((outdir / "reduced.json").read_text())
    zp = rep["wavelength_zero_point"]
    assert zp["source"] == "direct_image"
    assert abs(zp["x_ref"] - 30.0) < 0.1 and abs(zp["y_ref"] - 40.0) < 0.1

    # --save-spectra writes the extracted-spectra FITS product
    from wayne_tpu.io.fits import read_fits

    hdus = {h.get("EXTNAME"): d for h, d in
            read_fits(str(outdir / "spectra.fits"))}
    assert hdus["SPECTRA"].shape == (18, 128)

    # --save-lc exports the fitted (detrended, normalised) channel
    # curves: n_exp x n_chan, out-of-transit baseline ~1, a real dip
    # in transit
    lc = np.asarray(rep["channel_lc"])
    assert lc.shape == (18, 4)
    assert abs(np.median(lc) - 1.0) < 0.01
    assert lc.min() < 0.99
    wl = hdus["WAVELENGTH"]
    assert wl.shape == (128,) and hdus["TIME"].shape == (18,)

    # explicit windows bypass auto-detection and still recover depths
    import pytest

    rc = reduce_main(["-d", str(outdir), "-p", str(ppath),
                      "--n-chan", "4", "--cpu", "--detrend", "none",
                      "--rows", "30:75", "--cols", "70:126",
                      "--bg-rows", "100:126"])
    assert rc == 0
    rep = json.loads((outdir / "reduced.json").read_text())
    assert rep["windows"]["rows"] == [30, 75]
    for c in rep["channels"]:
        assert abs(c["rp_over_rs"] - 0.14) < max(5 * c["rp_sigma"], 4e-3), c
    with pytest.raises(SystemExit):     # partial specification rejected
        reduce_main(["-d", str(outdir), "-p", str(ppath), "--cpu",
                     "--rows", "30:75"])
    with pytest.raises(SystemExit):     # out-of-frame range rejected
        reduce_main(["-d", str(outdir), "-p", str(ppath), "--cpu",
                     "--rows", "30:300", "--cols", "70:126",
                     "--bg-rows", "100:126"])


def test_run_reduce_scan_direction_normalisation(tmp_path):
    """Forward/reverse upstream-downstream offset closed loop: the
    simulator scales reverse-scan source flux by 1+offset and stamps
    SCAN_ANG=180 in those headers; run_reduce splits on SCAN_ANG,
    measures the offset from per-direction OOT baselines, removes it,
    and still recovers the injected depth."""
    import json

    import yaml

    from wayne_tpu.config import load_yaml
    from wayne_tpu.io.ima import read_ima
    from wayne_tpu.observation import Observation
    from wayne_tpu.run_reduce import main as reduce_main

    inj = 0.008
    pars = {"grism": "G141", "subarray": 128, "NSAMP": 4,
            "SAMPSEQ": "SPARS10", "scan": True,
            "alternate_scan_direction": True, "x_ref": 30.0,
            "y_ref": 40.0, "num_orbits": 3, "exposures_per_orbit": 6,
            "n_lambda": 64, "n_sub": 4, "rp_over_rs": 0.14,
            "start_mjd": 55999.93, "t0": 56000.0, "period": 0.813475,
            "sma_over_rs": 4.855, "inclination": 82.1, "seed": 5,
            "trends": {"reverse_flux_offset": inj}}
    ppath = tmp_path / "pars.yml"
    ppath.write_text(yaml.safe_dump(pars))
    outdir = tmp_path / "visit"
    obs = Observation(load_yaml(str(ppath)))
    obs.generate(str(outdir), chunk=6, progress=lambda s: None)

    # headers carry the direction: SCAN_ANG alternates 0/180
    paths = sorted(str(p) for p in outdir.glob("*_ima.fits"))
    angs = [read_ima(p)[0]["SCAN_ANG"] for p in paths]
    assert angs[::2] == [0.0] * 9 and angs[1::2] == [180.0] * 9

    rc = reduce_main(["-d", str(outdir), "-p", str(ppath),
                      "--n-chan", "4", "--cpu"])
    assert rc == 0
    rep = json.loads((outdir / "reduced.json").read_text())
    # the measured reverse-direction offset matches the injection to
    # within the OOT baselines' photon-noise error
    offs = rep["scan_direction_offsets"]
    assert set(offs) == {"180"} and abs(offs["180"] - inj) < 2.5e-3, offs
    for c in rep["channels"]:
        assert abs(c["rp_over_rs"] - 0.14) < max(5 * c["rp_sigma"], 4e-3), c
    # the corrected white curve shows no forward/reverse sawtooth: the
    # OOT even/odd means agree to photon noise
    white = np.asarray(rep["white_lc"])
    oot = white > 0.995            # transit depth ~2% >> noise ~1e-4
    assert oot[::2].sum() >= 2 and oot[1::2].sum() >= 2
    fw = white[::2][oot[::2]].mean()
    rv = white[1::2][oot[1::2]].mean()
    assert abs(fw - rv) < 2.5e-3, (fw, rv)


def test_fit_sky_model_unit():
    """The fitted background MODEL matches the truth to well under the
    photon noise (what matters — it is what gets subtracted; raw
    weights of near-collinear components are allowed to trade off), and
    the robust iteration survives an unmasked bright blob. With
    mean-removed structure components (the CLI convention) the weights
    themselves are recovered too."""
    from wayne_tpu.reduction import fit_sky_model

    rng = np.random.default_rng(3)
    S = 64
    u = np.linspace(0, 1, S)[None, :] * np.ones((S, 1))
    comps = np.stack([np.ones((S, S)), 1.0 + 0.2 * u,
                      1.0 - 0.3 * u * u]).astype(np.float32)
    w_true = np.array([[120.0, 30.0, 8.0], [90.0, 45.0, 2.0]], np.float32)
    truth = np.einsum("ek,kij->eij", w_true, comps).astype(np.float32)
    nets = truth + rng.normal(0.0, 0.5, truth.shape).astype(np.float32)
    # a bright unmasked artifact (CR survivor) in exposure 0
    nets[0, 10:13, 40:43] += 5e4
    mask = np.ones((S, S), np.float32)
    mask[25:40, :] = 0.0                       # pretend trace rows
    w, model = fit_sky_model(nets, comps, mask)
    assert np.abs(np.asarray(model) - truth).max() < 0.2    # << noise 0.5
    # mean-removed structure columns -> well-conditioned weights
    comps_mr = comps.copy()
    comps_mr[1] -= comps[1].mean()
    comps_mr[2] -= comps[2].mean()
    w_mr_true = w_true.copy()
    w_mr_true[:, 0] = (w_true[:, 0] + w_true[:, 1] * comps[1].mean()
                       + w_true[:, 2] * comps[2].mean())
    w_mr, model_mr = fit_sky_model(nets, comps_mr, mask)
    np.testing.assert_allclose(np.asarray(w_mr), w_mr_true, atol=0.6)
    assert np.abs(np.asarray(model_mr) - truth).max() < 0.2


@pytest.mark.slow
def test_run_reduce_sky_fit_components(tmp_path):
    """--sky-fit closed loop: a visit with sky + He airglow + dark on is
    reduced with the component-frame background model; depths stay
    unbiased and the fitted per-exposure he_airglow weights track the
    injected clipped-cosine orbital series."""
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
            "sma_over_rs": 4.855, "inclination": 82.1, "seed": 21,
            "sky_level": 1.5,
            # strong airglow so the per-exposure weight fit is
            # signal-dominated (weight sigma ~3-5 e- from the photon +
            # read noise over the ~8k sky pixels)
            "trends": {"he_airglow_level": 6.0}}
    ppath = tmp_path / "pars.yml"
    ppath.write_text(yaml.safe_dump(pars))
    outdir = tmp_path / "visit"
    obs = Observation(load_yaml(str(ppath)))
    he_inj = np.asarray(obs.scenes.sky_he_level)
    assert he_inj is not None and he_inj.max() > 5.0
    obs.generate(str(outdir), chunk=6, progress=lambda s: None)

    rc = reduce_main(["-d", str(outdir), "-p", str(ppath),
                      "--n-chan", "4", "--sky-fit", "--cpu"])
    assert rc == 0
    rep = json.loads((outdir / "reduced.json").read_text())
    sf = rep["sky_fit"]
    assert sf["components"] == ["constant", "master_sky", "he_airglow",
                                "dark"]
    w_he = np.asarray(sf["weights_per_exposure"]["he_airglow"])
    # fitted He electrons track the injected rate series: weight_i ~
    # he_level_i * exptime (the airglow varies by >1 e-/s/px across the
    # orbit, far above the fit noise)
    exptime = float(obs.tables.read_times[-1])
    resid = w_he - he_inj * exptime
    assert np.abs(resid).max() < 0.15 * he_inj.max() * exptime, (
        w_he, he_inj * exptime)
    for c in rep["channels"]:
        assert abs(c["rp_over_rs"] - 0.14) < max(5 * c["rp_sigma"], 4e-3), c


def test_fit_eclipse_depths_unit():
    """Linear eclipse fit recovers fp exactly on a noise-free synthetic
    curve with an arbitrary baseline scale."""
    import jax.numpy as jnp

    from wayne_tpu.ops.kepler import OrbitParams, projected_separation
    from wayne_tpu.ops.transit import uniform_disk_hidden_frac
    from wayne_tpu.reduction import fit_eclipse_depths

    period = 2.0 * 86400.0
    orbit = OrbitParams.create(period, 0.0, 8.0, np.deg2rad(90.0))
    t = jnp.linspace(0.40 * period, 0.60 * period, 41)
    rp = jnp.float32(0.12)
    z, infr = projected_separation(t, orbit)
    vis = 1.0 - uniform_disk_hidden_frac(z, rp) * (1.0 - infr)
    assert float(vis.min()) == 0.0 and float(vis.max()) == 1.0
    fp_true = jnp.array([1e-3, 5e-4, 0.0])
    lc = 0.97 * (1.0 + fp_true[None, :] * vis[:, None])   # scaled baseline
    fp_hat, fp_sig = fit_eclipse_depths(lc, t, orbit, rp)
    # f32 normal equations: ~1e-6 absolute — far below any real noise
    np.testing.assert_allclose(np.asarray(fp_hat), np.asarray(fp_true),
                               atol=5e-6)
    assert np.all(np.asarray(fp_sig) < 1e-5)              # noise-free


def test_fit_eclipse_depths_ignores_transit_epochs():
    """A visit covering BOTH events must not let the ~2.5% transit dip
    (unmodelled in the eclipse fit, ~15x the eclipse signal) bias fp:
    in-transit epochs are weighted out of the normal equations
    (regression)."""
    import jax.numpy as jnp

    from wayne_tpu.ops.kepler import OrbitParams, projected_separation
    from wayne_tpu.ops.transit import (transit_depth_curve,
                                       uniform_disk_hidden_frac)
    from wayne_tpu.reduction import fit_eclipse_depths

    period = 2.0 * 86400.0
    orbit = OrbitParams.create(period, 0.0, 8.0, np.deg2rad(90.0))
    t = jnp.linspace(-0.1 * period, 0.65 * period, 151)   # transit + eclipse
    rp = jnp.float32(0.12)
    ld = jnp.array([0.4, 0.1, 0.05, -0.02], jnp.float32)
    z, infr = projected_separation(t, orbit)
    vis = 1.0 - uniform_disk_hidden_frac(z, rp) * (1.0 - infr)
    f_tr = transit_depth_curve(z, rp, ld, 32)
    trans = 1.0 - (1.0 - f_tr) * infr                     # the transit dip
    assert float(trans.min()) < 0.99                      # dip IS covered
    fp_true = jnp.array([1e-3, 5e-4])
    lc = 0.97 * (1.0 + fp_true[None, :] * vis[:, None]) * trans[:, None]
    fp_hat, _ = fit_eclipse_depths(lc, t, orbit, rp)
    np.testing.assert_allclose(np.asarray(fp_hat), np.asarray(fp_true),
                               atol=5e-6)


@pytest.mark.slow
def test_run_reduce_eclipse_mode(tmp_path):
    """Eclipse visits round-trip: simulate with eclipse_depth, reduce
    with --mode eclipse, recover the injected Fp/Fs per channel."""
    import json

    import yaml

    from wayne_tpu.config import load_yaml
    from wayne_tpu.observation import Observation
    from wayne_tpu.run_reduce import main as reduce_main

    fp = 2e-3
    pars = {"grism": "G141", "subarray": 128, "NSAMP": 4,
            "SAMPSEQ": "SPARS10", "scan": True, "x_ref": 30.0,
            "y_ref": 40.0, "num_orbits": 3, "exposures_per_orbit": 6,
            "n_lambda": 64, "n_sub": 4, "eclipse_depth": fp,
            # visit spans the secondary eclipse at t0 + P/2 = 56000.4067
            "start_mjd": 56000.34, "t0": 56000.0, "period": 0.813475,
            "sma_over_rs": 4.855, "inclination": 82.1, "seed": 5}
    ppath = tmp_path / "pars.yml"
    ppath.write_text(yaml.safe_dump(pars))
    outdir = tmp_path / "visit"
    obs = Observation(load_yaml(str(ppath)))
    obs.generate(str(outdir), chunk=6, progress=lambda s: None)

    rc = reduce_main(["-d", str(outdir), "-p", str(ppath),
                      "--n-chan", "4", "--mode", "eclipse", "--cpu"])
    assert rc == 0
    rep = json.loads((outdir / "reduced.json").read_text())
    assert rep["mode"] == "eclipse"
    for c in rep["channels"]:
        assert abs(c["fp_over_fs"] - fp) < max(5 * c["fp_sigma"], 5e-4), c

    # parametric alternative: --detrend ramp fits Fp/Fs x slope x hook
    # on the white curve (absolute white eclipse depth) and divides the
    # fitted template before the per-channel eclipse fits
    rc = reduce_main(["-d", str(outdir), "-p", str(ppath),
                      "--n-chan", "4", "--mode", "eclipse", "--cpu",
                      "--detrend", "ramp", "--mcmc", "600"])
    assert rc == 0
    rep = json.loads((outdir / "reduced.json").read_text())
    wf = rep["white_ramp_fit"]
    assert abs(wf["fp_over_fs"] - fp) < max(5 * wf["fp_sigma"], 5e-4), wf
    wp = rep["white_posterior"]
    w_width = 0.5 * (wp["depth_plus"] + wp["depth_minus"])
    assert abs(wp["fp_over_fs_median"] - fp) < max(5.0 * w_width,
                                                   5e-4), wp
    for c in rep["channels"]:
        assert abs(c["fp_over_fs"] - fp) < max(5 * c["fp_sigma"], 5e-4), c
        cw = 0.5 * (c["fp_mcmc_plus"] + c["fp_mcmc_minus"])
        assert abs(c["fp_mcmc_median"] - fp) < max(5.0 * cw, 5e-4), c


def test_run_reduce_rate_product(tmp_path):
    """calwf3-style e-/s products reduce correctly: the zeroth rate
    plane is zero, so CDS must difference against the first sampled
    read or the bias pedestal dilutes the depths (regression)."""
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
            "sma_over_rs": 4.855, "inclination": 82.1, "seed": 3,
            "output_units": "e_per_s"}
    ppath = tmp_path / "pars.yml"
    ppath.write_text(yaml.safe_dump(pars))
    outdir = tmp_path / "visit"
    Observation(load_yaml(str(ppath))).generate(
        str(outdir), chunk=6, progress=lambda s: None)
    rc = reduce_main(["-d", str(outdir), "-p", str(ppath),
                      "--n-chan", "4", "--cpu"])
    assert rc == 0
    rep = json.loads((outdir / "reduced.json").read_text())
    for c in rep["channels"]:
        assert abs(c["rp_over_rs"] - 0.14) < max(5 * c["rp_sigma"], 4e-3), c


def test_ramp_slope_estimator():
    """Up-the-ramp slope fitting: equals CDS exactly on a noise-free
    linear ramp, and beats CDS's read-noise variance with NR reads."""
    import jax.numpy as jnp

    from wayne_tpu.reduction import ramp_slope_frame

    t = jnp.asarray([0.0, 2.0, 4.0, 6.0, 8.0], jnp.float32)
    rng = np.random.RandomState(0)
    rate = jnp.asarray(rng.uniform(1, 10, (16, 16)), jnp.float32)
    clean = rate[None] * t[:, None, None]
    np.testing.assert_allclose(np.asarray(ramp_slope_frame(clean, t)),
                               np.asarray(rate * 8.0), rtol=1e-5)
    # read-noise-limited: slope variance ~ 6(NR-1)/(NR(NR+1)) of CDS's
    nr = len(t)
    noise = rng.standard_normal((200,) + clean.shape).astype(np.float32)
    ramp_est = np.stack([np.asarray(ramp_slope_frame(
        clean + jnp.asarray(n), t)) for n in noise])
    cds_est = np.stack([(clean[-1] + n[-1]) - (clean[0] + n[0])
                        for n in noise])
    ratio = ramp_est.var(axis=0).mean() / cds_est.var(axis=0).mean()
    expect = 6.0 * (nr - 1) / (nr * (nr + 1))
    np.testing.assert_allclose(ratio, expect, rtol=0.25)


def test_reduce_visit_ramp_path():
    """reduce_visit(read_times=...) — the library-level ramp plumbing —
    matches the CDS reduction exactly with noise off (linear ramps)."""
    out, tables, base, mid, rp_inj = _simulate(NoiseFlags.none())
    kw = dict(y_window=(20, 75), x_window=(72, 126), bg_rows=(100, 126),
              n_chan=6)
    cds = reduce_visit(out.reads_dn, tables.gain, mid, base.orbit, **kw)
    ramp = reduce_visit(out.reads_dn, tables.gain, mid, base.orbit,
                        read_times=tables.read_times, **kw)
    np.testing.assert_allclose(np.asarray(ramp.white_lc),
                               np.asarray(cds.white_lc), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ramp.channel_lc),
                               np.asarray(cds.channel_lc), atol=5e-5)


def test_run_reduce_ramp_estimator(tmp_path):
    """--estimator ramp recovers the injected depth from disk products."""
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
            "sma_over_rs": 4.855, "inclination": 82.1, "seed": 3}
    ppath = tmp_path / "pars.yml"
    ppath.write_text(yaml.safe_dump(pars))
    outdir = tmp_path / "visit"
    Observation(load_yaml(str(ppath))).generate(
        str(outdir), chunk=6, progress=lambda s: None)
    rc = reduce_main(["-d", str(outdir), "-p", str(ppath),
                      "--n-chan", "4", "--estimator", "ramp", "--cpu"])
    assert rc == 0
    rep = json.loads((outdir / "reduced.json").read_text())
    assert rep["estimator"] == "ramp"
    for c in rep["channels"]:
        assert abs(c["rp_over_rs"] - 0.14) < max(5 * c["rp_sigma"], 4e-3), c


@pytest.mark.slow
def test_run_reduce_wl_range_clip(tmp_path):
    """--wl-range clips the channel band in WAVELENGTH via the trace
    solution (the published-convention cut against sensitivity-cliff
    edge bins): channels stay inside the range, depths still recover,
    and a range with no overlap fails loudly."""
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
            "sma_over_rs": 4.855, "inclination": 82.1, "seed": 5}
    ppath = tmp_path / "pars.yml"
    ppath.write_text(yaml.safe_dump(pars))
    outdir = tmp_path / "visit"
    Observation(load_yaml(str(ppath))).generate(
        str(outdir), chunk=6, progress=lambda s: None)

    rc = reduce_main(["-d", str(outdir), "-p", str(ppath), "--cpu",
                      "--n-chan", "4", "--wl-range", "1.125:1.65",
                      "-o", str(outdir / "red.json")])
    assert rc == 0
    rep = json.loads((outdir / "red.json").read_text())
    for c in rep["channels"]:
        assert 1.10 <= c["wl_lo_um"] <= 1.66, c
        assert 1.10 <= c["wl_hi_um"] <= 1.66, c
        assert abs(c["rp_over_rs"] - 0.14) < max(5 * c["rp_sigma"],
                                                 0.01), c
    # a range with no overlap fails loudly, not silently
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="wl-range"):
        reduce_main(["-d", str(outdir), "-p", str(ppath), "--cpu",
                     "--n-chan", "4", "--wl-range", "2.0:2.5",
                     "-o", str(outdir / "red2.json")])


def test_amp_offset_correct_recovers_quadrant_offsets():
    """Per-exposure per-amplifier offsets injected into net frames are
    removed exactly (median estimator, source box excluded) — the
    reference-pixel-less-subarray correction (reduction.
    amp_offset_correct). A source in one quadrant must not bias it."""
    import dataclasses as _dc

    from wayne_tpu.calibration import quadrant_map
    from wayne_tpu.reduction import amp_offset_correct

    S = 64
    rng = np.random.default_rng(3)
    quad = quadrant_map(S)
    nets = 0.01 * rng.standard_normal((3, S, S)).astype(np.float32)
    yw, xw = (10, 30), (8, 56)
    nets[:, yw[0]: yw[1], xw[0]: xw[1]] += 50.0       # bright source
    offs = rng.normal(0.0, 2.0, (3, 4)).astype(np.float32)
    dirty = nets + offs[:, np.asarray(quad)]
    fixed = np.asarray(amp_offset_correct(
        jnp.asarray(dirty), quad, yw, xw))
    # off-source pixels return to the clean frame (median exactness
    # up to the noise floor of the median estimate)
    src = np.zeros((S, S), bool)
    src[yw[0]: yw[1], xw[0]: xw[1]] = True
    resid = (fixed - nets)[:, ~src]
    assert np.abs(resid).max() < 5e-3, np.abs(resid).max()
    # and the SOURCE pixels had their quadrant's offset removed too
    resid_src = (fixed - nets)[:, src]
    assert np.abs(resid_src).max() < 5e-3


def test_amp_offset_correct_covered_quadrant_stays_finite():
    """A quadrant fully covered by the source box has no off-source
    estimator: it must be left UNCORRECTED (offset 0), never set to
    nanmedian(all-NaN) = NaN across the whole quadrant."""
    from wayne_tpu.calibration import quadrant_map
    from wayne_tpu.reduction import amp_offset_correct

    S = 64
    quad = np.asarray(quadrant_map(S))
    rng = np.random.default_rng(2)
    # background-subtracted-like frames: ~0 off source
    nets = 0.01 * rng.standard_normal((2, S, S)).astype(np.float32)
    # source box covering quadrant 0 entirely (rows/cols 0:32)
    yw, xw = (0, 48), (0, 48)
    src = np.zeros((S, S), bool)
    src[yw[0]: yw[1], xw[0]: xw[1]] = True
    assert ((quad == 0) & ~src).sum() == 0      # the hazard case
    fixed = np.asarray(amp_offset_correct(
        jnp.asarray(nets), quad, yw, xw))
    assert np.isfinite(fixed).all()
    # covered quadrant passes through UNCHANGED (offset 0); others get
    # only their ~0 median removed
    np.testing.assert_array_equal(fixed[:, quad == 0],
                                  nets[:, quad == 0])
    np.testing.assert_allclose(fixed, nets, atol=5e-3)
