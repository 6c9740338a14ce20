"""Multi-visit observing programs (wayne_tpu/program.py).

Reference scope: one visit per run (wayne/run_visit.py). The program
layer is a wayne_tpu extension; these tests close the loop on its two
cross-visit physics claims — persistence carried over visit boundaries
and per-visit true-ephemeris drift — plus the scheduling/resume seams.
"""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from wayne_tpu.config import config_from_dict
from wayne_tpu.program import Program, visit_config, visit_start_mjds


def _base_params(**extra):
    p = {"grism": "G141", "subarray": 64, "NSAMP": 2, "SAMPSEQ": "RAPID",
         "scan": True, "scan_speed": 0.3, "x_ref": 12.0, "y_ref": 20.0,
         "num_orbits": 1, "exposures_per_orbit": 4, "n_lambda": 32,
         "n_sub": 2, "start_mjd": 55999.95, "t0": 56000.0,
         "period": 0.813475, "sma_over_rs": 4.855, "inclination": 82.1,
         "rp_over_rs": 0.1595, "seed": 3,
         "noise": {"read_noise": True, "sky": True, "dark": True}}
    p.update(extra)
    return p


def test_visit_schedule_and_drift():
    cfg = config_from_dict(_base_params(program={
        "num_visits": 3, "visit_spacing_days": 0.0,
        "t0_drift_s_per_visit": 45.0}))
    starts = visit_start_mjds(cfg)
    # spacing 0 -> whole periods, at least a day: ceil(1/0.8135) = 2
    assert np.allclose(np.diff(starts), 2 * 0.813475)
    v0, v2 = visit_config(cfg, 0, starts), visit_config(cfg, 2, starts)
    assert v0.start_mjd == starts[0] and v2.start_mjd == starts[2]
    # the TRUE t0 drifts; the program-level (assumed) t0 does not
    assert v0.planet.t0_mjd == cfg.planet.t0_mjd
    assert np.isclose(v2.planet.t0_mjd - cfg.planet.t0_mjd,
                      90.0 / 86400.0)
    # per-visit seeds differ (independent noise realisations)
    assert v0.seed != v2.seed
    # explicit list must match num_visits
    import pytest

    with pytest.raises(ValueError, match="entries"):
        visit_start_mjds(config_from_dict(_base_params(
            program={"num_visits": 3,
                     "visit_start_mjds": [56000.0, 56002.0]})))


def test_program_yaml_roundtrip(tmp_path):
    path = tmp_path / "prog.yml"
    path.write_text(yaml.safe_dump(_base_params(program={
        "num_visits": 2, "carry_persistence": False})))
    from wayne_tpu.config import load_yaml

    cfg = load_yaml(str(path))
    assert cfg.program.num_visits == 2
    assert cfg.program.carry_persistence is False
    import pytest

    with pytest.raises(ValueError, match="unknown program keys"):
        config_from_dict(_base_params(program={"num_visit": 2}))


def test_two_visit_carry_closed_loop(tmp_path):
    """The carried stimulus is real physics, not just files: visit 2's
    frames open with visit 1's afterglow decaying through them, and the
    carry seam changes visit 2 exactly where visit 1 illuminated."""
    params = _base_params(
        program={"num_visits": 2, "visit_spacing_days": 0.0},
        # large amplitude + low knee so the short RAPID 64^2 test
        # scene (peak fluence ~1.3 ke-) genuinely stimulates
        persistence={"amplitude_e_s": 50.0, "x0_e": 600.0,
                     "dx_e": 300.0, "direct_image": False})
    cfg = config_from_dict(params)
    prog = Program(cfg)
    assert prog.carry
    out = tmp_path / "prog"
    paths = prog.generate(str(out), chunk=4, progress=lambda s: None)
    assert [len(p) for p in paths] == [4, 4]
    assert (out / "visit_00" / Program.CARRY_FILE).exists()
    meta = json.loads((out / "visit_00" / Program.CARRY_META).read_text())
    assert meta["peak_fluence_e"] > 600.0       # above the knee
    summary = json.loads((out / "program_summary.json").read_text())
    assert len(summary["visits"]) == 2
    # visit 1 wrote no carry consumer; visit 2 consumed visit 1's map:
    # rebuild visit 2's Observation both ways and compare persist rates
    from wayne_tpu.observation import Observation

    starts = prog.starts
    v1 = visit_config(cfg, 1, starts)
    obs_carry = Observation(v1)
    obs_carry.cfg.persistence = dataclasses.replace(
        obs_carry.cfg.persistence,
        prior_fluence_file=str(out / "visit_00" / Program.CARRY_FILE),
        prior_end_s=(meta["end_mjd"] - v1.start_mjd) * 86400.0)
    obs_carry._ensure_persistence(chunk=4)
    rate_carry = np.asarray(obs_carry.scenes.persist_rate)

    obs_plain = Observation(visit_config(cfg, 1, starts))
    obs_plain._ensure_persistence(chunk=4)
    rate_plain = np.asarray(obs_plain.scenes.persist_rate)

    extra = rate_carry - rate_plain
    assert extra.min() >= -1e-6                  # afterglow only adds
    assert extra.max() > 0.1                     # and it is material
    # the afterglow decays: first exposure sees more than the last
    assert extra[0].sum() > extra[-1].sum()
    # it lands where visit 1's trace illuminated, not everywhere
    stim = np.load(out / "visit_00" / Program.CARRY_FILE)
    hot = stim > 600.0
    assert 0 < hot.sum() < hot.size
    # soft sigmoid knee (dx_e=300): trace wings at a few hundred e-
    # still respond, so the contrast is a few-x, not orders
    assert extra[0][hot].mean() > 3 * max(extra[0][~hot].mean(), 1e-9)


def test_run_program_cli_and_resume(tmp_path):
    from wayne_tpu.run_program import main as prog_main

    path = tmp_path / "prog.yml"
    params = _base_params(program={"num_visits": 2,
                                   "visit_spacing_days": 2.0,
                                   "carry_persistence": False})
    path.write_text(yaml.safe_dump(params))
    out = tmp_path / "out"
    rc = prog_main(["-p", str(path), "-o", str(out), "--chunk", "4",
                    "--cpu"])
    assert rc == 0
    first = sorted((out / "visit_01").glob("*_ima.fits"))
    assert len(first) == 4
    mtimes = [p.stat().st_mtime_ns for p in first]
    # resume: nothing rewritten
    rc = prog_main(["-p", str(path), "-o", str(out), "--chunk", "4",
                    "--cpu"])
    assert rc == 0
    assert [p.stat().st_mtime_ns for p in first] == mtimes


@pytest.mark.slow
def test_program_ephemeris_drift_recovered(tmp_path):
    """The point of multi-visit programs: the injected true-ephemeris
    drift is recovered from the per-visit fitted transit times measured
    against the stale assumed ephemeris (tools/program_ephemeris.py)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.program_ephemeris import measure_program_ephemeris

    # Coverage matters (CLAUDE.md invariant): t0 sits ~9700 s into the
    # visit so INGRESS falls in one orbit's visibility window and
    # EGRESS in the next — the same 5-orbit/90-s-cadence shape
    # tests/test_ramp_fit.py::test_fit_white_ramp_geometry validates
    # for the free-geometry fit. (A continuous gap-free schedule or
    # one-contact coverage leaves t0 degenerate and the fit diverges.)
    t0 = 56000.0
    # SPARS10/NSAMP=4 (~31 s exposures) + J=9.5 + scan 2.0 px/s:
    # enough photons that the per-visit fitted-t0 noise sits well
    # under the injected 120 s/visit walk (RAPID 2.7 s exposures
    # measured ~130 s rms), and the faster scan keeps the peak at 21%%
    # of full well (the ETC flags 139%% saturation at 0.3 px/s — a
    # clipped transit walks the t0 fit to its grid bound)
    params = {"grism": "G141", "subarray": 128, "NSAMP": 4,
              "SAMPSEQ": "SPARS10", "scan": True, "scan_speed": 2.0,
              "x_ref": 30.0, "y_ref": 40.0, "num_orbits": 5,
              "exposures_per_orbit": 30, "exposure_overhead_s": 60.0,
              "mag_J": 9.5, "n_lambda": 48, "n_sub": 2,
              "start_mjd": t0 - 9700.0 / 86400.0, "t0": t0,
              "period": 0.813475,
              "sma_over_rs": 4.855, "inclination": 82.1,
              "rp_over_rs": 0.1595, "seed": 11,
              "noise": {"read_noise": True, "sky": True, "dark": True},
              "program": {"num_visits": 3, "visit_spacing_days": 0.0,
                          "carry_persistence": False,
                          "t0_drift_s_per_visit": 120.0}}
    ppath = tmp_path / "prog.yml"
    ppath.write_text(yaml.safe_dump(params))
    from wayne_tpu.config import load_yaml

    out = tmp_path / "prog"
    Program(load_yaml(str(ppath))).generate(
        str(out), chunk=8, progress=lambda s: None)
    eph = measure_program_ephemeris(str(out), str(ppath), n_chan=4,
                                    cpu=True)
    # per-visit fitted offsets track the injected 0/120/240 s walk
    fitted = np.array(eph["per_visit_t0_offset_s"])
    injected = np.array(eph["per_visit_injected_offset_s"])
    np.testing.assert_allclose(injected, [0.0, 120.0, 240.0], atol=0.5)
    assert np.all(np.abs(fitted - injected) < 60.0), (fitted, injected)
    assert abs(eph["drift_s_per_visit_fitted"] - 120.0) < 45.0, eph
    # the program-level combined spectrum: depths recover the injected
    # flat 0.1595 and the visits agree with each other (repeatability)
    comb = eph["combined_spectrum"]
    rp_c = np.array([c["rp_over_rs"] for c in comb])
    sig_c = np.array([c["rp_sigma"] for c in comb])
    assert np.all(np.abs(rp_c - 0.1595) < np.maximum(5 * sig_c, 0.005)), (
        rp_c, sig_c)
    assert np.all(np.array([c["repeatability_chi2_per_dof"]
                            for c in comb]) < 6.0), comb


@pytest.mark.slow
def test_joint_retrieval_shared_spectrum_and_drift(tmp_path):
    """run_retrieve --program: one shared Rp/Rs spectrum fitted jointly
    across a 2-visit program through the forward model, with per-visit
    t0 offsets recovering the injected ephemeris drift. (Geometry is
    FIXED at the model's values here, so dt0 is identified even from
    modest coverage — unlike the free-geometry ramp fit.)"""
    from wayne_tpu.config import load_yaml
    from wayne_tpu.run_retrieve import main as retrieve_main

    t0 = 56000.0
    offsets_min = [-70, -60, -50, -40, -30, -20, -10, 0, 10, 20, 30,
                   40, 50, 60, 70]
    times = [t0 + m / 1440.0 for m in offsets_min]
    wl = None
    params = {"grism": "G141", "subarray": 128, "NSAMP": 3,
              "SAMPSEQ": "SPARS10", "scan": True, "scan_speed": 1.0,
              "x_ref": 30.0, "y_ref": 30.0,
              "exp_start_times": times, "start_mjd": times[0],
              "n_lambda": 48, "n_sub": 2, "t0": t0,
              "period": 0.813475, "sma_over_rs": 4.855,
              "inclination": 82.1, "rp_over_rs": 0.1595, "seed": 21,
              "noise": {"read_noise": True, "sky": True, "dark": True},
              # persistence carried across the visit boundary: the
              # retrieval model must thread visit 1's afterglow or the
              # unmodelled first-orbit ramp biases rp and dt0
              "persistence": {"amplitude_e_s": 20.0, "x0_e": 2000.0,
                              "dx_e": 1000.0, "direct_image": False},
              "program": {"num_visits": 2, "visit_spacing_days": 0.0,
                          "carry_persistence": True,
                          "t0_drift_s_per_visit": 180.0}}
    ppath = tmp_path / "prog.yml"
    ppath.write_text(yaml.safe_dump(params))
    out = tmp_path / "prog"
    Program(load_yaml(str(ppath))).generate(
        str(out), chunk=5, progress=lambda s: None)

    rc = retrieve_main(["-d", str(out), "-p", str(ppath), "--program",
                        "--cpu", "--n-chan", "4", "--chunk", "3",
                        "--n-lm", "8", "--mcmc", "3000"])
    assert rc == 0
    rep = json.loads((out / "retrieved_joint.json").read_text())
    assert rep["n_visits"] == 2
    # the TTV ships with a POSTERIOR: per-visit t0 credible intervals
    # from the joint (spectrum, t0, baselines) Goodman-Weare chain
    pp = rep["program_posterior"]
    t0_pcts = np.array(pp["t0_offsets_percentiles_16_50_84_s"])
    assert t0_pcts.shape == (2, 3)
    assert abs(t0_pcts[0, 1]) < 40.0, t0_pcts
    assert abs(t0_pcts[1, 1] - 180.0) < 40.0, t0_pcts
    widths = 0.5 * (t0_pcts[:, 2] - t0_pcts[:, 0])
    assert np.all((widths > 0.5) & (widths < 120.0)), t0_pcts
    assert pp["rhat_max"] < 1.3 and 0.05 < pp["acceptance"] < 0.95
    rp_pcts = np.array(pp["rp_percentiles_16_50_84"])
    assert np.all(np.abs(rp_pcts[:, 1] - 0.1595)
                  < np.maximum(5 * 0.5 * (rp_pcts[:, 2] - rp_pcts[:, 0]),
                               0.004))
    t0s = np.array(rep["t0_offsets_s"])
    # visit 1 at the assumed ephemeris, visit 2 walked 180 s
    assert abs(t0s[0]) < 30.0, t0s
    assert abs(t0s[1] - 180.0) < 30.0, t0s
    assert abs(rep["drift_s_per_visit_fitted"] - 180.0) < 30.0
    # the SHARED spectrum lands on the injected flat 0.1595
    rp = np.array([c["rp_over_rs"] for c in rep["channels"]])
    sig = np.array([c["rp_sigma"] for c in rep["channels"]])
    assert np.all(np.abs(rp - 0.1595) < np.maximum(5 * sig, 0.004)), (
        rp, sig)
    assert np.all((sig > 0) & (sig < 0.01)), sig


def test_carry_reuse_rejects_stale_config(tmp_path):
    """Resuming a program after editing the YAML must not feed visit N
    a stale prior-fluence map: the carry meta is stamped with a config
    fingerprint and recomputed on mismatch (advisor round-4 finding)."""
    params = _base_params(
        program={"num_visits": 2, "visit_spacing_days": 0.0},
        persistence={"amplitude_e_s": 50.0, "x0_e": 600.0,
                     "dx_e": 300.0, "direct_image": False})
    out = tmp_path / "prog"
    prog = Program(config_from_dict(params))
    prog.generate(str(out), chunk=4, progress=lambda s: None)
    meta_p = out / "visit_00" / Program.CARRY_META
    npy_p = out / "visit_00" / Program.CARRY_FILE
    sha0 = json.loads(meta_p.read_text())["config_sha"]
    m0 = npy_p.stat().st_mtime_ns

    # same config, full resume: carry reused untouched
    prog.generate(str(out), chunk=4, progress=lambda s: None)
    assert npy_p.stat().st_mtime_ns == m0
    assert json.loads(meta_p.read_text())["config_sha"] == sha0

    # edited persistence params, resume into the same outdir: the
    # visits rewrite nothing (FITS files exist) but the carry products
    # must be recomputed, not trusted
    params2 = dict(params)
    params2["persistence"] = dict(params["persistence"],
                                  amplitude_e_s=80.0)
    Program(config_from_dict(params2)).generate(
        str(out), chunk=4, progress=lambda s: None)
    assert npy_p.stat().st_mtime_ns != m0
    assert json.loads(meta_p.read_text())["config_sha"] != sha0
