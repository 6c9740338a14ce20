"""Closed-form thermal phase-curve fitting (reduction.fit_phase_curve).

The simulator makes full phase-curve visits (dayside light modulated by
the orbital phase, hidden at secondary eclipse); these tests close that
loop: the linear harmonic fit recovers (fp, A, hot-spot offset) exactly
on the simulator's own model, and through the full instrument chain.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wayne_tpu.ops.kepler import orbital_phase_angle, projected_separation
from wayne_tpu.ops.transit import eclipse_visibility, transit_light_curve
from wayne_tpu.reduction import fit_phase_curve, reduce_visit
from wayne_tpu.scene import example_scene


def _phase_white(t, orbit, fp, amp, off_rad):
    z, in_front = projected_separation(jnp.asarray(t), orbit)
    vis = eclipse_visibility(z, in_front, jnp.float32(0.1595))
    phi = orbital_phase_angle(jnp.asarray(t), orbit)
    mod = 1.0 - amp * 0.5 * (1.0 - jnp.cos(phi + off_rad))
    return np.asarray(1.0 + fp * mod * vis)


def test_fit_phase_curve_exact():
    base = example_scene(64)
    period = float(base.orbit.period_s)
    t = np.linspace(0.0, period, 200).astype(np.float32)
    fp, amp, off = 1.8e-3, 0.6, 0.35
    lc = _phase_white(t, base.orbit, fp, amp, off)
    fit = fit_phase_curve(jnp.asarray(lc), jnp.asarray(t), base.orbit,
                          0.1595)
    # f32 floor: the [1, vis] columns are near-collinear outside
    # eclipse (vis = 1), so ~1e-5 absolute on fp is the solve's
    # conditioning limit, far below any photon-noise sigma
    assert abs(float(fit.fp) - fp) < 1e-5, float(fit.fp)
    assert abs(float(fit.amp) - amp) < 5e-3, float(fit.amp)
    assert abs(float(fit.offset_rad) - off) < 2e-3, float(fit.offset_rad)
    assert float(fit.amp_sigma) < 0.05, float(fit.amp_sigma)  # noise-free


def test_fit_phase_curve_scale_invariant_and_noisy():
    """Arbitrary baseline scale is absorbed; noise gives honest sigma."""
    base = example_scene(64)
    period = float(base.orbit.period_s)
    t = np.linspace(0.0, period, 300).astype(np.float32)
    rng = np.random.default_rng(7)
    fp, amp, off = 1.5e-3, 0.4, -0.25
    lc = 0.37 * (_phase_white(t, base.orbit, fp, amp, off)
                 + 2e-4 * rng.standard_normal(t.size).astype(np.float32))
    fit = fit_phase_curve(jnp.asarray(lc), jnp.asarray(t), base.orbit,
                          0.1595)
    assert abs(float(fit.fp) - fp) < 4.0 * float(fit.fp_sigma), (
        float(fit.fp), float(fit.fp_sigma))
    assert 1e-6 < float(fit.fp_sigma) < 1e-3
    # multi-channel: vmapped path matches per-channel calls
    chans = np.stack([lc, lc * 2.0], axis=1)
    fit2 = fit_phase_curve(jnp.asarray(chans), jnp.asarray(t),
                           base.orbit, 0.1595)
    np.testing.assert_allclose(np.asarray(fit2.fp), float(fit.fp),
                               atol=1e-5)   # f32 conditioning floor


def test_degenerate_coverage_clamps_values_not_sigma():
    """Eclipse-free coverage (vis ~ constant) makes fp unidentifiable:
    the REPORTED fp/amp are clamped to physical ranges, but fp_sigma
    must stay honestly huge — clipping inside the delta-method map
    would zero the gradient and report sigma = 0 exactly when the fit
    is most degenerate (regression)."""
    base = example_scene(64)
    period = float(base.orbit.period_s)
    # a window far from both transit and eclipse: vis = 1 throughout
    t = np.linspace(0.2 * period, 0.3 * period, 80).astype(np.float32)
    rng = np.random.default_rng(3)
    lc = 1.0 + 2e-4 * rng.standard_normal(t.size).astype(np.float32)
    fit = fit_phase_curve(jnp.asarray(lc), jnp.asarray(t), base.orbit,
                          0.1595)
    assert -0.0501 <= float(fit.fp) <= 0.5001, float(fit.fp)
    assert 0.0 <= float(fit.amp) <= 2.0001, float(fit.amp)
    # degenerate => sigma far above any real signal scale (~1e-3 on a
    # hot Jupiter; measured 0.044 here), and NEVER the clipped-map 0.0
    assert float(fit.fp_sigma) > 0.01, float(fit.fp_sigma)
    # the clamped amp (pinned at 2.0) must carry an inflated sigma too
    # (measured 0.23 here vs < 5e-3 on a well-covered noise-free fit) —
    # consumers can tell a measurement from a clamp artifact
    assert float(fit.amp_sigma) > 0.1, float(fit.amp_sigma)


def test_phase_curve_simulator_loop():
    """End to end: simulate a coarse full-orbit phase-curve visit with
    photon noise, reduce it, and recover (fp, A) from the extracted
    white curve."""
    from wayne_tpu.calibration import synthetic_tables
    from wayne_tpu.config import ExposureStatic, NoiseFlags
    from wayne_tpu.ops.visit import simulate_visit

    S, NL, NSAMP, N_EXP = 128, 64, 3, 48
    flags = dataclasses.replace(
        NoiseFlags.none(), poisson=True, read_noise=True, sky=True,
        dark=True)
    cfg = ExposureStatic(subarray=S, n_lambda=NL, n_sub=4, nsamp=NSAMP,
                         samp_seq="SPARS10", scan=True, noise=flags,
                         band_px=48, eclipse=True)
    tables = synthetic_tables("G141", subarray=S, n_lambda=NL,
                              samp_seq="SPARS10", nsamp=NSAMP)
    base = example_scene(NL, scan_speed=1.0)
    fp, amp, off = 2.5e-3, 0.5, 0.3
    base = dataclasses.replace(
        base, x_ref=jnp.float32(30.0), y_ref=jnp.float32(30.0),
        fp_over_fs=jnp.full((NL,), fp, jnp.float32),
        phase_amp=jnp.float32(amp), phase_offset=jnp.float32(off))
    period = float(base.orbit.period_s)
    starts = np.linspace(0.0, period, N_EXP).astype(np.float32)
    scenes = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (N_EXP,) + x.shape), base)
    keys = jax.vmap(lambda i: jax.random.fold_in(
        jax.random.PRNGKey(29), i))(jnp.arange(N_EXP))
    scenes = dataclasses.replace(
        scenes, exp_start_s=jnp.asarray(starts), key=keys)
    out = simulate_visit(scenes, tables, cfg, chunk=8)
    exptime = float(tables.read_times[-1])
    mid = jnp.asarray(starts + exptime / 2.0)

    red = reduce_visit(out.reads_dn, tables.gain, mid, base.orbit,
                       y_window=(20, 75), x_window=(72, 126),
                       bg_rows=(100, 126), n_chan=4)
    fit = fit_phase_curve(red.white_lc, mid, base.orbit, 0.1595)
    assert abs(float(fit.fp) - fp) < max(5.0 * float(fit.fp_sigma),
                                         3e-4), (
        float(fit.fp), float(fit.fp_sigma))
    assert abs(float(fit.amp) - amp) < 0.25, float(fit.amp)
    assert abs(float(fit.offset_rad) - off) < 0.3, float(fit.offset_rad)


@pytest.mark.slow
def test_run_reduce_cli_phase_mode(tmp_path):
    """File-level loop: simulate a full-orbit phase-curve visit, reduce
    with --mode phase, recover the dayside contrast and modulation."""
    import json

    import yaml

    from wayne_tpu.config import load_yaml
    from wayne_tpu.observation import Observation
    from wayne_tpu.run_reduce import main as reduce_main

    fp, amp, off_deg = 2.5e-3, 0.6, 15.0
    # The HST planner packs exposures at each visibility window's start,
    # so a short test visit can miss the eclipse entirely (fp then
    # degenerates against the baseline — vis ~ constant). Use an
    # EXPLICIT schedule (exp_start_times) spanning the full period
    # uniformly, which guarantees in-eclipse samples and exercises the
    # explicit-schedule surface at the same time.
    period = 0.813475
    times = [56000.05 + x * period / 60.0 for x in range(60)]
    pars = {"grism": "G141", "subarray": 128, "NSAMP": 3,
            "SAMPSEQ": "SPARS10", "scan": True, "x_ref": 30.0,
            "y_ref": 40.0, "exp_start_times": times,
            "n_lambda": 64, "n_sub": 4, "eclipse_depth": fp,
            "phase_amplitude": amp, "phase_offset_deg": off_deg,
            "t0": 56000.0, "period": period,
            "sma_over_rs": 4.855, "inclination": 82.1, "seed": 31}
    ppath = tmp_path / "pars.yml"
    ppath.write_text(yaml.safe_dump(pars))
    outdir = tmp_path / "visit"
    obs = Observation(load_yaml(str(ppath)))
    obs.generate(str(outdir), chunk=12, progress=lambda s: None)

    rc = reduce_main(["-d", str(outdir), "-p", str(ppath),
                      "--n-chan", "4", "--mode", "phase", "--cpu"])
    assert rc == 0
    rep = json.loads((outdir / "reduced.json").read_text())
    assert rep["mode"] == "phase"
    # white curve has the S/N at this test scale: fp detected and the
    # modulation parameters recovered there
    wf = rep["white_phase_fit"]
    assert abs(wf["fp_over_fs"] - fp) < max(4.0 * wf["fp_sigma"],
                                            5e-4), wf
    assert wf["fp_sigma"] < 1.5e-3, wf
    # amp = 2r/fp is ratio-noisy at this S/N (fp at ~3 sigma): wide but
    # physical bounds; the exact-recovery unit tests pin correctness
    assert 0.0 <= wf["phase_amplitude"] < 1.3, wf
    assert abs(wf["hot_spot_offset_deg"] - off_deg) < 60.0, wf
    # the fitted linear baseline absorbs the injected visit slope
    # (-0.01/day x ~0.4-day half-span ~ -4e-3)
    assert abs(wf["baseline_slope"] - (-0.004)) < 3e-3, wf
    # channels individually are low-S/N here: consistency only
    for c in rep["channels"]:
        assert abs(c["fp_over_fs"] - fp) < max(5 * c["fp_sigma"],
                                               5e-4), c
        assert c["fp_sigma"] > 0
