#!/usr/bin/env python
"""On-TPU smoke + statistical cross-validation (run on real hardware).

Codifies the hardware-only checks that CPU CI cannot cover:
  1. Pallas hardware-PRNG statistics (Poisson moments/pmf, read-noise sigma);
  2. statistical equivalence of the Pallas and XLA noise backends on a
     full-noise exposure (means/variances agree within sampling error);
  3. visit throughput sanity (compiles, runs, finite, > threshold exp/s).

Exit code 0 = all pass. Prints one JSON line.
"""

import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jnp.arange(4.0).sum().block_until_ready()
    ok = {}

    # -- 1. hardware PRNG statistics ------------------------------------
    from wayne_tpu.ops.pallas_readout import fused_read_step
    cum = jnp.zeros((512, 512), jnp.float32)
    zero = jnp.zeros_like(cum)
    bias0, gain1 = jnp.zeros_like(cum), jnp.ones_like(cum)
    c = jnp.array([20.0, 78000.0, 1.0], jnp.float32)
    nl0 = jnp.zeros((3, 512, 512), jnp.float32)
    cum2, dn = fused_read_step(
        jnp.array([7, 3, 9], jnp.int32), cum, zero, jnp.full((512, 512), 12.0),
        bias0, gain1, nl0, c, poisson=True, read_noise=True,
        non_linearity=False, bias=False, scalar_gain=True)
    cum2, dn = np.asarray(cum2), np.asarray(dn)
    ok["prng_poisson_mean"] = bool(abs(cum2.mean() - 12.0) < 0.1)
    ok["prng_poisson_var"] = bool(abs(cum2.var() / 12.0 - 1.0) < 0.05)
    ok["prng_read_noise"] = bool(abs((dn - cum2).std() - 20.0) < 0.5)

    # -- 2. Pallas vs XLA noise backend equivalence ----------------------
    from wayne_tpu.calibration import synthetic_tables
    from wayne_tpu.config import ObservationConfig
    from wayne_tpu.ops.exposure import simulate_exposure
    from wayne_tpu.scene import example_scene
    obs = ObservationConfig(subarray=256, nsamp=5, samp_seq="SPARS10",
                            scan=True, n_lambda=256)
    base_cfg = obs.exposure_static()
    tables = synthetic_tables("G141", subarray=256, n_lambda=256,
                              samp_seq="SPARS10", nsamp=5)
    scene = example_scene(256, scan_speed=1.0)

    def stats(use_pallas, n=24):
        cfg = dataclasses.replace(base_cfg, use_pallas=use_pallas)
        last = []
        for i in range(n):
            r = simulate_exposure(
                dataclasses.replace(scene, key=jax.random.PRNGKey(1000 + i)),
                tables, cfg)
            last.append(np.asarray(r.reads_dn[-1], np.float64))
        last = np.stack(last)
        return last.mean(axis=0), last.var(axis=0)

    m_x, v_x = stats(False)
    m_p, v_p = stats(True)
    # means agree within combined standard errors (plus tiny abs slack)
    se = np.sqrt((v_x + v_p) / 24.0)
    frac_bad = float((np.abs(m_x - m_p) > 5.0 * se + 0.5).mean())
    ok["backend_means_agree"] = bool(frac_bad < 1e-3)
    bright = m_x > np.percentile(m_x, 90)
    ratio = np.median(v_p[bright] / np.maximum(v_x[bright], 1e-9))
    ok["backend_vars_agree"] = bool(0.8 < ratio < 1.25)

    # -- 2b. fused multi-read kernel invariants on hardware ----------------
    # (interpret mode can't validate the hardware PRNG; these run the real
    # whole-exposure kernel and check physical invariants per read.)
    cfgf = dataclasses.replace(base_cfg, use_pallas=True)
    rf = simulate_exposure(
        dataclasses.replace(scene, key=jax.random.PRNGKey(77)), tables, cfgf)
    reads = np.asarray(rf.reads_dn, np.float64)
    gain_map = np.asarray(tables.gain_map, np.float64)
    # cumulative charge must be (statistically) monotone: the mean ramp
    # rises every read and no pixel drops by more than read-noise swings
    net = reads * gain_map[None]   # DN -> e- (per-pixel gain)
    ramp = net.mean(axis=(1, 2))
    ok["fused_ramp_monotone"] = bool(np.all(np.diff(ramp) > 0))
    drop = (net[1:] - net[:-1]).min()
    rn6 = 6.0 * float(tables.read_noise_e) * np.sqrt(2.0)
    ok["fused_no_unphysical_drops"] = bool(drop > -rn6)
    # cosmic-ray bookkeeping: every flagged hit exists, counts bounded
    ok["fused_cr_counts"] = bool(
        (np.asarray(rf.cr_count) <= cfgf.max_cr_per_read).all())

    # -- 2c. in-kernel IPC on hardware (fused whole-exposure kernel) ------
    # With the stochastic effects off, both runs share the identical
    # deterministic post-non-linearity frame, and IPC is the LAST op
    # before bias — so ipc-on must equal the 3x3 cross-kernel convolution
    # of ipc-off exactly. This exercises the Mosaic lowering of the
    # shifted-add coupling, which interpret mode cannot prove. (If IPC
    # ever moves before the non-linearity, this check must reconstruct
    # the pre-NL frame instead.)
    from wayne_tpu.config import NoiseFlags
    # NoiseFlags.all() includes ipc — switch it OFF for the reference run.
    # bias_drift off too: it is added AFTER the chain (ops/exposure
    # _bias_drift_dn), so conv(ipc-off) would wrongly couple the
    # quadrant offsets across amplifier boundaries.
    det_flags = dataclasses.replace(
        NoiseFlags.all(), poisson=False, read_noise=False, cosmic_rays=False,
        ipc=False, bias_drift=False)
    cfg_off = dataclasses.replace(base_cfg, use_pallas=True, noise=det_flags)
    cfg_on = dataclasses.replace(cfg_off, noise=dataclasses.replace(
        det_flags, ipc=True))
    r_off = np.asarray(simulate_exposure(scene, tables, cfg_off).reads_dn,
                       np.float64)
    r_on = np.asarray(simulate_exposure(scene, tables, cfg_on).reads_dn,
                      np.float64)
    a = float(tables.ipc_alpha)
    g = np.asarray(tables.gain_map, np.float64)[None]
    bias = np.asarray(tables.bias_map, np.float64)[None]
    # ipc couples the SENSED charge before the bias add: undo gain and
    # bias to recover it on both sides
    sig_off = r_off * g - bias
    want = sig_off * (1.0 - 4.0 * a)
    want[:, 1:, :] += a * sig_off[:, :-1, :]
    want[:, :-1, :] += a * sig_off[:, 1:, :]
    want[:, :, 1:] += a * sig_off[:, :, :-1]
    want[:, :, :-1] += a * sig_off[:, :, 1:]
    err = np.abs((r_on * g - bias) - want) / max(sig_off.max(), 1.0)
    ok["fused_ipc_matches_conv"] = bool(err.max() < 1e-5)

    # -- 2d. fit-path numerics on hardware --------------------------------
    # TPU matmuls round f32 INPUTS to bf16 by default; every science fit
    # must pin full precision (CLAUDE.md). Round 3 found exactly this
    # class of bug: the instrumented drift fit collapsed on chip while
    # CPU was exact. These checks diff the chip against fp64 NumPy.
    from wayne_tpu.reduction import (clean_drift_regressor, fit_white_ramp,
                                     transit_drift_basis)
    n_e = 48
    mid_e = jnp.asarray(np.linspace(0.0, 4 * 3600.0, n_e), jnp.float32)
    sc64 = example_scene(64)
    basis = transit_drift_basis(mid_e, sc64.orbit, sc64.ld,
                                jnp.float32(0.155))
    rng = np.random.default_rng(0)
    drift = np.linspace(0.0, 0.4, n_e).astype(np.float32)
    Bn = np.asarray(basis, np.float64)
    cen = jnp.asarray(drift + (0.04 * Bn[:, 0] + 0.01 * Bn[:, 1]
                               ).astype(np.float32)
                      + 1e-4 * rng.standard_normal(n_e).astype(np.float32))
    got = np.asarray(jax.jit(clean_drift_regressor)(cen, basis, mid_e))
    tt = (np.asarray(mid_e, np.float64) - float(mid_e[0])) \
        / (float(mid_e[-1]) - float(mid_e[0])) * 2.0 - 1.0
    T = np.stack([tt ** k for k in range(3)], 1)
    B = Bn / np.linalg.norm(Bn, axis=0)
    Bt = B - T @ np.linalg.solve(T.T @ T, T.T @ B)
    gam = np.linalg.solve(Bt.T @ B + 1e-9 * np.eye(B.shape[1]),
                          Bt.T @ np.asarray(cen, np.float64))
    ref = np.asarray(cen, np.float64) - B @ gam
    ok["drift_fit_matches_fp64"] = bool(np.abs(got - ref).max() < 1e-4)

    # ref-pixel BLEVCORR on chip: the per-read quadrant reference means
    # sit at the ~1000 DN level while the drift being measured is ~1 DN
    # — the bf16 matmul-input hazard class (same as clean_drift above);
    # reduction.ref_pixel_correct must recover injected offsets exactly.
    # Fails without precision=HIGHEST on its reference-mean einsums.
    from wayne_tpu.calibration import quadrant_map as _qmap
    from wayne_tpu.reduction import ref_pixel_correct as _rpc
    S_r, NR_r = 64, 8
    rngr = np.random.RandomState(7)
    quad_r = np.asarray(_qmap(S_r))          # centered 64^2 spans all 4
    off_true = np.zeros((NR_r, 4), np.float32)
    off_true[1:] = rngr.normal(0.0, 1.2, (NR_r - 1, 4)).astype(np.float32)
    base_r = 1000.0 + rngr.normal(0.0, 2.0, (S_r, S_r)).astype(np.float32)
    reads_r = base_r[None] + off_true[:, quad_r]
    mask_r = np.zeros((S_r, S_r), np.float32)
    mask_r[:5] = mask_r[-5:] = 1.0
    mask_r[:, :5] = mask_r[:, -5:] = 1.0
    _, off_got = _rpc(jnp.asarray(reads_r), jnp.asarray(mask_r))
    err_off = float(np.abs(np.asarray(off_got) - off_true).max())
    ok["refpix_offsets_on_chip"] = bool(err_off < 0.05)

    # joint ramp+transit LM fit recovers a known white curve on chip
    from wayne_tpu.ops.kepler import projected_separation as _psep
    from wayne_tpu.ops.transit import transit_depth_curve as _tdc
    z_e, infr_e = _psep(mid_e, sc64.orbit)
    tr = 1.0 - (1.0 - _tdc(z_e, jnp.float32(0.1595), sc64.ld, 32)) * infr_e
    sysv = (1.0 - 0.01 / 86400.0 * np.asarray(mid_e)) * (
        1.0 - 0.006 * np.exp(-np.asarray(mid_e) / 300.0))
    wfit = fit_white_ramp(jnp.asarray(np.asarray(tr) * sysv, jnp.float32),
                          mid_e, sc64.orbit, sc64.ld, 0.15)
    ok["ramp_fit_rp_on_chip"] = bool(abs(float(wfit.rp) - 0.1595) < 1e-3)

    # phase-curve linear fit: the [1, vis] near-collinear design is
    # exactly the bf16-fragile class — diff against the known injection
    from wayne_tpu.ops.kepler import orbital_phase_angle
    from wayne_tpu.ops.transit import eclipse_visibility
    from wayne_tpu.reduction import fit_phase_curve
    n_p = 200
    t_p = jnp.asarray(np.linspace(0.0, float(sc64.orbit.period_s), n_p),
                      jnp.float32)
    z_p, infr_p = _psep(t_p, sc64.orbit)
    vis_p = eclipse_visibility(z_p, infr_p, jnp.float32(0.1595))
    phi_p = orbital_phase_angle(t_p, sc64.orbit)
    fp_t, amp_t, off_t = 1.8e-3, 0.6, 0.35
    mod_p = 1.0 - amp_t * 0.5 * (1.0 - jnp.cos(phi_p + off_t))
    lc_p = 1.0 + fp_t * mod_p * vis_p
    pfit = fit_phase_curve(lc_p, t_p, sc64.orbit, 0.1595)
    ok["phase_fit_fp_on_chip"] = bool(abs(float(pfit.fp) - fp_t) < 1e-4)
    ok["phase_fit_sigma_sane"] = bool(float(pfit.fp_sigma) < 1e-4)

    # 9-param geometric LM (t0-grid seed + near-degenerate valley JTJ)
    t0_true = 60.0
    import dataclasses as _dc
    orb_shift = _dc.replace(sc64.orbit,
                            t0_s=sc64.orbit.t0_s + jnp.float32(t0_true))
    z_g, infr_g = _psep(mid_e, orb_shift)
    tr_g = 1.0 - (1.0 - _tdc(z_g, jnp.float32(0.1595), sc64.ld, 32)) \
        * infr_g
    gfit = fit_white_ramp(jnp.asarray(np.asarray(tr_g) * sysv,
                                      jnp.float32),
                          mid_e, sc64.orbit, sc64.ld, 0.15,
                          fit_geometry=True, n_iter=40)
    ok["geom_fit_rp_on_chip"] = bool(abs(float(gfit.rp) - 0.1595) < 5e-3)
    # t0 tolerance: at this deliberately sparse coverage (48 points, one
    # transit) the hook+slope systematic partially degenerates with t0
    # and even the fp64 CPU fit lands ~26 s from the injected 60 s.
    # This probe guards against ON-CHIP COLLAPSE (t0 stuck at a 100-s
    # grid node or the +-600 s window bound from bf16-rounded normal
    # equations), not absolute accuracy — the science-accuracy tests
    # with both contacts covered live in tests/test_ramp_fit.py.
    ok["geom_fit_t0_s"] = round(float(gfit.t0_offset_s), 2)
    ok["geom_fit_t0_on_chip"] = bool(
        abs(float(gfit.t0_offset_s) - t0_true) < 150.0)
    ok["geom_fit_sigma_finite"] = bool(
        0.0 <= float(gfit.rp_sigma) < 0.05)

    # ensemble MCMC moments on chip (hardware threefry path)
    from wayne_tpu.mcmc import ensemble_sample
    mu = jnp.asarray([1.5, -0.5], jnp.float32)

    def _lp(x):
        d = x - mu
        return -0.5 * jnp.sum(d * d)

    init = mu[None, :] + 0.1 * jax.random.normal(jax.random.PRNGKey(5),
                                                 (32, 2))
    chain = ensemble_sample(_lp, init, jax.random.PRNGKey(6), 2000)
    kept = np.asarray(chain.samples[400:]).reshape(-1, 2)
    ok["mcmc_mean_on_chip"] = bool(
        np.abs(kept.mean(axis=0) - np.asarray(mu)).max() < 0.06)
    ok["mcmc_var_on_chip"] = bool(
        np.abs(kept.var(axis=0) - 1.0).max() < 0.25)

    # -- 3. throughput sanity --------------------------------------------
    from wayne_tpu.ops.visit import simulate_visit
    obs512 = ObservationConfig(subarray=512, nsamp=15, samp_seq="SPARS10",
                               scan=True, n_lambda=512)
    cfg512 = dataclasses.replace(obs512.exposure_static(), use_pallas=True)
    t512 = synthetic_tables("G141", subarray=512, n_lambda=512,
                            samp_seq="SPARS10", nsamp=15)
    s512 = example_scene(512, scan_speed=1.0)
    n = 64
    scenes = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (n,) + a.shape), s512)
    scenes = dataclasses.replace(
        scenes, key=jax.vmap(lambda i: jax.random.fold_in(
            jax.random.PRNGKey(0), i))(jnp.arange(n)))
    out = simulate_visit(scenes, t512, cfg512, 16)
    out.reads_dn.block_until_ready()
    t0 = time.time()
    out = simulate_visit(scenes, t512, cfg512, 16)
    out.reads_dn.block_until_ready()
    eps = n / (time.time() - t0)
    ok["throughput_exp_per_s"] = round(eps, 1)
    ok["throughput_ok"] = bool(eps > 300.0)
    ok["finite"] = bool(np.isfinite(np.asarray(out.reads_dn)).all())

    passed = all(v for k, v in ok.items() if isinstance(v, bool))
    print(json.dumps(dict(ok, all_passed=passed)))
    sys.exit(0 if passed else 1)


if __name__ == "__main__":
    main()
