"""RECTE physical charge trapping (ops/recte.py): trap kinetics vs fp64
integration, hook morphology, thinning exactness through the kernel,
config plumbing, Observation integration. Beyond the reference — the
reference's ramp is the parametric per-orbit hook only (SURVEY.md:393);
RECTE (Zhou et al. 2017) drives it from the illumination history."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wayne_tpu.calibration import synthetic_tables
from wayne_tpu.config import (
    ExposureStatic, NoiseFlags, RecteConfig, config_from_dict,
)
from wayne_tpu.ops.recte import (
    RecteParams, _evolve_constant_rate, thin_and_release, trap_deltas,
    visit_trap_maps, white_ramp,
)
from wayne_tpu.ops.visit import simulate_visit
from wayne_tpu.scene import example_scene

S, NL, NSAMP = 64, 32, 2
CFG = ExposureStatic(subarray=S, n_lambda=NL, n_sub=2, nsamp=NSAMP,
                     samp_seq="RAPID", scan=False, max_cr_per_read=4,
                     transit_quad=16, noise=NoiseFlags.none())
TABLES = synthetic_tables("G141", subarray=S, n_lambda=NL, samp_seq="RAPID",
                          nsamp=NSAMP)


def _visit(n_exp, spacing_s=200.0):
    base = example_scene(NL, scan_speed=0.0)
    base = dataclasses.replace(base, x_ref=jnp.float32(15.0),
                               y_ref=jnp.float32(20.0))
    v = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n_exp,) + x.shape), base)
    starts = jnp.asarray(np.arange(n_exp) * spacing_s, jnp.float32)
    keys = jax.vmap(lambda i: jax.random.fold_in(
        jax.random.PRNGKey(7), i))(jnp.arange(n_exp))
    return dataclasses.replace(v, exp_start_s=starts, key=keys)


class TestTrapKinetics:
    def test_closed_form_matches_fp64_euler(self):
        """E(dt) for constant illumination vs brute-force fp64 Euler
        integration of dE/dt = eta f (1 - E/n) - E/tau."""
        p = RecteParams()
        f, dt, e0 = 120.0, 100.0, 40.0
        got = float(_evolve_constant_rate(
            jnp.float32(e0), jnp.float32(f), dt,
            p.n_trap_f, p.eta_f, p.tau_f))
        e = np.float64(e0)
        n_steps = 200000
        h = dt / n_steps
        for _ in range(n_steps):
            e += h * (p.eta_f * f * (1.0 - e / p.n_trap_f) - e / p.tau_f)
        np.testing.assert_allclose(got, e, rtol=1e-4)

    def test_equilibrium(self):
        """At dt >> tau the population reaches a/b regardless of E0."""
        p = RecteParams()
        f = 500.0
        a = p.eta_f * f
        b = a / p.n_trap_f + 1.0 / p.tau_f
        for e0 in (0.0, p.n_trap_f):
            got = float(_evolve_constant_rate(
                jnp.float32(e0), jnp.float32(f), 1e6,
                p.n_trap_f, p.eta_f, p.tau_f))
            np.testing.assert_allclose(got, a / b, rtol=1e-5)

    def test_dark_pixel_only_releases(self):
        """f = 0: pure exponential decay, deficit strictly negative."""
        rates = jnp.zeros((3, 4, 4), jnp.float32)
        t = jnp.asarray([0.0, 200.0, 400.0], jnp.float32)
        deficit, _, _ = trap_deltas(rates, t, 100.0, f0_s=0.5, f0_f=0.5)
        d = np.asarray(deficit)
        assert (d < 0.0).all()
        # later exposures release less (the traps drain)
        assert d[0].min() < d[1].min() < d[2].min() < 0.0


class TestHookMorphology:
    def test_orbit1_deficit_decreases_then_second_orbit_rebounds(self):
        """Traps fill through orbit 1 (deficit shrinks exposure to
        exposure = upward flux ramp, the hook); after an occultation gap
        the fast traps have drained so orbit 2 hooks again — but less
        than orbit 1 (slow traps stay filled), the RECTE signature."""
        f = 200.0
        texp, cad = 100.0, 120.0
        n_per = 6
        t1 = np.arange(n_per) * cad
        t2 = t1 + t1[-1] + cad + 2700.0        # ~45 min Earth occultation
        t = jnp.asarray(np.concatenate([t1, t2]), jnp.float32)
        rates = jnp.full((12, 2, 2), f, jnp.float32)
        deficit, _, _ = trap_deltas(rates, t, texp)
        d = np.asarray(deficit)[:, 0, 0]
        assert (np.diff(d[:n_per]) < 0.0).all()          # orbit-1 hook
        assert d[n_per] > d[n_per - 1]                   # rebound after gap
        assert d[n_per] < d[0]                           # weaker than orbit 1

    def test_white_ramp_shape_and_grad(self):
        texp, cad = 100.0, 120.0
        t = jnp.asarray(np.arange(8) * cad, jnp.float32)
        ramp = np.asarray(white_ramp(150.0, t, texp))
        assert ramp.shape == (8,)
        assert (ramp > 0.9).all() and (ramp < 1.0).all()
        assert (np.diff(ramp) > 0.0).all()               # monotone hook
        # differentiable in the initial trap fill (the fitted per-visit
        # parameter): more pre-filled traps -> shallower ramp
        g = jax.grad(lambda f0: white_ramp(150.0, t, texp,
                                           f0_f=f0)[0])(jnp.float32(0.0))
        assert float(g) > 0.0

    def test_pre_filled_traps_flatten_the_hook(self):
        t = jnp.asarray(np.arange(6) * 120.0, jnp.float32)
        fresh = np.asarray(white_ramp(150.0, t, 100.0))
        pumped = np.asarray(white_ramp(150.0, t, 100.0, f0_s=0.8, f0_f=0.8))
        assert (pumped[0] > fresh[0])                    # smaller deficit
        assert (pumped[-1] - pumped[0]) < (fresh[-1] - fresh[0])


class TestThinAndRelease:
    def test_split_reconstructs_deficit(self):
        fluence = jnp.asarray([[1000.0, 0.0], [50.0, 2.0]], jnp.float32)
        deficit = jnp.asarray([[12.0, -3.0], [-1.0, 1.5]], jnp.float32)
        mult, rel = thin_and_release(deficit, fluence, 100.0)
        m, r = np.asarray(mult), np.asarray(rel)
        assert ((m >= 0.0) & (m <= 1.0)).all()
        # capture pixels: thinned expectation removes exactly the deficit
        np.testing.assert_allclose((1.0 - m[0, 0]) * 1000.0, 12.0,
                                   rtol=1e-5)
        assert r[0, 0] == 0.0
        # release pixels: nonnegative rate, no thinning
        np.testing.assert_allclose(r[0, 1], 3.0 / 100.0, rtol=1e-6)
        assert m[0, 1] == 1.0
        # capture above fluence (numerical corner) clamps, never negative
        m2, _ = thin_and_release(jnp.asarray([[5.0]]), jnp.asarray([[2.0]]),
                                 100.0)
        assert float(m2[0, 0]) == 0.0


def test_kernel_thinning_reproduces_deficit_exactly():
    """Deterministic chain (sky+dark on, all noise off): the trapped
    visit's final read differs from the trap-free one by exactly
    -deficit/gain on the active area — the thinning + release split is
    charge-conserving through the real kernel."""
    cfg = dataclasses.replace(CFG, noise=dataclasses.replace(
        NoiseFlags.none(), sky=True, dark=True))
    scenes = _visit(4)
    rcfg = RecteConfig(enabled=True)
    mult, rel = visit_trap_maps(scenes, TABLES, cfg, rcfg, chunk=4)
    exptime = float(TABLES.read_times[-1])
    # reconstruct the signed deficit the maps encode
    base = simulate_visit(scenes, TABLES, cfg, chunk=4).reads_dn
    trapped = dataclasses.replace(scenes, trap_mult=mult,
                                  persist_rate=rel)
    got = simulate_visit(trapped, TABLES, cfg, chunk=4).reads_dn
    diff_e = (np.asarray(got[:, -1]) - np.asarray(base[:, -1])) \
        * float(TABLES.gain)
    # fluence the maps were built against (flat off in this chain)
    ideal = simulate_visit(
        scenes, TABLES,
        dataclasses.replace(cfg, noise=NoiseFlags.none(),
                            compute_ideal=True),
        chunk=4).ideal_e
    bg = (np.asarray(scenes.sky_level)[:, None, None]
          * np.asarray(TABLES.sky_frame)[None]
          + np.asarray(TABLES.dark_map)[None]) * exptime
    fluence = np.asarray(ideal) + bg * np.asarray(TABLES.active_mask)[None]
    want = -((1.0 - np.asarray(mult)) * fluence
             - np.asarray(rel) * exptime
             * np.asarray(TABLES.active_mask)[None])
    np.testing.assert_allclose(diff_e, want, atol=0.05, rtol=1e-3)
    # and the hook is visible: exposure 0 loses more charge than exp 3
    assert diff_e[0].sum() < diff_e[3].sum() <= 0.0


@pytest.mark.slow
def test_closed_loop_depth_recovery_under_recte():
    """Simulate -> reduce closed loop with the RECTE ramp ON: the
    standard analysis chain (white ramp fit -> parametric detrend ->
    per-channel depth fit) absorbs the physical charge-trap systematic.
    Within an orbit RECTE's ramp is an exponential approach to trap
    equilibrium — exactly the family fit_white_ramp fits — so the
    physically-simulated hook must reduce out just like the parametric
    one. Also asserts the systematic is actually large enough to bias
    an uncorrected fit (else this test would prove nothing)."""
    from wayne_tpu.reduction import (
        fit_depths, fit_white_ramp, ramp_detrend, reduce_visit,
    )

    S2, NL2, NSAMP2, N_EXP = 128, 64, 4, 40
    flags = dataclasses.replace(
        NoiseFlags.none(), poisson=True, read_noise=True, sky=True,
        dark=True)
    cfg = ExposureStatic(subarray=S2, n_lambda=NL2, n_sub=4, nsamp=NSAMP2,
                         samp_seq="SPARS10", scan=True, noise=flags,
                         band_px=48)
    tables = synthetic_tables("G141", subarray=S2, n_lambda=NL2,
                              samp_seq="SPARS10", nsamp=NSAMP2)
    base = example_scene(NL2, scan_speed=1.0)
    base = dataclasses.replace(
        base, x_ref=jnp.float32(30.0), y_ref=jnp.float32(30.0),
        rp_over_rs=jnp.full((NL2,), 0.1595, jnp.float32))
    starts = np.linspace(0.0, 4.0 * 3600.0, N_EXP)   # transit at t0=2h
    scenes = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (N_EXP,) + x.shape), base)
    keys = jax.vmap(lambda i: jax.random.fold_in(
        jax.random.PRNGKey(5), i))(jnp.arange(N_EXP))
    scenes = dataclasses.replace(
        scenes, exp_start_s=jnp.asarray(starts, jnp.float32), key=keys)
    # attach the physical trap maps (what Observation._ensure_recte does)
    mult, rel = visit_trap_maps(scenes, tables, cfg, RecteConfig(),
                                chunk=8)
    scenes = dataclasses.replace(scenes, trap_mult=mult, persist_rate=rel)

    out = simulate_visit(scenes, tables, cfg, chunk=8)
    exptime = float(tables.read_times[-1])
    mid = jnp.asarray(starts + exptime / 2.0, jnp.float32)
    red = reduce_visit(out.reads_dn, tables.gain, mid, base.orbit,
                       y_window=(20, 75), x_window=(72, 126),
                       bg_rows=(100, 126), n_chan=6)

    # the trap ramp must be big enough to matter: uncorrected channel
    # fits shifted from truth by more than the corrected tolerance
    raw_rp, _ = fit_depths(red.channel_lc, mid, base.orbit, base.ld,
                           jnp.float32(0.15))
    raw_err = np.abs(np.asarray(raw_rp) - 0.1595).mean()
    assert raw_err > 0.002, raw_err

    ramp = fit_white_ramp(red.white_lc, mid, base.orbit, base.ld,
                          rp_init=0.15)
    # absolute white depth recovered by the joint transit x ramp fit
    assert abs(float(ramp.rp) - 0.1595) < 0.004, float(ramp.rp)
    corrected = ramp_detrend(red.channel_lc, ramp, mid, base.orbit)
    cor_rp, cor_sig = fit_depths(corrected, mid, base.orbit, base.ld,
                                 jnp.float32(0.15))
    cor_rp, cor_sig = np.asarray(cor_rp), np.asarray(cor_sig)
    tol = np.maximum(6.0 * cor_sig, 0.006)
    assert np.all(np.abs(cor_rp - 0.1595) < tol), (cor_rp, cor_sig)
    assert np.abs(cor_rp - 0.1595).mean() < raw_err


class TestFitWhiteRecte:
    """fit_white_recte: the physical-model white fit (reduction side)."""

    def _make_curve(self, rp=0.16, f0_s=0.3, f0_f=0.1, rate=180.0,
                    ra=0.004, noise=0.0, seed=0):
        from wayne_tpu.ops.kepler import projected_separation
        from wayne_tpu.ops.transit import transit_depth_curve
        from wayne_tpu.scene import example_scene

        base = example_scene(8)
        n, texp, cad = 48, 90.0, 300.0
        # transit at the orbit's t0; centre the visit on it
        t0 = float(np.asarray(base.orbit.t0_s))
        mids = jnp.asarray(t0 + (np.arange(n) - n / 2) * cad, jnp.float32)
        starts = mids - texp / 2.0
        z, in_front = projected_separation(mids, base.orbit)
        f = transit_depth_curve(z, jnp.float32(rp), base.ld, 32)
        tr = 1.0 - (1.0 - f) * in_front
        ramp = white_ramp(rate, starts, texp, f0_s=f0_s, f0_f=f0_f)
        t_day = (mids - mids.mean()) / 86400.0
        lc = 1.0 * (1.0 - ra * t_day) * ramp * tr
        if noise:
            lc = lc + noise * jax.random.normal(
                jax.random.PRNGKey(seed), lc.shape)
        return lc, mids, base, texp, rate

    @pytest.mark.slow
    def test_recovers_depth_and_trap_state(self):
        from wayne_tpu.reduction import fit_white_recte

        lc, mids, base, texp, rate = self._make_curve(noise=2e-4)
        fit = fit_white_recte(lc, mids, base.orbit, base.ld, 0.15,
                              rate_e_s=rate, exptime_s=texp)
        assert abs(float(fit.rp) - 0.16) < 2e-3, float(fit.rp)
        assert float(fit.rp_sigma) > 0.0
        # trap state recovered: the self-consistency check that matters
        # is the TEMPLATE (f0 x rate_scale trade against each other)
        truth_ramp = np.asarray(white_ramp(rate, mids - texp / 2.0, texp,
                                           f0_s=0.3, f0_f=0.1))
        t_day = np.asarray((mids - mids.mean()) / 86400.0)
        truth_sys = (1.0 - 0.004 * t_day) * truth_ramp
        got = np.asarray(fit.template)
        np.testing.assert_allclose(got / got.mean(),
                                   truth_sys / truth_sys.mean(),
                                   atol=5e-4)

    def test_rate_misestimate_absorbed(self):
        """A 2x wrong effective-rate estimate must not bias the depth:
        the fitted rate_scale calibrates it."""
        from wayne_tpu.reduction import fit_white_recte

        lc, mids, base, texp, rate = self._make_curve(noise=2e-4, seed=3)
        fit = fit_white_recte(lc, mids, base.orbit, base.ld, 0.15,
                              rate_e_s=rate * 2.0, exptime_s=texp)
        assert abs(float(fit.rp) - 0.16) < 2e-3, float(fit.rp)
        assert float(fit.rate_scale) < 0.9   # pulled toward truth (0.5)

    def test_template_feeds_ramp_detrend(self):
        from wayne_tpu.reduction import fit_white_recte, ramp_detrend

        lc, mids, base, texp, rate = self._make_curve()
        fit = fit_white_recte(lc, mids, base.orbit, base.ld, 0.15,
                              rate_e_s=rate, exptime_s=texp)
        chans = jnp.stack([lc, lc], axis=1)
        out = np.asarray(ramp_detrend(chans, fit, mids, base.orbit))
        assert out.shape == (lc.shape[0], 2)
        assert np.isfinite(out).all()
        # systematic removed: OOT scatter collapses to ~the transit shape
        resid = out[:, 0] / out[:5, 0].mean()
        assert resid[:5].std() < 5e-4


@pytest.mark.slow
def test_run_reduce_cli_recte_detrend(tmp_path):
    """File-level loop with the PHYSICAL model on both sides: simulate
    with recte: true (parametric hook off so the trap ramp is the only
    systematic), reduce with --detrend recte — the white RECTE fit
    recovers the depth and reports the trap state; channels recover."""
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
            "sma_over_rs": 4.855, "inclination": 82.1, "seed": 9,
            "recte": True, "hook_amp": 0.0}
    ppath = tmp_path / "pars.yml"
    ppath.write_text(yaml.safe_dump(pars))
    outdir = tmp_path / "visit"
    obs = Observation(load_yaml(str(ppath)))
    obs.generate(str(outdir), chunk=6, progress=lambda s: None)

    rc = reduce_main(["-d", str(outdir), "-p", str(ppath),
                      "--n-chan", "4", "--cpu", "--detrend", "recte"])
    assert rc == 0
    rep = json.loads((outdir / "reduced.json").read_text())
    w = rep["white_recte_fit"]
    assert abs(w["rp_over_rs"] - 0.14) < 0.004, w
    assert 0.0 <= w["f0_slow"] <= 1.0 and 0.0 <= w["f0_fast"] <= 1.0
    assert w["rate_e_s_supplied"] > 0.0
    for c in rep["channels"]:
        assert abs(c["rp_over_rs"] - 0.14) < max(5 * c["rp_sigma"],
                                                 4e-3), c

    # recte detrend is transit-only
    import pytest

    with pytest.raises(SystemExit, match="transit"):
        reduce_main(["-d", str(outdir), "-p", str(ppath), "--cpu",
                     "--mode", "eclipse", "--detrend", "recte"])


class TestConfig:
    def test_bool_key(self):
        assert config_from_dict({"recte": True}).recte.enabled
        assert not config_from_dict({"recte": False}).recte.enabled
        assert not config_from_dict({}).recte.enabled

    def test_mapping_key_implies_enabled(self):
        cfg = config_from_dict({"recte": {"tau_f": 300.0, "f0_s": 0.2}})
        assert cfg.recte.enabled
        assert cfg.recte.tau_f == 300.0
        assert cfg.recte.f0_s == 0.2
        assert cfg.recte.n_trap_s == 1525.38     # untouched default

    def test_unknown_key_raises(self):
        with pytest.raises(ValueError, match="recte"):
            config_from_dict({"recte": {"tua_f": 300.0}})


@pytest.mark.slow
def test_observation_hook_ramps_white_light():
    """End-to-end through Observation: with recte on (parametric hook
    off) the deterministic white-light curve ramps upward through the
    first orbit, tracking ops/recte.white_ramp."""
    from wayne_tpu.observation import Observation

    base = dict(grism="G141", subarray=128, NSAMP=2, SAMPSEQ="RAPID",
                scan=False, x_ref=20.0, y_ref=60.0, num_orbits=1,
                exposures_per_orbit=6, n_lambda=32, n_sub=2,
                noise=False)
    obs_off = Observation(config_from_dict(base))
    obs_on = Observation(config_from_dict({**base, "recte": True}))
    res_off = obs_off.simulate(chunk=6)
    res_on = obs_on.simulate(chunk=6)
    assert obs_on.scenes.trap_mult is not None
    assert obs_off.scenes.trap_mult is None
    # CDS (last - zeroth read) removes the deterministic bias pedestal
    # that noise=False keeps: the white-light metric must be source
    # charge, not pedestal (the pedestal dwarfs this faint test trace).
    def wl(res):
        cds = res.reads_dn[:, -1] - res.reads_dn[:, 0]
        return np.asarray(cds.sum(axis=(1, 2)))

    rel = wl(res_on) / wl(res_off)
    assert (rel < 0.99).all()                      # ~2% charge deficit
    assert (np.diff(rel) > 0.0).all()              # upward hook
    # and the ramp amplitude over the orbit is physically significant
    assert rel[-1] - rel[0] > 1e-4


def test_direct_image_unaffected_by_recte_maps():
    """The visit-opening direct image precedes every grism exposure, so
    no charge-trap state from the visit can apply to it: after
    simulate() attaches trap maps, simulate_direct_image must still
    produce the exact recte-off product (both persist_rate AND
    trap_mult nulled on its Scene)."""
    from wayne_tpu.observation import Observation

    base = dict(grism="G141", subarray=128, NSAMP=2, SAMPSEQ="RAPID",
                scan=False, x_ref=20.0, y_ref=60.0, num_orbits=1,
                exposures_per_orbit=6, n_lambda=32, n_sub=2,
                noise=False, seed=3)
    obs_off = Observation(config_from_dict(base))
    obs_on = Observation(config_from_dict({**base, "recte": True}))
    obs_on.simulate(chunk=6)                 # attaches trap_mult/persist
    assert obs_on.scenes.trap_mult is not None
    di_on, _, _ = obs_on.simulate_direct_image()
    di_off, _, _ = obs_off.simulate_direct_image()
    np.testing.assert_array_equal(np.asarray(di_on.reads_dn),
                                  np.asarray(di_off.reads_dn))
