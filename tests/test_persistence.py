"""Image persistence (ops/persistence.py): decay law, stimulus gating,
visit integration, config plumbing, sharding. Beyond the reference —
the reference models only the within-orbit hook ramp, no
exposure-to-exposure afterglow."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wayne_tpu.calibration import synthetic_tables
from wayne_tpu.config import (
    ExposureStatic, NoiseFlags, PersistenceConfig, config_from_dict,
)
from wayne_tpu.ops.persistence import (
    decay_weights, persistence_rates, stimulus_sigmoid,
    visit_persistence_rates,
)
from wayne_tpu.ops.visit import simulate_visit
from wayne_tpu.scene import example_scene

S, NL, NSAMP = 64, 32, 2
CFG = ExposureStatic(subarray=S, n_lambda=NL, n_sub=2, nsamp=NSAMP,
                     samp_seq="RAPID", scan=False, max_cr_per_read=4,
                     transit_quad=16, noise=NoiseFlags.none())
TABLES = synthetic_tables("G141", subarray=S, n_lambda=NL, samp_seq="RAPID",
                          nsamp=NSAMP)
# Aggressive trap parameters so the 64^2 test visit (far from full well)
# still persists strongly: knee at 500 e- — 10 sigmoid widths above the
# sky+dark fluence (~0.2 e- at this 0.12 s RAPID exptime), well below the
# ~860 e- peak trace fluence — with A = 2 e-/s.
PCFG = PersistenceConfig(enabled=True, amplitude_e_s=2.0, x0_e=500.0,
                         dx_e=50.0)


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


class TestDecayWeights:
    def test_strictly_causal(self):
        t = jnp.asarray([0.0, 200.0, 400.0, 1000.0])
        w = np.asarray(decay_weights(t, exptime_s=50.0))
        assert np.all(w[np.triu_indices(4)] == 0.0)      # j >= i: zero
        assert np.all(w[np.tril_indices(4, k=-1)] > 0.0)  # j < i: positive

    def test_gamma1_analytic(self):
        t = jnp.asarray([0.0, 500.0])
        texp = 100.0
        w = np.asarray(decay_weights(t, exptime_s=texp, gamma=1.0))
        a = 500.0 - texp                 # T_1 - E_0
        want = 1000.0 * np.log((a + texp) / a) / texp
        np.testing.assert_allclose(w[1, 0], want, rtol=1e-5)

    def test_general_gamma_matches_quadrature(self):
        t = jnp.asarray([0.0, 700.0])
        texp = 120.0
        for gamma in (0.7, 1.5):
            w = np.asarray(decay_weights(t, exptime_s=texp, gamma=gamma))
            a = 700.0 - texp
            grid = np.linspace(a, a + texp, 20001)
            trapezoid = getattr(np, "trapezoid", np.trapz)
            want = trapezoid((grid / 1000.0) ** (-gamma), grid) / texp
            np.testing.assert_allclose(w[1, 0], want, rtol=1e-4)

    def test_older_stimulus_decays(self):
        t = jnp.asarray([0.0, 300.0, 900.0])
        w = np.asarray(decay_weights(t, exptime_s=50.0))
        assert w[2, 0] < w[2, 1]   # the older stimulus contributes less

    def test_back_to_back_clamps_lower_bound_only(self):
        """Gap < t_min: the window is [t_min, gap+texp], NOT shifted to
        [t_min, t_min+texp] — only the lower bound is clamped, as the
        docstring states (regression)."""
        t = jnp.asarray([0.0, 50.0])
        w = np.asarray(decay_weights(t, exptime_s=50.0, t_min_s=1.0))
        want = 1000.0 * np.log(50.0 / 1.0) / 50.0
        np.testing.assert_allclose(w[1, 0], want, rtol=1e-5)

    def test_external_stimulus_times(self):
        """stim_end_s yields (N, M) weights against arbitrary stimulus
        shutter-close times (how the visit-opening direct image is
        prepended to the stimulus stack)."""
        t = jnp.asarray([100.0, 400.0])
        w = np.asarray(decay_weights(t, exptime_s=50.0,
                                     stim_end_s=jnp.asarray([0.0])))
        assert w.shape == (2, 1)
        np.testing.assert_allclose(
            w[0, 0], 1000.0 * np.log(150.0 / 100.0) / 50.0, rtol=1e-5)
        assert w[1, 0] < w[0, 0]


def test_stimulus_sigmoid_gating():
    assert float(stimulus_sigmoid(jnp.float32(5e4), 5e4, 1e4)) == \
        pytest.approx(0.5)
    assert float(stimulus_sigmoid(jnp.float32(2e5), 5e4, 1e4)) > 0.999
    assert float(stimulus_sigmoid(jnp.float32(0.0), 5e4, 1e4)) < 0.01


def test_first_exposure_zero_and_trace_localised():
    scenes = _visit(4)
    rates = np.asarray(visit_persistence_rates(scenes, TABLES, CFG, PCFG,
                                               chunk=4))
    assert rates.shape == (4, S, S)
    np.testing.assert_array_equal(rates[0], 0.0)
    assert rates[1:].max() > 0.0
    # The afterglow sits where the spectrum exposed the detector: its
    # peak row matches the trace row, and rows far away stay dark.
    row_power = rates[3].sum(axis=1)
    assert abs(int(np.argmax(row_power)) - 20) <= 3
    assert row_power[45:].max() < 0.05 * row_power.max()


def test_direct_image_glows_into_first_exposure():
    """The visit-opening direct image is the classic WFC3 persistence
    source (the undispersed PSF spot concentrates the star's whole
    bandpass): with persistence.direct_image on (default) exposure 0
    carries a nonzero afterglow localised at the spot; with it off,
    exposure 0 is zero (spectrum stimuli are all strictly later)."""
    from wayne_tpu.observation import Observation

    pars = dict(grism="G141", subarray=64, NSAMP=2, SAMPSEQ="RAPID",
                scan=False, x_ref=15.0, y_ref=20.0, num_orbits=1,
                exposures_per_orbit=3, n_lambda=32, n_sub=2,
                persistence={"enabled": True, "amplitude_e_s": 2.0,
                             "x0_e": 500.0, "dx_e": 50.0})
    obs = Observation(config_from_dict(pars))
    obs._ensure_persistence()
    rates = np.asarray(obs.scenes.persist_rate)
    assert rates[0].max() > 0.0
    y_pk, x_pk = np.unravel_index(int(np.argmax(rates[0])),
                                  rates[0].shape)
    assert abs(y_pk - 20) <= 2 and abs(x_pk - 15) <= 2, (y_pk, x_pk)
    # every later exposure inherits at least as much total stimulus
    assert rates[1].max() > 0.0

    pars["persistence"]["direct_image"] = False
    obs2 = Observation(config_from_dict(pars))
    obs2._ensure_persistence()
    np.testing.assert_array_equal(
        np.asarray(obs2.scenes.persist_rate)[0], 0.0)


def test_prior_observation_fluence_file(tmp_path):
    """Persistence from the PREVIOUS program: a user-supplied prior
    fluence map (prior_fluence_file) stimulates exposure 0, localised
    where the prior target sat, and its afterglow decays monotonically
    across the visit (all visit-internal stimuli come later, so with
    the direct image off the prior spot is the only source there)."""
    from wayne_tpu.observation import Observation

    prior = np.zeros((64, 64), np.float32)
    prior[40:44, 50:54] = 60000.0                 # prior target's spot
    fpath = tmp_path / "prior.npy"
    np.save(fpath, prior)

    pars = dict(grism="G141", subarray=64, NSAMP=2, SAMPSEQ="RAPID",
                scan=False, x_ref=15.0, y_ref=20.0, num_orbits=1,
                exposures_per_orbit=3, n_lambda=32, n_sub=2,
                persistence={"enabled": True, "amplitude_e_s": 2.0,
                             "x0_e": 500.0, "dx_e": 50.0,
                             "direct_image": False,
                             "prior_fluence_file": str(fpath),
                             "prior_end_s": -300.0})
    obs = Observation(config_from_dict(pars))
    obs._ensure_persistence()
    rates = np.asarray(obs.scenes.persist_rate)
    spot = rates[:, 40:44, 50:54].mean(axis=(1, 2))
    assert spot[0] > 0.1                          # afterglow at exposure 0
    assert np.all(np.diff(spot) < 0.0)            # decays across the visit
    # away from the prior spot (and with no direct image) exposure 0
    # carries only the sigmoid's zero-fluence tail (~exp(-x0/dx) of the
    # amplitude), orders of magnitude below the spot afterglow
    off_spot = rates[0].copy()
    off_spot[35:49, 45:59] = 0.0
    assert off_spot.max() < 1e-2 * spot[0]

    # wrong shape fails loudly
    np.save(tmp_path / "bad.npy", np.zeros((32, 32), np.float32))
    pars["persistence"]["prior_fluence_file"] = str(tmp_path / "bad.npy")
    obs2 = Observation(config_from_dict(pars))
    with pytest.raises(ValueError, match="expected"):
        obs2._ensure_persistence()


def test_weak_stimulus_produces_negligible_persistence():
    scenes = _visit(3)
    realistic = PersistenceConfig(enabled=True)   # knee at 0.95 full well
    rates = np.asarray(visit_persistence_rates(scenes, TABLES, CFG,
                                               realistic, chunk=4))
    # This faint 64^2 test visit peaks at ~860 e- — 4 sigmoid widths
    # below the WFC3-realistic knee — so the released rate stays far
    # under the 1.2 e-/s sky rate (real persistence only matters for
    # pixels pumped near full well, which is the point of the model).
    assert rates.max() < 0.05


def test_noise_free_ramp_adds_exact_persistence_charge():
    """With all noise off, the persisted charge enters each read exactly
    as rate * t_read / gain extra DN."""
    scenes = _visit(3)
    rates = visit_persistence_rates(scenes, TABLES, CFG, PCFG, chunk=4)
    with_p = dataclasses.replace(scenes, persist_rate=rates)

    base = simulate_visit(scenes, TABLES, CFG, chunk=3).reads_dn
    pers = simulate_visit(with_p, TABLES, CFG, chunk=3).reads_dn

    gain = float(TABLES.gain)
    t = np.asarray(TABLES.read_times)                 # (NR,)
    mask = np.asarray(TABLES.active_mask)
    want = (np.asarray(rates)[:, None] * mask[None, None]
            * t[None, :, None, None] / gain)
    np.testing.assert_allclose(np.asarray(pers) - np.asarray(base), want,
                               rtol=2e-4, atol=2e-4)
    # and exposure 0 is bit-identical (zero map, same keys)
    np.testing.assert_array_equal(np.asarray(pers[0]), np.asarray(base[0]))


def test_sharded_visit_with_persistence_matches_single_device():
    from wayne_tpu.ops.visit import simulate_visit_sharded
    from wayne_tpu.parallel.mesh import make_mesh

    scenes = _visit(8)
    rates = visit_persistence_rates(scenes, TABLES, CFG, PCFG, chunk=4)
    with_p = dataclasses.replace(scenes, persist_rate=rates)
    mesh = make_mesh(jax.devices())
    got = simulate_visit_sharded(with_p, TABLES, CFG, mesh, chunk=1)
    want = simulate_visit(with_p, TABLES, CFG, chunk=4)
    np.testing.assert_array_equal(np.asarray(got.reads_dn),
                                  np.asarray(want.reads_dn))


def test_ensemble_path_carries_persistence():
    """The MC-ensemble machinery (config 5) shards the persist leaf like
    any Scene leaf: spectra stay finite and reflect the afterglow."""
    from wayne_tpu.parallel.ensemble import mc_scenes, simulate_ensemble_spectra
    from wayne_tpu.parallel.mesh import make_mesh, shard_scenes

    scenes = _visit(8)
    rates = visit_persistence_rates(scenes, TABLES, CFG, PCFG, chunk=4)
    with_p = dataclasses.replace(scenes, persist_rate=rates)
    mesh = make_mesh(jax.devices())
    ens = shard_scenes(mc_scenes(with_p, 4), mesh, n_batch_axes=2)
    sp = np.asarray(simulate_ensemble_spectra(ens, TABLES, CFG, mesh))
    ens0 = shard_scenes(mc_scenes(scenes, 4), mesh, n_batch_axes=2)
    sp0 = np.asarray(simulate_ensemble_spectra(ens0, TABLES, CFG, mesh))
    assert sp.shape == (4, 8, S) and np.isfinite(sp).all()
    assert np.abs(sp - sp0).max() > 0.5     # afterglow reached the spectra


def test_ensemble_keeps_charge_memory_maps_untiled():
    """MC_INVARIANT_FIELDS ride the ensemble at their per-visit
    (n_exp, S, S) shape — mc_scenes must NOT materialise n_mc HBM
    copies (regression: the broadcast cost ~chunk_mc * n_exp * S^2 * 4 B
    per leaf at scale) — and every realisation must see the SAME maps:
    the ensemble spectra of a trap+persistence visit match the
    single-visit simulation per realisation key."""
    import jax.numpy as jnp

    from wayne_tpu.parallel.ensemble import (
        extract_spectra, mc_scenes, simulate_ensemble_spectra)
    from wayne_tpu.parallel.mesh import make_mesh, shard_scenes
    from wayne_tpu.ops.visit import simulate_visit

    scenes = _visit(4)
    rates = visit_persistence_rates(scenes, TABLES, CFG, PCFG, chunk=4)
    with_p = dataclasses.replace(
        scenes, persist_rate=rates,
        trap_mult=jnp.full((4, S, S), 0.97, jnp.float32))
    ens = mc_scenes(with_p, 4, seed=11)
    assert ens.persist_rate.shape == (4, S, S)      # no mc axis
    assert ens.trap_mult.shape == (4, S, S)
    assert ens.rp_over_rs.ndim == with_p.rp_over_rs.ndim + 1  # tiled

    mesh = make_mesh(jax.devices())
    sp = np.asarray(simulate_ensemble_spectra(
        shard_scenes(ens, mesh), TABLES, CFG, mesh))
    for m in range(2):
        one = dataclasses.replace(
            with_p, key=jax.tree_util.tree_map(lambda k: k[m], ens.key))
        res = simulate_visit(one, TABLES, CFG, chunk=4)
        want = np.asarray(extract_spectra(res.reads_dn))
        np.testing.assert_allclose(sp[m], want, rtol=1e-6, atol=1e-3)


class TestConfig:
    def test_bool_key(self):
        assert config_from_dict({"persistence": True}).persistence.enabled
        assert not config_from_dict({"persistence": False}
                                    ).persistence.enabled
        assert not config_from_dict({}).persistence.enabled

    def test_mapping_key_implies_enabled(self):
        cfg = config_from_dict({"persistence": {"amplitude_e_s": 0.5,
                                                "gamma": 0.98}})
        assert cfg.persistence.enabled
        assert cfg.persistence.amplitude_e_s == 0.5
        assert cfg.persistence.gamma == 0.98

    def test_unknown_key_raises(self):
        with pytest.raises(ValueError, match="persistence"):
            config_from_dict({"persistence": {"amplitdue": 1.0}})


@pytest.mark.slow
def test_observation_generate_with_persistence(tmp_path):
    """End-to-end: the YAML flag flows through Observation.generate —
    exposure 0 is untouched when the direct-image stimulus is off,
    later exposures carry the afterglow, and the product records
    PERSIST. (With direct_image on — the default — exposure 0 ALSO
    glows from the visit-opening direct image; see
    test_direct_image_glows_into_first_exposure.)"""
    from wayne_tpu.io.ima import read_ima
    from wayne_tpu.observation import Observation

    base = {"grism": "G141", "subarray": 64, "NSAMP": 2, "SAMPSEQ": "RAPID",
            "scan": True, "x_ref": 15.0, "y_ref": 20.0, "num_orbits": 1,
            "exposures_per_orbit": 4, "n_lambda": 32, "n_sub": 2}
    cfg_off = config_from_dict(base)
    cfg_on = config_from_dict({**base, "persistence": {
        "amplitude_e_s": 2.0, "x0_e": 500.0, "dx_e": 50.0,
        "direct_image": False}})

    p_off = Observation(cfg_off).generate(str(tmp_path / "off"), chunk=4,
                                          resume=False)
    p_on = Observation(cfg_on).generate(str(tmp_path / "on"), chunk=4,
                                        resume=False)
    h0_off, r0_off, _ = read_ima(p_off[0])
    h0_on, r0_on, _ = read_ima(p_on[0])
    assert h0_off["PERSIST"] is False and h0_on["PERSIST"] is True
    np.testing.assert_array_equal(r0_off, r0_on)       # no prior stimulus
    _, r3_off, _ = read_ima(p_off[3])
    _, r3_on, _ = read_ima(p_on[3])
    assert np.abs(r3_on - r3_off).max() > 0.5          # afterglow present
