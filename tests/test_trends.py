"""Systematics generators unit tests (reference: wayne/trend_generators/)."""

import jax.numpy as jnp
import numpy as np

from wayne_tpu.trends import TrendParams, ssv_factor, visit_trend_factor


def test_ssv_amplitude_and_period():
    p = TrendParams.create(ssv_amp=0.02, ssv_period_s=0.5, ssv_phase=0.0)
    t = jnp.linspace(0.0, 5.0, 10001)
    f = np.asarray(ssv_factor(t, p))
    np.testing.assert_allclose(f.max(), 1.02, atol=1e-4)
    np.testing.assert_allclose(f.min(), 0.98, atol=1e-4)
    np.testing.assert_allclose(f.mean(), 1.0, atol=1e-4)
    # period: f(t) == f(t + period)
    np.testing.assert_allclose(np.asarray(ssv_factor(jnp.array([0.1]), p)),
                               np.asarray(ssv_factor(jnp.array([0.6]), p)),
                               atol=1e-6)


def test_hook_recovers_within_orbit():
    p = TrendParams.create(hook_amp=0.004, hook_tau_s=200.0,
                           visit_slope_per_s=0.0, hook_orbit1_scale=2.0)
    t = jnp.array([0.0, 200.0, 2000.0])
    later = np.asarray(visit_trend_factor(t, t, jnp.float32(0.0), p))
    np.testing.assert_allclose(later[0], 1.0 - 0.004, atol=1e-6)
    assert later[1] > later[0]          # exponential recovery
    np.testing.assert_allclose(later[2], 1.0, atol=2e-4)
    # first orbit has a deeper hook
    first = np.asarray(visit_trend_factor(t, t, jnp.float32(1.0), p))
    assert first[0] < later[0]


def test_visit_slope():
    p = TrendParams.create(hook_amp=0.0, visit_slope_per_s=1e-6)
    f = np.asarray(visit_trend_factor(jnp.array([0.0, 1e4]),
                                      jnp.array([1e9, 1e9]),
                                      jnp.float32(0.0), p))
    np.testing.assert_allclose(f[0] - f[1], 1e-2, rtol=1e-4)


def test_random_walk_ssv():
    import jax
    from wayne_tpu.trends import ssv_random_walk
    p = TrendParams.create(ssv_rw_amp=0.02)
    n = 64
    f = np.asarray(ssv_random_walk(jax.random.PRNGKey(0), n, p))
    assert f.shape == (n,)
    # increments are iid N(0, amp^2/n) — a walk, not re-centered noise
    steps = np.diff(f)
    assert abs(steps.std() - 0.02 / np.sqrt(n)) < 0.02 / np.sqrt(n)
    assert 1e-4 < f.std() < 0.1                            # wanders
    # off by default: exact ones
    p0 = TrendParams.create(ssv_rw_amp=0.0)
    f0 = np.asarray(ssv_random_walk(jax.random.PRNGKey(0), 16, p0))
    np.testing.assert_array_equal(f0, 1.0)


def test_random_walk_spans_read_boundaries():
    """The walk's autocorrelation must cross read boundaries: per-read
    factor means wander together instead of re-centering to 1 each read
    (VERDICT round-1 weak #5)."""
    import jax
    from wayne_tpu.trends import ssv_random_walk
    p = TrendParams.create(ssv_rw_amp=0.05)
    nsamp, K = 12, 8
    f = np.asarray(ssv_random_walk(jax.random.PRNGKey(3), nsamp * K, p))
    per_read = f.reshape(nsamp, K)
    read_means = per_read.mean(axis=1)
    # Re-keyed/re-centered walks have read means == 1 exactly; a true
    # exposure-long walk has wandering read means...
    assert read_means.std() > 0.005
    # ...and adjacent reads stay close (continuity): the boundary jump is
    # a single step (~amp/sqrt(n)), far below the within-exposure wander.
    boundary_jumps = np.abs(per_read[1:, 0] - per_read[:-1, -1])
    assert boundary_jumps.max() < 4 * 0.05 / np.sqrt(nsamp * K)


def test_random_walk_ssv_in_kernel():
    import dataclasses
    import jax
    import jax.numpy as jnp
    from wayne_tpu.calibration import synthetic_tables
    from wayne_tpu.config import ExposureStatic, NoiseFlags
    from wayne_tpu.ops.exposure import simulate_exposure
    from wayne_tpu.scene import example_scene
    from wayne_tpu.trends import ssv_random_walk
    flags = dataclasses.replace(NoiseFlags.none(), ssv=True)
    nsamp, K = 3, 8
    cfg = ExposureStatic(subarray=64, n_lambda=32, n_sub=K, nsamp=nsamp,
                         samp_seq="SPARS10", scan=True, transit_quad=16)
    cfg = dataclasses.replace(cfg, noise=flags)
    tables = synthetic_tables("G141", subarray=64, n_lambda=32,
                              samp_seq="SPARS10", nsamp=nsamp)
    base = example_scene(32, scan_speed=1.0)
    base = dataclasses.replace(base, x_ref=jnp.float32(10.0),
                               y_ref=jnp.float32(10.0))
    quiet = dataclasses.replace(
        base, trends=TrendParams.create(ssv_amp=0.0, ssv_rw_amp=0.0))
    noisy = dataclasses.replace(
        base, trends=TrendParams.create(ssv_amp=0.0, ssv_rw_amp=0.05))
    a = simulate_exposure(quiet, tables, cfg)
    b = simulate_exposure(noisy, tables, cfg)
    # Per-read flux increments scale by the read-mean of the SAME
    # exposure-long walk the host can reconstruct from the scene key.
    gain = float(tables.gain)
    inc = lambda r: np.diff(
        np.asarray(r.reads_dn, np.float64).sum(axis=(1, 2))) * gain
    ratio = inc(b) / inc(a)                       # (nsamp,)
    walk = np.asarray(ssv_random_walk(
        jax.random.fold_in(noisy.key, 499), nsamp * K, noisy.trends))
    expected = walk.reshape(nsamp, K).mean(axis=1)
    np.testing.assert_allclose(ratio, expected, rtol=1e-4)


def test_psf_breathing_scale_equivalence():
    """scene.psf_scale = s must equal scaling the calibration widths by
    s exactly — the breathing leaf IS a width multiplier, nothing else."""
    import dataclasses

    import jax

    from wayne_tpu.calibration import synthetic_tables
    from wayne_tpu.config import ExposureStatic, NoiseFlags
    from wayne_tpu.ops.exposure import simulate_exposure
    from wayne_tpu.scene import example_scene

    cfg = ExposureStatic(subarray=64, n_lambda=32, n_sub=2, nsamp=3,
                         samp_seq="RAPID", scan=True,
                         noise=NoiseFlags.none())
    tables = synthetic_tables("G141", subarray=64, n_lambda=32,
                              samp_seq="RAPID", nsamp=3)
    scene = example_scene(32, scan_speed=1.0)
    scene = dataclasses.replace(scene, x_ref=jnp.float32(10.0),
                                y_ref=jnp.float32(10.0))
    s = 1.07
    got = simulate_exposure(
        dataclasses.replace(scene, psf_scale=jnp.float32(s)),
        tables, cfg).reads_dn
    want = simulate_exposure(
        scene,
        dataclasses.replace(tables,
                            psf_sigma=tables.psf_sigma * jnp.float32(s)),
        cfg).reads_dn
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-5)
    # And the wider PSF genuinely lowered the peak (same total charge).
    base = simulate_exposure(scene, tables, cfg).reads_dn
    assert float(got[-1].max()) < float(base[-1].max())
    np.testing.assert_allclose(float(got[-1].sum()), float(base[-1].sum()),
                               rtol=1e-4)


def test_breathing_and_sky_variation_wiring():
    """Observation attaches the intra-orbit environmental leaves; the
    defaults attach nothing (psf_scale None, constant sky)."""
    from wayne_tpu.config import config_from_dict
    from wayne_tpu.observation import Observation

    base = {"grism": "G141", "subarray": 64, "NSAMP": 2,
            "SAMPSEQ": "RAPID", "scan": True, "num_orbits": 2,
            "exposures_per_orbit": 6, "n_lambda": 32, "n_sub": 2,
            "sky_level": 1.5}
    obs0 = Observation(config_from_dict(base))
    assert obs0.scenes.psf_scale is None
    np.testing.assert_allclose(np.asarray(obs0.scenes.sky_level), 1.5,
                               atol=1e-6)

    obs = Observation(config_from_dict(dict(base, trends={
        "breathing_amp": 0.02, "sky_orbit_amp": 0.1,
        "sky_scatter": 0.03})))
    ps = np.asarray(obs.scenes.psf_scale)
    assert ps.shape == (obs.plan.n_exposures,)
    assert ps.min() >= 0.98 - 1e-6 and ps.max() <= 1.02 + 1e-6
    assert ps.std() > 1e-3                       # it varies within orbits
    sky = np.asarray(obs.scenes.sky_level)
    assert sky.std() > 0.01 and (sky >= 0).all()
    assert abs(sky.mean() - 1.5) < 0.3
    # Environmental draws come AFTER the pointing streams: enabling them
    # must not reshuffle the drift/jitter of an existing visit.
    np.testing.assert_allclose(np.asarray(obs.scenes.x_ref),
                               np.asarray(obs0.scenes.x_ref), atol=1e-6)
