"""fast_poisson statistical validation against exact samplers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wayne_tpu.ops.random import fast_poisson


@pytest.mark.parametrize("lam", [0.05, 0.5, 2.9, 12.0, 24.0, 60.0, 5000.0])
def test_moments(lam):
    n = 200_000
    x = np.asarray(fast_poisson(jax.random.PRNGKey(1), jnp.float32(lam),
                                shape=(n,)))
    assert abs(x.mean() - lam) < 5 * np.sqrt(lam / n) + 1e-3
    assert abs(x.var() / lam - 1.0) < 0.05
    assert x.min() >= 0
    np.testing.assert_allclose(x, np.round(x))  # integer-valued


def test_small_lam_distribution_exact():
    # Inverse-transform regime must match the exact pmf, not just moments.
    lam = 2.5
    n = 400_000
    x = np.asarray(fast_poisson(jax.random.PRNGKey(7), jnp.float32(lam),
                                shape=(n,)))
    from scipy.stats import poisson as sp_poisson
    ks = np.arange(0, 12)
    emp = np.array([(x == k).mean() for k in ks])
    pmf = sp_poisson.pmf(ks, lam)
    np.testing.assert_allclose(emp, pmf, atol=4 * np.sqrt(pmf.max() / n) + 5e-4)


def test_cornish_fisher_skewness():
    # The mid regime must reproduce Poisson's third moment (skew 1/sqrt(lam)).
    lam = 10.0
    n = 400_000
    x = np.asarray(fast_poisson(jax.random.PRNGKey(11), jnp.float32(lam),
                                shape=(n,)))
    skew = np.mean(((x - x.mean()) / x.std()) ** 3)
    assert abs(skew - 1.0 / np.sqrt(lam)) < 0.03


def test_zero_lam_gives_zero():
    x = np.asarray(fast_poisson(jax.random.PRNGKey(0), jnp.zeros((100,))))
    np.testing.assert_array_equal(x, 0.0)


def test_deterministic_per_key():
    lam = jnp.full((64,), 7.0)
    a = fast_poisson(jax.random.PRNGKey(3), lam)
    b = fast_poisson(jax.random.PRNGKey(3), lam)
    assert jnp.array_equal(a, b)
    c = fast_poisson(jax.random.PRNGKey(4), lam)
    assert not jnp.array_equal(a, c)


def test_mixed_lam_array():
    lam = jnp.array([0.1, 1.0, 30.0, 1e4])
    x = np.asarray(fast_poisson(jax.random.PRNGKey(5), lam, shape=(1000, 4)))
    means = x.mean(axis=0)
    np.testing.assert_allclose(means, np.asarray(lam), rtol=0.2, atol=0.05)


def test_exact_poisson_config_path():
    # ExposureStatic(exact_poisson=True) routes through jax.random.poisson.
    import dataclasses
    from wayne_tpu.calibration import synthetic_tables
    from wayne_tpu.config import ExposureStatic, NoiseFlags
    from wayne_tpu.ops.exposure import simulate_exposure
    from wayne_tpu.scene import example_scene
    flags = dataclasses.replace(NoiseFlags.none(), poisson=True)
    cfg = ExposureStatic(subarray=64, n_lambda=32, n_sub=2, nsamp=2,
                         samp_seq="RAPID", scan=False, noise=flags,
                         exact_poisson=True, transit_quad=16)
    tables = synthetic_tables("G141", subarray=64, n_lambda=32,
                              samp_seq="RAPID", nsamp=2)
    scene = example_scene(32, scan_speed=0.0)
    res = simulate_exposure(scene, tables, cfg)
    x = np.asarray(res.reads_dn)
    assert np.isfinite(x).all()
    np.testing.assert_allclose(x * 2.5, np.round(x * 2.5), atol=1e-3)


def test_exact_poisson_overrides_use_pallas():
    """exact_poisson promises jax.random.poisson statistics, so it must
    force the XLA path even when use_pallas is requested (the Pallas
    kernels sample in-kernel with the approximate three-regime sampler).
    Runs on CPU: if the Pallas path were taken this would fail to lower."""
    import dataclasses
    from wayne_tpu.calibration import synthetic_tables
    from wayne_tpu.config import ExposureStatic, NoiseFlags
    from wayne_tpu.ops.exposure import simulate_exposure
    from wayne_tpu.scene import example_scene
    flags = dataclasses.replace(NoiseFlags.none(), poisson=True)
    tables = synthetic_tables("G141", subarray=64, n_lambda=32,
                              samp_seq="RAPID", nsamp=2)
    scene = example_scene(32, scan_speed=0.0)
    common = dict(subarray=64, n_lambda=32, n_sub=2, nsamp=2,
                  samp_seq="RAPID", scan=False, noise=flags,
                  exact_poisson=True, transit_quad=16, band_px=32)
    ref = simulate_exposure(scene, tables, ExposureStatic(**common))
    pal = simulate_exposure(scene, tables,
                            ExposureStatic(use_pallas=True, **common))
    np.testing.assert_array_equal(np.asarray(ref.reads_dn),
                                  np.asarray(pal.reads_dn))
