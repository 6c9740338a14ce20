"""Pallas fused-readout kernel tests.

CPU (TPU interpret mode) covers the deterministic datapath exactly; the
hardware-PRNG statistics can only run on a real TPU (interpret mode does
not emulate the TPU PRNG) — those run in the TPU probe scripts and are
marked skip here unless a TPU is present.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from wayne_tpu.ops.pallas_readout import fused_read_step

S = 128
CONSTS = jnp.array([20.0, 78000.0, 2.5], jnp.float32)
# Per-pixel cubic planes with a scalar value so the reference math below
# stays closed-form: c1=0.04, c2=c3=0 reproduces the linear-deficit model.
NL = jnp.stack([jnp.full((S, S), 0.04, jnp.float32),
                jnp.zeros((S, S), jnp.float32),
                jnp.zeros((S, S), jnp.float32)])


def _inputs():
    rng = np.random.RandomState(0)
    cum = jnp.asarray(rng.uniform(0, 5e4, (S, S)), jnp.float32)
    add = jnp.asarray(rng.uniform(0, 1e3, (S, S)), jnp.float32)
    bg = jnp.asarray(rng.uniform(0, 20, (S, S)), jnp.float32)
    bias = jnp.asarray(1000.0 + rng.standard_normal((S, S)), jnp.float32)
    gain = jnp.asarray(2.5 * (1 + 0.01 * rng.standard_normal((S, S))),
                       jnp.float32)
    return cum, add, bg, bias, gain


def test_deterministic_path_matches_reference_math():
    cum, add, bg, bias, gain = _inputs()
    with pltpu.force_tpu_interpret_mode():
        cum2, dn = fused_read_step(
            jnp.array([1, 2, 9], jnp.int32), cum, add, bg, bias, gain, NL,
            CONSTS,
            poisson=False, read_noise=False, non_linearity=True, bias=True,
            scalar_gain=False, tile=64)
    cum_np = np.asarray(cum) + np.asarray(add) + np.asarray(bg)
    fw, nl = 78000.0, 0.04
    sig = np.minimum(cum_np, fw)
    sig = sig * (1 - nl * np.minimum(sig, fw) / fw)
    dn_np = (sig + np.asarray(bias)) / np.asarray(gain)
    np.testing.assert_allclose(np.asarray(cum2), cum_np, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dn), dn_np, rtol=1e-5)


def test_flags_off_passthrough():
    cum, add, bg, bias, gain = _inputs()
    with pltpu.force_tpu_interpret_mode():
        cum2, dn = fused_read_step(
            jnp.array([1, 2, 9], jnp.int32), cum, add, bg, bias, gain, NL,
            CONSTS,
            poisson=False, read_noise=False, non_linearity=False, bias=False,
            scalar_gain=True, tile=64)
    want = np.asarray(cum) + np.asarray(add) + np.asarray(bg)
    np.testing.assert_allclose(np.asarray(cum2), want, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dn), want / 2.5, rtol=1e-6)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG statistics need a real TPU")
def test_rng_statistics_on_tpu():
    cum = jnp.zeros((512, 512), jnp.float32)
    zero = jnp.zeros_like(cum)
    bg = jnp.full((512, 512), 12.0)
    bias = jnp.zeros_like(cum)
    gain = jnp.ones_like(cum)
    nl0 = jnp.zeros((3, 512, 512), jnp.float32)
    cum2, dn = fused_read_step(
        jnp.array([7, 3, 9], jnp.int32), cum, zero, bg, bias, gain, nl0,
        jnp.array([20.0, 78000.0, 1.0], jnp.float32),
        poisson=True, read_noise=True, non_linearity=False, bias=False,
        scalar_gain=True)
    cum2, dn = np.asarray(cum2), np.asarray(dn)
    assert abs(cum2.mean() - 12.0) < 0.1          # Poisson mean
    assert abs(cum2.var() / 12.0 - 1.0) < 0.05    # Poisson variance
    resid = dn - cum2
    assert abs(resid.std() - 20.0) < 0.5          # read noise sigma
    a, _ = fused_read_step(
        jnp.array([7, 3, 9], jnp.int32), cum, zero, bg, bias, gain, nl0,
        jnp.array([20.0, 78000.0, 1.0], jnp.float32),
        poisson=True, read_noise=True, non_linearity=False, bias=False,
        scalar_gain=True)
    np.testing.assert_array_equal(np.asarray(a), cum2)  # deterministic


def test_banded_deterministic_path():
    from wayne_tpu.ops.pallas_readout import fused_read_step_banded
    cum, _, bg, bias, gain = _inputs()
    W = 32
    rng = np.random.RandomState(3)
    band = jnp.asarray(rng.uniform(0, 500, (W, S)), jnp.float32)
    y0 = 41
    cr_pos = jnp.asarray([[5, 100, 0], [7, 90, 0]], jnp.int32)
    cr_q = jnp.asarray([1000.0, 2500.0, 0.0], jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        cum2, dn = fused_read_step_banded(
            jnp.array([1, 2, 9], jnp.int32), jnp.array([y0], jnp.int32),
            cum, band, bg, bias, gain, NL, cr_pos, cr_q, CONSTS,
            poisson=False, read_noise=False, non_linearity=True, bias=True,
            scalar_gain=False, with_cr=True)
    want = np.asarray(cum) + np.asarray(bg)
    want[y0:y0 + W, :] += np.asarray(band)
    want[5, 7] += 1000.0
    want[100, 90] += 2500.0
    np.testing.assert_allclose(np.asarray(cum2), want, rtol=1e-6)
    fw, nl = 78000.0, 0.04
    sig = np.minimum(want, fw)
    sig = sig * (1 - nl * np.minimum(sig, fw) / fw) + np.asarray(bias)
    np.testing.assert_allclose(np.asarray(dn), sig / np.asarray(gain),
                               rtol=1e-5)


def test_fused_exposure_matches_xla_deterministic():
    """The whole-exposure fused kernel == the XLA chain with all
    stochastic effects off (dark/sky/flat/nonlin/bias/gain on)."""
    import dataclasses

    from wayne_tpu.calibration import synthetic_tables
    from wayne_tpu.config import ExposureStatic, NoiseFlags
    from wayne_tpu.ops.exposure import simulate_exposure
    from wayne_tpu.scene import example_scene

    flags = dataclasses.replace(
        NoiseFlags.all(), poisson=False, read_noise=False)
    # cosmic_rays stays ON: both paths draw CRs from the same per-read
    # keys, so the comparison is exact even with hits deposited.
    S, NL, NSAMP = 64, 32, 3
    tables = synthetic_tables("G141", subarray=S, n_lambda=NL,
                              samp_seq="SPARS10", nsamp=NSAMP)
    scene = example_scene(NL, scan_speed=1.0)
    scene = dataclasses.replace(scene, x_ref=jnp.float32(10.0),
                                y_ref=jnp.float32(10.0))
    mk = lambda pallas: ExposureStatic(
        subarray=S, n_lambda=NL, n_sub=4, nsamp=NSAMP, samp_seq="SPARS10",
        scan=True, noise=flags, band_px=16, transit_quad=16,
        use_pallas=pallas)
    ref = simulate_exposure(scene, tables, mk(False))
    with pltpu.force_tpu_interpret_mode():
        got = simulate_exposure(scene, tables, mk(True))
    np.testing.assert_allclose(np.asarray(got.reads_dn),
                               np.asarray(ref.reads_dn), rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.ideal_e),
                               np.asarray(ref.ideal_e), rtol=1e-5, atol=1e-4)
    assert float(got.saturated_frac) == float(ref.saturated_frac)
