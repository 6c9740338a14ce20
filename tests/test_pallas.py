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
            jnp.array([1, 2, 9], jnp.int32), cum, add, bg, bias,
            1.0 / gain, NL,
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
            jnp.array([1, 2, 9], jnp.int32), cum, add, bg, bias,
            1.0 / gain, NL,
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
            cum, band, bg, bias, 1.0 / gain, NL, cr_pos, cr_q, CONSTS,
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


def test_fused_exposure_col_tiles_sizing():
    from wayne_tpu.ops.pallas_readout import fused_exposure_col_tiles
    assert fused_exposure_col_tiles(64) == 1
    assert fused_exposure_col_tiles(256) == 1
    assert fused_exposure_col_tiles(512) == 1
    assert fused_exposure_col_tiles(1024) == 8      # 128-col tiles
    assert fused_exposure_col_tiles(2048) == 0      # 64-col tiles would
    #                                                 break lane alignment
    assert fused_exposure_col_tiles(640) == 5       # 128-col tiles
    # every accepted tiling keeps blocks at or under the measured
    # 512^2 budget and lane-aligned
    for s in (640, 1024):
        ct = fused_exposure_col_tiles(s)
        assert s % ct == 0 and (s // ct) % 128 == 0
        assert s * (s // ct) <= 512 * 256


def test_fused_exposure_tiled_matches_untiled_deterministic():
    """Column-tiled whole-exposure kernel == the untiled layout on the
    deterministic datapath (noise off), with CR hits planted in every
    tile INCLUDING columns hugging the tile seams — the global-column
    matching must land each hit in exactly one tile."""
    from wayne_tpu.ops.pallas_readout import fused_exposure_readout

    S2, W, NR, NCR = 256, 32, 4, 4
    rng = np.random.RandomState(11)
    bands = jnp.asarray(rng.uniform(0, 800, (NR, W, S2)), jnp.float32)
    bands = bands.at[0].set(0.0)
    y0s = jnp.asarray([0, 8, 48, 200], jnp.int32)
    dts = jnp.asarray([0.0, 2.9, 2.9, 2.9], jnp.float32)
    bg = jnp.asarray(rng.uniform(0, 0.4, (S2, S2)), jnp.float32)
    bias = jnp.asarray(1000.0 + rng.standard_normal((S2, S2)), jnp.float32)
    gain = jnp.asarray(2.5 * (1 + 0.01 * rng.standard_normal((S2, S2))),
                       jnp.float32)
    nl = jnp.stack([jnp.full((S2, S2), 0.04, jnp.float32),
                    jnp.zeros((S2, S2), jnp.float32),
                    jnp.zeros((S2, S2), jnp.float32)])
    # tile width at col_tiles=2 is 128: hits at 127/128 straddle the seam
    cr_pos = jnp.zeros((NR, 2, NCR), jnp.int32)
    cr_q = jnp.zeros((NR, NCR), jnp.float32)
    cr_pos = cr_pos.at[2].set(jnp.asarray(
        [[10, 20, 30, 40], [127, 128, 0, 255]], jnp.int32))
    cr_q = cr_q.at[2].set(jnp.asarray([1e3, 2e3, 3e3, 4e3], jnp.float32))
    seed = jnp.array([3, 0, 7], jnp.int32)
    cum0 = jnp.zeros((S2, S2), jnp.float32)
    consts = jnp.array([20.0, 78000.0, 2.5], jnp.float32)
    kw = dict(poisson=False, read_noise=False, non_linearity=True,
              bias=True, scalar_gain=False, with_cr=True)
    with pltpu.force_tpu_interpret_mode():
        dn1, cum1 = fused_exposure_readout(
            seed, y0s, dts, bands, cum0, bg, bias, 1.0 / gain, nl,
            cr_pos, cr_q, consts, col_tiles=1, **kw)
        dn2, cum2 = fused_exposure_readout(
            seed, y0s, dts, bands, cum0, bg, bias, 1.0 / gain, nl,
            cr_pos, cr_q, consts, col_tiles=2, **kw)
    np.testing.assert_allclose(np.asarray(cum2), np.asarray(cum1),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dn2), np.asarray(dn1),
                               rtol=1e-5)
    # the CR charges really landed (once each)
    dep = np.asarray(cum2) - (np.asarray(bg) * float(dts.sum()))
    for (y, x), q in zip([(10, 127), (20, 128), (30, 0), (40, 255)],
                         [1e3, 2e3, 3e3, 4e3]):
        band_sum = sum(
            float(bands[k, y - int(y0s[k]), x])
            for k in range(NR)
            if 0 <= y - int(y0s[k]) < W)
        np.testing.assert_allclose(dep[y, x], band_sum + q, rtol=1e-5)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG statistics need a real TPU")
def test_poisson_regime_statistics_on_tpu():
    """All three in-kernel Poisson regimes on hardware, including the
    zero-rate reference-border class that the small-lam branch gate
    special-cases (Poisson(0) = 0 exactly, via the Gauss-path where —
    the exact branch no longer fires for zeros alone)."""
    S2 = 512
    cum = jnp.zeros((S2, S2), jnp.float32)
    zero = jnp.zeros_like(cum)
    bg = np.zeros((S2, S2), np.float32)
    bg[:, S2 // 3: 2 * S2 // 3] = 0.5       # dark-only class (exact branch)
    bg[:, 2 * S2 // 3:] = 12.0              # sky class (Cornish-Fisher)
    nl0 = jnp.zeros((3, S2, S2), jnp.float32)
    cum2, _ = fused_read_step(
        jnp.array([5, 1, 3], jnp.int32), cum, zero, jnp.asarray(bg), zero,
        jnp.ones_like(cum), nl0,
        jnp.array([0.0, 78000.0, 1.0], jnp.float32),
        poisson=True, read_noise=False, non_linearity=False, bias=False,
        scalar_gain=True)
    c = np.asarray(cum2)
    z, s_, g = c[:, :S2 // 3], c[:, S2 // 3:2 * S2 // 3], c[:, 2 * S2 // 3:]
    assert (z == 0).all()                          # exactly zero
    assert abs(s_.mean() - 0.5) < 0.01 and abs(s_.var() - 0.5) < 0.01
    assert (s_ == np.round(s_)).all() and s_.min() == 0.0
    assert abs(g.mean() - 12) < 0.05 and abs(g.var() - 12) < 0.25
