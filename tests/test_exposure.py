"""Exposure-kernel integration tests: fp64 oracle diff, count conservation,
noise statistics (SURVEY.md section 4: oracle diff with noise off is the
core validation of the TPU path)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wayne_tpu.calibration import synthetic_tables
from wayne_tpu.config import ExposureStatic, NoiseFlags
from wayne_tpu.ops.exposure import simulate_exposure
from wayne_tpu.oracle.numpy_oracle import oracle_ideal_frame
from wayne_tpu.scene import example_scene

S, NL, NSAMP = 128, 64, 4


def make(scan: bool, noise: NoiseFlags, n_sub: int = 8) -> tuple:
    cfg = ExposureStatic(subarray=S, n_lambda=NL, n_sub=n_sub, nsamp=NSAMP,
                         samp_seq="SPARS10", scan=scan, noise=noise)
    tables = synthetic_tables("G141", subarray=S, n_lambda=NL,
                              samp_seq="SPARS10", nsamp=NSAMP)
    scene = example_scene(NL, scan_speed=1.5 if scan else 0.0)
    # keep the spectrum on-detector for conservation tests
    scene = dataclasses.replace(scene, x_ref=jnp.float32(30.0),
                                y_ref=jnp.float32(40.0))
    return cfg, tables, scene


def orbit_dict(scene):
    o = scene.orbit
    return dict(period_s=float(o.period_s), t0_s=float(o.t0_s),
                sma_rs=float(o.sma_rs), inc_rad=float(o.inc_rad),
                ecc=float(o.ecc), omega_rad=float(o.omega_rad))


class TestIdealVsOracle:
    @pytest.mark.parametrize("scan", [False, True])
    def test_matches_fp64_reference_algorithm(self, scan):
        cfg, tables, scene = make(scan, NoiseFlags.none())
        res = simulate_exposure(scene, tables, cfg)
        got = np.asarray(res.ideal_e, np.float64)
        want = oracle_ideal_frame(
            tables, cfg, x_ref=30.0, y_ref=40.0,
            scan_speed=float(scene.scan_speed), exp_start_s=0.0,
            stellar_flux=np.asarray(scene.stellar_flux),
            rp_over_rs=np.asarray(scene.rp_over_rs),
            ld=np.asarray(scene.ld), orbit=orbit_dict(scene))
        scale = want.max()
        np.testing.assert_allclose(got / scale, want / scale, atol=2e-4)

    def test_g102_matches_fp64_reference_algorithm(self):
        """Both grism families diff against the oracle (G102 dispersion,
        trace and sensitivity differ from G141)."""
        cfg = ExposureStatic(subarray=S, n_lambda=NL, n_sub=8, nsamp=NSAMP,
                             samp_seq="SPARS10", scan=True,
                             noise=NoiseFlags.none())
        tables = synthetic_tables("G102", subarray=S, n_lambda=NL,
                                  samp_seq="SPARS10", nsamp=NSAMP)
        scene = example_scene(NL, scan_speed=1.5)
        scene = dataclasses.replace(scene, x_ref=jnp.float32(30.0),
                                    y_ref=jnp.float32(40.0))
        res = simulate_exposure(scene, tables, cfg)
        got = np.asarray(res.ideal_e, np.float64)
        want = oracle_ideal_frame(
            tables, cfg, x_ref=30.0, y_ref=40.0,
            scan_speed=1.5, exp_start_s=0.0,
            stellar_flux=np.asarray(scene.stellar_flux),
            rp_over_rs=np.asarray(scene.rp_over_rs),
            ld=np.asarray(scene.ld), orbit=orbit_dict(scene))
        scale = want.max()
        np.testing.assert_allclose(got / scale, want / scale, atol=2e-4)

    def test_reads_are_cumulative_with_noise_off(self, ):
        cfg, tables, scene = make(True, NoiseFlags.none())
        res = simulate_exposure(scene, tables, cfg)
        reads = np.asarray(res.reads_dn, np.float64) * float(tables.gain)
        assert np.all(np.diff(reads.sum(axis=(1, 2))) > 0)  # monotone ramp
        np.testing.assert_allclose(reads[0], 0.0, atol=1e-3)  # zeroth read
        # final read equals accumulated ideal signal (noise off, flat off...)
        np.testing.assert_allclose(
            reads[-1].sum() / np.asarray(res.ideal_e).sum(), 1.0, rtol=1e-4)


class TestCountConservation:
    def test_total_counts_match_input_spectrum(self):
        cfg, tables, scene = make(False, NoiseFlags.none(), n_sub=2)
        res = simulate_exposure(scene, tables, cfg)
        # expected: sum over bins of F*sens*dlam * total integration time,
        # scaled by each bin's on-detector fraction (G141's ~140px spectrum
        # overhangs the 128px test subarray). The deposit matrix row sums
        # are validated independently in test_dispersion.
        from wayne_tpu.ops.dispersion import (
            trace_params, wl_to_x, x_deposit_matrix)
        tp = trace_params(tables, scene.x_ref, scene.y_ref)
        X = x_deposit_matrix(wl_to_x(tables.wl_edges, tp), S)
        on_det = np.asarray(X.sum(axis=1), np.float64)
        dlam = np.diff(np.asarray(tables.wl_edges, np.float64))
        rate = (np.asarray(scene.stellar_flux, np.float64)
                * np.asarray(tables.sensitivity, np.float64) * dlam)
        t_total = float(tables.read_times[-1])
        expected = (rate * on_det).sum() * t_total
        got = float(np.asarray(res.ideal_e).sum())
        assert abs(got / expected - 1.0) < 5e-3  # PSF tails + LC variation


class TestNoise:
    def test_poisson_statistics(self):
        flags = NoiseFlags.none()
        flags = dataclasses.replace(flags, poisson=True)
        cfg, tables, scene = make(False, flags, n_sub=2)
        keys = jax.random.split(jax.random.PRNGKey(7), 32)
        batched = jax.vmap(lambda k: simulate_exposure(
            dataclasses.replace(scene, key=k), tables, cfg).reads_dn[-1])
        reads = np.asarray(batched(keys), np.float64) * float(tables.gain)
        mean, var = reads.mean(axis=0), reads.var(axis=0)
        bright = mean > 500.0
        ratio = var[bright] / mean[bright]
        assert abs(np.median(ratio) - 1.0) < 0.35   # var ~= mean

    def test_read_noise_statistics(self):
        flags = dataclasses.replace(NoiseFlags.none(), read_noise=True)
        cfg, tables, scene = make(False, flags, n_sub=2)
        res = simulate_exposure(scene, tables, cfg)
        read0_e = np.asarray(res.reads_dn[0], np.float64) * float(tables.gain)
        assert abs(read0_e.std() - float(tables.read_noise_e)) < 1.0
        assert abs(read0_e.mean()) < 0.5

    def test_dark_accumulates_linearly(self):
        flags = dataclasses.replace(NoiseFlags.none(), dark=True)
        cfg, tables, scene = make(False, flags, n_sub=2)
        scene = dataclasses.replace(scene,
                                    stellar_flux=jnp.zeros_like(scene.stellar_flux))
        res = simulate_exposure(scene, tables, cfg)
        reads_e = np.asarray(res.reads_dn, np.float64) * float(tables.gain)
        times = np.asarray(tables.read_times, np.float64)
        dark_mean = float(np.asarray(tables.dark_map).mean())
        got = reads_e[1:].mean(axis=(1, 2))
        np.testing.assert_allclose(got, dark_mean * times[1:], rtol=0.05)

    def test_he_airglow_second_sky_component(self):
        """Scene.sky_he_level adds a separately-scaled background with
        the He-frame spatial pattern, exactly linear in time (noise-free
        chain): last_read(with) - last_read(without) =
        he_level * sky_he_frame * exptime / gain."""
        flags = dataclasses.replace(NoiseFlags.none(), sky=True)
        cfg, tables, scene = make(False, flags, n_sub=2)
        scene = dataclasses.replace(
            scene, stellar_flux=jnp.zeros_like(scene.stellar_flux))
        base = simulate_exposure(scene, tables, cfg)
        he = dataclasses.replace(scene, sky_he_level=jnp.float32(0.8))
        got = simulate_exposure(he, tables, cfg)
        delta = (np.asarray(got.reads_dn[-1], np.float64)
                 - np.asarray(base.reads_dn[-1], np.float64))
        expect = (0.8 * np.asarray(tables.sky_he_frame, np.float64)
                  * float(tables.read_times[-1]) / float(tables.gain))
        np.testing.assert_allclose(delta, expect, rtol=2e-4, atol=1e-3)
        # the He pattern differs from the master sky (it is a real
        # second component, not a rescale)
        corr = np.corrcoef(
            np.asarray(tables.sky_he_frame).ravel(),
            np.asarray(tables.sky_frame).ravel())[0, 1]
        assert abs(corr) < 0.9

    def test_cosmic_rays_add_charge(self):
        flags = dataclasses.replace(NoiseFlags.none(), cosmic_rays=True)
        cfg = ExposureStatic(subarray=S, n_lambda=NL, n_sub=2, nsamp=NSAMP,
                             samp_seq="SPARS100", scan=False, noise=flags,
                             max_cr_per_read=64)
        tables = synthetic_tables("G141", subarray=S, n_lambda=NL,
                                  samp_seq="SPARS100", nsamp=NSAMP)
        scene = example_scene(NL, scan_speed=0.0)
        scene = dataclasses.replace(scene,
                                    stellar_flux=jnp.zeros_like(scene.stellar_flux))
        res = simulate_exposure(scene, tables, cfg)
        last = np.asarray(res.reads_dn[-1], np.float64) * float(tables.gain)
        n_hit = (last > 100.0).sum()
        lam = (float(tables.cr_rate_px_s) * S * S
               * float(tables.read_times[-1]))
        assert 0 < n_hit < 6 * max(lam, 1.0)

    def test_bias_and_gain(self):
        flags = dataclasses.replace(NoiseFlags.none(), bias=True,
                                    gain_variations=True)
        cfg, tables, scene = make(False, flags, n_sub=2)
        scene = dataclasses.replace(scene,
                                    stellar_flux=jnp.zeros_like(scene.stellar_flux))
        res = simulate_exposure(scene, tables, cfg)
        want = np.asarray(tables.bias_map) / np.asarray(tables.gain_map)
        np.testing.assert_allclose(np.asarray(res.reads_dn[0]), want, rtol=1e-5)

    def test_saturation_and_nonlinearity(self):
        flags = dataclasses.replace(NoiseFlags.none(), non_linearity=True)
        cfg, tables, scene = make(False, flags, n_sub=2)
        bright = dataclasses.replace(
            scene, stellar_flux=scene.stellar_flux * 1e4)
        res = simulate_exposure(bright, tables, cfg)
        last_e = np.asarray(res.reads_dn[-1]) * float(tables.gain)
        fw = float(tables.full_well_e)
        deficit = np.asarray(tables.nonlin_coeffs, np.float64).sum(axis=0)
        assert last_e.max() <= fw * (1 - deficit.min()) * (1 + 1e-5)
        assert float(res.saturated_frac) > 0.0

    def test_nonlinearity_matches_oracle_cubic(self):
        """Non-linearity as the only effect on: the last read must equal the
        fp64 oracle cubic applied to the oracle's accumulated charge."""
        from wayne_tpu.oracle.numpy_oracle import oracle_nonlinearity

        flags = dataclasses.replace(NoiseFlags.none(), non_linearity=True)
        cfg, tables, scene = make(True, flags)
        res = simulate_exposure(scene, tables, cfg)
        got_e = np.asarray(res.reads_dn[-1], np.float64) * float(tables.gain)
        cum = oracle_ideal_frame(
            tables, cfg, x_ref=30.0, y_ref=40.0,
            scan_speed=float(scene.scan_speed), exp_start_s=0.0,
            stellar_flux=np.asarray(scene.stellar_flux),
            rp_over_rs=np.asarray(scene.rp_over_rs),
            ld=np.asarray(scene.ld), orbit=orbit_dict(scene))
        want = oracle_nonlinearity(cum, np.asarray(tables.nonlin_coeffs),
                                   float(tables.full_well_e))
        scale = want.max()
        np.testing.assert_allclose(got_e / scale, want / scale, atol=3e-4)

    def test_nonlinearity_deficit_near_full_well(self):
        """Statistical check: pixels near full well read a few % low — the
        synthetic planes sum to ~4% deficit at saturation (SURVEY.md §8)."""
        flags = dataclasses.replace(NoiseFlags.none(), non_linearity=True)
        cfg, tables, scene = make(False, flags, n_sub=2)
        bright = dataclasses.replace(
            scene, stellar_flux=scene.stellar_flux * 1e4)
        res = simulate_exposure(bright, tables, cfg)
        got_e = np.asarray(res.reads_dn[-1], np.float64) * float(tables.gain)
        ideal = np.asarray(res.ideal_e, np.float64)
        fw = float(tables.full_well_e)
        at_fw = ideal >= fw          # pixels whose true charge clamps at fw
        assert at_fw.sum() > 50
        deficit = 1.0 - got_e[at_fw] / fw
        assert 0.02 < deficit.mean() < 0.06
        assert deficit.std() > 1e-4  # per-pixel structure, not a scalar


class TestIpc:
    """Inter-pixel capacitance (beyond the reference): nearest-neighbour
    coupling of the sensed charge, kernel [[0,a,0],[a,1-4a,a],[0,a,0]]."""

    def test_ipc_is_the_expected_convolution(self):
        """With every other effect off the chain is linear, so the
        ipc-on product must equal the 3x3 cross-kernel convolution of
        the ipc-off product (zero boundary)."""
        flags = dataclasses.replace(NoiseFlags.none(), ipc=True)
        cfg_off, tables, scene = make(True, NoiseFlags.none())
        cfg_on = dataclasses.replace(cfg_off, noise=flags)
        off = np.asarray(simulate_exposure(scene, tables, cfg_off).reads_dn,
                         np.float64)
        on = np.asarray(simulate_exposure(scene, tables, cfg_on).reads_dn,
                        np.float64)
        a = float(tables.ipc_alpha)
        want = off * (1.0 - 4.0 * a)
        want[:, 1:, :] += a * off[:, :-1, :]
        want[:, :-1, :] += a * off[:, 1:, :]
        want[:, :, 1:] += a * off[:, :, :-1]
        want[:, :, :-1] += a * off[:, :, 1:]
        scale = np.abs(off).max()
        np.testing.assert_allclose(on / scale, want / scale, atol=1e-6)

    def test_ipc_conserves_interior_flux_and_blurs(self):
        flags = dataclasses.replace(NoiseFlags.none(), ipc=True)
        cfg_off, tables, scene = make(True, NoiseFlags.none())
        cfg_on = dataclasses.replace(cfg_off, noise=flags)
        off = np.asarray(simulate_exposure(scene, tables, cfg_off).reads_dn,
                         np.float64)[-1]
        on = np.asarray(simulate_exposure(scene, tables, cfg_on).reads_dn,
                        np.float64)[-1]
        # the kernel sums to 1, so flux is conserved up to the charge
        # edge pixels couple to off-array neighbours (the spectrum's red
        # tail reaches the frame edge here: a few 1e-4 of the total)
        assert abs(on.sum() / off.sum() - 1.0) < 1e-3
        # coupling moves charge from peaks to neighbours
        assert on.max() < off.max()


class TestDeterminism:
    def test_same_key_same_frame(self):
        cfg, tables, scene = make(True, NoiseFlags.all())
        a = simulate_exposure(scene, tables, cfg).reads_dn
        b = simulate_exposure(scene, tables, cfg).reads_dn
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_different_key_different_noise(self):
        cfg, tables, scene = make(True, NoiseFlags.all())
        b = dataclasses.replace(scene, key=jax.random.PRNGKey(99))
        a = simulate_exposure(scene, tables, cfg).reads_dn
        c = simulate_exposure(b, tables, cfg).reads_dn
        assert float(jnp.abs(a - c).max()) > 0.0


class TestReverseScan:
    def test_reverse_scan_matches_oracle(self):
        cfg, tables, scene = make(True, NoiseFlags.none())
        scene = dataclasses.replace(scene, y_ref=jnp.float32(90.0),
                                    scan_speed=jnp.float32(-1.5))
        res = simulate_exposure(scene, tables, cfg)
        got = np.asarray(res.ideal_e, np.float64)
        want = oracle_ideal_frame(
            tables, cfg, x_ref=30.0, y_ref=90.0, scan_speed=-1.5,
            exp_start_s=0.0, stellar_flux=np.asarray(scene.stellar_flux),
            rp_over_rs=np.asarray(scene.rp_over_rs),
            ld=np.asarray(scene.ld), orbit=orbit_dict(scene))
        scale = want.max()
        np.testing.assert_allclose(got / scale, want / scale, atol=2e-4)

    def test_forward_reverse_symmetric_totals(self):
        cfg, tables, scene = make(True, NoiseFlags.none())
        fwd = simulate_exposure(
            dataclasses.replace(scene, y_ref=jnp.float32(40.0),
                                scan_speed=jnp.float32(1.0)), tables, cfg)
        rev = simulate_exposure(
            dataclasses.replace(scene, y_ref=jnp.float32(80.0),
                                scan_speed=jnp.float32(-1.0)), tables, cfg)
        # totals differ by ~0.1%: the aXe dispersion is field-dependent, so
        # a different y_ref puts a slightly different wavelength span on
        # the (half-overhung) test detector — real physics, not an error.
        np.testing.assert_allclose(float(fwd.ideal_e.sum()),
                                   float(rev.ideal_e.sum()), rtol=3e-3)


class TestSSVAgainstOracle:
    @pytest.mark.slow
    def test_ssv_scan_matches_fine_oracle(self):
        # The kernel uses EXACT per-segment SSV means; the oracle applies
        # the raw sinusoid at ~0.03 px steps. Pixel-level agreement here
        # validates that segment-averaging loses nothing observable.
        flags = dataclasses.replace(NoiseFlags.none(), ssv=True)
        cfg, tables, scene = make(True, flags, n_sub=64)   # 20 seg/period
        from wayne_tpu.trends import TrendParams
        trends = TrendParams.create(ssv_amp=0.05, ssv_period_s=3.0,
                                    ssv_phase=0.4)
        scene = dataclasses.replace(scene, trends=trends)
        res = simulate_exposure(scene, tables, cfg)
        got = np.asarray(res.ideal_e, np.float64)

        p = 2 * np.pi / 3.0
        trend_fn = lambda t: 1.0 + 0.05 * np.sin(p * t + 0.4)
        want = oracle_ideal_frame(
            tables, cfg, x_ref=30.0, y_ref=40.0,
            scan_speed=float(scene.scan_speed), exp_start_s=0.0,
            stellar_flux=np.asarray(scene.stellar_flux),
            rp_over_rs=np.asarray(scene.rp_over_rs),
            ld=np.asarray(scene.ld), orbit=orbit_dict(scene),
            trend_fn=trend_fn, max_step_px=0.03)
        scale = want.max()
        np.testing.assert_allclose(got / scale, want / scale, atol=4e-4)


class TestExtraBeams:
    """Optional 0th/2nd-order contamination (beyond the reference)."""

    def _run(self, tables, extra: bool, stellar=None, x_ref=256.0):
        cfg = ExposureStatic(subarray=512, n_lambda=32, n_sub=2, nsamp=2,
                             samp_seq="RAPID", scan=False,
                             noise=NoiseFlags.none(), transit_quad=16,
                             extra_beams=extra)
        scene = example_scene(32, scan_speed=0.0)
        scene = dataclasses.replace(
            scene, x_ref=jnp.float32(x_ref), y_ref=jnp.float32(256.0),
            rp_over_rs=jnp.zeros_like(scene.rp_over_rs))
        if stellar is not None:
            scene = dataclasses.replace(
                scene, stellar_flux=jnp.asarray(stellar, jnp.float32))
        return np.asarray(simulate_exposure(scene, tables, cfg).ideal_e,
                          np.float64)

    def test_zeroth_order_spot_position_and_flux(self):
        tables = synthetic_tables("G141", subarray=512, n_lambda=32,
                                  samp_seq="RAPID", nsamp=2)
        tables = dataclasses.replace(
            tables, beam0_dx=jnp.float32(-200.0),
            beam0_rel=jnp.float32(0.01), beam2_rel=jnp.float32(0.0))
        base = self._run(tables, False)
        with_beams = self._run(tables, True)
        diff = with_beams - base
        cols = diff.sum(axis=0)
        # all extra flux sits at the undispersed spot (x_ref + dx = 56)
        assert abs(int(np.argmax(cols)) - 56) <= 1
        assert cols[52:61].sum() / diff.sum() > 0.999
        # 0th order carries beam0_rel of the TOTAL source counts
        # (1st order is fully on-detector at this pointing)
        np.testing.assert_allclose(diff.sum() / base.sum(), 0.01, rtol=0.02)

    def test_second_order_doubles_dispersion(self):
        tables = synthetic_tables("G141", subarray=512, n_lambda=32,
                                  samp_seq="RAPID", nsamp=2)
        tables = dataclasses.replace(
            tables, beam0_rel=jnp.float32(0.0),
            beam2_rel=jnp.float32(0.02))
        # single hot wavelength bin -> one 1st-order line + one 2nd-order
        # line at twice the offset from x_ref
        stellar = np.zeros(32)
        stellar[2] = 3.13e-10     # blue end: both orders on-detector
        base = self._run(tables, False, stellar=stellar)
        with_beams = self._run(tables, True, stellar=stellar)
        cols_b = base.sum(axis=0)
        diff = (with_beams - base).sum(axis=0)
        x1 = (cols_b * np.arange(512)).sum() / cols_b.sum()
        x2 = (diff * np.arange(512)).sum() / diff.sum()
        np.testing.assert_allclose(x2 - 256.0, 2.0 * (x1 - 256.0), rtol=0.02)
        np.testing.assert_allclose(diff.sum() / cols_b.sum(), 0.02, rtol=0.01)

    def test_extra_beams_off_is_default_and_identical(self):
        tables = synthetic_tables("G141", subarray=512, n_lambda=32,
                                  samp_seq="RAPID", nsamp=2)
        assert ExposureStatic().extra_beams is False
        from wayne_tpu.config import ObservationConfig
        assert ObservationConfig(extra_beams=True).exposure_static().extra_beams
