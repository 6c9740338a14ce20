"""Contaminating field sources (companion stars) — beyond the reference,
which models an isolated star. Real WFC3 grism fields routinely carry
overlapping spectra from nearby sources; the companion path re-evaluates
the aXe field-dependent trace/wavelength polynomials at each companion's
own position and shares the scan/SSV/trend machinery with the target.

The core gate is an EXACT equivalence: a companion at (dx, dy) added to
a zero-flux target must reproduce, pixel for pixel, a run whose target
sits at (x_ref+dx, y_ref+dy) with the companion's spectrum — the two
paths go through the same trace -> profiles -> einsum -> splat pipeline,
so any drift between them is a companion-path bug.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wayne_tpu.calibration import synthetic_tables
from wayne_tpu.config import ExposureStatic, NoiseFlags
from wayne_tpu.ops.exposure import simulate_exposure
from wayne_tpu.scene import CompanionParams, example_scene

S, NL, NSAMP = 128, 16, 3


def make(scan=True, band_px=0, n_sub=4):
    # SSV + visit trend ON (deterministic, no RNG): companions must ride
    # the same achromatic factor as the target for the equivalence to
    # hold — this exercises the shared fac_dt path, not just dt.
    noise = dataclasses.replace(NoiseFlags.none(), ssv=True,
                                visit_trend=True)
    cfg = ExposureStatic(subarray=S, n_lambda=NL, n_sub=n_sub, nsamp=NSAMP,
                         samp_seq="SPARS10", scan=scan, noise=noise,
                         band_px=band_px, compute_ideal=True)
    tables = synthetic_tables("G141", subarray=S, n_lambda=NL,
                              samp_seq="SPARS10", nsamp=NSAMP)
    scene = example_scene(NL, scan_speed=0.8 if scan else 0.0)
    # out of transit (t0 far away): the target's LC factor is exactly 1,
    # so a shifted target is algebraically identical to a companion
    orbit = dataclasses.replace(scene.orbit, t0_s=jnp.float32(4.0e5))
    scene = dataclasses.replace(scene, x_ref=jnp.float32(30.0),
                                y_ref=jnp.float32(40.0), orbit=orbit)
    return cfg, tables, scene


def with_companion(scene, dx, dy, flux):
    comp = CompanionParams(dx_px=jnp.asarray([dx], jnp.float32),
                           dy_px=jnp.asarray([dy], jnp.float32),
                           flux=jnp.asarray(flux, jnp.float32)[None, :])
    return dataclasses.replace(scene, companions=comp)


class TestKernelEquivalence:
    @pytest.mark.parametrize("scan,band_px", [(True, 0), (True, 48),
                                              (False, 0)])
    def test_companion_equals_shifted_target(self, scan, band_px):
        cfg, tables, scene = make(scan=scan, band_px=band_px)
        cflux = 0.3 * np.asarray(scene.stellar_flux)
        dx, dy = 6.0, 5.0

        dark = dataclasses.replace(scene,
                                   stellar_flux=jnp.zeros(NL, jnp.float32))
        got = simulate_exposure(with_companion(dark, dx, dy, cflux),
                                tables, cfg)
        shifted = dataclasses.replace(
            scene, x_ref=scene.x_ref + dx, y_ref=scene.y_ref + dy,
            stellar_flux=jnp.asarray(cflux, jnp.float32))
        want = simulate_exposure(shifted, tables, cfg)

        a = np.asarray(got.ideal_e, np.float64)
        b = np.asarray(want.ideal_e, np.float64)
        assert b.max() > 0
        np.testing.assert_allclose(a / b.max(), b / b.max(), atol=1e-5)
        # f32 accumulation order differs between the two paths (the
        # companion adds a second matmul; the shifted target folds the
        # same flux into one) — compare at a few-1e-5-of-peak tolerance
        # like the ideal frame, in DN.
        dn_a = np.asarray(got.reads_dn, np.float64)
        dn_b = np.asarray(want.reads_dn, np.float64)
        np.testing.assert_allclose(dn_a, dn_b,
                                   atol=3e-5 * max(dn_b.max(), 1.0))

    def test_additivity_and_totals(self):
        """Target + companion = target-alone + companion-alone (exactly:
        the deposit is linear in the sources), and the companion adds the
        expected share of the total charge."""
        cfg, tables, scene = make()
        cflux = 0.25 * np.asarray(scene.stellar_flux)
        both = simulate_exposure(with_companion(scene, 0.0, -6.0, cflux),
                                 tables, cfg)
        alone = simulate_exposure(scene, tables, cfg)
        dark = dataclasses.replace(scene,
                                   stellar_flux=jnp.zeros(NL, jnp.float32))
        comp_only = simulate_exposure(
            with_companion(dark, 0.0, -6.0, cflux), tables, cfg)
        np.testing.assert_allclose(
            np.asarray(both.ideal_e),
            np.asarray(alone.ideal_e) + np.asarray(comp_only.ideal_e),
            rtol=1e-5, atol=1e-3)
        # flux ratio carries through the sensitivity-weighted totals
        ratio = (float(np.asarray(comp_only.ideal_e).sum())
                 / float(np.asarray(alone.ideal_e).sum()))
        assert abs(ratio - 0.25) < 0.01, ratio

    def test_two_companions_band_covers_both(self):
        """Two companions on opposite sides of the target: the band path
        (width sized for the spread) matches the full-frame path."""
        cfg_full, tables, scene = make(band_px=0)
        cfg_band = dataclasses.replace(cfg_full, band_px=48)
        cflux = np.asarray(0.2 * np.asarray(scene.stellar_flux))
        comp = CompanionParams(
            dx_px=jnp.asarray([5.0, -4.0], jnp.float32),
            dy_px=jnp.asarray([7.0, -5.0], jnp.float32),
            flux=jnp.stack([jnp.asarray(cflux, jnp.float32)] * 2))
        sc = dataclasses.replace(scene, companions=comp)
        full = simulate_exposure(sc, tables, cfg_full)
        band = simulate_exposure(sc, tables, cfg_band)
        f = np.asarray(full.ideal_e, np.float64)
        # the band truncates the >5-sigma Gaussian tails the full frame
        # keeps — compare at 1e-5 of peak like the oracle diffs
        np.testing.assert_allclose(np.asarray(band.ideal_e, np.float64),
                                   f, atol=1e-5 * f.max())


class TestConfigPath:
    def test_yaml_to_scene(self):
        from wayne_tpu.config import config_from_dict
        from wayne_tpu.observation import Observation

        cfg = config_from_dict({
            "grism": "G141", "subarray": 64, "nsamp": 2, "n_lambda": 16,
            "num_orbits": 1, "exposures_per_orbit": 3,
            "x_ref": 20.0, "y_ref": 24.0, "scan": True, "scan_speed": 0.5,
            "companions": [
                {"dx_px": 8.0, "dy_px": 4.0, "temperature_k": 3300.0,
                 "flux_scale": 0.05},
                {"dx_px": -6.0, "dy_px": -3.0, "mag_j": 14.0},
            ]})
        obs = Observation(cfg)
        comp = obs.scenes.companions
        assert comp is not None
        n = obs.plan.n_exposures
        assert comp.dx_px.shape == (n, 2)
        assert comp.flux.shape == (n, 2, 16)
        f = np.asarray(comp.flux)
        assert np.all(f > 0) and np.all(np.isfinite(f))
        # flux_scale=0.05 of an m_J=10 target vs its own mag_j: the first
        # companion is 0.05x the target's J flux by construction
        tgt = np.asarray(obs.scenes.stellar_flux[0])
        assert f[0, 0].sum() < 0.25 * tgt.sum()

    def test_band_sizer_covers_companion_spread(self):
        from wayne_tpu.config import ObservationConfig

        base = ObservationConfig(subarray=512, nsamp=4, samp_seq="SPARS10",
                                 scan=True, scan_speed_pix_s=0.2)
        wide = dataclasses.replace(base, companions=(
            {"dx_px": 0.0, "dy_px": 60.0, "mag_j": 13.0},
            {"dx_px": 0.0, "dy_px": -40.0, "mag_j": 13.0}))
        assert wide.exposure_static().band_px >= (
            base.exposure_static().band_px + 96)

    def test_validation_errors(self):
        from wayne_tpu.config import config_from_dict
        from wayne_tpu.observation import Observation

        base = {"grism": "G141", "subarray": 64, "nsamp": 2,
                "n_lambda": 16, "num_orbits": 1, "exposures_per_orbit": 2}

        def build(comps):
            return Observation(config_from_dict(
                {**base, "companions": comps}))

        with pytest.raises(ValueError, match="unknown companion keys"):
            build([{"dx_px": 1.0, "dy_px": 0.0, "mag_j": 12.0,
                    "magj": 1.0}])
        with pytest.raises(ValueError, match="missing key"):
            build([{"dy_px": 0.0, "mag_j": 12.0}])
        with pytest.raises(ValueError, match="exactly one of"):
            build([{"dx_px": 1.0, "dy_px": 0.0}])
        with pytest.raises(ValueError, match="exactly one of"):
            build([{"dx_px": 1.0, "dy_px": 0.0, "mag_j": 12.0,
                    "flux_scale": 0.1}])
        with pytest.raises(ValueError, match="flux_scale"):
            build([{"dx_px": 1.0, "dy_px": 0.0, "flux_scale": -0.1}])


class TestDirectImage:
    def test_companion_spot_in_direct_image(self):
        """The visit-opening direct image shows the companion as a second
        source at its own (x_ref+dx, y_ref+dy) — reduction pipelines
        measure contaminant positions there."""
        from wayne_tpu.config import config_from_dict
        from wayne_tpu.observation import Observation

        dx, dy = 12.0, 9.0
        cfg = config_from_dict({
            "grism": "G141", "subarray": 64, "nsamp": 2, "n_lambda": 16,
            "num_orbits": 1, "exposures_per_orbit": 2,
            "x_ref": 20.0, "y_ref": 24.0,
            "companions": [{"dx_px": dx, "dy_px": dy, "flux_scale": 0.5}]})
        obs = Observation(cfg)
        res, tab, static = obs.simulate_direct_image(ideal=True)
        frame = np.asarray(res.ideal_e, np.float64)
        # centroid of an 5-px box at the companion's expected position
        cx, cy = int(20.0 + dx), int(24.0 + dy)
        box = frame[cy - 2:cy + 3, cx - 2:cx + 3]
        target_box = frame[22:27, 18:23]
        assert box.sum() > 0.3 * target_box.sum()
        ys, xs = np.mgrid[cy - 2:cy + 3, cx - 2:cx + 3]
        assert abs((box * xs).sum() / box.sum() - (20.0 + dx)) < 1.0
        assert abs((box * ys).sum() / box.sum() - (24.0 + dy)) < 1.0
