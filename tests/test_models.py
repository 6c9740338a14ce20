"""Host model-layer tests: grism/detector/star/planet + spectra utils."""

import numpy as np
import pytest

from wayne_tpu.calibration import exptime, sample_sequence_times
from wayne_tpu.config import PlanetConfig, StarConfig
from wayne_tpu.models.detector import WFC3IRDetector
from wayne_tpu.models.grism import G102, G141, make_grism
from wayne_tpu.models.planet import Planet, resolve_system
from wayne_tpu.models.stellar import Star
from wayne_tpu.utils.spectra import blackbody_flam_um, rebin_spectrum
from wayne_tpu.visit_plan import HST_PERIOD_S, plan_visit


class TestGrism:
    def test_bandpasses(self):
        g141 = G141(subarray=128, n_lambda=32, nsamp=2)
        g102 = G102(subarray=128, n_lambda=32, nsamp=2)
        assert g141.wl_min == pytest.approx(1.075)
        assert g102.wl_max == pytest.approx(1.15)

    def test_sensitivity_positive_in_band(self):
        g = G141(subarray=128, n_lambda=64, nsamp=2)
        s = g.get_sensitivity(np.linspace(1.15, 1.6, 10))
        assert np.all(s > 1e15)

    def test_psf_width_grows_with_wavelength(self):
        g = G141(subarray=128, n_lambda=64, nsamp=2)
        sig = g.psf_sigma(np.linspace(1.1, 1.65, 8))
        assert np.all(np.diff(sig) > 0)

    def test_make_grism_rejects_unknown(self):
        with pytest.raises(ValueError):
            make_grism("G800L")


class TestDetector:
    def test_spars10_times(self):
        det = WFC3IRDetector(subarray=256)
        t = det.get_read_times(3, "SPARS10")
        assert t[0] == 0.0
        assert t[1] == pytest.approx(0.278)
        # Subarray interval = wait + frame time = (10 - 2.932) + 0.278.
        np.testing.assert_allclose(np.diff(t)[1:], 7.346)

    def test_published_exptime_anchors(self):
        # Full frame: SPARSn spacing is exactly n seconds after read 1.
        assert exptime("SPARS10", 15, 1024) == pytest.approx(142.932, abs=0.01)
        # GRISM256 SPARS10 NSAMP=15 -> 103.129 s (the canonical WFC3 scan
        # setup quoted across the transit literature, e.g. WASP-43 b).
        assert exptime("SPARS10", 15, 256) == pytest.approx(103.129, abs=0.05)
        # Full-frame RAPID NSAMP=15 -> 43.98 s (15 x 2.932).
        assert exptime("RAPID", 15, 1024) == pytest.approx(43.98, abs=0.01)
        # Full-frame STEP50 NSAMP=15: 4 frame reads + 12.5 + 25 + 9 x 50.
        assert exptime("STEP50", 15, 1024) == pytest.approx(499.228, abs=0.01)

    def test_rapid_spacing_by_subarray(self):
        assert exptime("RAPID", 2, 1024) == pytest.approx(2 * 2.932)
        assert exptime("RAPID", 2, 64) == pytest.approx(2 * 0.061)

    def test_step_sequence_ramp(self):
        t = sample_sequence_times("STEP50", 12, 1024)
        dt = np.diff(t)
        # 4 frame-time reads, then 12.5 s doubling up to the 50 s cap.
        np.testing.assert_allclose(dt[:4], 2.932)
        np.testing.assert_allclose(dt[4:7], [12.5, 25.0, 50.0])
        np.testing.assert_allclose(dt[7:], 50.0)
        # Subarray variant keeps the waits, swaps the frame time.
        t256 = sample_sequence_times("STEP50", 12, 256)
        np.testing.assert_allclose(np.diff(t256), dt - 2.932 + 0.278)

    def test_sequence_table_override(self, tmp_path):
        import json

        from wayne_tpu.calibration import _SEQUENCE_OVERRIDES, load_sequence_table

        p = tmp_path / "seq.json"
        exact = [0.0] + [0.278649 + 7.346938 * k for k in range(15)]
        p.write_text(json.dumps({"SPARS10/256": exact}))
        try:
            load_sequence_table(str(p))
            t = sample_sequence_times("SPARS10", 15, 256)
            assert t[1] == pytest.approx(0.278649, abs=1e-9)
            assert t[-1] == pytest.approx(exact[-1], abs=1e-9)
            with pytest.raises(ValueError):
                p.write_text(json.dumps({"SPARS10/256": [0.0, 2.0, 1.0]}))
                load_sequence_table(str(p))
        finally:
            _SEQUENCE_OVERRIDES.clear()

    def test_invalid(self):
        with pytest.raises(ValueError):
            sample_sequence_times("SPARS7", 3, 256)
        with pytest.raises(ValueError):
            WFC3IRDetector(subarray=300)

    def test_scan_length(self):
        det = WFC3IRDetector(subarray=256)
        assert det.scan_length_px(1.0, 3, "SPARS10") == pytest.approx(
            det.exptime(3, "SPARS10"))


class TestStar:
    def test_magnitude_scaling(self):
        s10 = Star(StarConfig(magnitude_j=10.0))
        s12 = Star(StarConfig(magnitude_j=12.5))
        edges = np.linspace(1.2, 1.3, 5)
        ratio = s10.flux_on_grid(edges) / s12.flux_on_grid(edges)
        np.testing.assert_allclose(ratio, 10 ** (0.4 * 2.5), rtol=1e-6)

    def test_blackbody_peak_location(self):
        wl = np.linspace(0.3, 5.0, 2000)
        bb = blackbody_flam_um(wl, 5800.0)
        peak = wl[np.argmax(bb)]
        assert 0.45 < peak < 0.55      # Wien: ~0.50 um at 5800 K


class TestPlanet:
    def test_catalog_lookup(self):
        sys = resolve_system("WASP-43 b")
        assert sys["period_days"] == pytest.approx(0.813475)
        with pytest.raises(KeyError):
            resolve_system("Nope b")

    def test_orbit_clock_conversion(self):
        p = Planet(PlanetConfig(t0_mjd=56000.5), visit_start_mjd=56000.0)
        orbit = p.orbit_params()
        assert float(orbit.t0_s) == pytest.approx(0.5 * 86400.0)

    def test_flat_rp_grid(self):
        p = Planet(PlanetConfig(rp_over_rs=0.11))
        rp = p.rp_on_grid(np.linspace(1.1, 1.6, 7))
        np.testing.assert_allclose(rp, 0.11)

    def test_catalog_entries_are_copies(self):
        """resolve_system must hand out copies: a caller mutating the
        result must not corrupt the module catalog for later visits in
        the same process (regression)."""
        a = resolve_system("WASP-43 b")
        a["period_days"] = -1.0
        assert resolve_system("WASP-43 b")["period_days"] > 0

    def test_eclipse_file_units_and_sorting(self, tmp_path):
        """eclipse_file values must be FRACTIONAL Fp/Fs (ppm input used
        to silently make the eclipse outshine the star), and descending
        wavelength order (frequency-tabulated files) is sorted on load
        (regressions)."""
        ppm = tmp_path / "fp_ppm.dat"
        ppm.write_text("1.1 450\n1.4 500\n1.7 550\n")
        with pytest.raises(ValueError, match="FRACTIONAL"):
            Planet(PlanetConfig(eclipse_file=str(ppm)))
        desc = tmp_path / "fp_desc.dat"
        desc.write_text("1.7 0.0016\n1.4 0.0015\n1.1 0.0014\n")
        p = Planet(PlanetConfig(eclipse_file=str(desc)))
        fp = p.fp_on_grid(np.array([1.1, 1.4, 1.7]))
        np.testing.assert_allclose(fp, [0.0014, 0.0015, 0.0016])


class TestSpectraUtils:
    def test_rebin_conserves_integral(self):
        wl = np.linspace(1.0, 2.0, 1000)
        flux = 1.0 + 0.5 * np.sin(20 * wl)
        edges = np.linspace(1.05, 1.95, 33)
        out = rebin_spectrum(wl, flux, edges)
        got = (out * np.diff(edges)).sum()
        # dense-grid truth on the same interval
        m = (wl >= 1.05) & (wl <= 1.95)
        want = np.trapezoid(flux[m], wl[m])
        np.testing.assert_allclose(got, want, rtol=1e-3)

    def test_rebin_flat_is_identity(self):
        wl = np.linspace(1.0, 2.0, 100)
        out = rebin_spectrum(wl, np.full(100, 7.0), np.linspace(1.1, 1.9, 11))
        np.testing.assert_allclose(out, 7.0)


class TestVisitPlan:
    def test_orbit_structure(self):
        plan = plan_visit(3, 100.0, 20.0, 56000.0)
        assert plan.n_exposures == 3 * 25
        assert plan.orbit_index.max() == 2
        # exposures stay within their orbit's visibility window
        rel = plan.exp_start_s - plan.orbit_start_s
        assert rel.max() + 100.0 <= 50 * 60.0 + 1e-6

    def test_orbit_period_spacing(self):
        plan = plan_visit(2, 100.0, 20.0, 56000.0)
        second_orbit = plan.exp_start_s[plan.orbit_index == 1]
        assert second_orbit.min() == pytest.approx(HST_PERIOD_S)

    def test_explicit_exposures_per_orbit(self):
        plan = plan_visit(2, 100.0, 20.0, 56000.0, exposures_per_orbit=4)
        assert plan.n_exposures == 8

    def test_autofill_charges_no_trailing_overhead(self):
        """The LAST exposure of an orbit needs only exptime (not its
        trailing overhead) to end inside the window: exptime=900 s +
        overhead=150 s fits 3 exposures in the 3000 s window (t=2100
        ends at 3000), not floor(3000/1050)=2 (regression)."""
        plan = plan_visit(1, 900.0, 150.0, 56000.0)
        assert plan.n_exposures == 3, plan.n_exposures
        assert plan.exp_start_s[-1] + 900.0 <= 50 * 60.0 + 1e-9

    def test_mjd_conversion(self):
        plan = plan_visit(1, 100.0, 20.0, 56000.0)
        mjd = plan.exp_start_mjd()
        assert mjd[0] >= 56000.0
        assert mjd[-1] - mjd[0] == pytest.approx(
            (plan.exp_start_s[-1] - plan.exp_start_s[0]) / 86400.0)


class TestLimbDarkeningTable:
    def test_ld_file_interpolation(self, tmp_path):
        import numpy as np
        from wayne_tpu.config import PlanetConfig
        from wayne_tpu.models.planet import Planet
        path = tmp_path / "ld.txt"
        wl = np.linspace(1.0, 1.8, 9)
        cols = np.stack([wl, 0.6 + 0.1 * wl, -0.2 * np.ones(9),
                         0.4 * np.ones(9), -0.15 * np.ones(9)], axis=1)
        np.savetxt(path, cols)
        p = Planet(PlanetConfig(ld_file=str(path)))
        ld = p.ld_on_grid(np.array([1.2, 1.6]))
        assert ld.shape == (2, 4)
        np.testing.assert_allclose(ld[:, 0], [0.72, 0.76], rtol=1e-6)
        np.testing.assert_allclose(ld[:, 1], -0.2)

    def test_scalar_ld_without_file(self):
        import numpy as np
        from wayne_tpu.config import PlanetConfig
        from wayne_tpu.models.planet import Planet
        p = Planet(PlanetConfig())
        ld = p.ld_on_grid(np.array([1.2, 1.6]))
        assert ld.shape == (4,)


class TestProfilingUtils:
    def test_stage_timers(self):
        import time as _time
        from wayne_tpu.utils.profiling import StageTimers
        t = StageTimers()
        with t.stage("a"):
            _time.sleep(0.01)
        with t.stage("a"):
            _time.sleep(0.01)
        s = t.summary()
        assert s["a"]["count"] == 2
        assert s["a"]["total_s"] >= 0.02
        assert "a" in t.report()


class TestMeshEdgeCases:
    def test_single_device_mesh(self):
        import jax
        from wayne_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(jax.devices()[:1])
        assert mesh.shape["mc"] * mesh.shape["exp"] == 1

    def test_two_device_mesh(self):
        import jax
        from wayne_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(jax.devices()[:2])
        assert mesh.shape["mc"] * mesh.shape["exp"] == 2
