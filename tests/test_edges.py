"""Edge-case tests for less-travelled corners: FITS card formatting,
guards, visit-plan trims, direct extraction, compat defaults."""

import numpy as np
import pytest

from wayne_tpu.io.fits import CARD, card, read_fits, write_fits, FitsHDU


class TestFitsCards:
    def test_card_is_80_bytes(self):
        for c in (card("SIMPLE", True), card("NAXIS1", 1024),
                  card("EXPTIME", 88.123456789),
                  card("TARGNAME", "WASP-43"),
                  card("COMMENT", "a comment string")):
            assert len(c) == CARD

    def test_string_with_quote_escaped(self):
        import tempfile, os
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "q.fits")
            write_fits(p, [FitsHDU(header={"OBSERVER": "O'Neil"})])
            hdr, _ = read_fits(p)[0]
            assert hdr["OBSERVER"] == "O'Neil"

    def test_long_value_truncated_not_crashing(self):
        c = card("KEY", "x" * 200)
        assert len(c) == CARD

    def test_float_precision_roundtrip(self):
        import tempfile, os
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "f.fits")
            write_fits(p, [FitsHDU(header={"EXPSTART": 55999.8634722})])
            hdr, _ = read_fits(p)[0]
            assert abs(hdr["EXPSTART"] - 55999.8634722) < 1e-6


class TestGuardsEdges:
    def test_nonfinite_detected(self):
        from wayne_tpu.utils.guards import SimulationError, check_exposure_result

        class R:
            reads_dn = np.array([[np.nan, 1.0]])
            ideal_e = np.zeros((2,))
            saturated_frac = np.zeros(())

        with pytest.raises(SimulationError, match="non-finite"):
            check_exposure_result(R())

    def test_stats_returned(self):
        from wayne_tpu.utils.guards import check_exposure_result

        class R:
            reads_dn = np.ones((2, 4, 4))
            ideal_e = np.full((4, 4), 2.0)
            saturated_frac = np.zeros(())

        stats = check_exposure_result(R(), context="x")
        assert stats["ideal_total_e"] == 32.0


class TestVisitPlanEdges:
    def test_first_orbit_trim(self):
        from wayne_tpu.visit_plan import plan_visit
        trimmed = plan_visit(2, 100.0, 20.0, 56000.0, first_orbit_trim=600.0)
        plain = plan_visit(2, 100.0, 20.0, 56000.0)
        assert trimmed.exp_start_s[0] == 600.0
        # orbit 2 unaffected by the trim
        o2t = trimmed.exp_start_s[trimmed.orbit_index == 1]
        o2p = plain.exp_start_s[plain.orbit_index == 1]
        np.testing.assert_allclose(o2t[0], o2p[0])

    def test_long_exposure_fits_once(self):
        from wayne_tpu.visit_plan import plan_visit
        plan = plan_visit(1, 45 * 60.0, 60.0, 56000.0)
        assert plan.n_exposures == 1


class TestExtractDirect:
    def test_extract_exposure_background_subtraction(self):
        import jax.numpy as jnp
        from wayne_tpu.reduction import extract_exposure
        S = 32
        reads = np.zeros((2, S, S), np.float32)
        reads[1] = 5.0                       # uniform background in DN
        reads[1, 10:14, :] += 100.0          # source rows
        spec = np.asarray(extract_exposure(
            jnp.asarray(reads), jnp.float32(2.0),
            y_window=(8, 16), bg_rows=(24, 32)))
        # bg-subtracted: only the source remains; e- = DN * gain
        np.testing.assert_allclose(spec, 4 * 100.0 * 2.0, rtol=1e-6)


class TestCompatDefaults:
    def test_noise_defaults_all_on(self):
        from wayne_tpu.compat import ExposureGenerator
        gen = ExposureGenerator("G102", subarray=64, n_lambda=16, nsamp=1,
                                samp_seq="RAPID", n_sub=1)
        assert gen.noise.poisson and gen.noise.cosmic_rays
        assert gen.tables.wl_centers.shape == (16,)
