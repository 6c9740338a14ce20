"""Observation orchestration tests: planning, drift, scan alternation,
generate/resume, debug guards."""

import dataclasses
import os
import tempfile

import numpy as np
import pytest

from wayne_tpu.config import ObservationConfig, config_from_dict
from wayne_tpu.observation import Observation


def small_cfg(**kw) -> ObservationConfig:
    base = dict(grism="G141", subarray=128, nsamp=3, samp_seq="SPARS10",
                scan=True, scan_speed_pix_s=1.0, x_ref=30.0, y_ref=30.0,
                n_orbits=1, exposures_per_orbit=4, n_lambda=64, n_sub=4)
    base.update(kw)
    return config_from_dict(base)


class TestScenes:
    def test_pointing_drift_applied(self):
        obs = Observation(small_cfg())
        x = np.asarray(obs.scenes.x_ref)
        assert x.std() > 0                      # jitter + drift
        obs2 = Observation(small_cfg(noise={"pointing_drift": False}))
        np.testing.assert_allclose(np.asarray(obs2.scenes.x_ref), 30.0)

    def test_orbital_drift_phase_locked(self):
        """drift_orbit_amp_x adds a deterministic orbital-phase-locked
        component: same time-since-orbit-start -> same offset in every
        orbit, zero at orbit start (phase 0), and existing RNG streams
        (jitter draws) are untouched."""
        from wayne_tpu.visit_plan import HST_PERIOD_S

        kw = dict(n_orbits=3, exposures_per_orbit=5)
        obs0 = Observation(small_cfg(**kw))
        obs = Observation(small_cfg(
            trends={"drift_orbit_amp_x": 0.05}, **kw))
        dx = np.asarray(obs.scenes.x_ref) - np.asarray(obs0.scenes.x_ref)
        ph = (2.0 * np.pi
              * (obs.plan.exp_start_s - obs.plan.orbit_start_s)
              / HST_PERIOD_S)
        np.testing.assert_allclose(dx, 0.05 * np.sin(ph), atol=5e-6)
        # repeats orbit to orbit (same intra-orbit exposure cadence;
        # orbit 1's first-orbit trim shifts ITS phases, orbits 2 and 3
        # are identical)
        np.testing.assert_allclose(dx[5:10], dx[10:15], atol=5e-6)
        assert abs(dx[5]) < 5e-6                # zero at orbit-2 start
        assert np.max(np.abs(dx)) > 0.01        # and actually nonzero
        # gated with the rest of the pointing model
        obs_off = Observation(small_cfg(
            trends={"drift_orbit_amp_x": 0.05},
            noise={"pointing_drift": False}, **kw))
        np.testing.assert_allclose(np.asarray(obs_off.scenes.x_ref), 30.0)

    def test_he_airglow_series(self):
        """trends.he_airglow_level builds the optional sky_he_level
        leaf: clipped-cosine orbital shape (peak at orbit start, 0 in
        shadow), nonnegative; off by default (pytree-invisible)."""
        import numpy as np

        from wayne_tpu.visit_plan import HST_PERIOD_S

        obs0 = Observation(small_cfg())
        assert obs0.scenes.sky_he_level is None
        obs = Observation(small_cfg(
            n_orbits=2, exposures_per_orbit=6,
            trends={"he_airglow_level": 1.5, "he_airglow_scatter": 0.05}))
        he = np.asarray(obs.scenes.sky_he_level)
        assert he.shape == (12,) and np.all(he >= 0.0)
        ph = (obs.plan.exp_start_s - obs.plan.orbit_start_s) / HST_PERIOD_S
        # the late-orbit (shadow) exposures carry ~zero airglow
        assert np.all(he[ph > 0.26] < 0.2)
        # early-orbit exposures are near the peak (within the scatter)
        assert np.all(he[ph < 0.1] > 0.9)

    def test_alternating_scan_direction(self):
        obs = Observation(small_cfg(alternate_scan_direction=True))
        speeds = np.asarray(obs.scenes.scan_speed)
        assert np.all(speeds[::2] > 0) and np.all(speeds[1::2] < 0)
        # reverse scans start at the far end of the swept strip
        y = np.asarray(obs.scenes.y_ref)
        assert np.all(y[1::2] > y[::2] + 10)

    def test_reverse_flux_offset_scales_reverse_exposures(self):
        """Upstream/downstream effect: reverse-scan exposures' source
        flux is scaled by 1 + reverse_flux_offset, forward exposures
        untouched, backgrounds unaffected (the offset is an effective
        exposure-time difference of the SCANNED source only)."""
        obs0 = Observation(small_cfg(alternate_scan_direction=True))
        obs = Observation(small_cfg(alternate_scan_direction=True,
                                    trends={"reverse_flux_offset": 0.01}))
        f0 = np.asarray(obs0.scenes.stellar_flux)
        f = np.asarray(obs.scenes.stellar_flux)
        np.testing.assert_allclose(f[::2], f0[::2], rtol=1e-7)
        np.testing.assert_allclose(f[1::2], 1.01 * f0[1::2], rtol=1e-6)

    def test_reverse_flux_offset_needs_alternation(self):
        with pytest.raises(ValueError, match="alternate_scan_direction"):
            Observation(small_cfg(trends={"reverse_flux_offset": 0.01}))

    def test_off_detector_pointing_warns(self, caplog):
        import logging

        with caplog.at_level(logging.WARNING, logger="wayne_tpu"):
            Observation(small_cfg(x_ref=600.0))   # off a 128-px subarray
        assert any("outside" in r.message for r in caplog.records)
        caplog.clear()
        with caplog.at_level(logging.WARNING, logger="wayne_tpu"):
            Observation(small_cfg())              # on-detector: silent
        assert not any("outside" in r.message for r in caplog.records)

    def test_off_detector_warns_mid_visit(self, caplog):
        """A shift list that walks the spectrum off the detector AFTER
        exposure 0 must warn (the round-2 guard checked exposure 0
        only — regression)."""
        import logging

        with caplog.at_level(logging.WARNING, logger="wayne_tpu"):
            Observation(small_cfg(
                x_shifts=[0.0, 0.0, 500.0, 500.0],
                y_shifts=[0.0, 0.0, 0.0, 0.0]))
        msgs = [r.message for r in caplog.records if "outside" in r.message]
        assert msgs and "first at exposure 2" in msgs[0], msgs

    def test_partially_clipped_spectrum_warns(self, caplog):
        """x_ref=15 on a 64 px subarray leaves only a ~7-column sliver
        of the G141 trace on-detector — the guard must flag it even
        though the frames aren't pure background (regression: this
        config reduced to garbage depths silently)."""
        import logging

        with caplog.at_level(logging.WARNING, logger="wayne_tpu"):
            Observation(small_cfg(subarray=64, x_ref=15.0, y_ref=20.0,
                                  n_lambda=32, scan=False))
        assert any("mostly clipped" in r.message for r in caplog.records)
        caplog.clear()
        with caplog.at_level(logging.WARNING, logger="wayne_tpu"):
            Observation(small_cfg(scan=False))    # trace at 72-126: fine
        assert not caplog.records

    @pytest.mark.slow
    def test_explicit_start_times_reproduced_in_headers(self):
        """exp_start_times as a LIST schedules those exact MJDs: the
        plan, the orbit inference, and the written EXPSTART keywords all
        reproduce the list verbatim."""
        import glob

        from wayne_tpu.io.ima import read_ima

        times = [56000.10, 56000.102, 56000.17, 56000.172]
        obs = Observation(small_cfg(exp_start_times=times))
        assert obs.plan.n_exposures == 4
        np.testing.assert_allclose(obs.plan.exp_start_mjd(), times,
                                   rtol=0, atol=1e-9)
        # 0.068 d gap between exposures 1 and 2 -> a new orbit
        np.testing.assert_array_equal(obs.plan.orbit_index, [0, 0, 1, 1])
        # the planet clock starts at the first listed exposure
        assert obs.planet.visit_start_mjd == times[0]
        with tempfile.TemporaryDirectory() as d:
            obs.generate(d, progress=lambda s: None)
            paths = sorted(glob.glob(os.path.join(d, "*_ima.fits")))
            got = [float(read_ima(p)[0]["EXPSTART"]) for p in paths]
            np.testing.assert_allclose(got, times, rtol=0, atol=1e-8)

    def test_scalar_exp_start_times_is_start_mjd(self):
        cfg = small_cfg(exp_start_times=56123.5)
        assert cfg.start_mjd == 56123.5
        assert cfg.exp_start_mjd_list is None

    def test_non_increasing_start_times_raise(self):
        with pytest.raises(ValueError, match="increasing"):
            Observation(small_cfg(
                exp_start_times=[56000.2, 56000.1, 56000.3]))

    def test_overlapping_start_times_raise(self):
        """Starts closer together than the exposure duration are a
        physically impossible schedule (one detector cannot expose
        twice at once) — reject instead of silently clamping the
        persistence/hook gaps to zero."""
        # SPARS10 nsamp=3 lasts ~32 s; 10 s spacing overlaps
        with pytest.raises(ValueError, match="overlap"):
            Observation(small_cfg(
                exp_start_times=[56000.1, 56000.1 + 10.0 / 86400.0]))

    def test_per_exposure_keys_unique(self):
        obs = Observation(small_cfg())
        keys = np.asarray(obs.scenes.key)
        assert len(np.unique(keys, axis=0)) == keys.shape[0]

    def test_first_orbit_flag(self):
        obs = Observation(small_cfg(n_orbits=2))
        flag = np.asarray(obs.scenes.is_first_orbit)
        orbits = obs.plan.orbit_index
        np.testing.assert_array_equal(flag, (orbits == 0).astype(np.float32))


class TestGenerate:
    def test_generate_resume_and_summary(self):
        obs = Observation(small_cfg())
        with tempfile.TemporaryDirectory() as d:
            paths = obs.generate(d, chunk=4, progress=lambda s: None,
                                 debug=True)
            assert len(paths) == obs.plan.n_exposures
            assert os.path.exists(os.path.join(d, "visit_summary.json"))
            # direct image present
            assert any("direct" in f for f in os.listdir(d))
            again = obs.generate(d, chunk=4, progress=lambda s: None)
            assert again == []                   # resume skips everything

    def test_simulate_returns_batched_results(self):
        obs = Observation(small_cfg())
        res = obs.simulate(chunk=4)
        n = obs.plan.n_exposures
        assert res.reads_dn.shape[0] == n
        assert res.reads_dn.shape[1] == obs.cfg.nsamp + 1

    def test_guards_catch_saturation(self):
        from wayne_tpu.utils.guards import SimulationError, check_exposure_result
        obs = Observation(small_cfg(mag_J=2.0))   # absurdly bright
        res = obs.simulate(chunk=4)
        with pytest.raises(SimulationError):
            check_exposure_result(res)


class TestDiagnostics:
    def test_quicklooks_written(self):
        from wayne_tpu.diagnostics import visit_quicklooks
        obs = Observation(small_cfg())
        res = obs.simulate(chunk=4)
        with tempfile.TemporaryDirectory() as d:
            paths = visit_quicklooks(obs, res, d)
            assert len(paths) == 2
            for p in paths:
                assert os.path.getsize(p) > 5000


class TestDirectImage:
    def test_direct_image_is_real_multiaccum_and_centroid_recovers(self):
        """The direct image runs through the full detector chain (noise on)
        and a reduction-style centroid recovers (x_ref, y_ref) to <0.05 px
        (reference: direct-image frame at visit start, SURVEY.md:100)."""
        from wayne_tpu.io.ima import read_ima

        obs = Observation(small_cfg(x_ref=60.0, y_ref=70.0))
        with tempfile.TemporaryDirectory() as d:
            obs.generate(d, chunk=4, progress=lambda s: None)
            di = [f for f in os.listdir(d) if "direct" in f]
            assert len(di) == 1
            hdr, reads, times, dq = read_ima(os.path.join(d, di[0]),
                                             with_dq=True)
        assert hdr["FILTER"] == "F140W"
        # same detector model as the spectra: DQ planes present (hot
        # pixels / CR bits flaggable), one per read
        assert dq is not None and dq.shape == reads.shape
        assert hdr["OBSTYPE"] == "IMAGING"
        assert hdr["NSAMP"] == obs.cfg.direct_image_nsamp + 1
        assert reads.shape[0] == obs.cfg.direct_image_nsamp + 1
        assert times[-1] > times[0]              # real multiaccum ramp
        # centroid of the background-subtracted final CDS frame
        img = reads[-1].astype(np.float64) - reads[0].astype(np.float64)
        img -= np.median(img)
        x0 = float(np.asarray(obs.scenes.x_ref)[0])
        y0 = float(np.asarray(obs.scenes.y_ref)[0])
        yy, xx = np.mgrid[0:img.shape[0], 0:img.shape[1]]
        w = img * ((np.abs(xx - x0) < 8) & (np.abs(yy - y0) < 8))
        cx, cy = (w * xx).sum() / w.sum(), (w * yy).sum() / w.sum()
        assert abs(cx - x0) < 0.05 and abs(cy - y0) < 0.05

    def test_g102_uses_f105w_and_noise_off_is_deterministic(self):
        from wayne_tpu.config import NoiseFlags

        cfg = small_cfg(grism="G102")
        cfg.noise = NoiseFlags.none()
        obs = Observation(cfg)
        assert obs.direct_image_filter() == "F105W"
        a = np.asarray(obs.simulate_direct_image()[0].reads_dn)
        b = np.asarray(obs.simulate_direct_image()[0].reads_dn)
        np.testing.assert_array_equal(a, b)


class TestOutputUnits:
    def test_e_per_s_through_observation(self):
        from wayne_tpu.io.fits import read_fits
        cfg = small_cfg()
        cfg.output_units = "e_per_s"
        obs = Observation(cfg)
        with tempfile.TemporaryDirectory() as d:
            paths = obs.generate(d, chunk=4, progress=lambda s: None)
            hdus = read_fits(paths[0])
            assert hdus[0][0]["BUNIT"] == "ELECTRONS/S"
            assert hdus[0][0]["UNITCORR"] == "COMPLETE"


class TestExplicitShiftLists:
    def test_explicit_per_exposure_shifts(self):
        """Reference parity: x_shifts/y_shifts may be explicit offset
        lists instead of a drift rate."""
        cfg = small_cfg(x_shifts=[0.0, 0.1, -0.2, 0.3],
                        y_shifts=[0.0, 0.05, 0.1, 0.15])
        obs = Observation(cfg)
        np.testing.assert_allclose(np.asarray(obs.scenes.x_ref),
                                   30.0 + np.array([0.0, 0.1, -0.2, 0.3]),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(obs.scenes.y_ref),
                                   30.0 + np.array([0.0, 0.05, 0.1, 0.15]),
                                   rtol=1e-6)

    def test_short_shift_list_raises(self):
        with pytest.raises(ValueError):
            Observation(small_cfg(x_shifts=[0.0, 0.1]))

    def test_explicit_shifts_apply_with_drift_flag_off(self):
        """Explicit offsets are user data, not noise: they must survive
        pointing_drift=False (which only gates the generated model)."""
        cfg = small_cfg(x_shifts=[0.0, 0.1, -0.2, 0.3])
        cfg.noise = dataclasses.replace(cfg.noise, pointing_drift=False)
        obs = Observation(cfg)
        np.testing.assert_allclose(np.asarray(obs.scenes.x_ref),
                                   30.0 + np.array([0.0, 0.1, -0.2, 0.3]),
                                   rtol=1e-6)
        # y had no explicit list: stays constant with the flag off
        np.testing.assert_allclose(np.asarray(obs.scenes.y_ref),
                                   np.full(4, 30.0), rtol=1e-6)

    def test_scalar_x_shifts_is_still_a_rate(self):
        obs = Observation(small_cfg(x_shifts=0.5, drift_jitter=0.0))
        np.testing.assert_allclose(np.asarray(obs.scenes.x_ref),
                                   30.0 + 0.5 * np.arange(4), rtol=1e-6)


class TestAdcQuantization:
    def test_quantized_reads_are_integer_dn(self):
        from wayne_tpu.io.ima import read_ima

        cfg = small_cfg()
        cfg.quantize_adc = True
        obs = Observation(cfg)
        with tempfile.TemporaryDirectory() as d:
            paths = obs.generate(d, chunk=4, progress=lambda s: None)
            _, reads, _ = read_ima(paths[0])
        np.testing.assert_array_equal(reads, np.round(reads))  # integer DN
        assert reads.std() > 0
        # quantization barely perturbs the signal vs the float product
        cfg2 = small_cfg()
        obs2 = Observation(cfg2)
        with tempfile.TemporaryDirectory() as d:
            paths = obs2.generate(d, chunk=4, progress=lambda s: None)
            _, reads_f, _ = read_ima(paths[0])
        assert np.abs(reads - reads_f).max() <= 0.5 + 1e-6


@pytest.mark.slow
def test_full_frame_1024_visit_through_generate(tmp_path):
    """Full-frame (1024^2) production coverage: a whole visit through
    Observation.generate() with the full noise chain — the 5-px
    reference-pixel border stays signal-free and DQ-128 flagged, the
    photosensitive interior carries the ramp, and the dispersed spectrum
    lands where the trace says (VERDICT round 2, missing #3)."""
    import glob

    from wayne_tpu.config import config_from_dict
    from wayne_tpu.io.ima import DQ_REF_PIXEL, read_ima
    from wayne_tpu.observation import Observation

    pars = dict(grism="G141", subarray=1024, nsamp=2, samp_seq="RAPID",
                scan=True, scan_speed_pix_s=1.0, x_ref=450.0, y_ref=500.0,
                n_orbits=1, exposures_per_orbit=2, n_lambda=128, n_sub=2,
                seed=4)
    obs = Observation(config_from_dict(pars))
    assert obs.static.band_px > 0          # banded splat on the full frame
    outdir = tmp_path / "ff"
    paths = obs.generate(str(outdir), chunk=2, progress=lambda s: None)
    assert len(paths) == 2
    hdr, reads, times, dq = read_ima(paths[0], with_dq=True)
    assert hdr["SUBTYPE"] == "FULLIMAG" and not hdr["SUBARRAY"]
    assert reads.shape[1:] == (1024, 1024)
    # reference-pixel ring: DQ 128 on the 5-px border, none inside
    assert (dq[-1][:5, :] & DQ_REF_PIXEL).all()
    assert (dq[-1][:, -5:] & DQ_REF_PIXEL).all()
    assert not (dq[-1][5:-5, 5:-5] & DQ_REF_PIXEL).any()
    cds = reads[-1] - reads[0]
    # border: no photocharge accumulates (read noise only, zero mean);
    # interior: sky+dark ramp everywhere
    border = np.concatenate([cds[:5].ravel(), cds[-5:].ravel(),
                             cds[:, :5].ravel(), cds[:, -5:].ravel()])
    interior = cds[5:-5, 5:-5]
    rn_dn = float(obs.tables.read_noise_e) / float(obs.tables.gain)
    assert abs(border.mean()) < 0.2 * rn_dn
    assert interior.mean() > 5.0 * abs(border.mean() + 1e-9)
    # the dispersed spectrum sits on the trace rows around y_ref
    row_sig = np.median(cds, axis=1)
    rows = np.where(row_sig > row_sig.max() * 0.5)[0]
    assert 420 < rows.mean() < 560, rows.mean()
