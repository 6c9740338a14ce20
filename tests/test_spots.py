"""Starspots: crossing bumps + chromatic depth dilution (ops/spots.py).

Gates: the branch-free lens area against a numeric grid, the resolved
sky-position geometry against projected_separation, the unocculted
dimming and in-spot crossing recovery against their closed-form
small-spot values, pytree plumbing through the exposure kernel and the
YAML path, and gradient flow (retrieval can fit spot parameters).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wayne_tpu.ops.kepler import (
    OrbitParams, projected_separation, sky_position,
)
from wayne_tpu.ops.spots import (
    SpotParams, circle_overlap_area, spot_delta, spot_positions,
)
from wayne_tpu.ops.transit import claret_intensity, claret_total_flux

LD = jnp.asarray([0.65, -0.25, 0.45, -0.2], jnp.float32)


def _grid_overlap(d, r1, r2, n=2000):
    """Brute-force lens area on a grid (fp64)."""
    lo = min(-r1, d - r2)
    hi = max(r1, d + r2)
    xs = np.linspace(lo, hi, n)
    ys = np.linspace(-max(r1, r2), max(r1, r2), n)
    dx = xs[1] - xs[0]
    dy = ys[1] - ys[0]
    X, Y = np.meshgrid(xs, ys)
    inside = (X**2 + Y**2 <= r1**2) & ((X - d)**2 + Y**2 <= r2**2)
    return inside.sum() * dx * dy


class TestCircleOverlap:
    def test_regimes_against_grid(self):
        cases = [
            (0.5, 0.3, 0.3),    # partial
            (0.05, 0.3, 0.1),   # r2 contained in r1
            (0.9, 0.3, 0.3),    # disjoint
            (0.25, 0.1, 0.3),   # r1 contained in r2
            (0.4, 0.35, 0.12),  # partial, asymmetric
        ]
        for d, r1, r2 in cases:
            got = float(circle_overlap_area(jnp.float32(d), jnp.float32(r1),
                                            jnp.float32(r2)))
            want = _grid_overlap(d, r1, r2)
            assert abs(got - want) < 3e-4, (d, r1, r2, got, want)

    def test_exact_limits(self):
        # disjoint -> 0; concentric -> pi * min(r)^2
        assert float(circle_overlap_area(1.0, 0.3, 0.3)) == pytest.approx(0.0)
        assert float(circle_overlap_area(1e-7, 0.5, 0.2)) == pytest.approx(
            np.pi * 0.04, rel=1e-5)

    def test_gradient_finite(self):
        g = jax.grad(lambda d: circle_overlap_area(d, 0.3, 0.2))(
            jnp.float32(0.4))
        assert np.isfinite(float(g)) and float(g) < 0.0  # area shrinks with d


class TestSkyPosition:
    @pytest.mark.parametrize("ecc,omega", [(0.0, np.pi / 2),
                                           (0.21, 1.1)])
    def test_matches_projected_separation(self, ecc, omega):
        orbit = OrbitParams.create(period_s=3.0 * 86400.0, t0_s=5000.0,
                                   sma_rs=8.0, inc_rad=np.deg2rad(86.0),
                                   ecc=ecc, omega_rad=omega)
        t = jnp.linspace(0.0, 3.0 * 86400.0, 257)
        x, y, infr = sky_position(t, orbit)
        z, infr2 = projected_separation(t, orbit)
        np.testing.assert_allclose(np.hypot(np.asarray(x), np.asarray(y)),
                                   np.asarray(z), rtol=2e-5, atol=2e-5)
        np.testing.assert_array_equal(np.asarray(infr), np.asarray(infr2))

    def test_transit_chord_geometry(self):
        b_expect = 8.0 * np.cos(np.deg2rad(86.0))
        orbit = OrbitParams.create(period_s=3.0 * 86400.0, t0_s=0.0,
                                   sma_rs=8.0, inc_rad=np.deg2rad(86.0))
        x, y, infr = sky_position(jnp.asarray([0.0, 60.0]), orbit)
        assert abs(float(x[0])) < 1e-3          # mid-transit: x = 0
        assert float(y[0]) == pytest.approx(b_expect, rel=1e-4)  # chord at +b
        assert float(x[1]) > float(x[0])        # planet moves toward +x
        assert float(infr[0]) == 1.0


def _orbit(t0=0.0, inc_deg=86.0):
    return OrbitParams.create(period_s=3.0 * 86400.0, t0_s=t0, sma_rs=8.0,
                              inc_rad=np.deg2rad(inc_deg))


class TestSpotDelta:
    def test_unocculted_dimming_closed_form(self):
        # one static spot far from the chord, planet far from transit
        lat, lon, r, c = np.deg2rad(-40.0), np.deg2rad(20.0), 0.12, 0.7
        spots = SpotParams.create([lat], [lon], [r],
                                  np.full((1, 3), c, np.float32))
        t = jnp.asarray([86400.0])               # mid-way: no transit
        rp = jnp.full(3, 0.1, jnp.float32)
        delta = spot_delta(t, _orbit(), rp, LD, spots)
        mu = np.cos(lat) * np.cos(lon)
        inten = float(claret_intensity(jnp.float32(mu), LD)
                      / claret_total_flux(LD))
        want = -(r ** 2) * mu * inten * (1.0 - c)
        np.testing.assert_allclose(np.asarray(delta)[0], want, rtol=1e-5)

    def test_crossing_recovery_in_spot(self):
        # spot centered ON the transit chord, facing us at mid-transit
        # (t0 = 0, lon = 0); planet disk fully inside the spot there.
        b = 8.0 * np.cos(np.deg2rad(86.0))
        lat = np.arcsin(b)
        r_spot, c, rp = 0.25, 0.55, 0.06
        spots = SpotParams.create([lat], [0.0], [r_spot],
                                  np.full((1, 2), c, np.float32))
        rp_arr = jnp.full(2, rp, jnp.float32)
        delta_mid = spot_delta(jnp.asarray([0.0]), _orbit(), rp_arr, LD,
                               spots)
        mu = np.cos(lat)
        assert rp < r_spot * np.sqrt(mu)         # fully-contained regime
        inten = float(claret_intensity(jnp.float32(mu), LD)
                      / claret_total_flux(LD))
        want = (rp ** 2 - r_spot ** 2 * mu) * inten * (1.0 - c)
        np.testing.assert_allclose(np.asarray(delta_mid)[0], want,
                                   rtol=1e-4)

        # crossing bump: mid-transit delta exceeds the far-from-spot
        # in-transit delta by exactly the recovery term
        delta_off = spot_delta(jnp.asarray([1800.0]), _orbit(), rp_arr, LD,
                               spots)
        bump = float(delta_mid[0, 0] - delta_off[0, 0])
        assert bump == pytest.approx(rp ** 2 * inten * (1.0 - c), rel=1e-3)

    def test_rotation_carries_spot_off_disk(self):
        period_s = 5.0 * 86400.0
        spots = SpotParams.create([0.0], [0.0], [0.1],
                                  np.full((1, 2), 0.6, np.float32),
                                  rot_omega=2.0 * np.pi / period_s)
        rp = jnp.full(2, 0.1, jnp.float32)
        t = jnp.asarray([0.0, period_s / 2.0])   # facing us -> far side
        delta = spot_delta(t, _orbit(t0=-1e6), rp, LD, spots)
        assert float(delta[0, 0]) < -1e-4        # visible: dimming
        assert float(delta[1, 0]) == 0.0         # rotated off: immaculate
        # and spot_positions agrees on the visibility flip
        _, _, mu = spot_positions(t, spots)
        assert float(mu[0, 0]) > 0 > float(mu[1, 0])

    def test_gradient_flows_to_spot_params(self):
        spots = SpotParams.create([0.1], [0.05], [0.15],
                                  np.full((1, 2), 0.6, np.float32))
        rp = jnp.full(2, 0.1, jnp.float32)

        def loss(r):
            sp = dataclasses.replace(spots, radius=jnp.asarray([r]))
            return jnp.sum(spot_delta(jnp.asarray([0.0, 900.0]), _orbit(),
                                      rp, LD, sp))

        g = jax.grad(loss)(jnp.float32(0.15))
        assert np.isfinite(float(g)) and abs(float(g)) > 0.0

    def test_per_channel_ld(self):
        ld2 = jnp.stack([LD, LD * 0.5])          # (NL, 4)
        spots = SpotParams.create([0.2], [0.1], [0.1],
                                  np.full((1, 2), 0.7, np.float32))
        rp = jnp.full(2, 0.1, jnp.float32)
        d = spot_delta(jnp.asarray([0.0]), _orbit(), rp, ld2, spots)
        assert d.shape == (1, 2)
        assert float(d[0, 0]) != float(d[0, 1])  # LD changes the deficit


class TestExposureIntegration:
    def _cfg_tables(self):
        from wayne_tpu.calibration import synthetic_tables
        from wayne_tpu.config import ExposureStatic, NoiseFlags

        cfg = ExposureStatic(subarray=64, n_lambda=24, n_sub=2, nsamp=2,
                             samp_seq="SPARS10", scan=True,
                             noise=NoiseFlags.none(), band_px=32)
        tables = synthetic_tables("G141", subarray=64, n_lambda=24,
                                  samp_seq="SPARS10", nsamp=2)
        return cfg, tables

    def test_unit_contrast_equals_no_spots(self):
        from wayne_tpu.ops.exposure import simulate_exposure
        from wayne_tpu.scene import example_scene

        cfg, tables = self._cfg_tables()
        base = example_scene(24, scan_speed=0.4)
        base = dataclasses.replace(base, x_ref=jnp.float32(8.0),
                                   y_ref=jnp.float32(8.0))
        plain = simulate_exposure(base, tables, cfg).reads_dn
        spots = SpotParams.create([0.3], [0.2], [0.2],
                                  np.ones((1, 24), np.float32))
        spotted = simulate_exposure(
            dataclasses.replace(base, spots=spots), tables, cfg).reads_dn
        np.testing.assert_allclose(np.asarray(spotted), np.asarray(plain),
                                   rtol=1e-6, atol=1e-4)

    def test_dark_spot_dims_visit(self):
        """A visit vmaps with the spots leaf; dark spot lowers the flux."""
        from wayne_tpu.ops.visit import simulate_visit
        from wayne_tpu.scene import example_scene

        cfg, tables = self._cfg_tables()
        n = 4
        base = example_scene(24, scan_speed=0.4)
        base = dataclasses.replace(base, x_ref=jnp.float32(8.0),
                                   y_ref=jnp.float32(8.0))
        spots = SpotParams.create([0.4], [0.1], [0.2],
                                  np.full((1, 24), 0.5, np.float32))
        mk = lambda sp: dataclasses.replace(
            jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x[None], (n,) + x.shape), base),
            exp_start_s=jnp.linspace(0.0, 400.0, n),
            spots=(None if sp is None else jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x[None], (n,) + x.shape), sp)))
        plain = simulate_visit(mk(None), tables, cfg, chunk=2).reads_dn
        spotted = simulate_visit(mk(spots), tables, cfg, chunk=2).reads_dn
        tot_p = float(jnp.sum(plain[:, -1] - plain[:, 0]))
        tot_s = float(jnp.sum(spotted[:, -1] - spotted[:, 0]))
        assert tot_s < tot_p * 0.999
        # chromatic: the deficit is per-wavelength uniform here (grey
        # contrast), so the ratio matches the analytic dimming
        mu = np.cos(0.4) * np.cos(0.1)
        inten = float(claret_intensity(jnp.float32(mu), LD)
                      / claret_total_flux(LD))
        want = 1.0 - 0.2 ** 2 * mu * inten * 0.5
        assert tot_s / tot_p == pytest.approx(want, abs=2e-4)


class TestRetrievalClosedLoop:
    @pytest.mark.slow
    def test_spotted_star_retrieval_unbiased(self):
        """Forward-model retrieval THROUGH a spotted star.

        The model twin carries Scene.spots, so a crossing bump + an
        unocculted dilution that would bias any immaculate-star analysis
        are modeled, not fitted into the depths: with the spots in the
        model the recovered spectrum is near-exact, without them it is
        visibly biased (the science case for ops/spots.py + retrieval).
        """
        from wayne_tpu.calibration import synthetic_tables
        from wayne_tpu.config import ExposureStatic, NoiseFlags
        from wayne_tpu.ops.visit import simulate_visit
        from wayne_tpu.retrieval import retrieve_transmission
        from wayne_tpu.scene import example_scene

        S, NL, n_exp, n_chan = 128, 48, 18, 4
        x_window = (72, 126)
        cfg = ExposureStatic(subarray=S, n_lambda=NL, n_sub=2, nsamp=3,
                             samp_seq="SPARS10", scan=True,
                             noise=NoiseFlags.none(), band_px=48)
        tables = synthetic_tables("G141", subarray=S, n_lambda=NL,
                                  samp_seq="SPARS10", nsamp=3)
        base = example_scene(NL, scan_speed=0.6)
        wl = np.asarray(tables.wl_centers)
        rp = 0.1595 + 0.004 * np.sin(9.0 * wl)
        base = dataclasses.replace(
            base, x_ref=jnp.float32(30.0), y_ref=jnp.float32(30.0),
            rp_over_rs=jnp.asarray(rp, jnp.float32))
        # one spot ON the chord (lat = asin(b), faces us near the 2 h
        # transit; static), one unocculted diluter; chromatic contrast
        b = 4.855 * np.cos(np.deg2rad(82.1))
        contrast = np.stack([0.4 + 0.2 * (wl - wl.min()) / np.ptp(wl),
                             np.full(NL, 0.6)]).astype(np.float32)
        spots = SpotParams.create([np.arcsin(b), -0.5], [0.0, 0.4],
                                  [0.22, 0.12], contrast)
        scenes = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (n_exp,) + x.shape), base)
        scenes = dataclasses.replace(
            scenes,
            exp_start_s=jnp.asarray(
                np.linspace(0.0, 4.0 * 3600.0, n_exp), jnp.float32),
            key=jax.vmap(lambda i: jax.random.fold_in(
                jax.random.PRNGKey(3), i))(jnp.arange(n_exp)),
            spots=jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x[None], (n_exp,) + x.shape),
                spots))

        out = simulate_visit(scenes, tables, cfg, chunk=6)
        obs = (out.reads_dn[:, -1] - out.reads_dn[:, 0]).sum(axis=1)

        truth = np.zeros(n_chan)
        from wayne_tpu.retrieval import bin_channel_map
        idx, in_win = bin_channel_map(scenes, tables, x_window, n_chan)
        for c in range(n_chan):
            truth[c] = rp[in_win & (idx == c)].mean()

        kw = dict(x_window=x_window, n_chan=n_chan, rp_init=0.15,
                  chunk=6, n_lm=10, sigma=np.full(n_chan, 1e-4))
        res = retrieve_transmission(obs, scenes, tables, cfg, **kw)
        err_spotted = np.abs(res.rp - truth)
        assert np.all(err_spotted < 5e-4), (res.rp, truth)

        # immaculate-star model twin: same data, spots dropped -> biased
        res0 = retrieve_transmission(
            obs, dataclasses.replace(scenes, spots=None), tables, cfg,
            **kw)
        err_plain = np.abs(res0.rp - truth)
        assert err_plain.max() > 3.0 * max(err_spotted.max(), 1e-5), (
            res0.rp, truth)


class TestYamlPath:
    def test_config_builds_spotted_observation(self, tmp_path):
        from wayne_tpu.config import config_from_dict
        from wayne_tpu.observation import Observation

        params = {
            "grism": "G141", "subarray": 128, "nsamp": 2,
            "n_lambda": 24, "scan": True, "scan_speed_pix_s": 0.5,
            "n_exposures": 2, "noise": {"preset": "none"},
            "star": {
                "temperature_k": 4800.0,
                "spots": [
                    {"lon_deg": 5.0, "lat_deg": 30.0, "radius": 0.1,
                     "temp_k": 3900.0},
                    {"lon_deg": -20.0, "lat_deg": -10.0, "radius": 0.05,
                     "contrast": 0.4},
                ],
                "rotation_period_d": 12.0,
            },
        }
        obs = Observation(config_from_dict(params))
        sp = obs.scenes.spots
        assert sp is not None
        n = obs.plan.n_exposures
        assert sp.contrast.shape == (n, 2, 24)
        # blackbody contrast: cooler spot is darker in the blue
        c = np.asarray(sp.contrast[0, 0])
        assert np.all(c < 1.0) and c[0] < c[-1]
        # grey contrast spot holds its explicit value
        np.testing.assert_allclose(np.asarray(sp.contrast[0, 1]), 0.4,
                                   rtol=1e-6)
        assert float(sp.rot_omega[0]) == pytest.approx(
            2.0 * np.pi / (12.0 * 86400.0), rel=1e-6)

    def test_bad_spot_configs_raise(self):
        from wayne_tpu.config import config_from_dict
        from wayne_tpu.observation import Observation

        base = {"grism": "G141", "subarray": 64, "nsamp": 2,
                "n_lambda": 16, "n_exposures": 1,
                "noise": {"preset": "none"}}

        def build(spots):
            cfg = config_from_dict({**base, "star": {"spots": spots}})
            return Observation(cfg)

        with pytest.raises(ValueError, match="radius"):
            build([{"lon_deg": 0, "lat_deg": 0, "radius": 1.5,
                    "temp_k": 4000}])
        with pytest.raises(ValueError, match="temp_k or contrast"):
            build([{"lon_deg": 0, "lat_deg": 0, "radius": 0.1}])
        with pytest.raises(ValueError, match="unknown spot keys"):
            build([{"lon_deg": 0, "lat_deg": 0, "radius": 0.1,
                    "temp_k": 4000, "size": 2}])
        with pytest.raises(ValueError, match="lat_deg"):
            build([{"lon_deg": 0, "lat_deg": 120, "radius": 0.1,
                    "temp_k": 4000}])


class TestCliClipSigma:
    @pytest.mark.slow
    def test_run_reduce_clips_spot_crossing(self, tmp_path):
        """File-level loop: a spotted visit's crossing bump biases the
        ramp-fit depths; --clip-sigma masks the bumped exposures (the
        report names them) and the channel depths move back toward the
        injected spectrum."""
        import json

        import yaml

        from wayne_tpu.config import config_from_dict
        from wayne_tpu.observation import Observation
        from wayne_tpu.run_reduce import main as reduce_main

        # HST-like explicit schedule: four 95.47-min orbits of five
        # exposures; the transit sits inside orbit 2 (indices 10-14)
        # with two of its five points in the spot-crossing window
        # (+-573 s of mid-transit for this geometry) and three clean
        # in-transit anchors. Orbits 0/1/3 are baseline, so the shared
        # hook amplitude cannot masquerade as the transit.
        hst_s = 95.47 * 60.0
        t0_s = 12600.0
        rel_s = [k * hst_s + o - t0_s
                 for k in range(4) for o in (300, 800, 1300, 1800, 2300)]
        bumped = [11, 12]
        t0_mjd = 56000.0
        params = {
            "grism": "G141", "subarray": 128, "NSAMP": 4,
            "SAMPSEQ": "SPARS10", "scan": True, "scan_speed": 0.5,
            "x_ref": 30.0, "y_ref": 40.0,
            "exp_start_times": [t0_mjd + s / 86400.0 for s in rel_s],
            "n_lambda": 48, "n_sub": 3, "seed": 11,
            "planet": {"rp_over_rs": 0.1595},
            # photometric noise only: the clip must find the bump
            # against real photon/read scatter (random-phase SSV or an
            # orbit-structure mismatch would swamp a 17-point visit —
            # those belong to the ensemble validation, not this gate)
            "noise": {"preset": "none", "poisson": True,
                      "read_noise": True, "sky": True, "dark": True,
                      "flat": True, "bias": True},
            "star": {"spots": [
                # ON the chord (b = 4.855 cos 82.1 deg -> lat 41.8 deg),
                # facing the observer: crossed at mid-transit; bump
                # ~7e-3 of flux, far above the white noise
                {"lon_deg": 0.0, "lat_deg": 41.8, "radius": 0.12,
                 "contrast": 0.35},
            ]},
        }
        outdir = tmp_path / "visit"
        obs = Observation(config_from_dict(params))
        obs.generate(str(outdir), chunk=6, progress=lambda s: None)
        ppath = tmp_path / "pars.yml"
        ppath.write_text(yaml.safe_dump(params))

        def depths(extra):
            rc = reduce_main(["-d", str(outdir), "-p", str(ppath),
                              "--n-chan", "3", "--cpu",
                              "--detrend", "ramp"] + extra)
            assert rc == 0
            rep = json.loads((outdir / "reduced.json").read_text())
            rp = np.array([c["rp_over_rs"] for c in rep["channels"]])
            return rp, rep

        rp_plain, _ = depths([])
        rp_rob, rep = depths(["--clip-sigma", "4.0"])
        wf = rep["white_ramp_fit"]
        assert wf["clip_sigma"] == 4.0
        # the clip lands on the spot-crossed mid-transit exposures only
        assert len(wf["clipped_exposures"]) >= 2
        assert set(wf["clipped_exposures"]) <= set(bumped), wf
        err_plain = np.abs(rp_plain - 0.1595).max()
        err_rob = np.abs(rp_rob - 0.1595).max()
        assert err_rob < 0.5 * err_plain, (err_plain, err_rob)

        # guard rails: wrong mode / absurd K fail loudly
        with pytest.raises(SystemExit, match="clip-sigma"):
            reduce_main(["-d", str(outdir), "-p", str(ppath), "--cpu",
                         "--clip-sigma", "4.0"])
        with pytest.raises(SystemExit, match="clip-sigma"):
            reduce_main(["-d", str(outdir), "-p", str(ppath), "--cpu",
                         "--detrend", "ramp", "--clip-sigma", "0.5"])


class TestFitSpots:
    @pytest.mark.slow
    def test_fit_spot_scale_closed_loop(self):
        """fit_spots: one deficit scale fitted THROUGH the simulator
        from a spot-blind start recovers s = 1 on data generated with
        the Scene's spots at full strength (rotating star), and the
        depths stay unbiased. s is identified by the crossing bump +
        the chromatic unocculted dilution jointly."""
        from wayne_tpu.calibration import synthetic_tables
        from wayne_tpu.config import ExposureStatic, NoiseFlags
        from wayne_tpu.ops.visit import simulate_visit
        from wayne_tpu.retrieval import (bin_channel_map,
                                         retrieve_transmission)
        from wayne_tpu.scene import example_scene

        S, NL, n_exp, n_chan = 128, 48, 18, 4
        xw = (72, 126)
        cfg = ExposureStatic(subarray=S, n_lambda=NL, n_sub=2, nsamp=3,
                             samp_seq="SPARS10", scan=True,
                             noise=NoiseFlags.none(), band_px=48)
        tables = synthetic_tables("G141", subarray=S, n_lambda=NL,
                                  samp_seq="SPARS10", nsamp=3)
        base = example_scene(NL, scan_speed=0.6)
        wl = np.asarray(tables.wl_centers)
        rp = 0.1595 + 0.004 * np.sin(9.0 * wl)
        base = dataclasses.replace(
            base, x_ref=jnp.float32(30.0), y_ref=jnp.float32(30.0),
            rp_over_rs=jnp.asarray(rp, jnp.float32))
        b = 4.855 * np.cos(np.deg2rad(82.1))
        contrast = np.stack(
            [0.4 + 0.2 * (wl - wl.min()) / np.ptp(wl),
             np.full(NL, 0.6)]).astype(np.float32)
        spots = SpotParams.create(
            [np.arcsin(b), -0.5], [0.0, 0.4], [0.22, 0.12], contrast,
            rot_omega=2 * np.pi / (10 * 86400.0))
        scenes = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (n_exp,) + x.shape),
            base)
        scenes = dataclasses.replace(
            scenes,
            exp_start_s=jnp.asarray(
                np.linspace(0.0, 4.0 * 3600.0, n_exp), jnp.float32),
            key=jax.vmap(lambda i: jax.random.fold_in(
                jax.random.PRNGKey(3), i))(jnp.arange(n_exp)),
            spots=jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x[None], (n_exp,) + x.shape),
                spots))
        out = simulate_visit(scenes, tables, cfg, chunk=6)
        obs = (out.reads_dn[:, -1] - out.reads_dn[:, 0]).sum(axis=1)
        idx, in_win = bin_channel_map(scenes, tables, xw, n_chan)
        truth = np.array([rp[in_win & (idx == c)].mean()
                          for c in range(n_chan)])
        res = retrieve_transmission(
            obs, scenes, tables, cfg, x_window=xw, n_chan=n_chan,
            rp_init=0.15, fit_spots=True, chunk=6, n_lm=12,
            sigma=np.full(n_chan, 1e-4))
        assert abs(res.spot_scale - 1.0) < 0.01, res.spot_scale
        assert res.spot_scale_sigma > 0
        assert np.all(np.abs(res.rp - truth) < 5e-4), (res.rp, truth)

    def test_fit_spots_requires_spots(self):
        from wayne_tpu.calibration import synthetic_tables
        from wayne_tpu.config import ExposureStatic, NoiseFlags
        from wayne_tpu.retrieval import retrieve_transmission
        from wayne_tpu.scene import example_scene

        cfg = ExposureStatic(subarray=64, n_lambda=24, n_sub=2, nsamp=2,
                             samp_seq="RAPID", scan=True,
                             noise=NoiseFlags.none())
        tables = synthetic_tables("G141", subarray=64, n_lambda=24,
                                  samp_seq="RAPID", nsamp=2)
        base = example_scene(24, scan_speed=0.4)
        scenes = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (4,) + x.shape), base)
        scenes = dataclasses.replace(
            scenes, exp_start_s=jnp.linspace(0.0, 400.0, 4))
        with pytest.raises(ValueError, match="fit_spots"):
            retrieve_transmission(
                jnp.ones((4, 64), jnp.float32), scenes, tables, cfg,
                x_window=(20, 60), n_chan=2, fit_spots=True)
