"""Transit light-curve golden tests (SURVEY.md section 4 test strategy:
analytic limits + fp64 oracle diff for each physics stage)."""

import jax.numpy as jnp
import numpy as np
import pytest

from wayne_tpu.ops.kepler import OrbitParams, eccentric_anomaly, projected_separation
from wayne_tpu.ops.transit import (
    claret_total_flux, transit_depth_curve, transit_light_curve,
)
from wayne_tpu.oracle.numpy_oracle import oracle_transit_flux

LD = jnp.array([0.65, -0.25, 0.45, -0.2], jnp.float32)
UNIFORM = jnp.zeros(4, jnp.float32)


def uniform_exact(z, p):
    """Exact uniform-disk occultation (Mandel & Agol 2002, lambda^e)."""
    z = np.asarray(z, np.float64)
    out = np.zeros_like(z)
    full = z <= 1.0 - p
    out[full] = p**2
    partial = (np.abs(1.0 - p) < z) & (z < 1.0 + p)
    zp = z[partial]
    k0 = np.arccos((p**2 + zp**2 - 1.0) / (2.0 * p * zp))
    k1 = np.arccos((1.0 - p**2 + zp**2) / (2.0 * zp))
    out[partial] = (p**2 * k0 + k1
                    - np.sqrt(np.maximum(0.0, zp**2 - 0.25 * (1 + zp**2 - p**2)**2))
                    ) / np.pi
    return 1.0 - out


class TestAnalyticLimits:
    def test_no_overlap_is_unity(self):
        f = transit_depth_curve(jnp.array([1.2, 2.0, 10.0]), 0.15, LD)
        np.testing.assert_allclose(np.asarray(f), 1.0, rtol=0, atol=1e-7)

    def test_uniform_disk_matches_mandel_agol(self):
        z = jnp.linspace(0.0, 1.3, 201)
        f = transit_depth_curve(z, 0.1, UNIFORM, n_quad=64)
        np.testing.assert_allclose(np.asarray(f), uniform_exact(z, 0.1), atol=2e-6)

    def test_uniform_center_depth_is_p_squared(self):
        f = transit_depth_curve(jnp.array([0.0]), 0.15, UNIFORM)
        np.testing.assert_allclose(float(f[0]), 1.0 - 0.15**2, atol=1e-7)

    def test_total_flux_closed_form(self):
        # integral of I(r) 2r dr via dense trapezoid
        r = np.linspace(0, 1, 200001)
        mu = np.sqrt(1 - r**2)
        ld = np.asarray(LD, np.float64)
        I = 1 - np.sum(ld * (1 - mu[:, None] ** (np.arange(1, 5) / 2)), axis=1)
        num = np.trapezoid(I * 2 * r, r)
        np.testing.assert_allclose(float(claret_total_flux(LD)), num, rtol=1e-5)


class TestOracleAgreement:
    @pytest.mark.parametrize("p", [0.05, 0.1595])
    def test_claret_vs_fp64_oracle(self, p):
        z = jnp.linspace(0.0, 1.0 + p + 0.1, 301)
        f32 = np.asarray(transit_depth_curve(z, p, LD, n_quad=64), np.float64)
        f64 = oracle_transit_flux(np.asarray(z), p, np.asarray(LD))
        # channel-depth accuracy target ~1e-5 absolute (10 ppm)
        np.testing.assert_allclose(f32, f64, atol=1.5e-5)

    def test_quadrature_converged_at_64_nodes(self):
        z = np.linspace(0.0, 1.2, 101)
        f64_64 = oracle_transit_flux(z, 0.12, np.asarray(LD), n_quad=64)
        f64_hi = oracle_transit_flux(z, 0.12, np.asarray(LD), n_quad=4096)
        np.testing.assert_allclose(f64_64, f64_hi, atol=2e-7)

    def test_chromatic_ld_vs_fp64_oracle(self):
        """The oracle accepts per-channel (NL, 4) Claret coefficients —
        the shape the device's chromatic limb darkening uses — so
        kernel LD changes stay oracle-checkable (regression: the oracle
        summed a 2-D ld into one wrong scalar)."""
        nl = 5
        lds = np.stack([np.asarray(LD) * s
                        for s in np.linspace(0.6, 1.3, nl)])   # (NL, 4)
        z = np.linspace(0.0, 1.3, 121)
        # per-channel oracle == per-channel scalar-LD oracle
        grid = oracle_transit_flux(
            np.broadcast_to(z[:, None], (z.size, nl)), 0.12,
            lds[None, :, :])
        for c in range(nl):
            ref = oracle_transit_flux(z, 0.12, lds[c])
            np.testing.assert_allclose(grid[:, c], ref, atol=1e-12)
        # and the device kernel matches it per channel
        for c in range(nl):
            f32 = np.asarray(transit_depth_curve(
                jnp.asarray(z), 0.12, jnp.asarray(lds[c], jnp.float32),
                n_quad=64), np.float64)
            np.testing.assert_allclose(
                f32, oracle_transit_flux(z, 0.12, lds[c]), atol=1.5e-5)


class TestKepler:
    def test_circular_identity(self):
        M = jnp.linspace(-3.0, 3.0, 11)
        np.testing.assert_allclose(np.asarray(eccentric_anomaly(M, jnp.float32(0.0))),
                                   np.asarray(M), atol=1e-6)

    def test_kepler_residual(self):
        M = jnp.linspace(-3.0, 3.0, 101)
        for e in (0.1, 0.5, 0.9):
            E = eccentric_anomaly(M, jnp.float32(e))
            resid = np.asarray(E - e * jnp.sin(E) - M)
            np.testing.assert_allclose(resid, 0.0, atol=5e-6)

    def test_midtransit_impact_parameter(self):
        orbit = OrbitParams.create(period_s=86400.0, t0_s=0.0, sma_rs=8.0,
                                   inc_rad=np.deg2rad(87.0))
        z, front = projected_separation(jnp.array([0.0]), orbit)
        np.testing.assert_allclose(float(z[0]), 8.0 * np.cos(np.deg2rad(87.0)),
                                   rtol=1e-5)
        assert float(front[0]) == 1.0

    def test_secondary_eclipse_masked(self):
        orbit = OrbitParams.create(period_s=86400.0, t0_s=0.0, sma_rs=8.0,
                                   inc_rad=np.deg2rad(90.0))
        lc = transit_light_curve(jnp.array([43200.0]), orbit,
                                 jnp.array([0.15]), LD)
        np.testing.assert_allclose(float(lc[0, 0]), 1.0, atol=1e-7)

    def test_eccentric_vs_circular_consistency(self):
        # e -> 0 limit must reproduce the circular curve.
        t = jnp.linspace(-5000.0, 5000.0, 41)
        circ = OrbitParams.create(86400.0, 0.0, 8.0, np.deg2rad(88.0), 0.0)
        ecc = OrbitParams.create(86400.0, 0.0, 8.0, np.deg2rad(88.0), 1e-5)
        z1, _ = projected_separation(t, circ)
        z2, _ = projected_separation(t, ecc)
        np.testing.assert_allclose(np.asarray(z1), np.asarray(z2),
                                   rtol=1e-4, atol=1e-4)


class TestLightCurve:
    def test_shape_and_depth(self):
        orbit = OrbitParams.create(0.813475 * 86400.0, 0.0, 4.855,
                                   np.deg2rad(82.1))
        rp = jnp.full((16,), 0.1595)
        t = jnp.linspace(-7000.0, 7000.0, 33)
        lc = transit_light_curve(t, orbit, rp, LD)
        assert lc.shape == (33, 16)
        assert float(lc.min()) < 1.0 - 0.8 * 0.1595**2  # in-transit depth
        np.testing.assert_allclose(np.asarray(lc[0]), 1.0, atol=1e-6)  # pre-ingress

    def test_per_channel_ld(self):
        orbit = OrbitParams.create(0.813475 * 86400.0, 0.0, 4.855,
                                   np.deg2rad(82.1))
        rp = jnp.full((4,), 0.1595)
        ld2 = jnp.stack([LD, UNIFORM, LD, UNIFORM])
        t = jnp.array([0.0])
        lc = transit_light_curve(t, orbit, rp, ld2)
        assert lc.shape == (1, 4)
        assert abs(float(lc[0, 0] - lc[0, 2])) < 1e-7
        assert abs(float(lc[0, 0] - lc[0, 1])) > 1e-4  # LD changes the depth


class TestChannelInterp:
    def test_interp_matches_direct(self):
        from wayne_tpu.ops.transit import transit_light_curve
        orbit = OrbitParams.create(0.813475 * 86400.0, 0.0, 4.855,
                                   np.deg2rad(82.1))
        wl = np.linspace(1.1, 1.7, 256)
        rp = jnp.asarray(0.1595 + 0.004 * np.sin(9 * wl), jnp.float32)
        t = jnp.linspace(-4000.0, 4000.0, 9)
        fast = transit_light_curve(t, orbit, rp, LD, interp_channels=True)
        slow = transit_light_curve(t, orbit, rp, LD, interp_channels=False)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                                   atol=2e-6)

    def test_constant_rp_degenerate_range(self):
        from wayne_tpu.ops.transit import transit_light_curve
        orbit = OrbitParams.create(0.813475 * 86400.0, 0.0, 4.855,
                                   np.deg2rad(82.1))
        rp = jnp.full((64,), 0.1595)
        t = jnp.array([0.0])
        fast = transit_light_curve(t, orbit, rp, LD, interp_channels=True)
        slow = transit_light_curve(t, orbit, rp, LD, interp_channels=False)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                                   atol=2e-6)


class TestSecondaryEclipse:
    """Planet dayside light + uniform-disk occultation (beyond the
    reference, which models transits only)."""

    def test_hidden_frac_limits(self):
        from wayne_tpu.ops.transit import uniform_disk_hidden_frac
        p = 0.1
        assert float(uniform_disk_hidden_frac(1.2, p)) == 0.0   # separated
        assert float(uniform_disk_hidden_frac(0.5, p)) == 1.0   # fully hidden
        # half-covered when the star's limb bisects the planet center
        mid = float(uniform_disk_hidden_frac(1.0, p))
        assert abs(mid - 0.5) < 0.02   # small-p limb is nearly straight

    def test_hidden_frac_matches_numeric_area(self):
        from wayne_tpu.ops.transit import uniform_disk_hidden_frac
        rng = np.random.RandomState(1)
        for z, p in [(0.95, 0.1), (1.05, 0.12), (0.99, 0.05)]:
            pts = rng.uniform(-1, 1, size=(200_000, 2)) * p
            pts = pts[np.sum(pts**2, axis=1) <= p * p] + np.array([z, 0.0])
            frac_mc = np.mean(np.sum(pts**2, axis=1) <= 1.0)
            got = float(uniform_disk_hidden_frac(z, p))
            assert abs(got - frac_mc) < 5e-3, (z, p, got, frac_mc)

    def test_light_curve_with_planet_light(self):
        from wayne_tpu.ops.transit import transit_light_curve
        period = 2.0 * 86400.0
        orbit = OrbitParams.create(period, 0.0, 8.0, np.deg2rad(90.0))
        nl = 8
        rp = jnp.full((nl,), 0.1)
        fp = jnp.full((nl,), 1.5e-3)
        # mid-transit, quadrature, mid-secondary
        t = jnp.array([0.0, 0.25 * period, 0.5 * period])
        lc = np.asarray(transit_light_curve(t, orbit, rp, LD,
                                            fp_over_fs=fp))
        lc0 = np.asarray(transit_light_curve(t, orbit, rp, LD))
        # transit depth unchanged, baseline lifted by fp
        np.testing.assert_allclose(lc[0], lc0[0] + 1.5e-3, atol=1e-7)
        np.testing.assert_allclose(lc[1], 1.0 + 1.5e-3, atol=1e-6)
        # planet fully hidden at mid-secondary: star light only
        np.testing.assert_allclose(lc[2], 1.0, atol=1e-6)

    def test_eclipse_through_the_exposure_kernel(self):
        import dataclasses

        from wayne_tpu.calibration import synthetic_tables
        from wayne_tpu.config import ExposureStatic, NoiseFlags
        from wayne_tpu.ops.exposure import simulate_exposure
        from wayne_tpu.scene import example_scene

        nl, S = 32, 64
        cfg = ExposureStatic(subarray=S, n_lambda=nl, n_sub=2, nsamp=2,
                             samp_seq="RAPID", scan=False,
                             noise=NoiseFlags.none(), transit_quad=16,
                             eclipse=True)
        tables = synthetic_tables("G141", subarray=S, n_lambda=nl,
                                  samp_seq="RAPID", nsamp=2)
        base = example_scene(nl, scan_speed=0.0)
        fp = 2e-3
        period = float(base.orbit.period_s)
        t0 = float(base.orbit.t0_s)
        mk = lambda t: dataclasses.replace(
            base, fp_over_fs=jnp.full((nl,), fp, jnp.float32),
            x_ref=jnp.float32(20.0), y_ref=jnp.float32(30.0),
            exp_start_s=jnp.float32(t))
        in_ecl = simulate_exposure(mk(t0 + 0.5 * period), tables, cfg)
        quad = simulate_exposure(mk(t0 + 0.25 * period), tables, cfg)
        r = float(jnp.sum(quad.ideal_e) / jnp.sum(in_ecl.ideal_e))
        assert abs(r - (1.0 + fp)) < 2e-4, r

    def test_phase_curve_modulation(self):
        from wayne_tpu.ops.transit import transit_light_curve
        period = 2.0 * 86400.0
        orbit = OrbitParams.create(period, 0.0, 8.0, np.deg2rad(90.0))
        nl = 4
        rp = jnp.full((nl,), 0.1)
        fp = jnp.full((nl,), 2e-3)
        amp = 0.8
        # just outside eclipse/transit contacts: planet fully visible
        t = np.array([0.06 * period, 0.44 * period, 0.25 * period])
        lc = np.asarray(transit_light_curve(
            jnp.asarray(t, jnp.float32), orbit, rp, LD,
            fp_over_fs=fp, phase_amp=amp))
        phi = 2 * np.pi * t / period - np.pi
        mod = 1.0 - amp * 0.5 * (1.0 - np.cos(phi))
        for i in range(3):
            np.testing.assert_allclose(lc[i], 1.0 + 2e-3 * mod[i], atol=1e-5)
        # ordering: dayside > quadrature > nightside
        assert lc[1, 0] > lc[2, 0] > lc[0, 0]
        # Positive (eastward) offset: the dayside maximum arrives BEFORE
        # mid-eclipse, so pre-eclipse flux exceeds post-eclipse flux at
        # symmetric phases (tiny rp keeps the planet visible throughout).
        off = np.deg2rad(30.0)
        tiny = jnp.full((nl,), 1e-6)
        pre, post = 0.40 * period, 0.60 * period
        lc_pair = np.asarray(transit_light_curve(
            jnp.array([pre, post]), orbit, tiny, LD,
            fp_over_fs=fp, phase_amp=amp, phase_offset_rad=off))
        assert lc_pair[0, 0] > lc_pair[1, 0] + 1e-5
        # and the modulation value matches the closed form at phi+offset
        phi_pre = 2 * np.pi * pre / period - np.pi
        want = 1 + 2e-3 * (1 - amp * 0.5 * (1 - np.cos(phi_pre + off)))
        np.testing.assert_allclose(lc_pair[0], want, atol=1e-5)

    def test_eccentric_phase_tracks_true_eclipse(self):
        """With e > 0 the eclipse shifts off phase 0.5; the thermal
        maximum (phase_amp on, no offset) must shift with it."""
        from wayne_tpu.ops.kepler import orbital_phase_angle, \
            projected_separation
        from wayne_tpu.ops.transit import transit_light_curve
        period = 2.0 * 86400.0
        orbit = OrbitParams.create(period, 0.0, 8.0, np.deg2rad(90.0),
                                   ecc=0.3, omega_rad=0.0)
        t = jnp.linspace(0.05 * period, 0.95 * period, 1001)
        z, infr = projected_separation(t, orbit)
        # mid-eclipse: minimum separation on the far side
        zm = np.where(np.asarray(infr) < 0.5, np.asarray(z), np.inf)
        t_ecl = float(t[int(np.argmin(zm))])
        assert abs(t_ecl / period - 0.5) > 0.02   # genuinely shifted
        phi = np.asarray(orbital_phase_angle(t, orbit))
        t_phi0 = float(t[int(np.argmin(np.abs(phi)))])
        # the phase-angle zero sits at the true eclipse, not at P/2
        assert abs(t_phi0 - t_ecl) / period < 0.01
