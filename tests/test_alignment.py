"""Spectral drift fitting + realignment (Iraclis-style horizontal
shifts): estimator accuracy, alignment round trip, and the closed loop
— pointing drift injected by the simulator, removed by the reducer."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wayne_tpu.calibration import synthetic_tables
from wayne_tpu.config import ExposureStatic, NoiseFlags
from wayne_tpu.ops.visit import simulate_visit
from wayne_tpu.reduction import (
    align_spectra, dispersion_centroid, drift_binned_flux, fit_depths,
    reduce_visit, shift_detrend, spectral_shifts,
)
from wayne_tpu.scene import example_scene


def _analytic_spectra(deltas, w=96, x0=8):
    """s_i(x) = ref(x - delta_i) evaluated ANALYTICALLY (no interp):
    a smooth continuum with absorption lines, zero outside [x0, x0+w)."""
    x = np.arange(128, dtype=np.float64)

    def ref(xx):
        env = np.exp(-0.5 * ((xx - 55.0) / 28.0) ** 2)
        lines = (1.0 - 0.3 * np.exp(-0.5 * ((xx - 40.0) / 2.5) ** 2)
                 - 0.2 * np.exp(-0.5 * ((xx - 72.0) / 3.5) ** 2))
        return 900.0 * env * lines

    s = np.stack([ref(x - d) for d in deltas])
    s[:, :x0] = 0.0
    s[:, x0 + w:] = 0.0
    return s.astype(np.float32), (x0, x0 + w)


def test_spectral_shifts_recovers_injected():
    deltas = np.linspace(-0.35, 0.35, 9)
    s, xw = _analytic_spectra(deltas)
    got = np.asarray(spectral_shifts(jnp.asarray(s), xw))
    # shifts are measured against the visit MEAN spectrum: compare
    # after removing each series' mean
    np.testing.assert_allclose(got - got.mean(),
                               deltas - deltas.mean(), atol=0.01)


def test_align_spectra_round_trip():
    deltas = np.linspace(-0.3, 0.3, 7)
    s, xw = _analytic_spectra(deltas)
    shifts = spectral_shifts(jnp.asarray(s), xw)
    al = np.asarray(align_spectra(jnp.asarray(s), shifts))
    # interior columns agree across exposures after realignment
    lo, hi = xw[0] + 3, xw[1] - 3
    spread = al[:, lo:hi].std(axis=0) / np.maximum(al[:, lo:hi].mean(0), 1.0)
    raw = s[:, lo:hi].std(axis=0) / np.maximum(s[:, lo:hi].mean(0), 1.0)
    assert spread.max() < 0.25 * raw.max(), (spread.max(), raw.max())


def test_drift_binned_flux_zero_shift_exact():
    """Zero shifts + integer edges reproduce plain partial sums
    exactly, and shifted bins conserve total flux (shared edges)."""
    rng = np.random.RandomState(3)
    s = jnp.asarray(rng.uniform(10.0, 100.0, (5, 64)), jnp.float32)
    edges = jnp.asarray([8, 16, 24, 40], jnp.int32)
    zero = jnp.zeros(5, jnp.float32)
    got = np.asarray(drift_binned_flux(s, zero, edges))
    want = np.stack([np.asarray(s[:, lo:hi]).sum(axis=1)
                     for lo, hi in ((8, 16), (16, 24), (24, 40))], axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    sh = jnp.asarray(np.linspace(-0.4, 0.4, 5), jnp.float32)
    g2 = np.asarray(drift_binned_flux(s, sh, edges))
    outer = np.asarray(drift_binned_flux(s, sh, jnp.asarray([8, 40])))
    np.testing.assert_allclose(g2.sum(axis=1), outer[:, 0], rtol=1e-5)


def test_shift_detrend_removes_linear_leak():
    """Exact removal of a linear drift response, coefficients fitted on
    OOT epochs only — in-transit flux is corrected, never fitted."""
    rng = np.random.RandomState(7)
    n = 30
    drift = np.linspace(0.0, 0.5, n).astype(np.float32)
    reg = (0.8 * drift + 0.123).astype(np.float32)   # affine regressor
    oot = np.ones(n, bool)
    oot[10:20] = False                               # "in transit"
    base = 1000.0 * (1.0 - 0.02 * (~oot))            # transit dip
    flux = (base * (1.0 + 0.25 * drift)).astype(np.float32)
    got = np.asarray(shift_detrend(jnp.asarray(flux), jnp.asarray(reg),
                                   jnp.asarray(oot)))
    got = got / got[oot].mean()
    np.testing.assert_allclose(got[oot], 1.0, atol=1e-5)
    np.testing.assert_allclose(got[~oot], 0.98, atol=1e-4)  # dip intact
    # 2-D path matches per-channel application
    two = np.stack([flux, flux * 0.5], axis=1)
    g2 = np.asarray(shift_detrend(jnp.asarray(two), jnp.asarray(reg),
                                  jnp.asarray(oot)))
    np.testing.assert_allclose(g2[:, 0], np.asarray(shift_detrend(
        jnp.asarray(flux), jnp.asarray(reg), jnp.asarray(oot))), rtol=1e-6)


def test_dispersion_centroid_affine_in_shift():
    deltas = np.linspace(-0.4, 0.4, 9)
    s, xw = _analytic_spectra(deltas)
    cen = np.asarray(dispersion_centroid(jnp.asarray(s), xw))
    fit = np.polyfit(deltas, cen, 1)
    resid = cen - np.polyval(fit, deltas)
    assert np.abs(resid).max() < 1e-3, resid          # affine to <0.001 px


@pytest.mark.slow
def test_reduce_visit_align_closes_drift_loop():
    """Noise-free scanned visit with a 0.5 px linear pointing drift:
    align=True recovers the drift series and cuts the channel-depth
    systematic it causes."""
    S, NL, NSAMP, n_exp = 128, 64, 4, 40
    cfg = ExposureStatic(subarray=S, n_lambda=NL, n_sub=4, nsamp=NSAMP,
                         samp_seq="SPARS10", scan=True,
                         noise=NoiseFlags.none(), band_px=48)
    tables = synthetic_tables("G141", subarray=S, n_lambda=NL,
                              samp_seq="SPARS10", nsamp=NSAMP)
    # flat transmission spectrum: any per-channel depth error is then
    # pure systematics (example_scene's default rp carries a +-0.002
    # wiggle that would swamp the drift signal being measured)
    base = dataclasses.replace(
        example_scene(NL, scan_speed=1.0), y_ref=jnp.float32(30.0),
        rp_over_rs=jnp.full((NL,), 0.1595, jnp.float32))
    starts = np.linspace(0.0, 4.0 * 3600.0, n_exp)
    drift = np.linspace(0.0, 0.5, n_exp).astype(np.float32)
    scenes = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n_exp,) + x.shape), base)
    keys = jax.vmap(lambda i: jax.random.fold_in(
        jax.random.PRNGKey(0), i))(jnp.arange(n_exp))
    scenes = dataclasses.replace(
        scenes, exp_start_s=jnp.asarray(starts, jnp.float32), key=keys,
        x_ref=jnp.float32(30.0) + jnp.asarray(drift))
    out = simulate_visit(scenes, tables, cfg, chunk=8)
    mid = jnp.asarray(starts + float(tables.read_times[-1]) / 2.0,
                      jnp.float32)
    kw = dict(y_window=(20, 75), x_window=(72, 126), bg_rows=(100, 126),
              n_chan=6)
    red0 = reduce_visit(out.reads_dn, tables.gain, mid, base.orbit, **kw)
    red1 = reduce_visit(out.reads_dn, tables.gain, mid, base.orbit,
                        align=True, **kw)

    # the profile fit carries a ~0.03 px nonlinear systematic from the
    # sub-pixel flux cliff at the window's blue edge — which is exactly
    # why the detrend regressor is the centroid, not these values
    got = np.asarray(red1.x_shifts)
    np.testing.assert_allclose(got - got.mean(), drift - drift.mean(),
                               atol=0.035)
    assert np.allclose(np.asarray(red0.x_shifts), 0.0)

    rp = jnp.float32(0.1595)
    err = {}
    for name, red in (("raw", red0), ("aligned", red1)):
        rp_hat, _ = fit_depths(red.channel_lc, mid, base.orbit, base.ld,
                               jnp.float32(0.15))
        err[name] = np.abs(np.asarray(rp_hat) - float(rp)).max()
    # noise-free: the residual channel-depth error is pure drift
    # systematic; centroid decorrelation must remove most of it
    # (measured: 2.9e-4 -> 3.8e-5, a 7.6x cut, worst channel = the
    # blue-edge channel where the drift leak is steepest)
    assert err["aligned"] < 0.3 * err["raw"], err
    assert err["aligned"] < 1e-4, err


def test_clean_drift_regressor_iv_property():
    """clean_drift_regressor cannot eat polynomial drift: for cen =
    poly(t) + B @ gamma, the instrumented estimate recovers gamma
    EXACTLY (the instrument is orthogonal to the poly span by
    construction), so the cleaned series equals the poly part — for any
    contamination amplitude, including ones far larger than the drift."""
    from wayne_tpu.reduction import clean_drift_regressor, transit_drift_basis

    n = 48
    mid = jnp.asarray(np.linspace(0.0, 4 * 3600.0, n), jnp.float32)
    base = example_scene(64)
    B = transit_drift_basis(mid, base.orbit, base.ld, 0.1595)
    assert B.shape == (n, 4)
    assert float(jnp.abs(B[:, 0]).max()) > 1e-3   # transit is in the visit

    t = np.linspace(-1.0, 1.0, n)
    drift = 0.2 * t + 0.05 * t**2                  # smooth pointing drift
    rng = np.random.default_rng(3)
    gamma = rng.normal(size=4).astype(np.float32)  # O(1) x column norms
    Bn = np.asarray(B) / np.linalg.norm(np.asarray(B), axis=0)
    cen = drift + Bn @ gamma
    cleaned = np.asarray(clean_drift_regressor(
        jnp.asarray(cen, jnp.float32), B, mid))
    # affine recovery of the drift: contamination removed to f32 noise
    resid = cleaned - np.polyval(np.polyfit(t, cleaned, 2), t)
    assert np.abs(resid).max() < 5e-5, resid


def test_reduce_visit_model_align_chromatic_transit():
    """The full loop on the hard case: chromatic transit + pointing
    drift. The white-dip-projected centroid (no ld) leaves a
    dLC/drp-shaped regressor excursion that biases the window-edge
    channels; the model-basis clean (ld given) removes it. Depth errors
    are measured against the SAME visit reduced drift-free, so the
    assertion isolates exactly what alignment adds/removes."""
    S, NL, NSAMP, n_exp = 128, 64, 4, 40
    cfg = ExposureStatic(subarray=S, n_lambda=NL, n_sub=4, nsamp=NSAMP,
                         samp_seq="SPARS10", scan=True,
                         noise=NoiseFlags.none(), band_px=48)
    tables = synthetic_tables("G141", subarray=S, n_lambda=NL,
                              samp_seq="SPARS10", nsamp=NSAMP)
    wl = np.asarray(tables.wl_centers)
    # strong chromaticity so the regressor's transit contamination
    # dominates the ~1e-4 rp floor set by the centroid's (real,
    # drift-nonlinear) response through the window-edge flux cliff
    rp_inj = (0.1595 + 0.008 * np.sin(8.0 * wl)).astype(np.float32)
    base = dataclasses.replace(
        example_scene(NL, scan_speed=1.0), y_ref=jnp.float32(30.0),
        rp_over_rs=jnp.asarray(rp_inj))
    starts = np.linspace(0.0, 4.0 * 3600.0, n_exp)
    drift = np.linspace(0.0, 0.4, n_exp).astype(np.float32)
    scenes = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n_exp,) + x.shape), base)
    keys = jax.vmap(lambda i: jax.random.fold_in(
        jax.random.PRNGKey(0), i))(jnp.arange(n_exp))
    scenes = dataclasses.replace(
        scenes, exp_start_s=jnp.asarray(starts, jnp.float32), key=keys)
    ref = simulate_visit(
        dataclasses.replace(
            scenes, x_ref=jnp.full((n_exp,), 30.0, jnp.float32)),
        tables, cfg, chunk=8)
    dr = simulate_visit(
        dataclasses.replace(scenes,
                            x_ref=jnp.float32(30.0) + jnp.asarray(drift)),
        tables, cfg, chunk=8)
    mid = jnp.asarray(starts + float(tables.read_times[-1]) / 2.0,
                      jnp.float32)
    kw = dict(y_window=(20, 75), x_window=(72, 126), bg_rows=(100, 126),
              n_chan=6)

    def depths(reads, **extra):
        red = reduce_visit(reads, tables.gain, mid, base.orbit,
                           **kw, **extra)
        rp_hat, _ = fit_depths(red.channel_lc, mid, base.orbit, base.ld,
                               jnp.float32(0.15))
        return np.asarray(rp_hat)

    rp_ref = depths(ref.reads_dn)                    # drift-free truth
    err = {
        "raw": depths(dr.reads_dn),
        "white": depths(dr.reads_dn, align=True),
        "model": depths(dr.reads_dn, align=True, ld=base.ld,
                        rp0=jnp.float32(0.155)),
    }
    err = {k: np.abs(v - rp_ref).max() for k, v in err.items()}
    # the model-basis clean must beat the white-projection fallback
    # (whose dLC/drp-shaped residual scales with the chromaticity) and
    # land at the method's floor regardless of the chromatic amplitude
    assert err["model"] < 0.6 * err["white"], err
    assert err["model"] < 2e-4, err


def test_drift_regressor_immune_to_chromatic_transit():
    """A chromatic transit tilts the in-transit spectrum and moves the
    raw centroid; feeding that to shift_detrend corrupts the recovered
    depths (the regressor's transit-shaped excursion gets 'corrected'
    out of the light curves). drift_regressor projects the white-dip
    component out, keeping the depths intact while still removing the
    pointing-drift leak."""
    from wayne_tpu.reduction import drift_regressor

    n, n_chan = 48, 8
    x = np.arange(128, dtype=np.float64)
    x0, x1 = 8, 104
    xw = (x0, x1)

    def ref(xx):
        env = np.exp(-0.5 * ((xx - 55.0) / 30.0) ** 2)
        return 1000.0 * env

    drift = np.linspace(0.0, 0.4, n)
    # smooth box transit with ingress/egress ramps
    phase = np.zeros(n)
    phase[14:34] = 1.0
    phase[12:14] = [0.3, 0.7]
    phase[34:36] = [0.7, 0.3]
    dip = 0.0256 * phase
    # chromatic tilt: depth varies 40% across the window
    chroma = 1.0 + 0.4 * np.sin(2.0 * np.pi * (x - x0) / (x1 - x0))
    spectra = np.stack([
        ref(x - d) * (1.0 - dp * chroma) for d, dp in zip(drift, dip)])
    spectra[:, :x0] = 0.0
    spectra[:, x1:] = 0.0
    spectra = spectra.astype(np.float32)
    oot = phase == 0.0

    sj = jnp.asarray(spectra)
    oot_j = jnp.asarray(oot)
    white_flux = sj[:, x0:x1].sum(axis=1)
    edges = np.linspace(x0, x1, n_chan + 1).astype(int)
    chan_flux = jnp.stack([sj[:, lo:hi].sum(axis=1)
                           for lo, hi in zip(edges[:-1], edges[1:])], axis=1)

    cen = np.asarray(dispersion_centroid(sj, xw))
    reg = np.asarray(drift_regressor(sj, xw, white_flux, oot_j))
    # the raw centroid carries a transit-correlated excursion; the
    # orthogonalised regressor does not (fit drift out, compare resid)
    def detrended_resid(r):
        c = np.polyfit(drift[oot], r[oot], 1)
        return r - np.polyval(c, drift)
    exc_raw = np.abs(detrended_resid(cen)[~oot]).max()
    exc_reg = np.abs(detrended_resid(reg)[~oot]).max()
    assert exc_raw > 0.01, exc_raw           # the failure mode is real
    assert exc_reg < 0.1 * exc_raw, (exc_raw, exc_reg)

    # recovered per-channel depths: detrend with each regressor
    inj = np.array([
        (ref(x[lo:hi]) * 0.0256 * chroma[lo:hi]).sum()
        / ref(x[lo:hi]).sum()
        for lo, hi in zip(edges[:-1], edges[1:])])

    def depths(r):
        corr = np.asarray(shift_detrend(chan_flux, jnp.asarray(r),
                                        oot_j))
        norm = corr / corr[oot].mean(axis=0)
        return 1.0 - norm[phase == 1.0].mean(axis=0)

    err_raw = np.abs(depths(jnp.asarray(cen)) - inj).max()
    err_reg = np.abs(depths(jnp.asarray(reg)) - inj).max()
    assert err_reg < 0.2 * err_raw, (err_raw, err_reg)
    assert err_reg < 3e-4, err_reg
