"""Dispersion geometry tests: trace round-trips, deposit matrix, flat."""

import jax.numpy as jnp
import numpy as np

from wayne_tpu.calibration import synthetic_tables
from wayne_tpu.ops.dispersion import (
    flat_plane, trace_params, trace_y, wl_to_x, x_deposit_matrix, x_to_wl,
)

TABLES = synthetic_tables("G141", subarray=128, n_lambda=64, nsamp=5)
TP = trace_params(TABLES, jnp.float32(40.0), jnp.float32(64.0))


def test_wavelength_pixel_roundtrip():
    wl = jnp.linspace(1.1, 1.65, 33)
    x = wl_to_x(wl, TP)
    back = x_to_wl(x, TP)
    np.testing.assert_allclose(np.asarray(back), np.asarray(wl), rtol=1e-5)


def test_dispersion_magnitude_matches_axe_value():
    # G141: ~45 A/px -> 0.0045 um/px at field center (SURVEY.md section 8).
    x1 = wl_to_x(jnp.float32(1.2), TP)
    x2 = wl_to_x(jnp.float32(1.2 + 0.00465), TP)
    assert 0.8 < float(x2 - x1) < 1.2   # about one pixel per 46.5 A


def test_trace_slope_is_small():
    y1 = trace_y(jnp.float32(0.0), TP)
    y2 = trace_y(jnp.float32(100.0), TP)
    slope = float(y2 - y1) / 100.0
    assert abs(slope) < 0.05            # near-horizontal trace


def test_deposit_matrix_rows_sum_to_one_on_detector():
    tab = TABLES
    x_edges = wl_to_x(tab.wl_edges, TP)
    X = x_deposit_matrix(x_edges, 128)
    sums = np.asarray(X.sum(axis=1))
    on_det = (np.asarray(x_edges[:-1]) > 1) & (np.asarray(x_edges[1:]) < 126)
    np.testing.assert_allclose(sums[on_det], 1.0, atol=1e-5)
    assert np.all(sums <= 1.0 + 1e-5)


def test_deposit_matrix_reversed_edges():
    edges = jnp.array([10.3, 9.1, 7.9])   # decreasing dispersion
    X = x_deposit_matrix(edges, 16)
    np.testing.assert_allclose(np.asarray(X.sum(axis=1)), 1.0, atol=1e-6)


def test_deposit_matrix_degenerate_bins_keep_flux():
    """f32 bin edges that coincide (the imaging_tables 'undispersed'
    encoding collapses all bins onto x_ref) must deposit as POINT
    sources, not zero rows — 48% of direct-image flux silently vanished
    at x_ref ~ 256 (regression, confirmed by execution)."""
    import jax.numpy as jnp

    from wayne_tpu.ops.dispersion import x_deposit_matrix

    # 65 edges all within 1e-6 px of column 256: every bin degenerate
    edges = jnp.asarray(256.0 + np.linspace(0, 1e-6, 65), jnp.float32)
    X = np.asarray(x_deposit_matrix(edges, 512))
    np.testing.assert_allclose(X.sum(axis=1), 1.0, atol=1e-6)
    assert np.all(X[:, 256] == 1.0)          # all flux in the containing px


def test_flat_plane_shape_and_range():
    fp = flat_plane(TABLES, TP)
    assert fp.shape == (128, 128)
    arr = np.asarray(fp)
    assert 0.8 < arr.mean() < 1.2
    assert arr.std() < 0.1


def test_gaussian_x_deposit_conserves_and_blurs():
    from wayne_tpu.ops.dispersion import x_deposit_matrix_gaussian
    edges = jnp.linspace(20.0, 60.0, 17)          # 16 bins, 2.5px each
    sigma = jnp.full((16,), 0.7)
    Xg = x_deposit_matrix_gaussian(edges, 128, sigma)
    Xb = x_deposit_matrix(edges, 128)
    # conserved (interior bins)
    np.testing.assert_allclose(np.asarray(Xg.sum(axis=1)), 1.0, atol=1e-4)
    # blurred: smaller peak, larger support than the box
    assert float(Xg.max()) < float(Xb.max())
    assert (np.asarray(Xg[8]) > 1e-4).sum() > (np.asarray(Xb[8]) > 1e-4).sum()
    # brute-force check for one bin: uniform source conv Gaussian
    lo, hi = float(edges[8]), float(edges[9])
    cs = np.linspace(lo, hi, 3001)
    from scipy.special import erf as serf
    u = (np.arange(129) - 0.5 - cs[:, None]) / (np.sqrt(2) * 0.7)
    want = 0.5 * np.diff(serf(u), axis=1).mean(axis=0)
    # fp32 antiderivative differences leave ~7e-5 crumbs in far tails
    np.testing.assert_allclose(np.asarray(Xg[8]), want, atol=1.5e-4)


def test_x_psf_flag_in_kernel():
    import dataclasses
    from wayne_tpu.calibration import synthetic_tables
    from wayne_tpu.config import ExposureStatic, NoiseFlags
    from wayne_tpu.ops.exposure import simulate_exposure
    from wayne_tpu.scene import example_scene
    tables = synthetic_tables("G141", subarray=128, n_lambda=64, nsamp=2)
    scene = example_scene(64, scan_speed=0.0)
    # a strong emission-line spike makes the x blur observable
    flux = np.asarray(scene.stellar_flux).copy()
    flux[14] *= 50.0    # lands at x~75, on-detector
    scene = dataclasses.replace(scene, x_ref=jnp.float32(30.0),
                                y_ref=jnp.float32(60.0),
                                stellar_flux=jnp.asarray(flux, jnp.float32))
    mk = lambda xp: ExposureStatic(subarray=128, n_lambda=64, n_sub=2,
                                   nsamp=2, samp_seq="RAPID", scan=False,
                                   noise=NoiseFlags.none(), x_psf=xp)
    sharp = simulate_exposure(scene, tables, mk(False)).ideal_e
    blurred = simulate_exposure(scene, tables, mk(True)).ideal_e
    # G141's spectrum overhangs the 128px detector; the x blur moves
    # ~0.3% of flux across the edge cut, so totals agree only to that.
    np.testing.assert_allclose(float(blurred.sum()), float(sharp.sum()),
                               rtol=7e-3)
    # the line spike's column peak drops under x blur
    col_profile_sharp = np.asarray(sharp).sum(axis=0)
    col_profile_blur = np.asarray(blurred).sum(axis=0)
    assert col_profile_blur.max() < 0.95 * col_profile_sharp.max()
