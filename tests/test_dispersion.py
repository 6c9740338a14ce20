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


def test_flat_plane_shape_and_range():
    fp = flat_plane(TABLES, TP)
    assert fp.shape == (128, 128)
    arr = np.asarray(fp)
    assert 0.8 < arr.mean() < 1.2
    assert arr.std() < 0.1
