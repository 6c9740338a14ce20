"""Grism dispersion geometry: trace, wavelength solution, x-deposit, flat.

Implements the aXe field-dependent trace formalism used by the reference
(reference: wayne/grism.py :: Grism.get_trace / wl_to_x / x_to_wl):
given a direct-image position the +1st-order spectrum follows a straight
trace with field-dependent slope/intercept, and wavelength maps linearly
to path length along the trace. All functions are scalar-poly evaluations
and tiny matrix builds — traced into the exposure kernel so pointing
drift vmaps across exposures for free.

Coordinate convention: pixel index p covers [p - 0.5, p + 0.5] on both
axes; x_ref / y_ref are given in *subarray* pixel coordinates and shifted
to full-frame coordinates (where the aXe polynomials live) internally.
"""

from __future__ import annotations

from dataclasses import dataclass, fields

import jax
import jax.numpy as jnp

from wayne_tpu.calibration import Tables, eval_field_poly


def _register(cls):
    names = [f.name for f in fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=names, meta_fields=[])


@_register
@dataclass
class TraceParams:
    """Per-exposure scalar trace solution (pytree of scalars)."""

    x_ref: jnp.ndarray      # subarray coords
    y_ref: jnp.ndarray
    dy0: jnp.ndarray        # trace intercept offset at x = x_ref
    slope: jnp.ndarray      # dy/dx along the trace
    wl0: jnp.ndarray        # wavelength at zero path length (micron)
    dwl: jnp.ndarray        # dispersion (micron per px of path length)
    inv_cos: jnp.ndarray    # sqrt(1 + slope^2): path length per unit dx


def trace_params(tables: Tables, x_ref: jnp.ndarray, y_ref: jnp.ndarray) -> TraceParams:
    """Evaluate the field-dependent trace at a (subarray) reference position."""
    xf = x_ref + tables.subarray_corner[0]
    yf = y_ref + tables.subarray_corner[1]
    dy0 = eval_field_poly(tables.dydx0, xf, yf)
    slope = eval_field_poly(tables.dydx1, xf, yf)
    wl0 = eval_field_poly(tables.dldp0, xf, yf)
    dwl = eval_field_poly(tables.dldp1, xf, yf)
    inv_cos = jnp.sqrt(1.0 + slope * slope)
    return TraceParams(x_ref=x_ref, y_ref=y_ref, dy0=dy0, slope=slope,
                       wl0=wl0, dwl=dwl, inv_cos=inv_cos)


def wl_to_x(wl: jnp.ndarray, tp: TraceParams) -> jnp.ndarray:
    """Wavelength -> x (subarray px): invert the linear wavelength solution."""
    path = (wl - tp.wl0) / tp.dwl
    return tp.x_ref + path / tp.inv_cos


def x_to_wl(x: jnp.ndarray, tp: TraceParams) -> jnp.ndarray:
    """x (subarray px) -> wavelength (micron)."""
    path = (x - tp.x_ref) * tp.inv_cos
    return tp.wl0 + path * tp.dwl


def trace_y(x: jnp.ndarray, tp: TraceParams) -> jnp.ndarray:
    """Trace centre row at column x."""
    return tp.y_ref + tp.dy0 + tp.slope * (x - tp.x_ref)


def x_deposit_matrix(x_edges: jnp.ndarray, n_pix: int) -> jnp.ndarray:
    """Box-overlap deposit of each wavelength bin onto detector columns.

    Args:
      x_edges: (NL+1,) x positions of the wavelength-bin edges (may be
        monotonically decreasing for a reversed dispersion).
      n_pix: number of detector columns S.

    Returns:
      (NL, S) matrix X with X[l, p] = fraction of bin l's counts landing in
      column p (each row sums to 1 for bins fully on the detector). This is
      one factor of the rank-1 splat; the full frame is Y^T (flux * X) — a
      single MXU matmul per scan segment.
    """
    lo = jnp.minimum(x_edges[:-1], x_edges[1:])[:, None]
    hi = jnp.maximum(x_edges[:-1], x_edges[1:])[:, None]
    raw_w = hi - lo
    width = jnp.maximum(raw_w, 1e-9)
    grid = jnp.arange(n_pix, dtype=x_edges.dtype)[None, :]
    overlap = jnp.clip(jnp.minimum(hi, grid + 0.5) - jnp.maximum(lo, grid - 0.5),
                       0.0, None)
    # Degenerate bins (f32 edges coincide or sit ULPs apart — e.g. the
    # imaging_tables 'undispersed' encoding collapses every bin onto
    # x_ref): overlap rounds to 0 while width is floored, silently
    # DROPPING the bin's flux. Deposit such bins as POINT sources into
    # the containing pixel instead — physically exact for boxes far
    # below a pixel.
    centre = 0.5 * (lo + hi)
    point = (jnp.round(centre) == grid).astype(x_edges.dtype)
    eps = 1e-5 * jnp.maximum(jnp.abs(centre), 1.0)   # ~f32 ULP headroom
    return jnp.where(raw_w <= eps, point, overlap / width)


def x_deposit_matrix_gaussian(x_edges: jnp.ndarray, n_pix: int,
                              sigma_x: jnp.ndarray) -> jnp.ndarray:
    """Gaussian-blurred wavelength-bin -> column deposit.

    Physically: each bin's counts are spread uniformly over
    [x_lo, x_hi] AND convolved with the instrument PSF of width
    sigma_x(lambda) in the dispersion direction. The pixel coverage of a
    uniform source convolved with a Gaussian is the path-average of the
    pixel-integrated Gaussian as its centre sweeps lo -> hi — exactly
    :func:`wayne_tpu.ops.psf.pixel_fractions_moving`. sigma_x -> 0
    recovers the pure box overlap of :func:`x_deposit_matrix`.
    """
    from wayne_tpu.ops.psf import pixel_fractions_moving

    lo = jnp.minimum(x_edges[:-1], x_edges[1:])
    hi = jnp.maximum(x_edges[:-1], x_edges[1:])
    pix_edges = jnp.arange(n_pix + 1, dtype=x_edges.dtype) - 0.5
    pix_edges_b = jnp.broadcast_to(pix_edges, (lo.shape[0], n_pix + 1))
    return pixel_fractions_moving(pix_edges_b, lo, hi, sigma_x)


def flat_plane(tables: Tables, tp: TraceParams) -> jnp.ndarray:
    """Wavelength-dependent flat field evaluated at each column's wavelength.

    flat(x, y) = sum_j c_j(x, y) * l(x)^j with l the normalised wavelength
    of column x under the current trace (reference: wayne/grism.py
    wavelength-dependent flat-field cube).
    """
    S = tables.flat_coeffs.shape[-1]
    cols = jnp.arange(S, dtype=tables.wl_edges.dtype)
    wl = x_to_wl(cols, tp)
    wl_min, wl_max = tables.wl_edges[0], tables.wl_edges[-1]
    l = jnp.clip((wl - wl_min) / (wl_max - wl_min), 0.0, 1.0)[None, :]
    c = tables.flat_coeffs
    return c[0] + l * (c[1] + l * (c[2] + l * c[3]))
