"""Independent fp64 NumPy oracle for the ideal (noise-free) signal path.

This module deliberately re-implements the physics the way the *reference*
does it (reference: wayne/exposure_generator.py): a fine temporal
subsample loop where each step performs a *static* pixel-integrated
Gaussian splat at the instantaneous scan position — the
"scan moves much less than a pixel per step" algorithm. The JAX path uses
closed-form moving-Gaussian integrals instead, so agreement between the
two validates the analytic scan integration, the dispersion geometry and
the splat against an algorithmically independent implementation. It also
doubles as the single-core CPU baseline for bench.py (BASELINE.md's
missing reference measurement).

Everything here is float64 NumPy/SciPy; no JAX imports.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
from scipy.special import erf as _erf


@lru_cache(maxsize=8)
def _leggauss(n: int) -> tuple[np.ndarray, np.ndarray]:
    return np.polynomial.legendre.leggauss(n)

# ---------------------------------------------------------------------------
# Transit: Claret occultation via the same decomposition, fp64 quadrature
# ---------------------------------------------------------------------------

_N_EXP = np.arange(1, 5, dtype=np.float64)


def _intensity(mu: np.ndarray, ld: np.ndarray) -> np.ndarray:
    mu = np.clip(mu, 0.0, 1.0)
    return 1.0 - np.sum(ld * (1.0 - mu[..., None] ** (_N_EXP / 2.0)), axis=-1)


def oracle_transit_flux(z, p, ld, n_quad: int = 2048) -> np.ndarray:
    """Relative flux for projected separation(s) z, radius ratio p (fp64).

    Dense Gauss-Legendre with the sin^2 contact-point substitution; at
    n_quad=2048 this is converged to ~1e-12 and serves as truth for the
    fp32 device quadrature. ``ld`` is (4,) shared Claret coefficients or
    CHROMATIC (..., 4) with leading axes broadcastable against ``z`` —
    the shape the device path's per-channel limb darkening uses
    (observation ld_on_grid '(4,) or (NL, 4)').
    """
    z = np.atleast_1d(np.asarray(z, np.float64))
    p = np.broadcast_to(np.asarray(p, np.float64), z.shape)
    ld = np.broadcast_to(np.asarray(ld, np.float64), z.shape + (4,))

    total = 1.0 - np.sum(ld * _N_EXP / (_N_EXP + 4.0), axis=-1)
    zs = np.maximum(z, 1e-12)
    r_in = np.clip(p - zs, 0.0, 1.0)
    mu_in = np.sqrt(np.clip(1.0 - r_in**2, 0.0, 1.0))
    core = ((1.0 - ld.sum(axis=-1)) * (1.0 - mu_in**2)
            + np.sum(ld * 4.0 / (_N_EXP + 4.0)
                     * (1.0 - mu_in[..., None] ** ((_N_EXP + 4.0) / 2.0)), axis=-1))

    x_gl, w_gl = _leggauss(n_quad)
    s = 0.5 * (x_gl + 1.0)
    w = 0.5 * w_gl
    u = np.sin(0.5 * np.pi * s) ** 2
    du = 0.5 * np.pi * np.sin(np.pi * s)

    r_lo = np.clip(np.abs(zs - p), 0.0, 1.0)
    r_hi = np.clip(zs + p, 0.0, 1.0)
    span = np.maximum(r_hi - r_lo, 0.0)
    r = r_lo[..., None] + span[..., None] * u
    rs = np.maximum(r, 1e-12)
    cos_k = (zs[..., None]**2 + rs**2 - p[..., None]**2) / (2.0 * zs[..., None] * rs)
    kappa = np.arccos(np.clip(cos_k, -1.0, 1.0))
    mu = np.sqrt(np.clip(1.0 - r**2, 0.0, 1.0))
    integrand = _intensity(mu, ld[..., None, :]) * (kappa / np.pi) * 2.0 * r
    annulus = span * np.sum(w * du * integrand, axis=-1)

    occ = np.where((p <= 0.0) | (z >= 1.0 + p), 0.0, core + annulus)
    return 1.0 - occ / total


# ---------------------------------------------------------------------------
# Detector non-linearity (fp64, reference: wayne/detector.py ::
# apply_non_linearity — per-pixel cubic polynomial)
# ---------------------------------------------------------------------------


def oracle_nonlinearity(cum_e: np.ndarray, coeffs: np.ndarray,
                        full_well: float) -> np.ndarray:
    """Measured charge under the per-pixel cubic deficit model (fp64).

    measured = Qc * (1 - (c1 q + c2 q^2 + c3 q^3)), Qc = min(Q, fw),
    q = Qc / fw — the same convention as the device kernels.
    """
    cum_e = np.asarray(cum_e, np.float64)
    c1, c2, c3 = (np.asarray(c, np.float64) for c in coeffs)
    qc = np.minimum(cum_e, full_well)
    q = qc / full_well
    return qc * (1.0 - ((c3 * q + c2) * q + c1) * q)


# ---------------------------------------------------------------------------
# Geometry (fp64 re-implementation of the aXe trace math)
# ---------------------------------------------------------------------------


def _field_poly(c, x, y):
    return c[0] + c[1] * x + c[2] * y + c[3] * x * x + c[4] * x * y + c[5] * y * y


def _trace(tables, x_ref, y_ref):
    xf = x_ref + float(tables.subarray_corner[0])
    yf = y_ref + float(tables.subarray_corner[1])
    c = lambda a: np.asarray(a, np.float64)
    dy0 = _field_poly(c(tables.dydx0), xf, yf)
    slope = _field_poly(c(tables.dydx1), xf, yf)
    wl0 = _field_poly(c(tables.dldp0), xf, yf)
    dwl = _field_poly(c(tables.dldp1), xf, yf)
    return dy0, slope, wl0, dwl, np.sqrt(1.0 + slope * slope)


def oracle_ideal_frame(
    tables,
    cfg,
    *,
    x_ref: float,
    y_ref: float,
    scan_speed: float,
    exp_start_s: float,
    stellar_flux: np.ndarray,
    rp_over_rs: np.ndarray,
    ld: np.ndarray,
    orbit: dict,
    trend_fn=None,
    max_step_px: float = 0.05,
    min_steps_per_read: int = 4,
) -> np.ndarray:
    """Noise-free accumulated source electrons (S, S), reference algorithm.

    ``orbit`` is a dict with keys period_s, t0_s, sma_rs, inc_rad, ecc,
    omega_rad. ``trend_fn(t_in_exposure) -> multiplier`` bundles
    SSV/visit-trend factors (None = off). Circular-orbit z(t) is evaluated
    directly; eccentric orbits use a NumPy Newton solve.
    """
    S = cfg.subarray
    wl_edges = np.asarray(tables.wl_edges, np.float64)
    wl = 0.5 * (wl_edges[:-1] + wl_edges[1:])
    sens = np.asarray(tables.sensitivity, np.float64)
    sigma = np.asarray(tables.psf_sigma, np.float64)
    read_times = np.asarray(tables.read_times, np.float64)

    dy0, slope, wl0, dwl, inv_cos = _trace(tables, x_ref, y_ref)
    x_of = lambda w: x_ref + (w - wl0) / dwl / inv_cos
    x_edges = x_of(wl_edges)
    x_centers = x_of(wl)
    y_base = y_ref + dy0 + slope * (x_centers - x_ref)

    # Column deposit by box overlap (same convention: pixel p = [p-.5, p+.5]).
    lo = np.minimum(x_edges[:-1], x_edges[1:])[:, None]
    hi = np.maximum(x_edges[:-1], x_edges[1:])[:, None]
    grid = np.arange(S)[None, :]
    X = np.clip(np.minimum(hi, grid + 0.5) - np.maximum(lo, grid - 0.5), 0.0, None)
    X /= np.maximum(hi - lo, 1e-12)

    rate0 = (np.asarray(stellar_flux, np.float64) * sens * np.diff(wl_edges))

    def z_of(t_abs):
        e = float(orbit.get("ecc", 0.0))
        om = float(orbit.get("omega_rad", np.pi / 2))
        nu_tr = np.pi / 2 - om
        E_tr = 2.0 * np.arctan(np.sqrt((1 - e) / (1 + e)) * np.tan(0.5 * nu_tr))
        M_tr = E_tr - e * np.sin(E_tr)
        M = M_tr + 2 * np.pi * (t_abs - orbit["t0_s"]) / orbit["period_s"]
        E = M.copy()
        for _ in range(40):
            E = E - (E - e * np.sin(E) - M) / (1 - e * np.cos(E))
        nu = 2.0 * np.arctan(np.sqrt((1 + e) / (1 - e)) * np.tan(0.5 * E))
        r = orbit["sma_rs"] * (1 - e * e) / (1 + e * np.cos(nu))
        sin_wnu = np.sin(om + nu)
        z = r * np.sqrt(np.clip(1 - (sin_wnu * np.sin(orbit["inc_rad"])) ** 2, 0, 1))
        return z, (sin_wnu > 0)

    y_pix_edges = np.arange(S + 1, dtype=np.float64) - 0.5
    frame = np.zeros((S, S), np.float64)
    inv_s2 = 1.0 / (np.sqrt(2.0) * sigma)

    for k in range(cfg.nsamp):
        t_a, t_b = read_times[k], read_times[k + 1]
        n_steps = max(min_steps_per_read,
                      int(np.ceil(abs(scan_speed) * (t_b - t_a) / max_step_px)))
        dt = (t_b - t_a) / n_steps
        for j in range(n_steps):
            t_mid = t_a + (j + 0.5) * dt
            z, front = z_of(np.asarray([exp_start_s + t_mid]))
            lc = oracle_transit_flux(
                np.full_like(wl, z[0]), np.asarray(rp_over_rs, np.float64),
                np.asarray(ld, np.float64))
            if not front[0]:
                lc = np.ones_like(lc)
            factor = 1.0 if trend_fn is None else float(trend_fn(t_mid))
            counts = rate0 * lc * factor * dt            # (NL,)
            y_c = y_base + scan_speed * t_mid            # (NL,)
            u = (y_pix_edges[None, :] - y_c[:, None]) * inv_s2[:, None]
            e = _erf(u)
            Yfrac = 0.5 * (e[:, 1:] - e[:, :-1])          # (NL, S)
            frame += (Yfrac * counts[:, None]).T @ X
    return frame
