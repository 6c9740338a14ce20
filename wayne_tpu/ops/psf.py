"""Pixel-integrated Gaussian PSF math, static and scan-moving.

The reference deposits each wavelength bin's counts into detector rows via
erf differences over pixel edges (reference: wayne/exposure_generator.py
PSF pixel-splat using scipy.special.erf), looping in Python over temporal
subsamples so the scan motion is approximated by many static splats.

Here the time integral of a uniformly moving Gaussian is closed-form:
the time average of erf((y - c(t)) / (sigma sqrt(2))) over a linear center
path c(t): c0 -> c1 equals

    [F(u0) - F(u1)] / (u0 - u1),   F(u) = u erf(u) + exp(-u^2)/sqrt(pi),

with u_i = (y - c_i) / (sigma sqrt(2)). So a constant-rate scan segment
needs NO subsample loop at all — the big algorithmic win over the
reference (SURVEY.md section 7.5). Subsegments are only needed to track
flux *variation* in time (light curve, scan-speed variations), at a far
coarser cadence than the reference's move-less-than-a-pixel rule.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import erf

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_PI = 0.5641895835477563


def ierf(x: jnp.ndarray) -> jnp.ndarray:
    """Antiderivative of erf: F(x) = x*erf(x) + exp(-x^2)/sqrt(pi)."""
    return x * erf(x) + jnp.exp(-x * x) * _INV_SQRT_PI


def pixel_fractions_static(y_edges: jnp.ndarray, center: jnp.ndarray,
                           sigma: jnp.ndarray) -> jnp.ndarray:
    """Fraction of a unit Gaussian falling in each pixel.

    Args:
      y_edges: (..., S+1) pixel edge coordinates.
      center, sigma: broadcastable against y_edges[..., 0].

    Returns:
      (..., S) per-pixel fractions: 0.5*[erf(hi) - erf(lo)].
    """
    u = (y_edges - center[..., None]) * (_INV_SQRT2 / sigma[..., None])
    e = erf(u)
    return 0.5 * (e[..., 1:] - e[..., :-1])


def mean_erf_moving(u0: jnp.ndarray, du: jnp.ndarray) -> jnp.ndarray:
    """Path-average of erf(u) as u sweeps linearly from u0 to u0 - du.

    Two branches, both accurate to ~1e-6 absolute in fp32:
      - |du| >= 0.3: exact antiderivative difference (cancellation error
        ~ eps * |u| / du stays below ~2e-6);
      - |du| <  0.3: Simpson's rule on erf (error ~ |erf''''| du^4 / 2880
        < 1e-5 * du^4), immune to cancellation as du -> 0.
    """
    small = jnp.abs(du) < 0.3
    du_safe = jnp.where(small, 1.0, du)
    u1 = u0 - du
    e0, e1 = erf(u0), erf(u1)
    f0 = u0 * e0 + jnp.exp(-u0 * u0) * _INV_SQRT_PI
    f1 = u1 * e1 + jnp.exp(-u1 * u1) * _INV_SQRT_PI
    exact = (f0 - f1) / du_safe
    simpson = (e0 + 4.0 * erf(u0 - 0.5 * du) + e1) / 6.0
    return jnp.where(small, simpson, exact)


def pixel_fractions_moving(y_edges: jnp.ndarray, c0: jnp.ndarray,
                           c1: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Time-averaged per-pixel fractions for a Gaussian moving c0 -> c1.

    The center moves uniformly in time, so the time average equals the
    path average. Shapes follow :func:`pixel_fractions_static`.

    Returns (..., S) fractions; multiplying by total counts gives the
    exact time-integrated charge deposit of the scan segment.
    """
    inv = _INV_SQRT2 / sigma[..., None]
    u0 = (y_edges - c0[..., None]) * inv
    du = ((c1 - c0) * (_INV_SQRT2 / sigma))[..., None]
    m = mean_erf_moving(u0, jnp.broadcast_to(du, u0.shape))
    return 0.5 * (m[..., 1:] - m[..., :-1])


def pixel_fractions_moving_path(y_edges: jnp.ndarray, centers: jnp.ndarray,
                                sigma: jnp.ndarray) -> jnp.ndarray:
    """Per-segment time-averaged fractions along a piecewise-linear path.

    The K subsegments of a read interval share their interior nodes
    (segment k ends where k+1 starts), so the transcendentals are
    evaluated ONCE per node — one erf + one exp per (node, bin, edge) —
    instead of three erf + two exp per (segment, bin, edge) as K
    independent :func:`pixel_fractions_moving` calls would. The small-du
    branch uses the endpoint-corrected trapezoid
        mean = (e0 + e1)/2 - du^2/12 * avg(erf''),
    erf''(u) = -(4/sqrt(pi)) u exp(-u^2), reusing the node exp values;
    its error is ~du^4 |erf''''|/96 (endpoint-averaged curvature), so
    the branch point sits at 0.15 (~3e-5) instead of Simpson's 0.3; the
    exact-antiderivative branch's fp32 cancellation at du = 0.15 stays
    ~1e-5.

    NOTE: measured ~1.8x SLOWER than K pixel_fractions_moving calls under
    the batched visit vmap on TPU v5e — the offset-sliced ([:-1]/[1:])
    reuse of the node arrays defeats XLA elementwise fusion, and
    transcendentals are nearly free on the VPU. Kept for callers with
    large K or as a fusion-behaviour probe; the exposure kernel uses the
    per-segment form.

    Args:
      y_edges: (..., S+1) pixel edges.
      centers: (K+1, ...) Gaussian-center positions at the path nodes.
      sigma: (...) per-bin widths.

    Returns:
      (K, ..., S) per-segment fractions.
    """
    inv = _INV_SQRT2 / sigma[..., None]                    # (..., 1)
    u = (y_edges[None] - centers[..., None]) * inv         # (K+1, ..., S+1)
    e = erf(u)
    g = jnp.exp(-u * u)
    F = u * e + g * _INV_SQRT_PI
    u0, u1 = u[:-1], u[1:]
    e0, e1 = e[:-1], e[1:]
    du = u0 - u1                                           # (K, ..., S+1)
    small = jnp.abs(du) < 0.15
    du_safe = jnp.where(small, 1.0, du)
    exact = (F[:-1] - F[1:]) / du_safe
    avg_fpp = (-2.0 * 2.0 * _INV_SQRT_PI) * 0.5 * (u0 * g[:-1] + u1 * g[1:])
    trap = 0.5 * (e0 + e1) - (du * du) * (1.0 / 12.0) * avg_fpp
    m = jnp.where(small, trap, exact)
    return 0.5 * (m[..., 1:] - m[..., :-1])
