"""Starspots: crossing bumps + chromatic depth dilution (beyond the
reference, which models an immaculate star).

Active-star WFC3 programs (HD 189733 b is the classic case) fight two
spot effects the reference cannot simulate:

  * **unocculted spots** dim the star without touching the planet, so
    every transit depth is diluted by 1/(1 - spot deficit) — and the
    deficit is chromatic (spots are cooler -> darker in the blue), which
    imprints a false slope on the transmission spectrum;
  * **occulted spots** (the planet crossing a dark spot) put a bump in
    the in-transit light curve whose amplitude again depends on
    wavelength through the spot contrast.

Model (small-spot approximation, the standard for r_spot <~ 0.2 R_*):
each spot is a circular patch at stellar latitude/longitude with a
per-wavelength surface-brightness contrast c(lambda) = B(lambda, T_spot)
/ B(lambda, T_eff) (or user-fixed). Its projected shape is a disk of
radius r*sqrt(mu) (area-exact foreshortening) at sky position
(cos(lat) sin(lon), sin(lat)); the local limb-darkened intensity is
evaluated at the spot center. Stellar rotation optionally advances the
longitudes through the visit (lon(t) = lon0 + omega_rot * t), so spots
rotate onto/off the visible disk exactly as on a real star.

The additive flux delta relative to ops/transit.transit_light_curve's
immaculate-star curve is closed form — no quadrature, fully
differentiable (retrieval can fit spot parameters through the
simulator), and costs O(n_spots * NT * NL) VPU flops: invisible next
to the exposure kernel.

Flux accounting (normalised units where the immaculate disk flux is
claret_total_flux(ld), the convention of ops/transit.py):

  F(t, lam) = F_transit(t, lam)
              - sum_s  vis_s(t) * r_s^2 mu_s(t) * I(mu_s, lam) * (1 - c_s)
                       / F_tot                     [unocculted dimming]
              + sum_s  in_front(t) * vis_s(t)
                       * A_lens(d_ps; p, r_s sqrt(mu_s)) / pi
                       * I(mu_s, lam) * (1 - c_s) / F_tot
                                                   [crossing recovery]

The recovery term is exact within the small-spot approximation: the
planet's occultation integral already removed photospheric intensity
over its whole disk, but the overlap area was spot surface emitting
c_s * I — the difference comes back.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from wayne_tpu.ops.kepler import OrbitParams, sky_position
from wayne_tpu.ops.transit import claret_intensity, claret_total_flux


from wayne_tpu.pytree import register as _register


@_register
@dataclass
class SpotParams:
    """Starspot set of one visit (pytree; all leaves jnp arrays).

    The stellar spin axis is taken along sky +y (the same axis the
    transit chord's impact parameter is measured on, kepler.sky_position),
    i.e. zero projected obliquity; latitudes are in [-pi/2, pi/2],
    longitude 0 faces the observer at t = 0.
    """

    lat_rad: jnp.ndarray     # (NS,) spot center latitude
    lon_rad: jnp.ndarray     # (NS,) spot center longitude at t = 0
    radius: jnp.ndarray      # (NS,) spot angular radius (stellar radii)
    contrast: jnp.ndarray    # (NS, NL) spot/photosphere surface-brightness
    #                          ratio per wavelength bin (1 = invisible,
    #                          0 = black)
    rot_omega: jnp.ndarray   # scalar stellar rotation rate (rad/s);
    #                          0 = static spots

    @classmethod
    def create(cls, lat_rad, lon_rad, radius, contrast, rot_omega=0.0):
        f32 = lambda v: jnp.asarray(v, jnp.float32)
        return cls(f32(lat_rad), f32(lon_rad), f32(radius), f32(contrast),
                   f32(rot_omega))


def circle_overlap_area(d: jnp.ndarray, r1: jnp.ndarray,
                        r2: jnp.ndarray) -> jnp.ndarray:
    """Area of the intersection of two disks (lens area), branch-free.

    The clamped closed form covers all three regimes without lax.cond:
    disjoint (d >= r1 + r2) -> both arccos args clip to 1 and the
    triangle root to 0; contained (d <= |r1 - r2|) -> the smaller
    disk's arccos clips to pi and the result is its full area;
    otherwise the classic two-circular-segment formula. Differentiable
    everywhere the area actually varies (the clips only flatten the
    constant regimes, where dA = 0 is correct).
    """
    d = jnp.maximum(d, 1e-7)
    r1 = jnp.maximum(r1, 1e-7)
    r2 = jnp.maximum(r2, 1e-7)
    # epsilon-margined clips: arccos'(+-1) and sqrt'(0) are infinite, and
    # clip-then-evaluate turns the flat regimes' 0 * inf into NaN under
    # autodiff (the transit quadrature uses the same guard). The where
    # on the root fully detaches the disjoint/contained branches.
    eps = 1e-7
    c1 = jnp.clip((d * d + r1 * r1 - r2 * r2) / (2.0 * d * r1),
                  -1.0 + eps, 1.0 - eps)
    c2 = jnp.clip((d * d + r2 * r2 - r1 * r1) / (2.0 * d * r2),
                  -1.0 + eps, 1.0 - eps)
    s = ((r1 + r2 - d) * (d + r1 - r2) * (d - r1 + r2) * (d + r1 + r2))
    root = jnp.where(s > 0.0, jnp.sqrt(jnp.where(s > 0.0, s, 1.0)), 0.0)
    area = (r1 * r1 * jnp.arccos(c1) + r2 * r2 * jnp.arccos(c2)
            - 0.5 * root)
    # exact flat regimes (the margined arccos leaves ~1e-4 residue there)
    area = jnp.where(d >= r1 + r2, 0.0, area)
    rmin = jnp.minimum(r1, r2)
    area = jnp.where(d <= jnp.abs(r1 - r2), jnp.pi * rmin * rmin, area)
    return area


def spot_positions(times: jnp.ndarray, spots: SpotParams
                   ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sky positions + foreshortening of every spot at every time.

    Returns (x_s, y_s, mu_s), each (NT, NS). mu_s <= 0 means the spot is
    on the far hemisphere (invisible); callers weight by max(mu, 0).
    """
    lon = spots.lon_rad[None, :] + spots.rot_omega * times[:, None]
    cos_lat = jnp.cos(spots.lat_rad)[None, :]
    x = cos_lat * jnp.sin(lon)
    y = jnp.broadcast_to(jnp.sin(spots.lat_rad)[None, :], x.shape)
    mu = cos_lat * jnp.cos(lon)
    return x, y, mu


def spot_delta(times: jnp.ndarray, orbit: OrbitParams,
               rp_over_rs: jnp.ndarray, ld: jnp.ndarray,
               spots: SpotParams) -> jnp.ndarray:
    """Additive flux delta of the spot set: (NT, NL).

    ``rp_over_rs``: (NL,) per-channel planet radius (the crossing
    recovery uses each channel's own radius). ``ld``: (4,) shared or
    (NL, 4) per-channel Claret coefficients. Add the result to
    transit_light_curve's immaculate-star flux.
    """
    xs, ys, mu = spot_positions(times, spots)          # (NT, NS)
    vis_mu = jnp.maximum(mu, 0.0)
    visible = (mu > 0.0).astype(xs.dtype)

    # local normalised intensity I(mu_s)/F_tot: (NT, NS) or (NT, NS, NL)
    if ld.ndim == 2:                                   # per-channel LD
        inten = jax.vmap(lambda ldc: claret_intensity(vis_mu, ldc)
                         / claret_total_flux(ldc),
                         in_axes=0, out_axes=-1)(ld)   # (NT, NS, NL)
    else:
        inten = (claret_intensity(vis_mu, ld)
                 / claret_total_flux(ld))[..., None]   # (NT, NS, 1)

    one_minus_c = (1.0 - spots.contrast)[None, :, :]   # (1, NS, NL)

    # unocculted dimming: projected spot area * local intensity deficit
    dim = (spots.radius[None, :] ** 2 * vis_mu)[..., None] * inten

    # crossing recovery: lens overlap of the planet disk with the
    # foreshortened spot disk, per channel radius
    xp, yp, in_front = sky_position(times, orbit)      # (NT,)
    d = jnp.hypot(xp[:, None] - xs, yp[:, None] - ys)  # (NT, NS)
    r_spot = spots.radius[None, :] * jnp.sqrt(vis_mu)  # (NT, NS)
    lens = circle_overlap_area(d[..., None],
                               rp_over_rs[None, None, :],
                               r_spot[..., None])      # (NT, NS, NL)
    rec = in_front[:, None, None] * lens / jnp.pi * inten

    delta = (visible[..., None] * one_minus_c * (rec - dim)).sum(axis=1)
    return delta
