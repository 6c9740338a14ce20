"""Keplerian orbit solution in JAX.

Replaces the reference's use of pylightcurve's orbit module
(reference: wayne/exposure_generator.py -> pylightcurve.transit_flux_drop,
which internally solves the Kepler equation per epoch). Here the solve is a
fixed-iteration Newton loop — branch-free, vmappable, TPU-friendly.

Conventions: angles in radians, times in seconds, distances in stellar radii.
"""

from __future__ import annotations

from dataclasses import dataclass, fields

import jax
import jax.numpy as jnp

_NEWTON_ITERS = 12


def _register(cls):
    names = [f.name for f in fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=names, meta_fields=[])


@_register
@dataclass
class OrbitParams:
    """Orbital elements of the transiting planet (pytree of scalars)."""

    period_s: jnp.ndarray       # orbital period
    t0_s: jnp.ndarray           # mid-transit epoch (same clock as exposure times)
    sma_rs: jnp.ndarray         # semi-major axis / stellar radius
    inc_rad: jnp.ndarray        # orbital inclination
    ecc: jnp.ndarray            # eccentricity
    omega_rad: jnp.ndarray      # argument of periastron

    @classmethod
    def create(cls, period_s, t0_s, sma_rs, inc_rad, ecc=0.0, omega_rad=jnp.pi / 2):
        f32 = lambda v: jnp.asarray(v, jnp.float32)
        return cls(f32(period_s), f32(t0_s), f32(sma_rs), f32(inc_rad),
                   f32(ecc), f32(omega_rad))


def eccentric_anomaly(mean_anomaly: jnp.ndarray, ecc: jnp.ndarray) -> jnp.ndarray:
    """Solve Kepler's equation M = E - e sin E by fixed-count Newton iteration.

    A fixed iteration count keeps the program branch-free under jit; 12
    Newton steps from E0 = M + e*sin(M) converge to float32 precision for
    e < 0.95 (transiting-planet regime is e << 0.9).
    """
    M = mean_anomaly
    E = M + ecc * jnp.sin(M)

    def body(_, E):
        f = E - ecc * jnp.sin(E) - M
        fp = 1.0 - ecc * jnp.cos(E)
        return E - f / fp

    return jax.lax.fori_loop(0, _NEWTON_ITERS, body, E)


def true_anomaly(mean_anomaly: jnp.ndarray, ecc: jnp.ndarray) -> jnp.ndarray:
    """True anomaly from mean anomaly."""
    E = eccentric_anomaly(mean_anomaly, ecc)
    beta = jnp.sqrt((1.0 + ecc) / (1.0 - ecc))
    return 2.0 * jnp.arctan(beta * jnp.tan(0.5 * E))


def transit_true_anomaly(t: jnp.ndarray, orbit: OrbitParams
                         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(nu(t), nu_tr): true anomaly over the grid + its mid-transit value.

    The single Kepler solve shared by :func:`orbital_phase_angle` and
    :func:`projected_separation` — t0 anchors the mean anomaly at the
    transit's true anomaly nu_tr = pi/2 - omega.
    """
    e = orbit.ecc
    nu_tr = jnp.pi / 2.0 - orbit.omega_rad
    E_tr = 2.0 * jnp.arctan(jnp.sqrt((1.0 - e) / (1.0 + e)) * jnp.tan(0.5 * nu_tr))
    M_tr = E_tr - e * jnp.sin(E_tr)
    M = M_tr + 2.0 * jnp.pi * (t - orbit.t0_s) / orbit.period_s
    return true_anomaly(M, e), nu_tr


def orbital_phase_angle(t: jnp.ndarray, orbit: OrbitParams) -> jnp.ndarray:
    """True-anomaly-based phase angle: 0 at mid-secondary-eclipse,
    +-pi at mid-transit, increasing with time.

    For circular orbits this equals 2 pi (t - t0)/P - pi; for eccentric
    orbits it tracks the actual orbital position, so thermal phase-curve
    modulation stays aligned with the (eccentricity-shifted) eclipse.
    """
    nu, nu_tr = transit_true_anomaly(t, orbit)
    raw = nu - nu_tr - jnp.pi
    # wrap to (-pi, pi]: true_anomaly's arctan form is branch-cut at +-pi
    return jnp.arctan2(jnp.sin(raw), jnp.cos(raw))


def sky_position(t: jnp.ndarray, orbit: OrbitParams
                 ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sky-plane planet position (x, y) in stellar radii + ``in_front``.

    Coordinates: the star's center is the origin; +x is the direction of
    the planet's motion across the disk at mid-transit; +y is the sky
    projection of the orbit normal, so the transit chord sits at
    y = +b = +a cos(i) (scaled by the eccentric-orbit separation).
    ``hypot(x, y)`` equals :func:`projected_separation`'s ``z`` exactly —
    this is the resolved-vector form of the same geometry, needed by
    consumers that care WHERE on the disk the planet is (starspot
    occultations, ops/spots.py), not just how far from center.
    """
    e = orbit.ecc
    nu, _ = transit_true_anomaly(t, orbit)
    r = orbit.sma_rs * (1.0 - e * e) / (1.0 + e * jnp.cos(nu))
    sin_wnu = jnp.sin(orbit.omega_rad + nu)
    x = -r * jnp.cos(orbit.omega_rad + nu)
    y = r * sin_wnu * jnp.cos(orbit.inc_rad)
    in_front = (sin_wnu > 0.0).astype(x.dtype)
    return x, y, in_front


def projected_separation(t: jnp.ndarray, orbit: OrbitParams) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sky-projected star-planet separation z(t) in stellar radii.

    Returns ``(z, in_front)`` where ``in_front`` is 1.0 on the transit-side
    of the orbit (planet between observer and star) and 0.0 near secondary
    eclipse, so callers can zero the flux drop there.

    Geometry: true anomaly nu measured from periastron; the planet-observer
    direction corresponds to nu_tr = pi/2 - omega at mid-transit. Separation
    r = a (1-e^2) / (1 + e cos nu);
    z = r * sqrt(1 - sin^2(omega + nu) sin^2 i).
    """
    e = orbit.ecc
    nu, _ = transit_true_anomaly(t, orbit)
    r = orbit.sma_rs * (1.0 - e * e) / (1.0 + e * jnp.cos(nu))
    sin_wnu = jnp.sin(orbit.omega_rad + nu)
    z2 = 1.0 - (sin_wnu * jnp.sin(orbit.inc_rad)) ** 2
    z = r * jnp.sqrt(jnp.clip(z2, 0.0, 1.0))
    in_front = (sin_wnu > 0.0).astype(z.dtype)
    return z, in_front
