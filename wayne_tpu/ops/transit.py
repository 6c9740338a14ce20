"""Limb-darkened transit light curve (pylightcurve-equivalent) in JAX.

The reference computes per-wavelength transit flux drops with
pylightcurve's ``transit_flux_drop`` using the Claret 4-parameter
non-linear limb-darkening law (reference: wayne/exposure_generator.py,
per (lambda-channel, subsample-time) call). Here the occultation integral
is evaluated with a fixed-node quadrature that is exact in the fully
occulted core and spectrally smooth at the contact points, so a single
program vmaps over (time, wavelength) grids on the VPU.

Math
----
Stellar intensity profile (Claret 2000):
    I(mu) = 1 - sum_{n=1..4} c_n (1 - mu^(n/2)),   mu = sqrt(1 - r^2).

Total disk flux (closed form):
    F_tot = pi * [1 - sum c_n * n / (n + 4)]       (we drop the common pi)

Flux blocked by a planet of radius p at projected separation z splits into
 - a fully covered inner disk r < r_in = max(0, p - z): closed form, and
 - a partially covered annulus r in [|z-p|, min(1, z+p)] where the covered
   azimuth fraction is kappa(r)/pi, kappa = acos((z^2 + r^2 - p^2)/(2 z r)):
   integrated with Gauss-Legendre nodes under the substitution
   r = r_lo + (r_hi - r_lo) * sin^2(pi s / 2), which absorbs the sqrt
   behaviour of kappa at both contact points (and of mu at the limb).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from wayne_tpu.ops.kepler import OrbitParams, projected_separation

_N = jnp.arange(1, 5, dtype=jnp.float32)        # Claret exponents n = 1..4


def claret_intensity(mu: jnp.ndarray, ld: jnp.ndarray) -> jnp.ndarray:
    """I(mu)/I(1) for the Claret 4-parameter law."""
    mu = jnp.clip(mu, 0.0, 1.0)
    powers = mu[..., None] ** (_N / 2.0)
    return 1.0 - jnp.sum(ld * (1.0 - powers), axis=-1)


def claret_total_flux(ld: jnp.ndarray) -> jnp.ndarray:
    """integral_0^1 I(r) 2 r dr (disk-integrated flux, normalised units)."""
    return 1.0 - jnp.sum(ld * _N / (_N + 4.0), axis=-1)


def _covered_core_flux(r_in: jnp.ndarray, ld: jnp.ndarray) -> jnp.ndarray:
    """integral_0^{r_in} I(r) 2 r dr, closed form via mu-substitution."""
    mu_in = jnp.sqrt(jnp.clip(1.0 - r_in * r_in, 0.0, 1.0))
    base = (1.0 - jnp.sum(ld, axis=-1)) * (1.0 - mu_in * mu_in)
    terms = jnp.sum(ld * 4.0 / (_N + 4.0) * (1.0 - mu_in[..., None] ** ((_N + 4.0) / 2.0)),
                    axis=-1)
    return base + terms


from functools import lru_cache


@lru_cache(maxsize=8)
def _gl_nodes(n: int) -> tuple[np.ndarray, np.ndarray]:
    x, w = np.polynomial.legendre.leggauss(n)      # on [-1, 1]
    return (0.5 * (x + 1.0)).astype(np.float32), (0.5 * w).astype(np.float32)


@partial(jnp.vectorize, excluded=(2, 3), signature="(),()->()")
def _occulted_flux(z, p, ld, n_quad):
    """Flux blocked by the planet: scalar core, vectorized over leading dims."""
    s, w = _gl_nodes(n_quad)
    s = jnp.asarray(s)
    w = jnp.asarray(w)

    z = jnp.maximum(z, 1e-7)
    r_in = jnp.clip(p - z, 0.0, 1.0)
    core = _covered_core_flux(r_in, ld)

    r_lo = jnp.clip(jnp.abs(z - p), 0.0, 1.0)
    r_hi = jnp.clip(z + p, 0.0, 1.0)
    span = jnp.maximum(r_hi - r_lo, 0.0)

    u = jnp.sin(0.5 * jnp.pi * s) ** 2             # node positions in [0, 1]
    du = 0.5 * jnp.pi * jnp.sin(jnp.pi * s)        # d(u)/d(s)
    r = r_lo + span * u
    safe_r = jnp.maximum(r, 1e-7)
    cos_k = (z * z + safe_r * safe_r - p * p) / (2.0 * z * safe_r)
    # epsilon-margined clips keep arccos/sqrt differentiable at the contact
    # points (value error ~1e-4 of one node weight; gradients stay finite
    # so depth fitting can autodiff through the model).
    kappa = jnp.arccos(jnp.clip(cos_k, -1.0 + 1e-7, 1.0 - 1e-7))
    mu = jnp.sqrt(jnp.clip(1.0 - r * r, 1e-12, 1.0))
    integrand = claret_intensity(mu, ld) * (kappa / jnp.pi) * 2.0 * r
    annulus = span * jnp.sum(w * du * integrand)

    occ = core + annulus
    return jnp.where((p <= 0.0) | (z >= 1.0 + p), 0.0, occ)


def transit_depth_curve(z: jnp.ndarray, rp_over_rs: jnp.ndarray,
                        ld: jnp.ndarray, n_quad: int = 64) -> jnp.ndarray:
    """Relative flux F(z, p)/F_star for broadcastable ``z`` and ``rp_over_rs``.

    This is the pylightcurve ``transit_flux_drop`` equivalent.
    """
    z, p = jnp.broadcast_arrays(jnp.asarray(z, jnp.float32),
                                jnp.asarray(rp_over_rs, jnp.float32))
    ld = jnp.asarray(ld, jnp.float32)
    occ = _occulted_flux(z, p, ld, n_quad)
    return 1.0 - occ / claret_total_flux(ld)


def uniform_disk_hidden_frac(z: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Fraction of a uniform disk of radius ``p`` hidden behind the unit
    (stellar) disk at projected separation ``z`` — the secondary-eclipse
    geometry (the planet's dayside is far more uniform than the
    limb-darkened star, so a uniform disk is the standard model).

    Closed-form two-circle overlap (lens) area / (pi p^2):
      z >= 1 + p : 0 (fully visible)
      z <= 1 - p : 1 (fully hidden)
      else       : [p^2 acos((z^2+p^2-1)/(2 z p)) + acos((z^2+1-p^2)/(2 z))
                    - z q] / (pi p^2),  q = height of the lens chord.
    """
    z = jnp.maximum(jnp.asarray(z, jnp.float32), 1e-7)
    p = jnp.asarray(p, jnp.float32)
    c1 = jnp.clip((z * z + p * p - 1.0) / (2.0 * z * p), -1.0, 1.0)
    c2 = jnp.clip((z * z + 1.0 - p * p) / (2.0 * z), -1.0, 1.0)
    s = jnp.clip((1.0 + p - z) * (z + p - 1.0) * (z - p + 1.0) * (z + p + 1.0),
                 0.0, jnp.inf)
    lens = p * p * jnp.arccos(c1) + jnp.arccos(c2) - 0.5 * jnp.sqrt(s)
    frac = lens / (jnp.pi * jnp.maximum(p * p, 1e-12))
    frac = jnp.where(z >= 1.0 + p, 0.0, frac)
    frac = jnp.where(z <= 1.0 - p, 1.0, frac)
    return jnp.clip(frac, 0.0, 1.0)


def eclipse_visibility(z: jnp.ndarray, in_front: jnp.ndarray,
                       rp_over_rs: jnp.ndarray) -> jnp.ndarray:
    """Visible fraction of the planet's disk: 1 everywhere except behind
    the star (secondary eclipse). THE definition shared by the simulator
    (transit_light_curve) and the reducer (fit_eclipse_depths) — change
    it here and both sides stay consistent."""
    return 1.0 - uniform_disk_hidden_frac(z, rp_over_rs) * (1.0 - in_front)


_N_RP_CTRL = 16


def transit_light_curve(times: jnp.ndarray, orbit: OrbitParams,
                        rp_over_rs: jnp.ndarray, ld: jnp.ndarray,
                        n_quad: int = 64,
                        interp_channels: bool = True,
                        fp_over_fs: jnp.ndarray | None = None,
                        phase_amp: jnp.ndarray | float = 0.0,
                        phase_offset_rad: jnp.ndarray | float = 0.0
                        ) -> jnp.ndarray:
    """Light curve on a (time, wavelength) grid.

    Args:
      times: (NT,) seconds (same clock as ``orbit.t0_s``).
      rp_over_rs: (NL,) per-channel radius ratio.
      ld: (4,) Claret coefficients (per-channel (NL, 4) also accepted).
      interp_channels: with shared (4,) LD coefficients, the flux at
        fixed time depends on wavelength only through rp — so the
        occultation integral is evaluated at 16 rp control points and
        linearly interpolated per channel (~NL/16 fewer
        quadratures; error < 1e-7 for transmission-spectrum-sized rp
        ranges since F(rp) is smooth). Per-channel (NL, 4) LD always
        takes the direct path.
      fp_over_fs: optional (NL,) planet dayside emission contrast
        (Fp/Fs). When given the returned flux includes the planet's
        light — baseline 1 + fp out of eclipse, dropping to 1 as the
        planet hides behind the star at secondary eclipse (uniform-disk
        occultation). Beyond the reference, which models transits only.
      phase_amp: scalar thermal phase-curve amplitude A in [0, 1]: the
        planet's contrast is modulated as
        fp * [1 - A (1 - cos(phi - phi0)) / 2], phi = 0 at secondary
        eclipse — fp at full dayside, fp (1 - A) at the nightside
        (transit). 0 (default) = constant dayside contrast.
      phase_offset_rad: scalar hot-spot offset phi0 (radians; positive =
        peak brightness before mid-eclipse, the usual eastward shift).

    Returns:
      (NT, NL) relative flux; in (1 - depth, 1] for the transit-only
      model, up to 1 + fp with planet light included.
    """
    z, in_front = projected_separation(times, orbit)
    nt, nl = times.shape[0], rp_over_rs.shape[0]
    if ld.ndim == 2:
        shape = (nt, nl)
        z_grid = jnp.broadcast_to(z[:, None], shape)
        p_grid = jnp.broadcast_to(rp_over_rs[None, :], shape)
        flux = jax.vmap(
            lambda zc, pc, ldc: transit_depth_curve(zc, pc, ldc, n_quad),
            in_axes=(1, 1, 0), out_axes=1)(z_grid, p_grid, ld)
    elif interp_channels and nl > _N_RP_CTRL:
        rp_lo = jnp.min(rp_over_rs)
        rp_hi = jnp.maximum(jnp.max(rp_over_rs), rp_lo + 1e-4)
        ctrl = jnp.linspace(rp_lo, rp_hi, _N_RP_CTRL)            # (C,)
        shape = (nt, _N_RP_CTRL)
        f_ctrl = transit_depth_curve(
            jnp.broadcast_to(z[:, None], shape),
            jnp.broadcast_to(ctrl[None, :], shape), ld, n_quad)  # (NT, C)
        # Gather-free piecewise-linear interpolation: uniform control grid
        # -> hat-function weights, applied as one small MXU contraction
        # (jnp.interp's searchsorted gathers serialise on the VPU).
        step = (rp_hi - rp_lo) / (_N_RP_CTRL - 1)
        rp_c = jnp.clip(rp_over_rs, rp_lo, rp_hi)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(rp_c[:, None] - ctrl[None, :]) / step)
        w = w / jnp.sum(w, axis=1, keepdims=True)                # (NL, C)
        # precision=HIGHEST: the TPU MXU's default bf16 input rounding
        # (~0.4%) is larger than the transit depths riding on this
        # contraction (measured 3.8e-3 absolute LC error vs CPU).
        flux = jax.lax.dot_general(
            f_ctrl, w, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)                 # (NT, NL)
    else:
        shape = (nt, nl)
        flux = transit_depth_curve(
            jnp.broadcast_to(z[:, None], shape),
            jnp.broadcast_to(rp_over_rs[None, :], shape), ld, n_quad)
    flux = 1.0 - (1.0 - flux) * in_front[:, None]
    if fp_over_fs is not None:
        from wayne_tpu.ops.kepler import orbital_phase_angle

        # Planet light: hidden only on the far side of the orbit.
        vis = eclipse_visibility(z[:, None], in_front[:, None],
                                 rp_over_rs[None, :])
        # Thermal phase modulation: phi = 0 at mid-secondary (dayside
        # facing the observer), from the TRUE anomaly so eccentric
        # orbits keep the dayside maximum aligned with the actual
        # (shifted) eclipse. An eastward hot spot peaks BEFORE eclipse,
        # i.e. at phi = -phase_offset_rad.
        phi = orbital_phase_angle(times, orbit)
        mod = 1.0 - phase_amp * 0.5 * (1.0 - jnp.cos(phi + phase_offset_rad))
        flux = flux + fp_over_fs[None, :] * mod[:, None] * vis
    return flux
