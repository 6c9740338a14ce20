"""Time-domain systematics generators (reference: wayne/trend_generators/).

Three families, as in the reference:
  - scan-speed variations (SSV): quasi-periodic modulation of the effective
    scan exposure per row, applied as a multiplier on subsegment flux;
  - visit-long trends: the charge-trapping "hook" (per-orbit exponential
    ramp, stronger in orbit 1) times a visit-long linear slope, applied as
    a flux multiplier;
  - pointing drift: slow + jitter offsets of (x_ref, y_ref) per exposure
    (generated host-side in the visit planner).

All device functions are pure elementwise math on time arrays, so they
trace into the exposure kernel and vmap across exposures.
"""

from __future__ import annotations

from dataclasses import dataclass, fields

import jax
import jax.numpy as jnp


def _register(cls):
    names = [f.name for f in fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=names, meta_fields=[])


@_register
@dataclass
class TrendParams:
    """Per-visit systematics parameters (pytree of scalars)."""

    ssv_amp: jnp.ndarray          # fractional sinusoid amplitude
    ssv_period_s: jnp.ndarray
    ssv_phase: jnp.ndarray        # radians
    ssv_rw_amp: jnp.ndarray       # random-walk SSV amplitude (0 = off)
    visit_slope_per_s: jnp.ndarray
    hook_amp: jnp.ndarray
    hook_tau_s: jnp.ndarray
    hook_orbit1_scale: jnp.ndarray

    @classmethod
    def create(cls, ssv_amp=0.015, ssv_period_s=0.7, ssv_phase=0.0,
               ssv_rw_amp=0.0, visit_slope_per_s=0.01 / 86400.0,
               hook_amp=0.003, hook_tau_s=300.0, hook_orbit1_scale=2.0):
        f32 = lambda v: jnp.asarray(v, jnp.float32)
        return cls(f32(ssv_amp), f32(ssv_period_s), f32(ssv_phase),
                   f32(ssv_rw_amp), f32(visit_slope_per_s), f32(hook_amp),
                   f32(hook_tau_s), f32(hook_orbit1_scale))


def ssv_factor(t_in_exposure: jnp.ndarray, p: TrendParams) -> jnp.ndarray:
    """Scan-speed-variation flux multiplier at time t within the exposure.

    Sinusoidal model (reference: wayne/trend_generators scan-speed class):
    modulates the charge laid down per unit time as the scan mirrors the
    slightly uneven telescope drift rate.
    """
    phase = 2.0 * jnp.pi * t_in_exposure / p.ssv_period_s + p.ssv_phase
    return 1.0 + p.ssv_amp * jnp.sin(phase)


def ssv_mean_factor(t_a: jnp.ndarray, t_b: jnp.ndarray,
                    p: TrendParams) -> jnp.ndarray:
    """EXACT time-average of the SSV sinusoid over [t_a, t_b].

    mean = 1 + amp * [cos(w t_a + phi) - cos(w t_b + phi)] / (w (t_b - t_a))

    Using the analytic mean per subsegment removes sampling aliasing of
    the modulation entirely: with sub-second SSV periods a midpoint
    sample at the subsegment cadence would damp the effective amplitude
    by sinc(pi dt/P) (~17% at 3 samples/period). The sub-pixel intra-
    segment stripe structure (spatial wavelength = scan_rate * period
    < 1 px) is physically washed out by pixel integration regardless.
    """
    w = 2.0 * jnp.pi / p.ssv_period_s
    dt = jnp.maximum(t_b - t_a, 1e-9)
    mean_sin = (jnp.cos(w * t_a + p.ssv_phase)
                - jnp.cos(w * t_b + p.ssv_phase)) / (w * dt)
    return 1.0 + p.ssv_amp * mean_sin


def ssv_random_walk(key: jnp.ndarray, n_seg: int,
                    p: TrendParams) -> jnp.ndarray:
    """Random-walk scan-speed variation factors for the WHOLE exposure
    (reference: wayne/trend_generators — the stochastic SSV variant).

    Returns (n_seg,) multiplicative factors for every subsegment of the
    exposure (all reads concatenated). The walk is keyed ONCE per
    exposure and is continuous across read boundaries — the low-frequency
    wander is the physically dominant part of a random walk, so no
    per-read re-keying or re-centering is applied. Convention: the factor
    starts at 1 + amp * g_0 / sqrt(n_seg) and the RMS wander at the end
    of the exposure equals ``ssv_rw_amp`` (no mean normalisation; the
    total-flux wander IS the systematic).
    """
    steps = jax.random.normal(key, (n_seg,), jnp.float32)
    walk = jnp.cumsum(steps) / jnp.sqrt(float(n_seg))
    return 1.0 + p.ssv_rw_amp * walk


def visit_trend_factor(t_since_visit: jnp.ndarray, t_since_orbit: jnp.ndarray,
                       is_first_orbit: jnp.ndarray, p: TrendParams) -> jnp.ndarray:
    """Hook + visit-long slope multiplier.

    F(t) = (1 - slope * t_visit) * (1 - A * exp(-t_orbit / tau)), with the
    hook amplitude A scaled up in the first orbit (reference:
    wayne/trend_generators visit trend class; SURVEY.md section 8 ramp model).
    """
    amp = p.hook_amp * jnp.where(is_first_orbit > 0.5, p.hook_orbit1_scale, 1.0)
    hook = 1.0 - amp * jnp.exp(-t_since_orbit / p.hook_tau_s)
    slope = 1.0 - p.visit_slope_per_s * t_since_visit
    return hook * slope
