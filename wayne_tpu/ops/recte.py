"""RECTE-style physical charge trapping (beyond the reference).

The reference models the WFC3 IR "ramp"/"hook" systematic as a purely
parametric per-orbit exponential multiplier (reference:
wayne/trend_generators visit-trend class; SURVEY.md:393). Modern WFC3
practice instead uses the physically-motivated RECTE charge-trap model
(Zhou, Apai, Lew & Schneider 2017, AJ 153, 243): each pixel carries two
populations of charge traps — "slow" and "fast" — that capture a fraction
of the arriving electrons and release them on fixed timescales,

    dE_p/dt = eta_p * f * (1 - E_p / n_p) - E_p / tau_p ,   p in {s, f},

where f is the pixel's illumination rate (e-/s), n_p the trap count,
eta_p the capture efficiency and tau_p the release timescale. The
observed charge deficit over an exposure is exactly the net change in
the trapped population, Delta E_s + Delta E_f: traps filling early in an
orbit make the measured flux ramp upward (the hook), strongest in orbit
1 when the traps start empty — the behaviour the parametric hook only
imitates.

TPU-first formulation
---------------------
Trap state depends only on the ILLUMINATION HISTORY, which is
deterministic: the noise-free ideal fluence plus the sky+dark background
(the same stimulus driver the persistence model uses). So instead of
carrying sequential state through the readout chain — which would break
the visit vmap — we precompute every exposure's trap response in one
`lax.scan` over the (N, S, S) rate stack and hand the kernel two
per-exposure maps that ride the Scene pytree:

  * a multiplicative THINNING plane ``trap_mult`` = 1 - capture/q: a
    Bernoulli thinning of a Poisson process is again Poisson, so scaling
    the *expected* rates before sampling is statistically exact for the
    capture side;
  * a nonnegative RELEASE rate that joins the persistence/background
    rate (released electrons are real arrivals and carry shot noise).

Within one exposure the deficit is applied at its exposure-mean rate
(exposures are ~100 s; the fast-trap timescale is ~281 s), so the
sub-exposure curvature of the hook is linearised — the orbit- and
visit-scale ramp, which is what reduction pipelines detrend, is exact
at every exposure boundary. Both populations' defaults are the
published RECTE best-fit values (Zhou et al. 2017, Table 1) and every
one is overridable from YAML (``recte:`` block).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class RecteParams:
    """Trap populations. Defaults: Zhou et al. (2017) best-fit values."""

    n_trap_s: float = 1525.38    # slow-trap count per pixel
    eta_s: float = 0.013318     # slow capture efficiency
    tau_s: float = 1.63e4       # slow release timescale (s)
    n_trap_f: float = 162.38     # fast-trap count per pixel
    eta_f: float = 0.008407     # fast capture efficiency
    tau_f: float = 281.463      # fast release timescale (s)


def _evolve_constant_rate(e0: jnp.ndarray, f: jnp.ndarray, dt: float,
                          n_tot: float, eta: float, tau: float
                          ) -> jnp.ndarray:
    """Trap population after ``dt`` seconds of constant illumination ``f``.

    Closed form of dE/dt = a - b E with a = eta f, b = eta f / n + 1/tau:
    E(dt) = a/b + (E0 - a/b) exp(-b dt). Exact for constant f.
    """
    a = eta * f
    b = a / n_tot + 1.0 / tau
    e_inf = a / b
    return e_inf + (e0 - e_inf) * jnp.exp(-b * dt)


def _exposure_gaps(exp_start_s: jnp.ndarray, exptime_s: float) -> jnp.ndarray:
    """(N,) free-decay gap before each exposure; first gap is 0 (the
    initial trap fill is defined AT the first exposure's start)."""
    t = jnp.asarray(exp_start_s, jnp.float32)
    gaps = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                            t[1:] - t[:-1] - exptime_s])
    return jnp.maximum(gaps, 0.0)


def _trap_step(p: RecteParams, exptime_s: float):
    """One visit-clock step of the two-population trap state.

    carry = (e_s, e_f) trapped charge; xs = (rate, gap). Free decay over
    the gap, then the constant-rate closed form over the exposure; emits
    the exposure's signed charge deficit. The SINGLE implementation
    shared by the forward model (trap_deltas, per-pixel maps) and the
    reduction-side fit model (white_ramp) — the fit must invert exactly
    the physics the simulator applied.
    """
    def step(carry, xs):
        e_s, e_f = carry
        f, gap = xs
        e_s = e_s * jnp.exp(-gap / p.tau_s)
        e_f = e_f * jnp.exp(-gap / p.tau_f)
        e_s_new = _evolve_constant_rate(e_s, f, exptime_s,
                                        p.n_trap_s, p.eta_s, p.tau_s)
        e_f_new = _evolve_constant_rate(e_f, f, exptime_s,
                                        p.n_trap_f, p.eta_f, p.tau_f)
        deficit = (e_s_new - e_s) + (e_f_new - e_f)
        return (e_s_new, e_f_new), deficit

    return step


@partial(jax.jit, static_argnames=("exptime_s", "params", "f0_s", "f0_f"))
def trap_deltas(rate_stack: jnp.ndarray, exp_start_s: jnp.ndarray,
                exptime_s: float, params: RecteParams = RecteParams(),
                f0_s: float = 0.0, f0_f: float = 0.0):
    """Net trapped-charge change per exposure: the observed deficit.

    ``rate_stack``: (N, S, S) noise-free illumination rates (e-/s,
    source + background). ``exp_start_s``: (N,) exposure start times on
    the visit clock; all exposures share ``exptime_s`` (one sample
    sequence per visit). ``f0_s``/``f0_f``: initial trap-fill fractions
    at the first exposure's start (pre-visit pumping; 0 = fresh).

    Returns ``(deficit_e, e_s_end, e_f_end)``: the (N, S, S) signed
    per-exposure charge deficit (positive = net capture, charge missing
    from the well; negative = net release, extra charge) and the final
    trap maps (useful for chaining visits).

    Between exposures the traps decay freely (release during reset/gap
    time is unobserved); during an exposure the constant-rate closed
    form above is exact for the exposure-mean rate.
    """
    p = params
    gaps = _exposure_gaps(exp_start_s, exptime_s)
    shape = rate_stack.shape[1:]
    e_s0 = jnp.full(shape, f0_s * p.n_trap_s, jnp.float32)
    e_f0 = jnp.full(shape, f0_f * p.n_trap_f, jnp.float32)
    (e_s_end, e_f_end), deficit = jax.lax.scan(
        _trap_step(p, exptime_s), (e_s0, e_f0),
        (rate_stack.astype(jnp.float32), gaps))
    return deficit, e_s_end, e_f_end


def thin_and_release(deficit_e: jnp.ndarray, fluence_e: jnp.ndarray,
                     exptime_s: float):
    """Split the signed deficit into kernel-ready maps.

    Returns ``(trap_mult, release_rate)``: a multiplicative thinning
    plane in (0, 1] applied to the expected source+background rates
    (net capture removes that fraction of the arriving charge), and a
    nonnegative e-/s release rate that joins the persistence/background
    Poisson rate (net release is real arriving charge). ``fluence_e``
    is the same noise-free per-exposure fluence that drove the trap
    evolution, so the thinned expectation reproduces the deficit
    exactly; pixels with no illumination can only release.
    """
    cap = jnp.maximum(deficit_e, 0.0)
    rel = jnp.maximum(-deficit_e, 0.0)
    trap_mult = 1.0 - cap / jnp.maximum(fluence_e, 1e-20)
    # Guard degenerate corners (capture estimated above the fluence can
    # only come from numerical noise at ~zero flux).
    trap_mult = jnp.clip(trap_mult, 0.0, 1.0)
    return trap_mult, rel / exptime_s


def white_ramp(rate_e_s: jnp.ndarray, exp_start_s: jnp.ndarray,
               exptime_s: float, params: RecteParams = RecteParams(),
               f0_s: jnp.ndarray | float = 0.0,
               f0_f: jnp.ndarray | float = 0.0) -> jnp.ndarray:
    """Relative RECTE ramp of a light curve at a representative rate.

    The reduction-side model: for a (scalar or (N,)) illuminated-pixel
    rate ``rate_e_s``, returns the (N,) multiplicative ramp
    1 - deficit / (rate * exptime) that RECTE imprints on the measured
    flux. Differentiable in ``f0_s``/``f0_f`` (traced, not static), so
    white-light fits can float the initial trap fill — the per-visit
    parameters observers actually fit (Zhou et al. 2017 §4).
    """
    p = params
    t = jnp.asarray(exp_start_s, jnp.float32)
    f = jnp.broadcast_to(jnp.asarray(rate_e_s, jnp.float32), t.shape)
    gaps = _exposure_gaps(exp_start_s, exptime_s)
    e_s0 = jnp.asarray(f0_s, jnp.float32) * p.n_trap_s
    e_f0 = jnp.asarray(f0_f, jnp.float32) * p.n_trap_f
    # SAME step body as trap_deltas (_trap_step): the reduction-side fit
    # model must stay the exact inverse of the forward trap physics.
    _, deficit = jax.lax.scan(_trap_step(p, exptime_s), (e_s0, e_f0),
                              (f, gaps))
    return 1.0 - deficit / jnp.maximum(f * exptime_s, 1e-20)


def visit_trap_maps(scenes, tables, cfg, rcfg, chunk: int = 8,
                    fluence_stack: jnp.ndarray | None = None):
    """Compute the whole visit's (trap_mult, release_rate) Scene leaves.

    ``fluence_stack`` (N, S, S): optional precomputed noise-free
    per-exposure fluence (ops/visit.visit_fluence_stack — the ideal
    accumulation plus the flag-enabled background expectation), shared
    with the persistence model's stimulus pass by Observation; when
    None, one physics-only pass of the visit is run here (same cost
    note as ops/persistence.visit_persistence_rates).
    """
    from wayne_tpu.ops.visit import visit_fluence_stack

    exptime = float(tables.read_times[-1])
    if fluence_stack is None:
        fluence_stack = visit_fluence_stack(scenes, tables, cfg, chunk)

    params = RecteParams(
        n_trap_s=rcfg.n_trap_s, eta_s=rcfg.eta_s, tau_s=rcfg.tau_s,
        n_trap_f=rcfg.n_trap_f, eta_f=rcfg.eta_f, tau_f=rcfg.tau_f)
    deficit, _, _ = trap_deltas(
        fluence_stack / exptime, scenes.exp_start_s, exptime,
        params=params, f0_s=rcfg.f0_s, f0_f=rcfg.f0_f)
    return thin_and_release(deficit, fluence_stack, exptime)
