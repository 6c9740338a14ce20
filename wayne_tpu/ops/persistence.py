"""Image persistence: afterglow of earlier exposures (beyond the reference).

WFC3 IR's HgCdTe detector traps a fraction of the charge of every
exposure and releases it over the following minutes-to-hours, so pixels
pumped near saturation keep glowing into later exposures — the classic
"persistence" systematic real WFC3 programs schedule and mask around
(Long et al., WFC3 ISR 2012-14/2015-15 "A-gamma" model). The reference
simulator models only the *within-orbit* charge-trapping ramp (the hook
trend, SURVEY.md:393); it has no exposure-to-exposure afterglow. wayne_tpu
adds it, optionally, with a TPU-first formulation:

  rate_i(pixel) = A * sum_{j<i} W[i, j] * sigmoid((F_j - x0) / dx)

where F_j is exposure j's end-of-exposure fluence map (the deterministic
ideal accumulation — persistence is a response to the *stimulus level*,
so the noise-free fluence is the right driver) and W[i, j] is the exact
mean of the (t / 1000 s)^(-gamma) decay over exposure i's open-shutter
window, measured from exposure j's shutter close. That makes the whole
visit's persistence maps ONE tensordot,

    rates = A * W @ sigmoid_stack        # (N, N) @ (N, S, S) on the MXU

so per-exposure maps ride the existing vmap/shard machinery as a Scene
leaf (``Scene.persist_rate``) with zero sequential state: exposure
programs stay independent, visits still shard over the ``exp`` mesh axis.

Modelling choices (documented, all conservative):
  - The released charge carries shot noise: the map joins the sky+dark
    background rate and is Poisson-sampled by the same readout chain.
  - Within one exposure the decay is applied as its exact *mean* rate, so
    the final read's accumulated persistence is exact; intermediate reads
    of the immediately following exposure see a slightly flattened ramp
    (the decay within ~100 s of a stimulus minutes old is mild).
  - Self-persistence of the exposure being simulated is excluded — the
    within-exposure/orbit trapping ramp is already modelled by the hook
    trend; double counting it here would be wrong.
  - The default stimulus threshold x0 tracks the detector's full well
    (0.95 * full_well_e) the way the measured WFC3 curve knees just
    below saturation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from wayne_tpu.calibration import Tables
from wayne_tpu.config import ExposureStatic, PersistenceConfig
from wayne_tpu.scene import Scene


def decay_weights(exp_start_s: jnp.ndarray, exptime_s: float,
                  gamma: float = 1.0, t_min_s: float = 1.0,
                  stim_end_s: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean (t/1000)^(-gamma) decay over each later exposure: (N, M).

    W[i, j] = (1/texp) * integral_{T_i - E_j}^{T_i + texp - E_j}
              (t / 1000)^(-gamma) dt   for stimulus j before target i,
              else 0,

    with ONLY the lower bound clamped to ``t_min_s`` (the power law is
    a fit to t >~ 100 s behaviour; the clamp keeps back-to-back
    exposures finite without changing the minutes-scale tail — the
    upper bound stays at the true elapsed time so the window never
    shifts).

    ``stim_end_s`` (M,) gives arbitrary stimulus shutter-close times
    (e.g. the visit-opening direct image prepended to the exposure
    stack); by default the stimuli are the visit's own exposures,
    E_j = T_j + texp, and W is the strictly-causal (N, N) lower
    triangle (a target never persists from itself: its own shutter
    close is AFTER its start).
    """
    t = jnp.asarray(exp_start_s, jnp.float32)
    ends = (t + exptime_s if stim_end_s is None
            else jnp.asarray(stim_end_s, jnp.float32))
    # elapsed since stimulus j's end at target i's start (N, M)
    a_raw = t[:, None] - ends[None, :]
    causal = a_raw >= -1e-3                   # j strictly before i
    a = jnp.maximum(a_raw, t_min_s)
    b = jnp.maximum(a_raw + exptime_s, a + 1e-6)
    if abs(gamma - 1.0) < 1e-6:
        integral = 1000.0 * (jnp.log(b) - jnp.log(a))
    else:
        g1 = 1.0 - gamma
        integral = (1000.0 ** gamma) * (b ** g1 - a ** g1) / g1
    w = integral / exptime_s
    return w * causal.astype(jnp.float32)


def stimulus_sigmoid(fluence_e: jnp.ndarray, x0_e: float,
                     dx_e: float) -> jnp.ndarray:
    """Trap-filling factor in [0, 1] as a function of stimulus fluence."""
    return jax.nn.sigmoid((fluence_e - x0_e) / dx_e)


@partial(jax.jit, static_argnames=("exptime_s", "amplitude_e_s", "x0_e",
                                   "dx_e", "gamma", "t_min_s"))
def persistence_rates(fluence_stack: jnp.ndarray, exp_start_s: jnp.ndarray,
                      exptime_s: float, amplitude_e_s: float, x0_e: float,
                      dx_e: float, gamma: float = 1.0,
                      t_min_s: float = 1.0,
                      stim_end_s: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-exposure persistence rate maps (N, S, S), e-/s.

    One MXU tensordot over the stimulus stack; default (bf16-input)
    matmul precision is deliberate — persistence is an e-/s-level
    systematic, 0.4% rounding of it is far below every science gate.
    ``fluence_stack`` is (M, S, S) with ``stim_end_s`` (M,) when the
    stimuli are not the N target exposures themselves (e.g. the
    direct image prepended).
    """
    sig = stimulus_sigmoid(fluence_stack, x0_e, dx_e)
    w = decay_weights(exp_start_s, exptime_s, gamma, t_min_s, stim_end_s)
    return amplitude_e_s * jnp.tensordot(w, sig, axes=1)


def visit_persistence_rates(scenes: Scene, tables: Tables,
                            cfg: ExposureStatic, pcfg: PersistenceConfig,
                            chunk: int = 8,
                            extra_fluence: jnp.ndarray | None = None,
                            extra_end_s=None,
                            fluence_stack: jnp.ndarray | None = None
                            ) -> jnp.ndarray:
    """Compute the whole visit's persistence maps from its own Scenes.

    Runs the visit once noise-free (the ideal accumulation IS the
    stimulus driver), adds the deterministic background fluence the
    run's noise flags enable, and folds the decay tensordot. Costs one
    extra physics-only pass of the visit (~2/3 of a full-noise pass)
    when persistence is enabled — unless ``fluence_stack`` (N, S, S)
    supplies the precomputed stack (ops/visit.visit_fluence_stack;
    Observation shares one stack with the RECTE model).

    ``extra_fluence`` with ``extra_end_s`` prepends extra stimuli that
    are not the visit's own exposures: a single (S, S) map with a
    scalar end time, or an (M, S, S) stack with (M,) end times.
    Observation wires in the visit-opening DIRECT IMAGE (whose
    undispersed PSF spot concentrates the star's whole filter bandpass
    into a few pixels — the classic WFC3 persistence source) and, when
    configured, the PRIOR observation's fluence map
    (``PersistenceConfig.prior_fluence_file``).
    """
    from wayne_tpu.ops.visit import visit_fluence_stack

    if fluence_stack is None:
        fluence_stack = visit_fluence_stack(scenes, tables, cfg, chunk)
    exptime = float(tables.read_times[-1])
    fluence = fluence_stack
    stim_end = None
    if extra_fluence is not None:
        ef = jnp.asarray(extra_fluence, jnp.float32)
        if ef.ndim == 2:
            ef = ef[None]
        ee = jnp.atleast_1d(jnp.asarray(extra_end_s, jnp.float32))
        if ef.shape[0] != ee.shape[0]:
            raise ValueError(
                f"{ef.shape[0]} extra stimuli but {ee.shape[0]} end times")
        fluence = jnp.concatenate([ef, fluence], axis=0)
        stim_end = jnp.concatenate(
            [ee, jnp.asarray(scenes.exp_start_s, jnp.float32) + exptime])
    x0 = pcfg.x0_e if pcfg.x0_e > 0 else 0.95 * float(tables.full_well_e)
    return persistence_rates(
        fluence, scenes.exp_start_s, exptime,
        amplitude_e_s=pcfg.amplitude_e_s, x0_e=float(x0),
        dx_e=pcfg.dx_e, gamma=pcfg.gamma, t_min_s=pcfg.t_min_s,
        stim_end_s=stim_end)
