"""On-device affine-invariant ensemble MCMC (emcee equivalent).

Real WFC3 transmission-spectroscopy analyses (Iraclis and the pipelines
the reference's outputs feed — SURVEY.md section 0/4) quote POSTERIOR
depths from ensemble MCMC, usually emcee's Goodman & Weare (2010)
stretch move. This module is that sampler rebuilt TPU-first: the whole
chain is one compiled program — ``lax.scan`` over steps, ``vmap`` over
walkers, counter-based ``jax.random`` keys — so a full posterior runs
on device with zero host round-trips, and the sampler itself can be
``vmap``-ed over spectral channels to sample every channel's posterior
simultaneously (something serial emcee cannot express).

Design notes (TPU):
  - The stretch move updates the two half-ensembles alternately; each
    half-update is a single vmapped evaluation of ``log_prob`` over
    n_walkers/2 proposals — batched, static-shape work, no Python loop.
  - Rejection is arithmetic (``jnp.where``), not control flow, so the
    program is branch-free under ``jit``.
  - The chain tensor (n_steps, n_walkers, ndim) stays in HBM until the
    caller fetches it; thinning happens on device.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from wayne_tpu.ops.kepler import OrbitParams, projected_separation
from wayne_tpu.ops.transit import eclipse_visibility, transit_depth_curve


from wayne_tpu.pytree import register as _register


@_register
@dataclass
class EnsembleChain:
    """Output of ensemble_sample."""

    samples: jnp.ndarray       # (n_kept, n_walkers, ndim)
    log_probs: jnp.ndarray     # (n_kept, n_walkers)
    acceptance: jnp.ndarray    # scalar mean acceptance fraction


@_register
@dataclass
class ChainDiagnostics:
    """Convergence diagnostics from chain_diagnostics (per dimension)."""

    rhat: jnp.ndarray          # (ndim,) split-chain Gelman-Rubin R-hat
    ess: jnp.ndarray           # (ndim,) effective sample size


@jax.jit
def chain_diagnostics(samples: jnp.ndarray) -> ChainDiagnostics:
    """Split-chain R-hat and effective sample size, fully on device.

    ``samples`` is the post-burn-in (n_steps, n_walkers, ndim) chain
    tensor. Each walker's trace is split in half (Gelman et al. BDA3 /
    Vehtari et al. 2021 "split" convention: 2*n_walkers chains of
    n_steps//2 draws), so a sampler whose halves disagree — still
    drifting, or stuck in distinct modes — fails even when the walkers
    agree with each other at every instant.

    R-hat: sqrt(((n-1)/n * W + B/n) / W) with W the mean within-chain
    variance and B the between-chain variance of the chain means
    (times n). Converged chains sit below ~1.05.

    ESS: Geyer initial-positive-sequence estimate on the multi-chain
    autocorrelation rho_t = 1 - (W - mean_c acf_c(t)) / var_plus,
    computed via FFT in one batched pass and truncated at the first
    negative even/odd pair with a branch-free cumulative mask
    (acceptance-as-arithmetic, like the sampler itself). Walker-ensemble
    moves correlate successive steps, so ESS is the honest sample count
    behind any quoted percentile — acceptance alone (the round-3-only
    diagnostic) says nothing about that.
    """
    n, m, d = samples.shape
    half = n // 2
    # split each walker chain: (half, 2m, d) chains
    chains = jnp.concatenate([samples[:half], samples[half: 2 * half]],
                             axis=1)
    chains = chains.astype(jnp.float32)
    mean_c = chains.mean(axis=0)                       # (2m, d)
    var_c = chains.var(axis=0, ddof=1)                 # (2m, d)
    w_var = var_c.mean(axis=0)                         # (d,)
    b_var = half * mean_c.var(axis=0, ddof=1)          # (d,)
    var_plus = (half - 1) / half * w_var + b_var / half
    rhat = jnp.sqrt(var_plus / jnp.maximum(w_var, 1e-30))

    # batched FFT autocovariance per chain (2m, d) x half lags
    x = (chains - mean_c[None]).transpose(1, 2, 0)     # (2m, d, half)
    nfft = 2 * half
    f = jnp.fft.rfft(x, n=nfft, axis=-1)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=nfft, axis=-1)[..., :half]
    acov = acov / half                                 # biased acov
    acf = acov.mean(axis=0)                            # (d, half)
    rho = 1.0 - (w_var[:, None] - acf) / var_plus[:, None]
    rho = rho.at[:, 0].set(1.0)
    # Geyer pairs: P_k = rho_{2k} + rho_{2k+1}; keep while positive
    n_pair = half // 2
    pairs = rho[:, : 2 * n_pair].reshape(d, n_pair, 2).sum(axis=-1)
    keep = jnp.cumprod((pairs > 0.0).astype(jnp.float32), axis=1)
    tau = -1.0 + 2.0 * jnp.sum(pairs * keep, axis=1)   # integrated ACT
    tau = jnp.maximum(tau, 1.0)
    ess = (2 * m * half) / tau
    return ChainDiagnostics(rhat=rhat, ess=ess)


@partial(jax.jit, static_argnames=("log_prob", "n_steps", "thin"))
def ensemble_sample(log_prob: Callable[[jnp.ndarray], jnp.ndarray],
                    init: jnp.ndarray, key: jnp.ndarray,
                    n_steps: int, *, a: float = 2.0,
                    thin: int = 1) -> EnsembleChain:
    """Goodman & Weare (2010) stretch-move ensemble sampler.

    Args:
      log_prob: maps a (ndim,) parameter vector to a scalar log
        density (``-inf`` outside the prior support is fine). It is
        vmapped internally — keep it jit-compatible.
      init: (n_walkers, ndim) starting walkers; n_walkers must be even
        and should be >= 2*ndim (emcee's rule of thumb).
      key: PRNG key; the whole chain is deterministic in (init, key).
      n_steps: ensemble updates (each moves every walker once).
      a: stretch scale (2.0 is the standard choice).
      thin: keep every ``thin``-th step.

    Returns EnsembleChain with samples (n_steps//thin, n_walkers, ndim).

    ``log_prob`` is a STATIC jit argument: every distinct closure
    object is a fresh trace + compile (minutes on this TPU backend) and
    stays pinned in the jit cache. Looping over targets? Hoist one
    closure over traced data (as sample_channel_posteriors does via
    vmap), or call from inside an outer jit — never build a new lambda
    per iteration (CLAUDE.md jit-in-loop rule).
    """
    n_walkers, ndim = init.shape
    if n_walkers % 2:
        raise ValueError("n_walkers must be even")
    half = n_walkers // 2
    lp_batch = jax.vmap(log_prob)

    # The two half-ensembles are STATIC slices, so each half-update is a
    # closed function of its bounds resolved at trace time — no dynamic
    # slicing, no control flow.
    def make_half_update(lo: int, hi: int, clo: int, chi: int):
        def update(x, lp, k):
            k_z, k_pick, k_acc = jax.random.split(k, 3)
            movers = x[lo:hi]                       # (half, ndim)
            comp = x[clo:chi]                       # (half, ndim)
            u = jax.random.uniform(k_z, (half,))
            z = ((a - 1.0) * u + 1.0) ** 2 / a      # g(z) ~ 1/sqrt(z)
            j = jax.random.randint(k_pick, (half,), 0, half)
            partner = comp[j]                       # (half, ndim)
            prop = partner + z[:, None] * (movers - partner)
            lp_prop = lp_batch(prop)
            lp_cur = lp[lo:hi]
            log_ratio = (ndim - 1) * jnp.log(z) + lp_prop - lp_cur
            accept = jnp.log(
                jax.random.uniform(k_acc, (half,))) < log_ratio
            new_movers = jnp.where(accept[:, None], prop, movers)
            new_lp = jnp.where(accept, lp_prop, lp_cur)
            x = x.at[lo:hi].set(new_movers)
            lp = lp.at[lo:hi].set(new_lp)
            return x, lp, jnp.mean(accept.astype(jnp.float32))
        return update

    update_a = make_half_update(0, half, half, n_walkers)
    update_b = make_half_update(half, n_walkers, 0, half)

    def step(carry, k):
        x, lp = carry
        k1, k2 = jax.random.split(k)
        x, lp, acc1 = update_a(x, lp, k1)
        x, lp, acc2 = update_b(x, lp, k2)
        return (x, lp), (x, lp, 0.5 * (acc1 + acc2))

    lp0 = lp_batch(init)
    keys = jax.random.split(key, n_steps)
    (_, _), (xs, lps, accs) = jax.lax.scan(step, (init, lp0), keys)
    return EnsembleChain(samples=xs[::thin], log_probs=lps[::thin],
                         acceptance=jnp.mean(accs))


def _white_ramp_model(theta, t_day, t_orb, firstf, z, in_front, ld,
                      n_quad, vis=None):
    # THE shared model definition lives in reduction.py
    # (ramp_transit_model) so the posterior always refines exactly the
    # model the LM point fit solved — including its tau/depth clamps.
    from wayne_tpu.reduction import ramp_transit_model

    return ramp_transit_model(theta, t_day, t_orb, firstf, z, in_front,
                              ld, n_quad, vis)[0]


@_register
@dataclass
class WhitePosterior:
    """Marginal posterior summaries from sample_white_posterior."""

    rp_median: jnp.ndarray
    rp_minus: jnp.ndarray        # median - 16th percentile
    rp_plus: jnp.ndarray         # 84th percentile - median
    samples: jnp.ndarray         # (n_kept * n_walkers, ndim) flattened,
    #                              post burn-in: (c, rp, ra, rb, rbf,
    #                              log_tau[, dt0_s, sma_rs, cos_i],
    #                              log_sigma)
    acceptance: jnp.ndarray
    rhat: jnp.ndarray            # (ndim,) split R-hat (chain_diagnostics)
    ess: jnp.ndarray             # (ndim,) effective sample size


@partial(jax.jit, static_argnames=("n_steps", "n_walkers", "n_burn",
                                   "gap_s", "n_quad", "fit_geometry",
                                   "t0_window_s", "eclipse"))
def sample_white_posterior(white_lc: jnp.ndarray, exp_mid_s: jnp.ndarray,
                           orbit: OrbitParams, ld: jnp.ndarray,
                           rp_init: jnp.ndarray | float,
                           key: jnp.ndarray, *, n_steps: int = 2000,
                           n_walkers: int = 32, n_burn: int = 500,
                           gap_s: float = 1200.0,
                           n_quad: int = 32,
                           fit_geometry: bool = False,
                           t0_window_s: float = 600.0,
                           eclipse: bool = False,
                           weights: jnp.ndarray | None = None
                           ) -> WhitePosterior:
    """Full posterior over the joint white-light ramp+transit model.

    Samples theta = (c, rp, ra, rb, rb_first, log tau, log sigma) — the
    fit_white_ramp parameters plus a free noise scale — under the
    Gaussian likelihood and broad flat priors, with walkers initialised
    in a small ball around the Levenberg-Marquardt solution
    (reduction.fit_white_ramp). One compiled program; the occultation
    integral is re-evaluated inside every proposal's log-density via
    the same transit_depth_curve the fitters use.

    ``fit_geometry=True`` extends theta with (t0 offset [s], a/Rs,
    cos i) seeded from the LM geometric fit — the JOINT posterior over
    depth, systematics and ephemeris. The honest widths along the
    (rp, a/Rs, i, t0) degeneracy valley are exactly what the point fit
    cannot provide. ``t0_window_s`` must cover the true mid-transit
    offset from the catalog ephemeris: it sets BOTH the LM seeding
    grid's span (chi2(t0) is multimodal — a seed in the wrong basin
    initialises every walker there and the stretch move cannot jump
    out) and the flat t0 prior (+- 3 * t0_window_s).

    ``weights`` is an optional (n_exp,) keep mask (0 = excluded): pass
    RampFit.weights from a robust-clipped point fit so the posterior
    excludes exactly the exposures the point fit rejected — otherwise
    the Gaussian likelihood re-admits the outliers, drags the median
    away from the clipped LM value and inflates the free noise scale.
    """
    from wayne_tpu.reduction import (fit_white_ramp, orbit_phase,
                                     out_of_transit_mask)

    lc = jnp.asarray(white_lc, jnp.float32)
    t = jnp.asarray(exp_mid_s, jnp.float32)
    w = (jnp.ones_like(lc) if weights is None
         else jnp.asarray(weights, jnp.float32))
    n_kept = jnp.sum(w)
    t_orb, first = orbit_phase(t, gap_s)
    firstf = first.astype(jnp.float32)
    t_day = (t - t.mean()) / 86400.0
    z, in_front = projected_separation(t, orbit)

    import dataclasses as _dc

    if eclipse and fit_geometry:
        raise ValueError("fit the ephemeris on a transit visit")
    if not 0 <= n_burn < n_steps:
        raise ValueError(f"n_burn ({n_burn}) must be < n_steps "
                         f"({n_steps}) — nothing would remain after "
                         "burn-in")
    vis = (eclipse_visibility(z, in_front,
                              jnp.asarray(rp_init, jnp.float32))
           if eclipse else None)
    lm = fit_white_ramp(lc, t, orbit, ld, rp_init, gap_s=gap_s,
                        n_quad=n_quad, fit_geometry=fit_geometry,
                        t0_window_s=t0_window_s, eclipse=eclipse)
    # seed the noise scale from the residual at the FITTED ephemeris —
    # with fit_geometry the input orbit's z would leave transit-depth
    # residuals at the contacts and inflate sigma0 ~50x
    z_lm, infr_lm = projected_separation(t, lm.orbit)
    resid = lc - _white_ramp_model(
        jnp.stack([lm.c, lm.rp, lm.slope_per_day, lm.hook_amp,
                   lm.hook_amp_first, jnp.log(lm.hook_tau_s)]),
        t_day, t_orb, firstf, z_lm, infr_lm, ld, n_quad, vis)
    mu_r = jnp.sum(w * resid) / jnp.maximum(n_kept, 1.0)
    sigma0 = jnp.maximum(jnp.sqrt(
        jnp.sum(w * (resid - mu_r) ** 2) / jnp.maximum(n_kept - 1.0, 1.0)),
        1e-6)
    ndim = 10 if fit_geometry else 7

    depth_lo, depth_hi = (-0.02, 0.1) if eclipse else (0.01, 0.5)
    t0_span = 3.0 * t0_window_s   # prior tracks the LM seeding window
    lo = jnp.array([0.2, depth_lo, -1.0, -0.05, -0.05,
                    jnp.log(30.0)]
                   + ([-t0_span, 1.5, 0.0] if fit_geometry else [])
                   + [jnp.log(1e-6)], jnp.float32)
    hi = jnp.array([5.0, depth_hi, 1.0, 0.05, 0.05,
                    jnp.log(20000.0)]
                   + ([t0_span, 50.0, 0.6] if fit_geometry else [])
                   + [jnp.log(0.1)], jnp.float32)

    def log_prob(theta):
        inside = jnp.all((theta > lo) & (theta < hi))
        if fit_geometry:
            orb = _dc.replace(
                orbit, t0_s=orbit.t0_s + theta[6],
                sma_rs=jnp.clip(theta[7], 1.5, 50.0),
                inc_rad=jnp.arccos(jnp.clip(theta[8], 0.0, 0.6)))
            zz, infr = projected_separation(t, orb)
        else:
            zz, infr = z, in_front
        m = _white_ramp_model(theta[:6], t_day, t_orb, firstf, zz,
                              infr, ld, n_quad, vis)
        sig = jnp.exp(theta[ndim - 1])
        loglike = (-0.5 * jnp.sum(w * ((m - lc) / sig) ** 2)
                   - n_kept * theta[ndim - 1])
        return jnp.where(inside, loglike, -jnp.inf)

    base6 = [lm.c, lm.rp, lm.slope_per_day, lm.hook_amp,
             lm.hook_amp_first, jnp.log(lm.hook_tau_s)]
    geo = ([lm.t0_offset_s, lm.orbit.sma_rs, jnp.cos(lm.orbit.inc_rad)]
           if fit_geometry else [])
    center = jnp.stack(base6 + geo + [jnp.log(sigma0)])
    center = jnp.clip(center, lo + 1e-4, hi - 1e-4)
    scale = jnp.array([1e-3, 1e-3, 1e-3, 1e-4, 1e-4, 0.05]
                      + ([5.0, 0.02, 2e-3] if fit_geometry else [])
                      + [0.05], jnp.float32)
    k_init, k_run = jax.random.split(jnp.asarray(key))
    init = center[None, :] + scale[None, :] * jax.random.normal(
        k_init, (n_walkers, ndim))
    init = jnp.clip(init, lo + 1e-5, hi - 1e-5)

    chain = ensemble_sample(log_prob, init, k_run, n_steps)
    diag = chain_diagnostics(chain.samples[n_burn:])
    kept = chain.samples[n_burn:].reshape(-1, ndim)
    q16, q50, q84 = jnp.percentile(kept[:, 1],
                                   jnp.array([16.0, 50.0, 84.0]))
    return WhitePosterior(rp_median=q50, rp_minus=q50 - q16,
                          rp_plus=q84 - q50, samples=kept,
                          acceptance=chain.acceptance,
                          rhat=diag.rhat, ess=diag.ess)


@_register
@dataclass
class ChannelPosteriors:
    """Per-channel depth posteriors from sample_channel_posteriors."""

    rp_median: jnp.ndarray     # (n_chan,)
    rp_minus: jnp.ndarray      # (n_chan,) median - 16th percentile
    rp_plus: jnp.ndarray       # (n_chan,) 84th percentile - median
    acceptance: jnp.ndarray    # (n_chan,)
    rhat: jnp.ndarray          # (n_chan,) split R-hat of the rp chain
    ess: jnp.ndarray           # (n_chan,) rp effective sample size


@partial(jax.jit, static_argnames=("n_steps", "n_walkers", "n_burn",
                                   "n_quad", "eclipse"))
def sample_channel_posteriors(channel_lc: jnp.ndarray,
                              exp_mid_s: jnp.ndarray, orbit: OrbitParams,
                              ld: jnp.ndarray,
                              rp_init: jnp.ndarray | float,
                              key: jnp.ndarray, *, n_steps: int = 1500,
                              n_walkers: int = 16, n_burn: int = 400,
                              n_quad: int = 32, eclipse: bool = False,
                              rp_geom: jnp.ndarray | float = 0.15,
                              weights: jnp.ndarray | None = None
                              ) -> ChannelPosteriors:
    """EVERY channel's depth posterior in one compiled device program.

    The whole sampler is vmapped over the channel axis — n_chan
    independent 16-walker ensembles advance in lockstep as one batched
    computation, so the per-step work is a single (n_chan * n_walkers)
    batch of transit-model evaluations on the VPU/MXU. This is the
    TPU-native shape serial emcee cannot express: posterior
    transmission spectroscopy of a full visit in one dispatch.

    ``channel_lc`` (n_exp, n_chan) should already be detrended
    (ramp_detrend / common_mode_correct / shift_detrend); each channel
    is modelled as c * T(t; rp) with a free per-channel noise scale:
    theta = (c, rp, log_sigma). ``ld`` may be shared (4,) or
    per-channel (n_chan, 4) Claret coefficients (chromatic limb
    darkening — see fit_depths). ``eclipse=True`` samples per-channel
    Fp/Fs instead (model c * (1 + fp * vis) at the geometric radius
    ``rp_geom``; ``rp_init`` then seeds the per-channel fp).
    ``weights`` is an optional (n_exp,) keep mask shared by all
    channels (see sample_white_posterior).
    """
    if not 0 <= n_burn < n_steps:
        raise ValueError(f"n_burn ({n_burn}) must be < n_steps "
                         f"({n_steps}) — nothing would remain after "
                         "burn-in")
    lcs = jnp.asarray(channel_lc, jnp.float32).T       # (n_chan, n_exp)
    t = jnp.asarray(exp_mid_s, jnp.float32)
    w = (jnp.ones_like(t) if weights is None
         else jnp.asarray(weights, jnp.float32))
    n_kept = jnp.sum(w)
    n_chan = lcs.shape[0]
    z, in_front = projected_separation(t, orbit)

    depth_lo, depth_hi = (-0.02, 0.1) if eclipse else (0.01, 0.5)
    lo = jnp.array([0.2, depth_lo, jnp.log(1e-6)], jnp.float32)
    hi = jnp.array([5.0, depth_hi, jnp.log(0.1)], jnp.float32)
    rp0 = jnp.broadcast_to(jnp.asarray(rp_init, jnp.float32), (n_chan,))
    vis = (eclipse_visibility(z, in_front,
                              jnp.asarray(rp_geom, jnp.float32))
           if eclipse else None)
    ld = jnp.asarray(ld, jnp.float32)
    ld_chan = jnp.broadcast_to(ld if ld.ndim == 2 else ld[None, :],
                               (n_chan, 4))

    def one(lc, rp_c, ld_c, k):
        def log_prob(theta):
            inside = jnp.all((theta > lo) & (theta < hi))
            if eclipse:
                m = theta[0] * (1.0 + theta[1] * vis)
            else:
                f = transit_depth_curve(z, theta[1], ld_c, n_quad)
                m = theta[0] * (1.0 - (1.0 - f) * in_front)
            loglike = (-0.5 * jnp.sum(w * ((m - lc)
                                           / jnp.exp(theta[2])) ** 2)
                       - n_kept * theta[2])
            return jnp.where(inside, loglike, -jnp.inf)

        mu = jnp.sum(w * lc) / jnp.maximum(n_kept, 1.0)
        sigma0 = jnp.clip(jnp.sqrt(
            jnp.sum(w * (lc - mu) ** 2) / jnp.maximum(n_kept - 1.0, 1.0)),
            1e-5, 0.05)
        center = jnp.clip(jnp.stack([mu, rp_c, jnp.log(sigma0)]),
                          lo + 1e-4, hi - 1e-4)
        k_init, k_run = jax.random.split(k)
        scale = jnp.array([3e-4, 1e-3, 0.05], jnp.float32)
        init = center[None, :] + scale[None, :] * jax.random.normal(
            k_init, (n_walkers, 3))
        init = jnp.clip(init, lo + 1e-5, hi - 1e-5)
        chain = ensemble_sample(log_prob, init, k_run, n_steps)
        diag = chain_diagnostics(chain.samples[n_burn:])
        kept = chain.samples[n_burn:, :, 1].reshape(-1)
        q16, q50, q84 = jnp.percentile(kept,
                                       jnp.array([16.0, 50.0, 84.0]))
        return (q50, q50 - q16, q84 - q50, chain.acceptance,
                diag.rhat[1], diag.ess[1])

    keys = jax.random.split(jnp.asarray(key), n_chan)
    med, minus, plus, acc, rhat, ess = jax.vmap(one)(lcs, rp0, ld_chan,
                                                     keys)
    return ChannelPosteriors(rp_median=med, rp_minus=minus,
                             rp_plus=plus, acceptance=acc,
                             rhat=rhat, ess=ess)


@_register
@dataclass
class ProgramPosterior:
    """Joint program posterior (sample_program_posterior)."""

    rp_median: jnp.ndarray       # (n_chan,) shared spectrum medians
    rp_minus: jnp.ndarray        # median - 16th percentile
    rp_plus: jnp.ndarray         # 84th - median
    t0_median_s: jnp.ndarray     # (n_vis,) per-visit mid-time offsets
    t0_minus_s: jnp.ndarray
    t0_plus_s: jnp.ndarray
    samples: jnp.ndarray         # (n_kept * n_walkers, ndim) flattened
    acceptance: jnp.ndarray
    rhat: jnp.ndarray            # (ndim,) split R-hat
    ess: jnp.ndarray             # (ndim,)


@partial(jax.jit, static_argnames=("n_steps", "n_walkers", "n_burn",
                                   "n_quad", "t0_window_s"))
def sample_program_posterior(channel_lc: jnp.ndarray,
                             exp_mid_s: jnp.ndarray,
                             orbit: OrbitParams, ld: jnp.ndarray,
                             rp_init: jnp.ndarray,
                             t0_init_s: jnp.ndarray,
                             sigma: jnp.ndarray,
                             n_oot: jnp.ndarray,
                             key: jnp.ndarray, *,
                             n_steps: int = 2000,
                             n_walkers: int = 0, n_burn: int = 500,
                             n_quad: int = 32,
                             t0_window_s: float = 1800.0
                             ) -> ProgramPosterior:
    """Joint posterior over a multi-visit program: ONE shared
    per-channel Rp/Rs spectrum + per-visit transit-time offsets.

    The TTV measurement the joint LM retrieval points at
    (retrieval.retrieve_transmission_joint) ships with a POSTERIOR:
    theta = [rp (K), dt0_s (V), b (V*K per-visit-channel baselines),
    log s (global noise rescale)], sampled with the same Goodman-Weare
    machinery as the single-visit posteriors, one compiled program.
    The per-(visit, channel) baseline scales carry a Gaussian prior of
    width sigma_vc/sqrt(N_oot_v) — the OOT-normalisation uncertainty —
    so marginalising them reproduces fit_depths' baseline_var
    inflation instead of ignoring it.

    Args:
      channel_lc: (V, n_exp, K) OOT-normalised channel light curves.
      exp_mid_s: (V, n_exp) exposure mid-times, each on ITS OWN
        visit's clock consistent with ``orbit`` (the assumed
        ephemeris).
      ld: (4,) shared or (K, 4) per-channel limb darkening.
      rp_init / t0_init_s: LM solution (seeds the walker ball; chi2(t0)
        is multimodal so a GOOD seed — grid-refined, as the joint LM
        provides — is required, the stretch move cannot hop basins).
      sigma: (V, K) per-point noise of the normalised curves.
      n_oot: (V,) out-of-transit exposure counts (baseline prior).
    """
    import dataclasses as _dc

    lc = jnp.asarray(channel_lc, jnp.float32)
    V, n_exp, K = lc.shape
    t = jnp.asarray(exp_mid_s, jnp.float32)
    sig = jnp.asarray(sigma, jnp.float32)
    ld = jnp.asarray(ld, jnp.float32)
    ld_chan = jnp.broadcast_to(ld if ld.ndim == 2 else ld[None, :],
                               (K, 4))
    ndim = K + V + V * K + 1
    if n_walkers == 0:
        n_walkers = 2 * ndim + (2 * ndim) % 2 + 8
    if not 0 <= n_burn < n_steps:
        raise ValueError("n_burn must be < n_steps")
    b_sig = (sig / jnp.sqrt(jnp.maximum(
        jnp.asarray(n_oot, jnp.float32), 1.0))[:, None])   # (V, K)

    def log_prob(theta):
        rp = theta[:K]
        dt0 = theta[K: K + V]
        b = theta[K + V: K + V + V * K].reshape(V, K)
        log_s = theta[-1]
        inside = (jnp.all((rp > 0.01) & (rp < 0.5))
                  & jnp.all(jnp.abs(dt0) < 3.0 * t0_window_s)
                  & jnp.all(jnp.abs(b - 1.0) < 0.05)
                  & (jnp.abs(log_s) < 2.0))
        s = jnp.exp(log_s)

        def visit_ll(t_v, lc_v, sig_v, dt0_v, b_v):
            orb = _dc.replace(orbit, t0_s=orbit.t0_s + dt0_v)
            z, infr = projected_separation(t_v, orb)
            f = jax.vmap(lambda r, l: transit_depth_curve(
                z, r, l, n_quad))(rp, ld_chan)             # (K, n_exp)
            model = (1.0 - (1.0 - f) * infr[None, :]).T    # (n_exp, K)
            model = model * b_v[None, :]
            r = (model - lc_v) / (sig_v[None, :] * s)
            return -0.5 * jnp.sum(r * r)

        ll = jnp.sum(jax.vmap(visit_ll)(t, lc, sig, dt0, b))
        ll = ll - (V * n_exp * K) * log_s
        ll = ll - 0.5 * jnp.sum(((b - 1.0) / b_sig) ** 2)
        return jnp.where(inside, ll, -jnp.inf)

    center = jnp.concatenate([
        jnp.clip(jnp.asarray(rp_init, jnp.float32), 0.011, 0.49),
        jnp.asarray(t0_init_s, jnp.float32),
        jnp.ones(V * K, jnp.float32), jnp.zeros(1, jnp.float32)])
    scale = jnp.concatenate([
        jnp.full((K,), 1e-3, jnp.float32),
        jnp.full((V,), 5.0, jnp.float32),
        (0.3 * b_sig).ravel(), jnp.full((1,), 0.05, jnp.float32)])
    k_init, k_run = jax.random.split(jnp.asarray(key))
    init = center[None, :] + scale[None, :] * jax.random.normal(
        k_init, (n_walkers, ndim))

    chain = ensemble_sample(log_prob, init, k_run, n_steps)
    diag = chain_diagnostics(chain.samples[n_burn:])
    kept = chain.samples[n_burn:].reshape(-1, ndim)
    q = jnp.percentile(kept, jnp.array([16.0, 50.0, 84.0]),
                       axis=0)                              # (3, ndim)
    return ProgramPosterior(
        rp_median=q[1, :K], rp_minus=q[1, :K] - q[0, :K],
        rp_plus=q[2, :K] - q[1, :K],
        t0_median_s=q[1, K: K + V],
        t0_minus_s=q[1, K: K + V] - q[0, K: K + V],
        t0_plus_s=q[2, K: K + V] - q[1, K: K + V],
        samples=kept, acceptance=chain.acceptance,
        rhat=diag.rhat, ess=diag.ess)
