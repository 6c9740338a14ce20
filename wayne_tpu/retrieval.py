"""Differentiable forward-model retrieval: fit THROUGH the simulator.

Classic WFC3 analyses (and the reference's validation loop — reference:
wayne paper workflow, simulate -> reduce -> fit an ANALYTIC transit
model) fit each channel light curve with a parametric model that knows
nothing about the instrument: PSF cross-talk between channels, the
wavelength-dependent flat, non-linearity, diluting background and beam
contamination all have to be removed (or ignored) before the fit.

Because this framework's forward model is a pure JAX program, we can do
what the reference never could: fit the transmission spectrum (and
optional ramp nuisances) DIRECTLY to the extracted counts by
Levenberg-Marquardt with exact ``jacfwd`` Jacobians THROUGH the full
exposure engine — trace, deposit matrix, moving-PSF splat, flat, sky,
dark, non-linearity, up-the-ramp sampling and the extraction estimator
itself. Zero model mismatch by construction: the model IS the
simulator, run with the stochastic noise sources switched off.

TPU notes:
  - forward passes keep the visit inside one jit (lax.map over chunks,
    extraction fused per chunk so (N, NR, S, S) read stacks are never
    materialised; jacfwd tangents multiply the per-chunk working set by
    n_params, so the retrieval ``chunk`` default is small);
  - the tiny (p, p) normal-equation solve runs in float64 NumPy on the
    host — near-singular LS on the TPU MXU is destroyed by bf16 input
    rounding (CLAUDE.md), and p ~ 10-30 makes the host solve free.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from wayne_tpu.calibration import Tables
from wayne_tpu.config import ExposureStatic
from wayne_tpu.ops.dispersion import trace_params, wl_to_x
from wayne_tpu.ops.exposure import simulate_exposure
from wayne_tpu.ops.visit import pad_scenes
from wayne_tpu.reduction import _channel_edges, out_of_transit_mask
from wayne_tpu.scene import Scene


@dataclass
class RetrievalResult:
    """Forward-model retrieval output.

    ``rp``/``rp_sigma`` hold the fitted per-channel DEPTH parameter:
    Rp/Rs in transit mode, Fp/Fs in eclipse mode.
    """

    rp: np.ndarray          # (n_chan,) fitted Rp/Rs (or Fp/Fs) per channel
    rp_sigma: np.ndarray    # (n_chan,) 1-sigma from the J^T J curvature
    chi2: float             # final chi^2 over all (exposure, channel) points
    n_points: int           # number of residual points
    n_iter: int             # LM iterations actually run
    ramp: np.ndarray | None     # fitted [slope/s, hook_amp] if fit_ramp
    ramp_sigma: np.ndarray | None
    scan_offset: float | None = None        # fitted reverse-scan flux
    scan_offset_sigma: float | None = None  # offset if fit_scan_offset
    spot_scale: float | None = None         # fitted spot-deficit scale
    #                           (fit_spots): 0 = immaculate star, 1 =
    #                           the Scene's spots at full strength
    spot_scale_sigma: float | None = None
    constrained: np.ndarray | None = None   # (n_chan,) quality flag
    #                           (reduction.constrained_mask): False for
    #                           channels the data cannot constrain


def deterministic_cfg(cfg: ExposureStatic) -> ExposureStatic:
    """The model twin of a data config: same physics, no stochasticity.

    Keeps every DETERMINISTIC effect the data had (flat, sky, dark,
    non-linearity, bias, gain structure, IPC, SSV sinusoid, visit
    trend) so the model predicts the expected counts of the data chain,
    and disables the sampled ones (photon/read noise, cosmic rays,
    per-read bias wander). Pallas is forced off: the fused kernels
    sample in-kernel and are not differentiable.
    """
    noise = dataclasses.replace(
        cfg.noise, poisson=False, read_noise=False, cosmic_rays=False,
        bias_drift=False)
    return dataclasses.replace(cfg, noise=noise, use_pallas=False,
                               exact_poisson=False, compute_ideal=False)


def deterministic_scenes(scenes: Scene) -> Scene:
    """Zero the stochastic trend components of a batched Scene.

    The random-walk SSV is a per-exposure draw from Scene.key: the
    model must not inject its OWN realisation of a noise process, so
    its amplitude is zeroed (the deterministic SSV sinusoid stays).
    """
    trends = dataclasses.replace(
        scenes.trends, ssv_rw_amp=jnp.zeros_like(scenes.trends.ssv_rw_amp))
    return dataclasses.replace(scenes, trends=trends)


def bin_channel_map(scenes: Scene, tables: Tables,
                    x_window: tuple[int, int], n_chan: int
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Host-side wavelength-bin -> channel assignment.

    Uses exposure 0's pointing (drift is sub-pixel; channels are tens
    of columns wide). Returns (idx (NL,) int, in_window (NL,) bool):
    bins whose trace column falls outside ``x_window`` keep their
    initial rp (they only contribute off-window flux).
    Every channel must own at least one bin center, else the Jacobian
    column is identically zero and the fit is singular — raise early.
    """
    x0 = jax.tree_util.tree_map(lambda x: x[0], scenes)
    tp = trace_params(tables, x0.x_ref, x0.y_ref)
    xc = np.asarray(wl_to_x(tables.wl_centers, tp), np.float64)
    edges = np.asarray(_channel_edges(x_window, n_chan), np.float64)
    idx = np.clip(np.searchsorted(edges, xc, side="right") - 1,
                  0, n_chan - 1).astype(np.int32)
    in_win = (xc >= edges[0]) & (xc < edges[-1])
    owned = np.bincount(idx[in_win], minlength=n_chan)
    if np.any(owned == 0):
        empty = np.nonzero(owned == 0)[0]
        raise ValueError(
            f"channels {empty.tolist()} contain no wavelength-bin centers "
            f"(n_lambda={xc.size} over window {x_window}); reduce n_chan "
            f"or raise n_lambda")
    return idx, in_win


@partial(jax.jit, static_argnames=("cfg", "chunk", "estimator",
                                   "y_window"))
def forward_spectra(scenes: Scene, tables: Tables, cfg: ExposureStatic,
                    chunk: int = 2, estimator: str = "cds",
                    y_window: tuple[int, int] | None = None) -> jnp.ndarray:
    """Expected extracted spectra (n_exp, S) of a visit, differentiably.

    Mirrors ops/visit.simulate_visit but fuses the extraction into the
    per-chunk body so the (N, NR, S, S) read stack never exists as a
    whole-visit array — under jacfwd every intermediate is multiplied
    by the tangent count, so this is what keeps retrieval in memory.

    ``estimator``: "cds" (last - zeroth read, column-summed) or "ramp"
    (calwf3-style least-squares slope x exposure time) — must match
    how the observed spectra were produced. ``y_window`` restricts the
    column sum to rows [y0, y1) — the DATA must be summed over the
    same rows (a narrower window trades a little signal for much less
    accumulated read noise / background variance per column).
    """
    padded, n = pad_scenes(scenes, chunk)
    n_pad = jax.tree_util.tree_leaves(padded)[0].shape[0]
    chunked = jax.tree_util.tree_map(
        lambda x: x.reshape((n_pad // chunk, chunk) + x.shape[1:]), padded)

    def one(s: Scene) -> jnp.ndarray:
        reads = simulate_exposure(s, tables, cfg).reads_dn   # (NR, S, S)
        if estimator == "ramp":
            from wayne_tpu.reduction import ramp_slope_frame

            # already CDS-equivalent: slope x (t_N - t_0)
            net = ramp_slope_frame(reads, tables.read_times)
        else:
            net = reads[-1] - reads[0]
        if y_window is not None:
            net = net[y_window[0]: y_window[1]]
        return net.sum(axis=0)                               # (S,)

    spectra = jax.lax.map(jax.vmap(one), chunked)
    return spectra.reshape(n_pad, -1)[:n]


def _bin_channels(spectra: jnp.ndarray, edges: jnp.ndarray) -> jnp.ndarray:
    """(n_exp, S) column spectra -> (n_exp, n_chan) channel sums."""
    cum = jnp.concatenate(
        [jnp.zeros((spectra.shape[0], 1), spectra.dtype),
         jnp.cumsum(spectra, axis=1)], axis=1)
    return cum[:, edges[1:]] - cum[:, edges[:-1]]


def _normalise_oot(chan: jnp.ndarray, oot: jnp.ndarray) -> jnp.ndarray:
    base = (chan * oot[:, None]).sum(axis=0) / jnp.maximum(oot.sum(), 1.0)
    return chan / base[None, :]


@partial(jax.jit, static_argnames=("cfg", "chunk", "estimator", "y_window",
                                   "n_rp", "eclipse", "fit_t0", "fit_ramp",
                                   "fit_scan_offset", "fit_spots",
                                   "with_jac"))
def _lm_val_jac(theta, scenes_m, tables, data_chan, oot, sigma_j, idx,
                in_win, d_fixed, rev_mask, edges, *, cfg, chunk, estimator,
                y_window, n_rp, eclipse, fit_t0, fit_ramp,
                fit_scan_offset, fit_spots=False, with_jac):
    """Residuals (and with ``with_jac`` the jacfwd Jacobian) of one
    visit's forward-model fit, as ONE module-level jitted program.

    Hoisted out of retrieve_transmission / retrieve_transmission_joint
    so repeated retrievals — the sigma-calibration ensembles call the
    fit once per realisation — hit jax.jit's cache instead of
    re-tracing the whole jacfwd program per call (CLAUDE.md: never
    build jax.jit(closure) inside a per-realisation loop; measured as
    one ~40 s retrace per realisation on the remote TPU compiler).
    Statics pin the program structure; everything data-like is traced.

    theta layout: [depths (n_rp)] (+ [dt0_s] if fit_t0)
    (+ [visit_slope_per_s, hook_amp] if fit_ramp)
    (+ [scan_offset] if fit_scan_offset) (+ [spot_scale] if
    fit_spots — one scale on the Scene's spot deficit, contrast ->
    1 - s*(1 - contrast0): s=0 is an immaculate star, s=1 the Scene's
    spots at full strength; the chromatic deficit PROFILE and the
    spot geometry come from the Scene). ``d_fixed`` is the (NL,)
    out-of-window spectrum the fit holds fixed (rp_over_rs in transit
    mode, fp_over_fs in eclipse mode); ``rev_mask`` is traced but dead
    unless fit_scan_offset.
    """

    def resid(th):
        th = th.astype(jnp.float32)
        n_exp = data_chan.shape[0]
        d_chan = th[:n_rp]
        if eclipse:
            fp_bin = in_win * d_chan[idx] + (1.0 - in_win) * d_fixed
            sc = dataclasses.replace(
                scenes_m, fp_over_fs=jnp.broadcast_to(
                    fp_bin[None], (n_exp, fp_bin.size)))
        else:
            rp_bin = in_win * d_chan[idx] + (1.0 - in_win) * d_fixed
            sc = dataclasses.replace(
                scenes_m, rp_over_rs=jnp.broadcast_to(
                    rp_bin[None], (n_exp, rp_bin.size)))
        k = n_rp
        if fit_t0:
            orb = dataclasses.replace(
                sc.orbit, t0_s=sc.orbit.t0_s + th[k])
            sc = dataclasses.replace(sc, orbit=orb)
            k += 1
        if fit_ramp:
            tr = dataclasses.replace(
                sc.trends,
                visit_slope_per_s=jnp.broadcast_to(
                    th[k], sc.trends.visit_slope_per_s.shape),
                hook_amp=jnp.broadcast_to(
                    th[k + 1], sc.trends.hook_amp.shape))
            sc = dataclasses.replace(sc, trends=tr)
            k += 2
        if fit_scan_offset:
            # achromatic source-flux scale on reverse exposures — the
            # same mechanism Observation uses to SIMULATE the offset,
            # so the nuisance has zero model mismatch; companions are
            # scanned sources and scale identically
            fac = 1.0 + th[k] * rev_mask                 # (n_exp,)
            sc = dataclasses.replace(
                sc, stellar_flux=sc.stellar_flux * fac[:, None],
                companions=(None if sc.companions is None else
                            dataclasses.replace(
                                sc.companions,
                                flux=sc.companions.flux
                                * fac[:, None, None])))
            k += 1
        if fit_spots:
            # one scale on the Scene's spot deficit: contrast ->
            # 1 - s*(1 - contrast0). The geometry/chromatic profile
            # come from the Scene; s is fitted THROUGH the simulator
            # (crossing bump + unocculted dilution both respond).
            sp = sc.spots
            contrast = 1.0 - th[k] * (1.0 - sp.contrast)
            sc = dataclasses.replace(
                sc, spots=dataclasses.replace(sp, contrast=contrast))
        model = forward_spectra(sc, tables, cfg, chunk, estimator,
                                y_window)
        model_chan = _normalise_oot(_bin_channels(model, edges), oot)
        return ((model_chan - data_chan) / sigma_j[None, :]).ravel()

    if with_jac:
        return resid(theta), jax.jacfwd(resid)(theta)
    return resid(theta)


def _channel_chi_scale(r: np.ndarray, n_exp: int, n_chan: int,
                       n_par: int) -> np.ndarray:
    """Per-channel residual-rms rescale factors for the reported sigma.

    The per-channel noise prior sigma_j is estimated from only the
    ~N_oot out-of-transit points, so it carries ~1/sqrt(2 N_oot)
    sampling error per channel (±21% at N_oot=12) — and a channel
    whose prior drew low reports a too-small rp_sigma while its
    realised scatter is unchanged (the retrieval-mode ensemble caught
    exactly this: single-channel ratios to 1.9 with a GLOBAL chi2/dof
    rescale, which cannot fix a per-channel weighting error). The cure
    is the per-channel reduced chi2: each channel's parameters scale by
    the rms of that channel's own standardised residuals over ALL
    n_exp points. dof per channel: n_exp minus its depth parameter,
    minus its share of the shared nuisances, minus the OOT baseline
    normalisation it consumed.
    """
    res = r.reshape(n_exp, n_chan)
    dof_c = max(n_exp - 2.0 - (n_par - n_chan) / n_chan, 1.0)
    return np.sqrt(np.maximum((res**2).sum(axis=0) / dof_c, 1e-12))


def _baseline_var_extra(J: np.ndarray, A: np.ndarray,
                        blocks: list) -> np.ndarray:
    """OOT-normalisation variance of the fitted parameters.

    The observed channel curves are normalised by their own noisy
    out-of-transit means (_normalise_oot); that per-channel relative
    baseline error eps_c rescales the whole curve coherently, which the
    residual-based curvature cannot see — the exact analogue of
    reduction.fit_depths' ``baseline_var`` term (measured there: true
    scatter inflated ~sqrt(1 + N_in_eff/N_oot); here the retrieval-mode
    ensemble measured ratios up to ~2.3 and 1-sigma coverage 0.50
    before this term). Delta method: a perturbation eps_c moves the
    minimiser by -A Jᵀ (∂r/∂eps_c) eps_c with ∂r/∂eps_c =
    data_chan[:, c]/sigma_c on channel-c rows, var(eps_c) =
    sigma_c²/N_oot. ``blocks`` is [(row0, data_chan (n_exp, n_chan)
    np, n_oot, sigma (n_chan,) np, scale (n_chan,) np), ...] — one
    entry per visit; residual rows are laid out (exposure, channel)
    row-major from ``row0``; ``scale`` is the per-channel residual-rms
    correction (_channel_chi_scale) so var(eps_c) uses the REALISED
    noise, not the OOT prior. Returns the extra VARIANCE per parameter.
    """
    extra = np.zeros(A.shape[0])
    JT = J.T
    for row0, data_chan, n_oot, sigma, scale in blocks:
        n_exp, n_chan = data_chan.shape
        for c in range(n_chan):
            u = np.zeros(J.shape[0])
            u[row0 + c: row0 + n_exp * n_chan: n_chan] = (
                data_chan[:, c] / sigma[c])
            v = A @ (JT @ u)
            extra += v**2 * ((sigma[c] * scale[c])**2 / max(n_oot, 1.0))
    return extra


def retrieve_transmission(spectra_obs: jnp.ndarray, scenes: Scene,
                          tables: Tables, cfg: ExposureStatic, *,
                          x_window: tuple[int, int], n_chan: int = 8,
                          rp_init: float | np.ndarray = 0.12,
                          estimator: str = "cds",
                          y_window: tuple[int, int] | None = None,
                          fit_ramp: bool = False,
                          fit_scan_offset: bool = False,
                          fit_spots: bool = False,
                          mode: str = "transit",
                          n_lm: int = 10, chunk: int = 2,
                          sigma: np.ndarray | None = None
                          ) -> RetrievalResult:
    """Fit the transmission spectrum through the full forward model.

    Args:
      spectra_obs: (n_exp, S) OBSERVED extracted spectra — raw column
        sums (over all rows, or over ``y_window`` rows if given) of
        the same estimator (``"cds"`` or ``"ramp"``) this function
        will apply to the model. No background subtraction, no flat
        fielding, no detrending: the forward model predicts the raw
        expectation including all of those.
      scenes: the visit's batched Scene with the TRUE observing state
        (pointing, times, scan, trends). ``rp_over_rs`` is the initial
        spectrum; bins outside ``x_window`` keep it.
      cfg: the DATA config (the stochastic twin is derived internally).
      x_window / n_chan: dispersion-direction channel definition
        (identical convention to reduction._channel_edges).
      rp_init: scalar or (n_chan,) starting depth — Rp/Rs in transit
        mode, Fp/Fs in eclipse mode (e.g. a white fit).
      fit_ramp: additionally fit [visit_slope_per_s, hook_amp] —
        requires cfg.noise.visit_trend; the hook timescale/orbit-1
        scale stay at their Scene values.
      fit_scan_offset: additionally fit the reverse-scan flux offset
        (the WFC3 upstream/downstream effect) as one achromatic
        nuisance — reverse exposures' source flux is scaled by
        1 + offset inside the forward model. Requires a
        forward/reverse alternating visit (both scan_speed signs
        present in ``scenes``). Starts at 0 even when the Scene
        already carries an offset: the Scene's stellar_flux baked in
        whatever the YAML simulated, so the fitted value is the
        offset of the DATA relative to the YAML (0 when the YAML
        matches the data).
      fit_spots: additionally fit one spot-deficit scale s (contrast
        -> 1 - s*(1 - contrast0)): the Scene supplies the spot
        geometry and chromatic deficit profile, the data pull the
        amplitude from a spot-blind s = 0 start. The crossing bump
        AND the unocculted chromatic dilution both inform s because
        the fit runs through the simulator (ops/spots.py). Requires
        scenes.spots.
      mode: "transit" fits the per-channel Rp/Rs transmission
        spectrum; "eclipse" fits the per-channel Fp/Fs dayside
        emission spectrum (requires cfg.eclipse and secondary-eclipse
        coverage in the visit; the Scene's rp_over_rs stays fixed as
        the occulting geometry).
      sigma: per-channel noise of the NORMALISED channel light curves;
        default = out-of-transit scatter of the data.

    Returns RetrievalResult (host NumPy).
    """
    spectra_obs = jnp.asarray(spectra_obs, jnp.float32)
    n_exp = spectra_obs.shape[0]
    n_scenes = jax.tree_util.tree_leaves(scenes)[0].shape[0]
    if n_exp != n_scenes:
        raise ValueError(f"spectra_obs has {n_exp} exposures but scenes "
                         f"has {n_scenes}")
    if fit_ramp and not cfg.noise.visit_trend:
        raise ValueError("fit_ramp requires cfg.noise.visit_trend")
    if fit_spots and scenes.spots is None:
        raise ValueError("fit_spots requires scenes.spots (the Scene "
                         "must carry a SpotParams set whose deficit "
                         "the scale multiplies)")
    if mode not in ("transit", "eclipse"):
        raise ValueError(f"mode must be 'transit' or 'eclipse', got {mode!r}")
    eclipse = mode == "eclipse"
    if eclipse and not cfg.eclipse:
        raise ValueError("mode='eclipse' needs a cfg with eclipse=True "
                         "(the visit must model planet dayside light)")

    cfg_m = deterministic_cfg(cfg)
    scenes_m = deterministic_scenes(scenes)
    idx_np, in_win_np = bin_channel_map(scenes, tables, x_window, n_chan)
    idx = jnp.asarray(idx_np)
    in_win = jnp.asarray(in_win_np, jnp.float32)
    edges = _channel_edges(x_window, n_chan)
    rp_fixed = scenes.rp_over_rs[0]                           # (NL,)
    fp_fixed = scenes.fp_over_fs[0]                           # (NL,)

    orbit0 = jax.tree_util.tree_map(lambda x: x[0], scenes.orbit)
    exptime = float(tables.read_times[-1])
    mid = scenes.exp_start_s + 0.5 * exptime
    oot = out_of_transit_mask(mid, orbit0).astype(jnp.float32)
    if float(oot.sum()) < 2:
        raise ValueError("fewer than 2 out-of-transit exposures — the "
                         "channel light curves cannot be normalised")
    if eclipse:
        # Without occultation coverage Fp/Fs is exactly degenerate with
        # the per-channel normalisation — fail loudly up front.
        from wayne_tpu.ops.kepler import projected_separation
        from wayne_tpu.ops.transit import eclipse_visibility

        z_t, infr_t = projected_separation(mid, orbit0)
        vis = eclipse_visibility(z_t, infr_t,
                                 jnp.mean(rp_fixed))
        if float(jnp.max(vis) - jnp.min(vis)) < 0.1:
            raise ValueError("no secondary-eclipse coverage in this "
                             "visit (planet visibility barely changes) "
                             "— Fp/Fs cannot be separated from the "
                             "baseline")

    data_chan = _normalise_oot(_bin_channels(spectra_obs, edges), oot)
    if sigma is None:
        n_oot = jnp.maximum(oot.sum(), 2.0)
        mean = (data_chan * oot[:, None]).sum(0) / n_oot
        var = (((data_chan - mean[None, :]) ** 2) * oot[:, None]
               ).sum(0) / (n_oot - 1.0)
        sigma_j = jnp.sqrt(jnp.maximum(var, 1e-12))
    else:
        sigma_j = jnp.asarray(sigma, jnp.float32)

    n_rp = n_chan
    theta0 = np.full(n_rp, float(np.mean(rp_init)), np.float64)
    if np.ndim(rp_init) == 1:
        theta0[:] = np.asarray(rp_init, np.float64)
    if fit_ramp:
        t0 = scenes.trends
        theta0 = np.concatenate([theta0, [
            float(np.asarray(t0.visit_slope_per_s).ravel()[0]),
            float(np.asarray(t0.hook_amp).ravel()[0])]])
    rev_mask = jnp.zeros((n_exp,), jnp.float32)   # dead unless fitted
    if fit_scan_offset:
        rev_np = np.asarray(scenes.scan_speed) < 0
        if rev_np.all() or not rev_np.any():
            raise ValueError(
                "fit_scan_offset needs a forward/reverse alternating "
                "visit (scenes.scan_speed carries only one sign)")
        rev_mask = jnp.asarray(rev_np, jnp.float32)
        theta0 = np.concatenate([theta0, [0.0]])
    if fit_spots:
        # start spot-blind (s = 0): the fit demonstrates the DATA pull
        # the deficit up to the Scene's amplitude
        theta0 = np.concatenate([theta0, [0.0]])

    # One cached module-level program (no per-call jit closures): the
    # traced operands + static program shape route through _lm_val_jac.
    traced = (scenes_m, tables, data_chan, oot, sigma_j, idx, in_win,
              fp_fixed if eclipse else rp_fixed, rev_mask, edges)
    statics = dict(cfg=cfg_m, chunk=chunk, estimator=estimator,
                   y_window=y_window, n_rp=n_rp, eclipse=eclipse,
                   fit_t0=False, fit_ramp=fit_ramp,
                   fit_scan_offset=fit_scan_offset, fit_spots=fit_spots)

    def val_jac(th):
        return _lm_val_jac(th, *traced, with_jac=True, **statics)

    def resid_only(th):
        return _lm_val_jac(th, *traced, with_jac=False, **statics)

    theta = theta0.copy()
    r, J = (np.asarray(a, np.float64) for a in val_jac(jnp.asarray(theta)))
    chi2 = float(r @ r)
    lam, n_iter = 1e-3, 0
    for _ in range(n_lm):
        n_iter += 1
        JtJ = J.T @ J
        g = J.T @ r
        step = np.linalg.solve(JtJ + lam * np.diag(np.diag(JtJ))
                               + 1e-12 * np.eye(JtJ.shape[0]), g)
        cand = theta - step
        r_c = np.asarray(resid_only(jnp.asarray(cand)), np.float64)
        chi2_c = float(r_c @ r_c)
        if chi2_c < chi2:
            rel = np.max(np.abs(step) / np.maximum(np.abs(theta), 1e-8))
            theta, chi2 = cand, chi2_c
            lam = max(lam * 0.3, 1e-7)
            r, J = (np.asarray(a, np.float64)
                    for a in val_jac(jnp.asarray(theta)))
            if rel < 1e-7:
                break
        else:
            lam *= 10.0
            if lam > 1e6:
                break

    # Curvature errors at the solution (raw map — no clipping inside
    # the differentiated quantities; CLAUDE.md delta-method rule),
    # PER-CHANNEL residual-rescaled (_channel_chi_scale: the OOT-only
    # sigma_j prior carries ±21% sampling error per channel, which a
    # global chi2/dof cannot fix) and carrying the OOT-normalisation
    # term (_baseline_var_extra). The retrieval_mode calibration
    # ensemble (tools/validate_recovery.py) gates the result.
    A = np.linalg.pinv(J.T @ J)
    scale_c = _channel_chi_scale(r, n_exp, n_rp, theta.size)
    extra = _baseline_var_extra(
        J, A, [(0, np.asarray(data_chan, np.float64), float(oot.sum()),
                np.asarray(sigma_j, np.float64), scale_c)])
    sig = np.sqrt(np.maximum(np.diag(A), 0.0))
    sig[:n_rp] *= scale_c
    if theta.size > n_rp:
        sig[n_rp:] *= np.sqrt(chi2 / max(r.size - theta.size, 1))
    sig = np.sqrt(sig**2 + extra)
    from wayne_tpu.reduction import constrained_mask

    ok = np.asarray(constrained_mask(
        theta[:n_rp], sig[:n_rp],
        # Fp/Fs contrasts: smaller scale, no Newton clip range
        **(dict(sigma_floor=0.02, bounds=None) if eclipse else {})))
    k = n_rp
    ramp = ramp_sig = None
    if fit_ramp:
        ramp, ramp_sig = theta[k: k + 2].copy(), sig[k: k + 2].copy()
        k += 2
    scan_off = scan_off_sig = None
    if fit_scan_offset:
        scan_off, scan_off_sig = float(theta[k]), float(sig[k])
        k += 1
    spot_s = spot_s_sig = None
    if fit_spots:
        spot_s, spot_s_sig = float(theta[k]), float(sig[k])
    return RetrievalResult(
        rp=theta[:n_rp].copy(), rp_sigma=sig[:n_rp].copy(),
        chi2=chi2, n_points=int(r.size), n_iter=n_iter,
        ramp=ramp, ramp_sigma=ramp_sig,
        scan_offset=scan_off, scan_offset_sigma=scan_off_sig,
        spot_scale=spot_s, spot_scale_sigma=spot_s_sig,
        constrained=ok)


@dataclass
class JointRetrievalResult:
    """Joint multi-visit forward-model retrieval output.

    ``rp``/``rp_sigma`` hold the SHARED fitted per-channel depth:
    Rp/Rs in transit mode, Fp/Fs in eclipse mode.
    """

    rp: np.ndarray           # (n_chan,) SHARED fitted spectrum
    rp_sigma: np.ndarray     # (n_chan,)
    t0_offsets_s: np.ndarray | None        # (n_visits,) fitted per-visit
    #                                        mid-transit offsets from the
    #                                        assumed linear ephemeris
    t0_offsets_sigma_s: np.ndarray | None
    ramp: np.ndarray | None                # (n_visits, 2) [slope/s, hook]
    ramp_sigma: np.ndarray | None
    chi2: float
    n_points: int
    n_iter: int
    constrained: np.ndarray | None = None  # (n_chan,) quality flag
    #                           (reduction.constrained_mask)
    data_chan: list | None = None   # per-visit (n_exp, n_chan) OOT-
    #                           normalised observed channel curves
    model_chan: list | None = None  # per-visit (n_exp, n_chan) forward-
    #                           model channel curves AT THE SOLUTION —
    #                           the template run_retrieve's program
    #                           posterior divides out (instrument
    #                           structure: persistence afterglow,
    #                           trends, cross-talk) before sampling the
    #                           analytic (rp, dt0) geometry around it
    sigma_chan: list | None = None  # per-visit (n_chan,) noise priors


def retrieve_transmission_joint(
        spectra_list: list, scenes_list: list, tables: Tables,
        cfg: ExposureStatic, *, x_window: tuple[int, int],
        n_chan: int = 8, rp_init: float | np.ndarray = 0.12,
        estimator: str = "cds",
        y_window: tuple[int, int] | None = None,
        fit_t0: bool = True, fit_ramp: bool = False,
        t0_window_s: float = 1800.0, mode: str = "transit",
        n_lm: int = 12, chunk: int = 2) -> JointRetrievalResult:
    """Fit ONE transmission spectrum jointly across N visits, with
    per-visit nuisances, through the full forward model.

    The multi-visit analysis the reference's single-visit scope cannot
    express (wayne_tpu.program generates the data side): all visits
    share the per-channel Rp/Rs vector — the physical spectrum does not
    change between epochs — while each visit carries its own

    - mid-transit offset ``dt0_v`` from the assumed linear ephemeris
      (``fit_t0``, default on): the joint fit IS the transit-timing
      measurement, so a drifting true ephemeris (program
      ``t0_drift_s_per_visit``) shows up directly in
      ``t0_offsets_s`` while sharing every photon with the spectrum
      estimate. chi2(t0) is NONCONVEX (CLAUDE.md): each visit's dt0
      is grid-seeded over ±``t0_window_s`` before LM refines — a cold
      start at 0 has ~zero gradient once the true transit has walked
      past the ingress scale and would silently return dt0 ≈ 0;
    - optional ``[visit_slope, hook_amp]`` trend pair (``fit_ramp``).

    Implementation notes (TPU): one jitted residual+Jacobian program is
    traced for the per-visit parameter block ``[rp, own nuisances]``
    and reused across visits (same Scene structure); the global
    Jacobian is assembled block-sparse on the host — a visit's
    residuals have exactly zero derivative against another visit's
    nuisances, so tangent count stays at the single-visit level. The
    tiny LM normal-equation solve stays in float64 NumPy (CLAUDE.md
    bf16 hazard).

    Every visit must share ``cfg``/``tables`` (same instrument mode)
    and the channel window convention. ``mode="eclipse"`` fits one
    SHARED per-channel Fp/Fs dayside spectrum across N
    secondary-eclipse visits instead (requires ``cfg.eclipse`` and
    occultation coverage in every visit; the Scene's ``rp_over_rs``
    stays fixed as the occulting geometry, and ``dt0_v`` becomes the
    per-visit eclipse-timing offset).
    """
    n_vis = len(spectra_list)
    if n_vis != len(scenes_list) or n_vis == 0:
        raise ValueError("need equally many spectra and scenes, >= 1")
    if mode not in ("transit", "eclipse"):
        raise ValueError(f"mode must be 'transit' or 'eclipse', got {mode!r}")
    eclipse = mode == "eclipse"
    if eclipse and not cfg.eclipse:
        raise ValueError("mode='eclipse' needs a cfg with eclipse=True "
                         "(the visit must model planet dayside light)")
    cfg_m = deterministic_cfg(cfg)
    edges = _channel_edges(x_window, n_chan)
    n_rp = n_chan
    n_nuis = (1 if fit_t0 else 0) + (2 if fit_ramp else 0)
    if fit_ramp and not cfg.noise.visit_trend:
        raise ValueError("fit_ramp requires cfg.noise.visit_trend")

    exptime = float(tables.read_times[-1])
    per_visit = []
    for sp, sc in zip(spectra_list, scenes_list):
        sp = jnp.asarray(sp, jnp.float32)
        n_exp = sp.shape[0]
        if n_exp != jax.tree_util.tree_leaves(sc)[0].shape[0]:
            raise ValueError("spectra/scenes exposure mismatch")
        idx_np, in_win_np = bin_channel_map(sc, tables, x_window, n_chan)
        orbit0 = jax.tree_util.tree_map(lambda x: x[0], sc.orbit)
        mid = sc.exp_start_s + 0.5 * exptime
        oot = out_of_transit_mask(mid, orbit0).astype(jnp.float32)
        if float(oot.sum()) < 2:
            raise ValueError("a visit has < 2 out-of-transit exposures")
        if eclipse:
            # without occultation coverage Fp/Fs is exactly degenerate
            # with the per-channel normalisation — fail loudly
            from wayne_tpu.ops.kepler import projected_separation
            from wayne_tpu.ops.transit import eclipse_visibility

            z_t, infr_t = projected_separation(mid, orbit0)
            vis = eclipse_visibility(z_t, infr_t,
                                     jnp.mean(sc.rp_over_rs[0]))
            if float(jnp.max(vis) - jnp.min(vis)) < 0.1:
                raise ValueError("a visit has no secondary-eclipse "
                                 "coverage (planet visibility barely "
                                 "changes) — Fp/Fs cannot be separated "
                                 "from the baseline")
        data_chan = _normalise_oot(_bin_channels(sp, edges), oot)
        # Per-channel noise from FIRST DIFFERENCES of the
        # out-of-transit points (std(diff)/sqrt(2)): immune to smooth
        # baseline structure — a carried-persistence afterglow ramp in
        # visit N's first orbit is REAL signal both the data and the
        # model share, and folding it into a plain OOT scatter inflated
        # sigma ~30x (deflating chi2 and every curvature error with it)
        dn_np = np.asarray(data_chan)
        oot_np = np.asarray(oot) > 0.5
        if oot_np.sum() >= 3:
            diffs = np.diff(dn_np[oot_np, :], axis=0)
            sig_np = diffs.std(axis=0, ddof=1) / np.sqrt(2.0)
        else:
            sig_np = dn_np[oot_np, :].std(axis=0, ddof=1)
        sigma_j = jnp.asarray(np.maximum(sig_np, 1e-6), jnp.float32)
        per_visit.append(dict(
            scenes_m=deterministic_scenes(sc), data_chan=data_chan,
            oot=oot, sigma=sigma_j, idx=jnp.asarray(idx_np),
            in_win=jnp.asarray(in_win_np, jnp.float32),
            rp_fixed=(sc.fp_over_fs[0] if eclipse
                      else sc.rp_over_rs[0]), n_exp=n_exp))

    # Shared module-level jitted program (same cache as the single-visit
    # retrieval): one trace serves every visit AND every ensemble
    # realisation of the same shape.
    statics = dict(cfg=cfg_m, chunk=chunk, estimator=estimator,
                   y_window=y_window, n_rp=n_rp, eclipse=eclipse,
                   fit_t0=fit_t0, fit_ramp=fit_ramp,
                   fit_scan_offset=False)

    def val_jac(tv, *a):
        return _lm_val_jac(tv, *a, with_jac=True, **statics)

    def resid_only(tv, *a):
        return _lm_val_jac(tv, *a, with_jac=False, **statics)

    theta0 = np.full(n_rp, float(np.mean(rp_init)), np.float64)
    if np.ndim(rp_init) == 1:
        theta0[:] = np.asarray(rp_init, np.float64)
    nuis0 = []
    for sc in scenes_list:
        if fit_t0:
            nuis0.append(0.0)
        if fit_ramp:
            tr = sc.trends
            nuis0 += [float(np.asarray(tr.visit_slope_per_s).ravel()[0]),
                      float(np.asarray(tr.hook_amp).ravel()[0])]
    theta = np.concatenate([theta0, np.asarray(nuis0, np.float64)]) \
        if nuis0 else theta0.copy()
    n_par = theta.size

    def visit_args(v):
        pv = per_visit[v]
        rev0 = jnp.zeros((pv["n_exp"],), jnp.float32)
        return (pv["scenes_m"], tables, pv["data_chan"], pv["oot"],
                pv["sigma"], pv["idx"], pv["in_win"], pv["rp_fixed"],
                rev0, edges)

    if fit_t0 and t0_window_s > 0:
        # Grid-seed each visit's dt0 (chi2(t0) is nonconvex; a cold
        # start at 0 sees ~zero gradient once the true transit has
        # walked outside the model transit's support). One forward
        # pass per node per visit at the initial spectrum.
        nodes = np.linspace(-t0_window_s, t0_window_s, 7)
        for v in range(n_vis):
            base_idx = n_rp + v * n_nuis
            best_dt0, best_c = 0.0, np.inf
            for dt0 in nodes:
                tv = np.concatenate([theta[:n_rp],
                                     theta[base_idx: base_idx + n_nuis]])
                tv[n_rp] = dt0
                r_n = np.asarray(resid_only(jnp.asarray(tv),
                                            *visit_args(v)), np.float64)
                c = float(r_n @ r_n)
                if c < best_c:
                    best_dt0, best_c = float(dt0), c
            theta[base_idx] = best_dt0

    def split(th, v):
        base = n_rp + v * n_nuis
        return np.concatenate([th[:n_rp], th[base: base + n_nuis]])

    def full_resid(th):
        return np.concatenate([
            np.asarray(resid_only(jnp.asarray(split(th, v)),
                                  *visit_args(v)), np.float64)
            for v in range(n_vis)])

    def full_val_jac(th):
        rs, Js = [], []
        for v in range(n_vis):
            r_v, J_v = val_jac(jnp.asarray(split(th, v)), *visit_args(v))
            r_v = np.asarray(r_v, np.float64)
            J_v = np.asarray(J_v, np.float64)
            Jg = np.zeros((r_v.size, n_par))
            Jg[:, :n_rp] = J_v[:, :n_rp]
            base = n_rp + v * n_nuis
            Jg[:, base: base + n_nuis] = J_v[:, n_rp:]
            rs.append(r_v)
            Js.append(Jg)
        return np.concatenate(rs), np.concatenate(Js, axis=0)

    r, J = full_val_jac(theta)
    chi2 = float(r @ r)
    lam, n_iter = 1e-3, 0
    for _ in range(n_lm):
        n_iter += 1
        JtJ = J.T @ J
        g = J.T @ r
        step = np.linalg.solve(JtJ + lam * np.diag(np.diag(JtJ))
                               + 1e-12 * np.eye(n_par), g)
        cand = theta - step
        r_c = full_resid(cand)
        chi2_c = float(r_c @ r_c)
        if chi2_c < chi2:
            rel = np.max(np.abs(step) / np.maximum(np.abs(theta), 1e-8))
            theta, chi2 = cand, chi2_c
            lam = max(lam * 0.3, 1e-7)
            r, J = full_val_jac(theta)
            if rel < 1e-7:
                break
        else:
            lam *= 10.0
            if lam > 1e6:
                break

    # Residual-rescaled covariance (the fit_depths convention), per
    # channel: the per-channel sigma_j prior is only an OOT-based
    # estimate with ±1/sqrt(2 N_oot) sampling error — and with
    # carried-persistence ramps in the baseline it can sit far above
    # the realised residual scatter. _channel_chi_scale makes each
    # channel's reported sigma track ITS OWN realised residuals
    # (pooled across visits for the shared spectrum); per-visit
    # nuisances (dt0, trends) rescale by their visit's global reduced
    # chi. Plus the OOT-normalisation term (each visit's channel
    # baselines are independent noisy means; _baseline_var_extra).
    A = np.linalg.pinv(J.T @ J)
    sig = np.sqrt(np.maximum(np.diag(A), 0.0))
    blocks, row0 = [], 0
    scale_sq = np.zeros(n_rp)
    vis_scale = []
    for pv in per_visit:
        dn = np.asarray(pv["data_chan"], np.float64)
        r_v = r[row0: row0 + dn.size]
        sc_v = _channel_chi_scale(r_v, dn.shape[0], n_rp,
                                  n_rp + n_nuis)
        scale_sq += sc_v**2 / n_vis
        dof_v = max(dn.size - n_rp - n_nuis, 1)
        vis_scale.append(float(np.sqrt((r_v**2).sum() / dof_v)))
        blocks.append((row0, dn, float(pv["oot"].sum()),
                       np.asarray(pv["sigma"], np.float64), sc_v))
        row0 += dn.size
    extra = _baseline_var_extra(J, A, blocks)
    sig[:n_rp] *= np.sqrt(scale_sq)
    for v in range(n_vis):
        base = n_rp + v * n_nuis
        sig[base: base + n_nuis] *= vis_scale[v]
    sig = np.sqrt(sig**2 + extra)
    t0s = t0sig = ramp = ramp_sig = None
    if fit_t0:
        pos = n_rp + np.arange(n_vis) * n_nuis
        t0s, t0sig = theta[pos].copy(), sig[pos].copy()
    if fit_ramp:
        off = n_rp + (1 if fit_t0 else 0)
        pos = off + np.arange(n_vis)[:, None] * n_nuis + np.arange(2)
        ramp, ramp_sig = theta[pos].copy(), sig[pos].copy()
    from wayne_tpu.reduction import constrained_mask

    ok = np.asarray(constrained_mask(
        theta[:n_rp], sig[:n_rp],
        **(dict(sigma_floor=0.02, bounds=None) if eclipse else {})))
    # per-visit observed + model channel curves at the solution
    # (model = data + standardised residual * sigma)
    data_l, model_l, sigma_l, row0 = [], [], [], 0
    for pv in per_visit:
        dn = np.asarray(pv["data_chan"], np.float64)
        s_v = np.asarray(pv["sigma"], np.float64)
        r_v = r[row0: row0 + dn.size].reshape(dn.shape)
        data_l.append(dn)
        model_l.append(dn + r_v * s_v[None, :])
        sigma_l.append(s_v)
        row0 += dn.size
    return JointRetrievalResult(
        rp=theta[:n_rp].copy(), rp_sigma=sig[:n_rp].copy(),
        t0_offsets_s=t0s, t0_offsets_sigma_s=t0sig,
        ramp=ramp, ramp_sigma=ramp_sig,
        chi2=chi2, n_points=int(r.size), n_iter=n_iter,
        constrained=ok, data_chan=data_l, model_chan=model_l,
        sigma_chan=sigma_l)
