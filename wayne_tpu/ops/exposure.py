"""The fused per-exposure kernel: disperse -> splat -> scan -> up-the-ramp.

This is the TPU rebuild of the reference's hot loop
(reference: wayne/exposure_generator.py :: ExposureGenerator.scanning_frame
/ staring_frame): where the reference runs Python loops over wavelength
bins x temporal subsamples x reads, here one traced program

  1. evaluates the field-dependent trace/dispersion for this pointing,
  2. builds the wavelength->column deposit matrix X (NL, S),
  3. per read interval (lax.scan over NSAMP): evaluates the transit light
     curve and systematics on K coarse subsegments, computes exact
     time-integrated moving-Gaussian row profiles (closed form — no
     move-by-less-than-a-pixel subsampling) inside a narrow dynamic row
     BAND around the scan position, and deposits the band as
     Y^T @ (counts * X): an MXU matmul,
  4. applies the detector chain per read: flat, sky, dark, Poisson
     (branch-free three-regime sampler), cosmic rays, non-linearity,
     saturation, gain, bias, read noise,
  5. emits the NSAMP+1 up-the-ramp reads in DN (time order).

Performance notes (v5e measurements): the row-profile transcendentals and
the Poisson sampler dominate; banding cuts erf work ~(S/band) ~ 10-30x
and fast_poisson replaces jax.random.poisson's rejection while_loops.
Everything is static-shaped; one compilation per ExposureStatic config.
"""

from __future__ import annotations

from dataclasses import dataclass, fields
from functools import partial

import jax
import jax.numpy as jnp

from wayne_tpu.calibration import Tables, quadrant_map
from wayne_tpu.config import ExposureStatic
from wayne_tpu.ops.dispersion import (
    flat_plane, trace_params, trace_y, wl_to_x, x_deposit_matrix,
    x_deposit_matrix_gaussian,
)
from wayne_tpu.ops.psf import pixel_fractions_moving, pixel_fractions_static
from wayne_tpu.ops.random import fast_poisson
from wayne_tpu.ops.transit import transit_light_curve
from wayne_tpu.scene import Scene
from wayne_tpu.trends import (
    ssv_mean_factor, ssv_random_walk, visit_trend_factor,
)


def _register(cls):
    names = [f.name for f in fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=names, meta_fields=[])


@_register
@dataclass
class ExposureResult:
    """Per-exposure outputs."""

    reads_dn: jnp.ndarray       # (NSAMP+1, S, S) sampled reads, DN, time order
    ideal_e: jnp.ndarray        # (S, S) noise-free accumulated source e-
    saturated_frac: jnp.ndarray  # fraction of pixels at full well in last read
    cr_pos: jnp.ndarray         # (NSAMP, 2, MAX_CR) int32 hit rows/cols
    cr_count: jnp.ndarray       # (NSAMP,) int32 actual hits per interval


def _segment_counts(scene: Scene, tables: Tables, cfg: ExposureStatic,
                    t_seg_edges: jnp.ndarray, dt_seg: jnp.ndarray,
                    rw_factor: jnp.ndarray | None
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Source electrons per (subsegment, wavelength bin): (K, NL).

    counts = F_lambda * sensitivity * dlambda * dt * LC(t, lambda)
             * SSV(segment mean, exact) * visit_trend(t).

    ``rw_factor``: this read's (K,) slice of the exposure-long random-walk
    SSV (continuous across read boundaries; see trends.ssv_random_walk).

    Returns (counts (K, NL), fac_dt (K,)) where fac_dt is the shared
    achromatic per-segment factor SSV * visit_trend * dt — companion
    field sources reuse it (telescope/detector-level modulation is
    source-independent; only the transit/spot chromatic factor is the
    target's own).
    """
    t_mid = 0.5 * (t_seg_edges[:-1] + t_seg_edges[1:])
    dlam = jnp.diff(tables.wl_edges)
    rate0 = scene.stellar_flux * tables.sensitivity * dlam   # e-/s per bin
    times_abs = scene.exp_start_s + t_mid
    lc = transit_light_curve(times_abs, scene.orbit, scene.rp_over_rs,
                             scene.ld, cfg.transit_quad,
                             fp_over_fs=(scene.fp_over_fs if cfg.eclipse
                                         else None),
                             phase_amp=scene.phase_amp,
                             phase_offset_rad=scene.phase_offset)  # (K, NL)
    if scene.spots is not None:
        # Starspots (ops/spots.py, beyond the reference): unocculted
        # dimming + crossing recovery, additive on the stellar flux
        # (the eclipse-mode planet light rides on top untouched).
        from wayne_tpu.ops.spots import spot_delta

        lc = lc + spot_delta(times_abs, scene.orbit, scene.rp_over_rs,
                             scene.ld, scene.spots)
    factor = jnp.ones_like(t_mid)
    if cfg.noise.ssv and cfg.scan:
        factor = factor * ssv_mean_factor(t_seg_edges[:-1], t_seg_edges[1:],
                                          scene.trends)
        if rw_factor is not None:   # stochastic variant (exposure-long walk)
            factor = factor * rw_factor
    if cfg.noise.visit_trend:
        factor = factor * visit_trend_factor(
            scene.exp_start_s + t_mid,
            scene.exp_start_s - scene.orbit_start_s + t_mid,
            scene.is_first_orbit, scene.trends)
    fac_dt = factor * dt_seg
    return rate0[None, :] * lc * fac_dt[:, None], fac_dt


def _row_profiles(scene: Scene, cfg: ExposureStatic, y_base: jnp.ndarray,
                  sigma: jnp.ndarray, t_edges: jnp.ndarray,
                  y_edges: jnp.ndarray) -> jnp.ndarray:
    """Time-integrated row deposit profiles per subsegment: (K, NL, W).

    ``y_edges``: (W+1,) absolute row-edge coordinates (the band window).
    Scanning: exact moving-Gaussian path average per subsegment.
    Staring: static pixel-integrated Gaussian (same for all subsegments).
    """
    y_edges_b = jnp.broadcast_to(y_edges, (y_base.shape[0], y_edges.shape[0]))
    if not cfg.scan:
        frac = pixel_fractions_static(y_edges_b, y_base, sigma)
        return jnp.broadcast_to(frac[None], (cfg.n_sub,) + frac.shape)

    offsets = scene.scan_speed * t_edges                     # (K+1,)

    # Per-segment moving splats. The node-shared variant
    # (psf.pixel_fractions_moving_path) does ~2.6x fewer transcendentals
    # but measured ~1.8x SLOWER here under the visit vmap on v5e (its
    # offset-sliced reuse of the node arrays defeats XLA fusion);
    # transcendentals are nearly free on the VPU, so fusion wins.
    def seg(o0, o1):
        return pixel_fractions_moving(y_edges_b, y_base + o0, y_base + o1, sigma)

    return jax.vmap(seg)(offsets[:-1], offsets[1:])


def _cosmic_rays(key: jnp.ndarray, tables: Tables, cfg: ExposureStatic,
                 dt: jnp.ndarray):
    """Cosmic-ray hits for one read interval.

    Static-shaped: MAX_CR candidate hits are drawn, the Poisson-distributed
    actual count masks the excess (reference: wayne/detector.py cosmic-ray
    injection; rate scales with interval time and detector area).

    Returns (positions (2, MAX_CR), masked charges (MAX_CR,), count) —
    positions feed the DQ planes of the ima product (flag 8192); charges
    are zeroed beyond the actual hit count so scattering them is safe.
    The returned count is CLAMPED to MAX_CR: it must tally hits that
    were actually deposited, never draws the static bound truncated
    (consumers trust it for DQ planes and column-space repair).
    Observation auto-sizes max_cr_per_read (config.auto_max_cr:
    lam + 6 sigma + 4) so clamping there is a ~never event; direct
    ExposureStatic users at large subarrays must size it themselves —
    the default (16) covers ~64-128 px subarrays only.
    """
    S = cfg.subarray
    n_max = cfg.max_cr_per_read
    k_n, k_pos, k_q = jax.random.split(key, 3)
    lam = tables.cr_rate_px_s * (S * S) * dt
    n = jnp.minimum(_poisson(k_n, lam, cfg), n_max)
    pos = jax.random.randint(k_pos, (2, n_max), 0, S)
    charge = tables.cr_mean_e * jax.random.exponential(k_q, (n_max,))
    mask = (jnp.arange(n_max) < n).astype(charge.dtype)
    return pos.astype(jnp.int32), charge * mask, n.astype(jnp.int32)


def _apply_nonlinearity(cum_e: jnp.ndarray, tables: Tables) -> jnp.ndarray:
    """HgCdTe non-linearity: per-pixel cubic deficit in normalised charge.

    measured = Q * (1 - (c1 q + c2 q^2 + c3 q^3)), q = min(Q, fw)/fw, with
    (c1, c2, c3) per-pixel coefficient planes (reference: wayne/detector.py
    :: apply_non_linearity — cubic polynomial per pixel, SURVEY.md §8).
    """
    fw = tables.full_well_e
    c1, c2, c3 = (tables.nonlin_coeffs[0], tables.nonlin_coeffs[1],
                  tables.nonlin_coeffs[2])
    q = jnp.minimum(cum_e, fw) / fw
    return cum_e * (1.0 - ((c3 * q + c2) * q + c1) * q)


def _apply_ipc(sig: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Inter-pixel capacitance: nearest-neighbour coupling of the SENSED
    charge, kernel [[0,a,0],[a,1-4a,a],[0,a,0]] (WFC3 IR a ~ 1.5%;
    McCullough 2008, WFC3 ISR 2008-26). A readout crosstalk — the stored
    charge is untouched; it blurs sharp features slightly and correlates
    the Poisson noise of neighbouring pixels (which is why reduction
    pipelines care). Edge pixels couple to off-array neighbours we don't
    model (zero-flux boundary). Beyond the reference, which omits IPC.
    """
    up = jnp.pad(sig[:-1, :], ((1, 0), (0, 0)))
    down = jnp.pad(sig[1:, :], ((0, 1), (0, 0)))
    left = jnp.pad(sig[:, :-1], ((0, 0), (1, 0)))
    right = jnp.pad(sig[:, 1:], ((0, 0), (0, 1)))
    return sig * (1.0 - 4.0 * alpha) + alpha * (up + down + left + right)


def _poisson(key, lam, cfg: ExposureStatic):
    if cfg.exact_poisson:
        return jax.random.poisson(key, jnp.maximum(lam, 0.0)).astype(lam.dtype)
    return fast_poisson(key, jnp.maximum(lam, 0.0))


def _bias_drift_dn(scene: Scene, tables: Tables, cfg: ExposureStatic,
                   gain_div) -> jnp.ndarray:
    """(NR, S, S) per-read electronic bias-drift offsets in DN.

    The WFC3 IR detector reads through four amplifiers (one per 512^2
    detector quadrant); each read's amplifier bias wanders by a few
    electrons (Tables.bias_drift_e RMS), a common-mode offset calwf3
    removes with the reference-pixel border (beyond the reference, which
    models only a static pedestal). The drift enters the chain where the
    pedestal does — after non-linearity, before the gain divide — and
    everything downstream of that point is linear, so adding the offsets
    to the finished read stack is exactly equivalent for BOTH noise
    backends (XLA and Pallas) with zero kernel changes. The quadrant of
    each subarray pixel comes from its position in the full frame
    (Tables.subarray_corner); drift hits reference pixels too — that is
    what makes it correctable (reduction.ref_pixel_correct).
    """
    S, nr = cfg.subarray, cfg.nsamp + 1
    delta_e = tables.bias_drift_e * jax.random.normal(
        jax.random.fold_in(scene.key, 977), (nr, 4), jnp.float32)
    quad = quadrant_map(S, tables.subarray_corner)            # (S, S)
    return delta_e[:, quad] / gain_div


@partial(jax.jit, static_argnames="cfg")
def simulate_exposure(scene: Scene, tables: Tables,
                      cfg: ExposureStatic) -> ExposureResult:
    """Simulate one full exposure. See module docstring for the pipeline."""
    S, K = cfg.subarray, cfg.n_sub
    flags = cfg.noise
    dtype = jnp.dtype(cfg.dtype)
    band = cfg.band_px if (0 < cfg.band_px < S) else 0     # 0 = full frame
    # The Pallas kernels sample Poisson in-kernel with the three-regime
    # approximate sampler; exact_poisson promises jax.random.poisson
    # statistics, so it forces the XLA path (which routes every draw
    # through _poisson and honors the flag).
    use_pallas = cfg.use_pallas and not cfg.exact_poisson

    tp = trace_params(tables, scene.x_ref, scene.y_ref)
    # HST focus breathing (trends breathing_amp, beyond the reference):
    # a per-exposure scalar scale on the calibration PSF widths. None is
    # pytree-invisible, so default Scenes compile the unscaled program.
    psf_sigma = (tables.psf_sigma if scene.psf_scale is None
                 else tables.psf_sigma * scene.psf_scale)
    x_edges = wl_to_x(tables.wl_edges, tp)
    if cfg.x_psf:
        X = x_deposit_matrix_gaussian(x_edges, S, psf_sigma)
    else:
        X = x_deposit_matrix(x_edges, S)
    X = X.astype(dtype)                                      # (NL, S)
    if cfg.extra_beams:
        # Contaminating beams (aXe BEAM B/C; beyond the reference, which
        # models the +1st order only). Both share the +1st order's trace
        # row and scan motion, so they fold into the SAME rank-1 splat as
        # extra columns of the deposit matrix — zero extra hot-path cost:
        #   0th order: undispersed spot at x_ref + beam0_dx (linear
        #     sub-pixel split over the two neighbouring columns);
        #   2nd order: the grating's m=2 image, dispersion doubled about
        #     the reference position.
        grid = jnp.arange(S, dtype=dtype)
        x_spot = tp.x_ref + tables.beam0_dx
        hat = jnp.maximum(0.0, 1.0 - jnp.abs(x_spot - grid))
        x2_edges = tp.x_ref + 2.0 * (x_edges - tp.x_ref)
        X2 = x_deposit_matrix(x2_edges, S).astype(dtype)
        X = (X + tables.beam0_rel * hat[None, :]
             + tables.beam2_rel * X2)
    x_centers = wl_to_x(tables.wl_centers, tp)
    y_base = trace_y(x_centers, tp)                          # (NL,)
    sigma = psf_sigma

    # Contaminating field sources (beyond the reference, which models an
    # isolated star): each companion's spectrum disperses from its OWN
    # field position — the aXe field-dependent trace/wavelength
    # polynomials are re-evaluated at (x_ref+dx, y_ref+dy) — rides the
    # same scan motion/SSV/visit trend (telescope- and detector-level,
    # source-independent), and carries no transit/spot signal. n_comp is
    # static, so this unrolls at trace time. The PSF-width table is
    # shared (field dependence of the width is below WFC3 calibration
    # resolution); extra_beams applies to the target only.
    comp_srcs: list[tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]] = []
    if scene.companions is not None:
        comp = scene.companions
        dlam_c = jnp.diff(tables.wl_edges)
        for i in range(comp.dx_px.shape[0]):
            tp_c = trace_params(tables, scene.x_ref + comp.dx_px[i],
                                scene.y_ref + comp.dy_px[i])
            xe_c = wl_to_x(tables.wl_edges, tp_c)
            X_c = (x_deposit_matrix_gaussian(xe_c, S, psf_sigma)
                   if cfg.x_psf else x_deposit_matrix(xe_c, S)).astype(dtype)
            y_c = trace_y(wl_to_x(tables.wl_centers, tp_c), tp_c)
            rate0_c = comp.flux[i] * tables.sensitivity * dlam_c  # (NL,) e-/s
            comp_srcs.append((X_c, y_c, rate0_c))

    # Photon response plane: wavelength-dependent flat (optional) times the
    # reference-pixel mask (outer 5 px of the full frame are blind).
    flatp = flat_plane(tables, tp) if flags.flat else None
    response = tables.active_mask if flatp is None else flatp * tables.active_mask
    # Static QE defects (dead pixels, IR blobs — calibration.Tables.qe_map):
    # attenuate the SOURCE photon response only. The master sky frame is an
    # as-detected product (carries the detector imprint already) and dark
    # current is generated inside the pixel, not behind the optics. ones()
    # by default — XLA folds the multiply into the same fusion for free.
    response = response * tables.qe_map
    if tables.rts_amp is not None:
        # Unstable (RTS) pixels: one high/low state per exposure per
        # pixel, a pure function of the exposure key (fold_in constant
        # 1321 — its own branch of the counter-based stream, so adding
        # the population never re-deals any other noise draw). Gated by
        # pytree STRUCTURE (None = absent): default programs compile
        # without the draw entirely.
        st = jax.random.bernoulli(
            jax.random.fold_in(scene.key, 1321), 0.5, response.shape)
        response = response * (1.0 + tables.rts_amp
                               * jnp.where(st, 1.0, -1.0).astype(dtype))
    gain_div = tables.gain_map if flags.gain_variations else tables.gain
    read_times = tables.read_times                           # (NR,)

    bg_rate = jnp.zeros((S, S), dtype)
    if flags.sky:
        bg_rate = bg_rate + scene.sky_level * tables.sky_frame
        if scene.sky_he_level is not None and tables.sky_he_frame is not None:
            # He 1.083 um airglow: a separately-scaled second sky
            # component (its spatial pattern differs from the
            # zodi/earthshine continuum; its level is strongly
            # time-variable over the orbit — trends he_airglow_*)
            bg_rate = bg_rate + scene.sky_he_level * tables.sky_he_frame
    if flags.dark:
        bg_rate = bg_rate + tables.dark_map
    has_trap = scene.trap_mult is not None
    if has_trap:
        # RECTE charge-trap capture (ops/recte.py): a Bernoulli thinning
        # of a Poisson process is again Poisson, so scaling the EXPECTED
        # sky+dark rate by the per-pixel escape fraction is statistically
        # exact for the captured side. Trap RELEASE (and prior-exposure
        # persistence) joins below UN-thinned: the deficit behind
        # trap_mult is already net of release.
        bg_rate = bg_rate * scene.trap_mult
    has_persist = scene.persist_rate is not None
    if has_persist:
        # Image persistence from earlier exposures (ops/persistence.py):
        # released trapped charge is real charge, so it joins the
        # background rate and is Poisson-sampled by the same chain.
        bg_rate = bg_rate + scene.persist_rate
    bg_rate = bg_rate * tables.active_mask
    # With dark AND sky off the background is exactly zero; Poisson(0) = 0,
    # so its sampling is skipped statically (the sampler's small-lam loop
    # would otherwise run on the all-zero frame every read).
    has_bg = flags.sky or flags.dark or has_persist

    # Band bookkeeping: window [y0, y0 + band) must cover the trace rows,
    # PSF tails and this read's scan motion. y0 is dynamic (per read).
    if band:
        margin = 5.0 * jnp.max(sigma) + 1.0
        y_min = jnp.min(y_base)
        for _, y_c, _ in comp_srcs:      # band covers companion traces too
            y_min = jnp.minimum(y_min, jnp.min(y_c))
        y_band_lo = y_min - margin                 # scalar, scan off_lo added per read

    def emit_read(cum_e: jnp.ndarray, key: jnp.ndarray) -> jnp.ndarray:
        # Saturation + non-linearity model the same physical effect
        # (charge capacity); both gated by the non_linearity flag so the
        # noise-off chain stays exactly linear for oracle diffs.
        sig = cum_e
        if flags.non_linearity:
            sig = _apply_nonlinearity(jnp.minimum(cum_e, tables.full_well_e),
                                      tables)
        if flags.ipc:
            sig = _apply_ipc(sig, tables.ipc_alpha)
        if flags.bias:
            sig = sig + tables.bias_map
        if flags.read_noise:
            sig = sig + tables.read_noise_e * jax.random.normal(key, (S, S), dtype)
        return sig / gain_div

    # Exposure-long random-walk SSV: ONE walk per exposure, continuous
    # across read boundaries (reference: stochastic SSV variant,
    # SURVEY.md:98); read k consumes rows [k] of the (nsamp, K) factors.
    rw_all = None
    if flags.ssv and cfg.scan:
        rw_all = ssv_random_walk(jax.random.fold_in(scene.key, 499),
                                 cfg.nsamp * K, scene.trends
                                 ).reshape(cfg.nsamp, K).astype(dtype)

    def source_band(t_a, dt, rw_k):
        """(band_or_S, S) source electrons laid down this interval + row0."""
        t_seg_edges = t_a + (dt / K) * jnp.arange(K + 1, dtype=dtype)
        counts, fac_dt = _segment_counts(scene, tables, cfg, t_seg_edges,
                                         dt / K, rw_k)       # (K, NL), (K,)

        if band:
            off = scene.scan_speed * t_seg_edges
            off_lo = jnp.minimum(off[0], off[-1]) if cfg.scan else 0.0
            y0f = jnp.floor(y_band_lo + off_lo)
            y0 = jnp.clip(y0f, 0.0, float(S - band)).astype(jnp.int32)
            # 8-align the window start (f32 sublane requirement of the
            # fused Pallas deposit; auto_band_px budgets the extra rows).
            y0 = (y0 // 8) * 8
            W = band
        else:
            y0 = jnp.int32(0)
            W = S
        y_edges = (jnp.arange(W + 1, dtype=dtype) - 0.5) + y0.astype(dtype)

        Y = _row_profiles(scene, cfg, y_base, sigma, t_seg_edges, y_edges)
        # precision=HIGHEST on both contractions: the TPU MXU's default
        # bf16 input rounding deposits ~0.5%-of-peak deterministic error
        # in the frame (measured vs CPU f32), well above the 2e-4 oracle
        # agreement the CPU path holds; full-f32 passes restore it.
        Yw = jnp.einsum("kl,kls->ls", counts, Y,
                        precision=jax.lax.Precision.HIGHEST
                        ).astype(dtype)                          # (NL, W)
        # The splat: band[y, x] = sum_l Yw[l, y] X[l, x] — one MXU matmul.
        frame = jax.lax.dot_general(
            Yw, X, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST).astype(dtype)
        for X_c, y_c, rate0_c in comp_srcs:
            # Companion spectra are time-separable (no chromatic LC):
            # rank-1 in (segment, lambda), so the K axis contracts into
            # the profile tensor first and the lambda rate scales after.
            Y_c = _row_profiles(scene, cfg, y_c, sigma, t_seg_edges,
                                y_edges)                     # (K, NL, W)
            Yw_c = (jnp.einsum("k,kls->ls", fac_dt, Y_c,
                               precision=jax.lax.Precision.HIGHEST)
                    * rate0_c[:, None]).astype(dtype)
            frame = frame + jax.lax.dot_general(
                Yw_c, X_c, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST).astype(dtype)
        resp = (jax.lax.dynamic_slice(response, (y0, 0), (W, S))
                if band else response)
        frame = frame * resp
        if has_trap:
            # Charge-trap thinning of the source expectation (see
            # bg_rate above). Like the hook trend — the parametric ramp
            # this model replaces — the deficit is part of the expected
            # signal, so it lands in ideal_e too.
            tm = (jax.lax.dynamic_slice(scene.trap_mult, (y0, 0), (W, S))
                  if band else scene.trap_mult)
            frame = frame * tm.astype(dtype)
        return frame, y0

    def add_band(full: jnp.ndarray, band_frame: jnp.ndarray,
                 y0: jnp.ndarray) -> jnp.ndarray:
        if not band:
            return full + band_frame
        W = band_frame.shape[0]
        window = jax.lax.dynamic_slice(full, (y0, 0), (W, S))
        return jax.lax.dynamic_update_slice(full, window + band_frame, (y0, 0))

    if use_pallas:
        from wayne_tpu.ops.pallas_readout import (
            fused_exposure_readout, fused_read_step, fused_read_step_banded)
        pallas_consts = jnp.stack([
            tables.read_noise_e, tables.full_well_e,
            tables.gain, tables.ipc_alpha]).astype(jnp.float32)
        nl_coeffs = tables.nonlin_coeffs.astype(jnp.float32)
        # Kernel contract: the gain operand is the RECIPROCAL plane —
        # inverted ONCE per exposure here so the VPU-bound kernels
        # multiply instead of dividing per pixel per read.
        inv_gain_map = 1.0 / tables.gain_map.astype(jnp.float32)
        raw_key = scene.key
        if raw_key.dtype != jnp.uint32:
            raw_key = jax.random.key_data(raw_key)
        # BOTH 32-bit key words reach the hardware PRNG (slots 0 and 2
        # of the seed vector; slot 1 is the read index): one word alone
        # is a 2^32 stream space, and 10k-visit MC datasets have enough
        # streams for birthday collisions to correlate realisations.
        exp_seed = raw_key.reshape(-1)[-1].astype(jnp.int32)
        exp_seed_hi = raw_key.reshape(-1)[0].astype(jnp.int32)

    use_fused = use_pallas and band and cfg.fused_reads
    fused_tiles = 1
    if use_fused:
        # S <= 512 runs the measured single-block layout; larger frames
        # column-tile the kernel so each tile's charge stays VMEM-
        # resident across its read sweep (same HBM bytes, working set
        # shrunk by col_tiles — ops/pallas_readout._kernel_exposure).
        # Column tiling cannot apply IPC (tile seams).
        from wayne_tpu.ops.pallas_readout import (
            fused_exposure_col_tiles, fused_whole_exposure_supported)
        fused_tiles = fused_exposure_col_tiles(S)
        use_fused = (fused_tiles >= 1
                     and not (fused_tiles > 1 and flags.ipc)
                     and fused_whole_exposure_supported(
                         S, band, cfg.nsamp + 1, cfg.max_cr_per_read))
    if use_fused:
        # Whole-exposure fused path: compute every read's expected signal
        # band (vmap over reads — no sequential dependency), then run ALL
        # reads in ONE kernel launch with the cumulative charge resident
        # in VMEM (ops/pallas_readout._kernel_exposure). Removes the
        # per-read HBM round-trips of the cum frame and 15 kernel
        # launches per exposure. S > 512 column-tiles the launch
        # (fused_tiles > 1) so each tile's charge still never leaves
        # VMEM; IPC at those sizes falls back to the per-read kernels.
        rw = rw_all if rw_all is not None else jnp.ones((cfg.nsamp, K), dtype)
        ks = jnp.arange(cfg.nsamp)
        t_as = read_times[:-1]
        dts_r = read_times[1:] - read_times[:-1]
        frames, y0s_r = jax.vmap(source_band)(t_as, dts_r, rw)
        ideal_e = jnp.zeros((S, S), dtype)
        if cfg.compute_ideal:
            ideal_e = jax.lax.fori_loop(
                0, cfg.nsamp,
                lambda i, ide: add_band(ide, frames[i], y0s_r[i]),
                ideal_e)
        if flags.cosmic_rays:
            def cr_one(k, dt):
                key_k = jax.random.fold_in(scene.key, k)
                _, _, k_cr, _ = jax.random.split(key_k, 4)
                return _cosmic_rays(k_cr, tables, cfg, dt)

            cr_pos, cr_q, cr_count = jax.vmap(cr_one)(ks, dts_r)
        else:
            cr_pos = jnp.zeros((cfg.nsamp, 2, cfg.max_cr_per_read), jnp.int32)
            cr_q = jnp.zeros((cfg.nsamp, cfg.max_cr_per_read), dtype)
            cr_count = jnp.zeros((cfg.nsamp,), jnp.int32)
        # Per-emitted-read arrays; the zeroth read is zero entries
        # (dt = 0, zero band, zero CR): Poisson(0) = 0 in every regime.
        from wayne_tpu.ops.pallas_readout import MAX_READS_PER_CALL

        n_cr_max = cfg.max_cr_per_read
        bands_all = jnp.concatenate(
            [jnp.zeros((1,) + frames.shape[1:], jnp.float32),
             frames.astype(jnp.float32)])
        y0s_all = jnp.concatenate([jnp.zeros((1,), jnp.int32), y0s_r])
        dts_all = jnp.concatenate(
            [jnp.zeros((1,), jnp.float32), dts_r.astype(jnp.float32)])
        crp_all = jnp.concatenate(
            [jnp.zeros((1, 2, n_cr_max), jnp.int32), cr_pos])
        crq_all = jnp.concatenate(
            [jnp.zeros((1, n_cr_max), jnp.float32),
             cr_q.astype(jnp.float32)])

        # One launch covers the whole exposure: nsamp is validated to
        # 1..15, so nsamp + 1 emitted reads always fit MAX_READS_PER_CALL.
        nr_total = cfg.nsamp + 1
        assert nr_total <= MAX_READS_PER_CALL, nr_total
        reads_dn, cum = fused_exposure_readout(
            jnp.stack([exp_seed, jnp.int32(0), exp_seed_hi]),
            y0s_all, dts_all, bands_all, jnp.zeros((S, S), jnp.float32),
            bg_rate.astype(jnp.float32), tables.bias_map,
            inv_gain_map, nl_coeffs, crp_all, crq_all, pallas_consts,
            poisson=flags.poisson, read_noise=flags.read_noise,
            non_linearity=flags.non_linearity, bias=flags.bias,
            scalar_gain=not flags.gain_variations,
            with_cr=flags.cosmic_rays, bg_poisson=has_bg, ipc=flags.ipc,
            col_tiles=fused_tiles)
        sat = jnp.mean((cum >= tables.full_well_e).astype(dtype))
        reads_dn = reads_dn.astype(dtype)
        if flags.bias_drift:
            reads_dn = reads_dn + _bias_drift_dn(
                scene, tables, cfg, gain_div).astype(dtype)
        return ExposureResult(reads_dn=reads_dn,
                              ideal_e=ideal_e, saturated_frac=sat,
                              cr_pos=cr_pos, cr_count=cr_count)

    def step(carry, xs):
        k, rw_k = xs
        cum_e, ideal_e = carry
        t_a = read_times[k]
        dt = read_times[k + 1] - t_a
        frame, y0 = source_band(t_a, dt, rw_k)

        if cfg.compute_ideal:
            ideal_e = add_band(ideal_e, frame, y0)

        key_k = jax.random.fold_in(scene.key, k)
        k_sig, k_bg, k_cr, k_read = jax.random.split(key_k, 4)
        # Poisson(signal) + Poisson(background) ~ Poisson(signal+background):
        # sampling the band and the full-frame background separately is
        # exact and keeps the signal sampling on the narrow band.
        if flags.poisson:
            frame = _poisson(k_sig, frame, cfg)
        if flags.cosmic_rays:
            cr_pos, cr_q, cr_n = _cosmic_rays(k_cr, tables, cfg, dt)
        else:
            cr_pos = jnp.zeros((2, cfg.max_cr_per_read), jnp.int32)
            cr_q = jnp.zeros((cfg.max_cr_per_read,), dtype)
            cr_n = jnp.int32(0)

        seed2 = (jnp.stack([exp_seed, k.astype(jnp.int32), exp_seed_hi])
                 if use_pallas else None)
        # Single-block banded kernel only below 512^2: it holds several
        # full frames in VMEM (~9 MB at 512; ~36 MB at 1024 would OOM).
        # Full frame falls through to the row-tiled variant below.
        if use_pallas and band and S <= 512:
            # Fully fused: band deposit + CR scatter + bg Poisson +
            # accumulate + readout in one single-block VMEM pass — no
            # full-frame staging arrays in the XLA graph at all.
            cum_e, dn = fused_read_step_banded(
                seed2, y0.reshape(1), cum_e, frame, bg_rate * dt,
                tables.bias_map, inv_gain_map, nl_coeffs, cr_pos, cr_q,
                pallas_consts, poisson=flags.poisson,
                read_noise=flags.read_noise,
                non_linearity=flags.non_linearity, bias=flags.bias,
                scalar_gain=not flags.gain_variations,
                with_cr=flags.cosmic_rays, bg_poisson=has_bg,
                ipc=flags.ipc)
            return (cum_e, ideal_e), (dn, cr_pos, cr_n)

        if use_pallas and not flags.ipc:
            # Full-frame variant (band disabled): bg Poisson + accumulate
            # + readout in one row-tiled pass. IPC falls through to the
            # XLA path: the row-tiled grid would miscouple at tile seams.
            add = add_band(jnp.zeros((S, S), dtype), frame, y0)
            if flags.cosmic_rays:
                add = add.at[cr_pos[0], cr_pos[1]].add(cr_q)
            cum_e, dn = fused_read_step(
                seed2, cum_e, add, bg_rate * dt, tables.bias_map,
                inv_gain_map, nl_coeffs, pallas_consts,
                poisson=flags.poisson,
                read_noise=flags.read_noise,
                non_linearity=flags.non_linearity, bias=flags.bias,
                scalar_gain=not flags.gain_variations,
                bg_poisson=has_bg)
            return (cum_e, ideal_e), (dn, cr_pos, cr_n)

        bg = bg_rate * dt
        if flags.poisson and has_bg:
            bg = _poisson(k_bg, bg, cfg)
        interval = add_band(bg, frame, y0)
        if flags.cosmic_rays:
            interval = interval.at[cr_pos[0], cr_pos[1]].add(cr_q)

        cum_e = cum_e + interval
        return (cum_e, ideal_e), (emit_read(cum_e, k_read), cr_pos, cr_n)

    zero = jnp.zeros((S, S), dtype)
    k0 = jax.random.fold_in(scene.key, cfg.nsamp + 1)
    read0 = emit_read(zero, k0)
    if rw_all is None:
        rw_all = jnp.ones((cfg.nsamp, K), dtype)   # ignored by the branch
    (cum_e, ideal_e), (reads, cr_pos, cr_count) = jax.lax.scan(
        step, (zero, zero), (jnp.arange(cfg.nsamp), rw_all))
    reads_dn = jnp.concatenate([read0[None], reads], axis=0)  # (NR, S, S)
    if flags.bias_drift:
        reads_dn = reads_dn + _bias_drift_dn(
            scene, tables, cfg, gain_div).astype(dtype)

    sat = jnp.mean((cum_e >= tables.full_well_e).astype(dtype))
    return ExposureResult(reads_dn=reads_dn, ideal_e=ideal_e,
                          saturated_frac=sat, cr_pos=cr_pos,
                          cr_count=cr_count)
