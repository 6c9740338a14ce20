"""Mini reduction pipeline: raw reads -> extracted light curves -> depths.

The reference's validation is scientific: simulate a visit, reduce it
with a standard WFC3 pipeline (Iraclis), and recover the injected
transmission spectrum (SURVEY.md section 4; the Wayne paper's approach).
This module provides that closed loop in-repo — and on-device: the whole
reduction (background subtraction, box extraction, light-curve
normalisation, per-channel depth fitting by Newton iterations on the
actual transit model with JAX autodiff) is jit/vmap-compatible, so a
Monte-Carlo ensemble of visits can be simulated AND reduced without
leaving the TPU.

It is intentionally a simple, transparent reduction (CDS frames, box
extraction, no ramp-systematic detrending beyond out-of-transit
normalisation) — adequate for validating depth recovery statistically.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as _np


def _channel_edges(x_window: tuple[int, int], n_chan: int) -> jnp.ndarray:
    """Static integer channel edges over [x_lo, x_hi).

    Computed in float64 NumPy at trace time (x_window/n_chan are static)
    so the on-device binning matches the CLI's host-side edges exactly —
    f32 linspace + int truncation could place an interior edge one
    column off. Zero-width channels (n_chan > window width) would yield
    0/0 -> NaN light curves silently, so they are rejected here."""
    lo, hi = int(x_window[0]), int(x_window[1])
    if n_chan > hi - lo:
        raise ValueError(
            f"n_chan={n_chan} exceeds the {hi - lo}-column window "
            f"{x_window}: zero-width channels would produce NaN curves")
    return jnp.asarray(_np.linspace(lo, hi, n_chan + 1).astype(_np.int64),
                       jnp.int32)

from wayne_tpu.ops.kepler import OrbitParams, projected_separation
from wayne_tpu.ops.transit import eclipse_visibility, transit_depth_curve


from wayne_tpu.pytree import register as _register


@_register
@dataclass
class ReducedVisit:
    """Outputs of reduce_visit."""

    spectra_e: jnp.ndarray      # (n_exp, S) extracted net electrons per column
    white_lc: jnp.ndarray       # (n_exp,) normalised white light curve
    channel_lc: jnp.ndarray     # (n_exp, n_chan) normalised channel curves
    channel_cols: jnp.ndarray   # (n_chan, 2) [lo, hi) column ranges
    x_shifts: jnp.ndarray       # (n_exp,) fitted dispersion-direction
    #                             drifts in px (zeros unless align=True)


# DQ bits consumed by the repair (io.ima conventions): cosmic ray
# (8192), saturation (256), and the static classes — hot pixel (16),
# dead pixel (4), IR blob (512), unstable pixel (32) — whose every
# interval is bad.
# Reference pixels (128) are excluded from the REPAIR on purpose — they
# carry no signal and sit outside every extraction window — but
# ref_pixel_correct consumes them as the per-read bias monitor (the
# calwf3 BLEVCORR role).
DQ_COSMIC_RAY, DQ_SATURATED, DQ_HOT_PIXEL = 8192, 256, 16
DQ_REF_PIXEL = 128
DQ_DEAD, DQ_BLOB, DQ_UNSTABLE = 4, 512, 32
DQ_STATIC_BAD = DQ_HOT_PIXEL | DQ_DEAD | DQ_BLOB | DQ_UNSTABLE
DQ_BAD_BITS = DQ_COSMIC_RAY | DQ_SATURATED | DQ_STATIC_BAD


def cr_bad_diff_masks(cr_pos: jnp.ndarray, cr_count: jnp.ndarray,
                      s: int) -> jnp.ndarray:
    """On-device per-INTERVAL corruption masks from the simulator's CR
    hit lists: a hit during read interval k corrupts exactly the
    consecutive-read difference reads[k+1] - reads[k] — the charge step
    cancels in every later difference.

    Args:
      cr_pos: (nsamp, 2, MAX_CR) int32 hit rows/cols (ExposureResult).
      cr_count: (nsamp,) int32 actual hits per interval.
    Returns (nsamp, s, s) bool — True where the interval diff is BAD.
    Unlike the cumulative file-level DQ (good_diff_masks_from_dq), this
    resolves multiple hits on the same pixel exactly.
    """
    def scatter_one(pos, n):
        valid = jnp.arange(pos.shape[1]) < n
        return jnp.zeros((s, s), jnp.bool_).at[pos[0], pos[1]].max(valid)

    return jax.vmap(scatter_one)(cr_pos, cr_count)       # (nsamp, s, s)


def good_diff_masks_from_dq(dq: jnp.ndarray) -> jnp.ndarray:
    """Per-interval good-diff masks from ima DQ planes, bit by bit.

    Each DQ bit corrupts read DIFFERENCES differently:
      - cosmic rays (8192, cumulative from the hit read onward): a
        charge step — only the TRANSITION interval (clean -> flagged)
        is corrupted; later diffs subtract the same offset and stay
        valid. (A second hit on the same pixel is invisible under the
        cumulative convention — negligible at physical CR rates.)
      - saturation (256): a read pinned at full well measures nothing;
        any diff touching a saturated read is bad.
      - static classes (hot 16, dead 4, blob 512, unstable 32): every
        diff is bad (dark-dominated, zero-response, attenuated by an
        amount the calibration only bounds, or toggling between levels
        — real pipelines exclude all four).

    Args:
      dq: (..., NR, S, S) int DQ planes in time order (read_ima).
    Returns (..., NR-1, S, S) bool — True where the diff is usable.
    """
    dq = jnp.asarray(dq)
    a, b = dq[..., :-1, :, :], dq[..., 1:, :, :]
    cr_bad = ((a & DQ_COSMIC_RAY) != 0) ^ ((b & DQ_COSMIC_RAY) != 0)
    sat_bad = ((a | b) & DQ_SATURATED) != 0
    static_bad = ((a | b) & DQ_STATIC_BAD) != 0
    return ~(cr_bad | sat_bad | static_bad)


def ref_pixel_correct(reads: jnp.ndarray, ref_mask: jnp.ndarray,
                      corner: tuple[float, float] | None = None,
                      clip_sigma: float = 5.0):
    """Per-read, per-amplifier reference-pixel bias correction.

    The calwf3 BLEVCORR equivalent: the WFC3 IR detector reads through
    four amplifiers (one per 512^2 detector quadrant) whose electronic
    bias wanders by a few electrons between non-destructive reads
    (simulated by NoiseFlags.bias_drift). The blind reference-pixel
    border sees exactly that wander and nothing else, so each read's
    per-quadrant mean reference level — relative to read 0, where every
    static pedestal already cancels in downstream read differences —
    measures the drift directly.

    Args:
      reads: (NR, S, S) read stack, any consistent unit (DN or e-: the
        correction is self-referential).
      ref_mask: (S, S) truthy where the pixel is a blind reference pixel
        (DQ bit 128; io.ima.DQ_REF_PIXEL). A quadrant with no reference
        pixels (any centered subarray) is left untouched — the function
        is a safe no-op on subarray products, where the per-column
        background subtraction absorbs the drift instead.
      corner: (x0, y0) of the frame in the 1024^2 full frame; None =
        centered (calibration.subarray_corner).
      clip_sigma: one-pass outlier clip on the reference pixels (cosmic
        rays DO hit the border) before the mean.

    Returns (corrected (NR, S, S), offsets (NR, 4)): the per-read
    per-quadrant offsets that were subtracted (offsets[0] == 0).
    """
    from wayne_tpu.calibration import quadrant_map

    reads = jnp.asarray(reads, jnp.float32)
    S = reads.shape[-1]
    quad = quadrant_map(S, corner)                              # (S, S)
    # The drift being measured is ~1 DN on a ~1000-DN reference level;
    # the TPU's default bf16 matmul-input rounding quantizes the inputs
    # in steps of the same order, so every reference-mean contraction
    # must run at full f32 (same hazard class as clean_drift_regressor).
    hp = jax.default_matmul_precision("highest")
    with hp:
        w = (jnp.asarray(ref_mask) > 0).astype(jnp.float32)[None, :, :] \
            * (quad[None] == jnp.arange(4)[:, None, None])      # (4, S, S)
        counts = jnp.maximum(w.sum(axis=(1, 2)), 1.0)           # (4,)
        mean = jnp.einsum("kij,qij->kq", reads, w) / counts     # (NR, 4)
        # One robust pass: clip reference pixels > clip_sigma from their
        # quadrant mean (CR hits on the border), then re-average.
        resid = reads - mean[:, quad]                           # (NR, S, S)
        var = jnp.einsum("kij,qij->kq", resid * resid, w) / counts
        good = (jnp.abs(resid)
                <= clip_sigma * jnp.sqrt(var)[:, quad] + 1e-6)
        wk = w[None] * good[:, None]                            # (NR,4,S,S)
        counts_k = jnp.maximum(wk.sum(axis=(2, 3)), 1.0)
        mean = jnp.einsum("kij,kqij->kq", reads, wk) / counts_k
    has_ref = (w.sum(axis=(1, 2)) > 0).astype(jnp.float32)      # (4,)
    offsets = (mean - mean[0]) * has_ref[None]
    return reads - offsets[:, quad], offsets


def linearize_reads(reads_dn: jnp.ndarray, nonlin_coeffs: jnp.ndarray,
                    full_well_e: float, gain,
                    bias_e=None, n_iter: int = 4) -> jnp.ndarray:
    """calwf3 NLINCORR: invert the per-pixel cubic non-linearity.

    The detector compresses the accumulated charge before readout
    (ops/exposure._apply_nonlinearity, reference: wayne/detector.py ::
    apply_non_linearity): measured = Q * (1 - (c1 q + c2 q^2 + c3 q^3)),
    q = min(Q, fw)/fw. Real pipelines undo this per read from the NLIN
    reference file before any flux estimator runs — CDS and up-the-ramp
    slopes on UNcorrected reads are flux-dependently biased (the deficit
    grows with accumulated charge, so in-transit and out-of-transit
    frames compress differently and the bias does NOT cancel in depth
    ratios, unlike static flat/gain structure).

    The inversion is a fixed-point iteration Q <- m / (1 - p(q(Q)))
    starting from Q = m; the deficit polynomial is small (<~4% at full
    well) so each pass contracts the error by ~25x — ``n_iter=4`` lands
    at float32 roundoff. Pixels at/above full well are unrecoverable
    (the forward clamp destroyed the information); they stay at the
    saturation ceiling and carry DQ bit 256 for downstream masking.
    Inter-pixel capacitance (applied after the cubic in the simulator)
    is NOT deconvolved, matching real calwf3.

    Args:
      reads_dn: (..., NR, S, S) raw-DN read stack (time order).
      nonlin_coeffs: (3, S, S) per-pixel cubic planes (Tables.nonlin_coeffs
        or calibration.load_nonlin_cube_fits).
      full_well_e: charge capacity (electrons).
      gain: e-/DN, scalar or (S, S) map.
      bias_e: optional electronic bias pedestal in ELECTRONS (scalar or
        (S, S) plane, Tables.bias_map) subtracted before the inversion —
        the pedestal is added AFTER the cubic in the readout chain, so
        inverting with it in place mis-scales low-signal pixels.

    Returns the linearized stack in ELECTRONS (bias-subtracted): the
    estimators downstream must not multiply by gain again.
    """
    reads_dn = jnp.asarray(reads_dn, jnp.float32)
    c1, c2, c3 = nonlin_coeffs[0], nonlin_coeffs[1], nonlin_coeffs[2]
    m = reads_dn * gain
    if bias_e is not None:
        m = m - bias_e
    fw = jnp.float32(full_well_e)
    sat_ceiling = fw * (1.0 - ((c3 + c2) + c1))   # measured signal at fw
    out = m
    for _ in range(n_iter):
        q = jnp.clip(out, 0.0, fw) / fw
        out = m / (1.0 - ((c3 * q + c2) * q + c1) * q)
    # Above the ceiling the fixed point extrapolates the q=1 slope;
    # clamp to full well like the forward model's saturation clamp.
    return jnp.where(m >= sat_ceiling, fw, out)


def repair_read_stack(reads_dn: jnp.ndarray,
                      good: jnp.ndarray) -> jnp.ndarray:
    """Rebuild a read stack with DQ-corrupted intervals repaired.

    The physics that makes this nearly lossless for cosmic rays: a CR
    deposits a charge STEP, so it corrupts only the consecutive-read
    DIFFERENCE spanning the hit interval — every later difference
    cancels the offset (up to the small non-linearity of the sensed
    signal). The stack is therefore reassembled from per-interval
    differences, with each corrupted difference replaced by an estimate
    from its clean dispersion-direction neighbours in the SAME interval
    — neighbouring columns share the scan's temporal illumination
    window, so the estimate is valid in scanned exposures where a
    pixel's arrival rate is anything but constant in time.

    Degenerate cases fall out naturally: hot pixels (every interval
    flagged) become pure spatial interpolation; saturated tails are
    rebuilt from unsaturated neighbours; a pixel whose neighbours are
    also flagged falls back to cross-dispersion neighbours, then to the
    clean part of its own ramp.

    Args:
      reads_dn: (..., NR, S, S) sampled reads in time order.
      good: (..., NR-1, S, S) bool, True = interval difference usable
        (from ~cr_bad_diff_masks or good_diff_masks_from_dq).
    Returns the repaired (..., NR, S, S) stack; with all-good masks it
    returns the input exactly (the diffs telescope back).
    """
    reads_dn = jnp.asarray(reads_dn)
    diffs = jnp.diff(reads_dn, axis=-3)

    def neighbour_mean(axis):
        # Non-wrapping nearest-neighbour average along ``axis`` using
        # only clean neighbours. jnp.roll wraps, which would repair an
        # edge-column pixel against the far (dark) edge — mask the
        # wrapped entries out instead of special-casing the slices.
        n = diffs.shape[axis]
        idx_shape = [1] * diffs.ndim
        idx_shape[axis] = n
        idx = jnp.arange(n).reshape(idx_shape)
        ga = jnp.logical_and(jnp.roll(good, 1, axis=axis), idx > 0)
        gb = jnp.logical_and(jnp.roll(good, -1, axis=axis), idx < n - 1)
        va = jnp.roll(diffs, 1, axis=axis)
        vb = jnp.roll(diffs, -1, axis=axis)
        w = ga.astype(diffs.dtype) + gb.astype(diffs.dtype)
        est = (jnp.where(ga, va, 0.0) + jnp.where(gb, vb, 0.0)) \
            / jnp.maximum(w, 1.0)
        return est, w > 0

    # First choice: dispersion-direction (column) neighbours — same scan
    # illumination window, adjacent wavelength. Fallback for clustered
    # hits: cross-dispersion (row) neighbours — same wavelength, nearby
    # time window. Last resort (both neighbours flagged on both axes,
    # vanishingly rare): keep only the clean part of the ramp.
    est_x, have_x = neighbour_mean(-1)
    est_y, have_y = neighbour_mean(-2)
    est = jnp.where(have_x, est_x, jnp.where(have_y, est_y, 0.0))

    # Shape from the neighbours, amplitude from the pixel itself (the
    # standard up-the-ramp repair refinement): column neighbours share
    # the scan's temporal profile almost exactly but can sit on a steep
    # spectral gradient, so using their AMPLITUDE mis-repairs band-edge
    # pixels. Rescale the neighbour profile so its clean-interval sum
    # matches the pixel's own clean-interval sum; pixels with no clean
    # reads at all (hot) keep the plain neighbour estimate — amplitude
    # has to come from somewhere.
    goodf = good.astype(diffs.dtype)
    own_sum = jnp.sum(diffs * goodf, axis=-3, keepdims=True)
    nb_sum = jnp.sum(est * goodf, axis=-3, keepdims=True)
    scale = own_sum / jnp.where(nb_sum == 0.0, 1.0, nb_sum)
    # sign/magnitude guards match the sparse paths: in low-signal
    # regions own/nb sums are noise-dominated with arbitrary sign — an
    # unclamped ratio could invert (scale < 0) or blow up a repaired
    # ramp segment.
    scale_ok = (jnp.abs(nb_sum) > 0.05 * jnp.abs(own_sum) + 1e-3) \
        & (scale > 0.0) & (scale < 8.0)
    est = jnp.where(scale_ok, est * scale, est)

    repaired = jnp.where(good, diffs, est)
    rebuilt = reads_dn[..., :1, :, :] + jnp.cumsum(repaired, axis=-3)
    return jnp.concatenate([reads_dn[..., :1, :, :], rebuilt], axis=-3)


def repair_read_stack_sparse(reads_dn: jnp.ndarray, cr_pos: jnp.ndarray,
                             cr_count: jnp.ndarray) -> jnp.ndarray:
    """CR repair in O(hits) gathers instead of O(frame) passes.

    The dense repair_read_stack costs ~20 full-frame passes — measured
    2.4x the whole exposure simulation on the MC-ensemble path (config
    5: 25 -> 10 visits/s/chip) to fix ~100 pixels of 262k. This variant
    computes the SAME correction (neighbour-shape estimate rescaled to
    the pixel's own clean amplitude) only at the simulator's known hit
    sites, then scatter-adds the per-interval deltas and prefix-sums
    them down the ramp. Exact match to the dense repair whenever the
    hit pixel's column neighbours are clean in every interval (the
    overwhelmingly common case); multiply-hit pixels and hit-adjacent
    neighbours get a slightly different (still bounded) amplitude
    rescale. CR-only — file-level DQ bits (saturation/hot) go through
    the dense path.

    Args:
      reads_dn: (NR, S, S) reads in time order.
      cr_pos: (nsamp, 2, MAX_CR) hit rows/cols; cr_count: (nsamp,).
    """
    nsamp, _, n_cr = cr_pos.shape
    S = reads_dn.shape[-1]
    dtype = reads_dn.dtype
    k_idx = jnp.repeat(jnp.arange(nsamp), n_cr)              # (H,)
    ys = cr_pos[:, 0, :].reshape(-1)
    xs = cr_pos[:, 1, :].reshape(-1)
    valid = (jnp.arange(n_cr)[None, :] < cr_count[:, None]).reshape(-1)
    valid_f = valid.astype(dtype)

    # Per-interval hit multiplicity: two CRs can land on the SAME pixel
    # in the same interval (the hit list is not deduplicated) — every
    # per-site quantity below divides by mult so each corrupted site is
    # counted exactly once.
    counts = jnp.zeros((nsamp, S, S), dtype).at[k_idx, ys, xs].add(valid_f)
    hits = counts > 0
    mult = jnp.maximum(counts[k_idx, ys, xs], 1.0)

    def diff_at(y, x):
        return (reads_dn[k_idx + 1, y, x] - reads_dn[k_idx, y, x])

    d_own = diff_at(ys, xs)
    # Per-PIXEL sum of corrupted diffs (sites counted once): makes the
    # clean-ramp totals exact even for pixels hit in several intervals.
    bad_px = jnp.zeros((S, S), dtype).at[ys, xs].add(
        jnp.where(valid, d_own, 0.0) / mult)
    total_clean = (reads_dn[-1] - reads_dn[0]) - bad_px      # (S, S)

    xl = jnp.maximum(xs - 1, 0)
    xr = jnp.minimum(xs + 1, S - 1)
    # non-wrapping, clean-neighbour weights (matching the dense repair)
    wl = (xl != xs) & ~hits[k_idx, ys, xl]
    wr = (xr != xs) & ~hits[k_idx, ys, xr]
    d_l = diff_at(ys, xl)
    d_r = diff_at(ys, xr)
    w = wl.astype(dtype) + wr.astype(dtype)
    est = (jnp.where(wl, d_l, 0.0) + jnp.where(wr, d_r, 0.0)) \
        / jnp.maximum(w, 1.0)
    # shape-from-neighbours / amplitude-from-own-clean-ramp rescale.
    # The neighbour sum excludes the HIT interval's diff (the dense
    # repair sums neighbour estimates over the pixel's good intervals
    # only) and, via total_clean, the neighbour's own corrupted diffs.
    own_clean = total_clean[ys, xs]
    nb_clean = (jnp.where(wl, total_clean[ys, xl] - d_l, 0.0)
                + jnp.where(wr, total_clean[ys, xr] - d_r, 0.0)) \
        / jnp.maximum(w, 1.0)
    scale = own_clean / jnp.where(nb_clean == 0.0, 1.0, nb_clean)
    scale_ok = (jnp.abs(nb_clean) > 0.05 * jnp.abs(own_clean) + 1e-3) \
        & (scale > 0.0) & (scale < 8.0)
    est = jnp.where(scale_ok, est * scale, est)
    delta = jnp.where(valid & (w > 0), est - d_own,
                      jnp.where(valid, -d_own, 0.0)) / mult

    corr = jnp.zeros((nsamp, S, S), dtype).at[k_idx, ys, xs].add(delta)
    corr_cum = jnp.cumsum(corr, axis=0)          # hits k affect reads k+1..
    return jnp.concatenate([reads_dn[:1], reads_dn[1:] + corr_cum])


def _cr_hit_deltas(reads_dn: jnp.ndarray, cr_pos: jnp.ndarray,
                   cr_count: jnp.ndarray):
    """Per-hit repaired-diff deltas with NO frame-sized scatters.

    Computes, for every (padded) CR hit, the correction
    ``delta = est - d_own`` that the dense repair would apply to that
    hit's interval difference — using only gathers and (H, H) pairwise
    site comparisons (H = nsamp * MAX_CR), never a scatter into an
    (nsamp, S, S) frame. TPU scatters serialize per update; measured
    0.8 ms/exposure on the MC-ensemble path for ~100 hits, 1.7x the
    exposure simulation itself.

    Returns (delta (H,), k_idx (H,), xs (H,)); padded entries carry
    delta = 0.
    """
    nsamp, _, n_cr = cr_pos.shape
    S = reads_dn.shape[-1]
    dtype = reads_dn.dtype
    k_idx = jnp.repeat(jnp.arange(nsamp), n_cr)              # (H,)
    ys = cr_pos[:, 0, :].reshape(-1)
    xs = cr_pos[:, 1, :].reshape(-1)
    valid = (jnp.arange(n_cr)[None, :] < cr_count[:, None]).reshape(-1)

    # Same-interval comparisons stay (nsamp, n_cr, n_cr) — k must match,
    # so the pairwise work is per interval, 15x smaller than (H, H).
    pid_k = cr_pos[:, 0, :] * S + cr_pos[:, 1, :]            # (nsamp, n_cr)
    valid_k = jnp.arange(n_cr)[None, :] < cr_count[:, None]
    pair = (pid_k[:, :, None] == pid_k[:, None, :]) & valid_k[:, None, :]
    mult = jnp.maximum(
        jnp.sum(pair.astype(dtype), axis=2), 1.0).reshape(-1)  # (H,)
    hit_l = jnp.any((pid_k[:, :, None] - 1 == pid_k[:, None, :])
                    & valid_k[:, None, :], axis=2).reshape(-1)
    hit_r = jnp.any((pid_k[:, :, None] + 1 == pid_k[:, None, :])
                    & valid_k[:, None, :], axis=2).reshape(-1)

    # Compact away the per-interval padding before any heavy op: the
    # hit-list bound is lam + 6 sigma + 4 PER INTERVAL (auto_max_cr), so
    # summing bounds over nsamp intervals over-provisions the padded
    # total. The row-gathers below scale with H — measured as the
    # dominant repair cost at full padding. The budget comes from the
    # TOTAL-count distribution: inverting the per-interval bound
    # recovers a conservative rate lam, and the total over nsamp
    # intervals is Poisson(nsamp*lam), so mean + 10 sigma + nsamp is
    # safe at ANY rate. (A flat H//2 + 3*n_cr budget sat ~0 sigma above
    # the mean once lam ~ 200 — large subarrays x long read intervals —
    # and silently dropped valid hits.)
    H = nsamp * n_cr
    if nsamp > 2:
        u = max((-6.0 + (20.0 + 4.0 * n_cr) ** 0.5) / 2.0, 0.0)
        mean_total = nsamp * u * u
        stat = int(mean_total + 10.0 * max(mean_total, 1.0) ** 0.5
                   + nsamp) + 1
        h_budget = min(H, max(H // 2 + 3 * n_cr, stat))
    else:
        h_budget = H
    if h_budget < H:
        # Keep the LARGEST corrupted diffs if the valid count ever
        # exceeds the budget (possible only with a manually undersized
        # max_cr_per_read): degradation is graceful, not arbitrary.
        d_mag = jnp.abs(reads_dn[k_idx + 1, ys, xs]
                        - reads_dn[k_idx, ys, xs])
        order = jnp.argsort(jnp.where(valid, -d_mag, jnp.inf))
        sel = order[:h_budget]
        k_idx, ys, xs = k_idx[sel], ys[sel], xs[sel]
        valid, mult = valid[sel], mult[sel]
        hit_l, hit_r = hit_l[sel], hit_r[sel]
    valid_f = valid.astype(dtype)

    xl = jnp.maximum(xs - 1, 0)
    xr = jnp.minimum(xs + 1, S - 1)
    pid = ys * S + xs                      # pixel ids (< S^2, int32 exact)

    # Values via ROW gathers (contiguous (1, S) slices — the
    # TPU-efficient gather shape) + one-hot column picks; the hit pixel
    # and both neighbours share the same row, so three row-gathers from
    # the READS serve all per-hit values with no materialized
    # (nsamp, S, S) diff stack (measured 10% of the ensemble step).
    flat = reads_dn.reshape((nsamp + 1) * S, S)
    rows_a = jnp.take(flat, k_idx * S + ys, axis=0)          # (H, S) read k
    rows_b = jnp.take(flat, (k_idx + 1) * S + ys, axis=0)    # read k+1
    rows_d = rows_b - rows_a
    total = reads_dn[-1] - reads_dn[0]
    rows_t = jnp.take(total, ys, axis=0)                     # (H, S)
    col = jnp.arange(S)[None, :]
    oh_own = xs[:, None] == col
    oh_l = xl[:, None] == col
    oh_r = xr[:, None] == col

    def pick(rows, oh):
        return jnp.sum(jnp.where(oh, rows, 0.0), axis=1)

    d_own = pick(rows_d, oh_own)
    d_l = pick(rows_d, oh_l)
    d_r = pick(rows_d, oh_r)
    wl = (xl != xs) & ~hit_l
    wr = (xr != xs) & ~hit_r
    w = wl.astype(dtype) + wr.astype(dtype)
    est = (jnp.where(wl, d_l, 0.0) + jnp.where(wr, d_r, 0.0)) \
        / jnp.maximum(w, 1.0)

    # clean CDS totals: total minus the pixel's corrupted diffs (sites
    # counted once), evaluated at the hit pixel and both neighbours —
    # (H, H) weighted reductions over pixel ids, scatter-free (pixel
    # matches cross intervals, so these three stay global).
    site_bad = valid_f * d_own / mult                        # (H,)

    def bad_at(target_pid):
        return jnp.sum(jnp.where(pid[None, :] == target_pid[:, None],
                                 site_bad[None, :], 0.0), axis=1)

    own_clean = pick(rows_t, oh_own) - bad_at(pid)
    nb_clean = (jnp.where(wl, pick(rows_t, oh_l) - bad_at(pid - 1) - d_l,
                          0.0)
                + jnp.where(wr, pick(rows_t, oh_r) - bad_at(pid + 1) - d_r,
                            0.0)) \
        / jnp.maximum(w, 1.0)
    scale = own_clean / jnp.where(nb_clean == 0.0, 1.0, nb_clean)
    scale_ok = (jnp.abs(nb_clean) > 0.05 * jnp.abs(own_clean) + 1e-3) \
        & (scale > 0.0) & (scale < 8.0)
    est = jnp.where(scale_ok, est * scale, est)
    delta = jnp.where(valid & (w > 0), est - d_own,
                      jnp.where(valid, -d_own, 0.0)) / mult
    return delta, k_idx, xs


def extract_spectra_cr(reads_dn: jnp.ndarray, cr_pos: jnp.ndarray,
                       cr_count: jnp.ndarray,
                       read_times: jnp.ndarray | None = None) -> jnp.ndarray:
    """Column spectrum of one exposure with CR hits repaired — applied
    AFTER extraction, in 1D column space.

    Both estimators are linear in the reads, so a hit's repaired-diff
    delta (which the dense repair would add to reads k+1..NR of one
    pixel) maps to a closed-form per-column correction: weight 1 for
    CDS (the delta reaches the last read), and ``T * sum_{j>k} c_j``
    for the up-the-ramp slope (c_j the least-squares coefficients).
    O(hits) work, no frame-sized scatter — this is the MC-ensemble hot
    path (reference behaviour: DQ-consuming pipelines; the file-level
    reducer uses the dense repair_read_stack on the ima DQ planes).
    """
    S = reads_dn.shape[-1]
    delta, k_idx, xs = _cr_hit_deltas(reads_dn, cr_pos, cr_count)
    if read_times is None:
        net = reads_dn[-1] - reads_dn[0]
        base = net.sum(axis=-2)
        wgt = delta
    else:
        base = ramp_slope_frame(reads_dn, read_times).sum(axis=-2)
        t = jnp.asarray(read_times, reads_dn.dtype)
        dt = t - t.mean()
        coef = dt / jnp.sum(dt * dt)
        # delta lands on reads k+1..: slope*T changes by delta * g[k]
        g = (t[-1] - t[0]) * (jnp.cumsum(coef[::-1])[::-1])[1:]   # (nsamp,)
        wgt = delta * g[k_idx]
    corr = jnp.sum(
        jnp.where(xs[:, None] == jnp.arange(S)[None, :],
                  wgt[:, None], 0.0), axis=0)
    return base + corr


def ramp_slope_frame(reads_dn: jnp.ndarray,
                     read_times: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel least-squares up-the-ramp slope x exposure time (DN).

    What calwf3 does instead of a last-minus-first difference: fit a
    straight line through ALL the non-destructive reads. For NR reads of
    equal noise the slope estimator's variance is ~6(NR-1)/(NR(NR+1)) of
    the CDS variance in the read-noise-limited regime (~3x lower at
    NR = 16), at identical signal. Returns slope * (t_N - t_0), i.e. a
    CDS-equivalent accumulated frame, so downstream extraction is
    method-agnostic.
    """
    t = jnp.asarray(read_times, reads_dn.dtype)
    tbar = t.mean()
    dt = t - tbar
    denom = jnp.sum(dt * dt)
    sbar = reads_dn.mean(axis=0)
    # precision=HIGHEST: this contraction feeds ppm-level light curves,
    # and TPU dots round f32 inputs to bf16 by default (CLAUDE.md).
    slope = jnp.tensordot(dt, reads_dn - sbar[None], axes=1,
                          precision=jax.lax.Precision.HIGHEST) / denom
    return slope * (t[-1] - t[0])


def net_frame(reads_dn: jnp.ndarray, gain: jnp.ndarray,
              read_times: jnp.ndarray | None = None,
              good_diffs: jnp.ndarray | None = None) -> jnp.ndarray:
    """Accumulated-charge frame in electrons from one exposure's reads.

    CDS (last minus zeroth read) by default; the up-the-ramp
    least-squares slope when ``read_times`` is given. ``good_diffs``
    (NR-1, S, S) bool enables the DQ-aware interval repair
    (repair_read_stack) first.
    """
    if good_diffs is not None:
        reads_dn = repair_read_stack(reads_dn, good_diffs)
    if read_times is None:
        return (reads_dn[-1] - reads_dn[0]) * gain           # (S, S) e-
    return ramp_slope_frame(reads_dn, read_times) * gain


def extract_exposure(reads_dn: jnp.ndarray, gain: jnp.ndarray,
                     y_window: tuple[int, int],
                     bg_rows: tuple[int, int],
                     read_times: jnp.ndarray | None = None,
                     good_diffs: jnp.ndarray | None = None) -> jnp.ndarray:
    """Net electrons per column from one exposure's reads (NR, S, S).

    Accumulated-charge frame (net_frame), background-subtracted using
    rows far from the spectrum, box-summed over the extraction window.
    """
    net = net_frame(reads_dn, gain, read_times, good_diffs)
    bg = jnp.median(net[bg_rows[0]: bg_rows[1], :], axis=0)  # per-column sky
    net = net - bg[None, :]
    return net[y_window[0]: y_window[1], :].sum(axis=0)      # (S,)


def spatial_profile(frame_e: jnp.ndarray, y_window: tuple[int, int],
                    smooth_x: int = 8,
                    support_frac: float = 0.03) -> jnp.ndarray:
    """Normalised cross-dispersion profile P(y, x) for optimal extraction.

    Built from a high-S/N background-subtracted frame (the visit mean):
    clipped nonnegative, boxcar-smoothed along the dispersion axis
    (width 2*smooth_x + 1 — neighbouring columns share the scan/PSF
    profile, so smoothing denoises P without biasing it), support-
    thresholded at ``support_frac`` of each column's peak (clipping
    noise at zero otherwise steals profile mass into the wings, which
    biases the extracted flux HIGH — measured +6% at mean-frame wing
    S/N ~ 1 before the threshold), normalised to sum to 1 over the
    extraction rows per column. Columns carrying no signal fall back to
    a flat profile (optimal extraction there degrades gracefully to a
    windowed mean).
    """
    win = jnp.maximum(frame_e[y_window[0]: y_window[1], :], 0.0)
    w_rows = win.shape[0]
    if smooth_x > 0:
        k = 2 * smooth_x + 1
        pad = jnp.pad(win, ((0, 0), (smooth_x, smooth_x)), mode="edge")
        c = jnp.cumsum(pad, axis=1)
        c = jnp.concatenate([jnp.zeros_like(c[:, :1]), c], axis=1)
        win = (c[:, k:] - c[:, :-k]) / k
    win = jnp.where(win > support_frac * jnp.max(win, axis=0, keepdims=True),
                    win, 0.0)
    colsum = jnp.sum(win, axis=0, keepdims=True)
    ok = colsum > 1e-6
    return jnp.where(ok, win / jnp.where(ok, colsum, 1.0), 1.0 / w_rows)


def optimal_extract(net_e: jnp.ndarray, profile: jnp.ndarray,
                    y_window: tuple[int, int],
                    var_floor_e2: jnp.ndarray) -> jnp.ndarray:
    """Horne (1986) inverse-variance profile-weighted extraction.

    f_hat(x) = sum_y P D / V / sum_y P^2 / V with
    V = max(P * f_box, 0) + ``var_floor_e2``: the shot term comes from
    the MODEL (profile times the column's box estimate), not the raw
    data — Horne's iteration step, which keeps the weights uncorrelated
    with the pixel noise (a raw-data V clips negative noise excursions
    and biases the estimate low; measured ~1% at S/N ~ 1.5/pixel). The
    floor is the estimator's read-noise variance in e-^2 (2 rn^2 for
    CDS, rn^2 * 12(NR-1)/(NR(NR+1)) for the up-the-ramp slope — see
    read_noise_var_e2). Exactly flux-preserving whenever D is
    proportional to P (any V), and reaches the inverse-variance bound
    sigma^2 = 1/sum(P^2/V) in the read-noise/background-limited regime
    where box extraction pays sigma^2 = W * var_floor. Supports leading
    batch axes on ``net_e``.
    """
    d = net_e[..., y_window[0]: y_window[1], :]
    f_box = jnp.sum(d, axis=-2, keepdims=True)
    v = jnp.maximum(profile * f_box, 0.0) + var_floor_e2
    num = jnp.sum(profile * d / v, axis=-2)
    den = jnp.sum(profile * profile / v, axis=-2)
    return num / jnp.maximum(den, 1e-12)


def read_noise_var_e2(read_noise_e: float, n_reads: int,
                      ramp: bool = False) -> float:
    """Read-noise variance of the accumulated-charge estimators (e-^2).

    CDS differences two reads: 2 rn^2. The up-the-ramp least-squares
    slope (x T) averages all NR reads: rn^2 * 12 (NR-1) / (NR (NR+1))
    for uniform sampling (the 6(NR-1)/(NR(NR+1)) CDS-variance ratio of
    ramp_slope_frame's docstring, times the CDS 2 rn^2).
    """
    if ramp:
        return float(read_noise_e) ** 2 * 12.0 * (n_reads - 1) \
            / (n_reads * (n_reads + 1))
    return 2.0 * float(read_noise_e) ** 2


def _catmull_rom(f: jnp.ndarray, q: jnp.ndarray
                 ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Cubic Catmull-Rom sampling of ``f`` (unit grid) at positions ``q``.

    Returns (value, d value / d q), edge-clamped. Used instead of
    jnp.interp everywhere sub-pixel systematics matter: linear
    interpolation's O(h^2 f'') error depends on frac(q), which turns a
    smooth drift series into a sawtooth systematic exactly where the
    flux gradient is steepest (the trace's blue onset — measured 0.014
    px shift bias with jnp.interp vs 0.004 px cubic on a 1.2 px-wide
    sigmoid edge). Four reads per point, branch-free: VPU-friendly.
    """
    n = f.shape[0]
    i = jnp.clip(jnp.floor(q).astype(jnp.int32), 0, n - 2)
    t = q - i.astype(q.dtype)
    fm1 = f[jnp.clip(i - 1, 0, n - 1)]
    f0, f1 = f[i], f[jnp.clip(i + 1, 0, n - 1)]
    f2 = f[jnp.clip(i + 2, 0, n - 1)]
    b = f1 - fm1
    c = 2.0 * fm1 - 5.0 * f0 + 4.0 * f1 - f2
    d = -fm1 + 3.0 * f0 - 3.0 * f1 + f2
    val = 0.5 * (2.0 * f0 + (b + (c + d * t) * t) * t)
    dval = 0.5 * (b + (2.0 * c + 3.0 * d * t) * t)
    # clamp beyond the grid: constant value, zero slope
    lo, hi = q < 0.0, q > n - 1.0
    val = jnp.where(lo, f[0], jnp.where(hi, f[n - 1], val))
    dval = jnp.where(lo | hi, 0.0, dval)
    return val, dval


def spectral_shifts(spectra: jnp.ndarray, x_window: tuple[int, int],
                    n_iter: int = 3) -> jnp.ndarray:
    """Per-exposure sub-pixel dispersion-direction drifts (px).

    HST pointing drifts a few hundredths of a pixel per orbit; with
    fixed column bins that drift modulates each channel by
    delta_x * d(ln F)/dx and leaks into the channel light curves as a
    correlated trend (Iraclis fits and removes horizontal shifts for
    exactly this reason). Model: s_i(x) = a_i * ref(x - delta_i) with
    ref the visit-mean spectrum. Gauss-Newton with cubic (Catmull-Rom)
    resampling of ref and its ANALYTIC derivative (linear interp +
    finite-difference gradient left a 0.014 px frac(delta)-dependent
    bias at the steep trace onset; cubic cuts it ~4x), amplitude
    profiled out in closed form each step, all exposures in parallel.
    Interior columns only (2-px margin) so the edge clamp never biases
    the fit.

    Returns delta (n_exp,): s_i appears shifted REDWARD by delta_i.
    """
    x0, x1 = x_window
    win = spectra[:, x0:x1]                                  # (n_exp, W)
    w = win.shape[1]
    xs = jnp.arange(w, dtype=spectra.dtype)
    ref = jnp.mean(win / jnp.mean(win, axis=1, keepdims=True), axis=0)
    m = ((xs >= 2) & (xs < w - 2)).astype(spectra.dtype)[None, :]

    def step(delta, _):
        r, dr = jax.vmap(lambda d: _catmull_rom(ref, xs - d))(delta)
        a = jnp.sum(win * r * m, axis=1) / jnp.maximum(
            jnp.sum(r * r * m, axis=1), 1e-12)
        e = win - a[:, None] * r
        jac = -a[:, None] * dr     # d model/d delta; d(x-delta)/ddelta = -1
        num = jnp.sum(e * jac * m, axis=1)
        den = jnp.maximum(jnp.sum(jac * jac * m, axis=1), 1e-12)
        return delta + num / den, None

    delta0 = jnp.zeros(win.shape[0], spectra.dtype)
    delta, _ = jax.lax.scan(step, delta0, None, length=n_iter)
    return delta


def align_spectra(spectra: jnp.ndarray, shifts: jnp.ndarray) -> jnp.ndarray:
    """Undo per-exposure dispersion drifts: sample s_i at x + delta_i.

    With s_i(x) = ref(x - delta_i) (spectral_shifts' model), the
    realigned s_i(x + delta_i) = ref(x) for every exposure. Linear
    interpolation — good for DIAGNOSTIC use (residual maps, stacked
    spectra); for light curves use drift_binned_flux instead:
    interpolating a peaked spectrum smooths it by a delta-dependent
    amount, and with delta varying across the visit that smoothing
    itself becomes a depth systematic (measured: realign-then-bin left
    2x the channel-depth error of binning with shifted edges).
    """
    s = spectra.shape[-1]
    xs = jnp.arange(s, dtype=spectra.dtype)
    return jax.vmap(
        lambda f, d: _catmull_rom(f, xs + d)[0])(spectra, shifts)


def drift_binned_flux(spectra: jnp.ndarray, shifts: jnp.ndarray,
                      edges: jnp.ndarray) -> jnp.ndarray:
    """Channel fluxes with per-exposure bin edges that FOLLOW the drift.

    Exposure i's bin j integrates columns [edges[j] + delta_i,
    edges[j+1] + delta_i) — the same SOURCE wavelengths every exposure —
    as differences of the cumulative column flux, cubic-resampled at
    the fractional edges. Flux-conserving by construction (adjacent
    bins share an edge), and only two edge columns per bin are
    interpolated — no whole-profile smoothing. With zero shifts and
    integer edges it reproduces the plain partial sums exactly.

    NOT used by reduce_visit's align path: the extraction window's blue
    edge is a sub-pixel flux cliff (the start of the dispersed
    wavelength grid), where ANY interpolant's edge error turns the
    drift into a bin-flux systematic (measured: linear interp left a
    2.4e-3 channel-0 depth error, cubic 3.2e-2 from kink overshoot —
    vs shift_detrend's 2e-4). Useful as a general flux-conserving
    fractional rebinner when the bins sit inside smooth flux.

    Returns (n_exp, len(edges) - 1).
    """
    s = spectra.shape[-1]
    cum = jnp.concatenate(
        [jnp.zeros_like(spectra[:, :1]), jnp.cumsum(spectra, axis=1)],
        axis=1)                                              # (n_exp, S+1)
    q = edges.astype(spectra.dtype)[None, :] + shifts[:, None]
    at = jax.vmap(lambda c, qq: _catmull_rom(c, qq)[0])(cum, q)
    return at[:, 1:] - at[:, :-1]


def dispersion_centroid(spectra: jnp.ndarray,
                        x_window: tuple[int, int]) -> jnp.ndarray:
    """Flux-weighted column centroid over the window — the drift proxy.

    For light-curve DETRENDING this beats the profile-fit shift
    estimate: shift_detrend only needs a regressor AFFINE in the true
    drift, and the centroid of a translating, edge-clipped spectrum is
    affine to measured 3e-4 px over a 0.5 px drift (the profile fit's
    residual is 6% of the drift range — its Gauss-Newton model cannot
    represent the sub-pixel flux cliff at the window's blue edge, and
    that bias is NONLINEAR in the drift, so it survives linear
    decorrelation). Its absolute scale is below 1 (edge clipping), so
    report spectral_shifts for px values; use this for detrending.

    Caveat: a chromatic transit (wavelength-dependent depth) tilts the
    in-transit spectrum and moves the centroid IN TRANSIT — and the
    excursion scales with the window width: a 0.003-amplitude rp
    spectrum over a 128-px window moves it by ~0.04 px, comparable to
    the drifts being removed. Because shift_detrend's coefficients are
    fitted out of transit but APPLIED in transit, that excursion
    multiplies straight into the recovered depths (measured: 0.02 rp
    error on the red-edge channel of the validation visit). Never feed
    the raw centroid to shift_detrend on a transit/eclipse visit —
    clean it first: clean_drift_regressor(transit_drift_basis(...))
    when orbit + limb darkening are known (ppm-accurate), else
    drift_regressor's white-dip projection.
    """
    x0, x1 = x_window
    win = spectra[..., x0:x1]
    xs = jnp.arange(x0, x1, dtype=spectra.dtype)
    return jnp.sum(win * xs, axis=-1) / jnp.maximum(
        jnp.sum(win, axis=-1), 1e-12)


def drift_regressor(spectra: jnp.ndarray, x_window: tuple[int, int],
                    white_flux: jnp.ndarray,
                    oot: jnp.ndarray) -> jnp.ndarray:
    """Transit-immune drift regressor for shift_detrend.

    The dispersion centroid with its transit-correlated component
    projected out. A chromatic transit (rp varying across the band)
    tilts the in-transit spectrum, so the raw centroid carries an
    in-transit excursion proportional to the white dip (~0.04 px for a
    0.003 rp modulation over a 128-px window) on top of the pointing
    drift; shift_detrend would then "correct" the transit itself,
    biasing every channel by c_j times the excursion (worst at the
    window-edge channels where c_j is steepest). The transit signature
    t_i = max(0, 1 - white_i / white_oot_mean) — zeroed on
    out-of-transit epochs so the white light curve's own drift leak
    never enters the projection direction — is least-squares projected
    out of the centroid. The removed real-drift component is
    <drift, t>/<t, t> * t, negligible for drifts smooth across the
    transit; with no transit in the visit t is ~0 and the projection
    is a (Cauchy-Schwarz-bounded) no-op.

    This is the MODEL-FREE fallback: the per-channel transit curves are
    not exactly proportional to the white dip (limb darkening spreads
    the contact shapes), so a dLC/drp-shaped residual survives
    (measured ~2e-3 px on a 0.003-amplitude rp spectrum — 3.8e-3 rp on
    a cliff channel). When orbit + limb darkening are available, use
    clean_drift_regressor(transit_drift_basis(...)) instead, which
    spans that shape and estimates coefficients through a
    drift-orthogonal instrument.
    """
    reg = dispersion_centroid(spectra, x_window)
    w = oot.astype(reg.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    wbar = jnp.maximum(jnp.sum(white_flux * w) / n, 1e-12)
    t = jnp.maximum(1.0 - white_flux / wbar, 0.0) * (1.0 - w)
    tc = t - jnp.mean(t)
    rc = reg - jnp.mean(reg)
    coef = jnp.sum(rc * tc) / jnp.maximum(jnp.sum(tc * tc), 1e-12)
    return reg - coef * tc


def transit_drift_basis(exp_mid_s: jnp.ndarray, orbit: OrbitParams,
                        ld: jnp.ndarray, rp0: jnp.ndarray,
                        n_quad: int = 32) -> jnp.ndarray:
    """Model basis spanning a chromatic transit's centroid excursion.

    The dispersion centroid of a chromatically transiting spectrum
    carries an in-transit excursion e(i) = sum_j q_j (LC(rp_j, i) - 1).
    With shared limb darkening the per-channel curves differ only by
    rp_j, so to first order in the rp spread the excursion lives in
    span{dip(rp0), dLC/drp(rp0)} — the dip captures the depth-weighted
    mean, the derivative the ingress/egress shape of the chromatic
    spread (measured: the white-dip-only projection leaves exactly a
    dLC/drp-shaped residual peaking at the contacts). Two further
    time-modulated columns dip*t, dLC/drp*t absorb the slow
    (drift x transit, baseline-slope x transit) cross terms that are
    odd in time. Columns are evaluated from the same occultation
    integral the depth fit uses, so no data (and no drift) enters.

    Returns (n_exp, 4); combine with clean_drift_regressor. Accuracy is
    insensitive to rp0 at the +-0.015 level (the derivative column
    absorbs the linear error), so a white-light guess is plenty.
    """
    z, in_front = projected_separation(exp_mid_s, orbit)

    def lc(rp):
        f = transit_depth_curve(z, rp, ld, n_quad)
        return 1.0 - (1.0 - f) * in_front

    lc0, dlc = jax.jvp(lc, (jnp.asarray(rp0, jnp.float32),),
                       (jnp.float32(1.0),))
    dip = 1.0 - lc0
    t = ((exp_mid_s - exp_mid_s[0])
         / jnp.maximum(exp_mid_s[-1] - exp_mid_s[0], 1e-9) * 2.0 - 1.0)
    return jnp.stack([dip, dlc, dip * t, dlc * t], axis=1)


def white_drift_basis(white_flux: jnp.ndarray, oot: jnp.ndarray,
                      exp_mid_s: jnp.ndarray) -> jnp.ndarray:
    """Data-driven contamination basis when no transit model is known.

    Columns [d, d*t] with d = 1 - white/white_oot_mean — the measured
    white dip and its time modulation. d carries the white light
    curve's own drift leak, but that leak is SMOOTH in time, so
    clean_drift_regressor's polynomial orthogonalisation removes it
    from the instrument and the estimate stays drift-blind. Without the
    dLC/drp column a contact-shaped residual survives on chromatic
    transits (see transit_drift_basis) — prefer the model basis when
    orbit + limb darkening are available. On a transit-free visit d is
    noise-level and the clean is a no-op.
    """
    w = oot.astype(white_flux.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    wbar = jnp.maximum(jnp.sum(white_flux * w) / n, 1e-12)
    d = 1.0 - white_flux / wbar
    t = ((exp_mid_s - exp_mid_s[0])
         / jnp.maximum(exp_mid_s[-1] - exp_mid_s[0], 1e-9) * 2.0 - 1.0)
    return jnp.stack([d, d * t], axis=1)


def clean_drift_regressor(cen: jnp.ndarray, basis: jnp.ndarray,
                          exp_mid_s: jnp.ndarray,
                          poly_deg: int = 2) -> jnp.ndarray:
    """Remove a transit-shaped contamination from a drift regressor.

    Fits cen = B @ gamma + smooth(t) and returns cen - B @ gamma, with
    gamma estimated through a time-polynomial-orthogonalised instrument:
    Bt = (I - P_poly) B, gamma = (Bt^T B)^-1 Bt^T cen. Because
    Bt^T d = 0 EXACTLY for any drift d in the polynomial span (P_poly
    is a symmetric projector), the estimate cannot eat polynomial
    pointing drift no matter how large gamma is — unlike a plain
    projection, which removes <drift, B> B along with the contamination
    (measured: plain projection left 1.7e-3 rp error on the cliff
    channel, the instrumented fit 3e-4). Basis columns are normalised
    before the solve: the raw dip/derivative scales differ by ~15x and
    the resulting conditioning costs ~3 digits in f32.

    The returned series is affine in the true drift wherever the drift
    is poly_deg-smooth — exactly what shift_detrend needs.
    """
    # Full-f32 matmuls throughout: the dip and dLC/drp basis columns are
    # ~0.99-correlated, so the instrumented normal equations are
    # near-singular and the TPU's default bf16 rounding of matmul INPUTS
    # turns gamma into garbage (measured: recovered depths collapsed to
    # the fit clip bound on chip while CPU was exact — CLAUDE.md hazard).
    with jax.default_matmul_precision("highest"):
        t = ((exp_mid_s - exp_mid_s[0])
             / jnp.maximum(exp_mid_s[-1] - exp_mid_s[0], 1e-9) * 2.0 - 1.0)
        T = jnp.stack([t ** k for k in range(poly_deg + 1)], axis=1)
        B = basis / jnp.maximum(
            jnp.linalg.norm(basis, axis=0), 1e-12)[None, :]
        Bt = B - T @ jnp.linalg.solve(T.T @ T, T.T @ B)
        gam = jnp.linalg.solve(Bt.T @ B + 1e-9 * jnp.eye(B.shape[1]),
                               Bt.T @ cen)
        return cen - B @ gam


def shift_detrend(flux: jnp.ndarray, shifts: jnp.ndarray,
                  oot: jnp.ndarray) -> jnp.ndarray:
    """Divide the linear drift response out of binned light curves.

    Pointing drift moves flux across fixed bin edges: F_ij = F_j *
    (1 + c_j * delta_i) to first order, with c_j the bin's edge
    log-gradient. Fitting c_j by least squares on OUT-OF-TRANSIT epochs
    only (so the transit never contaminates the fit) and dividing
    the model out removes the leak exactly for linear response — for
    ANY gradient, including the sub-pixel flux cliff at the window's
    blue edge where resampling approaches (realign-then-bin, or bin
    edges that follow the drift) break down on interpolation error.
    Only needs ``shifts`` up to an affine transform (use
    dispersion_centroid), so regressor scale bias cancels. This is the
    standard linear-systematics decorrelation real WFC3 pipelines apply
    with jitter/shift vectors as regressors.

    ``flux`` is (n_exp,) or (n_exp, n_chan); returns the same shape.
    """
    squeeze = flux.ndim == 1
    f = flux[:, None] if squeeze else flux
    w = oot.astype(f.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    d = (shifts - jnp.sum(shifts * w) / n)[:, None]
    fbar = jnp.sum(f * w[:, None], axis=0) / n               # (n_chan,)
    var = jnp.maximum(jnp.sum(w[:, None] * d * d, axis=0), 1e-9)
    b = jnp.sum(w[:, None] * d * (f - fbar), axis=0) / var   # (n_chan,)
    corr = f * (fbar / (fbar + b * d))
    return corr[:, 0] if squeeze else corr


# Projected separation beyond which an epoch counts as out-of-transit
# baseline (planet radii are <= 0.2 R_star for every supported system).
OOT_Z = 1.25


def out_of_transit_mask(exp_mid_s: jnp.ndarray,
                        orbit: OrbitParams) -> jnp.ndarray:
    """Boolean out-of-transit mask shared by reduce_visit and the
    file-level run_reduce CLI (one definition of 'baseline')."""
    z, in_front = projected_separation(exp_mid_s, orbit)
    return (z > OOT_Z) | (in_front < 0.5)


@jax.jit
def fit_sky_model(nets_e: jnp.ndarray, comps: jnp.ndarray,
                  sky_mask: jnp.ndarray
                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-exposure LS fit of sky-component weights on sky-only pixels.

    The Iraclis/aXe background treatment: instead of a per-column
    median, fit each exposure's background as a weighted sum of
    component FRAMES (constant + zodi/earthshine master sky + the
    He 1.083 um airglow image + dark) on the off-trace pixels, then
    subtract the fitted model over the WHOLE frame — extrapolating the
    components' spatial structure into the trace rows, which a
    row-median cannot do.

    Args:
      nets_e: (n_exp, S, S) background-inclusive net frames (electrons;
        any common unit — the weights absorb level x exptime).
      comps: (K, S, S) component patterns.
      sky_mask: (S, S) 1 = sky-only pixel (0 = trace/contaminated).

    Returns (weights (n_exp, K), model (n_exp, S, S)). One robust
    iteration: pixels whose first-pass residual exceeds 5x the masked
    MAD (cosmic-ray survivors, unmasked stars) are dropped and the fit
    repeated. The normal equations are computed at precision=HIGHEST
    (the smooth components are near-collinear with the constant — the
    TPU's bf16 matmul-input rounding destroys exactly this class of
    solve; CLAUDE.md) with a relative Tikhonov floor.
    """
    y = jnp.asarray(nets_e, jnp.float32)
    n_exp, S, _ = y.shape
    A = jnp.asarray(comps, jnp.float32).reshape(comps.shape[0], -1)
    m0 = jnp.asarray(sky_mask, jnp.float32).ravel()
    yf = y.reshape(n_exp, -1)

    def solve(m, yi):
        with jax.default_matmul_precision("highest"):
            Am = A * m[None, :]
            G = Am @ A.T
            b = Am @ yi
        G = G + 1e-6 * jnp.diag(jnp.diag(G)) + 1e-12 * jnp.eye(G.shape[0])
        return jnp.linalg.solve(G, b)

    def one(yi):
        w = solve(m0, yi)
        r = yi - w @ A
        # masked MAD of the first-pass residuals
        med = jnp.sum(r * m0) / jnp.maximum(jnp.sum(m0), 1.0)
        mad = (jnp.sum(jnp.abs(r - med) * m0)
               / jnp.maximum(jnp.sum(m0), 1.0))
        m1 = m0 * (jnp.abs(r - med) < 5.0 * jnp.maximum(mad, 1e-3))
        w = solve(m1, yi)
        return w, (w @ A).reshape(S, S)

    return jax.vmap(one)(yf)


def scan_direction_factor(white: jnp.ndarray, oot: jnp.ndarray,
                          reverse: jnp.ndarray) -> jnp.ndarray:
    """Per-exposure divisor removing the upstream/downstream offset.

    Forward and reverse spatial scans see slightly different effective
    exposure times (the WFC3 forward/reverse flux offset, ~0.1-1% and
    achromatic; simulated via ``trends.reverse_flux_offset``). The
    standard correction normalises each direction by its own
    out-of-transit baseline. Returns ``corr`` (n_exp,) — divide every
    flux (white and channels alike: the offset is achromatic) by it.
    jit/vmap-safe; when either direction has <2 out-of-transit
    exposures the factor degrades to 1 (no correction).

    Args:
      white: (n_exp,) white flux (any achromatic-consistent sum).
      oot: (n_exp,) out-of-transit mask (bool or float).
      reverse: (n_exp,) True/1 on reverse-scan exposures.
    """
    w = jnp.asarray(white, jnp.float32)
    o = jnp.asarray(oot, jnp.float32)
    r = jnp.asarray(reverse, jnp.float32)
    n_f = jnp.sum(o * (1.0 - r))
    n_r = jnp.sum(o * r)
    m_f = jnp.sum(w * o * (1.0 - r)) / jnp.maximum(n_f, 1.0)
    m_r = jnp.sum(w * o * r) / jnp.maximum(n_r, 1.0)
    ok = (n_f >= 2.0) & (n_r >= 2.0) & (m_f > 0.0)
    fac = jnp.where(ok, m_r / jnp.maximum(m_f, 1e-30), 1.0)
    return jnp.where(r > 0.0, fac, 1.0)


@partial(jax.jit, static_argnames=("y_window", "x_window"))
def amp_offset_correct(nets: jnp.ndarray, quad_map: jnp.ndarray,
                       y_window: tuple[int, int],
                       x_window: tuple[int, int]) -> jnp.ndarray:
    """Per-exposure per-AMPLIFIER additive-offset removal for
    reference-pixel-less subarrays.

    The WFC3 IR detector reads through four amplifiers (one per
    quadrant); each read's amplifier bias wanders by a few electrons
    (simulated by NoiseFlags.bias_drift). Full frames remove it with
    the reference-pixel border (ref_pixel_correct); IR SUBARRAYS carry
    no reference pixels, and because centred subarrays SPAN quadrant
    boundaries, a background strip in one quadrant cannot see another
    quadrant's offset — measured: with bg_rows in a different quadrant
    than the spectrum, the leaked per-exposure offset tripled the
    realised relative depth scatter over the reported sigma in the
    divide-white systematics ensemble (the offset is additive, so its
    normalised imprint is chromatic ∝ 1/F_c). This estimates each
    quadrant's residual offset per exposure as the MEDIAN of its
    off-source pixels (the ``y_window`` x ``x_window`` source box
    excluded) and subtracts the per-quadrant plane. Apply to
    background-subtracted net frames; a uniform sky residual only
    shifts all four medians together, which is harmless.

    ``quad_map``: (S, S) int quadrant index per pixel
    (calibration.quadrant_map). Returns corrected (n_exp, S, S).
    """
    S = nets.shape[-1]
    src = jnp.zeros((S, S), bool).at[
        y_window[0]: y_window[1], x_window[0]: x_window[1]].set(True)

    def one(net):
        def q_off(q):
            sel = (quad_map == q) & ~src
            med = jnp.nanmedian(jnp.where(sel, net, jnp.nan))
            # a quadrant fully covered by the source box (or absent
            # from the subarray) has no estimator — leave it at 0
            # rather than writing nanmedian(all-NaN) = NaN into every
            # pixel of the quadrant
            return jnp.where(jnp.sum(sel) >= 16, med, 0.0)

        offs = jnp.stack([q_off(q) for q in range(4)])       # (4,)
        return net - offs[quad_map]

    return jax.vmap(one)(nets)


@partial(jax.jit, static_argnames=("y_window", "bg_rows", "n_chan",
                                   "x_window", "optimal", "read_noise_e",
                                   "align"))
def reduce_visit(reads_dn: jnp.ndarray, gain: jnp.ndarray,
                 exp_mid_s: jnp.ndarray, orbit: OrbitParams,
                 *, y_window: tuple[int, int], x_window: tuple[int, int],
                 bg_rows: tuple[int, int] = (0, 16),
                 n_chan: int = 16,
                 read_times: jnp.ndarray | None = None,
                 good_diffs: jnp.ndarray | None = None,
                 optimal: bool = False,
                 read_noise_e: float = 12.0,
                 align: bool = False,
                 ld: jnp.ndarray | None = None,
                 rp0: jnp.ndarray | float = 0.155,
                 scan_dir: jnp.ndarray | None = None,
                 quad_map: jnp.ndarray | None = None) -> ReducedVisit:
    """Extract white + channel light curves from a visit's raw reads.

    Args:
      reads_dn: (n_exp, NR, S, S) raw reads in time order.
      exp_mid_s: (n_exp,) exposure mid-times on the orbit's clock.
      y_window: extraction rows (cover the scan); x_window: dispersion
      columns carrying signal; n_chan: spectral channels across x_window.
      read_times: optional (NR,) sample times — switches the per-pixel
        estimator from CDS to the calwf3-style up-the-ramp least-squares
        slope (lower read-noise variance; see ramp_slope_frame).
      good_diffs: optional (n_exp, NR-1, S, S) bool per-interval masks
        (True = usable) from ~cr_bad_diff_masks / good_diff_masks_from_dq
        — enables the DQ-aware repair so cosmic rays, saturation and
        hot pixels do not contaminate the light curves.
      optimal: Horne (1986) profile-weighted extraction instead of the
        box sum — the cross-dispersion profile comes from the visit-mean
        frame (high S/N, transit-invariant after per-column
        normalisation), the variance model from the per-pixel shot term
        plus the estimator's read-noise floor (``read_noise_e``).
      align: fit per-exposure dispersion-direction drifts against the
        visit-mean spectrum (spectral_shifts) and realign the spectra
        before channel binning, so pointing drift does not modulate the
        channel curves. Fitted shifts come back in ``x_shifts``.
      ld, rp0: limb-darkening coefficients and an Rp/Rs guess (+-0.015
        is fine). When given with align=True, the drift regressor is
        cleaned with the MODEL transit basis (transit_drift_basis +
        clean_drift_regressor) — required for ppm-accurate depths on a
        chromatic transit; without ld the white-dip projection
        (drift_regressor) is used, which leaves a dLC/drp-shaped
        residual at the window-edge channels.
      scan_dir: optional (n_exp,) reverse-scan mask (True/1 on reverse
        exposures of a forward/reverse alternating visit). Each
        direction is normalised by its own out-of-transit baseline
        BEFORE alignment/detrending, removing the achromatic
        upstream/downstream flux offset (scan_direction_factor).
      quad_map: optional (S, S) amplifier-quadrant index map
        (calibration.quadrant_map(S, tables.subarray_corner)) —
        enables per-exposure per-amplifier offset removal
        (amp_offset_correct). Strongly recommended whenever
        bias_drift was simulated: subarrays have no reference pixels
        and the background rows may sit in a different amplifier than
        the spectrum.
    """
    def nf(r, c):
        net = net_frame(r, gain, read_times, c)
        bg = jnp.median(net[bg_rows[0]: bg_rows[1], :], axis=0)
        return net - bg[None, :]

    if good_diffs is None:
        nets = jax.vmap(lambda r: nf(r, None))(reads_dn)
    else:
        nets = jax.vmap(nf)(reads_dn, good_diffs)            # (n_exp, S, S)
    if quad_map is not None:
        nets = amp_offset_correct(nets, quad_map, y_window, x_window)
    if optimal:
        prof = spatial_profile(jnp.mean(nets, axis=0), y_window)
        floor = read_noise_var_e2(read_noise_e, reads_dn.shape[1],
                                  ramp=read_times is not None)
        spectra = optimal_extract(nets, prof, y_window, floor)
    else:
        spectra = nets[:, y_window[0]: y_window[1], :].sum(axis=1)

    oot = out_of_transit_mask(exp_mid_s, orbit)
    if scan_dir is not None:
        corr = scan_direction_factor(
            spectra[:, x_window[0]: x_window[1]].sum(axis=1), oot, scan_dir)
        spectra = spectra / corr[:, None]

    if align:
        shifts = spectral_shifts(spectra, x_window)
    else:
        shifts = jnp.zeros(spectra.shape[0], spectra.dtype)

    def normalise(flux):
        base = jnp.sum(flux * oot) / jnp.maximum(jnp.sum(oot), 1.0)
        return flux / base

    edges = _channel_edges(x_window, n_chan)
    cols = jnp.stack([edges[:-1], edges[1:]], axis=1)        # (n_chan, 2)
    white_flux = spectra[:, x_window[0]: x_window[1]].sum(axis=1)
    cum = jnp.concatenate(
        [jnp.zeros((spectra.shape[0], 1)), jnp.cumsum(spectra, axis=1)], axis=1)
    chan_flux = cum[:, edges[1:]] - cum[:, edges[:-1]]       # (n_exp, n_chan)
    if align:
        if ld is not None:
            basis = transit_drift_basis(exp_mid_s, orbit, ld, rp0)
        else:
            basis = white_drift_basis(white_flux, oot, exp_mid_s)
        reg = clean_drift_regressor(
            dispersion_centroid(spectra, x_window), basis, exp_mid_s)
        white_flux = shift_detrend(white_flux, reg, oot)
        chan_flux = shift_detrend(chan_flux, reg, oot)
    white = normalise(white_flux)
    chan = jax.vmap(normalise, in_axes=1, out_axes=1)(chan_flux)

    spectra_out = align_spectra(spectra, shifts) if align else spectra
    return ReducedVisit(spectra_e=spectra_out, white_lc=white,
                        channel_lc=chan, channel_cols=cols, x_shifts=shifts)


@jax.jit
def fit_eclipse_depths(channel_lc: jnp.ndarray, exp_mid_s: jnp.ndarray,
                       orbit: OrbitParams, rp_over_rs: jnp.ndarray,
                       weights: jnp.ndarray | None = None
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel eclipse depth Fp/Fs from secondary-eclipse visits.

    ``rp_over_rs`` is a SCALAR (the geometric/white-light radius ratio):
    it only sets the occultation contact geometry shared by all
    channels, which is wavelength-independent at WFC3 precision. A
    per-channel array would broadcast against the (n_exp,) separation
    inside eclipse_visibility and mis-shape the design matrix.

    The eclipse model is linear in its parameters: F(t) = c (1 + fp v(t))
    with v(t) the planet's visible fraction (closed-form uniform-disk
    occultation) — so each channel is a 2x2 weighted least squares in
    (a0, a1) = (c, c fp), no iteration needed. ``channel_lc`` may be
    normalised by ANY baseline (c absorbs it). In-TRANSIT epochs are
    weighted out (as in fit_phase_curve): a long visit covering both
    events would otherwise feed the ~2.5% transit dip — unmodelled
    structure ~15x the eclipse signal — straight into the normal
    equations. Eclipse-only visits are unaffected (the mask is all-one).

    ``weights``: optional (n_exp,) exposure weights shared by every
    channel — pass RampFit.weights so exposures the robust white fit
    clipped (residual CRs, flares) are skipped here too.

    Returns (fp_hat (n_chan,), fp_sigma (n_chan,)) with sigma from the
    residual scatter and the normal-equation covariance.
    """
    z, in_front = projected_separation(exp_mid_s, orbit)
    vis = eclipse_visibility(z, in_front, rp_over_rs)
    w = out_of_transit_mask(exp_mid_s, orbit).astype(channel_lc.dtype)
    if weights is not None:
        w = w * jnp.asarray(weights, channel_lc.dtype)

    # Explicit f32 reductions, NOT matmuls: on TPU an (n, 2) A.T @ A /
    # A.T @ y lowers to bf16 MXU dots by default, whose ~0.4% rounding
    # is a DETERMINISTIC fp artifact larger than the ~1e-3 eclipse
    # depths being fitted (measured: every channel returned the same
    # spurious 4.4e-3). Elementwise multiply + sum stays on the f32 VPU.
    n = jnp.sum(w)
    s1 = jnp.sum(w * vis)
    s2 = jnp.sum(w * vis * vis)
    y0 = jnp.sum(w[:, None] * channel_lc, axis=0)              # (n_chan,)
    y1 = jnp.sum((w * vis)[:, None] * channel_lc, axis=0)
    det = n * s2 - s1 * s1
    a0 = (s2 * y0 - s1 * y1) / det
    a1 = (n * y1 - s1 * y0) / det
    fp = a1 / a0
    model = a0[None, :] + a1[None, :] * vis[:, None]
    resid = (channel_lc - model) * w[:, None]
    noise_var = jnp.sum(resid ** 2, axis=0) / jnp.maximum(n - 2.0, 1.0)
    # var(fp) via first-order propagation of (a0, a1); cov = inv(AtA)
    cov00 = s2 / det
    cov11 = n / det
    cov01 = -s1 / det
    var_fp = noise_var * (cov11 / a0 ** 2
                          + cov00 * (a1 / a0 ** 2) ** 2
                          - 2.0 * cov01 * a1 / a0 ** 3)
    return fp, jnp.sqrt(jnp.maximum(var_fp, 0.0))


@_register
@dataclass
class PhaseFit:
    """Outputs of fit_phase_curve (per channel)."""

    fp: jnp.ndarray            # dayside eclipse depth Fp/Fs
    fp_sigma: jnp.ndarray      # its 1-sigma (delta method)
    amp: jnp.ndarray           # thermal phase amplitude A in [0, 1]
    amp_sigma: jnp.ndarray     # its 1-sigma (delta method, unclipped —
    #                            huge when A is a clamp artifact)
    offset_rad: jnp.ndarray    # hot-spot offset (+ = eastward)
    slope: jnp.ndarray         # fitted linear baseline (frac over the
    #                            visit half-span) — absorbs the
    #                            visit-long instrument trend
    chi2: jnp.ndarray          # weighted residual sum of squares


@jax.jit
def fit_phase_curve(channel_lc: jnp.ndarray, exp_mid_s: jnp.ndarray,
                    orbit: OrbitParams,
                    rp_over_rs: jnp.ndarray | float) -> PhaseFit:
    """Closed-form thermal phase-curve fit per channel.

    The simulator's phase model (ops/transit.transit_light_curve) is
    F = 1 + fp [1 - A (1 - cos(phi + phi0))/2] vis(t), phi the
    true-anomaly phase angle (0 at mid-secondary). Expanding the cosine
    makes it LINEAR in (c, c b0, c b1, c b2) on the basis
    [1, vis, vis cos phi, vis sin phi]:

        b0 = fp (1 - A/2),  b1 = (fp A/2) cos phi0,
        b2 = -(fp A/2) sin phi0
        => r = hypot(b1, b2); fp = b0 + r; A = 2 r / fp;
           phi0 = atan2(-b2, b1)

    plus a LINEAR time baseline column (phase-curve practice: the
    visit-long instrument slope is comparable to the phase signal over
    a full period and aliases straight into the harmonics if not fit
    jointly — measured 3x fp bias on the simulator's default trend).
    Each channel is then one 5x5 weighted least squares — no iteration,
    no initial guess. In-transit epochs are weighted out (the transit
    is fit separately; here it would bias the harmonic terms), and the
    normal equations use explicit f32 reductions (TPU bf16 hazard).
    fp_sigma comes from the residual scatter through the delta method
    (autodiff of the UNCLIPPED b -> fp map, so degeneracy shows up as
    a huge sigma even when the reported fp/amp central values are
    clamped to physical ranges). ``rp_over_rs`` is the SCALAR
    geometric radius (sets vis and the transit mask only).

    ``channel_lc`` is (n_exp,) or (n_exp, n_chan), normalised to ANY
    baseline (c absorbs it). Visits must cover a decent phase range —
    with eclipse-only coverage the harmonic columns are degenerate and
    sigma blows up honestly; with NO eclipse coverage fp itself is
    unidentifiable from the baseline (run_reduce refuses such visits;
    library users should check vis varies by more than ~0.1).
    """
    from wayne_tpu.ops.kepler import orbital_phase_angle
    from wayne_tpu.ops.transit import eclipse_visibility

    t = jnp.asarray(exp_mid_s, jnp.float32)
    lc = jnp.asarray(channel_lc, jnp.float32)
    squeeze = lc.ndim == 1
    f = lc[:, None] if squeeze else lc                     # (n, m)
    rp = jnp.asarray(rp_over_rs, jnp.float32)
    z, in_front = projected_separation(t, orbit)
    vis = eclipse_visibility(z, in_front, rp)
    phi = orbital_phase_angle(t, orbit)
    w = out_of_transit_mask(t, orbit).astype(jnp.float32)  # (n,)

    t_norm = ((t - t.mean())
              / jnp.maximum(0.5 * (t.max() - t.min()), 1e-9))
    X = jnp.stack([jnp.ones_like(vis), t_norm, vis,
                   vis * jnp.cos(phi), vis * jnp.sin(phi)],
                  axis=1)                                  # (n, 5)
    def unpack(av):
        # UNCLIPPED fp/r: fp_sigma differentiates through this, so a
        # coverage-degenerate solve (vis ~ constant: fp unidentifiable
        # from the baseline) keeps its honestly-huge sigma. The
        # physical clamps are applied to the REPORTED central values
        # only, after the vmap below — clipping here would zero the
        # delta-method gradient and report sigma = 0 exactly when the
        # fit is most degenerate.
        b = av[2:] / jnp.maximum(av[0], 1e-9)
        r = jnp.sqrt(b[1] ** 2 + b[2] ** 2 + 1e-20)
        fp = b[0] + r
        off = jnp.arctan2(-b[2], b[1])
        return fp, r, off

    # The [1, vis] columns are ~0.99-collinear (vis = 1 outside
    # eclipse): every contraction here — including the solve/inv
    # internals and the X @ a reconstruction — must run full-f32 or
    # TPU bf16 input rounding corrupts the ~1e-3 harmonic coefficients
    # and inflates noise_var ~1000x (CLAUDE.md bf16 rule).
    with jax.default_matmul_precision("highest"):
        XtX = jnp.einsum("ni,nj,n->ij", X, X, w)
        XtY = jnp.einsum("ni,nm,n->im", X, f, w)
        ridge = 1e-7 * jnp.trace(XtX) / 5.0 + 1e-12
        a = jnp.linalg.solve(XtX + ridge * jnp.eye(5), XtY)  # (5, m)

        fp_raw, r_harm, off = jax.vmap(unpack, in_axes=1)(a)
        # physical clamps on the reported values keep degenerate
        # solves from emitting absurd magnitudes (measured 5.7e12 on
        # an eclipse-free visit); sigma below uses the raw map.
        fp = jnp.clip(fp_raw, -0.05, 0.5)
        amp = jnp.clip(2.0 * r_harm / jnp.maximum(fp, 1e-9), 0.0, 2.0)
        slope = a[1] / jnp.maximum(a[0], 1e-9)             # (m,)

        resid = (X @ a - f) * w[:, None]
        dof = jnp.maximum(jnp.sum(w) - 5.0, 1.0)
        noise_var = jnp.sum(resid ** 2, axis=0) / dof      # (m,)
        cov_u = jnp.linalg.inv(XtX + ridge * jnp.eye(5))   # unit-noise cov

        def amp_raw(av):
            fpv, rv, _ = unpack(av)
            denom = jnp.where(jnp.abs(fpv) > 1e-9, fpv, 1e-9)
            return 2.0 * rv / denom

        def sigma_one(av, nv):
            def dm(fn):                       # delta method, raw maps
                g = jax.grad(fn)(av)
                return jnp.sqrt(jnp.maximum(
                    nv * jnp.einsum("i,ij,j->", g, cov_u, g), 0.0))

            return dm(lambda v: unpack(v)[0]), dm(amp_raw)

        fp_sigma, amp_sigma = jax.vmap(sigma_one, in_axes=(1, 0))(
            a, noise_var)
        chi2 = jnp.sum(resid ** 2, axis=0)
    if squeeze:
        return PhaseFit(fp=fp[0], fp_sigma=fp_sigma[0], amp=amp[0],
                        amp_sigma=amp_sigma[0], offset_rad=off[0],
                        slope=slope[0], chi2=chi2[0])
    return PhaseFit(fp=fp, fp_sigma=fp_sigma, amp=amp,
                    amp_sigma=amp_sigma, offset_rad=off, slope=slope,
                    chi2=chi2)


@partial(jax.jit, static_argnames=("n_quad", "n_newton",
                                   "return_white_sigma"))
def common_mode_correct(white_lc: jnp.ndarray, channel_lc: jnp.ndarray,
                        exp_mid_s: jnp.ndarray, orbit: OrbitParams,
                        ld: jnp.ndarray, rp_init: jnp.ndarray,
                        n_quad: int = 32, n_newton: int = 12,
                        return_white_sigma: bool = False) -> jnp.ndarray:
    """Divide white-light systematics out of the channel curves.

    The standard WFC3 trick: instrument systematics (hook ramps,
    scan-speed variations, drifts) are nearly wavelength-independent, so
    the ratio white_observed / white_model(rp_white) is a per-exposure
    common-mode systematic template; dividing it out of each channel
    leaves (almost) pure per-channel transits.

    Returns corrected channel light curves (n_exp, n_chan); with
    ``return_white_sigma=True``, also the white fit's depth sigma —
    the COMMON-MODE error every downstream channel depth inherits 1:1
    (see divide_white_fit_depths), which per-channel residuals cannot
    see: the white depth error deforms the template by exactly the
    transit shape, so each channel's own rp fit absorbs it silently.
    """
    rp_white, sig_white = fit_depths(white_lc[:, None], exp_mid_s, orbit,
                                     ld, rp_init, n_quad, n_newton)
    z, in_front = projected_separation(exp_mid_s, orbit)
    f = transit_depth_curve(z, rp_white[0], ld, n_quad)
    white_model = 1.0 - (1.0 - f) * in_front
    template = white_lc / white_model                 # (n_exp,)
    corrected = channel_lc / template[:, None]
    if return_white_sigma:
        return corrected, sig_white[0]
    return corrected


def divide_white_fit_depths(white_lc: jnp.ndarray, channel_lc: jnp.ndarray,
                            exp_mid_s: jnp.ndarray, orbit: OrbitParams,
                            ld: jnp.ndarray, rp_init: jnp.ndarray,
                            n_quad: int = 32, n_newton: int = 12,
                            weights: jnp.ndarray | None = None,
                            return_components: bool = False
                            ) -> tuple[jnp.ndarray, ...]:
    """Divide-white + per-channel depth fit with the COMMON-MODE error
    propagated — and, on request, decomposed.

    The divide-white template is built from a transit model at the
    FITTED white depth; a white-depth error d deforms the template by
    the transit shape itself, so every corrected channel curve carries
    a coherent, transit-shaped distortion that each channel's own rp
    fit absorbs 1:1 — shifting ALL channel depths together while
    leaving no trace in any channel's residuals. The per-channel
    curvature sigma is therefore blind to it by construction. Measured
    (tools/validate_recovery.py staring-mode ensemble, 32 realisations):
    cross-channel depth-error correlation 0.58, and per-channel
    scatter/reported-sigma up to 2.5 with the naive sigma vs ~1 once
    the white-fit sigma is added in quadrature; on RAW (undivided)
    curves the naive sigma was already calibrated (ratios 0.90-1.22),
    isolating the divide step as the sole cause.

    The two terms answer DIFFERENT questions, so both are exposed:
    ``sigma_rel`` (the per-channel fit sigma) is the error on
    channel-to-channel SHAPE — what transmission-spectroscopy inference
    actually uses, because the common term shifts every channel
    together and cancels in differences; ``sigma_common`` (the white
    fit's depth sigma, one number for all channels) is the coherent
    absolute-level error. The full covariance of the returned depths is
    rank-1-plus-diagonal::

        Cov = diag(sigma_rel**2) + sigma_common**2 * ones((n,n))

    Consumers doing relative (shape) inference should use sigma_rel and
    drop the common term; absolute-depth consumers need the quadrature
    total. Returning only the total made relative error bars ~5-7x
    conservative in the systematics ensembles (VALIDATION.json round-4
    ratios 0.135-0.28).

    Returns (rp_hat (n_chan,), rp_sigma (n_chan,)) with
    rp_sigma = sqrt(sigma_rel^2 + sigma_common^2); with
    ``return_components=True``, (rp_hat, rp_sigma, rp_sigma_rel,
    sigma_common) where sigma_common is a scalar.
    """
    corrected, sig_white = common_mode_correct(
        white_lc, channel_lc, exp_mid_s, orbit, ld, rp_init, n_quad,
        n_newton, return_white_sigma=True)
    rp, sig = fit_depths(corrected, exp_mid_s, orbit, ld, rp_init,
                         n_quad, n_newton, weights=weights)
    total = jnp.sqrt(sig**2 + sig_white**2)
    if return_components:
        return rp, total, sig, sig_white
    return rp, total


def orbit_phase(exp_mid_s: jnp.ndarray,
                gap_s: float = 1200.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-exposure (time since orbit start, first-orbit mask) inferred
    from the exposure timeline alone — what a reducer can know without
    the simulator's visit plan.

    HST Earth-occultation gaps (~45-50 min) dwarf the exposure cadence
    (exptime + overhead, <= ~10 min), so any inter-exposure gap above
    ``gap_s`` starts a new orbit. The orbit clock zero is the first
    exposure of the orbit — offset from the simulator's true orbit
    start by roughly one (constant) readout latency per orbit, which
    the fitted hook amplitude absorbs (exp(-(t+dt)/tau) =
    exp(-dt/tau) * exp(-t/tau)). jit-safe: static shapes, one cummax.
    """
    t = jnp.asarray(exp_mid_s)
    n = t.shape[0]
    gap = jnp.diff(t, prepend=t[:1])
    new_orbit = gap > gap_s
    orbit_id = jnp.cumsum(new_orbit.astype(jnp.int32))
    marks = jnp.where(new_orbit | (jnp.arange(n) == 0), t, -jnp.inf)
    orbit_start = jax.lax.cummax(marks)
    return t - orbit_start, orbit_id == 0


def _lm_normal_eqs(resid, theta):
    """(JTJ, J^T r) of a residual function — full-f32 contractions (the
    TPU bf16-matmul-input hazard sits exactly on near-degenerate fit
    valleys; CLAUDE.md)."""
    hp = jax.lax.Precision.HIGHEST
    J = jax.jacfwd(resid)(theta)                 # (n, nd)
    r = resid(theta)
    JTJ = jnp.einsum("ni,nj->ij", J, J, precision=hp)
    g = jnp.einsum("ni,n->i", J, r, precision=hp)
    return JTJ, g


def _lm_minimize(resid, theta0, n_steps, lam0=1e-3):
    """Damped Levenberg-Marquardt with fixed step count (lax.fori_loop,
    accept/reject arithmetic — no data-dependent control flow). Shared
    by fit_white_ramp and fit_white_recte. Returns (theta, chi2)."""
    nd = theta0.shape[0]
    eye_n = jnp.eye(nd, dtype=jnp.float32)

    def step(_, state):
        theta, lam, chi2 = state
        JTJ, g = _lm_normal_eqs(resid, theta)
        ridge = 1e-7 * jnp.trace(JTJ) / nd + 1e-12
        A = JTJ + lam * jnp.diag(jnp.diag(JTJ)) + ridge * eye_n
        # full-f32 solve: near-degenerate fit valleys (CLAUDE.md bf16 rule)
        with jax.default_matmul_precision("highest"):
            dth = jnp.linalg.solve(A, g)
        theta_new = theta - dth
        chi2_new = jnp.sum(resid(theta_new) ** 2)
        ok = chi2_new < chi2             # NaN compares False: reject
        theta = jnp.where(ok, theta_new, theta)
        lam = jnp.clip(jnp.where(ok, lam * 0.3, lam * 5.0), 1e-8, 1e8)
        chi2 = jnp.where(ok, chi2_new, chi2)
        return theta, lam, chi2

    chi2_0 = jnp.sum(resid(theta0) ** 2)
    theta, _, chi2 = jax.lax.fori_loop(
        0, n_steps, step, (theta0, jnp.float32(lam0), chi2_0))
    return theta, chi2


def ramp_transit_model(theta6: jnp.ndarray, t_day: jnp.ndarray,
                       t_orb: jnp.ndarray, firstf: jnp.ndarray,
                       z: jnp.ndarray, in_front: jnp.ndarray,
                       ld: jnp.ndarray, n_quad: int,
                       vis: jnp.ndarray | None = None):
    """THE white-light ramp x signal model shared by the LM fit
    (fit_white_ramp) and the MCMC likelihood (mcmc.sample_white_
    posterior) — one definition so the posterior always refines the
    same model the point fit solved.

    theta6 = (c, depth, ra_per_day, rb, rb_first, log_tau); tau is
    clamped to [30, 20000] s and the depth to its physical range
    (transit Rp/Rs [0.01, 0.5], or eclipse Fp/Fs [-0.02, 0.1] when
    ``vis`` is given). Returns (model flux, systematic-only factor).
    """
    c, rp, ra, rb, rbf, log_tau = (theta6[0], theta6[1], theta6[2],
                                   theta6[3], theta6[4], theta6[5])
    tau = jnp.clip(jnp.exp(log_tau), 30.0, 20000.0)
    amp = jnp.where(firstf > 0.5, rbf, rb)
    sys = (1.0 - ra * t_day) * (1.0 - amp * jnp.exp(-t_orb / tau))
    if vis is not None:
        tr = 1.0 + jnp.clip(rp, -0.02, 0.1) * vis
    else:
        f = transit_depth_curve(z, jnp.clip(rp, 0.01, 0.5), ld, n_quad)
        tr = 1.0 - (1.0 - f) * in_front
    return c * sys * tr, sys


@_register
@dataclass
class RampFit:
    """Joint white-light ramp + transit fit (fit_white_ramp)."""

    rp: jnp.ndarray              # fitted white-light depth: Rp/Rs
    #                              (transit) or Fp/Fs (eclipse=True)
    rp_sigma: jnp.ndarray        # its 1-sigma from the LM curvature
    c: jnp.ndarray               # out-of-transit flux normalisation
    slope_per_day: jnp.ndarray   # visit-long linear slope (frac/day)
    hook_amp: jnp.ndarray        # orbit-ramp amplitude (orbits >= 2)
    hook_amp_first: jnp.ndarray  # orbit-ramp amplitude in orbit 1
    hook_tau_s: jnp.ndarray      # orbit-ramp e-folding time (s)
    template: jnp.ndarray        # (n_exp,) fitted systematic (no c, no
    #                              transit): divide it out of any curve
    chi2: jnp.ndarray            # sum of squared residuals at the fit
    t0_offset_s: jnp.ndarray     # fitted mid-transit shift (0 unless
    #                              fit_geometry)
    orbit: OrbitParams           # the orbit the fit used — with
    #                              fit_geometry, t0/sma/inc are FITTED;
    #                              feed it to fit_depths / posteriors
    weights: jnp.ndarray         # (n_exp,) robust-fit keep mask: 0 for
    #                              exposures sigma-clipped as outliers
    #                              (spot crossings, residual CRs); all
    #                              ones unless clip_sigma was set. Feed
    #                              it to fit_depths so channel fits skip
    #                              the same exposures.


@partial(jax.jit, static_argnames=("gap_s", "n_iter", "n_quad",
                                   "fit_geometry", "t0_window_s",
                                   "eclipse", "clip_sigma",
                                   "clip_rounds"))
def fit_white_ramp(white_lc: jnp.ndarray, exp_mid_s: jnp.ndarray,
                   orbit: OrbitParams, ld: jnp.ndarray,
                   rp_init: jnp.ndarray | float = 0.15,
                   *, gap_s: float = 1200.0, n_iter: int = 60,
                   n_quad: int = 32, fit_geometry: bool = False,
                   t0_window_s: float = 600.0,
                   eclipse: bool = False,
                   fp_init: jnp.ndarray | float = 1.5e-3,
                   clip_sigma: float | None = None,
                   clip_rounds: int = 4) -> RampFit:
    """Jointly fit the white light curve as transit x instrument ramp.

    The physically-motivated alternative to divide-white: real WFC3
    analyses (Iraclis; reference SURVEY.md section 4's validation
    pipeline) fit the white curve with the transit model TIMES the
    charge-trapping systematic

        F(t) = c * (1 - ra * t) * (1 - rb * exp(-t_orb / tau)) * T(t; rp)

    with a separate ramp amplitude for the first orbit (stronger
    trapping from a freshly annealed detector — the same form the
    simulator injects, trends.visit_trend_factor). Divide-white only
    ever yields RELATIVE (channel - white) depths; this fit recovers
    the ABSOLUTE white depth and a parametric systematic template for
    ramp_detrend.

    Implementation: Levenberg-Marquardt on theta = (c, rp, ra[/day],
    rb, rb_first, log tau) with jacfwd Jacobians through the real
    occultation integral, fixed ``n_iter`` damped steps (lax.fori_loop,
    accept/reject arithmetic — no data-dependent control flow), and
    full-f32 normal equations (TPU bf16-input hazard, CLAUDE.md).
    Orbit structure comes from orbit_phase(exp_mid_s, gap_s). The tau
    gradient vanishes at rb = 0, so amplitudes start at 2e-3 — LM
    damping handles the rest.

    ``eclipse=True`` swaps the transit factor for the secondary-eclipse
    model 1 + fp * vis(t) (uniform-disk occultation visibility at the
    geometric radius ``rp_init``): theta[1] becomes the eclipse depth
    Fp/Fs (returned in ``RampFit.rp``), started at ``fp_init``. The
    systematics family is identical — eclipse visits ramp the same way.
    In-TRANSIT epochs are excluded from the fit (the eclipse model has
    no transit factor, and on a long visit covering both events the
    ~15x-deeper unmodelled transit dip would skew every parameter);
    pure-eclipse visits are unaffected. Not combinable with
    fit_geometry (fit the ephemeris on a transit).

    ``clip_sigma`` turns on robust refitting: each of ``clip_rounds``
    rounds zero-weights the single worst residual outlier beyond
    ``clip_sigma`` robust-sigmas and re-runs the LM. The sigma scale is
    the OUT-OF-TRANSIT residual scatter (1.4826 x MAD over kept
    baseline points — the photometric-noise estimator real analyses
    use; out-of-eclipse in eclipse mode), so a model-unrepresentable
    in-transit feature cannot inflate its own clip threshold. At most
    one exposure is clipped per round — size ``clip_rounds`` to the
    contamination you expect (a spot crossing hits a few exposures; a
    residual CR one). This is how real analyses survive what the
    parametric model cannot represent — starspot-crossing bumps,
    residual cosmic rays, satellite trails. The kept/clipped mask is
    returned in ``RampFit.weights`` so channel fits (fit_depths
    ``weights=``) skip the same exposures.

    ``fit_geometry=True`` frees the transit GEOMETRY too — theta grows
    by (t0 offset [s], a/Rs, cos i), the separation is recomputed from
    the candidate orbit inside every Jacobian evaluation, and the
    returned ``RampFit.orbit`` carries the fitted ephemeris for the
    channel fits (real analyses fit geometry on the white curve and
    hold it fixed per channel). The input ``orbit`` provides the
    starting point and the fixed period.
    """
    import dataclasses as _dc

    lc = jnp.asarray(white_lc, jnp.float32)
    t = jnp.asarray(exp_mid_s, jnp.float32)
    t_orb, first = orbit_phase(t, gap_s)
    firstf = first.astype(jnp.float32)
    t_day = (t - t.mean()) / 86400.0
    oot = out_of_transit_mask(t, orbit).astype(jnp.float32)
    c0 = jnp.sum(lc * oot) / jnp.maximum(jnp.sum(oot), 1.0)
    ndim = 9 if fit_geometry else 6
    z_fix, infr_fix = projected_separation(t, orbit)

    def orbit_of(theta):
        if theta.shape[0] == 6:
            return orbit
        return _dc.replace(
            orbit, t0_s=orbit.t0_s + theta[6],
            sma_rs=jnp.clip(theta[7], 1.5, 50.0),
            inc_rad=jnp.arccos(jnp.clip(theta[8], 0.0, 0.6)))

    def model(theta):
        if theta.shape[0] == 6:
            z, in_front = z_fix, infr_fix
        else:
            z, in_front = projected_separation(t, orbit_of(theta))
        vis = (eclipse_visibility(
            z, in_front, jnp.asarray(rp_init, jnp.float32))
            if eclipse else None)
        return ramp_transit_model(theta[:6], t_day, t_orb, firstf, z,
                                  in_front, ld, n_quad, vis)

    # Eclipse mode has no transit factor in the model, so a long visit
    # covering BOTH events would feed the ~2.5% transit dip (~15x the
    # eclipse signal) into the residual and skew c/slope/hook/fp —
    # exclude in-transit epochs from the fit exactly as
    # fit_eclipse_depths does. Pure-eclipse visits have oot == 1
    # everywhere, so this is a no-op for them.
    fit_mask = oot if eclipse else jnp.ones_like(lc)

    def resid(theta):
        return (model(theta)[0] - lc) * fit_mask

    def run_lm(theta0, n_steps, lam0=1e-3):
        theta, chi2 = _lm_minimize(resid, theta0, n_steps, lam0)
        return theta, chi2, partial(_lm_normal_eqs, resid)

    if fit_geometry and eclipse:
        raise ValueError("fit_geometry is a transit-mode feature "
                         "(fit the ephemeris on a transit visit)")
    rp0 = jnp.asarray(fp_init if eclipse else rp_init,
                      jnp.float32).reshape(())
    theta0 = jnp.stack([c0, rp0, jnp.float32(0.0), jnp.float32(2e-3),
                        jnp.float32(4e-3), jnp.float32(jnp.log(250.0))])
    # Stage 1: always converge the 6-parameter (fixed-geometry) fit —
    # the geometric landscape is nonconvex from a cold start (measured:
    # a cold 9-param LM walked rp to 0.41 on clean data); stage 2 frees
    # (t0, a/Rs, cos i) from the converged photometric solution.
    theta, chi2, normal_eqs = run_lm(theta0, n_iter)
    if fit_geometry:
        # chi2(t0) is the classic nonconvex direction: LM from dt0=0
        # descends into the grazing (high-b, huge-rp) basin and crawls
        # (measured: rp -> 0.41, dt0 stuck at ~9 s for a 90 s truth on
        # clean data). Seed a grid of dt0 candidates across the
        # ephemeris-uncertainty window, refine each with a SHORT 9-param
        # LM — the whole grid is one vmapped program — and polish the
        # best. The t0 landscape is smooth on the transit-duration
        # scale, so a ~100 s grid pitch always lands in the right basin.
        sma0 = jnp.asarray(orbit.sma_rs, jnp.float32)
        cosi0 = jnp.cos(jnp.asarray(orbit.inc_rad, jnp.float32))
        dt0_grid = jnp.linspace(-t0_window_s, t0_window_s, 13
                                ).astype(jnp.float32)

        def seed_fit(dt0):
            th = jnp.concatenate([theta, jnp.stack([dt0, sma0, cosi0])])
            th2, c2, _ = run_lm(th, 25)
            return th2, c2

        ths, c2s = jax.vmap(seed_fit)(dt0_grid)
        theta = ths[jnp.argmin(c2s)]
        theta, chi2, normal_eqs = run_lm(theta, n_iter)

    w_keep = jnp.ones_like(lc)
    if clip_sigma is not None:
        # Robust rounds: reject the single worst residual outlier, refit,
        # repeat (at most one exposure per round — monotone, so a
        # bump-dragged fit can never mass-clip the transit). The scale
        # is the OOT residual scatter (robust MAD over kept baseline
        # points), the photometric-noise estimator real analyses use —
        # the MAD over ALL residuals underclips exactly when it matters,
        # because a contaminated fit redistributes the misfit across
        # every point. A no-outlier round degenerates to a plain refit.
        if eclipse:
            vis0 = eclipse_visibility(
                z_fix, infr_fix, jnp.asarray(rp_init, jnp.float32))
            # Baseline = out of eclipse AND out of transit (a visit
            # covering both events must not treat the transit dip as
            # photometric baseline scatter).
            scale_mask = (vis0 > 0.999).astype(jnp.float32) * fit_mask
        else:
            scale_mask = oot
        for _ in range(clip_rounds):
            r = resid(theta)
            kept = scale_mask * w_keep
            r_oot = jnp.where(kept > 0.0, r, jnp.nan)
            med = jnp.nanmedian(r_oot)
            sig = 1.4826 * jnp.nanmedian(jnp.abs(r_oot - med))
            sig = jnp.maximum(sig, 1e-9 * jnp.maximum(jnp.abs(c0), 1e-12))
            dev = jnp.abs(r - med) * w_keep    # clipped points stay out
            worst = jnp.argmax(dev)
            hit = dev[worst] > clip_sigma * sig   # NaN sig -> False
            w_keep = w_keep.at[worst].set(
                jnp.where(hit, 0.0, w_keep[worst]))
            wres = (lambda th, _w=w_keep: _w * resid(th))
            theta, chi2 = _lm_minimize(wres, theta, n_iter)
            normal_eqs = partial(_lm_normal_eqs, wres)

    _, sys = model(theta)
    JTJ, _ = normal_eqs(theta)
    n = (jnp.sum(w_keep * fit_mask) if clip_sigma is not None
         else jnp.sum(fit_mask))
    noise_var = chi2 / jnp.maximum(n - ndim, 1)
    with jax.default_matmul_precision("highest"):
        cov = jnp.linalg.inv(JTJ + 1e-9 * jnp.eye(ndim, dtype=jnp.float32))
    rp_sigma = jnp.sqrt(jnp.maximum(cov[1, 1] * noise_var, 0.0))
    fitted_orbit = orbit_of(theta)
    depth = (jnp.clip(theta[1], -0.02, 0.1) if eclipse
             else jnp.clip(theta[1], 0.01, 0.5))
    return RampFit(rp=depth, rp_sigma=rp_sigma,
                   c=theta[0], slope_per_day=theta[2], hook_amp=theta[3],
                   hook_amp_first=theta[4],
                   hook_tau_s=jnp.clip(jnp.exp(theta[5]), 30.0, 20000.0),
                   template=sys, chi2=chi2,
                   t0_offset_s=(theta[6] if fit_geometry
                                else jnp.float32(0.0)),
                   orbit=fitted_orbit, weights=w_keep)


@jax.jit
def ramp_detrend(channel_lc: jnp.ndarray, ramp: RampFit,
                 exp_mid_s: jnp.ndarray,
                 orbit: OrbitParams) -> jnp.ndarray:
    """Divide the fitted parametric systematic out of channel curves and
    re-normalise each to its out-of-transit baseline.

    The model-fit counterpart of common_mode_correct: the template is
    the white fit's (slope x hook) series — wavelength-independent like
    the divide-white template, but PARAMETRIC, so white-curve photon
    noise does not propagate into every channel (divide-white injects
    the white residuals into each channel; the fitted template is
    smooth by construction).
    """
    oot = out_of_transit_mask(jnp.asarray(exp_mid_s), orbit)
    w = oot.astype(channel_lc.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    corr = channel_lc / ramp.template[:, None]
    base = jnp.sum(corr * w[:, None], axis=0) / n
    return corr / base[None, :]


@_register
@dataclass
class RecteWhiteFit:
    """Physical RECTE white-light fit (fit_white_recte)."""

    rp: jnp.ndarray              # fitted white-light transit Rp/Rs
    rp_sigma: jnp.ndarray        # its 1-sigma from the LM curvature
    c: jnp.ndarray               # out-of-transit flux normalisation
    slope_per_day: jnp.ndarray   # visit-long linear slope (frac/day)
    f0_s: jnp.ndarray            # fitted initial slow-trap fill in [0, 1]
    f0_f: jnp.ndarray            # fitted initial fast-trap fill in [0, 1]
    rate_scale: jnp.ndarray      # fitted multiplier on the supplied
    #                              effective illumination rate (the
    #                              aperture mixes bright/faint pixels, so
    #                              the effective RECTE rate is fitted)
    template: jnp.ndarray        # (n_exp,) fitted systematic (no c, no
    #                              transit): feed to ramp_detrend
    chi2: jnp.ndarray            # sum of squared residuals at the fit


@partial(jax.jit, static_argnames=("exptime_s", "n_iter", "n_quad"))
def fit_white_recte(white_lc: jnp.ndarray, exp_mid_s: jnp.ndarray,
                    orbit: OrbitParams, ld: jnp.ndarray,
                    rp_init: jnp.ndarray | float = 0.15, *,
                    rate_e_s: jnp.ndarray | float,
                    exptime_s: float,
                    n_iter: int = 80, n_quad: int = 32) -> RecteWhiteFit:
    """Fit the white curve as transit x PHYSICAL RECTE trap ramp.

    The physical-model counterpart of :func:`fit_white_ramp`: instead
    of the parametric per-orbit exponential, the systematic is the
    Zhou et al. (2017) two-trap charge-trapping ramp
    (ops/recte.white_ramp) evaluated at an effective illumination rate,
    with the per-visit parameters observers actually float — the
    initial trap-fill fractions f0_s/f0_f (via a sigmoid to stay in
    [0, 1]) and a log rate-scale absorbing the bright/faint mix of the
    extraction aperture. Published trap counts/efficiencies/timescales
    stay fixed (they are detector properties, not per-visit ones).

    theta = (c, rp, ra_per_day, logit f0_s, logit f0_f, log rate_scale);
    Levenberg-Marquardt with jacfwd through the trap-kinetics lax.scan
    and the occultation integral (shared _lm_minimize machinery).

    ``rate_e_s``: effective illuminated-pixel rate of the white
    aperture, e-/s (e.g. OOT white flux / aperture pixels / exptime);
    the fitted ``rate_scale`` calibrates it. ``exptime_s``: exposure
    time (from EXPTIME); exposure STARTS are taken as mid - exptime/2.
    Returns a :class:`RecteWhiteFit`; its ``template`` drops into
    :func:`ramp_detrend` exactly like the parametric one.
    """
    from wayne_tpu.ops.recte import white_ramp as _recte_ramp

    lc = jnp.asarray(white_lc, jnp.float32)
    t = jnp.asarray(exp_mid_s, jnp.float32)
    starts = t - 0.5 * exptime_s
    t_day = (t - t.mean()) / 86400.0
    oot = out_of_transit_mask(t, orbit).astype(jnp.float32)
    c0 = jnp.sum(lc * oot) / jnp.maximum(jnp.sum(oot), 1.0)
    z, in_front = projected_separation(t, orbit)
    rate0 = jnp.asarray(rate_e_s, jnp.float32)

    def model(theta):
        c, rp, ra, u_s, u_f, log_rs = (theta[0], theta[1], theta[2],
                                       theta[3], theta[4], theta[5])
        rate = rate0 * jnp.exp(jnp.clip(log_rs, -3.0, 3.0))
        ramp = _recte_ramp(rate, starts, exptime_s,
                           f0_s=jax.nn.sigmoid(u_s),
                           f0_f=jax.nn.sigmoid(u_f))
        sys = (1.0 - ra * t_day) * ramp
        f = transit_depth_curve(z, jnp.clip(rp, 0.01, 0.5), ld, n_quad)
        tr = 1.0 - (1.0 - f) * in_front
        return c * sys * tr, sys

    def resid(theta):
        return model(theta)[0] - lc

    # f0 starts mid-range (sigmoid gradient vanishes at the rails);
    # rate_scale starts at the supplied estimate.
    theta0 = jnp.stack([c0, jnp.asarray(rp_init, jnp.float32).reshape(()),
                        jnp.float32(0.0), jnp.float32(-1.5),
                        jnp.float32(-1.5), jnp.float32(0.0)])
    theta, chi2 = _lm_minimize(resid, theta0, n_iter)
    _, sys = model(theta)
    JTJ, _ = _lm_normal_eqs(resid, theta)
    n = lc.shape[0]
    noise_var = chi2 / jnp.maximum(n - 6, 1)
    with jax.default_matmul_precision("highest"):
        cov = jnp.linalg.inv(JTJ + 1e-9 * jnp.eye(6, dtype=jnp.float32))
    rp_sigma = jnp.sqrt(jnp.maximum(cov[1, 1] * noise_var, 0.0))
    return RecteWhiteFit(
        rp=jnp.clip(theta[1], 0.01, 0.5), rp_sigma=rp_sigma,
        c=theta[0], slope_per_day=theta[2],
        f0_s=jax.nn.sigmoid(theta[3]), f0_f=jax.nn.sigmoid(theta[4]),
        rate_scale=jnp.exp(jnp.clip(theta[5], -3.0, 3.0)),
        template=sys, chi2=chi2)


@partial(jax.jit, static_argnames=("x_window", "n_chan", "divide_white",
                                   "subtract_bg", "n_quad", "n_newton",
                                   "sigma_components"))
def spectra_to_depths(spectra_e: jnp.ndarray, exp_mid_s: jnp.ndarray,
                      orbit: OrbitParams, ld: jnp.ndarray,
                      rp_init: jnp.ndarray | float, *,
                      x_window: tuple[int, int], n_chan: int = 8,
                      divide_white: bool = True,
                      subtract_bg: bool = False, n_quad: int = 32,
                      n_newton: int = 12,
                      scan_dir: jnp.ndarray | None = None,
                      sigma_components: bool = False
                      ) -> tuple[jnp.ndarray, ...]:
    """Batched extracted spectra -> fitted channel depths (dataset QA).

    Bins extracted spectra into channels, normalises against the
    out-of-transit baseline, optionally applies divide-white, and fits
    per-channel depths — vmapped over realisations, one compiled
    program. Feed it (mc, n_exp, S) for (mc, n_chan) depths + sigmas,
    or a single (n_exp, S) visit for (n_chan,).

    ``subtract_bg``: the ensemble path's spectra (parallel/ensemble.py)
    are FULL-FRAME column sums with no sky subtraction — with sky on,
    the unsubtracted background B dilutes every normalised dip by
    F/(F+B) and biases depths low by ~rp*B/(2F). When enabled, each
    exposure's per-column background is estimated as the MEDIAN of the
    off-trace columns (outside ``x_window``; median for robustness to
    0th/2nd-order contamination) and removed from the white/channel
    fluxes. Leave it off for spectra that are already
    background-subtracted (e.g. reduce_visit products).

    This is how dataset generation attaches RECOVERED labels
    (generate_dataset(recover=...), which enables subtract_bg by
    default): training on injected labels alone hides
    reduction-systematic structure; the recovered depths expose it per
    realisation.

    ``scan_dir``: optional (n_exp,) reverse-scan mask for
    forward/reverse alternating visits — each direction is normalised
    by its own out-of-transit baseline (scan_direction_factor), so the
    achromatic upstream/downstream offset (trends.reverse_flux_offset)
    does not bias the fits. Shared across realisations.

    ``sigma_components``: also return the sigma decomposition
    (rp, sigma_total, sigma_rel, sigma_common) per realisation — the
    divide-white common-mode split (divide_white_fit_depths
    ``return_components``); without divide_white, sigma_rel equals the
    total and sigma_common is 0.
    """
    sp = jnp.asarray(spectra_e, jnp.float32)
    squeeze = sp.ndim == 2
    if squeeze:
        sp = sp[None]
    t = jnp.asarray(exp_mid_s, jnp.float32)
    oot = out_of_transit_mask(t, orbit).astype(jnp.float32)
    edges = _channel_edges(x_window, n_chan)
    S = sp.shape[-1]
    widths = (edges[1:] - edges[:-1]).astype(jnp.float32)    # (n_chan,)
    has_outside = x_window[0] > 0 or x_window[1] < S
    rp0 = jnp.asarray(rp_init, jnp.float32)

    def one(s):
        white = s[:, x_window[0]: x_window[1]].sum(axis=1)
        cum = jnp.concatenate(
            [jnp.zeros((s.shape[0], 1)), jnp.cumsum(s, axis=1)], axis=1)
        chan = cum[:, edges[1:]] - cum[:, edges[:-1]]
        if subtract_bg and has_outside:
            s_out = jnp.concatenate(
                [s[:, : x_window[0]], s[:, x_window[1]:]], axis=1)
            bg_col = jnp.median(s_out, axis=1)               # (n_exp,)
            white = white - (x_window[1] - x_window[0]) * bg_col
            chan = chan - bg_col[:, None] * widths[None, :]
        if scan_dir is not None:
            corr = scan_direction_factor(white, oot, scan_dir)
            white = white / corr
            chan = chan / corr[:, None]

        def norm(f):
            base = jnp.sum(f * oot) / jnp.maximum(jnp.sum(oot), 1.0)
            return f / base

        white = norm(white)
        chan = jax.vmap(norm, in_axes=1, out_axes=1)(chan)
        if divide_white:
            return divide_white_fit_depths(
                white, chan, t, orbit, ld, rp0, n_quad, n_newton,
                return_components=sigma_components)
        rp, sig = fit_depths(chan, t, orbit, ld, rp0, n_quad, n_newton)
        if sigma_components:
            return rp, sig, sig, jnp.float32(0.0)
        return rp, sig

    out = jax.vmap(one)(sp)
    if squeeze:
        out = tuple(o[0] for o in out)
    return out


def constrained_mask(depth: jnp.ndarray, sigma: jnp.ndarray, *,
                     sigma_floor: float = 0.05,
                     bounds: tuple[float, float] | None = (0.0105, 0.495)
                     ) -> jnp.ndarray:
    """Per-channel quality flag: which fitted depths actually carry
    information.

    A channel with essentially no in-window flux (band edges past the
    grism sensitivity cutoff, a --wl-range that clips into dead
    columns) still returns a number: the fit curvature sits at the
    numerical floor, the reported sigma explodes (the staring-mode
    red-edge channel reports sigma ~3e8) and/or the Newton walk pins at
    its clip bound. Validation handles this honestly (the
    "unconstrained" clause in tools/validate_recovery.py), but products
    must too — a consumer should not have to infer "unusable" from an
    absurd sigma. False where the fit is effectively unconstrained:

    - non-finite depth or sigma, or
    - ``sigma >= sigma_floor`` (default 0.05: no planet-scale
      constraint at all — healthy WFC3 channels sit at 1e-4..1e-3), or
    - depth pinned within the fitter's clip range edges (``bounds``;
      fit_depths clips Rp/Rs to [0.01, 0.5] — pass None for unclipped
      linear fitters like fit_eclipse_depths).

    Consumers: run_reduce emits ``constrained`` per channel (and
    suggests --wl-range), dataset recovered labels carry it, retrieval
    results flag it. Scale ``sigma_floor`` to the quantity: 0.05 for
    Rp/Rs, ~0.02 for Fp/Fs contrasts.
    """
    depth = jnp.asarray(depth)
    sigma = jnp.asarray(sigma)
    ok = (jnp.isfinite(depth) & jnp.isfinite(sigma)
          & (sigma < sigma_floor))
    if bounds is not None:
        ok = ok & (depth > bounds[0]) & (depth < bounds[1])
    return ok


def _beta_red(resid: jnp.ndarray, w: jnp.ndarray,
              n_bin: int) -> jnp.ndarray:
    """Pont et al. (2006) time-binning red-noise factor on residuals.

    Bins the (time-ordered) residuals into groups of ``n_bin`` and
    compares the realised binned scatter to the white-noise expectation
    sigma1/sqrt(n_bin); clipped points (w = 0) contribute zero and
    shrink their bin's effective size. Returns max(1, ratio) — pure
    white noise gives ~1 (never deflates), time-correlated noise
    (amplifier-drift random walks, unremoved systematics) gives the
    factor by which a per-point-independent sigma underestimates
    bin-scale (and therefore transit-depth-scale) uncertainty.
    """
    n = resid.shape[0]
    m = n // n_bin
    r = (resid * w)[: m * n_bin].reshape(m, n_bin)
    wb = w[: m * n_bin].reshape(m, n_bin)
    nb = jnp.maximum(wb.sum(axis=1), 1.0)
    bmean = r.sum(axis=1) / nb
    mu = bmean.mean()
    var_binned = jnp.sum((bmean - mu) ** 2) / jnp.maximum(m - 1, 1)
    sigma1_sq = (jnp.sum(w * resid**2)
                 / jnp.maximum(jnp.sum(w) - 1.0, 1.0))
    expect = sigma1_sq / jnp.maximum(nb.mean(), 1.0)
    return jnp.sqrt(jnp.maximum(var_binned / jnp.maximum(expect, 1e-30),
                                1.0))


@partial(jax.jit, static_argnames=("n_quad", "n_newton", "baseline_var",
                                   "red_noise"))
def fit_depths(channel_lc: jnp.ndarray, exp_mid_s: jnp.ndarray,
               orbit: OrbitParams, ld: jnp.ndarray, rp_init: jnp.ndarray,
               n_quad: int = 32, n_newton: int = 12,
               weights: jnp.ndarray | None = None,
               baseline_var: bool = True,
               red_noise: bool = True
               ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel Rp/Rs by Newton iterations on the chi^2 of the real
    transit model (autodiff through the occultation integral).

    ``ld`` is either shared (4,) Claret coefficients or per-channel
    (n_chan, 4) — limb darkening IS chromatic (stronger in the blue),
    and fitting every channel with band-mean coefficients tilts the
    recovered spectrum because the LD error maps into a depth error
    with opposite sign at the band edges. With an ld_file configured,
    run_reduce feeds the per-channel rows automatically.

    ``weights``: optional (n_exp,) exposure weights, shared by every
    channel — pass RampFit.weights so exposures the robust white fit
    clipped (spot crossings, residual CRs) are skipped here too.

    ``baseline_var`` (default True): include the out-of-transit
    BASELINE-NORMALISATION variance in the reported sigma. The transit
    model here has no free flux scale (it is exactly 1 out of transit),
    so it assumes the input curves were normalised to their own noisy
    OOT mean — and that normalisation error maps straight into a depth
    error the chi^2 curvature cannot see (the curvature treats every
    point as independent). The omission is NOT small: the true depth
    scatter is inflated by ~sqrt(1 + N_in_eff/N_oot) over the curvature
    sigma (measured 1.19x on a 2000-realisation white-noise MC with the
    standard 48-exposure visit; the ensemble-calibration gates in
    tools/validate_recovery.py hold scatter/reported-sigma in
    [0.7, 1.5] per channel). The term added is the delta-method
    propagation of a multiplicative baseline error eps through the
    fitted minimum: drp/deps = 2 sum(w m' lc)/h (implicit function
    theorem on d(chi^2)/drp = 0), var(eps) = noise_var/N_oot. Disable
    only for curves normalised against an INDEPENDENT baseline (e.g. a
    noise-free model baseline).

    ``red_noise`` (default True): scale each channel's sigma by the
    Pont et al. (2006) time-binning beta factor measured on its own
    residuals (bin size ~ n_exp // 8, the orbit scale for a typical
    4-5-orbit visit). Curvature sigmas assume INDEPENDENT residuals;
    time-correlated noise — amplifier-drift random walks, residual
    unremoved systematics — makes them underestimate the realised depth
    scatter by up to ~2.6x (measured, staring-mode ensemble with
    bias_drift on; VALIDATION.json sigma_calibration_ratio history).
    beta is floored at 1 so pure white noise costs only its estimation
    fluctuation (~10% mean inflation at 8 bins); this is the standard
    convention of published transit analyses. Disable to recover the
    bare curvature+baseline sigma.

    Returns (rp_hat (n_chan,), rp_sigma (n_chan,)) where sigma comes from
    the chi^2 curvature, the per-channel residual scatter, the
    OOT-normalisation term, and the red-noise beta scaling.
    """
    z, in_front = projected_separation(exp_mid_s, orbit)
    n_chan = channel_lc.shape[1]
    ld = jnp.asarray(ld, jnp.float32)
    ld_chan = jnp.broadcast_to(ld if ld.ndim == 2 else ld[None, :],
                               (n_chan, 4))
    w = (jnp.ones(channel_lc.shape[0], jnp.float32) if weights is None
         else jnp.asarray(weights, jnp.float32))
    oot_f = out_of_transit_mask(exp_mid_s, orbit).astype(jnp.float32)

    def model(rp, ld_c):
        f = transit_depth_curve(z, rp, ld_c, n_quad)
        return 1.0 - (1.0 - f) * in_front

    def chi2(rp, lc, ld_c):
        return jnp.sum(w * (model(rp, ld_c) - lc) ** 2)

    d1 = jax.grad(chi2)
    d2 = jax.grad(lambda rp, lc, ld_c: d1(rp, lc, ld_c))

    def fit_one(lc, rp0, ld_c):
        def body(_, rp):
            g = d1(rp, lc, ld_c)
            h = d2(rp, lc, ld_c)
            step = g / jnp.where(jnp.abs(h) > 1e-12, h, 1e-12)
            return jnp.clip(rp - step, 0.01, 0.5)

        rp = jax.lax.fori_loop(0, n_newton, body, rp0)
        resid = model(rp, ld_c) - lc
        noise_var = (jnp.sum(w * resid**2)
                     / jnp.maximum(jnp.sum(w) - 1.0, 1.0))
        h = jnp.maximum(d2(rp, lc, ld_c), 1e-12)
        var_rp = 2.0 * noise_var / h
        if baseline_var:
            # OOT-normalisation term (see docstring): a relative
            # baseline error eps rescales the whole curve; the fitted
            # minimum shifts by drp/deps * eps with
            # drp/deps = 2 sum(w m' lc) / h.
            mprime = jax.jacfwd(lambda r: model(r, ld_c))(rp)
            drp_deps = 2.0 * jnp.sum(w * mprime * lc) / h
            n_oot = jnp.maximum(jnp.sum(w * oot_f), 1.0)
            var_rp = var_rp + drp_deps**2 * noise_var / n_oot
        sigma = jnp.sqrt(var_rp)
        if red_noise:
            sigma = sigma * _beta_red(resid, w,
                                      max(channel_lc.shape[0] // 8, 2))
        return rp, sigma

    rp0 = jnp.broadcast_to(rp_init, (n_chan,))
    return jax.vmap(fit_one, in_axes=(1, 0, 0))(channel_lc, rp0, ld_chan)
