"""Pallas TPU kernel: fused per-read detector sampling + readout.

The up-the-ramp step's full-frame work — Poisson-sampling the background,
adding the (already-sampled) signal band + cosmic rays, accumulating
charge, and emitting the read (non-linearity, bias, read noise, gain) —
is memory-bound and RNG-heavy. The XLA path makes several passes over the
frame with counter-based Philox draws; this kernel does ONE pass per row
tile in VMEM using the TPU's hardware PRNG (pltpu.prng_random_bits),
fusing:

    bg ~ Poisson(bg_lam)                       (three-regime sampler)
    cum_out = cum_in + add + bg
    sig = nonlin(min(cum_out, fw)) + bias + rn * N(0,1)
    dn = sig / gain

Grid: row tiles of TILE rows x S cols. Each tile seeds the PRNG with
(seed, read index, tile index) so draws are independent and reproducible.
Randomness differs bit-wise from the XLA path (different generator), but
the distributions are identical — validated statistically in tests.

CONTRACT: every kernel's ``gain_map`` operand is the RECIPROCAL gain
plane (1/gain per pixel). The kernels are VPU-bound at full frame, and
a vector divide per pixel per read is a measurable slice of the whole
exposure; the caller inverts the plane once per exposure instead
(ops/exposure.py). The scalar-gain path divides once per step in
scalar registers (consts[2] stays the plain gain).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 6.283185307179586
_J_STEPS = 12
_T_EXACT = 3.0
_T_GAUSS = 100.0


def _uniform(shape):
    """U(0,1) in (tiny, 1] from hardware PRNG bits (never exactly 0)."""
    # prng_random_bits may come back as signed int32 on hardware — bitcast
    # before shifting, or the sign bit sign-extends through >>.
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # 24 mantissa-safe bits; via int32 (Mosaic lacks a uint32->f32 cast)
    bits24 = pltpu.bitcast(bits >> 8, jnp.int32)
    u = bits24.astype(jnp.float32) * (1.0 / 16777216.0)
    return jnp.maximum(u, 1e-7)


def _poisson_tile(lam, z):
    """Three-regime Poisson given normal z (see ops/random.py).

    The exact inverse-transform regime is gated by a runtime branch that
    is skipped entirely when every POSITIVE lam in the tile sits in the
    Cornish-Fisher regime (sky-dominated backgrounds: lam ~ 12 >> 3).
    lam == 0 is handled exactly in the Gauss path (Poisson(0) = 0 by a
    where, not by the sampler), so the 5-px reference-pixel border —
    whose zero rates otherwise force the exact branch into EVERY column
    tile of EVERY read — no longer triggers it: at full frame that
    branch (exp + a 12-step loop per pixel) was a measurable slice of
    the whole VPU-bound kernel. The branch's uniform is drawn INSIDE
    it, so skipped tiles pay for neither the loop nor the draw; PRNG
    state consumption then depends on the (deterministic,
    data-dependent) branch, which keeps per-(seed, inputs)
    reproducibility.
    """
    pos = lam > 0.0
    skew = jnp.where(lam < _T_GAUSS, (z * z - 1.0) / 6.0, 0.0)
    gauss = jnp.maximum(jnp.round(lam + jnp.sqrt(lam) * z + skew), 0.0)
    gauss = jnp.where(pos, gauss, 0.0)         # Poisson(0) = 0, exactly

    def small_branch(_):
        u = _uniform(lam.shape)
        lam_c = jnp.minimum(lam, _T_EXACT)
        p0 = jnp.exp(-lam_c)

        # Unrolled with the 1/(j+1) factorial inverses folded to
        # compile-time constants: the fori_loop form issued a vector
        # DIVIDE per step per pixel (j was traced), and at full frame
        # (16 reads x 1024^2) those divides were a measurable slice of
        # the whole exposure kernel.
        p, cum, k = p0, jnp.zeros_like(lam), jnp.zeros_like(lam)
        for j in range(_J_STEPS):
            cum = cum + p
            k = k + (u > cum).astype(jnp.float32)
            p = p * lam_c * (1.0 / (j + 1.0))
        k_small = k
        return jnp.where(pos & (lam < _T_EXACT), k_small, gauss)

    min_pos = jnp.min(jnp.where(pos, lam, jnp.inf))
    return jax.lax.cond(min_pos < _T_EXACT, small_branch,
                        lambda _: gauss, None)


def _ipc_couple(sig, a):
    """Inter-pixel capacitance on the sensed charge (see
    ops/exposure._apply_ipc): kernel [[0,a,0],[a,1-4a,a],[0,a,0]], zero
    boundary. Static-shape shifted adds — only usable in the single-block
    kernels (a row-tiled grid would miscouple at tile seams)."""
    zr = jnp.zeros_like(sig[:1, :])
    zc = jnp.zeros_like(sig[:, :1])
    up = jnp.concatenate([zr, sig[:-1, :]], axis=0)
    down = jnp.concatenate([sig[1:, :], zr], axis=0)
    left = jnp.concatenate([zc, sig[:, :-1]], axis=1)
    right = jnp.concatenate([sig[:, 1:], zc], axis=1)
    return sig * (1.0 - 4.0 * a) + a * (up + down + left + right)


def _nonlin(sig, nl_ref, inv_fw):
    """Per-pixel cubic deficit: sig * (1 - (c1 q + c2 q^2 + c3 q^3)).

    Takes 1/full_well (a scalar reciprocal computed once per kernel
    step): q = sig * inv_fw avoids a VECTOR divide per pixel per read —
    the full-frame kernel is VPU-bound, and divides are multi-op there.
    """
    q = sig * inv_fw
    c1, c2, c3 = nl_ref[0], nl_ref[1], nl_ref[2]
    return sig * (1.0 - ((c3 * q + c2) * q + c1) * q)


def _kernel(seed_ref, cum_ref, add_ref, bg_ref, bias_ref, gain_ref, nl_ref,
            consts_ref, cum_out_ref, dn_ref, *, poisson, read_noise,
            non_linearity, bias, scalar_gain, bg_poisson=True):
    # two seed operands: [0] mixes the read/tile indices, [2] carries
    # the exposure key's SECOND 32-bit word — one word alone gives a
    # 2^32 stream space, and at 10k-visit MC scale (~10^6-10^7 streams)
    # birthday collisions would hand exposure pairs identical noise
    pltpu.prng_seed(seed_ref[0] + seed_ref[1] * 131071
                    + pl.program_id(0) * 100003, seed_ref[2])
    shape = cum_ref.shape

    # Box-Muller pairs: z_bg for the Poisson regimes, z_rn for read noise.
    u1 = _uniform(shape)
    u2 = _uniform(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = _TWO_PI * u2
    z_bg = r * jnp.cos(theta)
    z_rn = r * jnp.sin(theta)          # independent of z_bg

    cum = cum_ref[:] + add_ref[:]
    if poisson and bg_poisson:
        cum = cum + _poisson_tile(bg_ref[:], z_bg)
    else:
        # bg_poisson=False: dark AND sky are disabled, bg_ref is exactly
        # zero — Poisson(0) = 0, so skipping the sampler is exact (and
        # avoids its costly small-lam loop on an all-zero frame).
        cum = cum + bg_ref[:]
    cum_out_ref[:] = cum

    rn = consts_ref[0]
    fw = consts_ref[1]
    sig = cum
    if non_linearity:
        sig = _nonlin(jnp.minimum(sig, fw), nl_ref, 1.0 / fw)
    if bias:
        sig = sig + bias_ref[:]
    if read_noise:
        sig = sig + rn * z_rn
    # gain_ref carries the RECIPROCAL gain plane (see module docstring):
    # scalar reciprocals fold once per step, and the map case multiplies
    # instead of issuing a vector divide per pixel per read.
    dn_ref[:] = sig * ((1.0 / consts_ref[2]) if scalar_gain
                       else gain_ref[:])


def _kernel_banded(seed_ref, y0_ref, cum_ref, band_ref, bg_ref, bias_ref,
                   gain_ref, nl_ref, cr_pos_ref, cr_q_ref, consts_ref,
                   cum_out_ref, dn_ref, *, poisson, read_noise,
                   non_linearity, bias, scalar_gain, with_cr,
                   bg_poisson=True, ipc=False):
    """Single-block variant: deposits the signal band at dynamic row y0 and
    scatters cosmic-ray charges in-kernel — no full-frame staging frames in
    the XLA graph at all. Pallas grids are sequential per core, so one
    (S, S) block loses no parallelism and removes tile-straddle handling.
    """
    pltpu.prng_seed(seed_ref[0] + seed_ref[1] * 131071, seed_ref[2])
    shape = cum_ref.shape
    W = band_ref.shape[0]

    u1 = _uniform(shape)
    u2 = _uniform(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = _TWO_PI * u2
    z_bg = r * jnp.cos(theta)
    z_rn = r * jnp.sin(theta)

    if poisson and bg_poisson:
        base = cum_ref[:] + _poisson_tile(bg_ref[:], z_bg)
    else:
        base = cum_ref[:] + bg_ref[:]   # zero when bg_poisson=False
    cum_out_ref[:] = base
    y0 = pl.multiple_of(y0_ref[0], 8)   # caller 8-aligns the window
    cum_out_ref[pl.ds(y0, W), :] += band_ref[:]
    if with_cr:
        n_cr = cr_pos_ref.shape[1]
        S_cols = shape[1]
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, S_cols), 1)

        def hit(i, _):
            # Mosaic has no scalar VMEM stores — deposit via a one-hot row.
            y, x = cr_pos_ref[0, i], cr_pos_ref[1, i]
            row = cum_out_ref[pl.ds(y, 1), :]
            dep = jnp.where(col_ids == x, cr_q_ref[i], 0.0)
            cum_out_ref[pl.ds(y, 1), :] = row + dep
            return 0

        jax.lax.fori_loop(0, n_cr, hit, 0)

    rn = consts_ref[0]
    fw = consts_ref[1]
    sig = cum_out_ref[:]
    if non_linearity:
        sig = _nonlin(jnp.minimum(sig, fw), nl_ref, 1.0 / fw)
    if ipc:
        sig = _ipc_couple(sig, consts_ref[3])
    if bias:
        sig = sig + bias_ref[:]
    if read_noise:
        sig = sig + rn * z_rn
    dn_ref[:] = sig * ((1.0 / consts_ref[2]) if scalar_gain
                       else gain_ref[:])


def _kernel_exposure(seed_ref, y0s_ref, dts_ref, bands_ref, cum_init_ref,
                     bg_rate_ref, bias_ref, gain_ref, nl_ref, cr_pos_ref,
                     cr_q_ref, consts_ref, dn_ref, cum_out_ref, cum_ref, *,
                     poisson, read_noise, non_linearity, bias, scalar_gain,
                     with_cr, bg_poisson=True, ipc=False, tiled=False):
    """Multi-read fused readout: grid step k emits one read.

    The TPU Pallas grid is sequential per core, so the accumulated charge
    lives in a VMEM scratch across all the reads of this call — the
    detector maps stream in per read but the cum frame never round-trips
    HBM between reads, and there is one kernel launch per
    MAX_READS_PER_CALL reads instead of one per read. Every step is
    uniform: Poisson-sample this read's interval background and signal
    band in-kernel, deposit cosmic rays, accumulate, read out. The
    zeroth read is just a read whose interval arrays are zero (dt = 0,
    zero band, zero CR charge): Poisson(0) = 0 in every regime.
    seed_ref[1] carries the global read offset so chunked calls draw
    disjoint streams.

    ``tiled``: grid is (col_tiles, NR) — read index innermost, so each
    column tile's accumulated charge persists in the (S, TILE) scratch
    across its whole read sweep (re-initialised at k == 0 per tile).
    Every ref sees only its tile's column slice; CR hits are matched
    against GLOBAL column ids (tile offset + local iota) so each hit
    lands in exactly one tile. Total HBM traffic is unchanged versus
    the untiled kernel (every map/band byte still streams exactly
    once); only the VMEM working set shrinks by col_tiles — what makes
    full-frame 1024^2 fit the ~16 MB VMEM budget (2048^2 would need
    sub-128-lane tiles: fused_exposure_col_tiles returns 0 there and
    the per-read kernels take over).
    IPC is NOT supported tiled (column coupling would miscouple at tile
    seams); callers fall back to the per-read path for ipc=True.
    """
    if tiled:
        t, k = pl.program_id(0), pl.program_id(1)
    else:
        t, k = 0, pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + (seed_ref[1] + k) * 100003
                    + t * 131071, seed_ref[2])
    shape = cum_ref.shape
    W = bands_ref.shape[1]

    u1 = _uniform(shape)
    u2 = _uniform(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = _TWO_PI * u2
    z_bg = r * jnp.cos(theta)
    z_rn = r * jnp.sin(theta)

    @pl.when(k == 0)
    def _init():
        cum_ref[...] = cum_init_ref[...]

    if poisson:
        if bg_poisson:
            cum_ref[...] += _poisson_tile(bg_rate_ref[...] * dts_ref[k], z_bg)
        else:
            # dark AND sky off: bg_rate is exactly zero; Poisson(0) = 0,
            # so skipping the sampler is exact (its small-lam loop would
            # otherwise run on the all-zero frame every read).
            cum_ref[...] += bg_rate_ref[...] * dts_ref[k]
        ub1 = _uniform((W, shape[1]))
        ub2 = _uniform((W, shape[1]))
        zb = jnp.sqrt(-2.0 * jnp.log(ub1)) * jnp.cos(_TWO_PI * ub2)
        band = _poisson_tile(bands_ref[0], zb)
    else:
        cum_ref[...] += bg_rate_ref[...] * dts_ref[k]
        band = bands_ref[0]
    y0 = pl.multiple_of(y0s_ref[k], 8)
    cum_ref[pl.ds(y0, W), :] += band
    if with_cr:
        n_cr = cr_pos_ref.shape[2]
        # GLOBAL column ids: tiled kernels see a column slice, and a CR
        # hit must land in exactly the tile whose slice holds its x.
        col_ids = (jax.lax.broadcasted_iota(jnp.int32, (1, shape[1]), 1)
                   + t * shape[1])

        def hit(i, _):
            y, x = cr_pos_ref[k, 0, i], cr_pos_ref[k, 1, i]
            row = cum_ref[pl.ds(y, 1), :]
            dep = jnp.where(col_ids == x, cr_q_ref[k, i], 0.0)
            cum_ref[pl.ds(y, 1), :] = row + dep
            return 0

        jax.lax.fori_loop(0, n_cr, hit, 0)

    rn = consts_ref[0]
    fw = consts_ref[1]
    sig = cum_ref[...]
    if non_linearity:
        sig = _nonlin(jnp.minimum(sig, fw), nl_ref, 1.0 / fw)
    if ipc:
        sig = _ipc_couple(sig, consts_ref[3])
    if bias:
        sig = sig + bias_ref[...]
    if read_noise:
        sig = sig + rn * z_rn
    dn_ref[0] = sig * ((1.0 / consts_ref[2]) if scalar_gain
                       else gain_ref[...])
    cum_out_ref[...] = cum_ref[...]


# Reads per fused_exposure_readout call. 16 covers the WFC3 maximum
# (NSAMP=15 -> 16 emitted reads) in a single launch; the dn output
# streams back to HBM one (1, S, S) block per grid step, so VMEM use is
# independent of this bound. Measured on v5e: one launch per exposure is
# ~4% faster than two (A/B at NSAMP=15, 512^2, full noise).
MAX_READS_PER_CALL = 16


@functools.partial(jax.jit, static_argnames=(
    "poisson", "read_noise", "non_linearity", "bias", "scalar_gain",
    "with_cr", "bg_poisson", "ipc", "col_tiles", "interpret"))
def fused_exposure_readout(
        seed2: jnp.ndarray, y0s: jnp.ndarray, dts: jnp.ndarray,
        bands: jnp.ndarray, cum_init: jnp.ndarray, bg_rate: jnp.ndarray,
        bias_map: jnp.ndarray, gain_map: jnp.ndarray, nl_coeffs: jnp.ndarray,
        cr_pos: jnp.ndarray, cr_q: jnp.ndarray, consts: jnp.ndarray, *,
        poisson: bool = True, read_noise: bool = True,
        non_linearity: bool = True, bias: bool = True,
        scalar_gain: bool = False, with_cr: bool = True,
        bg_poisson: bool = True, ipc: bool = False, col_tiles: int = 1,
        interpret: bool = False) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Up to MAX_READS_PER_CALL reads in one kernel launch.

    All per-read arrays are indexed by EMITTED read (the zeroth read is
    represented by zero entries: dt = 0, zero band, zero CR charge).

    Args:
      seed2: (3,) int32 (exposure seed word 0, global read offset of this call, exposure seed word 1).
      y0s: (NR,) int32 8-aligned band start rows.
      dts: (NR,) f32 interval durations ending at each read.
      bands: (NR, W, S) EXPECTED signal electrons per interval
        (Poisson-sampled in-kernel).
      cum_init: (S, S) accumulated charge entering this call.
      bg_rate: (S, S) expected background electrons per second.
      cr_pos: (NR, 2, MAX_CR) int32; cr_q: (NR, MAX_CR) charges
        (zeroed beyond the actual count).
      consts: (4,) f32 (read_noise_e, full_well_e, gain, ipc_alpha);
        a length-3 array is accepted when ipc=False.
      col_tiles: split the frame into this many column tiles, each
        sweeping all reads with its charge resident in VMEM (grid
        (col_tiles, NR), read index innermost). 1 = the measured
        single-block layout (S <= 512); S > 512 needs
        col_tiles >= (S/512)^2 to keep the working set inside VMEM.
        Total HBM bytes are identical for every value. Requires
        ipc=False when > 1 (tile seams) and S % (128 * col_tiles) == 0.

    Returns:
      (reads_dn (NR, S, S) in time order, final cum_e (S, S)).
    """
    S = bg_rate.shape[0]
    nr = int(y0s.shape[0])
    if nr > MAX_READS_PER_CALL:
        raise ValueError(f"at most {MAX_READS_PER_CALL} reads per call")
    W = bands.shape[1]
    tiled = col_tiles > 1
    if tiled and ipc:
        raise ValueError("col_tiles > 1 cannot apply IPC (tile seams)")
    if tiled and (S % col_tiles or (S // col_tiles) % 128):
        raise ValueError(f"col_tiles={col_tiles} must cut S={S} into "
                         "lane-aligned (multiple-of-128) column tiles")
    T = S // col_tiles
    if tiled:
        tmap = lambda t, k, *_: (0, t)
        full = pl.BlockSpec((S, T), tmap, memory_space=pltpu.VMEM)
        band_spec = pl.BlockSpec((1, W, T), lambda t, k, *_: (k, 0, t),
                                 memory_space=pltpu.VMEM)
        nl_spec = pl.BlockSpec((3, S, T), lambda t, k, *_: (0, 0, t),
                               memory_space=pltpu.VMEM)
        dn_spec = pl.BlockSpec((1, S, T), lambda t, k, *_: (k, 0, t),
                               memory_space=pltpu.VMEM)
        grid = (col_tiles, nr)
    else:
        const2 = lambda *_: (0, 0)
        full = pl.BlockSpec((S, S), const2, memory_space=pltpu.VMEM)
        band_spec = pl.BlockSpec((1, W, S), lambda k, *_: (k, 0, 0),
                                 memory_space=pltpu.VMEM)
        nl_spec = pl.BlockSpec((3, S, S), lambda *_: (0, 0, 0),
                               memory_space=pltpu.VMEM)
        dn_spec = pl.BlockSpec((1, S, S), lambda k, *_: (k, 0, 0),
                               memory_space=pltpu.VMEM)
        grid = (nr,)
    kernel = functools.partial(
        _kernel_exposure, poisson=poisson, read_noise=read_noise,
        non_linearity=non_linearity, bias=bias, scalar_gain=scalar_gain,
        with_cr=with_cr, bg_poisson=bg_poisson, ipc=ipc, tiled=tiled)
    dn, cum = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # y0s
                pl.BlockSpec(memory_space=pltpu.SMEM),   # dts
                band_spec,
                full, full, full, full,
                nl_spec,
                pl.BlockSpec(memory_space=pltpu.SMEM),   # cr_pos (full)
                pl.BlockSpec(memory_space=pltpu.SMEM),   # cr_q (full)
                pl.BlockSpec(memory_space=pltpu.SMEM)],  # consts
            out_specs=[dn_spec, full],
            scratch_shapes=[pltpu.VMEM((S, T), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((nr, S, S), jnp.float32),
                   jax.ShapeDtypeStruct((S, S), jnp.float32)],
        interpret=interpret,
    )(seed2, y0s, dts, bands, cum_init, bg_rate,
      bias_map, gain_map, nl_coeffs, cr_pos, cr_q, consts)
    return dn, cum


# Whole-exposure single-launch support is MEASURED on v5e (the dn output
# streams to HBM per grid step, so scoped VMEM stays ~4 full frames).
# Other TPU generations may estimate VMEM differently; rather than trust
# the lowering property, compile-probe the kernel once per frame shape
# and fall back to the per-read kernels when the probe fails.
_V5E_KINDS = ("v5 lite", "v5e", "v5litepod")


@functools.lru_cache(maxsize=None)
def _fused_probe(S: int, W: int, nr: int, n_cr: int, col_tiles: int,
                 kind: str) -> bool:
    if col_tiles == 1 and any(k in kind.lower() for k in _V5E_KINDS):
        return True                       # measured configuration
    try:
        f32 = jnp.float32
        sh = jax.ShapeDtypeStruct
        fused_exposure_readout.lower(
            sh((3,), jnp.int32), sh((nr,), jnp.int32), sh((nr,), f32),
            sh((nr, W, S), f32), sh((S, S), f32), sh((S, S), f32),
            sh((S, S), f32), sh((S, S), f32), sh((3, S, S), f32),
            sh((nr, 2, n_cr), jnp.int32), sh((nr, n_cr), f32),
            sh((4,), f32), col_tiles=col_tiles).compile()
        return True
    except Exception:
        return False


def fused_exposure_col_tiles(S: int) -> int:
    """Column-tile count for the whole-exposure kernel above 512^2:
    the widest lane-aligned (multiple-of-128) tile width dividing S
    with S * tile <= 512 * 256 — e.g. 1024 -> 8 tiles of 128 columns.
    1 below 512 (the measured single-block layout); 0 marks frames the
    tiling cannot cut into lane-aligned columns.

    The budget is EMPIRICAL, not the 512^2 single-block bytes: on v5e
    the remote Mosaic compile crashes (helper subprocess exit 1, no
    diagnostic) for (1024, 256) blocks even though their total VMEM
    matches the working 512^2 layout, while (1024, 128) compiles and
    runs — probed via fused_whole_exposure_supported either way, so a
    backend where wider tiles work only pays the probe."""
    if S <= 512:
        return 1
    best = 0
    for tile in range(128, S + 1, 128):
        if S % tile == 0 and S * tile <= 512 * 256:
            best = tile
    return S // best if best else 0


def fused_whole_exposure_supported(S: int, W: int, nr: int,
                                   n_cr: int) -> bool:
    """True when the single-launch whole-exposure kernel compiles on the
    current backend at this frame shape (cached per shape + device kind;
    trusted without a probe on v5e where it was A/B-measured). Frames
    above 512^2 probe the column-tiled layout (fused_exposure_col_tiles)."""
    ct = fused_exposure_col_tiles(S)
    if ct == 0:
        return False
    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        kind = "unknown"
    if jax.default_backend() != "tpu":
        return True      # interpret-mode / CPU tests exercise it directly
    return _fused_probe(S, W, nr, n_cr, ct, kind)


@functools.partial(jax.jit, static_argnames=(
    "poisson", "read_noise", "non_linearity", "bias", "scalar_gain",
    "bg_poisson", "tile", "interpret"))
def fused_read_step(seed2: jnp.ndarray, cum_e: jnp.ndarray,
                    add_frame: jnp.ndarray, bg_lam: jnp.ndarray,
                    bias_map: jnp.ndarray, gain_map: jnp.ndarray,
                    nl_coeffs: jnp.ndarray,
                    consts: jnp.ndarray, *, poisson: bool = True,
                    read_noise: bool = True, non_linearity: bool = True,
                    bias: bool = True, scalar_gain: bool = False,
                    bg_poisson: bool = True, tile: int = 128,
                    interpret: bool = False) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One fused detector read step.

    Args:
      seed2: (3,) int32 — (exposure seed word 0, read index, seed word 1).
      cum_e: (S, S) accumulated charge before this interval.
      add_frame: (S, S) already-sampled signal band + cosmic rays.
      bg_lam: (S, S) expected background electrons this interval.
      bias_map: (S, S) detector map; gain_map: (S, S) RECIPROCAL gain
        plane (module-docstring contract).
      nl_coeffs: (3, S, S) per-pixel cubic non-linearity planes (c1, c2, c3).
      consts: (3,) f32 — (read_noise_e, full_well_e, gain_scalar).

    Returns: (new cum_e, read DN frame).
    """
    S = cum_e.shape[0]
    tile = min(tile, S)
    grid = (S // tile,)
    # index_map receives the scalar-prefetch refs after the grid indices.
    row_spec = pl.BlockSpec((tile, S), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    nl_spec = pl.BlockSpec((3, tile, S), lambda i, *_: (0, i, 0),
                           memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _kernel, poisson=poisson, read_noise=read_noise,
        non_linearity=non_linearity, bias=bias, scalar_gain=scalar_gain,
        bg_poisson=bg_poisson)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[row_spec, row_spec, row_spec, row_spec, row_spec,
                      nl_spec,
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=[row_spec, row_spec],
        ),
        out_shape=[jax.ShapeDtypeStruct((S, S), jnp.float32),
                   jax.ShapeDtypeStruct((S, S), jnp.float32)],
        interpret=interpret,
    )(seed2, cum_e, add_frame, bg_lam, bias_map, gain_map, nl_coeffs, consts)


@functools.partial(jax.jit, static_argnames=(
    "poisson", "read_noise", "non_linearity", "bias", "scalar_gain",
    "with_cr", "bg_poisson", "ipc", "interpret"))
def fused_read_step_banded(
        seed2: jnp.ndarray, y0: jnp.ndarray, cum_e: jnp.ndarray,
        band: jnp.ndarray, bg_lam: jnp.ndarray, bias_map: jnp.ndarray,
        gain_map: jnp.ndarray, nl_coeffs: jnp.ndarray, cr_pos: jnp.ndarray,
        cr_q: jnp.ndarray,
        consts: jnp.ndarray, *, poisson: bool = True,
        read_noise: bool = True, non_linearity: bool = True,
        bias: bool = True, scalar_gain: bool = False, with_cr: bool = True,
        bg_poisson: bool = True, ipc: bool = False,
        interpret: bool = False) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fully fused read step: band deposit + CR scatter + background
    Poisson + accumulate + readout, one single-block kernel.

    Args:
      seed2: (3,) int32 (exposure seed word 0, read index, seed word 1).
      y0: (1,) int32 band start row (clamped to [0, S - W]).
      band: (W, S) already-sampled signal electrons this interval.
      nl_coeffs: (3, S, S) per-pixel cubic non-linearity planes (c1, c2, c3).
      cr_pos: (2, MAX_CR) int32 hit coordinates; cr_q: (MAX_CR,) charges
        (pre-masked: zero beyond the actual hit count).
      consts: (4,) f32 — (read_noise_e, full_well_e, gain,
        ipc_alpha); length-3 accepted when ipc=False.
    """
    S = cum_e.shape[0]
    full = pl.BlockSpec((S, S), lambda *_: (0, 0), memory_space=pltpu.VMEM)
    band_spec = pl.BlockSpec(band.shape, lambda *_: (0, 0),
                             memory_space=pltpu.VMEM)
    nl_spec = pl.BlockSpec((3, S, S), lambda *_: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _kernel_banded, poisson=poisson, read_noise=read_noise,
        non_linearity=non_linearity, bias=bias, scalar_gain=scalar_gain,
        with_cr=with_cr, bg_poisson=bg_poisson, ipc=ipc)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[full, band_spec, full, full, full, nl_spec,
                      pl.BlockSpec(cr_pos.shape, lambda *_: (0, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec(cr_q.shape, lambda *_: (0,),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=[full, full],
        ),
        out_shape=[jax.ShapeDtypeStruct((S, S), jnp.float32),
                   jax.ShapeDtypeStruct((S, S), jnp.float32)],
        interpret=interpret,
    )(seed2, y0, cum_e, band, bg_lam, bias_map, gain_map, nl_coeffs, cr_pos,
      cr_q, consts)
