"""Per-read per-amplifier bias drift: injection + reference-pixel correction.

Beyond the reference (which models only a static pedestal — reference:
wayne/detector.py constant/bias levels): real WFC3 IR amplifiers wander
by a few electrons between non-destructive reads, and calwf3's BLEVCORR
step removes the wander with the blind reference-pixel border. The
simulator injects it (NoiseFlags.bias_drift + Tables.bias_drift_e) and
reduction.ref_pixel_correct removes it.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wayne_tpu.calibration import (FULL_FRAME, quadrant_map, subarray_corner,
                                   synthetic_tables)
from wayne_tpu.config import ExposureStatic, NoiseFlags
from wayne_tpu.ops.exposure import simulate_exposure
from wayne_tpu.reduction import ref_pixel_correct
from wayne_tpu.scene import example_scene


def _quad_map(S: int, corner=None) -> np.ndarray:
    cx, cy = subarray_corner(S) if corner is None else corner
    half = FULL_FRAME // 2
    gx = cx + np.arange(S)
    gy = cy + np.arange(S)
    return ((gy[:, None] >= half).astype(int) * 2
            + (gx[None, :] >= half).astype(int))


def _drift_flags() -> NoiseFlags:
    return dataclasses.replace(NoiseFlags.none(), bias=True, bias_drift=True)


@pytest.mark.parametrize("S,corner", [(64, None), (512, None), (1024, None),
                                      (256, (0, 0)), (128, (700, 300))])
def test_shared_quadrant_map_matches_numpy_oracle(S, corner):
    """calibration.quadrant_map (used by BOTH the injection in
    ops/exposure._bias_drift_dn and the correction in
    reduction.ref_pixel_correct) must match this test's independent
    NumPy derivation — injection/correction quadrant agreement is what
    makes the closed loop exact."""
    got = np.asarray(quadrant_map(S, corner))
    np.testing.assert_array_equal(got, _quad_map(S, corner))


def test_injection_piecewise_constant_per_quadrant():
    """Drift-on minus drift-off (same keys, deterministic chain
    otherwise) is EXACTLY the per-quadrant offset plane, with N(0,
    bias_drift_e) statistics per read per amplifier."""
    S, nsamp = 128, 7
    base = dataclasses.replace(NoiseFlags.none(), bias=True)
    cfg_off = ExposureStatic(subarray=S, n_lambda=32, n_sub=1, nsamp=nsamp,
                             samp_seq="SPARS10", scan=False,
                             noise=base, compute_ideal=False)
    cfg_on = dataclasses.replace(
        cfg_off, noise=dataclasses.replace(base, bias_drift=True))
    tables = synthetic_tables("G141", subarray=S, n_lambda=32,
                              samp_seq="SPARS10", nsamp=nsamp)
    scene = example_scene(32)
    r_off = np.asarray(simulate_exposure(scene, tables, cfg_off).reads_dn,
                       np.float64)
    r_on = np.asarray(simulate_exposure(scene, tables, cfg_on).reads_dn,
                      np.float64)
    quad = _quad_map(S)
    gain = float(tables.gain)
    sigma = float(tables.bias_drift_e)
    assert sigma > 0.0

    delta = r_on - r_off                              # (nsamp+1, S, S)
    offs = []
    for k in range(nsamp + 1):
        for q in range(4):
            vals = delta[k][quad == q]
            assert vals.size > 0                      # centered 128^2
            #                                           straddles all 4 amps
            assert vals.std() < 1e-3                  # constant per quad
            offs.append(vals.mean() * gain)           # back to electrons
    offs = np.asarray(offs)
    # Each offset is an independent N(0, sigma) draw; 32 draws ->
    # loose 4-sigma-ish bounds on the sample moments.
    assert abs(offs.mean()) < 4.0 * sigma / np.sqrt(len(offs))
    assert 0.5 * sigma < offs.std() < 2.0 * sigma
    # And it is genuinely per-quadrant: some read has distinct offsets.
    per_quad = offs.reshape(nsamp + 1, 4)
    assert np.ptp(per_quad, axis=1).max() > 0.5 * sigma


def test_drift_off_only_adds_quadrant_constants():
    """bias_drift changes the reads ONLY by additive per-quadrant
    constants — physics, flat, every other chain stage untouched."""
    S = 64
    base = dataclasses.replace(NoiseFlags.none(), bias=True)
    cfg_off = ExposureStatic(subarray=S, n_lambda=32, n_sub=2, nsamp=3,
                             samp_seq="RAPID", scan=True,
                             noise=base, compute_ideal=False)
    cfg_on = dataclasses.replace(
        cfg_off, noise=dataclasses.replace(base, bias_drift=True))
    tables = synthetic_tables("G141", subarray=S, n_lambda=32,
                              samp_seq="RAPID", nsamp=3)
    scene = example_scene(32, scan_speed=1.0)
    r_off = np.asarray(simulate_exposure(scene, tables, cfg_off).reads_dn,
                       np.float64)
    r_on = np.asarray(simulate_exposure(scene, tables, cfg_on).reads_dn,
                      np.float64)
    quad = _quad_map(S)
    delta = r_on - r_off
    for k in range(delta.shape[0]):
        for q in range(4):
            vals = delta[k][quad == q]
            if vals.size:
                assert vals.std() < 2e-3
    assert np.abs(delta).max() > 0.05                 # it DID drift


def test_ref_pixel_correct_recovers_known_offsets():
    """Synthetic stack with a 5-px reference ring: the correction
    recovers the injected per-read per-quadrant offsets to the
    read-noise-limited floor, CR outliers on the border notwithstanding."""
    rng = np.random.default_rng(7)
    S, nr = 96, 6
    corner = (FULL_FRAME // 2 - S // 2, FULL_FRAME // 2 - S // 2)
    quad = _quad_map(S, corner)
    ref = np.zeros((S, S), bool)
    ref[:5], ref[-5:], ref[:, :5], ref[:, -5:] = True, True, True, True

    base = 1000.0 + 5.0 * rng.standard_normal((S, S))  # static structure
    delta = 2.0 * rng.standard_normal((nr, 4))
    delta[0] = 0.0
    noise = 0.5 * rng.standard_normal((nr, S, S))
    reads = base[None] + delta[:, quad] + noise
    # A cosmic ray on the border must not poison the quadrant mean.
    reads[3, 1, 7] += 4000.0

    corrected, offsets = ref_pixel_correct(
        jnp.asarray(reads, jnp.float32), jnp.asarray(ref), corner=corner)
    corrected, offsets = np.asarray(corrected), np.asarray(offsets)

    n_ref_q = ref[quad == 0].sum()                    # ~930 px / quadrant
    floor = 0.5 / np.sqrt(n_ref_q) * np.sqrt(2.0) * 6.0
    assert np.abs(offsets - delta).max() < max(floor, 0.15)
    # Corrected active pixels: drift gone (down to the same floor).
    act = ~ref
    resid = corrected - (base[None] + noise)
    for k in range(nr):
        for q in range(4):
            m = act & (quad == q)
            assert abs(resid[k][m].mean()) < 0.2


def test_ref_pixel_correct_noop_without_reference_pixels():
    rng = np.random.default_rng(3)
    reads = rng.standard_normal((4, 32, 32)).astype(np.float32)
    corrected, offsets = ref_pixel_correct(
        jnp.asarray(reads), jnp.zeros((32, 32)))
    np.testing.assert_allclose(np.asarray(corrected), reads, atol=1e-6)
    np.testing.assert_allclose(np.asarray(offsets), 0.0, atol=1e-6)


@pytest.mark.slow
def test_subarray_depth_recovery_with_drift():
    """Subarray products carry no reference pixels, so the drift rides
    into the standard analysis — this closes the documented claim that
    the windowed background subtraction + divide-white chain absorbs it:
    depths stay unbiased (drift behaves as extra noise, not systematic
    bias)."""
    from wayne_tpu.reduction import (common_mode_correct, fit_depths,
                                     reduce_visit)

    S, NL, NSAMP, N_EXP, N_CHAN = 128, 128, 3, 18, 3
    flags = dataclasses.replace(
        NoiseFlags.none(), poisson=True, read_noise=True, sky=True,
        dark=True, bias_drift=True)
    cfg0 = ExposureStatic(subarray=S, n_lambda=NL, n_sub=2, nsamp=NSAMP,
                          samp_seq="SPARS10", scan=True,
                          noise=NoiseFlags.none(), band_px=48)
    cfg = dataclasses.replace(cfg0, noise=flags)
    tables = synthetic_tables("G141", subarray=S, n_lambda=NL,
                              samp_seq="SPARS10", nsamp=NSAMP)
    base = example_scene(NL, scan_speed=0.5)
    wl = np.asarray(tables.wl_centers)
    rp_inj = 0.1595 + 0.003 * np.sin(8.0 * wl)
    base = dataclasses.replace(
        base, x_ref=jnp.float32(20.0), y_ref=jnp.float32(30.0),
        rp_over_rs=jnp.asarray(rp_inj, jnp.float32))
    starts = np.linspace(0.0, 4.0 * 3600.0, N_EXP)
    exptime = float(tables.read_times[-1])
    mid = jnp.asarray(starts + exptime / 2.0, jnp.float32)
    visit = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (N_EXP,) + x.shape), base)
    visit = dataclasses.replace(
        visit, exp_start_s=jnp.asarray(starts, jnp.float32))
    # Bright dispersion columns only (the >50%-of-peak range is 67..127
    # at this x_ref; a near-dark edge channel would be drift-noise
    # dominated and its nonlinear depth fit biases low at any SNR).
    xw, yw, bgr = (68, 122), (20, 60), (90, 125)

    def make_run(local_cfg):
        @jax.jit
        def run(m):
            keys = jax.vmap(lambda e: jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(5), m), e)
            )(jnp.arange(N_EXP))
            scenes = dataclasses.replace(visit, key=keys)
            reads = jax.lax.map(
                lambda s: simulate_exposure(s, tables, local_cfg).reads_dn,
                scenes)
            red = reduce_visit(reads, tables.gain, mid, base.orbit,
                               y_window=yw, x_window=xw, bg_rows=bgr,
                               n_chan=N_CHAN)
            chan = common_mode_correct(red.white_lc, red.channel_lc, mid,
                                       base.orbit, base.ld,
                                       jnp.float32(0.155))
            rp, _ = fit_depths(chan, mid, base.orbit, base.ld,
                               jnp.float32(0.155))
            return rp
        return run

    # Noise-free recovery through the IDENTICAL pipeline: the comparison
    # cancels the reduction's own window/edge systematics (same design
    # as tools/validate_recovery.py), isolating what the DRIFT adds.
    rp_ref = np.asarray(make_run(cfg0)(0))
    run = make_run(cfg)
    rps = np.stack([np.asarray(run(m)) for m in range(3)])  # (3, N_CHAN)
    sem = rps.std(axis=0) / np.sqrt(rps.shape[0]) + 1e-4
    assert np.abs(rps.mean(axis=0) - rp_ref).max() < 2.5e-3
    assert (np.abs(rps.mean(axis=0) - rp_ref) < 4.0 * sem).all()


@pytest.mark.slow
def test_full_frame_exposure_closed_loop():
    """A real 1024^2 simulated exposure: the border ring (active_mask
    zero -> DQ 128 in products) measures and removes the injected
    drift — after correction the per-quadrant reference levels are
    read-to-read stable at the read-noise floor."""
    S, nsamp = FULL_FRAME, 2
    flags = dataclasses.replace(_drift_flags(), read_noise=True)
    cfg = ExposureStatic(subarray=S, n_lambda=16, n_sub=1, nsamp=nsamp,
                         samp_seq="SPARS10", scan=False,
                         noise=flags, compute_ideal=False)
    tables = synthetic_tables("G141", subarray=S, n_lambda=16,
                              samp_seq="SPARS10", nsamp=nsamp)
    scene = example_scene(16)
    reads = simulate_exposure(scene, tables, cfg).reads_dn
    ref = np.asarray(tables.active_mask) < 0.5
    assert ref.sum() == 4 * 5 * S - 4 * 25            # the 5-px ring

    corrected, offsets = ref_pixel_correct(reads, jnp.asarray(ref))
    corrected = np.asarray(corrected, np.float64)
    quad = _quad_map(S, (0, 0))
    gain = float(tables.gain)
    rn_dn = float(tables.read_noise_e) / gain
    drift_dn = float(tables.bias_drift_e) / gain
    for q in range(4):
        m = ref & (quad == q)
        levels = np.array([corrected[k][m].mean()
                           for k in range(nsamp + 1)])
        floor = 6.0 * rn_dn / np.sqrt(m.sum())
        assert np.ptp(levels) < max(floor, 0.2 * drift_dn)
    # ... and the raw (uncorrected) levels DID move by ~the drift scale.
    raw = np.asarray(reads, np.float64)
    moved = max(np.ptp(np.array([raw[k][ref & (quad == q)].mean()
                                 for k in range(nsamp + 1)]))
                for q in range(4))
    assert moved > 0.2 * drift_dn
