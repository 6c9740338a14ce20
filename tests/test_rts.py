"""Unstable (RTS) pixels: time-VARIABLE response defects, DQ bit 32.

Real WFC3 IR detectors carry a population of unstable pixels (random
telegraph signal / popcorn noise: the response toggles between discrete
levels on minute-to-hour timescales). calwf3 flags them DQ 32 ("bad in
reference file"/unstable) and real analyses exclude them — unlike the
STATIC defect classes (hot/dead/blob), an unstable pixel's error does
NOT cancel in normalised light-curve ratios, so leaving it in the
extraction window directly corrupts depths. The simulator carries them
on the optional ``Tables.rts_amp`` plane (None = pytree-invisible,
zero hot-path cost): each exposure draws one high/low state per
unstable pixel from the exposure key (``fold_in(key, 1321)`` — a
branch of the same counter-based stream as every other noise source,
so visits stay exactly reproducible), and the source response is
scaled by (1 +- amp).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wayne_tpu.calibration import synthetic_tables
from wayne_tpu.config import ExposureStatic, NoiseFlags, config_from_dict
from wayne_tpu.io.ima import DQ_UNSTABLE, static_dq_plane
from wayne_tpu.ops.exposure import simulate_exposure
from wayne_tpu.ops.visit import simulate_visit
from wayne_tpu.reduction import (
    DQ_STATIC_BAD, fit_depths, good_diff_masks_from_dq, reduce_visit)
from wayne_tpu.scene import example_scene

S, NL, NSAMP = 128, 64, 4


def test_synthetic_rts_population():
    clean = synthetic_tables("G141", subarray=S, n_lambda=NL, nsamp=NSAMP)
    assert clean.rts_amp is None                      # pytree-invisible
    t = synthetic_tables("G141", subarray=S, n_lambda=NL, nsamp=NSAMP,
                         rts_frac=1e-3, rts_amplitude=0.08)
    amp = np.asarray(t.rts_amp)
    n = int((amp > 0).sum())
    assert 0 < n < 3 * 1e-3 * S * S
    assert np.all(amp[amp > 0] <= 0.08 + 1e-6)
    # defect stream independence: other planes bit-identical
    np.testing.assert_array_equal(np.asarray(clean.dark_map),
                                  np.asarray(t.dark_map))
    # qe/rts knobs compose without re-dealing each other's draws
    t2 = synthetic_tables("G141", subarray=S, n_lambda=NL, nsamp=NSAMP,
                          dead_frac=1e-3, rts_frac=1e-3,
                          rts_amplitude=0.08)
    np.testing.assert_array_equal(np.asarray(t2.rts_amp), amp)


def test_rts_toggles_response_per_exposure():
    """A hand-placed unstable trace pixel reads exactly (1 +- amp) x the
    stable frame, both states occur across exposures, and the state is
    a pure function of the exposure key."""
    tables = synthetic_tables("G141", subarray=S, n_lambda=NL, nsamp=NSAMP)
    flags = NoiseFlags.none()
    cfg = ExposureStatic(subarray=S, n_lambda=NL, n_sub=2, nsamp=NSAMP,
                         samp_seq="SPARS10", scan=True, noise=flags,
                         band_px=48)
    scene = example_scene(NL, scan_speed=0.5)
    scene = dataclasses.replace(scene, x_ref=jnp.float32(30.0),
                                y_ref=jnp.float32(30.0))
    ref = np.asarray(simulate_exposure(scene, tables, cfg).reads_dn[-1],
                     np.float64)
    sig = ref > 10.0 * np.median(ref)
    ys, xs = np.where(sig)
    py, px = ys[ys.size // 2], xs[ys.size // 2]
    amp = np.zeros((S, S), np.float32)
    amp[py, px] = 0.1
    t2 = dataclasses.replace(tables, rts_amp=jnp.asarray(amp))
    states = []
    for i in range(12):
        s_i = dataclasses.replace(
            scene, key=jax.random.fold_in(jax.random.PRNGKey(3), i))
        got = np.asarray(simulate_exposure(s_i, t2, cfg).reads_dn[-1],
                         np.float64)
        ratio = got[py, px] / ref[py, px]
        assert abs(abs(ratio - 1.0) - 0.1) < 1e-3, ratio
        states.append(ratio > 1.0)
        mask = np.ones((S, S), bool)
        mask[py, px] = False
        np.testing.assert_array_equal(got[mask], ref[mask])
    assert any(states) and not all(states)            # both levels occur
    # determinism: same key -> same state
    s_0 = dataclasses.replace(
        scene, key=jax.random.fold_in(jax.random.PRNGKey(3), 0))
    again = np.asarray(simulate_exposure(s_0, t2, cfg).reads_dn[-1])
    assert (again[py, px] > ref[py, px]) == states[0]


@pytest.mark.slow
def test_closed_loop_rts_requires_dq_masking():
    """The point of DQ 32: unstable pixels in the window corrupt naive
    depths (time-varying -> does NOT cancel in ratios), and the
    DQ-aware repair recovers them."""
    n_exp = 40
    flags = dataclasses.replace(NoiseFlags.none(), poisson=True,
                                read_noise=True, sky=True, dark=True)
    cfg = ExposureStatic(subarray=S, n_lambda=NL, n_sub=4, nsamp=NSAMP,
                         samp_seq="SPARS10", scan=True, noise=flags,
                         band_px=48)
    tables = synthetic_tables("G141", subarray=S, n_lambda=NL,
                              samp_seq="SPARS10", nsamp=NSAMP)
    # a dense row of strong RTS pixels across the trace inside the
    # extraction window: every channel sees several
    amp = np.zeros((S, S), np.float32)
    amp[44, 74:124:2] = 0.25
    amp[52, 75:125:2] = 0.25
    t_rts = dataclasses.replace(tables, rts_amp=jnp.asarray(amp))

    base = example_scene(NL, scan_speed=1.0)
    base = dataclasses.replace(base, x_ref=jnp.float32(30.0),
                               y_ref=jnp.float32(30.0))
    starts = np.linspace(0.0, 4.0 * 3600.0, n_exp)
    scenes = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n_exp,) + x.shape), base)
    keys = jax.vmap(lambda i: jax.random.fold_in(
        jax.random.PRNGKey(11), i))(jnp.arange(n_exp))
    scenes = dataclasses.replace(
        scenes, exp_start_s=jnp.asarray(starts, jnp.float32), key=keys)
    out = simulate_visit(scenes, t_rts, cfg, chunk=8)
    exptime = float(tables.read_times[-1])
    mid = jnp.asarray(starts + exptime / 2.0, jnp.float32)

    dq = static_dq_plane(np.asarray(tables.dark_map),
                         np.asarray(tables.active_mask), rts_amp=amp)
    assert ((dq & DQ_UNSTABLE) != 0).sum() == (amp > 0).sum()
    dq_stack = np.broadcast_to(dq, (n_exp, NSAMP + 1, S, S))
    good = good_diff_masks_from_dq(jnp.asarray(dq_stack))

    kw = dict(y_window=(20, 75), x_window=(72, 126), bg_rows=(100, 126),
              n_chan=6)
    red = reduce_visit(out.reads_dn, tables.gain, mid, base.orbit,
                       good_diffs=good, **kw)
    naive = reduce_visit(out.reads_dn, tables.gain, mid, base.orbit, **kw)
    rp_hat, rp_sig = fit_depths(red.channel_lc, mid, base.orbit, base.ld,
                                jnp.float32(0.15))
    rp_naive, _ = fit_depths(naive.channel_lc, mid, base.orbit, base.ld,
                             jnp.float32(0.15))
    rp_hat = np.asarray(rp_hat)
    err_dq = np.abs(rp_hat - 0.1595).mean()
    err_naive = np.abs(np.asarray(rp_naive) - 0.1595).mean()
    tol = np.maximum(6.0 * np.asarray(rp_sig), 0.004)
    assert np.all(np.abs(rp_hat - 0.1595) < tol), (rp_hat, rp_sig)
    assert err_dq < err_naive, (err_dq, err_naive)
    assert DQ_STATIC_BAD & DQ_UNSTABLE


def test_yaml_knobs_write_dq32(tmp_path):
    from wayne_tpu.models.grism import make_calibrated_grism

    cfg = config_from_dict({
        "grism": "G141", "subarray": 128, "NSAMP": 3, "n_lambda": 32,
        "unstable_pixel_frac": 2e-3, "rts_amplitude": 0.06})
    grism = make_calibrated_grism(cfg)
    assert grism.tables.rts_amp is not None
    assert float(jnp.max(grism.tables.rts_amp)) > 0.0
