"""Static QE defects: dead pixels (DQ 4) and IR blobs (DQ 512).

Beyond hot pixels, real WFC3 IR detectors carry two more static defect
classes that calwf3 folds into the ima DQ planes from the bad-pixel
tables: dead/bad pixels (zero response, DQ bit 4) and "blobs" —
circular patches of reduced throughput from particulates on the
Channel Select Mechanism mirror (WFC3 ISR 2010-06, DQ bit 512). The
simulator carries both on the relative-QE plane
(calibration.Tables.qe_map -> the source response in ops/exposure),
flags them in the static DQ (io.ima.static_dq_plane), and the DQ-aware
reducer excludes/repairs them like hot pixels
(reduction.DQ_STATIC_BAD).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from wayne_tpu.calibration import synthetic_tables, with_loaded_qe
from wayne_tpu.config import ExposureStatic, NoiseFlags, config_from_dict
from wayne_tpu.io.ima import DQ_BLOB, DQ_DEAD, static_dq_plane
from wayne_tpu.ops.exposure import simulate_exposure
from wayne_tpu.reduction import (
    fit_depths, good_diff_masks_from_dq, reduce_visit)
from wayne_tpu.ops.visit import simulate_visit
from wayne_tpu.scene import example_scene

S, NL, NSAMP = 128, 64, 4


def test_synthetic_defects_leave_other_planes_untouched():
    """Enabling defects must not re-deal the flat/gain/dark RNG draws
    (the defect stream is independent) — the oracle-diff tests pin
    those planes."""
    clean = synthetic_tables("G141", subarray=S, n_lambda=NL, nsamp=NSAMP)
    defect = synthetic_tables("G141", subarray=S, n_lambda=NL, nsamp=NSAMP,
                              dead_frac=1e-3, n_blobs=3)
    assert np.asarray(clean.qe_map).min() == 1.0
    np.testing.assert_array_equal(np.asarray(clean.flat_coeffs),
                                  np.asarray(defect.flat_coeffs))
    np.testing.assert_array_equal(np.asarray(clean.dark_map),
                                  np.asarray(defect.dark_map))
    np.testing.assert_array_equal(np.asarray(clean.gain_map),
                                  np.asarray(defect.gain_map))
    qe = np.asarray(defect.qe_map)
    n_dead = int((qe == 0.0).sum())
    assert 0 < n_dead < 3 * 1e-3 * S * S          # ~dead_frac * S^2
    # blobs: a contiguous population of partially-attenuated pixels
    assert ((qe > 0.0) & (qe < 0.995)).sum() > 50


def test_static_dq_bits_for_defects():
    tables = synthetic_tables("G141", subarray=S, n_lambda=NL, nsamp=NSAMP,
                              dead_frac=1e-3, n_blobs=2)
    qe = np.asarray(tables.qe_map)
    dq = static_dq_plane(np.asarray(tables.dark_map),
                         np.asarray(tables.active_mask), qe_map=qe)
    dead = (dq & DQ_DEAD) != 0
    blob = (dq & DQ_BLOB) != 0
    np.testing.assert_array_equal(dead, qe < 0.05)
    assert not (dead & blob).any()                # classes are exclusive
    assert blob.sum() > 50
    assert (qe[blob] < 0.98).all()


def _noise_free_frame(tables):
    flags = NoiseFlags.none()
    cfg = ExposureStatic(subarray=S, n_lambda=NL, n_sub=2, nsamp=NSAMP,
                         samp_seq="SPARS10", scan=True, noise=flags,
                         band_px=48)
    scene = example_scene(NL, scan_speed=0.5)
    scene = dataclasses.replace(scene, x_ref=jnp.float32(30.0),
                                y_ref=jnp.float32(30.0))
    out = simulate_exposure(scene, tables, cfg)
    return np.asarray(out.reads_dn[-1], np.float64)   # last read, DN


def test_defects_attenuate_source_only_at_defect_pixels():
    """A hand-placed dead pixel reads zero source signal; a hand-placed
    50%-QE patch reads exactly half; every other pixel is bit-identical
    to the defect-free frame."""
    tables = synthetic_tables("G141", subarray=S, n_lambda=NL, nsamp=NSAMP)
    ref = _noise_free_frame(tables)
    sig = ref > 10.0 * np.median(ref)             # spectrum footprint
    ys, xs = np.where(sig)
    assert ys.size > 100
    py, px = ys[ys.size // 2], xs[ys.size // 2]   # a bright trace pixel
    qe = np.ones((S, S), np.float32)
    qe[py, px] = 0.0                              # dead on the trace
    qe[py, px + 2] = 0.5                          # blob-like attenuation
    t2 = dataclasses.replace(tables, qe_map=jnp.asarray(qe))
    got = _noise_free_frame(t2)
    assert got[py, px] == 0.0
    np.testing.assert_allclose(got[py, px + 2], 0.5 * ref[py, px + 2],
                               rtol=1e-5)
    mask = np.ones((S, S), bool)
    mask[py, px] = mask[py, px + 2] = False
    np.testing.assert_array_equal(got[mask], ref[mask])


def test_closed_loop_defects_repaired_spectra_match_clean():
    """A noisy visit with dead pixels + blobs in the extraction window:
    DQ-aware reduction (static bits from the calibration) recovers the
    injected depths, and the repaired defect spectra track the
    defect-free visit of the same keys."""
    n_exp = 40
    flags = dataclasses.replace(NoiseFlags.none(), poisson=True,
                                read_noise=True, sky=True, dark=True)
    cfg = ExposureStatic(subarray=S, n_lambda=NL, n_sub=4, nsamp=NSAMP,
                         samp_seq="SPARS10", scan=True, noise=flags,
                         band_px=48)
    tables = synthetic_tables("G141", subarray=S, n_lambda=NL,
                              samp_seq="SPARS10", nsamp=NSAMP)
    # Hand-placed defects dense enough to matter: a dead column segment
    # and a 6-px blob, both inside the y/x extraction window below.
    qe = np.ones((S, S), np.float32)
    qe[40:60, 90] = 0.0
    yy, xx = np.mgrid[0:S, 0:S]
    r2 = ((yy - 45.0) ** 2 + (xx - 105.0) ** 2) / 6.0 ** 2
    qe *= 1.0 - 0.15 * np.exp(-r2 ** 2)
    t_def = dataclasses.replace(tables, qe_map=jnp.asarray(qe))

    base = example_scene(NL, scan_speed=1.0)
    base = dataclasses.replace(base, x_ref=jnp.float32(30.0),
                               y_ref=jnp.float32(30.0))
    starts = np.linspace(0.0, 4.0 * 3600.0, n_exp)
    scenes = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n_exp,) + x.shape), base)
    keys = jax.vmap(lambda i: jax.random.fold_in(
        jax.random.PRNGKey(5), i))(jnp.arange(n_exp))
    scenes = dataclasses.replace(
        scenes, exp_start_s=jnp.asarray(starts, jnp.float32), key=keys)

    out_def = simulate_visit(scenes, t_def, cfg, chunk=8)
    out_ref = simulate_visit(scenes, tables, cfg, chunk=8)
    exptime = float(tables.read_times[-1])
    mid = jnp.asarray(starts + exptime / 2.0, jnp.float32)

    dq = static_dq_plane(np.asarray(tables.dark_map),
                         np.asarray(tables.active_mask), qe_map=qe)
    dq_stack = np.broadcast_to(dq, (n_exp, NSAMP + 1, S, S))
    good = good_diff_masks_from_dq(jnp.asarray(dq_stack))

    kw = dict(y_window=(20, 75), x_window=(72, 126), bg_rows=(100, 126),
              n_chan=6)
    red = reduce_visit(out_def.reads_dn, tables.gain, mid, base.orbit,
                       good_diffs=good, **kw)
    ref = reduce_visit(out_ref.reads_dn, tables.gain, mid, base.orbit, **kw)
    rp_hat, rp_sig = fit_depths(red.channel_lc, mid, base.orbit, base.ld,
                                jnp.float32(0.15))
    rp_hat, rp_sig = np.asarray(rp_hat), np.asarray(rp_sig)
    tol = np.maximum(6.0 * np.asarray(rp_sig), 0.004)
    assert np.all(np.abs(rp_hat - 0.1595) < tol), (rp_hat, rp_sig)
    # repaired white flux tracks the defect-free visit to <0.5%
    w_def = np.asarray(red.white_lc)
    w_ref = np.asarray(ref.white_lc)
    assert np.abs(w_def / w_ref - 1.0).max() < 5e-3


def test_yaml_knobs_and_qe_file_loader(tmp_path):
    from wayne_tpu.models.grism import make_calibrated_grism

    cfg = config_from_dict({
        "grism": "G141", "subarray": 128, "NSAMP": 3, "n_lambda": 32,
        "dead_pixel_frac": 1e-3, "n_blobs": 2})
    grism = make_calibrated_grism(cfg)
    assert float(jnp.min(grism.tables.qe_map)) == 0.0

    # qe_file seam: an int DQ-bit plane (bad-pixel-table style)
    from wayne_tpu.io.fits import FitsHDU, write_fits
    bits = np.zeros((128, 128), np.int16)
    bits[10, 10] = 4
    bits[20:24, 20:24] = 512
    write_fits(str(tmp_path / "badpix.fits"),
               [FitsHDU(data=None), FitsHDU(data=bits)])
    tables = synthetic_tables("G141", subarray=128, n_lambda=32, nsamp=3)
    loaded = with_loaded_qe(tables, str(tmp_path / "badpix.fits"))
    qe = np.asarray(loaded.qe_map)
    assert qe[10, 10] == 0.0
    np.testing.assert_allclose(qe[20:24, 20:24], 0.88)
    assert (qe == 1.0).sum() == 128 * 128 - 1 - 16
