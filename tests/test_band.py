"""Banded-splat correctness: band path must reproduce the full-frame path."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from wayne_tpu.calibration import synthetic_tables
from wayne_tpu.config import ExposureStatic, NoiseFlags, ObservationConfig
from wayne_tpu.ops.exposure import simulate_exposure
from wayne_tpu.scene import example_scene

S, NL, NSAMP = 128, 64, 3


def _run(scan, band_px, noise=None, scan_speed=1.5):
    cfg = ExposureStatic(subarray=S, n_lambda=NL, n_sub=4, nsamp=NSAMP,
                         samp_seq="SPARS10", scan=scan,
                         noise=noise or NoiseFlags.none(), band_px=band_px)
    tables = synthetic_tables("G141", subarray=S, n_lambda=NL,
                              samp_seq="SPARS10", nsamp=NSAMP)
    scene = example_scene(NL, scan_speed=scan_speed if scan else 0.0)
    scene = dataclasses.replace(scene, x_ref=jnp.float32(30.0),
                                y_ref=jnp.float32(60.0))
    return simulate_exposure(scene, tables, cfg)


@pytest.mark.parametrize("scan", [False, True])
def test_band_matches_full_frame_ideal(scan):
    full = np.asarray(_run(scan, 0).ideal_e, np.float64)
    band = np.asarray(_run(scan, 48).ideal_e, np.float64)
    scale = full.max()
    # band truncates PSF tails beyond ~5 sigma (< 1e-5 of peak)
    np.testing.assert_allclose(band / scale, full / scale, atol=2e-5)


def test_band_matches_full_frame_reads_deterministic():
    flags = dataclasses.replace(NoiseFlags.none(), flat=True, bias=True,
                                gain_variations=True, non_linearity=True)
    full = np.asarray(_run(True, 0, flags).reads_dn)
    band = np.asarray(_run(True, 48, flags).reads_dn)
    np.testing.assert_allclose(band, full, rtol=1e-4, atol=0.05)


def test_band_clamped_at_detector_edge():
    # Scan beyond the top edge: band clamps, no crash, flux conserved
    # up to the off-detector part.
    res = _run(True, 48, scan_speed=12.0)   # 12 px/s * 30s -> way past edge
    assert np.isfinite(np.asarray(res.ideal_e)).all()


def test_auto_band_px():
    cfg = ObservationConfig(subarray=512, scan_speed_pix_s=1.0,
                            samp_seq="SPARS10", nsamp=15)
    band = cfg.auto_band_px()
    assert band % 16 == 0
    assert 10.0 + 20.0 <= band <= 64          # ~10 px scan per read + margin
    st = cfg.exposure_static()
    assert st.band_px == band

    staring = ObservationConfig(subarray=512, scan=False)
    assert staring.auto_band_px() == 32       # PSF + trace margin only
