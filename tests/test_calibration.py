"""Calibration loader-seam tests: aXe conf, sensitivity, flat cube, sky."""

import numpy as np

from wayne_tpu.calibration import (
    load_axe_conf, load_sensitivity_ascii, synthetic_tables, with_loaded_grism,
)
from wayne_tpu.io.fits import FitsHDU, write_fits
import pytest


def test_axe_conf_parsing(tmp_path):
    conf = tmp_path / "g141.conf"
    conf.write_text(
        "# aXe configuration\n"
        "DYDX_ORDER_A 1\n"
        "DYDX_A_0 1.96882 9.09159E-5 -1.93260E-3\n"
        "DYDX_A_1 1.04275E-2 -7.96978E-6 -2.49607E-6\n"
        "DLDP_A_0 8949.40742 0.08044033 -0.00927970 ; comment\n"
        "DLDP_A_1 44.97227 0.0004927891 0.0035782416\n")
    out = load_axe_conf(str(conf))
    assert out["DYDX_A_0"][0] == 1.96882
    # Angstrom -> micron conversion on DLDP only
    np.testing.assert_allclose(out["DLDP_A_0"][0], 0.894940742)
    np.testing.assert_allclose(out["DLDP_A_1"][0], 4.497227e-3)
    assert out["DYDX_A_1"].shape == (6,)


def test_sensitivity_ascii_angstrom_detection(tmp_path):
    p = tmp_path / "sens.txt"
    wl_a = np.linspace(10750, 17000, 50)
    np.savetxt(p, np.stack([wl_a, np.full(50, 1.5e16)], axis=1))
    wl, sens = load_sensitivity_ascii(str(p))
    assert wl.max() < 2.0   # converted to micron


def test_with_loaded_flat_and_sky(tmp_path):
    tables = synthetic_tables("G141", subarray=64, n_lambda=16, nsamp=2)
    # full-frame-ish (128) products, cut to the 64 subarray
    cube = np.ones((4, 128, 128), np.float32)
    cube[0] += 0.01
    cube[1] *= 0.0
    flat_path = tmp_path / "flat.fits"
    write_fits(str(flat_path), [FitsHDU(data=cube)])
    sky = np.ones((128, 128), np.float32) * 3.0
    sky[0, 0] = 4.0
    sky_path = tmp_path / "sky.fits"
    write_fits(str(sky_path), [FitsHDU(header={}), FitsHDU("SKY", 1, sky)])

    out = with_loaded_grism(tables, flat_path=str(flat_path),
                            sky_path=str(sky_path))
    assert out.flat_coeffs.shape == (4, 64, 64)
    np.testing.assert_allclose(np.asarray(out.flat_coeffs[0]), 1.01)
    np.testing.assert_allclose(float(np.asarray(out.sky_frame).mean()), 1.0,
                               rtol=1e-5)
    # the He airglow frame loads through the same seam, independently
    he = np.ones((128, 128), np.float32)
    he[:, :64] = 2.0
    he_path = tmp_path / "sky_he.fits"
    write_fits(str(he_path), [FitsHDU(header={}), FitsHDU("HESKY", 1, he)])
    out2 = with_loaded_grism(tables, sky_he_path=str(he_path))
    np.testing.assert_allclose(
        float(np.asarray(out2.sky_he_frame).mean()), 1.0, rtol=1e-5)
    # and did not touch the continuum master sky
    np.testing.assert_allclose(np.asarray(out2.sky_frame),
                               np.asarray(tables.sky_frame))


def test_with_loaded_conf_changes_trace(tmp_path):
    conf = tmp_path / "g141.conf"
    conf.write_text("DYDX_A_0 5.0\nDYDX_A_1 0.0\nDLDP_A_0 9000.0\n"
                    "DLDP_A_1 46.0\n")
    tables = synthetic_tables("G141", subarray=64, n_lambda=16, nsamp=2)
    out = with_loaded_grism(tables, conf_path=str(conf))
    assert float(out.dydx0[0]) == 5.0
    np.testing.assert_allclose(float(out.dldp1[0]), 4.6e-3)


def test_with_loaded_nonlin_cube(tmp_path):
    from wayne_tpu.calibration import load_nonlin_cube_fits, with_loaded_nonlin

    tables = synthetic_tables("G141", subarray=64, n_lambda=16, nsamp=2)
    # full-frame-ish (128) cube of (c1, c2, c3) planes, cut to the subarray
    cube = np.stack([np.full((128, 128), 0.01, np.float32),
                     np.full((128, 128), 0.02, np.float32),
                     np.full((128, 128), 0.03, np.float32)])
    cube[0, 32, 32] = 0.5   # a marked pixel inside the 64-px centered cutout
    path = tmp_path / "nonlin.fits"
    write_fits(str(path), [FitsHDU(data=cube)])

    loaded = load_nonlin_cube_fits(str(path), 64)
    assert loaded.shape == (3, 64, 64)
    np.testing.assert_allclose(loaded[0, 0, 0], 0.5)   # 128->64 cutout: -32
    np.testing.assert_allclose(loaded[1], 0.02)

    out = with_loaded_nonlin(tables, str(path))
    assert out.nonlin_coeffs.shape == (3, 64, 64)
    np.testing.assert_allclose(np.asarray(out.nonlin_coeffs[2]), 0.03,
                               rtol=1e-6)


def test_nonlin_cube_wrong_plane_count(tmp_path):
    import pytest

    from wayne_tpu.calibration import load_nonlin_cube_fits

    path = tmp_path / "bad.fits"
    write_fits(str(path), [FitsHDU(data=np.ones((2, 64, 64), np.float32))])
    with pytest.raises(ValueError, match="3 coefficient planes"):
        load_nonlin_cube_fits(str(path), 64)


def test_imaging_tables_undispersed():
    from wayne_tpu.calibration import imaging_tables
    from wayne_tpu.ops.dispersion import trace_params, trace_y, wl_to_x

    tables = synthetic_tables("G141", subarray=64, n_lambda=32, nsamp=2)
    img = imaging_tables(tables, "F140W", nsamp=3, samp_seq="RAPID")

    # every wavelength lands at x_ref (undispersed) on a flat trace
    import jax.numpy as jnp
    tp = trace_params(img, jnp.float32(30.0), jnp.float32(20.0))
    x = np.asarray(wl_to_x(img.wl_centers, tp))
    assert np.ptp(x) < 1e-3 and abs(x.mean() - 30.0) < 1e-3
    y = np.asarray(trace_y(jnp.asarray(x), tp))
    np.testing.assert_allclose(y, 20.0, atol=1e-5)

    # bandpass: sensitivity concentrated inside the F140W window
    wl = np.asarray(img.wl_centers)
    sens = np.asarray(img.sensitivity)
    inside = (wl > 1.33) & (wl < 1.59)
    assert sens[inside].min() > 0.5 * sens.max()
    assert sens[wl < 1.20].max() < 0.05 * sens.max()

    # flat cube collapsed: only the constant plane survives
    np.testing.assert_array_equal(np.asarray(img.flat_coeffs[1:]), 0.0)
    # imaging sample sequence replaces the grism read times
    assert img.read_times.shape == (4,)
    assert float(img.read_times[-1]) < float(tables.read_times[-1])


def test_reference_pixel_border():
    import dataclasses
    import jax.numpy as jnp
    from wayne_tpu.config import ExposureStatic, NoiseFlags
    from wayne_tpu.ops.exposure import simulate_exposure
    from wayne_tpu.scene import example_scene

    full = synthetic_tables("G141", subarray=1024, n_lambda=16, nsamp=1)
    sub = synthetic_tables("G141", subarray=64, n_lambda=16, nsamp=1)
    am_full = np.asarray(full.active_mask)
    assert am_full[0, 0] == 0 and am_full[4, 500] == 0
    assert am_full[5, 5] == 1 and am_full[512, 512] == 1
    np.testing.assert_array_equal(np.asarray(sub.active_mask), 1.0)

    # dark/sky never accumulate in the reference border
    flags = dataclasses.replace(NoiseFlags.none(), dark=True, sky=True)
    cfg = ExposureStatic(subarray=1024, n_lambda=16, n_sub=1, nsamp=1,
                         samp_seq="RAPID", scan=False, noise=flags,
                         transit_quad=16)
    scene = example_scene(16, scan_speed=0.0)
    scene = dataclasses.replace(
        scene, stellar_flux=jnp.zeros_like(scene.stellar_flux))
    res = simulate_exposure(scene, full, cfg)
    last = np.asarray(res.reads_dn[-1])
    assert abs(last[2, 2]) < 1e-4          # border: nothing accumulated
    assert last[512, 512] > 0.1            # interior: sky+dark present


@pytest.mark.slow
def test_full_real_calibration_visit(tmp_path):
    """SURVEY §9 rehearsal: a COMPLETE set of STScI-format calibration
    files (aXe conf, sensitivity ASCII, flat cube, master sky, nonlin
    cube, exact sequence timing) drives a whole visit through the YAML
    ``calibration:`` block — the drop-in-real-files path end to end."""
    import json

    import jax
    import yaml

    from wayne_tpu.calibration import _SEQUENCE_OVERRIDES
    from wayne_tpu.config import load_yaml
    from wayne_tpu.io.ima import read_ima
    from wayne_tpu.observation import Observation

    conf = tmp_path / "g141.conf"
    conf.write_text(
        "DYDX_A_0 2.5\nDYDX_A_1 0.012\n"
        "DLDP_A_0 9000.0\nDLDP_A_1 46.0\n")
    sens = tmp_path / "sens.txt"
    wl_a = np.linspace(10750, 17000, 64)
    np.savetxt(sens, np.stack([wl_a, np.full(64, 1.3e16)], axis=1))
    flat = tmp_path / "flat.fits"
    cube = np.ones((4, 128, 128), np.float32) * np.array(
        [1.02, 0.0, 0.0, 0.0], np.float32)[:, None, None]
    write_fits(str(flat), [FitsHDU(data=cube)])
    sky = tmp_path / "sky.fits"
    write_fits(str(sky), [FitsHDU(data=np.full((128, 128), 2.0, np.float32))])
    nonlin = tmp_path / "nonlin.fits"
    write_fits(str(nonlin), [FitsHDU(data=np.stack(
        [np.full((128, 128), 0.015, np.float32),
         np.full((128, 128), 0.01, np.float32),
         np.full((128, 128), 0.005, np.float32)]))])
    seq = tmp_path / "seq.json"
    seq.write_text(json.dumps({"SPARS25/64": [0.0, 0.061, 11.75, 23.5]}))

    pars = {"grism": "G141", "subarray": 64, "NSAMP": 3,
            "SAMPSEQ": "SPARS25", "scan": True, "x_ref": 20.0,
            "y_ref": 30.0, "num_orbits": 1, "exposures_per_orbit": 2,
            "n_lambda": 32, "n_sub": 2,
            "calibration": {
                "axe_conf": str(conf), "sensitivity_file": str(sens),
                "flat_file": str(flat), "sky_file": str(sky),
                "nonlin_file": str(nonlin), "sequence_file": str(seq)}}
    ppath = tmp_path / "pars.yml"
    ppath.write_text(yaml.safe_dump(pars))
    cfg = load_yaml(str(ppath))
    assert cfg.calibration.axe_conf == str(conf)
    obs = Observation(cfg)
    # the loaded timing is SCOPED to visit construction: nothing leaks
    # into the process-global registry for later visits
    assert ("SPARS25", 64) not in _SEQUENCE_OVERRIDES
    # every table came from the files
    np.testing.assert_allclose(float(obs.tables.dydx0[0]), 2.5)
    np.testing.assert_allclose(float(obs.tables.dldp1[0]), 4.6e-3)
    np.testing.assert_allclose(np.asarray(obs.tables.sensitivity),
                               1.3e16, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(obs.tables.flat_coeffs[0]),
                               1.02, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(obs.tables.sky_frame), 1.0,
                               rtol=1e-6)   # normalised to mean 1
    np.testing.assert_allclose(np.asarray(obs.tables.nonlin_coeffs[0]),
                               0.015, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(obs.tables.read_times),
                               [0.0, 0.061, 11.75, 23.5])
    assert obs.detector_exptime == 23.5
    # and a visit generates real products with the loaded timing
    paths = obs.generate(str(tmp_path / "out"), chunk=2,
                         progress=lambda s: None)
    hdr, reads, times = read_ima(paths[0])
    assert hdr["EXPTIME"] == 23.5
    np.testing.assert_allclose(times, [0.0, 0.061, 11.75, 23.5])
    assert np.isfinite(reads).all() and reads.sum() > 0
    # the conf's trace feeds the dispersion: spectrum at the conf
    # wavelength solution, not the synthetic default
    x = obs.grism.wl_to_x(np.array([1.2]), 20.0, 30.0)
    np.testing.assert_allclose(x, 20.0 + (1.2 - 0.9) / 4.6e-3, rtol=5e-3)


def test_calibration_block_config_handling(tmp_path):
    """Nested placement, empty entries and typos in the calibration
    block behave sanely."""
    import pytest

    from wayne_tpu.config import config_from_dict

    conf = tmp_path / "g.conf"
    conf.write_text("DYDX_A_0 1.0\nDYDX_A_1 0.0\nDLDP_A_0 9000.0\n"
                    "DLDP_A_1 46.0\n")
    # nested under observation: (reference-style layout) works
    cfg = config_from_dict({"observation": {
        "grism": "G141", "calibration": {"axe_conf": str(conf)}}})
    assert cfg.calibration.axe_conf == str(conf)
    # YAML null / empty entries keep the synthetic default
    cfg2 = config_from_dict({"calibration": {"axe_conf": None,
                                             "flat_file": ""}})
    assert not cfg2.calibration.any_set()
    # a typo'd key fails loudly instead of silently running synthetic
    with pytest.raises(ValueError, match="unknown calibration keys"):
        config_from_dict({"calibration": {"sensitivity": "s.txt"}})


def test_sequence_scope_restores_after_malformed_file(tmp_path):
    """A file that raises after registering its first entry must not
    leak overrides (load happens inside the scope's try)."""
    import json

    import pytest

    from wayne_tpu.calibration import _SEQUENCE_OVERRIDES, sequence_tables_scope

    bad = tmp_path / "seq.json"
    bad.write_text(json.dumps({
        "SPARS25/64": [0.0, 1.0, 2.0],
        "SPARS50/64": [0.0, 5.0, 4.0],   # non-increasing: raises
    }))
    with pytest.raises(ValueError):
        with sequence_tables_scope(str(bad)):
            pass
    assert ("SPARS25", 64) not in _SEQUENCE_OVERRIDES
    assert ("SPARS50", 64) not in _SEQUENCE_OVERRIDES
