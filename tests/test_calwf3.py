"""calwf3-equivalent ima -> flt calibration (wayne_tpu/calwf3.py).

Closed loop: a visit simulated with the deterministic detector chain ON
(non-linearity, bias pedestal, per-pixel gain, dark, cosmic rays) is
calibrated to flt; the flt SCI rate must land on the rate of the SAME
visit simulated with everything OFF (the clean-photon truth) on every
DQ-clean pixel — i.e. BLEVCORR/NLINCORR/DARKCORR/CRCORR jointly undo
what the detector chain applied.
"""

import numpy as np
import yaml

from wayne_tpu.config import load_yaml
from wayne_tpu.observation import Observation
import pytest

BASE = {"grism": "G141", "subarray": 128, "NSAMP": 4,
        "SAMPSEQ": "SPARS10", "scan": True, "x_ref": 30.0,
        "y_ref": 40.0, "num_orbits": 1, "exposures_per_orbit": 3,
        "n_lambda": 64, "n_sub": 4, "rp_over_rs": 0.0, "seed": 11}

CHAIN_ON = {"preset": "none", "non_linearity": True, "bias": True,
            "gain_variations": True, "dark": True, "cosmic_rays": True}


def _generate(tmp_path, name, noise):
    pars = dict(BASE, noise=noise)
    ppath = tmp_path / f"{name}.yml"
    ppath.write_text(yaml.safe_dump(pars))
    outdir = tmp_path / name
    obs = Observation(load_yaml(str(ppath)))
    paths = obs.generate(str(outdir), chunk=3, progress=lambda s: None)
    return ppath, outdir, paths


@pytest.mark.slow
def test_flt_recovers_clean_rate(tmp_path):
    from wayne_tpu.calwf3 import read_flt
    from wayne_tpu.io.ima import read_ima
    from wayne_tpu.run_calwf3 import main as calwf3_main

    ppath, outdir, paths = _generate(tmp_path, "chain", CHAIN_ON)
    rc = calwf3_main(["-d", str(outdir), "-p", str(ppath), "--cpu"])
    assert rc == 0

    # clean-photon truth: same visit, whole detector chain off
    _, clean_dir, clean_paths = _generate(tmp_path, "clean",
                                          {"preset": "none"})

    for p_ima, p_clean in zip(paths, clean_paths):
        p_flt = p_ima.replace("_ima.fits", "_flt.fits")
        hdr, sci, err, dq = read_flt(p_flt)
        assert hdr["BUNIT"] == "ELECTRONS/S"
        for k in ("NLINCORR", "DARKCORR", "CRCORR", "UNITCORR"):
            assert str(hdr[k]).strip() == "COMPLETE", k
        assert str(hdr["FLATCORR"]).strip() == "OMIT"

        _, reads_c, times_c = read_ima(p_clean)
        T = float(times_c[-1] - times_c[0])
        # noise-off products carry unit-gain-scaled DN: electrons = DN *
        # scalar gain (no bias, no nonlin by construction)
        from wayne_tpu.calibration import synthetic_tables
        t = synthetic_tables("G141", subarray=128, n_lambda=64,
                             samp_seq="SPARS10", nsamp=4)
        truth = (reads_c[-1] - reads_c[0]) * float(t.gain) / T

        clean_px = dq == 0
        assert clean_px.mean() > 0.95          # DQ flags are sparse
        resid = np.abs(sci - truth)[clean_px]
        # the chain must undo bias/gain/dark/non-linearity to well below
        # the per-pixel rate scale (peak ~ hundreds of e-/s)
        assert np.percentile(resid, 99) < 0.05, np.percentile(resid, 99)
        assert resid.max() < 1.0, resid.max()
        assert np.isfinite(err).all() and (err > 0).all()

    # cosmic rays were simulated: at least one exposure carries the bit
    dqs = [read_flt(p.replace("_ima.fits", "_flt.fits"))[3]
           for p in paths]
    assert any((d & 8192).any() for d in dqs)


def test_flt_staring_uses_ramp_fit(tmp_path):
    """Staring exposures (linear ramps) calibrate with the up-the-ramp
    LS slope — read-noise-optimal — and recover the clean rate too."""
    from wayne_tpu.calwf3 import calibrate_ima
    from wayne_tpu.calibration import synthetic_tables
    from wayne_tpu.config import config_from_dict
    from wayne_tpu.io.ima import read_ima

    pars_on = dict(BASE, scan=False, noise=CHAIN_ON)
    pars_off = dict(BASE, scan=False, noise={"preset": "none"})
    ppath = tmp_path / "stare.yml"
    ppath.write_text(yaml.safe_dump(pars_on))
    obs = Observation(load_yaml(str(ppath)))
    paths = obs.generate(str(tmp_path / "stare"), chunk=3,
                         progress=lambda s: None)
    ppath2 = tmp_path / "stare_clean.yml"
    ppath2.write_text(yaml.safe_dump(pars_off))
    obs2 = Observation(load_yaml(str(ppath2)))
    clean = obs2.generate(str(tmp_path / "stare_clean"), chunk=3,
                          progress=lambda s: None)

    t = synthetic_tables("G141", subarray=128, n_lambda=64,
                         samp_seq="SPARS10", nsamp=4)
    cfg = config_from_dict(pars_on)
    flt = calibrate_ima(paths[0], t, cfg.noise)
    assert str(flt.header["SCAN_TYP"]).strip() == "N"
    _, reads_c, times_c = read_ima(clean[0])
    T = float(times_c[-1] - times_c[0])
    truth = (reads_c[-1] - reads_c[0]) * float(t.gain) / T
    resid = np.abs(flt.sci - truth)[flt.dq == 0]
    assert np.percentile(resid, 99) < 0.05 and resid.max() < 1.0


def test_flt_rejects_rate_products(tmp_path):
    import pytest

    from wayne_tpu.calwf3 import calibrate_ima
    from wayne_tpu.calibration import synthetic_tables
    from wayne_tpu.config import config_from_dict

    pars = dict(BASE, noise={"preset": "none"}, output_units="e_per_s")
    ppath = tmp_path / "rate.yml"
    ppath.write_text(yaml.safe_dump(pars))
    outdir = tmp_path / "rate"
    obs = Observation(load_yaml(str(ppath)))
    paths = obs.generate(str(outdir), chunk=3, progress=lambda s: None)
    t = synthetic_tables("G141", subarray=128, n_lambda=64,
                         samp_seq="SPARS10", nsamp=4)
    cfg = config_from_dict(dict(BASE, noise={"preset": "none"}))
    with pytest.raises(ValueError, match="count-rate"):
        calibrate_ima(paths[0], t, cfg.noise)


def test_flt_scan_nsamp1_uses_cds(tmp_path):
    """Scan-mode products are calibrated with the CDS net, which only
    needs two reads: an NSAMP=1 scan visit must calibrate (the
    up-the-ramp minimum applies to STARING products only)."""
    import pytest

    from wayne_tpu.calwf3 import calibrate_ima
    from wayne_tpu.calibration import synthetic_tables
    from wayne_tpu.config import config_from_dict
    from wayne_tpu.io.ima import read_ima

    pars = dict(BASE, NSAMP=1, noise={"preset": "none",
                                      "non_linearity": True})
    ppath = tmp_path / "scan1.yml"
    ppath.write_text(yaml.safe_dump(pars))
    obs = Observation(load_yaml(str(ppath)))
    paths = obs.generate(str(tmp_path / "scan1"), chunk=3,
                         progress=lambda s: None)
    pars_off = dict(BASE, NSAMP=1, noise={"preset": "none"})
    ppath2 = tmp_path / "scan1_clean.yml"
    ppath2.write_text(yaml.safe_dump(pars_off))
    obs2 = Observation(load_yaml(str(ppath2)))
    clean = obs2.generate(str(tmp_path / "scan1_clean"), chunk=3,
                          progress=lambda s: None)

    t = synthetic_tables("G141", subarray=128, n_lambda=64,
                         samp_seq="SPARS10", nsamp=1)
    cfg = config_from_dict(pars)
    flt = calibrate_ima(paths[0], t, cfg.noise)
    assert str(flt.header["SCAN_TYP"]).strip() == "C"
    _, reads_c, times_c = read_ima(clean[0])
    T = float(times_c[-1] - times_c[0])
    truth = (reads_c[-1] - reads_c[0]) * float(t.gain) / T
    resid = np.abs(flt.sci - truth)[flt.dq == 0]
    assert np.percentile(resid, 99) < 0.05 and resid.max() < 1.0

    # ... while a STARING NSAMP=1 product still refuses the ramp fit
    pars_st = dict(BASE, NSAMP=1, scan=False, noise={"preset": "none"})
    ppath3 = tmp_path / "stare1.yml"
    ppath3.write_text(yaml.safe_dump(pars_st))
    obs3 = Observation(load_yaml(str(ppath3)))
    stare = obs3.generate(str(tmp_path / "stare1"), chunk=3,
                          progress=lambda s: None)
    with pytest.raises(ValueError, match="up-the-ramp"):
        calibrate_ima(stare[0], t, config_from_dict(pars_st).noise)
