"""calwf3 NLINCORR: per-pixel cubic non-linearity inversion.

The detector compresses accumulated charge before readout; real
pipelines invert the cubic per read from the NLIN reference file before
any flux estimator runs. Unlike static flat/gain structure (which
cancels in depth ratios), the compression is flux-dependent — in-transit
and out-of-transit frames compress differently — so skipping the
correction biases recovered depths. Gates:

  1. the fixed-point inversion recovers the true charge to float32
     roundoff against the forward model (ops/exposure._apply_nonlinearity),
  2. the file-level closed loop (generate -> run_reduce) recovers depths
     correctly WITH the correction and measurably worse WITHOUT it,
  3. products simulated without non-linearity carry NLINCORR='OMIT' and
     are not "corrected".
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from wayne_tpu.calibration import synthetic_tables
from wayne_tpu.reduction import linearize_reads

RP_TRUE = 0.1595


def test_linearize_inverts_forward_model():
    from wayne_tpu.ops.exposure import _apply_nonlinearity

    t = synthetic_tables("G141", subarray=64, n_lambda=16,
                         samp_seq="SPARS10", nsamp=3)
    fw = float(t.full_well_e)
    rng = np.random.default_rng(0)
    q_true = jnp.asarray(rng.uniform(0, 0.95 * fw, (3, 64, 64)),
                         jnp.float32)
    meas = _apply_nonlinearity(q_true, t)
    gain = float(t.gain)
    dn = (meas + t.bias_map) / gain
    rec = linearize_reads(dn, t.nonlin_coeffs, fw, gain, bias_e=t.bias_map)
    err = np.abs(np.asarray(rec - q_true)) / fw
    assert err.max() < 1e-5, err.max()
    # the compression itself is far larger than the inversion residual
    # (otherwise this test is vacuous)
    assert float(jnp.abs(meas - q_true).max()) / fw > 1e-3

    # per-pixel gain map path (gain_variations products)
    dn_map = (meas + t.bias_map) / t.gain_map
    rec2 = linearize_reads(dn_map, t.nonlin_coeffs, fw, t.gain_map,
                           bias_e=t.bias_map)
    assert float(jnp.abs(rec2 - q_true).max()) / fw < 1e-5

    # saturated pixels clamp at full well instead of extrapolating
    sat = _apply_nonlinearity(jnp.full((1, 64, 64), fw, jnp.float32), t)
    rec3 = linearize_reads((sat + t.bias_map) / gain, t.nonlin_coeffs,
                           fw, gain, bias_e=t.bias_map)
    np.testing.assert_allclose(np.asarray(rec3), fw, rtol=1e-4)


def _pars(non_linear: bool) -> dict:
    return {"grism": "G141", "subarray": 128, "NSAMP": 4,
            "SAMPSEQ": "SPARS10", "scan": True, "x_ref": 30.0,
            "y_ref": 40.0, "num_orbits": 3, "exposures_per_orbit": 6,
            "n_lambda": 64, "n_sub": 4, "rp_over_rs": RP_TRUE,
            "start_mjd": 55999.93, "t0": 56000.0, "period": 0.813475,
            "sma_over_rs": 4.855, "inclination": 82.1, "seed": 5,
            # deterministic closed loop: only the flux-dependent
            # systematic under test (+ the pedestal/gain structure its
            # correction must see through)
            "noise": {"preset": "none", "non_linearity": non_linear,
                      "bias": True, "gain_variations": True}}


def _reduce(outdir, ppath, extra=()):
    from wayne_tpu.run_reduce import main as reduce_main

    rc = reduce_main(["-d", str(outdir), "-p", str(ppath), "--n-chan",
                      "4", "--cpu", "--detrend", "none", *extra])
    assert rc == 0
    rep = json.loads((outdir / "reduced.json").read_text())
    return rep, np.array([c["rp_over_rs"] for c in rep["channels"]])


@pytest.mark.slow
def test_nlincorr_closed_loop(tmp_path):
    from wayne_tpu.config import load_yaml
    from wayne_tpu.io.ima import read_ima
    from wayne_tpu.observation import Observation

    ppath = tmp_path / "pars.yml"
    ppath.write_text(yaml.safe_dump(_pars(True)))
    outdir = tmp_path / "visit"
    obs = Observation(load_yaml(str(ppath)))
    paths = obs.generate(str(outdir), chunk=6, progress=lambda s: None)

    hdr, _, _ = read_ima(paths[0])
    assert str(hdr["NLINCORR"]).strip() == "PERFORM"

    rep, rp = _reduce(outdir, ppath)
    assert rep["nlincorr"] is True
    err_corr = np.abs(rp - RP_TRUE)

    rep_no, rp_no = _reduce(outdir, ppath, ("--no-nlincorr",))
    assert rep_no["nlincorr"] is False
    err_raw = np.abs(rp_no - RP_TRUE)

    # corrected depths land on truth; uncorrected carry the
    # flux-dependent compression bias (gate BOTH directions so the
    # correction is proven to matter, like the CR-repair tests)
    assert err_corr.max() < 4e-4, (rp, rp_no)
    assert err_raw.max() > 3.0 * err_corr.max(), (rp, rp_no)


def test_omit_products_not_corrected(tmp_path):
    """A visit simulated WITHOUT non-linearity writes NLINCORR='OMIT';
    the reducer must leave it alone even when the YAML is ambiguous."""
    from wayne_tpu.config import load_yaml
    from wayne_tpu.io.ima import read_ima
    from wayne_tpu.observation import Observation

    ppath = tmp_path / "pars.yml"
    ppath.write_text(yaml.safe_dump(_pars(False)))
    outdir = tmp_path / "visit"
    obs = Observation(load_yaml(str(ppath)))
    paths = obs.generate(str(outdir), chunk=6, progress=lambda s: None)
    hdr, _, _ = read_ima(paths[0])
    assert str(hdr["NLINCORR"]).strip() == "OMIT"

    rep, rp = _reduce(outdir, ppath)
    assert rep["nlincorr"] is False
    assert np.abs(rp - RP_TRUE).max() < 4e-4, rp
