"""Omnibus closed loop: EVERY simulated systematic on at once.

Each systematic has its own closed-loop test (test_recte, test_persistence,
test_bias_drift, test_dq_reduction, test_trends); this is the interaction
guard — the kitchen-sink example config (examples/wasp43b_full_systematics.yml:
RECTE + persistence + IPC + bias drift + breathing + sky variation +
random-walk SSV on top of the full noise chain) shrunk to CPU shapes and
driven through the real user surface: Observation.generate() -> ima files
-> run_reduce --detrend ramp. Recovery QUALITY is gated at ensemble scale
by tools/validate_recovery.py; here the assertions are structural
(products well-formed, ramps monotone, spectra finite) plus a loose
depth band that catches a systematic interaction blowing up.
"""

import json
import os

import numpy as np
import pytest
import yaml

from wayne_tpu.config import config_from_dict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLE = os.path.join(REPO, "examples", "wasp43b_full_systematics.yml")

RP_TRUE = 0.1595


def _tiny_full_systematics_params() -> dict:
    with open(EXAMPLE) as fh:
        params = yaml.safe_load(fh)
    params["observation"].update(
        subarray=128, NSAMP=4, num_orbits=3, exposures_per_orbit=6,
        start_mjd=55999.93, x_ref=30.0, y_ref=40.0, n_lambda=64, n_sub=4)
    params["observation"].pop("outdir", None)
    # Keep the companion ON (interaction coverage) but faint: the
    # example's 2.4-mag-fainter neighbour chromatically dilutes the red
    # channels by ~1e-2 in rp — a REAL modeled effect (gated in
    # test_companions / test_retrieval), not the interaction bug this
    # loose band exists to catch.
    for comp in params.get("companions", []):
        comp["mag_j"] = 15.0
    return params


@pytest.mark.slow
def test_everything_on_generate_then_reduce(tmp_path):
    from wayne_tpu.io.ima import read_ima
    from wayne_tpu.observation import Observation
    from wayne_tpu.run_reduce import main as reduce_main

    params = _tiny_full_systematics_params()
    cfg = config_from_dict(params)
    # The example turns every beyond-reference systematic on; make sure
    # the shrink didn't drop any of them.
    assert cfg.noise.ipc and cfg.noise.bias_drift
    assert cfg.recte.enabled and cfg.persistence.enabled
    assert cfg.trends.breathing_amp > 0 and cfg.trends.sky_orbit_amp > 0
    assert cfg.trends.ssv_rw_amplitude > 0

    outdir = tmp_path / "visit"
    obs = Observation(cfg)
    paths = obs.generate(str(outdir), chunk=6, progress=lambda s: None)
    assert len(paths) == obs.plan.n_exposures

    hdr, reads, times = read_ima(paths[0])
    assert hdr["NSAMP"] == cfg.nsamp + 1
    assert np.isfinite(reads).all()
    # up-the-ramp accumulation survives the stacked systematics
    ramp = reads.sum(axis=(1, 2))
    assert np.all(np.diff(ramp) > 0)

    ppath = tmp_path / "pars.yml"
    ppath.write_text(yaml.safe_dump(params))
    rc = reduce_main(["-d", str(outdir), "-p", str(ppath), "--n-chan", "4",
                      "--cpu", "--detrend", "ramp"])
    assert rc == 0
    rep = json.loads((outdir / "reduced.json").read_text())
    assert rep["dq_repair"] is True
    rp = np.array([c["rp_over_rs"] for c in rep["channels"]], dtype=float)
    assert np.isfinite(rp).all()
    # loose interaction band: one 18-exposure visit under the full
    # systematics stack is not a precision measurement (ensemble gates
    # live in VALIDATION.json) — but a bad interaction (persistence map
    # misapplied, drift uncorrected, trap ramp double-counted...) throws
    # depths far outside this.
    assert np.all(np.abs(rp - RP_TRUE) < 0.015), rp
