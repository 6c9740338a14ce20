"""Exposure-time calculator (wayne_tpu/etc.py).

The planning questions real programs answer with STScI's ETC, computed
from the simulator's own kernel: a scan config with headroom must pass
clean, and the SAME brightness in staring mode must be flagged as
saturating (the trap the staring-mode validation ensemble hit: all the
flux on ~2 trace rows crosses full well).
"""

import numpy as np
import yaml

from wayne_tpu.config import load_yaml
from wayne_tpu.etc import main as etc_main, predict

BASE = {"grism": "G141", "subarray": 128, "NSAMP": 4,
        "SAMPSEQ": "SPARS10", "scan": True, "x_ref": 30.0,
        "y_ref": 40.0, "n_lambda": 64, "n_sub": 4, "seed": 0}


def _cfg(**kw):
    from wayne_tpu.config import config_from_dict

    return config_from_dict({**BASE, **kw})


def test_scan_config_has_headroom():
    rep = predict(_cfg())
    assert rep.first_saturating_read is None
    assert 0.0 < rep.peak_frac_full_well < 0.85
    assert rep.source_e_per_exposure > 1e5
    assert rep.background_e_per_px > 0.0
    assert rep.n_illuminated_columns > 20
    # the ramp estimator averages reads: never worse than CDS
    assert rep.snr_white_ramp >= rep.snr_white_cds > 0.0
    assert 0.0 < rep.snr_per_column_median < rep.snr_white_cds
    assert 0.0 < rep.duty_cycle < 1.0
    # peak charge grows monotonically up the ramp
    assert np.all(np.diff(rep.peak_e_per_read) > 0)
    assert rep.summary()   # renders


def test_staring_same_brightness_saturates():
    rep = predict(_cfg(scan=False))
    assert rep.first_saturating_read is not None
    assert rep.peak_frac_full_well >= 1.0
    assert any("full well" in w for w in rep.warnings)


def test_cli_exit_codes(tmp_path):
    p_ok = tmp_path / "ok.yml"
    p_ok.write_text(yaml.safe_dump(BASE))
    assert etc_main(["-p", str(p_ok), "--cpu"]) == 0
    p_sat = tmp_path / "sat.yml"
    p_sat.write_text(yaml.safe_dump({**BASE, "scan": False}))
    assert etc_main(["-p", str(p_sat), "--cpu"]) == 2
