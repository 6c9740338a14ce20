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


def test_predicted_noise_matches_realised_ensemble():
    """Close the ETC loop: the predicted white-light noise must match
    the empirically realised scatter of CDS white fluxes over a noise
    ensemble (poisson + read + sky + dark — exactly the terms the SNR
    formula carries). This keeps the ETC a *validated* planning tool:
    if the kernel's noise chain and the ETC formula ever drift apart,
    this is the test that notices.
    """
    import dataclasses

    import jax

    from wayne_tpu.config import NoiseFlags
    from wayne_tpu.observation import Observation
    from wayne_tpu.ops.exposure import simulate_exposure

    cfg = _cfg(n_sub=2)
    rep = predict(cfg)
    obs = Observation(cfg)
    flags = dataclasses.replace(
        NoiseFlags.none(), poisson=True, read_noise=True, sky=True,
        dark=True)
    det = dataclasses.replace(obs.static, noise=flags, use_pallas=False)
    scene0 = jax.tree_util.tree_map(lambda x: x[0], obs.scenes)

    # the ETC's extraction window, rebuilt from a noise-free run
    det0 = dataclasses.replace(obs.static, noise=NoiseFlags.none(),
                               use_pallas=False, compute_ideal=True)
    ideal = np.asarray(simulate_exposure(scene0, obs.tables, det0).ideal_e,
                       np.float64)
    col_sig = ideal.sum(axis=0)
    cols = np.where(col_sig > 0.05 * col_sig.max())[0]
    row_sig = ideal.sum(axis=1)
    rows = np.where(row_sig > 0.02 * row_sig.max())[0]

    n_mc = 64
    keys = jax.random.split(jax.random.PRNGKey(11), n_mc)
    batched = jax.vmap(lambda k: simulate_exposure(
        dataclasses.replace(scene0, key=k), obs.tables, det).reads_dn)
    reads = np.asarray(batched(keys), np.float64) * float(obs.tables.gain)
    cds = reads[:, -1] - reads[:, 0]                     # (n_mc, S, S)
    white = cds[:, rows][:, :, cols].sum(axis=(1, 2))    # (n_mc,)

    src_window = float(col_sig[cols].sum())
    predicted_noise_e = src_window / rep.snr_white_cds
    realised_noise_e = float(white.std(ddof=1))
    # n_mc=64 gives ~9% sampling error on the std; 25% is 2.8 sigma
    assert abs(realised_noise_e / predicted_noise_e - 1.0) < 0.25
    # and the realised mean source counts agree with the prediction
    bg_window = rep.background_e_per_px * len(rows) * len(cols)
    assert abs((white.mean() - bg_window) / src_window - 1.0) < 0.05


def test_cli_exit_codes(tmp_path):
    p_ok = tmp_path / "ok.yml"
    p_ok.write_text(yaml.safe_dump(BASE))
    assert etc_main(["-p", str(p_ok), "--cpu"]) == 0
    p_sat = tmp_path / "sat.yml"
    p_sat.write_text(yaml.safe_dump({**BASE, "scan": False}))
    assert etc_main(["-p", str(p_sat), "--cpu"]) == 2
