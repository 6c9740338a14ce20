"""Chromatic limb darkening in the depth fits.

Limb darkening is wavelength-dependent (stronger in the blue); the
simulator carries per-wavelength Claret tables (Scene.ld (NL, 4) via
ld_file), so the reducer must fit each channel with ITS coefficients —
a band-mean fit maps the LD error into an Rp/Rs tilt at the band edges.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wayne_tpu.ops.kepler import projected_separation
from wayne_tpu.ops.transit import transit_depth_curve
from wayne_tpu.reduction import fit_depths
from wayne_tpu.scene import example_scene

from tests.test_ramp_fit import _orbit_times

RP = 0.1595


def _chromatic_ld(n_chan):
    # linear blue->red weakening of all four Claret terms
    base = np.array([0.6, -0.3, 0.2, -0.05], np.float64)
    f = np.linspace(1.35, 0.65, n_chan)[:, None]
    return (base[None, :] * f).astype(np.float32)


def _channel_curves(t, orbit, ld_chan):
    z, in_front = projected_separation(jnp.asarray(t), orbit)
    cols = []
    for i in range(ld_chan.shape[0]):
        f = transit_depth_curve(z, jnp.float32(RP),
                                jnp.asarray(ld_chan[i]), 32)
        cols.append(np.asarray(1.0 - (1.0 - f) * in_front))
    return np.stack(cols, axis=1)


@pytest.mark.slow
def test_fit_depths_per_channel_ld_exact_mean_ld_biased():
    base = example_scene(64)
    t, _, _ = _orbit_times()
    ld_chan = _chromatic_ld(6)
    chans = _channel_curves(t, base.orbit, ld_chan)

    rp_c, _ = fit_depths(jnp.asarray(chans), jnp.asarray(t), base.orbit,
                         jnp.asarray(ld_chan), jnp.float32(0.15))
    np.testing.assert_allclose(np.asarray(rp_c), RP, atol=1e-5)

    rp_m, _ = fit_depths(jnp.asarray(chans), jnp.asarray(t), base.orbit,
                         jnp.asarray(ld_chan.mean(axis=0)),
                         jnp.float32(0.15))
    err_m = np.abs(np.asarray(rp_m) - RP)
    # the band-mean fit is measurably biased at the band edges (~2e-4 rp
    # = ~60 ppm in depth, well above WFC3 per-channel precision) — the
    # tilt the per-channel path exists to remove
    assert err_m.max() > 1.5e-4, err_m
    # and the tilt is edge-antisymmetric (opposite signs blue vs red)
    d = np.asarray(rp_m) - RP
    assert d[0] * d[-1] < 0.0, d


@pytest.mark.slow
def test_run_reduce_cli_chromatic_ld(tmp_path):
    """File-level loop with an ld_file: the simulator injects per-λ LD,
    run_reduce rebuilds per-channel coefficients from the same table and
    recovers a flat injected spectrum."""
    import json

    import yaml

    from wayne_tpu.config import load_yaml
    from wayne_tpu.observation import Observation
    from wayne_tpu.run_reduce import main as reduce_main

    # clablimb-style table over the G141 band (micron, c1..c4)
    wl = np.linspace(0.9, 2.0, 12)
    f = np.linspace(1.35, 0.65, 12)
    tab = np.column_stack([wl] + [f * c for c in (0.6, -0.3, 0.2, -0.05)])
    ld_path = tmp_path / "ld.txt"
    np.savetxt(ld_path, tab)

    pars = {"grism": "G141", "subarray": 128, "NSAMP": 4,
            "SAMPSEQ": "SPARS10", "scan": True, "x_ref": 30.0,
            "y_ref": 40.0, "num_orbits": 3, "exposures_per_orbit": 6,
            "n_lambda": 64, "n_sub": 4, "rp_over_rs": 0.14,
            "ld_file": str(ld_path),
            "start_mjd": 55999.93, "t0": 56000.0, "period": 0.813475,
            "sma_over_rs": 4.855, "inclination": 82.1, "seed": 21}
    ppath = tmp_path / "pars.yml"
    ppath.write_text(yaml.safe_dump(pars))
    outdir = tmp_path / "visit"
    obs = Observation(load_yaml(str(ppath)))
    assert np.asarray(obs.scenes.ld).ndim == 3   # (n_exp, NL, 4) chromatic
    obs.generate(str(outdir), chunk=6, progress=lambda s: None)

    rc = reduce_main(["-d", str(outdir), "-p", str(ppath),
                      "--n-chan", "4", "--cpu"])
    assert rc == 0
    rep = json.loads((outdir / "reduced.json").read_text())
    for c in rep["channels"]:
        assert abs(c["rp_over_rs"] - 0.14) < max(5 * c["rp_sigma"], 4e-3), c
