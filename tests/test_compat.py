"""Reference-style API shim tests."""

import os
import tempfile

import numpy as np
import yaml

from wayne_tpu.compat import ExposureGenerator, run
from wayne_tpu.config import NoiseFlags


def test_exposure_generator_frames():
    gen = ExposureGenerator("G141", subarray=128, n_lambda=64, nsamp=3,
                            samp_seq="SPARS10", n_sub=4,
                            noise=NoiseFlags.none())
    stare = gen.staring_frame(30.0, 40.0)
    scan = gen.scanning_frame(30.0, 40.0, scan_speed=1.5)
    assert stare.reads_dn.shape == (4, 128, 128)
    assert scan.reads_dn.shape == (4, 128, 128)
    # scan smears the same flux over more rows -> lower peak
    assert float(scan.ideal_e.max()) < float(stare.ideal_e.max())
    np.testing.assert_allclose(float(scan.ideal_e.sum()),
                               float(stare.ideal_e.sum()), rtol=2e-3)


def test_run_parameter_file():
    pars = {
        "observation": dict(grism="G141", subarray=128, NSAMP=3,
                            SAMPSEQ="SPARS10", scan=True, num_orbits=1,
                            exposures_per_orbit=2, n_lambda=64, n_sub=4,
                            x_ref=30.0, y_ref=30.0),
        "target": dict(name="T", mag_J=10.5),
    }
    with tempfile.TemporaryDirectory() as d:
        parfile = os.path.join(d, "pars.yml")
        with open(parfile, "w") as fh:
            yaml.safe_dump(pars, fh)
        paths = run(parfile, outdir=os.path.join(d, "out"), chunk=2)
        assert len(paths) == 2
        assert all(p.endswith("_ima.fits") for p in paths)
