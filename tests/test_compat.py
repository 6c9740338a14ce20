"""Reference-style API shim tests."""

import os
import tempfile

import numpy as np
import pytest
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


def test_grism_instance_geometry_and_seedless_rng():
    """A pre-built Grism instance's geometry wins over the constructor
    defaults (the ExposureStatic must match its tables), and seedless
    calls advance the RNG like the reference's global generator —
    repeated frames must NOT be bit-identical (regressions)."""
    import dataclasses

    from wayne_tpu.models.grism import make_grism

    g = make_grism("G141", subarray=64, n_lambda=32, samp_seq="RAPID",
                   nsamp=2)
    noise = dataclasses.replace(NoiseFlags.none(), poisson=True,
                                read_noise=True)
    gen = ExposureGenerator(g, n_sub=2, noise=noise)   # defaults say 512
    a = gen.staring_frame(15.0, 20.0)
    assert a.reads_dn.shape == (3, 64, 64)             # instance geometry
    b = gen.staring_frame(15.0, 20.0)
    assert np.abs(np.asarray(a.reads_dn)
                  - np.asarray(b.reads_dn)).max() > 0.0
    # explicit seeds stay reproducible
    c = gen.staring_frame(15.0, 20.0, seed=5)
    d = gen.staring_frame(15.0, 20.0, seed=5)
    np.testing.assert_array_equal(np.asarray(c.reads_dn),
                                  np.asarray(d.reads_dn))


@pytest.mark.slow
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
