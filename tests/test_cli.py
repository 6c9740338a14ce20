"""CLI integration test: the `wayne -p parfile.yml` equivalent end to end."""

import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_example_flag():
    r = subprocess.run(
        [sys.executable, "-m", "wayne_tpu.run_visit", "--example"],
        capture_output=True, text=True, cwd=REPO, timeout=300)
    assert r.returncode == 0
    assert "grism: G141" in r.stdout and "planet:" in r.stdout


@pytest.mark.slow
def test_cli_full_visit(tmp_path):
    import yaml
    pars = {
        "observation": dict(grism="G141", subarray=128, NSAMP=3,
                            SAMPSEQ="SPARS10", scan=True, scan_speed=1.0,
                            x_ref=30.0, y_ref=30.0, num_orbits=1,
                            exposures_per_orbit=3, n_lambda=64, n_sub=4,
                            outdir=str(tmp_path / "out")),
        "target": dict(name="T", mag_J=10.0),
    }
    parfile = tmp_path / "pars.yml"
    parfile.write_text(yaml.safe_dump(pars))
    r = subprocess.run(
        [sys.executable, "-m", "wayne_tpu.run_visit", "-p", str(parfile),
         "--cpu", "--chunk", "3", "--debug"],
        capture_output=True, text=True, cwd=REPO, timeout=600)
    assert r.returncode == 0, r.stderr[-800:]
    out = tmp_path / "out"
    imas = sorted(f for f in os.listdir(out) if f.endswith("_ima.fits"))
    assert len(imas) == 3
    assert (out / "visit_summary.json").exists()

    from wayne_tpu.io.ima import read_ima
    hdr, reads, times = read_ima(str(out / imas[0]))
    assert hdr["NSAMP"] == 4
    assert "DATE-OBS" in hdr and hdr["INSTRUME"] == "WFC3"
    assert np.isfinite(reads).all()


def test_run_dataset_cli(tmp_path):
    import numpy as np
    import yaml

    from wayne_tpu.parallel.dataset import load_dataset
    from wayne_tpu.run_dataset import main as dataset_main

    pars = dict(grism="G141", subarray=64, NSAMP=2, SAMPSEQ="RAPID",
                scan=True, num_orbits=1, exposures_per_orbit=2,
                n_lambda=32, n_sub=2, x_ref=10.0, y_ref=10.0)
    p = tmp_path / "pars.yml"
    p.write_text(yaml.safe_dump(pars))
    out = tmp_path / "ds"
    rc = dataset_main(["-p", str(p), "-o", str(out), "--n-mc", "4",
                       "--chunk-mc", "2", "--rp-sigma", "0.002", "--cpu"])
    assert rc == 0
    data = load_dataset(str(out))
    assert data["spectra_e"].shape == (4, 2, 64)
    assert data["label_rp"].shape == (4,)
    assert np.isfinite(data["spectra_e"]).all()
    # resume: second run writes nothing new but returns the same manifest
    rc = dataset_main(["-p", str(p), "-o", str(out), "--n-mc", "4",
                       "--chunk-mc", "2", "--rp-sigma", "0.002", "--cpu"])
    assert rc == 0
    # an explicit --recover 0 is a usage error, not silently-off
    import pytest
    with pytest.raises(SystemExit):
        dataset_main(["-p", str(p), "-o", str(tmp_path / "ds2"),
                      "--n-mc", "2", "--chunk-mc", "2",
                      "--recover", "0", "--cpu"])


@pytest.mark.slow
def test_cli_quicklook_reads_files_back(tmp_path):
    """--quicklook builds its PNGs from the files just written instead
    of re-simulating the visit on device (which doubled wall-clock)."""
    import yaml

    pytest.importorskip("matplotlib")
    from wayne_tpu.run_visit import main as visit_main

    pars = {"grism": "G141", "subarray": 64, "NSAMP": 2,
            "SAMPSEQ": "RAPID", "scan": True, "x_ref": 15.0, "y_ref": 20.0,
            "num_orbits": 1, "exposures_per_orbit": 3, "n_lambda": 32,
            "n_sub": 2, "outdir": str(tmp_path / "out")}
    p = tmp_path / "pars.yml"
    p.write_text(yaml.safe_dump(pars))
    rc = visit_main(["-p", str(p), "--cpu", "--chunk", "3", "--quicklook"])
    assert rc == 0
    assert (tmp_path / "out" / "exposure0.png").exists()
    assert (tmp_path / "out" / "visit_lightcurve.png").exists()


@pytest.mark.slow
def test_cli_all_devices(tmp_path):
    """--all-devices shards the visit over the virtual CPU mesh in a
    subprocess and writes the same number of files."""
    import yaml
    pars = {"grism": "G141", "subarray": 64, "NSAMP": 2,
            "SAMPSEQ": "RAPID", "scan": True, "x_ref": 15.0, "y_ref": 20.0,
            "num_orbits": 1, "exposures_per_orbit": 8, "n_lambda": 32,
            "n_sub": 2, "outdir": str(tmp_path / "out")}
    parfile = tmp_path / "pars.yml"
    parfile.write_text(yaml.safe_dump(pars))
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    r = subprocess.run(
        [sys.executable, "-m", "wayne_tpu.run_visit", "-p", str(parfile),
         "--cpu", "--chunk", "1", "--all-devices"],
        capture_output=True, text=True, cwd=REPO, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-800:]
    assert "sharding exposures over 8 devices" in r.stdout
    imas = [f for f in os.listdir(tmp_path / "out")
            if f.endswith("_ima.fits")]
    assert len(imas) == 8


def test_reduce_cli_argument_validation(tmp_path):
    """run_reduce argument validation fails loudly, not with NaN output:
    explicit windows beyond the ACTUAL frame size (the YAML's subarray
    may not match the directory), and --n-chan < 1."""
    import yaml

    from wayne_tpu.run_reduce import main as reduce_main
    from wayne_tpu.run_visit import main as visit_main

    pars = {"grism": "G141", "subarray": 64, "NSAMP": 2,
            "SAMPSEQ": "RAPID", "scan": True, "x_ref": 15.0, "y_ref": 20.0,
            "num_orbits": 1, "exposures_per_orbit": 3, "n_lambda": 32,
            "n_sub": 2, "outdir": str(tmp_path / "out"),
            "period": 0.813475, "t0": 56000.0, "sma_over_rs": 4.855,
            "inclination": 82.1, "rp_over_rs": 0.1595}
    p = tmp_path / "pars.yml"
    p.write_text(yaml.safe_dump(pars))
    assert visit_main(["-p", str(p), "--cpu", "--chunk", "3"]) == 0
    out = str(tmp_path / "out")

    # windows valid for the YAML's nominal subarray but beyond the
    # 64^2 frames actually on disk: loud SystemExit naming the frames
    big = {**pars, "subarray": 256}
    pbig = tmp_path / "pars_big.yml"
    pbig.write_text(yaml.safe_dump(big))
    with pytest.raises(SystemExit, match="64"):
        reduce_main(["-d", out, "-p", str(pbig), "--cpu",
                     "--rows", "100:200", "--cols", "100:200",
                     "--bg-rows", "210:250"])

    with pytest.raises(SystemExit, match="n-chan"):
        reduce_main(["-d", out, "-p", str(p), "--cpu", "--n-chan", "0"])


@pytest.mark.slow
def test_run_retrieve_cli(tmp_path):
    """Forward-model retrieval CLI: generate a small noisy visit, then
    fit its transmission spectrum THROUGH the simulator from the files
    (wayne_tpu.run_retrieve -> retrieval.retrieve_transmission)."""
    import json

    import yaml

    from wayne_tpu.run_retrieve import main as retrieve_main
    from wayne_tpu.run_visit import main as visit_main

    pars = {"grism": "G141", "subarray": 128, "NSAMP": 2,
            "SAMPSEQ": "SPARS10", "scan": True, "scan_speed": 0.6,
            "x_ref": 30.0, "y_ref": 30.0, "num_orbits": 3,
            "exposures_per_orbit": 4, "n_lambda": 48, "n_sub": 2,
            "start_mjd": 55999.93, "outdir": str(tmp_path / "out"),
            "period": 0.813475, "t0": 56000.0, "sma_over_rs": 4.855,
            "inclination": 82.1, "rp_over_rs": 0.1595,
            "ld_coeffs": [0.65, -0.25, 0.45, -0.2], "mag_J": 10.0}
    p = tmp_path / "pars.yml"
    p.write_text(yaml.safe_dump(pars))
    assert visit_main(["-p", str(p), "--cpu", "--chunk", "4"]) == 0
    out = str(tmp_path / "out")

    rc = retrieve_main(["-d", out, "-p", str(p), "--cpu", "--n-chan", "3",
                        "--n-lm", "4", "--chunk", "6"])
    assert rc == 0
    with open(os.path.join(out, "retrieved.json")) as fh:
        rep = json.load(fh)
    assert rep["method"] == "forward_model_retrieval"
    assert len(rep["channels"]) == 3
    rp = np.asarray([c["rp_over_rs"] for c in rep["channels"]])
    sig = np.asarray([c["rp_sigma"] for c in rep["channels"]])
    assert np.all(np.isfinite(rp)) and np.all(sig > 0)
    # a 12-exposure noisy visit still pins the channel means near truth
    assert np.all(np.abs(rp - 0.1595) < 0.02), rp

    # wrong YAML for the directory (different schedule): loud error
    bad = {**pars, "start_mjd": 56000.4}
    pbad = tmp_path / "pars_bad.yml"
    pbad.write_text(yaml.safe_dump(bad))
    with pytest.raises(SystemExit, match="EXPSTART"):
        retrieve_main(["-d", out, "-p", str(pbad), "--cpu"])
