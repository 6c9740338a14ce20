"""Config/YAML tests (reference key compatibility)."""

import os
import tempfile

import pytest

from wayne_tpu.config import (
    ExposureStatic, NoiseFlags, ObservationConfig, config_from_dict, load_yaml,
)


def test_defaults_roundtrip_static():
    cfg = ObservationConfig()
    st = cfg.exposure_static()
    assert st.subarray == 512 and st.nsamp == 15 and st.scan
    hash(st)  # static config must be hashable for jit


def test_reference_style_flat_keys():
    cfg = config_from_dict({
        "grism": "g102".upper(), "NSAMP": 7, "SAMPSEQ": "SPARS25",
        "subarray": 256, "scan_speed": 0.5, "num_orbits": 3,
        "mag_J": 11.2, "planet_name": "X b", "period": 2.0, "t0": 56001.0,
        "rp_over_rs": 0.08, "x_shifts": 0.01,
    })
    assert cfg.grism == "G102" and cfg.nsamp == 7
    assert cfg.samp_seq == "SPARS25" and cfg.subarray == 256
    assert cfg.scan_speed_pix_s == 0.5 and cfg.n_orbits == 3
    assert cfg.star.magnitude_j == 11.2
    assert cfg.planet.period_days == 2.0 and cfg.planet.rp_over_rs == 0.08
    assert cfg.trends.drift_x_per_exp == 0.01


def test_nested_sections_and_noise_block():
    cfg = config_from_dict({
        "observation": {"grism": "G141", "nsamp": 3},
        "target": {"star_temperature": 5000.0},
        "planet": {"inclination": 85.0},
        "noise": {"read_noise": False, "cosmic_rays": False, "ssv": True},
    })
    assert cfg.nsamp == 3
    assert cfg.star.temperature_k == 5000.0
    assert cfg.planet.inclination_deg == 85.0
    assert not cfg.noise.read_noise and not cfg.noise.cosmic_rays
    assert cfg.noise.ssv


def test_yaml_file_loading():
    with tempfile.NamedTemporaryFile("w", suffix=".yml", delete=False) as fh:
        fh.write("grism: G141\nNSAMP: 4\nld_coeffs: [0.1, 0.2, 0.3, 0.4]\n")
        path = fh.name
    try:
        cfg = load_yaml(path)
        assert cfg.nsamp == 4
        assert cfg.planet.ld_coeffs == (0.1, 0.2, 0.3, 0.4)
    finally:
        os.unlink(path)


def test_invalid_values_raise():
    with pytest.raises(ValueError):
        ExposureStatic(subarray=100)
    with pytest.raises(ValueError):
        ExposureStatic(nsamp=16)


def test_noise_flag_factories():
    assert not any(vars(NoiseFlags.none()).values())
    assert all(vars(NoiseFlags.all()).values())


class TestNameResolution:
    def test_known_name_fills_system_parameters(self):
        cfg = config_from_dict({"planet_name": "HD 209458 b"})
        assert cfg.planet.period_days == pytest.approx(3.52474859)
        assert cfg.planet.sma_over_rs == pytest.approx(8.76)
        assert cfg.planet.inclination_deg == pytest.approx(86.71)
        assert cfg.planet.rp_over_rs == pytest.approx(0.12086)
        assert cfg.star.temperature_k == pytest.approx(6065.0)
        assert cfg.star.magnitude_j == pytest.approx(6.591)

    def test_explicit_keys_override_catalog(self):
        cfg = config_from_dict({"planet_name": "WASP-43 b",
                                "inclination": 80.0})
        assert cfg.planet.inclination_deg == 80.0             # explicit wins
        assert cfg.planet.period_days == pytest.approx(0.813475)  # filled

    def test_unknown_name_without_orbit_raises(self):
        with pytest.raises(KeyError):
            config_from_dict({"planet_name": "Nonexistent c"})

    def test_unknown_name_with_explicit_orbit_is_a_label(self):
        cfg = config_from_dict({"planet_name": "Nonexistent c",
                                "period": 2.0})
        assert cfg.planet.name == "Nonexistent c"
        assert cfg.planet.period_days == 2.0

    def test_catalog_file_loading(self, tmp_path):
        csv_path = tmp_path / "cat.csv"
        csv_path.write_text(
            "name,period_days,sma_over_rs,inclination_deg,rp_over_rs,star_j\n"
            "Test-1 b,5.0,10.0,88.0,0.05,7.5\n")
        cfg = config_from_dict({"catalog_file": str(csv_path),
                                "planet_name": "Test-1 b"})
        assert cfg.planet.period_days == 5.0
        assert cfg.planet.rp_over_rs == 0.05
        assert cfg.star.magnitude_j == 7.5

    def test_catalog_does_not_leak_across_configs(self, tmp_path):
        """A catalog is scoped to the config that names it: the next
        config_from_dict in the same process must not see its entries."""
        csv_path = tmp_path / "cat.csv"
        csv_path.write_text("name,period_days,sma_over_rs\nGhost b,9.0,4.0\n")
        config_from_dict({"catalog_file": str(csv_path),
                          "planet_name": "Ghost b"})
        with pytest.raises(KeyError):
            config_from_dict({"planet_name": "Ghost b"})

    def test_catalog_json_and_bad_fields(self, tmp_path):
        import json

        from wayne_tpu.models.planet import load_catalog

        jp = tmp_path / "cat.json"
        jp.write_text(json.dumps({"J b": {"period_days": 1.5,
                                          "sma_over_rs": 6.0}}))
        entries = load_catalog(str(jp))
        assert entries == {"J b": {"period_days": 1.5, "sma_over_rs": 6.0}}
        cfg = config_from_dict({"catalog_file": str(jp),
                                "planet_name": "J b"})
        assert cfg.planet.period_days == 1.5
        bad = tmp_path / "bad.json"
        bad.write_text(json.dumps({"K b": {"bogus_field": 1.0}}))
        with pytest.raises(ValueError):
            load_catalog(str(bad))


def test_nested_sections_route_shared_field_names():
    """star: and planet: blocks share field names ('name',
    'spectrum_file') — each must land on ITS OWN dataclass. Flattening
    them into one dict sent planet.name to the star, silently skipping
    catalog resolution and swapping spectra (regression, confirmed by
    execution)."""
    from wayne_tpu.config import config_from_dict

    cfg = config_from_dict({"planet": {"name": "HD 209458 b"},
                            "star": {"name": "MyStar"}})
    assert cfg.planet.name == "HD 209458 b"
    assert cfg.star.name == "MyStar"
    # the named system actually resolved (exodata-equivalent path)
    assert abs(cfg.planet.period_days - 3.52475) < 0.01
    cfg2 = config_from_dict({"planet": {"spectrum_file": "trans.dat",
                                        "rp_over_rs": 0.1}})
    assert cfg2.planet.spectrum_file == "trans.dat"
    assert not cfg2.star.spectrum_file


def test_start_jd_converts_to_mjd():
    """The reference-style start_JD key carries a Julian Date; storing
    it raw in the MJD field put the visit ~2.4 million days from the
    catalog ephemeris (regression)."""
    from wayne_tpu.config import config_from_dict

    cfg = config_from_dict({"start_JD": 2456000.9})
    assert abs(cfg.start_mjd - 56000.4) < 1e-6
    # small values are taken as MJD already (defensive)
    cfg2 = config_from_dict({"start_JD": 56000.4})
    assert abs(cfg2.start_mjd - 56000.4) < 1e-6


def test_sample_rate_drives_n_sub():
    """Reference 'sample_rate' (s per temporal subsample) controls the
    subsegment count when explicit n_sub is not given."""
    cfg = config_from_dict({"SAMPSEQ": "SPARS10", "NSAMP": 5,
                            "subarray": 256, "sample_rate": 0.5})
    st = cfg.exposure_static()
    # SPARS10/256 interval is ~7.35 s -> ceil-ish 7.35/0.5 ~ 15 subsegments
    assert 14 <= st.n_sub <= 17
    # explicit n_sub still wins
    cfg2 = config_from_dict({"SAMPSEQ": "SPARS10", "NSAMP": 5,
                             "subarray": 256, "sample_rate": 0.5,
                             "n_sub": 4})
    assert cfg2.exposure_static().n_sub == 4


def test_eclipse_depth_wires_through():
    """planet eclipse_depth enables the static eclipse gate and fills the
    Scene's Fp/Fs leaf (secondary-eclipse simulation)."""
    import numpy as np

    from wayne_tpu.observation import Observation

    cfg = config_from_dict({"grism": "G141", "subarray": 64, "NSAMP": 2,
                            "SAMPSEQ": "RAPID", "scan": False,
                            "num_orbits": 1, "exposures_per_orbit": 2,
                            "n_lambda": 16, "n_sub": 2,
                            "eclipse_depth": 1.2e-3})
    assert cfg.planet.eclipse_depth == 1.2e-3
    assert cfg.exposure_static().eclipse
    obs = Observation(cfg)
    np.testing.assert_allclose(np.asarray(obs.scenes.fp_over_fs),
                               1.2e-3, rtol=1e-6)
    # default stays off (zero extra tracing cost)
    assert not config_from_dict({"grism": "G141"}).exposure_static().eclipse


def test_noise_preset_and_unknown_keys():
    """noise: {preset: ...} rebases the flags; unknown keys fail loudly
    (a typo would otherwise silently simulate the wrong noise chain)."""
    import pytest

    from wayne_tpu.config import config_from_dict

    base = {"grism": "G141", "subarray": 64, "nsamp": 2, "n_lambda": 16}
    cfg = config_from_dict({**base, "noise": {"preset": "none"}})
    assert not any([cfg.noise.poisson, cfg.noise.read_noise,
                    cfg.noise.sky, cfg.noise.visit_trend])
    cfg = config_from_dict(
        {**base, "noise": {"preset": "none", "poisson": True}})
    assert cfg.noise.poisson and not cfg.noise.read_noise
    cfg = config_from_dict({**base, "noise": {"preset": "all"}})
    assert cfg.noise.ipc and cfg.noise.bias_drift
    with pytest.raises(ValueError, match="unknown noise keys"):
        config_from_dict({**base, "noise": {"poison": False}})
    with pytest.raises(ValueError, match="unknown noise preset"):
        config_from_dict({**base, "noise": {"preset": "some"}})


def test_scalar_noise_master_toggle():
    """Reference-style scalar ``noise: false`` is the master shot-noise
    toggle (alias to poisson); non-boolean scalars fail loudly instead
    of riding the ignore-unknown-keys fallthrough."""
    import pytest

    from wayne_tpu.config import config_from_dict

    base = {"grism": "G141", "subarray": 64, "nsamp": 2, "n_lambda": 16}
    assert config_from_dict({**base, "noise": False}).noise.poisson is False
    assert config_from_dict({**base, "noise": True}).noise.poisson is True
    assert config_from_dict({**base, "noise": 0}).noise.poisson is False
    with pytest.raises(ValueError, match="must be a boolean"):
        config_from_dict({**base, "noise": "maybe"})


def test_section_blocks_nested_under_observation():
    """noise:/star:/planet:/trends: nested INSIDE observation: route
    exactly like their top-level forms (the raw mapping must never land
    on the same-named config field)."""
    from wayne_tpu.config import NoiseFlags, config_from_dict

    cfg = config_from_dict({"observation": {
        "grism": "G141", "subarray": 64, "nsamp": 2, "n_lambda": 16,
        "noise": {"preset": "none", "poisson": True},
        "star": {"temperature_k": 4520.0},
        "planet": {"rp_over_rs": 0.11},
        "trends": {"hook_amplitude": 0.002},
    }})
    assert isinstance(cfg.noise, NoiseFlags)
    assert cfg.noise.poisson and not cfg.noise.read_noise
    assert cfg.star.temperature_k == 4520.0
    assert cfg.planet.rp_over_rs == 0.11
    assert cfg.trends.hook_amplitude == 0.002
