"""Every shipped example parameter file must load through the real
config path (schema drift in examples is user-facing breakage)."""

import glob
import os

import pytest
import yaml

from wayne_tpu.config import config_from_dict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = sorted(glob.glob(os.path.join(REPO, "examples", "*.yml")))


@pytest.mark.parametrize("path", EXAMPLES,
                         ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_yaml_loads(path):
    with open(path) as fh:
        params = yaml.safe_load(fh)
    cfg = config_from_dict(params)
    assert cfg.subarray in (64, 128, 256, 512, 1024)
    assert 1 <= cfg.nsamp <= 15


def test_full_systematics_example_enables_everything():
    with open(os.path.join(REPO, "examples",
                           "wasp43b_full_systematics.yml")) as fh:
        cfg = config_from_dict(yaml.safe_load(fh))
    assert cfg.noise.ipc and cfg.noise.bias_drift
    assert cfg.recte.enabled and cfg.persistence.enabled
    assert cfg.trends.hook_amplitude == 0.0       # RECTE replaces it
    assert cfg.trends.breathing_amp > 0
    assert cfg.trends.sky_orbit_amp > 0 and cfg.trends.sky_scatter > 0
    assert cfg.alternate_scan_direction
    assert cfg.trends.reverse_flux_offset > 0
    assert cfg.trends.drift_orbit_amp_x > 0
    assert cfg.trends.he_airglow_level > 0


def test_example_count_is_complete():
    # Guards against an example being added without test pickup (glob
    # is empty if the layout moves).
    assert len(EXAMPLES) >= 7
