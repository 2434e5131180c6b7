"""The five graduated BASELINE config profiles (BASELINE.md): each must
load, validate, and select the right modalities/detector/match method."""

import glob
import os

import pytest

from batch3dmot_tpu.cli import _active_modalities
from batch3dmot_tpu.config import Config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")

EXPECTED = {
    "pose_mini.yaml": {
        "mods": (), "detector": "megvii", "version": "v1.0-mini",
    },
    "cam.yaml": {
        "mods": ("img",), "detector": "megvii", "version": "v1.0-trainval",
    },
    "cam_lidar.yaml": {
        "mods": ("img", "lidar"), "detector": "megvii",
        "version": "v1.0-trainval",
    },
    "clr.yaml": {
        "mods": ("img", "lidar", "radar"), "detector": "megvii",
        "version": "v1.0-trainval",
    },
    "cl.yaml": {
        "mods": ("img", "lidar", "radar"), "detector": "centerpoint",
        "version": "v1.0-trainval",
    },
}


def test_all_five_profiles_ship():
    names = {os.path.basename(p) for p in glob.glob(os.path.join(CONFIG_DIR, "*.yaml"))}
    assert set(EXPECTED) <= names


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_profile_loads_and_selects(name):
    cfg = Config.from_yaml(os.path.join(CONFIG_DIR, name))
    exp = EXPECTED[name]
    active = tuple(
        m for m in ("img", "lidar", "radar") if cfg.main.sensors_used.get(m)
    )
    assert active == exp["mods"]
    assert cfg.main.detections == exp["detector"]
    assert cfg.main.version == exp["version"]
    # detection JSON must be configured for the detector
    assert cfg.detections.get(cfg.main.detections)
    # `_active_modalities` drives model construction: poses-only configs
    # never reach it with the mm model, others must match exactly
    if exp["mods"]:
        assert _active_modalities(cfg) == exp["mods"]
    # standard eval protocol everywhere
    assert cfg.eval.eval_config == "tracking_nips_2019"
    assert cfg.gnn.knn_conv_mode == "noop"  # trained-checkpoint parity default
