"""End-to-end L2 preprocessing tests over a fabricated mini nuScenes dataset
with real (generated) sensor files: camera JPEGs, lidar .bin, radar .pcd."""

import json
import os

import numpy as np
import pytest

from batch3dmot_tpu import geometry as geo
from batch3dmot_tpu.config import Config
from batch3dmot_tpu.data import preprocess as pp
from batch3dmot_tpu.data.nuscenes_tables import NuScenesTables


@pytest.fixture(scope="module")
def fab_root(tmp_path_factory):
    from fab_nusc import make_fab_dataset

    return make_fab_dataset(tmp_path_factory.mktemp("pp"))


def test_generate_image_annotations(fab_root):
    tables = NuScenesTables(fab_root, "v1.0-mini")
    anns = pp.generate_image_annotations(tables)
    entries = anns["all"]
    assert len(entries) == 2
    e = entries[0]
    assert e["camera_channel"] == "CAM_FRONT"
    x0, y0, x1, y1 = e["bbox_corners"]
    assert 0 <= x0 < x1 <= 400 and 0 <= y0 < y1 <= 300
    assert e["category_name"] == "vehicle.car"
    assert 1.0 < e["ann_ego_radius"] < 50.0


def test_preprocess_lidar(fab_root, tmp_path):
    tables = NuScenesTables(fab_root, "v1.0-mini")
    img_anns = pp.generate_image_annotations(tables)
    out = pp.preprocess_lidar_annotations(tables, str(tmp_path), img_anns)
    entries = out["all"]
    assert len(entries) == 2
    for e in entries:
        # entries carry the TABLE's official count (the reference's
        # load-time filter reads it), not the masked multisweep count
        ann = tables.get("sample_annotation", e["sample_annotation_token"])
        assert e["num_lidar_pts"] == ann["num_lidar_pts"]
        pc = np.load(tmp_path / f"{e['sample_annotation_token']}.npy")
        # devkit LidarPointCloud keeps 4 channels (ring dropped)
        assert pc.shape[0] == 4
        assert pc.shape[1] > 10  # box points captured, far points excluded


def test_preprocess_radar(fab_root, tmp_path):
    tables = NuScenesTables(fab_root, "v1.0-mini")
    img_anns = pp.generate_image_annotations(tables)
    out = pp.preprocess_radar_annotations(tables, str(tmp_path), img_anns)
    entries = out["all"]
    assert len(entries) == 2
    for e in entries:
        assert e["num_radar_pts"] >= 2
        pc = np.load(tmp_path / f"{e['sample_annotation_token']}.npy")
        assert pc.shape[0] == 18


def test_encoder_batch_iterators(fab_root, tmp_path):
    tables = NuScenesTables(fab_root, "v1.0-mini")
    img_anns = pp.generate_image_annotations(tables)
    lidar_meta = pp.preprocess_lidar_annotations(
        tables, str(tmp_path / "lidar"), img_anns
    )
    radar_meta = pp.preprocess_radar_annotations(
        tables, str(tmp_path / "radar"), img_anns
    )

    imgs, labels = next(
        pp.image_batches(fab_root, img_anns["all"], batch_size=2, shuffle=False)
    )
    assert imgs.shape == (2, 32, 32, 3)
    assert labels.tolist() == [0, 0]  # car -> class 1 -> 0-indexed target 0

    pcs, labels = next(
        pp.lidar_batches(str(tmp_path / "lidar"), lidar_meta["all"], 2, shuffle=False)
    )
    assert pcs.shape == (2, 128, 3)
    assert np.isfinite(pcs).all()

    rvs, labels = next(
        pp.radar_batches(str(tmp_path / "radar"), radar_meta["all"], 2, shuffle=False)
    )
    assert rvs.shape == (2, 64, 4)

    # augmented lidar differs from unaugmented
    pcs_aug, _ = next(
        pp.lidar_batches(
            str(tmp_path / "lidar"), lidar_meta["all"], 2,
            augment=True, rng=np.random.default_rng(0), shuffle=False,
        )
    )
    assert not np.allclose(pcs, pcs_aug)
