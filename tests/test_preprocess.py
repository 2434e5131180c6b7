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
    """Two-sample scene; one car annotation per sample at [10+2i, 0, 0.5];
    ego at origin; camera looking along +x; lidar/radar points around the
    car."""
    root = tmp_path_factory.mktemp("nusc")
    tdir = root / "v1.0-mini"
    os.makedirs(tdir)
    from PIL import Image

    num_samples = 2
    cam_q = [0.5, -0.5, 0.5, -0.5]  # optical z -> ego +x
    samples, sample_datas, ego_poses, anns = [], [], [], []
    cs = [
        {"token": "cs_lidar", "sensor_token": "sen_lidar",
         "translation": [0.0, 0.0, 1.8], "rotation": [1, 0, 0, 0],
         "camera_intrinsic": []},
        {"token": "cs_cam", "sensor_token": "sen_cam",
         "translation": [0.0, 0.0, 1.5], "rotation": cam_q,
         "camera_intrinsic": [[400.0, 0, 200], [0, 400.0, 150], [0, 0, 1]]},
        {"token": "cs_radar", "sensor_token": "sen_radar",
         "translation": [0.0, 0.0, 0.5], "rotation": [1, 0, 0, 0],
         "camera_intrinsic": []},
    ]
    sensors = [
        {"token": "sen_lidar", "channel": "LIDAR_TOP", "modality": "lidar"},
        {"token": "sen_cam", "channel": "CAM_FRONT", "modality": "camera"},
        {"token": "sen_radar", "channel": "RADAR_FRONT", "modality": "radar"},
    ]
    os.makedirs(root / "sweeps")
    prev_ann = ""
    for i in range(num_samples):
        stok = f"s{i}"
        samples.append({
            "token": stok, "timestamp": 500_000 * (i + 1), "scene_token": "scene0",
            "prev": f"s{i-1}" if i else "", "next": f"s{i+1}" if i < num_samples - 1 else "",
        })
        car_x = 10.0 + 2.0 * i
        # lidar sweep: points around the car (in lidar frame = ego - [0,0,1.8])
        pts = np.random.default_rng(i).uniform(-0.5, 0.5, (40, 3)) + np.array([car_x, 0, 0.5 - 1.8])
        far = np.array([[50.0, 50.0, 0.0]] * 5)
        cloud = np.vstack([pts, far])
        lidar_rows = np.hstack([cloud, np.ones((len(cloud), 1)), np.zeros((len(cloud), 1))]).astype(np.float32)
        lidar_file = f"sweeps/lidar_{i}.pcd.bin"
        lidar_rows.tofile(root / lidar_file)

        # radar pcd (18 fields, binary) at z=0 in radar frame (ego z - 0.5)
        n_r = 8
        rpts = np.random.default_rng(100 + i).uniform(-0.6, 0.6, (n_r, 2)) + np.array([car_x, 0])
        fields = [f"f{j}" for j in range(18)]
        fields[0:3] = ["x", "y", "z"]
        header = (
            "VERSION 0.7\n"
            f"FIELDS {' '.join(fields)}\n"
            f"SIZE {' '.join(['4'] * 18)}\n"
            f"TYPE {' '.join(['F'] * 18)}\n"
            f"COUNT {' '.join(['1'] * 18)}\n"
            f"WIDTH {n_r}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n_r}\nDATA binary\n"
        )
        arr = np.zeros((n_r, 18), np.float32)
        arr[:, 0:2] = rpts
        arr[:, 2] = 0.0
        arr[:, 8] = 1.0  # vx_comp
        radar_file = f"sweeps/radar_{i}.pcd"
        with open(root / radar_file, "wb") as f:
            f.write(header.encode())
            f.write(arr.tobytes())

        # camera image
        img_file = f"sweeps/cam_{i}.jpg"
        Image.fromarray(
            (np.random.default_rng(i).random((300, 400, 3)) * 255).astype(np.uint8)
        ).save(root / img_file)

        for ch, cs_tok, fname, w, h in (
            ("LIDAR_TOP", "cs_lidar", lidar_file, None, None),
            ("CAM_FRONT", "cs_cam", img_file, 400, 300),
            ("RADAR_FRONT", "cs_radar", radar_file, None, None),
        ):
            sd = {
                "token": f"sd_{ch}_{i}", "sample_token": stok,
                "ego_pose_token": f"ep{i}", "calibrated_sensor_token": cs_tok,
                "filename": fname, "is_key_frame": True, "prev": "", "next": "",
                "timestamp": samples[-1]["timestamp"],
            }
            if w:
                sd["width"] = w
                sd["height"] = h
            sample_datas.append(sd)
        ego_poses.append({"token": f"ep{i}", "translation": [0.0, 0.0, 0.0],
                          "rotation": [1, 0, 0, 0], "timestamp": samples[-1]["timestamp"]})
        anns.append({
            "token": f"ann{i}", "sample_token": stok, "instance_token": "inst_0",
            "translation": [car_x, 0.0, 0.5], "size": [2, 4, 1.5],
            "rotation": [1, 0, 0, 0], "prev": prev_ann,
            "next": f"ann{i+1}" if i < num_samples - 1 else "",
            "num_lidar_pts": 40, "num_radar_pts": 8, "visibility_token": "4",
            "attribute_tokens": [],
        })
        prev_ann = f"ann{i}"

    tables = {
        "scene": [{"token": "scene0", "name": "scene-0001", "nbr_samples": num_samples,
                   "first_sample_token": "s0", "last_sample_token": f"s{num_samples-1}",
                   "description": "", "log_token": "log0"}],
        "sample": samples, "sample_data": sample_datas, "ego_pose": ego_poses,
        "calibrated_sensor": cs, "sensor": sensors, "sample_annotation": anns,
        "instance": [{"token": "inst_0", "category_token": "cat_car",
                      "nbr_annotations": num_samples,
                      "first_annotation_token": "ann0",
                      "last_annotation_token": f"ann{num_samples-1}"}],
        "category": [{"token": "cat_car", "name": "vehicle.car", "description": ""}],
        "attribute": [],
    }
    for name, data in tables.items():
        with open(tdir / f"{name}.json", "w") as f:
            json.dump(data, f)
    return str(root)


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
    out = pp.preprocess_lidar_annotations(tables, str(tmp_path))
    entries = out["all"]
    assert len(entries) == 2
    for e in entries:
        assert e["num_lidar_pts"] > 10  # box points captured, far points excluded
        pc = np.load(tmp_path / f"{e['sample_annotation_token']}.npy")
        assert pc.shape[0] == 5
        assert pc.shape[1] == e["num_lidar_pts"]


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
    lidar_meta = pp.preprocess_lidar_annotations(tables, str(tmp_path / "lidar"))
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
