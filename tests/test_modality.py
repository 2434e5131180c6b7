"""Tests for modality feature extraction and the native nuScenes table reader."""

import json
import os

import numpy as np
import pytest

from batch3dmot_tpu import geometry as geo
from batch3dmot_tpu.data import modality as mod
from batch3dmot_tpu.data.nuscenes_tables import NuScenesTables


def _camera(tx=0.0, yaw=0.0, f=100.0, imsize=(200, 200)):
    return {
        "cs_translation": np.array([tx, 0.0, 1.5]),
        "cs_rotation": geo.yaw_to_quat(yaw),
        "intrinsic": np.array([[f, 0, imsize[0] / 2], [0, f, imsize[1] / 2], [0, 0, 1]]),
        "imsize": imsize,
    }


def _look_at_x_camera():
    """Camera at ego origin looking along ego +x (optical z forward)."""
    # rotation mapping camera axes (x right, y down, z forward) onto ego:
    # z_cam -> +x_ego, x_cam -> -y_ego, y_cam -> -z_ego
    # quaternion for that rotation: rotate -90 about z then -90 about x... use matrix->quat shortcut
    # Build from matrix via known quat: q = (0.5, -0.5, 0.5, -0.5)
    return {
        "cs_translation": np.zeros(3),
        "cs_rotation": np.array([0.5, -0.5, 0.5, -0.5]),
        "intrinsic": np.array([[100.0, 0, 100], [0, 100.0, 100], [0, 0, 1]]),
        "imsize": (200, 200),
    }


def test_lookat_camera_rotation_is_valid():
    cam = _look_at_x_camera()
    R = geo.quat_rotation_matrix(cam["cs_rotation"])
    # camera z axis (3rd column) should align with ego +x
    np.testing.assert_allclose(R[:, 2], [1, 0, 0], atol=1e-9)


def test_select_camera_prefers_visible():
    cam_front = _look_at_x_camera()
    cam_back = dict(cam_front)
    # back camera looks along -x: rotate front cam by pi about z
    cam_back["cs_rotation"] = geo.quat_multiply(
        geo.yaw_to_quat(np.pi), cam_front["cs_rotation"]
    )
    box_center = np.array([10.0, 0, 0])  # in front
    idx, vis = mod.select_camera(
        box_center, [2, 4, 1.5], geo.yaw_to_quat(0.0), [cam_front, cam_back]
    )
    assert idx == 0
    assert vis > 0


def test_crop_coords_in_front():
    cam = _look_at_x_camera()
    coords = mod.crop_coords_for_box(
        np.array([10.0, 0, 0]), [2, 4, 1.5], geo.yaw_to_quat(0.0), cam
    )
    assert coords is not None
    min_x, min_y, max_x, max_y = coords
    assert 0 <= min_x < max_x <= 200
    assert 0 <= min_y < max_y <= 200


def test_crop_coords_behind_camera():
    cam = _look_at_x_camera()
    coords = mod.crop_coords_for_box(
        np.array([-10.0, 0, 0]), [2, 4, 1.5], geo.yaw_to_quat(0.0), cam
    )
    assert coords is None


def test_crop_and_resize_shape():
    img = (np.random.default_rng(0).random((100, 150, 3)) * 255).astype(np.uint8)
    out = mod.crop_and_resize(img, (10.2, 20.8, 60.1, 70.9), 32)
    assert out.shape == (32, 32, 3)
    # uint8 artifact: PIL's bilinear resize of uint8 IS uint8 — the /255
    # happens on device (models.encoders.image_input_f32), exactly the
    # reference's PIL + ToTensor/255 split (dataset.py:149-161)
    assert out.dtype == np.uint8


def test_reference_normalize_semantics():
    pts = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    out = mod.reference_normalize(pts)
    manual = pts - pts.mean(axis=0, keepdims=True)
    dist = np.max(np.sqrt((manual**2).sum(axis=1)))
    np.testing.assert_allclose(out, manual / dist)


def test_collate_pad_and_sample():
    pts = np.arange(12, dtype=np.float32).reshape(4, 3)
    out = mod.collate_fixed_size(pts, 8, 3)
    assert out.shape == (3, 8)
    np.testing.assert_allclose(out[:, :3], pts[:3])
    assert (out[:, 3:] == 0).all()
    big = np.random.default_rng(0).random((4, 100)).astype(np.float32)
    out2 = mod.collate_fixed_size(big, 8, 4, np.random.default_rng(1))
    assert out2.shape == (4, 8)


def test_lidar_node_feature_masks_and_min_pts():
    # 10 points inside a unit box at origin + junk outside
    rng = np.random.default_rng(0)
    inside = rng.uniform(-0.4, 0.4, (3, 10))
    outside = rng.uniform(5, 6, (3, 20))
    pc = np.hstack([np.vstack([inside, np.zeros((1, 10))]),
                    np.vstack([outside, np.zeros((1, 20))])])
    feat, n = mod.lidar_node_feature(pc, [0, 0, 0], [1, 1, 1], [1, 0, 0, 0])
    assert n == 10
    assert feat.shape == (3, 128)
    feat2, n2 = mod.lidar_node_feature(
        pc[:, 10:], [0, 0, 0], [1, 1, 1], [1, 0, 0, 0]
    )
    assert n2 == 0 and (feat2 == 0).all()


def test_radar_node_feature():
    rng = np.random.default_rng(0)
    pts = np.zeros((18, 5))
    pts[0:2] = rng.uniform(-0.4, 0.4, (2, 5))  # x, y inside box
    pts[2] = 50.0  # far z — must be ignored
    pts[8:10] = rng.normal(0, 1, (2, 5))  # vx_comp, vy_comp
    feat, n = mod.radar_node_feature(pts, [0, 0, 0], [1, 1, 1], [1, 0, 0, 0])
    assert n == 5
    assert feat.shape == (4, 64)
    assert (feat[:, 5:] == 0).all()


def test_augment_box_ranges():
    rng = np.random.default_rng(0)
    c, w, q = mod.augment_box([1, 2, 3], [2, 4, 1.5], geo.yaw_to_quat(0.3), rng)
    assert (w / np.array([2, 4, 1.5])).min() >= 0.85 - 1e-9
    assert (w / np.array([2, 4, 1.5])).max() <= 1.15 + 1e-9
    dyaw = abs(geo.angle_diff(geo.quaternion_yaw(q), 0.3))
    assert dyaw <= np.pi / 10 + 1e-9


def test_load_lidar_bin(tmp_path):
    path = tmp_path / "sweep.pcd.bin"
    # write as N rows of 5 floats (x, y, z, intensity, ring)
    arr = np.arange(15, dtype=np.float32).reshape(3, 5)
    arr.tofile(path)
    out = mod.load_lidar_bin(str(path))
    # devkit LidarPointCloud keeps 4 channels — the ring row is dropped
    # (it would skew reference_normalize's channel-mixing math)
    assert out.shape == (4, 3)
    np.testing.assert_allclose(out[:, 0], arr[0][:4])


def test_load_radar_pcd_binary(tmp_path):
    n = 4
    fields = ["x", "y", "z", "dyn_prop", "id"]
    sizes = [4, 4, 4, 1, 2]
    types = ["F", "F", "F", "I", "I"]
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\n"
        f"FIELDS {' '.join(fields)}\n"
        f"SIZE {' '.join(map(str, sizes))}\n"
        f"TYPE {' '.join(types)}\n"
        f"COUNT {' '.join(['1'] * len(fields))}\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
        f"POINTS {n}\nDATA binary\n"
    )
    dtype = np.dtype([("x", "f4"), ("y", "f4"), ("z", "f4"), ("dyn_prop", "i1"), ("id", "i2")])
    rows = np.zeros(n, dtype)
    rows["x"] = [1, 2, 3, 4]
    rows["y"] = [5, 6, 7, 8]
    rows["id"] = [10, 11, 12, 13]
    path = tmp_path / "radar.pcd"
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(rows.tobytes())
    out = mod.load_radar_pcd(str(path))
    assert out.shape == (5, 4)
    np.testing.assert_allclose(out[0], [1, 2, 3, 4])
    np.testing.assert_allclose(out[4], [10, 11, 12, 13])


def test_remove_close():
    pts = np.array([[0.5, 5.0], [0.5, 5.0], [0, 0]])
    out = mod.remove_close(pts, 1.0)
    assert out.shape[1] == 1
    assert out[0, 0] == 5.0


# ---------------------------------------------------------------------------
# Fabricated nuScenes tables
# ---------------------------------------------------------------------------


def _make_tables(tmp_path, num_samples=3):
    root = tmp_path / "nusc"
    tdir = root / "v1.0-mini"
    os.makedirs(tdir)
    samples, sample_datas, ego_poses, anns = [], [], [], []
    cs = [{"token": "cs_lidar", "sensor_token": "sen_lidar",
           "translation": [0.9, 0, 1.8], "rotation": [1, 0, 0, 0],
           "camera_intrinsic": []}]
    sensors = [{"token": "sen_lidar", "channel": "LIDAR_TOP", "modality": "lidar"}]
    inst_token = "inst_0"
    prev_ann = ""
    for i in range(num_samples):
        stok, sdtok, eptok, atok = f"s{i}", f"sd{i}", f"ep{i}", f"ann{i}"
        samples.append({
            "token": stok, "timestamp": 1_000_000 * (i + 1) // 2,
            "scene_token": "scene0",
            "prev": f"s{i-1}" if i else "", "next": f"s{i+1}" if i < num_samples - 1 else "",
        })
        sample_datas.append({
            "token": sdtok, "sample_token": stok, "ego_pose_token": eptok,
            "calibrated_sensor_token": "cs_lidar", "filename": f"sweeps/{i}.bin",
            "is_key_frame": True, "prev": "", "next": "",
        })
        ego_poses.append({"token": eptok, "translation": [float(i), 0.0, 0.0],
                          "rotation": [1, 0, 0, 0], "timestamp": samples[-1]["timestamp"]})
        anns.append({
            "token": atok, "sample_token": stok, "instance_token": inst_token,
            "translation": [10.0 + 2.0 * i, 0.0, 0.5], "size": [2, 4, 1.5],
            "rotation": [1, 0, 0, 0], "prev": prev_ann,
            "next": f"ann{i+1}" if i < num_samples - 1 else "",
            "num_lidar_pts": 10, "num_radar_pts": 3, "visibility_token": "4",
            "attribute_tokens": [],
        })
        prev_ann = atok
    scene = [{
        "token": "scene0", "name": "scene-0001", "nbr_samples": num_samples,
        "first_sample_token": "s0", "last_sample_token": f"s{num_samples-1}",
        "description": "", "log_token": "log0",
    }]
    instance = [{"token": inst_token, "category_token": "cat_car",
                 "nbr_annotations": num_samples,
                 "first_annotation_token": "ann0",
                 "last_annotation_token": f"ann{num_samples-1}"}]
    category = [{"token": "cat_car", "name": "vehicle.car", "description": ""}]
    for name, data in [
        ("scene", scene), ("sample", samples), ("sample_data", sample_datas),
        ("ego_pose", ego_poses), ("calibrated_sensor", cs), ("sensor", sensors),
        ("sample_annotation", anns), ("instance", instance),
        ("category", category), ("attribute", []),
    ]:
        with open(tdir / f"{name}.json", "w") as f:
            json.dump(data, f)
    return str(root)


def test_tables_scene_traversal(tmp_path):
    root = _make_tables(tmp_path)
    t = NuScenesTables(root, "v1.0-mini")
    toks = t.scene_sample_tokens("scene0")
    assert toks == ["s0", "s1", "s2"]
    stoks, ego_t, ego_q = t.scene_ego_poses("scene0")
    np.testing.assert_allclose(ego_t[:, 0], [0, 1, 2])


def test_tables_gt_boxes_and_velocity(tmp_path):
    root = _make_tables(tmp_path)
    t = NuScenesTables(root, "v1.0-mini")
    gt = t.gt_frame_boxes("s1")
    assert len(gt) == 1
    assert gt.instance[0] == "inst_0"
    assert gt.class_id[0] == 1  # car
    # velocity: (ann2 - ann0) / (t2 - t0) = 4m / 1s = 4 m/s in x
    np.testing.assert_allclose(gt.velocity[0], [4.0, 0, 0], atol=1e-6)


def test_tables_split_fallback(tmp_path):
    root = _make_tables(tmp_path)
    t = NuScenesTables(root, "v1.0-mini")
    splits = t.split_scene_lists()
    # devkit absent here -> 'all' fallback
    assert "all" in splits and len(splits["all"]) == 1
    # explicit splits json
    sj = tmp_path / "splits.json"
    sj.write_text(json.dumps({"mini_train": ["scene-0001"], "mini_val": []}))
    splits2 = t.split_scene_lists(str(sj))
    assert len(splits2["mini_train"]) == 1
    assert splits2["mini_val"] == []


def test_radar_devkit_filter():
    """Devkit RadarPointCloud.from_file default state filtering (the
    reference's per-sweep loader inherits it): keep invalid_state 0,
    dyn_prop 0..6, ambig_state 3 — on the 18-field nuScenes layout."""
    pts = np.zeros((18, 5), np.float32)
    pts[0] = np.arange(5)  # x, to identify survivors
    pts[14] = [0, 1, 0, 0, 0]   # invalid_state: point 1 dropped
    pts[3] = [0, 0, 7, 2, 3]    # dyn_prop: point 2 dropped
    pts[11] = [3, 3, 3, 2, 3]   # ambig_state: point 3 dropped
    out = mod.radar_devkit_filter(pts)
    assert out[0].tolist() == [0.0, 4.0]
    # non-nuScenes layouts (fewer fields) pass through untouched
    small = np.ones((5, 4), np.float32)
    assert mod.radar_devkit_filter(small) is small


def test_load_radar_pcd_truncated_header_raises(tmp_path):
    """A .pcd whose header ends before the DATA line must raise, not spin
    forever at EOF."""
    p = tmp_path / "trunc.pcd"
    p.write_bytes(b"# .PCD v0.7\nVERSION 0.7\nFIELDS x y\n")
    with pytest.raises(ValueError, match="DATA line"):
        mod.load_radar_pcd(str(p))


def test_box_velocity_centered_difference_doubles_gate(tmp_path):
    """Devkit NuScenes.box_velocity allows up to DOUBLE max_time_diff for a
    centered difference (prev AND next both present): a 2.0 s prev->next
    gap yields a finite velocity, not NaN."""
    root = tmp_path / "nusc"
    tdir = root / "v1.0-mini"
    os.makedirs(tdir)
    samples = [
        {"token": f"s{i}", "timestamp": 1_000_000 * i, "scene_token": "sc"}
        for i in range(3)
    ]
    anns = [
        {"token": f"a{i}", "sample_token": f"s{i}",
         "instance_token": "inst", "translation": [2.0 * i, 0.0, 0.0],
         "size": [1, 1, 1], "rotation": [1, 0, 0, 0],
         "prev": f"a{i-1}" if i > 0 else "",
         "next": f"a{i+1}" if i < 2 else ""}
        for i in range(3)
    ]
    for name, rows in (("sample", samples), ("sample_annotation", anns)):
        with open(tdir / f"{name}.json", "w") as f:
            json.dump(rows, f)
    for name in ("scene", "sample_data", "ego_pose", "calibrated_sensor",
                 "sensor", "instance", "category"):
        with open(tdir / f"{name}.json", "w") as f:
            json.dump([], f)
    tables = NuScenesTables(str(root), "v1.0-mini")
    # centered difference: s0 -> s2 spans 2.0 s (> 1.5, <= 3.0): finite
    v = tables.box_velocity(tables.get("sample_annotation", "a1"))
    np.testing.assert_allclose(v, [2.0, 0.0, 0.0])
    # one-sided difference keeps the 1.5 s gate: a0 -> a1 spans 1.0 s ok,
    # but with max_time_diff 0.5 it's NaN
    v2 = tables.box_velocity(
        tables.get("sample_annotation", "a0"), max_time_diff=0.5
    )
    assert np.isnan(v2).all()
