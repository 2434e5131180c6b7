"""Fabricated mini nuScenes dataset (tables + generated sensor files) shared
by preprocessing and end-to-end integration tests."""

import json
import os

import numpy as np


def make_fab_dataset(root_parent, num_samples=2):
    """Two-sample scene; one car annotation per sample at [10+2i, 0, 0.5];
    ego at origin; camera looking along +x; lidar/radar points around the
    car."""
    import pathlib
    root = pathlib.Path(root_parent) / "nusc"
    tdir = root / "v1.0-mini"
    os.makedirs(tdir)
    from PIL import Image

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


