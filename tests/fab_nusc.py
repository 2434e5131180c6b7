"""Fabricated mini nuScenes dataset (tables + generated sensor files) shared
by preprocessing and end-to-end integration tests.

Two builders:
  * ``make_fab_dataset``       — single car-only scene (legacy fixture).
  * ``make_fab_dataset_multi`` — N scenes x all 7 tracking classes with
    per-class sizes/speeds, intermittent lidar/radar point coverage, and an
    optional splits JSON; ``make_fab_detections`` fabricates a realistic
    detector JSON (noise + misses + false positives) on top of it. This is
    the trainval-shaped dress-rehearsal fixture.
"""

import json
import os

import numpy as np

# one representative raw category per tracking class (inverse of
# config.CATEGORY_TO_TRACKING_NAME)
TRACKING_TO_CATEGORY = {
    "bicycle": "vehicle.bicycle",
    "bus": "vehicle.bus.rigid",
    "car": "vehicle.car",
    "motorcycle": "vehicle.motorcycle",
    "pedestrian": "human.pedestrian.adult",
    "trailer": "vehicle.trailer",
    "truck": "vehicle.truck",
}
# [w, l, h] and per-frame x displacement (frames are 0.5 s apart)
CLASS_SIZES = {
    "bicycle": [0.6, 1.8, 1.2],
    "bus": [2.9, 11.0, 3.2],
    "car": [2.0, 4.0, 1.5],
    "motorcycle": [0.8, 2.1, 1.4],
    "pedestrian": [0.6, 0.6, 1.8],
    "trailer": [2.5, 10.0, 3.5],
    "truck": [2.5, 7.0, 2.8],
}
CLASS_SPEEDS = {
    "bicycle": 1.2,
    "bus": 1.6,
    "car": 2.0,
    "motorcycle": 2.4,
    "pedestrian": 0.5,
    "trailer": 1.4,
    "truck": 1.8,
}


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


def make_fab_dataset_multi(
    root_parent,
    num_scenes=4,
    num_samples=8,
    classes=tuple(sorted(TRACKING_TO_CATEGORY)),
    splits=None,
    version="v1.0-mini",
):
    """Multi-scene, multi-class fabricated dataset.

    Scene ``k`` holds one moving instance per tracking class in its own
    lane (y = 4*(j - C/2)), starting at x = 8 + 0.7*k, advancing at a
    per-class speed. Lidar / radar point clusters are dropped on an
    (i+j+k) cadence so modality presence is intermittent — the trainval
    failure modes (zero-point boxes, BatchNorm-under-masking) get real
    coverage. ``splits`` maps split name -> list of scene indices and is
    written to ``<root>/splits.json`` (consumed via ``paths.splits_json``).

    Returns ``(root, splits_json_path)``; ``splits_json_path`` is None
    when no splits are given.
    """
    import pathlib

    from PIL import Image

    root = pathlib.Path(root_parent) / "nusc"
    tdir = root / version
    os.makedirs(tdir)
    os.makedirs(root / "sweeps")

    cam_q = [0.5, -0.5, 0.5, -0.5]  # optical z -> ego +x
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
    categories = [
        {"token": f"cat_{c}", "name": TRACKING_TO_CATEGORY[c], "description": ""}
        for c in classes
    ]

    scenes, samples, sample_datas, ego_poses, anns, instances = [], [], [], [], [], []
    for k in range(num_scenes):
        p = f"sc{k}_"
        scenes.append({
            "token": f"scene{k}", "name": f"scene-{k + 1:04d}",
            "nbr_samples": num_samples,
            "first_sample_token": f"{p}s0",
            "last_sample_token": f"{p}s{num_samples - 1}",
            "description": "", "log_token": f"log{k}",
        })
        for j, c in enumerate(classes):
            instances.append({
                "token": f"{p}inst{j}", "category_token": f"cat_{c}",
                "nbr_annotations": num_samples,
                "first_annotation_token": f"{p}ann{j}_0",
                "last_annotation_token": f"{p}ann{j}_{num_samples - 1}",
            })
        for i in range(num_samples):
            stok = f"{p}s{i}"
            ts = 500_000 * (i + 1)
            samples.append({
                "token": stok, "timestamp": ts, "scene_token": f"scene{k}",
                "prev": f"{p}s{i - 1}" if i else "",
                "next": f"{p}s{i + 1}" if i < num_samples - 1 else "",
            })
            ego_poses.append({
                "token": f"{p}ep{i}", "translation": [0.0, 0.0, 0.0],
                "rotation": [1, 0, 0, 0], "timestamp": ts,
            })
            lidar_pts, radar_pts = [], []
            for j, c in enumerate(classes):
                w, l, h = CLASS_SIZES[c]
                x = 8.0 + 0.7 * k + CLASS_SPEEDS[c] * i
                y = 4.0 * (j - (len(classes) - 1) / 2)
                z = h / 2
                n_lidar = n_radar = 0
                if (i + j + k) % 4 != 0:  # intermittent lidar coverage
                    n_lidar = 12
                    spread = 0.4 * min(w, l)
                    pc = np.random.default_rng(1000 * k + 10 * i + j).uniform(
                        -spread, spread, (n_lidar, 3)
                    ) + np.array([x, y, z])
                    lidar_pts.append(pc)
                if (i + j + k) % 3 != 0:  # intermittent radar coverage
                    n_radar = 4
                    rp = np.random.default_rng(2000 * k + 10 * i + j).uniform(
                        -0.4 * min(w, l), 0.4 * min(w, l), (n_radar, 2)
                    ) + np.array([x, y])
                    radar_pts.append(rp)
                anns.append({
                    "token": f"{p}ann{j}_{i}", "sample_token": stok,
                    "instance_token": f"{p}inst{j}",
                    "translation": [x, y, z], "size": [w, l, h],
                    "rotation": [1, 0, 0, 0],
                    "prev": f"{p}ann{j}_{i - 1}" if i else "",
                    "next": f"{p}ann{j}_{i + 1}" if i < num_samples - 1 else "",
                    "num_lidar_pts": n_lidar, "num_radar_pts": n_radar,
                    "visibility_token": "4", "attribute_tokens": [],
                })

            # lidar sweep file (point clusters in lidar frame = ego - 1.8 z)
            cloud = (
                np.vstack(lidar_pts) - np.array([0, 0, 1.8])
                if lidar_pts
                else np.array([[60.0, 60.0, 0.0]])
            )
            rows = np.hstack(
                [cloud, np.ones((len(cloud), 1)), np.zeros((len(cloud), 1))]
            ).astype(np.float32)
            lidar_file = f"sweeps/{p}lidar_{i}.pcd.bin"
            rows.tofile(root / lidar_file)

            # radar pcd (18 float32 fields, binary)
            rxy = np.vstack(radar_pts) if radar_pts else np.array([[60.0, 60.0]])
            n_r = len(rxy)
            fields = [f"f{m}" for m in range(18)]
            fields[0:3] = ["x", "y", "z"]
            header = (
                "VERSION 0.7\n"
                f"FIELDS {' '.join(fields)}\n"
                f"SIZE {' '.join(['4'] * 18)}\n"
                f"TYPE {' '.join(['F'] * 18)}\n"
                f"COUNT {' '.join(['1'] * 18)}\n"
                f"WIDTH {n_r}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
                f"POINTS {n_r}\nDATA binary\n"
            )
            arr = np.zeros((n_r, 18), np.float32)
            arr[:, 0:2] = rxy
            arr[:, 8] = 1.0  # vx_comp
            radar_file = f"sweeps/{p}radar_{i}.pcd"
            with open(root / radar_file, "wb") as f:
                f.write(header.encode())
                f.write(arr.tobytes())

            img_file = f"sweeps/{p}cam_{i}.jpg"
            Image.fromarray(
                (np.random.default_rng(7 * k + i).random((300, 400, 3)) * 255)
                .astype(np.uint8)
            ).save(root / img_file)

            for ch, cs_tok, fname, wpx, hpx in (
                ("LIDAR_TOP", "cs_lidar", lidar_file, None, None),
                ("CAM_FRONT", "cs_cam", img_file, 400, 300),
                ("RADAR_FRONT", "cs_radar", radar_file, None, None),
            ):
                sd = {
                    "token": f"{p}sd_{ch}_{i}", "sample_token": stok,
                    "ego_pose_token": f"{p}ep{i}",
                    "calibrated_sensor_token": cs_tok,
                    "filename": fname, "is_key_frame": True,
                    "prev": "", "next": "", "timestamp": ts,
                }
                if wpx:
                    sd["width"] = wpx
                    sd["height"] = hpx
                sample_datas.append(sd)

    tables = {
        "scene": scenes, "sample": samples, "sample_data": sample_datas,
        "ego_pose": ego_poses, "calibrated_sensor": cs, "sensor": sensors,
        "sample_annotation": anns, "instance": instances,
        "category": categories, "attribute": [],
    }
    for name, data in tables.items():
        with open(tdir / f"{name}.json", "w") as f:
            json.dump(data, f)

    splits_path = None
    if splits:
        splits_path = str(root / "splits.json")
        with open(splits_path, "w") as f:
            json.dump(
                {
                    name: [f"scene-{k + 1:04d}" for k in idxs]
                    for name, idxs in splits.items()
                },
                f,
            )
    return str(root), splits_path


def make_fab_detections(
    root,
    version,
    out_path,
    scene_tokens=None,
    miss_rate=0.15,
    fp_per_frame=1,
    noise=0.25,
    seed=0,
):
    """Fabricated detector JSON (nuScenes submission format) derived from the
    written GT tables: each annotation becomes a detection with positional
    noise, dropped with ``miss_rate``, plus ``fp_per_frame`` false positives
    per sample. Restricted to ``scene_tokens`` when given."""
    tdir = os.path.join(root, version)
    with open(os.path.join(tdir, "sample_annotation.json")) as f:
        anns = json.load(f)
    with open(os.path.join(tdir, "sample.json")) as f:
        samples = json.load(f)
    with open(os.path.join(tdir, "instance.json")) as f:
        inst = {x["token"]: x for x in json.load(f)}
    with open(os.path.join(tdir, "category.json")) as f:
        cats = {x["token"]: x["name"] for x in json.load(f)}
    cat_to_tracking = {v: k for k, v in TRACKING_TO_CATEGORY.items()}

    scene_of = {s["token"]: s["scene_token"] for s in samples}
    rng = np.random.default_rng(seed)
    results = {
        s["token"]: []
        for s in samples
        if scene_tokens is None or s["scene_token"] in scene_tokens
    }
    for ann in anns:
        stok = ann["sample_token"]
        if stok not in results:
            continue
        if rng.random() < miss_rate:
            continue
        name = cat_to_tracking[cats[inst[ann["instance_token"]]["category_token"]]]
        t = np.array(ann["translation"]) + rng.normal(0, noise, 3) * [1, 1, 0.2]
        results[stok].append({
            "sample_token": stok,
            "translation": t.tolist(),
            "size": ann["size"],
            "rotation": ann["rotation"],
            "velocity": [2.0 * CLASS_SPEEDS.get(name, 1.0), 0.0],
            "detection_name": name,
            "detection_score": float(rng.uniform(0.5, 0.95)),
        })
    for stok in results:
        for _ in range(fp_per_frame):
            results[stok].append({
                "sample_token": stok,
                "translation": [
                    float(rng.uniform(5, 45)),
                    float(rng.uniform(-14, 14)),
                    1.0,
                ],
                "size": [2.0, 4.0, 1.5],
                "rotation": [1, 0, 0, 0],
                "velocity": [0.0, 0.0],
                "detection_name": "car",
                "detection_score": float(rng.uniform(0.05, 0.4)),
            })
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    # real detector submissions carry a meta block (nuScenes submission
    # format; validate-data warns when it is absent)
    meta = {
        "use_camera": False, "use_lidar": True, "use_radar": False,
        "use_map": False, "use_external": False,
    }
    with open(out_path, "w") as f:
        json.dump({"meta": meta, "results": results}, f)
    return out_path


