"""Per-detection modality feature extraction (camera / LiDAR / radar).

Array-level rebuild of the reference's L2 preprocessing and in-graph feature
extraction (``preprocessing/preprocess_{img,lidar,radar}.py``,
``construct_detection_graph_disjoint_parallel.py:160-385``,
``utils/dataset.py:222-273,328-381``):

  * camera: pick the camera with the most visible box corners, project the
    3D box, clip the corner hull to the canvas, crop + resize to 32x32;
  * LiDAR: multisweep aggregation into the reference frame, 3-axis
    point-in-box mask, the reference's (idiosyncratic but replicated)
    normalization — subtract the per-point channel mean, divide by the max
    over channels of the across-points L2 norm — then pad/sample to 3x128;
  * radar: multisweep with velocity-vector rotation (CenterFusion-derived
    semantics, reference ``utils/radar.py``), 1.05x-enlarged box, z-ignoring
    point-in-box, normalize, pad/sample to 4x64.

Random box augmentation (yaw jitter +-pi/10, scale 0.85-1.15) is an explicit
*option* here, NOT baked into cached artifacts as the reference does
(``preprocess_lidar.py:165-176``; SURVEY.md §6.1-6).

File formats are parsed natively: lidar ``.pcd.bin`` = float32 x,y,z,
intensity,ring; radar ``.pcd`` = PCD v0.7 binary.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from batch3dmot_tpu import geometry as geo

# Camera -> radar channel map for radar aggregation
# (reference ``construct...parallel.py:316-323``).
CAM_TO_RADAR: Dict[str, List[str]] = {
    "CAM_FRONT_LEFT": ["RADAR_FRONT_LEFT", "RADAR_BACK_LEFT"],
    "CAM_FRONT": ["RADAR_FRONT_RIGHT", "RADAR_FRONT", "RADAR_FRONT_LEFT"],
    "CAM_FRONT_RIGHT": ["RADAR_FRONT_RIGHT", "RADAR_BACK_RIGHT"],
    "CAM_BACK_RIGHT": ["RADAR_FRONT_RIGHT", "RADAR_BACK_RIGHT"],
    "CAM_BACK": ["RADAR_BACK_LEFT", "RADAR_BACK_RIGHT"],
    "CAM_BACK_LEFT": ["RADAR_FRONT_LEFT", "RADAR_BACK_LEFT"],
}


# ---------------------------------------------------------------------------
# Camera crop selection
# ---------------------------------------------------------------------------


def box_to_camera_frame(center, wlh, quat, cs_translation, cs_rotation):
    """Ego-frame box -> camera frame (devkit translate(-t); rotate(q^-1))."""
    c, q, _ = geo.boxes_global_to_ego(
        np.asarray(center)[None],
        np.asarray(quat)[None],
        np.zeros((1, 3)),
        cs_translation,
        cs_rotation,
    )
    return c[0], q[0]


def select_camera(
    center_e, wlh, quat_e, cameras: Sequence[dict]
) -> Tuple[int, int]:
    """Index of the camera with the most visible box corners and the count
    (reference ``construct...parallel.py:169-200``). Each camera dict needs
    cs_translation, cs_rotation, intrinsic, imsize=(w, h)."""
    best, best_vis = 0, -1
    for i, cam in enumerate(cameras):
        c, q = box_to_camera_frame(
            center_e, wlh, quat_e, cam["cs_translation"], cam["cs_rotation"]
        )
        corners = geo.box_corners(c, wlh, q)
        vis, _ = geo.count_box_corners_in_image(
            corners, cam["intrinsic"], cam["imsize"]
        )
        if vis > best_vis:
            best, best_vis = i, vis
    return best, best_vis


def crop_coords_for_box(center_e, wlh, quat_e, camera: dict):
    """2D crop (min_x, min_y, max_x, max_y) or None (box behind camera /
    outside the canvas) — reference ``construct...parallel.py:214-238``."""
    c, q = box_to_camera_frame(
        center_e, wlh, quat_e, camera["cs_translation"], camera["cs_rotation"]
    )
    corners = geo.box_corners(c, wlh, q)
    in_front = corners[2, :] > 0
    if not in_front.any():
        return None
    corners = corners[:, in_front]
    img_pts = geo.view_points(corners, camera["intrinsic"], normalize=True)[:2].T
    return geo.post_process_coords(img_pts, imsize=camera["imsize"])


def crop_and_resize(
    image: np.ndarray, coords, out_size: int = 32
) -> np.ndarray:
    """PIL-compatible integer crop + bilinear resize to (out, out, 3)
    **uint8** (reference ``construct...parallel.py:240-255``).

    PIL's bilinear resize of a uint8 image IS uint8 — the reference only
    becomes float at load time via ToTensor's /255
    (``utils/dataset.py:149-161``). Keeping the artifact uint8 is therefore
    lossless parity AND 4x smaller on disk and over the host->device relay;
    the /255 happens on device (``models.encoders.image_input_f32``)."""
    from PIL import Image

    min_x, min_y, max_x, max_y = (int(round(v)) for v in coords)
    if image.dtype != np.uint8:
        image = (np.clip(image, 0, 1) * 255).astype(np.uint8)
    img = Image.fromarray(image)
    cropped = img.crop((min_x, min_y, max_x, max_y))
    resized = cropped.resize((out_size, out_size), Image.BILINEAR)
    return np.asarray(resized, np.uint8)


# ---------------------------------------------------------------------------
# Point-cloud normalization & fixed-size collate (reference semantics)
# ---------------------------------------------------------------------------


def reference_normalize(points: np.ndarray) -> np.ndarray:
    """The reference's normalization, replicated bit-for-bit
    (``construct...parallel.py:299-302,372-375``): subtract the per-*point*
    mean over channels, then divide by the max over channels of the L2 norm
    across points. (Not a centroid normalization — documented quirk.)"""
    x = points - np.mean(points, axis=0, keepdims=True)
    dist = np.max(np.sqrt(np.sum(x**2, axis=1)))
    return x / dist if dist > 0 else x


def encoder_dataset_normalize(points: np.ndarray) -> np.ndarray:
    """The radar encoder-dataset variant (``utils/dataset.py:313-318``):
    only the first 3 channels are centered/scaled."""
    x = points.astype(np.float64).copy()
    x[0:3] = x[0:3] - np.mean(x[0:3], axis=0, keepdims=True)
    dist = np.max(np.sqrt(np.sum(x[0:3] ** 2, axis=1)))
    if dist > 0:
        x[0:3] = x[0:3] / dist
    return x


def collate_fixed_size(
    points: np.ndarray,
    pc_length: int,
    num_channels: int,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """[C, K] -> [num_channels, pc_length]: zero-pad short clouds, randomly
    subsample long ones (reference ``utils/dataset.py:222-273``)."""
    k = points.shape[1]
    if k < pc_length:
        out = np.zeros((num_channels, pc_length), np.float32)
        out[:, :k] = points[:num_channels]
        return out
    if k == pc_length:
        return points[:num_channels].astype(np.float32)
    rng = rng or np.random.default_rng()
    idx = rng.choice(k, size=pc_length, replace=False)
    return points[:num_channels][:, idx].astype(np.float32)


def lidar_node_feature(
    points_ego: np.ndarray,
    center_e,
    wlh,
    quat_e,
    min_pts: int = 6,
    pc_length: int = 128,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, int]:
    """Masked, normalized, fixed-size LiDAR feature [3, 128] for one box;
    all-zeros when fewer than ``min_pts`` points fall inside
    (``construct...parallel.py:289-310``). Returns (feature, num_points)."""
    mask = geo.points_in_box(center_e, wlh, quat_e, points_ego[0:3])
    masked = points_ego[:, mask]
    n = masked.shape[1]
    if n < min_pts:
        return np.zeros((3, pc_length), np.float32), n
    x = reference_normalize(masked)
    return collate_fixed_size(x, pc_length, 3, rng), n


def radar_node_feature(
    points_ego: np.ndarray,
    center_e,
    wlh,
    quat_e,
    min_pts: int = 2,
    pc_length: int = 64,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, int]:
    """Masked, normalized, fixed-size radar feature [4, 64] for one box
    using the 1.05x-enlarged, z-ignoring mask and channels [x, y, vx_comp,
    vy_comp] (``construct...parallel.py:340-385``)."""
    enlarged = np.asarray(wlh) * 1.05
    mask = geo.points_in_box(
        center_e, enlarged, quat_e, points_ego[0:3], ignore_z=True
    )
    masked = points_ego[:, mask]
    n = masked.shape[1]
    if n < min_pts:
        return np.zeros((4, pc_length), np.float32), n
    x = reference_normalize(masked)
    radar_vec = x[[0, 1, 8, 9], :]
    return collate_fixed_size(radar_vec, pc_length, 4, rng), n


def augment_box(
    center, wlh, quat, rng: np.random.Generator,
    max_yaw: float = np.pi / 10, scale_range=(0.85, 1.15),
):
    """The train-time box augmentation the reference bakes into cached
    artifacts (``preprocess_lidar.py:165-176``) — applied on demand here."""
    yaw_jitter = rng.uniform(-max_yaw, max_yaw)
    scale = rng.uniform(*scale_range)
    new_quat = geo.quat_multiply(geo.yaw_to_quat(yaw_jitter), quat)
    return np.asarray(center), np.asarray(wlh) * scale, new_quat


# ---------------------------------------------------------------------------
# Sensor file parsing (native, devkit-free)
# ---------------------------------------------------------------------------


def load_lidar_bin(path: str) -> np.ndarray:
    """nuScenes lidar .pcd.bin -> [4, N] (x, y, z, intensity).

    The file stores 5 floats/point but the devkit's ``LidarPointCloud``
    keeps only 4 (``from_file``: ``reshape(-1, 5)[:, :4]`` — the ring
    index is dropped), and the reference masks/normalizes that 4-row
    cloud (``construct...parallel.py:278-301``). Keeping the ring row
    would skew ``reference_normalize``'s channel-mixing math (the
    per-point mean divides by the channel count and ring values 0-31 can
    win the max-norm scale) on every real cloud."""
    raw = np.fromfile(path, dtype=np.float32)
    return raw.reshape(-1, 5)[:, :4].T


def load_radar_pcd(path: str) -> np.ndarray:
    """nuScenes radar .pcd (PCD v0.7, binary) -> [num_fields, N] float32.

    Parses the header (FIELDS/SIZE/TYPE/COUNT/POINTS/DATA) generically; the
    nuScenes radar format has 18 fields.
    """
    with open(path, "rb") as f:
        header: Dict[str, List[str]] = {}
        while True:
            raw_line = f.readline()
            if not raw_line:  # EOF before DATA: truncated/corrupt header
                raise ValueError(
                    f"{path}: PCD header ended without a DATA line "
                    "(truncated or corrupt file)"
                )
            line = raw_line.decode("ascii", errors="replace").strip()
            if not line or line.startswith("#"):
                continue
            key, *vals = line.split()
            header[key.upper()] = vals
            if key.upper() == "DATA":
                data_mode = vals[0]
                break
        fields = header["FIELDS"]
        sizes = list(map(int, header["SIZE"]))
        types = header["TYPE"]
        counts = list(map(int, header.get("COUNT", ["1"] * len(fields))))
        n_points = int(header["POINTS"][0])

        np_types = {("F", 4): "f4", ("F", 8): "f8", ("I", 1): "i1",
                    ("I", 2): "i2", ("I", 4): "i4", ("U", 1): "u1",
                    ("U", 2): "u2", ("U", 4): "u4"}
        dtype = np.dtype(
            [
                (f"{name}_{i}" if counts[j] > 1 else name,
                 np_types[(types[j], sizes[j])])
                for j, name in enumerate(fields)
                for i in range(counts[j])
            ]
        )
        if data_mode == "binary":
            buf = f.read(dtype.itemsize * n_points)
            arr = np.frombuffer(buf, dtype=dtype, count=n_points)
        elif data_mode == "ascii":
            arr = np.loadtxt(f, dtype=np.float64, max_rows=n_points)
            return np.atleast_2d(arr).T.astype(np.float32)
        else:
            raise ValueError(f"Unsupported PCD data mode '{data_mode}'")
    return np.stack(
        [arr[name].astype(np.float32) for name in dtype.names], axis=0
    )


def radar_devkit_filter(
    points: np.ndarray,
    invalid_states=(0,),
    dynprop_states=tuple(range(7)),
    ambig_states=(3,),
) -> np.ndarray:
    """The devkit ``RadarPointCloud.from_file`` default state filtering,
    applied per sweep by the reference's radar multisweep (its
    ``RadarPointCloudWithVelocity.from_file_multisweep`` calls the
    inherited ``from_file``, ``utils/radar.py:77``): keep returns with
    invalid_state in {0}, dyn_prop in 0..6, ambig_state == 3 (stationary
    ambiguity resolved). Real .pcd files carry ghost/invalid returns that
    these drop; field indices follow the 18-field nuScenes radar layout
    (3 = dyn_prop, 11 = ambig_state, 14 = invalid_state)."""
    if points.shape[0] < 15:  # non-nuScenes layout (tests/synthetic): no-op
        return points
    keep = (
        np.isin(points[14], invalid_states)
        & np.isin(points[3], dynprop_states)
        & np.isin(points[11], ambig_states)
    )
    return points[:, keep]


def load_radar_pcd_filtered(path: str) -> np.ndarray:
    """``load_radar_pcd`` + the devkit's default state filtering — the
    per-sweep loader the radar pipelines use (parity with the reference's
    ``from_file`` call in ``from_file_multisweep``)."""
    return radar_devkit_filter(load_radar_pcd(path))


def remove_close(points: np.ndarray, min_distance: float = 1.0) -> np.ndarray:
    """Drop points within min_distance of the sensor in x/y (devkit
    ``remove_close`` semantics used by multisweep aggregation)."""
    keep = ~(
        (np.abs(points[0]) < min_distance) & (np.abs(points[1]) < min_distance)
    )
    return points[:, keep]


# ---------------------------------------------------------------------------
# Multisweep aggregation (tables-driven)
# ---------------------------------------------------------------------------


def multisweep_points(
    tables,
    sample_token: str,
    channel: str,
    nsweeps: int,
    loader,
    rotate_velocity_rows: Optional[Tuple[int, int]] = None,
    ref_channel: str = "LIDAR_TOP",
    min_distance: float = 1.0,
    velocity_row_pick: Tuple[int, int] = (0, 2),
) -> np.ndarray:
    """Aggregate up to ``nsweeps`` past sweeps of ``channel`` into the
    reference channel's sensor frame at ``sample_token`` (devkit
    ``from_file_multisweep`` semantics incl. the radar velocity-vector
    rotation of reference ``utils/radar.py:19-117``)."""
    ref_sd = tables.get("sample_data", tables._sample_channel_sd(sample_token, ref_channel))
    ref_pose = tables.get("ego_pose", ref_sd["ego_pose_token"])
    ref_cs = tables.get("calibrated_sensor", ref_sd["calibrated_sensor_token"])

    ref_from_car = geo.transform_matrix(
        ref_cs["translation"], np.array(ref_cs["rotation"]), inverse=True
    )
    car_from_global = geo.transform_matrix(
        ref_pose["translation"], np.array(ref_pose["rotation"]), inverse=True
    )
    ref_from_car_rot = geo.transform_matrix(
        [0, 0, 0], np.array(ref_cs["rotation"]), inverse=True
    )
    car_from_global_rot = geo.transform_matrix(
        [0, 0, 0], np.array(ref_pose["rotation"]), inverse=True
    )

    sd = tables.get("sample_data", tables._sample_channel_sd(sample_token, channel))
    chunks = []
    for _ in range(nsweeps):
        pts = loader(os.path.join(tables.dataroot, sd["filename"]))
        pts = remove_close(pts, min_distance)

        pose = tables.get("ego_pose", sd["ego_pose_token"])
        cs = tables.get("calibrated_sensor", sd["calibrated_sensor_token"])
        global_from_car = geo.transform_matrix(
            pose["translation"], np.array(pose["rotation"])
        )
        car_from_current = geo.transform_matrix(
            cs["translation"], np.array(cs["rotation"])
        )
        tm = ref_from_car @ car_from_global @ global_from_car @ car_from_current
        hom = np.vstack([pts[0:3], np.ones((1, pts.shape[1]))])
        pts = pts.copy()
        pts[0:3] = (tm @ hom)[0:3]

        if rotate_velocity_rows is not None:
            r0, r1 = rotate_velocity_rows
            global_from_car_rot = geo.transform_matrix(
                [0, 0, 0], np.array(pose["rotation"])
            )
            car_from_current_rot = geo.transform_matrix(
                [0, 0, 0], np.array(cs["rotation"])
            )
            vel_tm = (
                ref_from_car_rot
                @ car_from_global_rot
                @ global_from_car_rot
                @ car_from_current_rot
            )
            vel = np.vstack(
                [pts[[r0, r1]], np.zeros((1, pts.shape[1])), np.ones((1, pts.shape[1]))]
            )
            vel = vel_tm @ vel
            # The reference reuses CenterFusion's camera-frame code verbatim
            # and assigns transformed rows [0, 2] (x, z) even though the
            # reference frame here is the lidar (z-up) frame, zeroing
            # vy_comp for yaw-only motion (utils/radar.py:19-28). Replicated
            # by default; pass velocity_row_pick=(0, 1) for the fixed
            # behavior.
            pts[r0] = vel[velocity_row_pick[0]]
            pts[r1] = vel[velocity_row_pick[1]]
        chunks.append(pts)
        if not sd["prev"]:
            break
        sd = tables.get("sample_data", sd["prev"])
    return np.concatenate(chunks, axis=1) if chunks else np.zeros((18, 0))


def sensor_to_ego(points: np.ndarray, cs_translation, cs_rotation) -> np.ndarray:
    """Sensor-frame points -> ego frame (rotate then translate,
    ``construct...parallel.py:286-287``)."""
    out = points.copy()
    R = geo.quat_rotation_matrix(np.asarray(cs_rotation))
    out[0:3] = R @ points[0:3] + np.asarray(cs_translation)[:, None]
    return out
