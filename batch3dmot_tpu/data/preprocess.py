"""L2 modality preprocessing pipeline: per-annotation artifacts for encoder
training.

Rebuilds the reference's ``preprocessing/preprocess_{img,lidar,radar}.py``
on the native table reader:

  * image annotations: the reference consumes the devkit's
    ``image_annotations.json`` 2D reprojections; here they are generated
    natively from the tables (camera calib + GT boxes + corner-visibility
    camera selection), then class-filtered and ego-radius-gated into the
    split-keyed ``processed_img_anns.json`` contract;
  * lidar: multisweep cloud -> ego frame -> box mask -> per-annotation
    ``<ann_token>.npy`` + ``processed_lidar_anns.json``;
  * radar: camera-mapped radar channels, velocity-rotated multisweep,
    1.05x box, z-ignoring mask -> ``<ann_token>.npy`` +
    ``processed_radar_anns.json``.

The reference bakes random yaw/scale augmentation INTO the cached lidar and
radar artifacts (``preprocess_lidar.py:165-176``); here augmentation is an
explicit ``augment=`` option applied at dataset load time instead
(SURVEY.md §6.1-6), keeping caches deterministic.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from batch3dmot_tpu import geometry as geo
from batch3dmot_tpu.config import (
    CATEGORY_TO_TRACKING_NAME,
    TRACKING_CLASSES,
    Config,
)
from batch3dmot_tpu.data import modality as mod
from batch3dmot_tpu.data.nuscenes_tables import NuScenesTables


def _ann_box(tables: NuScenesTables, ann: dict):
    return (
        np.array(ann["translation"], float),
        np.array(ann["size"], float),
        np.array(ann["rotation"], float),
    )


def _ego_of_sample(tables: NuScenesTables, sample_token: str):
    return tables.ego_pose_of_sample(sample_token)


def _cameras_of_sample(tables: NuScenesTables, sample_token: str) -> List[dict]:
    cams = []
    for channel, sd_tok in tables.sample_channels(sample_token).items():
        if not channel.startswith("CAM"):
            continue
        sd = tables.get("sample_data", sd_tok)
        cs = tables.get("calibrated_sensor", sd["calibrated_sensor_token"])
        cams.append(
            {
                "channel": channel,
                "filename": sd["filename"],
                "cs_translation": np.array(cs["translation"]),
                "cs_rotation": np.array(cs["rotation"]),
                "intrinsic": np.array(cs["camera_intrinsic"]),
                "imsize": (sd.get("width", 1600), sd.get("height", 900)),
            }
        )
    return cams


def _split_of_scene(tables: NuScenesTables, scene_token: str, splits) -> List[str]:
    name = tables.get("scene", scene_token)["name"]
    out = []
    for split, metas in splits.items():
        if any(m["name"] == name for m in metas):
            out.append(split)
    return out or ["all"]


def generate_image_annotations(
    tables: NuScenesTables,
    cfg: Optional[Config] = None,
    splits_json: Optional[str] = None,
) -> Dict[str, List[dict]]:
    """Split-keyed processed image annotations (the reference's
    ``processed_img_anns.json`` contract: filename, bbox_corners,
    category_name, sample_annotation_token, visibility_token,
    ann_ego_radius).

    One entry per (annotation, camera) pair, like the devkit's
    ``export_2d_annotations_as_json`` the reference feeds to ALL THREE
    preprocessors (``preprocess_{img,lidar,radar}.py`` each load
    ``params.paths.image_anns``): an annotation visible in two cameras
    contributes two crops (and duplicate lidar/radar entries downstream),
    one visible in no camera is absent from every encoder dataset.
    Camera membership is the devkit's ``box_in_image(BoxVisibility.ANY)``
    (>= 1 corner visible with z > 1, ALL corners z > 0.1); the table's
    official ``num_lidar_pts``/``num_radar_pts`` ride on each entry (the
    devkit export copies them) for the load-time count filters."""
    cfg = cfg or Config()
    splits = tables.split_scene_lists(splits_json)
    out: Dict[str, List[dict]] = {s: [] for s in splits}

    for ann in tables.table("sample_annotation"):
        inst = tables.get("instance", ann["instance_token"])
        cat = tables.get("category", inst["category_token"])["name"]
        if CATEGORY_TO_TRACKING_NAME.get(cat) is None:
            continue
        sample_token = ann["sample_token"]
        ego_t, ego_q = _ego_of_sample(tables, sample_token)
        center, wlh, quat = _ann_box(tables, ann)
        radius = float(np.linalg.norm(center[:2] - ego_t[:2]))
        if not (cfg.resnet.ego_rad_min < radius < cfg.resnet.ego_rad_max):
            continue
        c_e, q_e, _ = geo.boxes_global_to_ego(
            center[None], quat[None], np.zeros((1, 3)), ego_t, ego_q
        )
        cams = _cameras_of_sample(tables, sample_token)
        scene_tok = tables.get("sample", sample_token)["scene_token"]
        ann_splits = _split_of_scene(tables, scene_tok, splits)
        for cam in cams:
            c, q = mod.box_to_camera_frame(
                c_e[0], wlh, q_e[0], cam["cs_translation"], cam["cs_rotation"]
            )
            corners = geo.box_corners(c, wlh, q)
            vis, in_front = geo.count_box_corners_in_image(
                corners, cam["intrinsic"], cam["imsize"]
            )
            if vis < 1 or in_front < 8:  # BoxVisibility.ANY
                continue
            coords = mod.crop_coords_for_box(c_e[0], wlh, q_e[0], cam)
            if coords is None:
                continue
            entry = {
                "sample_annotation_token": ann["token"],
                "sample_token": sample_token,
                "filename": cam["filename"],
                "camera_channel": cam["channel"],
                "bbox_corners": list(coords),
                "category_name": cat,
                "visibility_token": ann.get("visibility_token", "4"),
                "ann_ego_radius": radius,
                # official table counts (may be absent on fabricated
                # minimal tables; downstream falls back to masked counts)
                "num_lidar_pts": ann.get("num_lidar_pts"),
                "num_radar_pts": ann.get("num_radar_pts"),
            }
            for split in ann_splits:
                out[split].append(entry)
    return out


def _img_records_by_ann(
    img_anns: Dict[str, List[dict]]
) -> "Dict[str, List[Tuple[str, dict]]]":
    """(split, entry) image-annotation records grouped by annotation token —
    lidar/radar dataset membership follows the image annotations (the
    reference preprocessors all iterate ``params.paths.image_anns``), so a
    camera-invisible annotation is absent from every modality and a
    two-camera annotation contributes two entries."""
    by_ann: Dict[str, List[Tuple[str, dict]]] = {}
    for split, entries in img_anns.items():
        for e in entries:
            by_ann.setdefault(e["sample_annotation_token"], []).append(
                (split, e)
            )
    return by_ann


def preprocess_lidar_annotations(
    tables: NuScenesTables,
    out_dir: str,
    img_anns: Dict[str, List[dict]],
    cfg: Optional[Config] = None,
    splits_json: Optional[str] = None,
) -> Dict[str, List[dict]]:
    """Masked per-annotation lidar clouds -> ``<ann_token>.npy`` (un-augmented,
    deterministic) + split-keyed metadata entries.

    Membership mirrors the reference (``preprocess_lidar.py:84-215``):
    iterate the IMAGE annotation records, pre-gate on the table's official
    ``num_lidar_pts >= min_lidar_pts`` (the load-time filter then applies
    the reference's stricter ``>``), and emit one entry per image record
    (multi-camera annotations duplicate, camera-invisible ones are
    absent). The masked cloud itself is computed once per annotation."""
    cfg = cfg or Config()
    os.makedirs(out_dir, exist_ok=True)
    splits = tables.split_scene_lists(splits_json)
    out: Dict[str, List[dict]] = {s: [] for s in splits}
    by_ann = _img_records_by_ann(img_anns)

    for ann in tables.table("sample_annotation"):
        recs = by_ann.get(ann["token"])
        if not recs:
            continue  # not camera-visible: absent from every dataset
        inst = tables.get("instance", ann["instance_token"])
        cat = tables.get("category", inst["category_token"])["name"]
        if CATEGORY_TO_TRACKING_NAME.get(cat) is None:
            continue
        table_pts = ann.get("num_lidar_pts")
        if table_pts is not None and table_pts < cfg.pointnet.min_lidar_pts:
            continue  # reference preprocess gate (official table count)
        sample_token = ann["sample_token"]
        pts = mod.multisweep_points(
            tables,
            sample_token,
            "LIDAR_TOP",
            cfg.preprocessing.nsweeps_lidar,
            mod.load_lidar_bin,
        )
        ref_sd = tables.sample_lidar_sd(sample_token)
        cs = tables.get("calibrated_sensor", ref_sd["calibrated_sensor_token"])
        pts_ego = mod.sensor_to_ego(pts, cs["translation"], np.array(cs["rotation"]))

        ego_t, ego_q = _ego_of_sample(tables, sample_token)
        center, wlh, quat = _ann_box(tables, ann)
        c_e, q_e, _ = geo.boxes_global_to_ego(
            center[None], quat[None], np.zeros((1, 3)), ego_t, ego_q
        )
        mask = geo.points_in_box(c_e[0], wlh, q_e[0], pts_ego[0:3])
        masked = pts_ego[:, mask]
        radius = float(np.linalg.norm(center[:2] - ego_t[:2]))

        np.save(os.path.join(out_dir, f"{ann['token']}.npy"), masked.astype(np.float32))
        entry = {
            "sample_annotation_token": ann["token"],
            "sample_token": sample_token,
            "category_name": cat,
            # official table count when present (the reference's load-time
            # filter reads it); masked multisweep count on fabricated
            # tables without the field
            "num_lidar_pts": (
                int(table_pts) if table_pts is not None
                else int(masked.shape[1])
            ),
            "ann_ego_radius": radius,
        }
        for split, _e in recs:
            out[split].append(dict(entry))
    return out


def preprocess_radar_annotations(
    tables: NuScenesTables,
    out_dir: str,
    img_anns: Dict[str, List[dict]],
    cfg: Optional[Config] = None,
    splits_json: Optional[str] = None,
) -> Dict[str, List[dict]]:
    """Per-annotation radar vectors via the camera->radar channel map of
    each image-annotation record's camera (reference
    ``preprocess_radar.py:85-96``: the channel comes from the record's
    ``filename``, one record per visible camera; the ``.npy`` is keyed by
    annotation token alone, so with multiple records the LAST processed
    camera's cloud is what persists — replicated here, entries duplicate
    per record)."""
    cfg = cfg or Config()
    os.makedirs(out_dir, exist_ok=True)
    splits = tables.split_scene_lists(splits_json)
    out: Dict[str, List[dict]] = {s: [] for s in splits}
    by_ann = _img_records_by_ann(img_anns)

    for ann in tables.table("sample_annotation"):
        recs = by_ann.get(ann["token"])
        if not recs:
            continue  # not camera-visible: absent from every dataset
        inst = tables.get("instance", ann["instance_token"])
        cat = tables.get("category", inst["category_token"])["name"]
        if CATEGORY_TO_TRACKING_NAME.get(cat) is None:
            continue
        table_pts = ann.get("num_radar_pts")
        if (
            table_pts is not None
            and table_pts < cfg.radarnet.min_radar_pts
        ):
            continue  # reference preprocess gate (official table count)
        sample_token = ann["sample_token"]
        ego_t, ego_q = _ego_of_sample(tables, sample_token)
        center, wlh, quat = _ann_box(tables, ann)
        c_e, q_e, _ = geo.boxes_global_to_ego(
            center[None], quat[None], np.zeros((1, 3)), ego_t, ego_q
        )
        radius = float(np.linalg.norm(center[:2] - ego_t[:2]))

        masked_by_channel: Dict[str, np.ndarray] = {}
        for split, e in recs:
            channel = e.get("camera_channel", "CAM_FRONT")
            if channel not in masked_by_channel:
                chunks = []
                for radar_channel in mod.CAM_TO_RADAR[channel]:
                    try:
                        chunks.append(
                            mod.multisweep_points(
                                tables,
                                sample_token,
                                radar_channel,
                                cfg.preprocessing.nsweeps_radar,
                                mod.load_radar_pcd_filtered,
                                rotate_velocity_rows=(8, 9),
                            )
                        )
                    except KeyError:
                        continue  # channel absent from this sample
                if not chunks:
                    continue
                pts = np.concatenate(chunks, axis=1)
                ref_sd = tables.sample_lidar_sd(sample_token)
                cs = tables.get(
                    "calibrated_sensor", ref_sd["calibrated_sensor_token"]
                )
                pts_ego = mod.sensor_to_ego(
                    pts, cs["translation"], np.array(cs["rotation"])
                )
                mask = geo.points_in_box(
                    c_e[0], wlh * 1.05, q_e[0], pts_ego[0:3], ignore_z=True
                )
                masked_by_channel[channel] = pts_ego[:, mask]
            masked = masked_by_channel[channel]
            # per-record overwrite: the last record's camera wins the .npy
            np.save(
                os.path.join(out_dir, f"{ann['token']}.npy"),
                masked.astype(np.float32),
            )
            out[split].append({
                "sample_annotation_token": ann["token"],
                "sample_token": sample_token,
                "category_name": cat,
                "num_radar_pts": (
                    int(table_pts) if table_pts is not None
                    else int(masked.shape[1])
                ),
                "ann_ego_radius": radius,
            })
    return out


def extract_detection_modalities(
    tables: NuScenesTables,
    sample_tokens: List[str],
    detections: Dict[str, "FrameBoxes"],  # noqa: F821 (columnar det boxes)
    cfg: Optional[Config] = None,
    modalities: Tuple[str, ...] = ("img", "lidar", "radar"),
    rng: Optional[np.random.Generator] = None,
):
    """Raw per-DETECTION modality features for the real-data graph build.

    The reference extracts these inside graph construction, per box inside
    nested Python loops (``construct...parallel.py:162-385``: best-camera
    crop, 10-sweep masked lidar cloud, camera-mapped 6-sweep radar). Here
    the per-sample heavy work (multisweep accumulation, image decode) is
    done once per frame and shared across that frame's boxes.

    Returns ``(img, lidar, radar, cam_ok)`` dicts keyed by sample token
    with arrays aligned to the *unfiltered* detection list of each frame
    ([K, 32, 32, 3], [K, 128, 3], [K, 64, 4], bool [K]) — the alignment
    contract of :func:`batch3dmot_tpu.data.detections.scene_from_frames`.
    Modalities not requested map to None; ``cam_ok`` is None unless img is
    requested. ``cam_ok[i]`` False marks a detection whose projected
    corner hull misses every camera canvas — the reference OMITS such
    detections from the graph entirely ("Detection omitted",
    ``construct...parallel.py:231-236``), it does not keep them with a
    zero crop; pass ``cam_ok`` to ``scene_from_frames(camera_keep=...)``
    to replicate. The crop itself is attempted whenever the hull
    intersects the canvas, even with ZERO individually-visible corners (a
    close large object): corner visibility picks the camera, the hull
    decides the crop (reference ``:214-238``).
    """
    from PIL import Image

    cfg = cfg or Config()
    rng = rng or np.random.default_rng(0)
    want_img = "img" in modalities
    want_lidar = "lidar" in modalities
    want_radar = "radar" in modalities
    img_out: Optional[Dict[str, np.ndarray]] = {} if want_img else None
    lidar_out: Optional[Dict[str, np.ndarray]] = {} if want_lidar else None
    radar_out: Optional[Dict[str, np.ndarray]] = {} if want_radar else None
    cam_ok_out: Optional[Dict[str, np.ndarray]] = {} if want_img else None
    res = cfg.preprocessing.res_size

    for tok in sample_tokens:
        dets = detections.get(tok)
        k = len(dets) if dets is not None else 0
        cam_ok = np.ones(k, bool)
        # uint8 crops: lossless (PIL resize output is uint8), 4x smaller on
        # disk and over the host->device relay; /255 happens on device
        imgs = np.zeros((k, res, res, 3), np.uint8)
        lids = np.zeros((k, cfg.pointnet.num_points, 3), np.float32)
        rads = np.zeros((k, cfg.radarnet.num_points, 4), np.float32)
        if k:
            ego_t, ego_q = _ego_of_sample(tables, tok)
            c_e, q_e, _ = geo.boxes_global_to_ego(
                dets.center, dets.quat, dets.velocity, ego_t, ego_q
            )
            cams = (
                _cameras_of_sample(tables, tok)
                if (want_img or want_radar)
                else []
            )
            image_cache: Dict[str, np.ndarray] = {}
            radar_cache: Dict[str, np.ndarray] = {}
            pts_ego = None
            if want_lidar:
                pts = mod.multisweep_points(
                    tables, tok, "LIDAR_TOP",
                    cfg.preprocessing.nsweeps_lidar, mod.load_lidar_bin,
                )
                ref_sd = tables.sample_lidar_sd(tok)
                cs = tables.get(
                    "calibrated_sensor", ref_sd["calibrated_sensor_token"]
                )
                pts_ego = mod.sensor_to_ego(
                    pts, cs["translation"], np.array(cs["rotation"])
                )

            for i in range(k):
                cam_idx, vis = (
                    mod.select_camera(c_e[i], dets.wlh[i], q_e[i], cams)
                    if cams
                    else (None, 0)
                )
                if want_img and cams:
                    # corner visibility picks the camera; the projected
                    # hull decides the crop (it can intersect the canvas
                    # with zero individually-visible corners). A hull that
                    # misses every canvas marks the detection OMITTED —
                    # the reference drops it from the graph, not zero-fills
                    cam = cams[cam_idx]
                    coords = mod.crop_coords_for_box(
                        c_e[i], dets.wlh[i], q_e[i], cam
                    )
                    if coords is None:
                        cam_ok[i] = False
                    else:
                        fname = cam["filename"]
                        if fname not in image_cache:
                            image_cache[fname] = np.asarray(
                                Image.open(
                                    os.path.join(tables.dataroot, fname)
                                ).convert("RGB")
                            )
                        imgs[i] = mod.crop_and_resize(
                            image_cache[fname], coords, res
                        )
                if want_lidar and pts_ego is not None:
                    feat, _ = mod.lidar_node_feature(
                        pts_ego, c_e[i], dets.wlh[i], q_e[i],
                        min_pts=cfg.pointnet.min_lidar_pts,
                        pc_length=cfg.pointnet.num_points, rng=rng,
                    )
                    lids[i] = feat.T
                if want_radar and cams and cam_idx is not None:
                    channel = cams[cam_idx]["channel"]
                    if channel not in radar_cache:
                        chunks = []
                        for rc in mod.CAM_TO_RADAR.get(channel, ()):
                            try:
                                chunks.append(
                                    mod.multisweep_points(
                                        tables, tok, rc,
                                        cfg.preprocessing.nsweeps_radar,
                                        mod.load_radar_pcd_filtered,
                                        rotate_velocity_rows=(8, 9),
                                    )
                                )
                            except KeyError:
                                continue
                        if chunks:
                            rpts = np.concatenate(chunks, axis=1)
                            ref_sd = tables.sample_lidar_sd(tok)
                            cs = tables.get(
                                "calibrated_sensor",
                                ref_sd["calibrated_sensor_token"],
                            )
                            radar_cache[channel] = mod.sensor_to_ego(
                                rpts, cs["translation"], np.array(cs["rotation"])
                            )
                        else:
                            radar_cache[channel] = np.zeros((18, 0), np.float32)
                    rp = radar_cache[channel]
                    if rp.shape[1]:
                        feat, _ = mod.radar_node_feature(
                            rp, c_e[i], dets.wlh[i], q_e[i],
                            min_pts=cfg.radarnet.min_radar_pts,
                            pc_length=cfg.radarnet.num_points, rng=rng,
                        )
                        rads[i] = feat.T
        if want_img:
            img_out[tok] = imgs
            cam_ok_out[tok] = cam_ok
        if want_lidar:
            lidar_out[tok] = lids
        if want_radar:
            radar_out[tok] = rads
    return img_out, lidar_out, radar_out, cam_ok_out


# ---------------------------------------------------------------------------
# Encoder dataset batch iterators (reference utils/dataset.py equivalents)
# ---------------------------------------------------------------------------


def image_batches(
    dataroot: str,
    entries: List[dict],
    batch_size: int,
    res_size: int = 32,
    color_enhance: float = 2.0,
    rng: Optional[np.random.Generator] = None,
    shuffle: bool = True,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Cropped, color-enhanced (x2.0, reference dataset.py:155-156) image
    batches with 1-indexed class labels mapped to 0-indexed targets."""
    from PIL import Image, ImageEnhance

    rng = rng or np.random.default_rng()
    idx = np.arange(len(entries))
    if shuffle:
        rng.shuffle(idx)
    for lo in range(0, len(idx) - batch_size + 1, batch_size):
        imgs, labels = [], []
        for i in idx[lo : lo + batch_size]:
            e = entries[i]
            img = Image.open(os.path.join(dataroot, e["filename"])).convert("RGB")
            c = e["bbox_corners"]
            crop = img.crop((round(c[0]), round(c[1]), round(c[2]), round(c[3])))
            crop = ImageEnhance.Color(crop).enhance(color_enhance)
            crop = crop.resize((res_size, res_size), Image.BILINEAR)
            imgs.append(np.asarray(crop, np.float32) / 255.0)
            tname = CATEGORY_TO_TRACKING_NAME[e["category_name"]]
            labels.append(TRACKING_CLASSES[tname] - 1)
        yield np.stack(imgs), np.array(labels, np.int32)


def lidar_batches(
    npy_dir: str,
    entries: List[dict],
    batch_size: int,
    min_pts: int = 6,
    ego_rad: Tuple[float, float] = (1.0, 50.0),
    num_points: int = 128,
    augment: bool = False,
    rng: Optional[np.random.Generator] = None,
    shuffle: bool = True,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Normalized fixed-size lidar clouds + labels (reference
    PointCloudDataset + collate_lidar; augmentation applied here on demand,
    not baked into the .npy cache)."""
    rng = rng or np.random.default_rng()
    valid = [
        e
        for e in entries
        if e["num_lidar_pts"] > min_pts
        and ego_rad[0] < e["ann_ego_radius"] < ego_rad[1]
    ]
    idx = np.arange(len(valid))
    if shuffle:
        rng.shuffle(idx)
    for lo in range(0, len(idx) - batch_size + 1, batch_size):
        pcs, labels = [], []
        for i in idx[lo : lo + batch_size]:
            e = valid[i]
            pc = np.load(os.path.join(npy_dir, f"{e['sample_annotation_token']}.npy"))
            if augment:
                yaw = rng.uniform(-np.pi / 10, np.pi / 10)
                R = geo.quat_rotation_matrix(geo.yaw_to_quat(yaw))
                centroid = pc[0:3].mean(axis=1, keepdims=True)
                pc = pc.copy()
                pc[0:3] = R @ (pc[0:3] - centroid) + centroid
            pc = mod.reference_normalize(pc)
            pcs.append(mod.collate_fixed_size(pc, num_points, 3, rng).T)
            tname = CATEGORY_TO_TRACKING_NAME[e["category_name"]]
            labels.append(TRACKING_CLASSES[tname] - 1)
        yield np.stack(pcs), np.array(labels, np.int32)


def radar_batches(
    npy_dir: str,
    entries: List[dict],
    batch_size: int,
    min_pts: int = 2,
    ego_rad: Tuple[float, float] = (1.0, 50.0),
    num_points: int = 64,
    rng: Optional[np.random.Generator] = None,
    shuffle: bool = True,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Radar 4-vectors [x, y, vx_comp, vy_comp] + labels (reference
    RadarDataset + collate_radar; dataset-variant normalization)."""
    rng = rng or np.random.default_rng()
    valid = [
        e
        for e in entries
        if e["num_radar_pts"] >= min_pts
        and ego_rad[0] < e["ann_ego_radius"] < ego_rad[1]
    ]
    idx = np.arange(len(valid))
    if shuffle:
        rng.shuffle(idx)
    for lo in range(0, len(idx) - batch_size + 1, batch_size):
        pcs, labels = [], []
        for i in idx[lo : lo + batch_size]:
            e = valid[i]
            pc = np.load(os.path.join(npy_dir, f"{e['sample_annotation_token']}.npy"))
            pc = mod.encoder_dataset_normalize(pc)
            vec = pc[[0, 1, 8, 9], :]
            pcs.append(mod.collate_fixed_size(vec, num_points, 4, rng).T)
            tname = CATEGORY_TO_TRACKING_NAME[e["category_name"]]
            labels.append(TRACKING_CLASSES[tname] - 1)
        yield np.stack(pcs), np.array(labels, np.int32)


# ---------------------------------------------------------------------------
# Device-resident encoder datasets (one host pass; per-epoch randomness —
# augmentation, subsampling — moves IN-GRAPH, train/encoders.py transforms)
# ---------------------------------------------------------------------------


def _entry_label(e: dict) -> int:
    return TRACKING_CLASSES[CATEGORY_TO_TRACKING_NAME[e["category_name"]]] - 1


def materialize_image_dataset(
    dataroot: str, entries: List[dict], res_size: int = 32,
    color_enhance: float = 2.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Every crop decoded ONCE -> (uint8 [N, R, R, 3], labels [N]) for
    DEVICE-RESIDENT encoder training (``EncoderTrainer.fit_device``).
    uint8 storage is 4x smaller than f32 on device; the in-graph transform
    casts /255 — bit-identical to ``image_batches``'s host conversion.
    (The reference re-decodes every crop every epoch,
    ``utils/dataset.py:146-160`` — on this machine's single host core that,
    not the accelerator, bounds epoch time.)"""
    from PIL import Image, ImageEnhance

    imgs, labels = [], []
    for e in entries:
        img = Image.open(os.path.join(dataroot, e["filename"])).convert("RGB")
        c = e["bbox_corners"]
        crop = img.crop((round(c[0]), round(c[1]), round(c[2]), round(c[3])))
        crop = ImageEnhance.Color(crop).enhance(color_enhance)
        crop = crop.resize((res_size, res_size), Image.BILINEAR)
        imgs.append(np.asarray(crop, np.uint8))
        labels.append(_entry_label(e))
    return np.stack(imgs), np.array(labels, np.int32)


def materialize_lidar_dataset(
    npy_dir: str,
    entries: List[dict],
    min_pts: int = 6,
    ego_rad: Tuple[float, float] = (1.0, 50.0),
    num_points: int = 128,
    cap_factor: int = 4,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """RAW (un-augmented, un-normalized) per-annotation clouds, zero-padded
    to one width -> (clouds f32 [N, C, Kcap], counts i32 [N], labels [N]).
    ALL stored channels are kept: the reference's quirky normalization
    mixes xyz with intensity/ring/time (``reference_normalize``), so the
    in-graph transform needs them even though the model consumes only the
    first 3. Augmentation, normalization and the fixed-size collate all
    run IN-GRAPH per epoch (``train/encoders.lidar_transform``) so the
    per-epoch randomness of the host loader is preserved. Clouds beyond
    Kcap = cap_factor * num_points are subsampled once at load (only
    those rare clouds lose re-draw diversity across epochs)."""
    rng = rng or np.random.default_rng(0)
    valid = [
        e for e in entries
        if e["num_lidar_pts"] > min_pts
        and ego_rad[0] < e["ann_ego_radius"] < ego_rad[1]
    ]
    kcap = max(1, cap_factor * num_points)
    clouds, counts, labels = [], [], []
    nch = None
    for e in valid:
        pc = np.load(
            os.path.join(npy_dir, f"{e['sample_annotation_token']}.npy")
        )
        if nch is None:
            nch = pc.shape[0]
        assert pc.shape[0] == nch, (pc.shape, nch)
        k = pc.shape[1]
        if k > kcap:
            pc = pc[:, rng.choice(k, size=kcap, replace=False)]
            k = kcap
        out = np.zeros((nch, kcap), np.float32)
        out[:, :k] = pc
        clouds.append(out)
        counts.append(k)
        labels.append(_entry_label(e))
    if not clouds:
        return (
            np.zeros((0, 4, kcap), np.float32),
            np.zeros((0,), np.int32),
            np.zeros((0,), np.int32),
        )
    return (
        np.stack(clouds),
        np.array(counts, np.int32),
        np.array(labels, np.int32),
    )


def materialize_radar_dataset(
    npy_dir: str,
    entries: List[dict],
    min_pts: int = 2,
    ego_rad: Tuple[float, float] = (1.0, 50.0),
    num_points: int = 64,
    cap_factor: int = 4,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Normalized radar 4-vectors [x, y, vx_comp, vy_comp], zero-padded to
    one width -> (vecs f32 [N, 4, Kcap], counts i32 [N], labels [N]).
    Normalization is deterministic (``encoder_dataset_normalize``) so it
    runs here; only the fixed-size collate subsample is per-epoch random
    and moves in-graph (``train/encoders.radar_transform``)."""
    rng = rng or np.random.default_rng(0)
    valid = [
        e for e in entries
        if e["num_radar_pts"] >= min_pts
        and ego_rad[0] < e["ann_ego_radius"] < ego_rad[1]
    ]
    kcap = max(1, cap_factor * num_points)
    vecs, counts, labels = [], [], []
    for e in valid:
        pc = np.load(
            os.path.join(npy_dir, f"{e['sample_annotation_token']}.npy")
        )
        pc = mod.encoder_dataset_normalize(pc)
        vec = pc[[0, 1, 8, 9], :].astype(np.float32)
        k = vec.shape[1]
        if k > kcap:
            vec = vec[:, rng.choice(k, size=kcap, replace=False)]
            k = kcap
        out = np.zeros((4, kcap), np.float32)
        out[:, :k] = vec
        vecs.append(out)
        counts.append(k)
        labels.append(_entry_label(e))
    if not vecs:
        return (
            np.zeros((0, 4, kcap), np.float32),
            np.zeros((0,), np.int32),
            np.zeros((0,), np.int32),
        )
    return (
        np.stack(vecs),
        np.array(counts, np.int32),
        np.array(labels, np.int32),
    )
