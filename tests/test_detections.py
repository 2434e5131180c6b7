"""Tests for detection loading and GT matching (rebuilt match_detections)."""

import json
import os

import numpy as np
import pytest

from batch3dmot_tpu import geometry as geo
from batch3dmot_tpu.config import GraphConstructionConfig, TRACKING_CLASSES
from batch3dmot_tpu.data.detections import (
    FrameBoxes,
    load_detection_results,
    match_frame,
    scene_from_frames,
)


def _boxes(centers, cls_ids, scores=None, instances=None, yaws=None):
    k = len(centers)
    centers = np.array(centers, float)
    if centers.shape[1] == 2:
        centers = np.hstack([centers, np.zeros((k, 1))])
    yaws = np.zeros(k) if yaws is None else np.array(yaws)
    return FrameBoxes(
        center=centers,
        wlh=np.tile([2.0, 4.0, 1.5], (k, 1)),
        quat=geo.yaw_to_quat(yaws),
        velocity=np.zeros((k, 3)),
        class_id=np.array(cls_ids, np.int32),
        score=np.ones(k) if scores is None else np.array(scores, float),
        instance=[None] * k if instances is None else list(instances),
    )


CAR = TRACKING_CLASSES["car"]
PED = TRACKING_CLASSES["pedestrian"]


def test_match_center_dist_basic():
    dets = _boxes([[0, 0], [10, 0]], [CAR, CAR])
    gt = _boxes([[0.5, 0], [10.4, 0]], [CAR, CAR], instances=["a", "b"])
    assigned = match_frame(dets, gt)
    assert assigned == ["a", "b"]


def test_match_respects_class():
    dets = _boxes([[0, 0]], [CAR])
    gt = _boxes([[0.1, 0]], [PED], instances=["p"])
    assert match_frame(dets, gt) == [None]


def test_match_distance_gate():
    dets = _boxes([[0, 0]], [CAR])
    gt = _boxes([[3.0, 0]], [CAR], instances=["far"])
    assert match_frame(dets, gt, dist_thresh=2.0) == [None]
    assert match_frame(dets, gt, dist_thresh=4.0) == ["far"]


def test_match_greedy_by_score():
    # two detections near one GT: the higher-score detection wins
    dets = _boxes([[0.2, 0], [0.1, 0]], [CAR, CAR], scores=[0.9, 0.5])
    gt = _boxes([[0, 0]], [CAR], instances=["g"])
    assert match_frame(dets, gt) == ["g", None]


def test_match_iou_mode():
    dets = _boxes([[0.5, 0]], [CAR])
    gt = _boxes([[0, 0]], [CAR], instances=["g"])
    assert match_frame(dets, gt, method="iou") == ["g"]
    gt_far = _boxes([[30, 0]], [CAR], instances=["g"])
    assert match_frame(dets, gt_far, method="iou") == [None]


def test_load_detection_results(tmp_path):
    data = {
        "results": {
            "tok1": [
                {
                    "sample_token": "tok1",
                    "translation": [1, 2, 0.5],
                    "size": [2, 4, 1.5],
                    "rotation": [1, 0, 0, 0],
                    "velocity": [1.0, 0.0],
                    "detection_name": "car",
                    "detection_score": 0.8,
                },
                {
                    "sample_token": "tok1",
                    "translation": [5, 5, 0.5],
                    "size": [0.5, 0.5, 1],
                    "rotation": [1, 0, 0, 0],
                    "velocity": [0, 0],
                    "detection_name": "traffic_cone",  # not a tracking class
                    "detection_score": 0.9,
                },
            ]
        }
    }
    p = tmp_path / "dets.json"
    p.write_text(json.dumps(data))
    out = load_detection_results(str(p))
    assert len(out["tok1"]) == 1
    assert out["tok1"].class_id[0] == CAR
    np.testing.assert_allclose(out["tok1"].velocity[0], [1, 0, 0])


def test_scene_from_frames_end_to_end():
    # two frames; ego at origin then moved; one GT car tracked across both
    tokens = ["s0", "s1"]
    dets = {
        "s0": _boxes([[10, 0], [0.2, 0]], [CAR, CAR], scores=[0.9, 0.8]),
        "s1": _boxes([[12, 0]], [CAR], scores=[0.85]),
    }
    gt = {
        "s0": _boxes([[10.1, 0]], [CAR], instances=["inst1"]),
        "s1": _boxes([[12.1, 0]], [CAR], instances=["inst1"]),
    }
    ego_t = np.zeros((2, 3))
    ego_q = np.tile([1.0, 0, 0, 0], (2, 1))
    scene = scene_from_frames(
        "sc", tokens, dets, gt, ego_t, ego_q,
        GraphConstructionConfig(),
    )
    # detection at 0.2m from ego violates the 1m min radius gate
    assert scene.num_detections == 2
    assert scene.frame_idx.tolist() == [0, 1]
    # both matched to the same instance -> same token_id
    assert scene.token_id[0] == scene.token_id[1] >= 0
    assert scene.metadata[0]["token"] == "inst1"
    assert scene.metadata[0]["category_name"] == "car"


def test_scene_from_frames_radius_gate_max():
    tokens = ["s0"]
    dets = {"s0": _boxes([[60, 0], [30, 0]], [CAR, CAR])}
    ego_t = np.zeros((1, 3))
    ego_q = np.array([[1.0, 0, 0, 0]])
    scene = scene_from_frames("sc", tokens, dets, None, ego_t, ego_q)
    assert scene.num_detections == 1
    assert scene.token_id[0] == -1  # no GT -> unmatched


def test_scene_ego_frame_conversion():
    tokens = ["s0"]
    dets = {"s0": _boxes([[10, 5]], [CAR], yaws=[0.5])}
    ego_t = np.array([[8.0, 5.0, 0.0]])
    ego_q = geo.yaw_to_quat(np.array([0.5]))
    scene = scene_from_frames("sc", tokens, dets, None, ego_t, ego_q)
    # ego-frame center = R(-0.5) @ [2, 0, 0]
    np.testing.assert_allclose(
        scene.center_e[0],
        [2 * np.cos(0.5), -2 * np.sin(0.5), 0],
        atol=1e-9,
    )
    assert scene.yaw_e[0] == pytest.approx(0.0, abs=1e-9)
    # global values preserved
    np.testing.assert_allclose(scene.center_g[0], [10, 5, 0])


def test_load_detection_results_nan_velocity(tmp_path):
    data = {"results": {"t": [{
        "translation": [1, 2, 0.5], "size": [2, 4, 1.5],
        "rotation": [1, 0, 0, 0], "velocity": [float("nan"), float("nan")],
        "detection_name": "car", "detection_score": 0.7,
    }]}}
    p = tmp_path / "d.json"
    p.write_text(json.dumps(data))
    out = load_detection_results(str(p))
    assert np.isfinite(out["t"].velocity).all()


def test_empty_frames_keep_real_sample_tokens(tmp_path):
    """Frames whose detections were ALL filtered out (empty detector
    output, class filter, ego-radius gate) — including TRAILING empty
    frames — must keep their REAL sample tokens in the submission: the
    official devkit asserts when the results keys don't exactly match the
    split's sample tokens (reference ``predict.py:472-495,574``). Covers
    scene_from_frames -> store round trip -> all_scene_sample_tokens."""
    from batch3dmot_tpu.graphs import build_scene_graphs
    from batch3dmot_tpu.infer.tracks import all_scene_sample_tokens
    from batch3dmot_tpu.io import save_scene_graphs

    # frame s1: only an out-of-radius det (gated away); frame s3 (LAST):
    # no detections at all
    tokens = ["s0", "s1", "s2", "s3"]
    dets = {
        "s0": _boxes([[10, 0]], [CAR], scores=[0.9]),
        "s1": _boxes([[60, 0]], [CAR], scores=[0.9]),
        "s2": _boxes([[11, 0]], [CAR], scores=[0.9]),
    }
    ego_t = np.zeros((4, 3))
    ego_q = np.tile([1.0, 0, 0, 0], (4, 1))
    scene = scene_from_frames("sc", tokens, dets, None, ego_t, ego_q)
    assert scene.frame_tokens == tokens
    assert scene.num_frames == 4  # trailing empty frame counted
    assert all_scene_sample_tokens(scene) == tokens

    # store round trip preserves the per-frame tokens (frames sidecar)
    from batch3dmot_tpu.cli import _scene_from_store

    windows = list(build_scene_graphs(scene, 2, GraphConstructionConfig()))
    path = save_scene_graphs(
        windows, str(tmp_path), scene_token="sc",
        metadata=scene.metadata, frame_tokens=scene.frame_tokens,
    )
    rebuilt = _scene_from_store(path, windows)
    assert rebuilt.frame_tokens == tokens
    assert rebuilt.num_frames == 4
    assert all_scene_sample_tokens(rebuilt) == tokens

    # legacy store (no frames sidecar): detection-derived fallback only
    os.remove(path.replace(".b3d", "_frames.json"))
    legacy = _scene_from_store(path, windows)
    assert legacy.frame_tokens is None
    # trailing empty frame is unknowable there; present frames infer real
    # tokens, absent MIDDLE frames synthesize the pattern token
    assert all_scene_sample_tokens(legacy) == ["s0", "sc_f1", "s2"]


def test_null_velocity_reads_as_zero(tmp_path):
    """Real detector JSONs emit explicit `"velocity": null` — it must read
    as zero like a missing field (validate-data classifies both as
    'treated as zero'), not crash list(None)."""
    data = {"results": {"tok1": [{
        "sample_token": "tok1", "translation": [1, 2, 0.5],
        "size": [2, 4, 1.5], "rotation": [1, 0, 0, 0],
        "velocity": None, "detection_name": "car", "detection_score": 0.8,
    }]}}
    p = tmp_path / "dets.json"
    p.write_text(json.dumps(data))
    out = load_detection_results(str(p))
    np.testing.assert_allclose(out["tok1"].velocity[0], [0, 0, 0])


def test_camera_keep_drops_detections():
    """camera_keep (extract_detection_modalities' cam_ok) removes
    detections whose box projects into no camera — the reference omits
    them from the graph entirely ('Detection omitted',
    construct...parallel.py:231-236)."""
    tokens = ["s0"]
    dets = {"s0": _boxes([[10, 0], [20, 0]], [CAR, CAR], scores=[0.9, 0.8])}
    ego_t = np.zeros((1, 3))
    ego_q = np.tile([1.0, 0, 0, 0], (1, 1))
    keep = {"s0": np.array([True, False])}
    scene = scene_from_frames(
        "sc", tokens, dets, None, ego_t, ego_q, camera_keep=keep
    )
    assert scene.num_detections == 1
    np.testing.assert_allclose(scene.center_g[0], [10, 0, 0])
