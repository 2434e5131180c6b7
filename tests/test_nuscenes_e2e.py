"""End-to-end integration over a fabricated nuScenes dataset + detection
JSON: the REAL (non-synthetic) CLI path — tables -> detection matching ->
graph stores -> training -> prediction -> GT export -> native eval."""

import glob
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from batch3dmot_tpu.cli import main
from batch3dmot_tpu.config import Config


@pytest.fixture(scope="module")
def fab(tmp_path_factory):
    from fab_nusc import make_fab_dataset

    root = make_fab_dataset(tmp_path_factory.mktemp("nusc_e2e"), num_samples=6)

    # detection JSON in nuScenes submission format: per sample one detection
    # near the GT car + one far false positive. The FP must project into
    # the (single, forward-facing) fab camera: camera-invisible detections
    # are OMITTED from the graph like the reference drops them
    # ("Detection omitted", construct...parallel.py:231-236) — that path
    # has its own test (test_camera_invisible_fp_omitted below).
    results = {}
    for i in range(6):
        car_x = 10.0 + 2.0 * i
        results[f"s{i}"] = [
            {
                "sample_token": f"s{i}",
                "translation": [car_x + 0.3, 0.1, 0.5],
                "size": [2, 4, 1.5],
                "rotation": [1, 0, 0, 0],
                "velocity": [2.0, 0.0],
                "detection_name": "car",
                "detection_score": 0.9,
            },
            {
                "sample_token": f"s{i}",
                "translation": [car_x + 15.0, 10.0, 0.5],
                "size": [2, 4, 1.5],
                "rotation": [1, 0, 0, 0],
                "velocity": [0.0, 0.0],
                "detection_name": "car",
                "detection_score": 0.2,
            },
        ]
    det_dir = os.path.join(root, "detections")
    os.makedirs(det_dir, exist_ok=True)
    with open(os.path.join(det_dir, "dets_mini.json"), "w") as f:
        json.dump({"results": results}, f)
    return root


def test_real_path_end_to_end(fab, tmp_path):
    overrides = [
        f"paths.data={fab}",
        f"paths.tmp={tmp_path}",
        f"paths.detections_dir={os.path.join(fab, 'detections')}",
        "main.version=v1.0-mini",
        "main.detections=megvii",
        "graph_construction.batch_size_graph=2",
        "graph_construction.top_knn_nodes=3",
        "gnn.gnn_depth=2",
        "gnn.batch_size=2",
    ]
    set_args = [x for o in overrides for x in ("--set", o)]
    cfg = Config()
    cfg.apply_overrides(overrides)

    # configure the detection JSON for the mini split
    det_cfg = ["--set", "main.detections=megvii"]
    import batch3dmot_tpu.cli as cli

    # inject detections table via config dict (CLI --set can't set nested
    # dict-of-dict; use a config file)
    cfg_file = tmp_path / "cfg.json"
    import yaml

    with open(cfg_file, "w") as f:
        yaml.safe_dump(
            {
                "main": {"version": "v1.0-mini", "detections": "megvii"},
                "paths": {
                    "data": str(fab),
                    "tmp": str(tmp_path),
                    "detections_dir": os.path.join(fab, "detections"),
                },
                "graph_construction": {"batch_size_graph": 2, "top_knn_nodes": 3},
                "gnn": {"gnn_depth": 2, "batch_size": 2, "lr": 1e-3,
                        "weight_decay": 0.0},
                "detections": {"megvii": {"mini": "dets_mini.json"}},
            },
            f,
        )

    main(["build-graphs", "--config", str(cfg_file)])
    stores = glob.glob(os.path.join(cfg.paths.graphs_dir, "*.b3d"))
    assert len(stores) == 1

    # verify GT matching attached the instance token to the near detections
    from batch3dmot_tpu.io import GraphStoreReader

    meta = json.load(open(stores[0].replace(".b3d", "_metadata.json")))
    matched = [m for m in meta if m["token"] == "inst_0"]
    assert len(matched) == 6  # one per frame
    fps = [m for m in meta if m["token"] is None]
    assert len(fps) == 6

    # positive labels exist (same instance across consecutive frames)
    reader = GraphStoreReader(stores[0])
    total_pos = sum(
        float(reader.array(i, "edge_label").sum()) for i in range(reader.num_windows)
    )
    assert total_pos >= 5  # one positive edge per window at least

    main(["train-gnn", "--config", str(cfg_file), "--model", "pose", "--epochs", "2"])
    ckpts = sorted(
        glob.glob(os.path.join(cfg.paths.models, "gnn", "*.msgpack")),
        key=os.path.getmtime,
    )
    assert ckpts

    main([
        "predict", "--config", str(cfg_file), "--model", "pose",
        "--checkpoint", ckpts[-1],
    ])
    sub_path = os.path.join(cfg.paths.eval, "submission.json")
    submission = json.load(open(sub_path))
    n_boxes = sum(len(v) for v in submission["results"].values())
    assert n_boxes > 0

    # GT export + native eval
    gt_path = str(tmp_path / "gt.json")
    main(["export-gt", "--config", str(cfg_file), "--out", gt_path])
    gt = json.load(open(gt_path))
    assert len(gt["boxes"]) == 6

    from batch3dmot_tpu.eval.tracking_metrics import evaluate_tracking

    pred_boxes = [b for boxes in submission["results"].values() for b in boxes]
    res = evaluate_tracking(gt["boxes"], pred_boxes, gt["frames"])
    # single well-separated car track: the tracker should nail it
    assert res.per_class["car"]["amota"] > 0.5, res.summary()


def test_camera_invisible_fp_omitted(fab, tmp_path):
    """A detection whose box projects into NO camera (here: behind the
    single forward-facing fab camera) is omitted from the graph when the
    camera sensor is in use — reference parity ('Detection omitted',
    construct...parallel.py:231-236, PARITY #29)."""
    import yaml

    det_dir = os.path.join(fab, "detections")
    results = {}
    for i in range(6):
        car_x = 10.0 + 2.0 * i
        results[f"s{i}"] = [
            {
                "sample_token": f"s{i}", "translation": [car_x + 0.3, 0.1, 0.5],
                "size": [2, 4, 1.5], "rotation": [1, 0, 0, 0],
                "velocity": [2.0, 0.0], "detection_name": "car",
                "detection_score": 0.9,
            },
            {  # behind the camera: hull misses the canvas
                "sample_token": f"s{i}", "translation": [-15.0, 2.0, 0.5],
                "size": [2, 4, 1.5], "rotation": [1, 0, 0, 0],
                "velocity": [0.0, 0.0], "detection_name": "car",
                "detection_score": 0.2,
            },
        ]
    with open(os.path.join(det_dir, "dets_behind.json"), "w") as f:
        json.dump({"results": results}, f)

    cfg_file = tmp_path / "cfg.json"
    with open(cfg_file, "w") as f:
        yaml.safe_dump(
            {
                "main": {"version": "v1.0-mini", "detections": "megvii"},
                "paths": {
                    "data": str(fab), "tmp": str(tmp_path),
                    "detections_dir": det_dir,
                },
                "graph_construction": {"batch_size_graph": 2, "top_knn_nodes": 3},
                "detections": {"megvii": {"mini": "dets_behind.json"}},
            },
            f,
        )
    main(["build-graphs", "--config", str(cfg_file)])
    cfg = Config.from_yaml(str(cfg_file))
    stores = glob.glob(os.path.join(cfg.paths.graphs_dir, "*.b3d"))
    assert len(stores) == 1
    meta = json.load(open(stores[0].replace(".b3d", "_metadata.json")))
    # only the 6 camera-visible matched detections survive
    assert len(meta) == 6
    assert all(m["token"] == "inst_0" for m in meta)
