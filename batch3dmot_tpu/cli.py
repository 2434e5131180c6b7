"""Command-line interface.

Replaces the reference's per-stage scripts (``preprocess_*.py``,
``construct_detection_graph_*.py``, ``train*.py``, ``predict.py``,
``eval_nuscenes.py``) with one config-driven entry point:

    python -m batch3dmot_tpu.cli build-graphs --config cfg.yaml [--synthetic N]
    python -m batch3dmot_tpu.cli train-gnn    --config cfg.yaml [--model pose|mm]
    python -m batch3dmot_tpu.cli train-resnet | train-pointnet | train-radarnet
    python -m batch3dmot_tpu.cli predict      --config cfg.yaml --checkpoint ck
    python -m batch3dmot_tpu.cli eval         --submission sub.json --gt gt.json
    python -m batch3dmot_tpu.cli demo         # full synthetic pipeline

Every command accepts ``--set section.key=value`` overrides. On a machine
with the nuScenes dataset, ``build-graphs`` reads the tables natively
(:mod:`batch3dmot_tpu.data.nuscenes_tables`) and the detector JSONs
configured under ``detections``; without it, ``--synthetic`` generates
fixed-seed scenes so the entire pipeline runs anywhere.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time
from typing import List, Optional

import numpy as np

from batch3dmot_tpu.config import Config


def _load_config(args) -> Config:
    cfg = Config.from_yaml(args.config) if args.config else Config()
    if args.set:
        cfg.apply_overrides(args.set)
    return cfg


def _store_dir(cfg: Config) -> str:
    return cfg.paths.graphs_dir


def _active_modalities(cfg: Config):
    """Sensor subset from main.sensors_used — the graduated config family
    (poses-only / +camera / +lidar / full multimodal, BASELINE.md)."""
    mods = tuple(
        m for m in ("img", "lidar", "radar") if cfg.main.sensors_used.get(m)
    )
    return mods or ("img", "lidar", "radar")


def _build_synthetic_scenes(cfg: Config, num_scenes: int, with_mods: bool):
    from batch3dmot_tpu.data.synthetic import make_synthetic_scene

    return [
        make_synthetic_scene(
            seed=s,
            num_frames=14,
            num_tracks=10,
            with_modalities=with_mods,
        )
        for s in range(num_scenes)
    ]


def cmd_build_graphs(args) -> None:
    cfg = _load_config(args)
    from batch3dmot_tpu.graphs import build_scene_graphs
    from batch3dmot_tpu.io import save_scene_graphs

    out_dir = _store_dir(cfg)
    window_len = cfg.graph_construction.batch_size_graph
    t0 = time.time()
    total_windows = total_edges = 0

    if args.synthetic:
        scenes = _build_synthetic_scenes(
            cfg, args.synthetic, cfg.main.sensors_used.get("img", False)
        )
    else:
        scenes = _load_nuscenes_scenes(cfg)

    for scene in scenes:
        # idempotent / restartable per scene (the reference resumes by
        # hand-slicing the scene list, SURVEY.md §5)
        out_path = os.path.join(
            out_dir, f"{scene.scene_token}_len{window_len}.b3d"
        )
        if getattr(args, "skip_existing", False) and os.path.exists(out_path):
            continue
        windows = list(
            build_scene_graphs(scene, window_len, cfg.graph_construction)
        )
        if not windows:
            continue
        save_scene_graphs(windows, out_dir, metadata=scene.metadata)
        total_windows += len(windows)
        total_edges += sum(w.num_edges for w in windows)
    dt = time.time() - t0
    print(
        f"build-graphs: {len(scenes)} scenes, {total_windows} windows, "
        f"{total_edges} edges -> {out_dir} in {dt:.1f}s"
    )


def _load_nuscenes_scenes(cfg: Config):
    from batch3dmot_tpu.data.detections import load_detection_results, scene_from_frames
    from batch3dmot_tpu.data.nuscenes_tables import NuScenesTables

    tables = NuScenesTables(cfg.paths.data, cfg.main.version)
    split_key = (
        "mini" if cfg.main.version == "v1.0-mini" else cfg.graph_construction.split
    )
    det_path = (
        cfg.detections.get(cfg.main.detections, {}).get(split_key)
        if cfg.detections
        else None
    )
    if det_path is None:
        raise SystemExit(
            f"No detection JSON configured for detector={cfg.main.detections} "
            f"split={split_key}; set detections.{cfg.main.detections}.{split_key}"
        )
    dets = load_detection_results(os.path.join(cfg.paths.detections_dir, det_path))
    scenes = []
    for split, metas in tables.split_scene_lists().items():
        for meta in metas:
            toks, ego_t, ego_q = tables.scene_ego_poses(meta["token"])
            gt = tables.scene_gt(meta["token"])
            scenes.append(
                scene_from_frames(
                    meta["token"], toks, dets, gt, ego_t, ego_q,
                    cfg.graph_construction,
                    ego_rad_min=cfg.pointnet.ego_rad_min,
                    ego_rad_max=cfg.pointnet.ego_rad_max,
                )
            )
    return scenes


def _load_stores(cfg: Config):
    from batch3dmot_tpu.io import GraphStoreReader

    paths = sorted(glob.glob(os.path.join(_store_dir(cfg), "*.b3d")))
    if not paths:
        raise SystemExit(
            f"No .b3d graph stores under {_store_dir(cfg)}; run build-graphs first"
        )
    return paths


def cmd_train_gnn(args) -> None:
    cfg = _load_config(args)
    from batch3dmot_tpu.io import GraphStoreReader
    from batch3dmot_tpu.models import MultimodalGNN, PoseGNN
    from batch3dmot_tpu.train import GNNTrainer
    from batch3dmot_tpu.train.data import to_padded
    from batch3dmot_tpu.train.store_data import make_batcher
    from batch3dmot_tpu.graph import pick_bucket
    from batch3dmot_tpu.utils.metric_logging import MetricWriter

    store_paths = _load_stores(cfg)
    n_val_scenes = max(1, len(store_paths) // 10)
    train_paths = store_paths[:-n_val_scenes] or store_paths
    val_paths = store_paths[-n_val_scenes:]

    if args.model == "pose":
        model = PoseGNN(depth=cfg.gnn.gnn_depth, knn_conv_mode=cfg.gnn.knn_conv_mode)
    else:
        model = MultimodalGNN(
            depth=cfg.gnn.gnn_depth,
            use_attention=cfg.gnn.attention,
            knn_conv_mode=cfg.gnn.knn_conv_mode,
            modalities=_active_modalities(cfg),
        )

    first = GraphStoreReader(store_paths[0]).window(0)
    bucket = pick_bucket(max(first.num_nodes, 1), max(first.num_edges, 1))
    example = to_padded(first, *bucket)
    trainer = GNNTrainer(model, example, cfg.gnn)
    if args.init_checkpoint:
        from batch3dmot_tpu.utils.checkpoint import load_checkpoint

        trainer_vars = load_checkpoint(args.init_checkpoint, trainer.variables)
        trainer.state = trainer.state.replace(
            params=trainer_vars.pop("params"), extra_variables=trainer_vars
        )
    train_batcher = make_batcher(train_paths, cfg.gnn.batch_size)
    val_batcher = make_batcher(val_paths, cfg.gnn.batch_size) if val_paths else None
    print(
        f"train-gnn: {len(store_paths)} scene stores, "
        f"{len(train_batcher)} train batches/epoch"
    )
    log_dir = os.path.join(cfg.paths.models, "gnn")
    history = trainer.fit(
        train_batcher,
        val_batcher,
        epochs=args.epochs or cfg.gnn.num_epochs,
        log_dir=log_dir,
        version=cfg.main.version,
        writer=MetricWriter(log_dir),
        fused_steps=getattr(args, "fused_steps", 8),
    )
    print(f"train-gnn: done, checkpoints in {log_dir}")


def _encoder_cmd(args, make_trainer, prefix: str) -> None:
    cfg = _load_config(args)
    # Without the dataset, train on synthetic batches (shape-compatible).
    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    if prefix == "resnet":
        batches = [
            jnp.asarray(rng.random((8, 32, 32, 3), dtype=np.float32))
            for _ in range(16)
        ]
    else:
        pts_shape = (8, 128, 3) if prefix == "pointnet" else (8, 64, 4)
        batches = [
            (
                jnp.asarray(rng.standard_normal(pts_shape).astype(np.float32)),
                jnp.asarray(rng.integers(0, 7, 8)),
            )
            for _ in range(16)
        ]
    trainer = make_trainer(steps_per_epoch=len(batches))
    trainer.fit(
        lambda: iter(batches),
        epochs=args.epochs or 2,
        log_dir=os.path.join(cfg.paths.models, prefix),
        prefix=prefix,
    )


def cmd_train_resnet(args) -> None:
    from batch3dmot_tpu.train.encoders import make_resnet_trainer

    cfg = _load_config(args)
    _encoder_cmd(args, lambda **kw: make_resnet_trainer(cfg.resnet, **kw), "resnet")


def cmd_train_pointnet(args) -> None:
    from batch3dmot_tpu.train.encoders import make_pointnet_trainer

    cfg = _load_config(args)
    _encoder_cmd(args, lambda **kw: make_pointnet_trainer(cfg.pointnet, **kw), "pointnet")


def cmd_train_radarnet(args) -> None:
    from batch3dmot_tpu.train.encoders import make_radarnet_trainer

    cfg = _load_config(args)
    _encoder_cmd(args, lambda **kw: make_radarnet_trainer(cfg.radarnet, **kw), "radarnet")


def cmd_predict(args) -> None:
    cfg = _load_config(args)
    _run_predict(cfg, args.checkpoint, args.model)


def _run_predict(cfg: Config, checkpoint: Optional[str], model_kind: str):
    import jax

    from batch3dmot_tpu.graph import pick_bucket
    from batch3dmot_tpu.infer.predict import make_scorer, predict_scene
    from batch3dmot_tpu.infer.tracks import (
        assemble_submission,
        hierarchical_clusters,
        scene_results,
    )
    from batch3dmot_tpu.io import GraphStoreReader
    from batch3dmot_tpu.models import MultimodalGNN, PoseGNN
    from batch3dmot_tpu.train.data import to_padded
    from batch3dmot_tpu.utils.checkpoint import load_checkpoint

    paths = _load_stores(cfg)
    model = (
        PoseGNN(depth=cfg.gnn.gnn_depth, knn_conv_mode=cfg.gnn.knn_conv_mode)
        if model_kind == "pose"
        else MultimodalGNN(
            depth=cfg.gnn.gnn_depth,
            use_attention=cfg.gnn.attention,
            knn_conv_mode=cfg.gnn.knn_conv_mode,
            modalities=_active_modalities(cfg),
        )
    )

    # init from first window for structure, then load checkpoint
    first = GraphStoreReader(paths[0]).window(0)
    bucket = pick_bucket(first.num_nodes, max(first.num_edges, 1))
    example = to_padded(first, *bucket)
    variables = jax.jit(model.init)(jax.random.key(0), example)
    if checkpoint:
        variables = load_checkpoint(checkpoint, variables)
    scorer = make_scorer(model, variables)

    all_results = []
    all_tokens: List[str] = []
    edge_scores_dir = os.path.join(cfg.paths.eval, "predict")
    os.makedirs(edge_scores_dir, exist_ok=True)
    track_offset = 0
    t0 = time.time()
    n_edges = 0
    for path in paths:
        reader = GraphStoreReader(path)
        windows = reader.windows()
        scene = _scene_stub_from_store(path, windows)
        pred_edges, avg_scores = predict_scene(
            scorer, scene, windows, cfg
        )
        with open(
            os.path.join(
                edge_scores_dir, f"{scene.scene_token}_edge_scores.json"
            ),
            "w",
        ) as f:
            json.dump({str(k): v for k, v in avg_scores.items()}, f)
        cats = {i: m["category_name"] for i, m in enumerate(scene.metadata)}
        tracks = hierarchical_clusters(
            pred_edges, cats, cfg.predict.join_score_thresholds
        )
        all_results.append(
            scene_results(
                tracks,
                scene,
                cfg.predict.interpolate_trailer_tracks,
                track_id_offset=track_offset,
            )
        )
        track_offset += len(tracks)
        n_edges += sum(w.num_edges for w in windows)
        from batch3dmot_tpu.infer.tracks import all_scene_sample_tokens

        all_tokens.extend(all_scene_sample_tokens(scene))
    dt = time.time() - t0

    submission = assemble_submission(
        all_results,
        all_tokens,
        use_camera=cfg.main.sensors_used.get("img", True),
        use_lidar=cfg.main.sensors_used.get("lidar", True),
        use_radar=False,
    )
    os.makedirs(cfg.paths.eval, exist_ok=True)
    sub_path = os.path.join(cfg.paths.eval, "submission.json")
    with open(sub_path, "w") as f:
        json.dump(submission, f)
    print(
        f"predict: {len(paths)} scenes, {n_edges} edges scored in {dt:.1f}s "
        f"({n_edges / max(dt, 1e-9):.0f} edges/s) -> {sub_path}"
    )
    return submission


def _scene_stub_from_store(path: str, windows):
    """Reconstruct the minimal SceneDetections view needed by prediction
    from a store + its metadata sidecar."""
    from batch3dmot_tpu.data.types import SceneDetections

    meta_path = path.replace(".b3d", "_metadata.json")
    with open(meta_path, "r") as f:
        metadata = json.load(f)
    m = len(metadata)
    scene_token = os.path.basename(path).split("_len")[0]
    frame_idx = np.array([md["time"] for md in metadata], np.int32)
    from batch3dmot_tpu.config import TRACKING_CLASSES

    class_id = np.array(
        [TRACKING_CLASSES[md["category_name"]] for md in metadata], np.int32
    )
    center_g = np.array([md["translation"] for md in metadata], float).reshape(m, 3)
    num_frames = int(frame_idx.max()) + 1 if m else 0
    zeros3 = np.zeros((m, 3))
    zeros = np.zeros((m,))
    token_map = {}
    token_id = np.full(m, -1, np.int32)
    for i, md in enumerate(metadata):
        tok = md.get("token")
        if tok:
            token_id[i] = token_map.setdefault(tok, len(token_map))
    return SceneDetections(
        scene_token=scene_token,
        num_frames=num_frames,
        frame_idx=frame_idx,
        center_g=center_g,
        yaw_g=zeros,
        vel_g=zeros3,
        center_e=zeros3,
        yaw_e=zeros,
        vel_e=zeros3,
        wlh=np.array([md["size"] for md in metadata], float).reshape(m, 3),
        class_id=class_id,
        score=np.array([md["score"] for md in metadata], float),
        token_id=token_id,
        metadata=metadata,
    )


def cmd_export_gt(args) -> None:
    """Export GT tracking boxes from the nuScenes tables into the JSON the
    native evaluator consumes ({"boxes": [...]}) — lets `eval` run without
    the devkit."""
    cfg = _load_config(args)
    from batch3dmot_tpu.data.nuscenes_tables import NuScenesTables

    from batch3dmot_tpu.config import TRACKING_CLASSES

    tables = NuScenesTables(cfg.paths.data, cfg.main.version)
    id2name = {v: k for k, v in TRACKING_CLASSES.items()}
    boxes = []
    frames = []
    for scene in tables.scenes:
        for tok in tables.scene_sample_tokens(scene["token"]):
            frames.append(tok)
            gt = tables.gt_frame_boxes(tok)
            for i in range(len(gt)):
                boxes.append(
                    {
                        "sample_token": tok,
                        "translation": gt.center[i].tolist(),
                        "tracking_name": id2name[int(gt.class_id[i])],
                        "instance": gt.instance[i],
                    }
                )
    with open(args.out, "w") as f:
        json.dump({"boxes": boxes, "frames": frames}, f)
    print(f"export-gt: {len(boxes)} boxes over {len(frames)} frames -> {args.out}")


def cmd_eval(args) -> None:
    from batch3dmot_tpu.eval.tracking_metrics import evaluate_tracking

    with open(args.submission) as f:
        submission = json.load(f)
    with open(args.gt) as f:
        gt = json.load(f)
    pred_boxes = [b for boxes in submission["results"].values() for b in boxes]
    frames = list(submission["results"].keys())
    res = evaluate_tracking(gt["boxes"], pred_boxes, frames)
    print(res.summary())
    print(json.dumps({"amota": res.amota, "amotp": res.amotp}))


def cmd_demo(args) -> None:
    """Full synthetic pipeline: build -> train -> predict -> eval."""
    import tempfile

    from batch3dmot_tpu.eval.tracking_metrics import (
        evaluate_tracking,
        gt_boxes_from_scene,
    )

    tmp = tempfile.mkdtemp(prefix="b3d_demo_")
    args.config = None
    args.set = (args.set or []) + [
        f"paths.tmp={tmp}",
        "graph_construction.batch_size_graph=3",
        "graph_construction.top_knn_nodes=5",
        "gnn.gnn_depth=2",
        "gnn.lr=1e-3",
        "gnn.weight_decay=0.0",
    ]
    args.synthetic = args.synthetic or 3
    cmd_build_graphs(args)

    args.model = "pose"
    args.epochs = args.epochs or 6
    args.init_checkpoint = None
    cmd_train_gnn(args)

    cfg = _load_config(args)
    ckpts = sorted(
        glob.glob(os.path.join(cfg.paths.models, "gnn", "*.msgpack")),
        key=os.path.getmtime,
    )
    submission = _run_predict(cfg, ckpts[-1] if ckpts else None, "pose")

    # evaluate against the synthetic GT
    scenes = _build_synthetic_scenes(cfg, args.synthetic, False)
    gt_boxes = [b for s in scenes for b in gt_boxes_from_scene(s)]
    pred_boxes = [b for boxes in submission["results"].values() for b in boxes]
    frames = list(submission["results"].keys())
    res = evaluate_tracking(gt_boxes, pred_boxes, frames)
    print(res.summary())
    print(f"demo complete: AMOTA={res.amota:.3f} (artifacts in {tmp})")


def main(argv: Optional[List[str]] = None) -> None:
    parser = argparse.ArgumentParser(prog="batch3dmot_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    def common(p):
        p.add_argument("--config", type=str, default=None)
        p.add_argument("--set", action="append", default=[],
                       help="override section.key=value")
        return p

    p = common(sub.add_parser("build-graphs"))
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate N synthetic scenes instead of nuScenes")
    p.add_argument("--skip-existing", action="store_true",
                   help="skip scenes whose store already exists (resume)")
    p.set_defaults(fn=cmd_build_graphs)

    p = common(sub.add_parser("train-gnn"))
    p.add_argument("--model", choices=["pose", "mm"], default="mm")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--init-checkpoint", type=str, default=None)
    p.add_argument("--fused-steps", type=int, default=8,
                   help="optimizer steps fused into one device program")
    p.set_defaults(fn=cmd_train_gnn)

    for name, fn in [
        ("train-resnet", cmd_train_resnet),
        ("train-pointnet", cmd_train_pointnet),
        ("train-radarnet", cmd_train_radarnet),
    ]:
        p = common(sub.add_parser(name))
        p.add_argument("--epochs", type=int, default=None)
        p.set_defaults(fn=fn)

    p = common(sub.add_parser("predict"))
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--model", choices=["pose", "mm"], default="mm")
    p.set_defaults(fn=cmd_predict)

    p = common(sub.add_parser("export-gt"))
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_export_gt)

    p = common(sub.add_parser("eval"))
    p.add_argument("--submission", required=True)
    p.add_argument("--gt", required=True)
    p.set_defaults(fn=cmd_eval)

    p = common(sub.add_parser("demo"))
    p.add_argument("--synthetic", type=int, default=3)
    p.add_argument("--epochs", type=int, default=None)
    p.set_defaults(fn=cmd_demo)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
