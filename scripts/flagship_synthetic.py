"""Flagship synthetic run on the real TPU: full multimodal pipeline at
moderate scale. Trains the MultimodalGNN with precomputed encodings, predicts
held-out scenes with the encode-once scorer, and scores AMOTA with the native
evaluator. Results land in docs/RESULTS.md.

Usage: python scripts/flagship_synthetic.py [--epochs 8] [--scenes 12]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=12)
    ap.add_argument("--val-scenes", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--tracks", type=int, default=12)
    ap.add_argument("--fused-steps", type=int, default=8)
    ap.add_argument("--no-fused", action="store_true",
                    help="force XLA-autodiff training (A/B the kernels)")
    ap.add_argument("--host-batches", action="store_true",
                    help="per-batch host->device transfer (the default is "
                    "the device-resident dataset: upload once, one scanned "
                    "program per epoch — the per-epoch re-upload is the "
                    "wall-clock floor through the TPU relay)")
    # at trainval density (kNN 40, L=5) the demo-scale lr 1e-3 diverges —
    # use the reference's GNN lr (cl_config.yaml:100, 1e-4)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--device-pipeline", action="store_true")
    # reference production shape: cl_config.yaml:68-69 trains at kNN 40
    # with L=5 windows (VERDICT round-2 next #8)
    ap.add_argument("--window-len", type=int, default=3)
    ap.add_argument("--knn", type=int, default=8)
    # error-bar machinery (VERDICT r4 next #2): vary the training seed
    # (init + epoch shuffling; the scene data stays fixed), persist the
    # trained weights, and re-score a saved checkpoint on a different
    # held-out set size without retraining.
    ap.add_argument("--train-seed", type=int, default=0)
    ap.add_argument("--save-checkpoint", default="")
    ap.add_argument("--load-checkpoint", default="",
                    help="skip training; score this checkpoint on the "
                    "held-out scenes")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from batch3dmot_tpu.config import GNNConfig, GraphConstructionConfig
    from batch3dmot_tpu.data.synthetic import make_synthetic_scene
    from batch3dmot_tpu.eval.tracking_metrics import (
        evaluate_tracking,
        gt_boxes_from_scene,
    )
    from batch3dmot_tpu.graphs import build_scene_graphs
    from batch3dmot_tpu.infer.predict import make_scene_encoded_scorer, predict_scene
    from batch3dmot_tpu.infer.tracks import (
        all_scene_sample_tokens,
        hierarchical_clusters,
        scene_results,
    )
    from batch3dmot_tpu.models import MultimodalGNN
    from batch3dmot_tpu.train import GNNTrainer
    from batch3dmot_tpu.train.data import to_padded
    from batch3dmot_tpu.train.encoded import (
        EncodedGraphBatcher,
        precompute_scene_encodings,
    )

    gc = GraphConstructionConfig(
        top_knn_nodes=args.knn, batch_size_graph=args.window_len
    )
    L = args.window_len

    print(f"building {args.scenes}+{args.val_scenes} scenes ...", flush=True)
    t0 = time.time()
    model = MultimodalGNN(depth=args.depth)
    scene_windows = []
    for seed in range(args.scenes + args.val_scenes):
        scene = make_synthetic_scene(
            seed=seed,
            num_frames=args.frames,
            num_tracks=args.tracks,
            with_modalities=True,
            modality_dropout=0.25,
        )
        windows = [
            w for w in build_scene_graphs(scene, L, gc) if w.num_edges > 0
        ]
        scene_windows.append((scene, windows))
    # ONE bucket for the whole run, sized to the densest window (pick per
    # window and XLA compiles a program per variant — relay-expensive)
    from batch3dmot_tpu.graph import pick_bucket as _pick

    bucket = _pick(
        max(w.num_nodes for _, ws in scene_windows for w in ws),
        max(w.num_edges for _, ws in scene_windows for w in ws),
    )
    buckets = (bucket,)
    print(f"  bucket {bucket} (L={L}, knn={args.knn})", flush=True)

    trainer = None
    train_items = []
    val_scenes = []
    for seed, (scene, windows) in enumerate(scene_windows):
        if trainer is None:
            example = to_padded(windows[0], *buckets[0])
            trainer = GNNTrainer(
                model,
                example,
                GNNConfig(lr=args.lr, weight_decay=1e-4, batch_size=args.batch_size,
                          loss="cb"),
                fused=False if args.no_fused else "auto",
                seed=args.train_seed,
            )
        if seed < args.scenes:
            if not args.load_checkpoint:
                enc = precompute_scene_encodings(model, trainer.variables, scene)
                train_items.extend((w, enc) for w in windows)
        else:
            val_scenes.append((scene, windows))
    print(f"  data ready in {time.time()-t0:.1f}s: {len(train_items)} train windows", flush=True)

    if args.load_checkpoint:
        from batch3dmot_tpu.utils.checkpoint import load_checkpoint

        loaded = load_checkpoint(args.load_checkpoint, trainer.variables)
        trainer.state = trainer.state.replace(
            params=loaded.pop("params"), extra_variables=loaded
        )
        history = [{"train/avgprec": float("nan")}]
        steps, train_time = 0, float("nan")
        print(f"loaded checkpoint {args.load_checkpoint}", flush=True)

    t0 = time.time()
    if args.load_checkpoint:
        pass
    elif args.host_batches:
        batcher = EncodedGraphBatcher(
            train_items, batch_size=args.batch_size, buckets=buckets,
            uniform=True,
        )
        history = trainer.fit(
            batcher, epochs=args.epochs, verbose=True,
            fused_steps=args.fused_steps,
        )
        steps = len(batcher) * args.epochs
    else:
        # dedup form (one global embedding table, device-side gather):
        # same numbers as the dense per-window buffers at ~1/L the HBM
        from batch3dmot_tpu.train.encoded import (
            materialize_encoded_dataset_dedup,
        )

        ds = materialize_encoded_dataset_dedup(train_items, buckets=buckets)
        history = trainer.fit_device(
            ds, epochs=args.epochs, verbose=True, seed=args.train_seed
        )
        n_items = ds[0].pose.shape[0] - 1
        steps = (-(-n_items // args.batch_size)) * args.epochs
    if not args.load_checkpoint:
        train_time = time.time() - t0
        print(f"training: {train_time:.1f}s for {steps} steps "
              f"({steps/train_time:.1f} steps/s)", flush=True)
    if args.save_checkpoint:
        from batch3dmot_tpu.utils.checkpoint import save_checkpoint

        save_checkpoint(args.save_checkpoint, trainer.variables)
        print(f"saved checkpoint -> {args.save_checkpoint}", flush=True)

    if args.device_pipeline:
        from batch3dmot_tpu.infer.device_pipeline import predict_scene_device
    else:
        scorer = make_scene_encoded_scorer(model, trainer.variables)
    # run-global program shapes: one bucket + one m_pad across the val
    # scenes (per-scene shape variants each cost a compiled-program load)
    from batch3dmot_tpu.graph import pick_bucket
    from batch3dmot_tpu.infer.predict import _pad_detection_count

    sized = [
        (w.num_nodes, w.num_edges)
        for _, ws in val_scenes for w in ws if w.num_edges
    ]
    run_bucket = (
        pick_bucket(max(n for n, _ in sized), max(e for _, e in sized)),
    )
    run_m_pad = max(
        _pad_detection_count(s.num_detections) for s, _ in val_scenes
    )
    gt_boxes, pred_boxes, frames = [], [], []
    t0 = time.time()
    n_edges = 0
    for scene, windows in val_scenes:
        if args.device_pipeline:
            pred_edges, _ = predict_scene_device(
                model, trainer.variables, scene, window_len=L
            )
        else:
            pred_edges, _ = predict_scene(
                scorer, scene, windows, windows_per_batch=8,
                buckets=run_bucket, m_pad=run_m_pad,
            )
        cats = {i: m["category_name"] for i, m in enumerate(scene.metadata)}
        tracks = hierarchical_clusters(pred_edges, cats)
        results = scene_results(tracks, scene)
        pred_boxes.extend(b for boxes in results.values() for b in boxes)
        gt_boxes.extend(gt_boxes_from_scene(scene))
        frames.extend(all_scene_sample_tokens(scene))
        n_edges += sum(w.num_edges for w in windows)
    infer_time = time.time() - t0

    res = evaluate_tracking(gt_boxes, pred_boxes, frames)
    print(res.summary())
    summary = {
        "train_windows": len(train_items),
        "epochs": args.epochs,
        "train_seed": args.train_seed,
        "val_scenes": args.val_scenes,
        "final_train_ap": history[-1]["train/avgprec"],
        "steps_per_s": steps / train_time if steps else 0.0,
        "inference_edges": n_edges,
        "inference_s": infer_time,
        "amota": res.amota,
        "amotp": res.amotp,
    }
    print("FLAGSHIP " + json.dumps(summary))


if __name__ == "__main__":
    main()
