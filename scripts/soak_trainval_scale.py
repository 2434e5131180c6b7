"""Trainval-scale synthetic soak: the real dataset's SHAPE end to end.

Round-3 VERDICT next #2: streaming `--encoded` training, the encoding
caches, grouped predict, and the program-variant discipline had only ever
run against <=12-scene fixtures; the reference's working set is ~700
scenes (``construct...parallel.py:707``: 8-way pools over scene chunks of
19). This soak drives the REAL CLI through the full pipeline at that
scene count and trainval density (40 frames x ~40 concurrent tracks),
reporting per stage:

  * wall time,
  * peak RSS so far (``ru_maxrss`` — the round-2 unbounded
    ``encoded_items`` leak is exactly the class this catches),
  * compile-cache program-variant growth (every DISTINCT program costs
    seconds of executable load through the relay — variant count is a
    first-class budget here).

Stages: build train stores (~550 scenes, L=5) -> build val stores
(~150 scenes, L=2, disjoint seeds) -> `train-gnn --model mm --encoded`
streaming (1 epoch) -> `train-gnn --encoded --device-dataset` (2 epochs,
FULL train set device-resident via the dedup encoding form) -> grouped
`predict --pipeline encoded` over the val split -> native AMOTA vs the
synthetic GT.

Run (real chip; ~1-2 h at healthy relay):
    python scripts/soak_trainval_scale.py [--scenes 550] [--val 150]
    python scripts/soak_trainval_scale.py --scenes 40 --val 12   # smoke
"""

import argparse
import glob
import json
import os
import resource
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_soak_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from batch3dmot_tpu.cli import main as cli

CACHE_DIR = "/tmp/jax_soak_cache"


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20


def cache_count():
    return len(glob.glob(os.path.join(CACHE_DIR, "*")))


class Stage:
    def __init__(self, name):
        self.name = name

    def __enter__(self):
        self.t0, self.c0 = time.time(), cache_count()
        print(f"=== {self.name} ===", flush=True)
        return self

    def __exit__(self, *exc):
        dt = time.time() - self.t0
        print(
            f"=== {self.name}: {dt:.1f}s wall, peak RSS {rss_gb():.2f} GiB, "
            f"+{cache_count() - self.c0} compiled program(s) ===",
            flush=True,
        )


def du_gb(path):
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total / 2**30


def run(n_train, n_val, frames, tracks, epochs, keep):
    tmp = tempfile.mkdtemp(prefix="b3d_soak_", dir="/tmp")
    train_dir = os.path.join(tmp, "graphs_train")
    val_dir = os.path.join(tmp, "graphs_val")
    density = [
        "--set", f"graph_construction.synthetic_frames={frames}",
        "--set", f"graph_construction.synthetic_tracks={tracks}",
    ]
    common = ["--set", f"paths.tmp={tmp}", *density]

    try:
        with Stage(f"build train stores ({n_train} scenes, L=5)"):
            cli([
                "build-graphs", "--synthetic", str(n_train), *common,
                "--set", f"paths.graphs_dir={train_dir}",
                "--set", "graph_construction.batch_size_graph=5",
                "--skip-existing",
            ])
            print(f"train store dir: {du_gb(train_dir):.2f} GiB")

        with Stage(f"build val stores ({n_val} scenes, L=2)"):
            cli([
                "build-graphs", "--synthetic", str(n_val), *common,
                "--set", f"paths.graphs_dir={val_dir}",
                "--set", "graph_construction.batch_size_graph=2",
                "--set", "graph_construction.synthetic_seed_base=100000",
                "--skip-existing",
            ])
            print(f"val store dir: {du_gb(val_dir):.2f} GiB")

        with Stage("train-gnn --encoded streaming (1 epoch)"):
            # --stream pins the scene-streaming path (this stage exists to
            # soak it; without the flag the CLI auto-upgrades to the
            # device-resident dataset whenever it fits HBM)
            cli([
                "train-gnn", "--model", "mm", "--encoded", "--stream",
                "--epochs", "1", *common,
                "--set", f"paths.graphs_dir={train_dir}",
                "--set", "gnn.batch_size=8",
            ])

        with Stage(f"train-gnn --encoded --device-dataset ({epochs} epochs)"):
            # FULL train set device-resident on ONE chip: the dedup
            # encoding form (train/encoded.DedupEncodings — one global
            # per-detection table instead of ~L per-window copies) cuts
            # the 550-scene L=5 encoding set from ~12 GiB to ~2.4 GiB.
            # Graphs+table+index land around 5-6 GiB, inside a v5e's
            # 16 GiB HBM next to the working set; raise the advisory
            # guard accordingly. Encoding caches from the streaming
            # stage above are reused, so this stage pays upload + train
            # only, not re-encoding.
            os.environ.setdefault("B3D_DEVICE_DATASET_GB", "12")
            cli([
                "train-gnn", "--model", "mm", "--encoded",
                "--device-dataset", "--epochs", str(epochs), *common,
                "--set", f"paths.graphs_dir={train_dir}",
                "--set", "gnn.batch_size=8",
            ])

        ckpts = sorted(
            glob.glob(os.path.join(tmp, "nuscenes", "models", "gnn", "*.msgpack")),
            key=os.path.getmtime,
        )
        with Stage(f"grouped predict over {n_val} val scenes (encoded)"):
            cli([
                "predict", "--model", "mm", "--pipeline", "encoded",
                *common,
                *(["--checkpoint", ckpts[-1]] if ckpts else []),
                "--set", f"paths.graphs_dir={val_dir}",
                "--set", "graph_construction.batch_size_graph=2",
                "--set", "predict.scenes_per_batch=4",
            ])

        with Stage("native AMOTA vs synthetic GT"):
            from batch3dmot_tpu.data.synthetic import make_synthetic_scene
            from batch3dmot_tpu.eval.tracking_metrics import (
                evaluate_tracking,
                gt_boxes_from_scene,
            )

            with open(os.path.join(tmp, "nuscenes", "eval", "submission.json")) as f:
                submission = json.load(f)
            gt_boxes = []
            for s in range(n_val):
                scene = make_synthetic_scene(
                    seed=100000 + s, num_frames=frames, num_tracks=tracks,
                    with_modalities=False,
                )
                gt_boxes += gt_boxes_from_scene(scene)
            pred = [
                b for boxes in submission["results"].values() for b in boxes
            ]
            res = evaluate_tracking(
                gt_boxes, pred, list(submission["results"].keys())
            )
            print(res.summary())
            print(f"soak AMOTA={res.amota:.3f}")
        print(
            f"SOAK COMPLETE: peak RSS {rss_gb():.2f} GiB, "
            f"{cache_count()} compiled programs total, artifacts in {tmp}"
        )
    finally:
        if not keep:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=550)
    ap.add_argument("--val", type=int, default=150)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--tracks", type=int, default=40)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--keep", action="store_true")
    a = ap.parse_args()
    run(a.scenes, a.val, a.frames, a.tracks, a.epochs, a.keep)
