"""GNN train-step timing on the real chip: fused Pallas kernels vs XLA
autodiff, at the production shape buckets, full and precomputed-encoding
batch forms.

The round-2 finding (docs/RESULTS.md) was parity at (64, 512); the (64, 256)
bucket later removed the fused INFERENCE kernel's VMEM pressure (0.23 ->
0.04 ms) — this probe checks whether the training kernels flip to a win
there too.

Run: python scripts/bench_train_step.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

from batch3dmot_tpu.config import GraphConstructionConfig
from batch3dmot_tpu.data.synthetic import make_synthetic_scene
from batch3dmot_tpu.graph import batch_graphs, pad_graph
from batch3dmot_tpu.graphs import build_scene_graphs
from batch3dmot_tpu.models import MultimodalGNN
from batch3dmot_tpu.train.trainer import GNNTrainer


def make_runner(trainer, K):
    @jax.jit
    def run(state, batch):
        def body(st, _):
            st, loss, _ = trainer._step(st, batch)
            return st, loss

        _, losses = jax.lax.scan(body, state, None, length=K)
        return losses[-1]

    return run


def time_step(trainer, batch, reps_a=2, reps_b=14):
    out = {}
    for K in (reps_a, reps_b):
        run = make_runner(trainer, K)
        np.asarray(run(trainer.state, batch))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(trainer.state, batch))
            best = min(best, time.perf_counter() - t0)
        out[K] = best
    return (out[reps_b] - out[reps_a]) / (reps_b - reps_a)


def main(trainval_scale=False):
    if trainval_scale:
        # nuScenes-trainval training density: L=5 windows, dozens of
        # concurrent tracks, kNN 20 — lands in the (256, 2048) bucket where
        # the fused TRAINING kernels are unsupported (fused_train_supported)
        # and the XLA autodiff path carries the load
        cfg = GraphConstructionConfig(top_knn_nodes=20)
        scene = make_synthetic_scene(
            seed=0, num_frames=12, num_tracks=40, with_modalities=True,
            modality_dropout=0.2,
        )
        window_len, buckets = 5, [(256, 4096)]
        if os.environ.get("B3D_BENCH_BUCKET"):
            mn_s, me_s = os.environ["B3D_BENCH_BUCKET"].split(",")
            buckets = [(int(mn_s), int(me_s))]
    else:
        cfg = GraphConstructionConfig(top_knn_nodes=10)
        scene = make_synthetic_scene(
            seed=0, num_frames=10, num_tracks=14, with_modalities=True,
            modality_dropout=0.2,
        )
        window_len, buckets = 3, [(64, 256), (64, 512)]
    windows = [
        w for w in build_scene_graphs(scene, window_len, cfg) if w.num_edges > 0
    ]
    model = MultimodalGNN()
    B = 8

    for mn, me in buckets:
        if any(w.num_nodes > mn or w.num_edges > me for w in windows):
            print(f"bucket ({mn},{me}): windows do not fit, skipped")
            continue
        graphs = [
            pad_graph(
                pose=w.pose, edge_src=w.edge_src, edge_dst=w.edge_dst,
                edge_attr=w.edge_attr, node_time=w.node_time,
                node_class=w.node_class, edge_label=w.edge_label,
                edge_weight=w.edge_weight, max_nodes=mn, max_edges=me,
                img=scene.img[w.det_index], lidar=scene.lidar[w.det_index],
                radar=scene.radar[w.det_index],
            )
            for w in (windows * B)[:B]
        ]
        batch = batch_graphs(graphs)
        enc = (
            jnp.zeros((B, mn, 96)), jnp.zeros((B, mn, 256)),
            jnp.zeros((B, mn, 256)), jnp.ones((B, mn), bool),
            jnp.ones((B, mn), bool),
        )
        import dataclasses

        graph_nomod = dataclasses.replace(
            batch,
            img=jnp.zeros((B, 0, 32, 32, 3), jnp.float32),
            lidar=jnp.zeros((B, 0, 128, 3), jnp.float32),
            radar=jnp.zeros((B, 0, 64, 4), jnp.float32),
        )

        rows = {}
        for fused in (False, True):
            trainer = GNNTrainer(model, graphs[0], fused=fused)
            t_full = time_step(trainer, batch)
            t_enc = time_step(trainer, (graph_nomod, enc))
            rows[fused] = (t_full, t_enc)
        (xf, xe), (ff, fe) = rows[False], rows[True]
        print(
            f"bucket ({mn},{me}) x{B}: train step full XLA {xf*1e3:.2f} ms "
            f"/ fused {ff*1e3:.2f} ms ({xf/ff:.2f}x) | encoded XLA "
            f"{xe*1e3:.2f} ms / fused {fe*1e3:.2f} ms ({xe/fe:.2f}x)"
        )


if __name__ == "__main__":
    main(trainval_scale=bool(os.environ.get("B3D_BENCH_TRAINVAL_SCALE")))
