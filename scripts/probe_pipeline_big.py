"""Grouped device-pipeline dispatch at the BIGGEST fused bucket
((512, 8192)) on real hardware: the end-to-end path protected by the
round-3 grid-aware variant selection.

The grouped dispatch vmaps S scenes over one W-window scoring program
(effective Pallas grid S x W), so at this bucket the kernel dispatch
must pick the HBM-staged variant — choosing by the local batch dim
would compile the short-grid VMEM variant on a long grid (compiler
OOM). This probe runs 2 dense scenes (~90 concurrent tracks, kNN 16 ->
512-node / 8192-edge windows) through score_scene singles AND the
grouped score_scenes, checks score agreement, and times both.

Run: python scripts/probe_pipeline_big.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

import numpy as np

from batch3dmot_tpu.data.synthetic import make_synthetic_scene
from batch3dmot_tpu.infer.device_pipeline import DeviceScenePipeline
from batch3dmot_tpu.models import MultimodalGNN


def main():
    scenes = [
        make_synthetic_scene(
            seed=100 + i, num_frames=18, num_tracks=90, fp_per_frame=6.0,
            with_modalities=True, modality_dropout=0.2,
            scene_token=f"dense{i}",
        )
        for i in range(2)
    ]
    model = MultimodalGNN()
    example = scenes[0]
    import jax.numpy as jnp

    from batch3dmot_tpu.graph import batch_graphs, pad_graph
    from batch3dmot_tpu.graphs import build_scene_graphs
    from batch3dmot_tpu.config import GraphConstructionConfig

    w = next(
        w for w in build_scene_graphs(
            example, 5, GraphConstructionConfig(top_knn_nodes=16)
        )
        if w.num_edges > 0
    )
    g0 = pad_graph(
        pose=w.pose, edge_src=w.edge_src, edge_dst=w.edge_dst,
        edge_attr=w.edge_attr, node_time=w.node_time,
        node_class=w.node_class, max_nodes=512, max_edges=8192,
        img=example.img[w.det_index], lidar=example.lidar[w.det_index],
        radar=example.radar[w.det_index],
    )
    variables = jax.jit(model.init)(jax.random.key(0), g0)

    pipe = DeviceScenePipeline(model, variables, window_len=5, k=16, fused=True)

    t0 = time.perf_counter()
    singles = [pipe.score_scene(s) for s in scenes]
    t_single = time.perf_counter() - t0
    t0 = time.perf_counter()
    grouped = pipe.score_scenes(scenes)
    t_group = time.perf_counter() - t0
    # warm repeat (first calls pay compiles)
    t0 = time.perf_counter()
    singles = [pipe.score_scene(s) for s in scenes]
    t_single = time.perf_counter() - t0
    t0 = time.perf_counter()
    grouped = pipe.score_scenes(scenes)
    t_group = time.perf_counter() - t0

    n_edges = sum(len(r) for r in singles)
    worst = 0.0
    for rs, rg in zip(singles, grouped):
        assert set(rs) == set(rg), (len(rs), len(rg))
        for key, v in rs.items():
            worst = max(worst, abs(v - rg[key]))
    print(
        f"2 dense scenes ({n_edges} scored edges, 512/8192 windows): "
        f"singles {t_single:.2f}s, grouped {t_group:.2f}s, "
        f"max |single-grouped| {worst:.2e}"
    )


if __name__ == "__main__":
    main()
