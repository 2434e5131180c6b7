"""Where the per-scene inference wall time goes (host side).

The flagship/demo `predict` path measures ~6-7 s/scene at toy scale while
the device work is sub-millisecond — this harness cProfiles two passes over
the same scenes (pass 1 pays compiles, pass 2 is the steady state) and
prints the top cumulative-time entries for each.

Run: python scripts/profile_predict.py
"""

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

from batch3dmot_tpu.config import GraphConstructionConfig
from batch3dmot_tpu.data.synthetic import make_synthetic_scene
from batch3dmot_tpu.graphs import build_scene_graphs
from batch3dmot_tpu.infer.predict import make_scene_encoded_scorer, predict_scene
from batch3dmot_tpu.infer.tracks import hierarchical_clusters, scene_results
from batch3dmot_tpu.models import MultimodalGNN


def main():
    cfg = GraphConstructionConfig(top_knn_nodes=8)
    scenes = []
    for seed in (100, 101, 102):
        scene = make_synthetic_scene(
            seed=seed, num_frames=12, num_tracks=12, with_modalities=True,
            modality_dropout=0.2,
        )
        windows = [w for w in build_scene_graphs(scene, 3, cfg) if w.num_edges > 0]
        scenes.append((scene, windows))

    model = MultimodalGNN()
    from batch3dmot_tpu.graph import pad_graph

    w = scenes[0][1][0]
    s = scenes[0][0]
    example = pad_graph(
        pose=w.pose, edge_src=w.edge_src, edge_dst=w.edge_dst,
        edge_attr=w.edge_attr, node_time=w.node_time, node_class=w.node_class,
        max_nodes=64, max_edges=256, img=s.img[w.det_index],
        lidar=s.lidar[w.det_index], radar=s.radar[w.det_index],
    )
    variables = jax.jit(model.init)(jax.random.key(0), example)
    scorer = make_scene_encoded_scorer(model, variables)

    def one_pass():
        for scene, windows in scenes:
            pred_edges, _ = predict_scene(scorer, scene, windows, windows_per_batch=8)
            cats = {i: m["category_name"] for i, m in enumerate(scene.metadata)}
            tracks = hierarchical_clusters(pred_edges, cats)
            scene_results(tracks, scene)

    for label in ("pass1 (compiles)", "pass2 (steady)"):
        pr = cProfile.Profile()
        t0 = time.time()
        pr.enable()
        one_pass()
        pr.disable()
        dt = time.time() - t0
        buf = io.StringIO()
        pstats.Stats(pr, stream=buf).sort_stats("cumulative").print_stats(18)
        lines = [
            ln for ln in buf.getvalue().splitlines()
            if ln.strip() and not ln.lstrip().startswith(("ncalls", "Ordered"))
        ]
        print(f"=== {label}: {dt:.2f}s for 3 scenes ===")
        print("\n".join(lines[:24]), flush=True)


if __name__ == "__main__":
    main()
