"""Window-length scaling study — the framework's long-context analogue.

SURVEY.md §5: "the sequence dimension here is scene time"; the reference
covers scenes with short overlapping windows (train L=5, predict L=2)
because CPU graph construction and per-window CPU inference cap what it can
afford. On TPU the padded-window design scales L directly — this study
measures end-to-end edge-scoring throughput as windows grow in length and
density, on the real chip.

Run: python scripts/scaling_study.py   (prints a markdown table)
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

from bench_breakdown import diff_time  # noqa: E402 (same dir)

from batch3dmot_tpu.config import GraphConstructionConfig  # noqa: E402
from batch3dmot_tpu.data.synthetic import make_synthetic_scene  # noqa: E402
from batch3dmot_tpu.graph import batch_graphs, pad_graph, pick_bucket  # noqa: E402
from batch3dmot_tpu.graphs import build_scene_graphs  # noqa: E402
from batch3dmot_tpu.models import MultimodalGNN  # noqa: E402
from batch3dmot_tpu.ops.pallas_mp import (  # noqa: E402
    fused_scores_from_encodings,
    fused_supported,
)


def measure(window_len: int, tracks: int, knn: int, batch: int = 4):
    cfg = GraphConstructionConfig(top_knn_nodes=knn)
    scene = make_synthetic_scene(
        seed=0, num_frames=max(10, window_len + 5), num_tracks=tracks,
        with_modalities=True, modality_dropout=0.2,
    )
    windows = [
        w for w in build_scene_graphs(scene, window_len, cfg) if w.num_edges > 0
    ]
    mn, me = pick_bucket(
        max(w.num_nodes for w in windows), max(w.num_edges for w in windows)
    )
    graphs = [
        pad_graph(
            pose=w.pose, edge_src=w.edge_src, edge_dst=w.edge_dst,
            edge_attr=w.edge_attr, node_time=w.node_time,
            node_class=w.node_class, max_nodes=mn, max_edges=me,
            img=scene.img[w.det_index], lidar=scene.lidar[w.det_index],
            radar=scene.radar[w.det_index],
        )
        for w in (windows * batch)[:batch]
    ]
    b = batch_graphs(graphs)
    model = MultimodalGNN()
    variables = jax.jit(model.init)(jax.random.key(0), graphs[0])
    real_edges = sum(w.num_edges for w in (windows * batch)[:batch])
    fused = fused_supported(mn, me)

    xi = jnp.zeros((batch, mn, 96))
    pn = jnp.zeros((batch, mn, 256))
    rn = jnp.zeros((batch, mn, 256))
    lp = jnp.ones((batch, mn), bool)
    rp = jnp.ones((batch, mn), bool)

    def path(c, g, a1, a2, a3, a4, a5):
        g = dataclasses.replace(
            g, pose=g.pose + c * 1e-30, edge_attr=g.edge_attr + c * 1e-30
        )
        if fused:
            s = fused_scores_from_encodings(
                model, variables, g, a1 + c * 1e-30, a2, a3, a4, a5
            )
        else:
            s, _ = jax.vmap(
                lambda gg, p, q, r, s_, t: model.apply(
                    variables, gg, p, q, r, s_, t,
                    method=model.forward_from_encodings,
                )
            )(g, a1 + c * 1e-30, a2, a3, a4, a5)
        return jnp.sum(s)

    # small buckets run in tens of µs/batch — use more reps so the
    # differential rises above relay timing noise
    reps_b = 129 if mn * me <= 64 * 512 else 33
    t = diff_time(path, (b, xi, pn, rn, lp, rp), reps_b=reps_b)
    return dict(
        L=window_len, tracks=tracks, knn=knn, bucket=(mn, me),
        kernel="pallas" if fused else "xla",
        edges=real_edges, ms=t * 1e3 / batch,
        keps=real_edges / t / 1e3,
    )


def main():
    rows = [
        measure(2, 14, 10),   # reference predict config scale
        measure(3, 14, 10),   # bench scale
        measure(5, 14, 20),   # reference TRAIN window length
        measure(5, 40, 20),   # dense scene, L=5
        measure(8, 40, 40),   # beyond-reference long windows, full kNN
    ]
    print("| L | tracks | kNN | bucket | kernel | real edges | ms/window | k edges/s |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['L']} | {r['tracks']} | {r['knn']} | {r['bucket']} "
            f"| {r['kernel']} | {r['edges']} | {r['ms']:.2f} | {r['keps']:.0f} |"
        )


if __name__ == "__main__":
    main()
