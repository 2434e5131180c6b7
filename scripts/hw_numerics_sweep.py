"""Fused-kernel vs XLA numerics on REAL TPU hardware, every supported bucket.

The CI equivalence gates run through the Pallas interpreter (CPU); on
hardware the fused-vs-XLA difference is dominated by TPU contraction
ordering and sits around 3.5-5e-3 absolute at sigmoid scale with random
embeddings — uniformly across buckets and kernel variants (docs/KERNELS.md).
Run this after kernel changes: a single bucket breaking away from the pack
indicates a real defect, not reassociation.

Run: python scripts/hw_numerics_sweep.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
import jax.numpy as jnp
import numpy as np
from batch3dmot_tpu.config import GraphConstructionConfig
from batch3dmot_tpu.data.synthetic import make_synthetic_scene
from batch3dmot_tpu.graphs import build_scene_graphs
from batch3dmot_tpu.graph import batch_graphs, pad_graph
from batch3dmot_tpu.models import MultimodalGNN
from batch3dmot_tpu.ops.pallas_mp import fused_scores_from_encodings, _tiles_for

cfg = GraphConstructionConfig(top_knn_nodes=10)
scene = make_synthetic_scene(seed=0, num_frames=10, num_tracks=14,
                             with_modalities=True, modality_dropout=0.2)
windows = [w for w in build_scene_graphs(scene, 3, cfg) if w.num_edges > 0]
model = MultimodalGNN()
B = 4
for mn, me in [(64,256),(64,512),(128,1024),(128,2048),(128,4096),(256,2048)]:
    if _tiles_for(mn, me) is None:
        print(f"({mn},{me}): not fused-supported, skipped", flush=True)
        continue
    graphs = [pad_graph(pose=w.pose, edge_src=w.edge_src, edge_dst=w.edge_dst,
                        edge_attr=w.edge_attr, node_time=w.node_time,
                        node_class=w.node_class, max_nodes=mn, max_edges=me,
                        img=scene.img[w.det_index], lidar=scene.lidar[w.det_index],
                        radar=scene.radar[w.det_index])
              for w in (windows * B)[:B]]
    batch = batch_graphs(graphs)
    variables = jax.jit(model.init)(jax.random.key(0), graphs[0])
    rng = np.random.default_rng(1)
    xi = jnp.asarray(rng.normal(size=(B, mn, 96)).astype(np.float32) * 0.1)
    pn = jnp.asarray(rng.normal(size=(B, mn, 256)).astype(np.float32) * 0.1)
    rn = jnp.asarray(rng.normal(size=(B, mn, 256)).astype(np.float32) * 0.1)
    lp = jnp.ones((B, mn), bool); rp = jnp.ones((B, mn), bool)
    try:
        s_f = np.asarray(jax.jit(lambda b, a1, a2, a3, a4, a5: fused_scores_from_encodings(
            model, variables, b, a1, a2, a3, a4, a5))(batch, xi, pn, rn, lp, rp))
        s_x = np.asarray(jax.jit(lambda b, a1, a2, a3, a4, a5: jax.vmap(
            lambda g, p, q, r, s_, t: model.apply(
                variables, g, p, q, r, s_, t, method=model.forward_from_encodings,
            )[0])(b, a1, a2, a3, a4, a5))(batch, xi, pn, rn, lp, rp))
        diffs = []
        for k, w in enumerate((windows * B)[:B]):
            diffs.append(float(np.abs(s_f[k, :w.num_edges] - s_x[k, :w.num_edges]).max()))
        print(f"({mn},{me}) tiles={_tiles_for(mn,me)}: max|diff| {max(diffs):.2e}", flush=True)
    except Exception as exc:
        print(f"({mn},{me}): FAILED {type(exc).__name__}: {str(exc)[:150]}", flush=True)
