"""Tile-count sweep for the TILED fused training kernels on real hardware.

The transposed [ed, E] tile layout (round 3) halves every tile scratch, so
the VMEM model that picked 8 tiles at the (256, 4096) bucket has headroom
for bigger tiles — and the step is DMA-latency-bound (serialized
start/wait per tile), so fewer, bigger tiles mean fewer round trips.

Also probes coverage EXPANSION: with nothing full-E in VMEM the model is
tile-bound, not E-bound, so buckets beyond the shipped product cap
((512, 4096), (512, 8192)) may compile — run them here before raising
the guard.

Run: python scripts/probe_train_tiles.py [mn me] [tiles ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

import jax.numpy as jnp
import numpy as np

from batch3dmot_tpu.config import GraphConstructionConfig
from batch3dmot_tpu.data.synthetic import make_synthetic_scene
from batch3dmot_tpu.graph import batch_graphs, pad_graph
from batch3dmot_tpu.graphs import build_scene_graphs
from batch3dmot_tpu.models import MultimodalGNN
from batch3dmot_tpu.ops.pallas_mp_train import fused_training_scores


def main():
    args = [int(a) for a in sys.argv[1:]]
    if len(args) >= 2 and args[1] >= 256:  # bucket given as leading pair
        (mn, me), tile_counts = args[:2], args[2:] or [8]
    else:
        (mn, me), tile_counts = (256, 4096), (args or [2, 4, 8])
    B = 8
    cfg = GraphConstructionConfig(top_knn_nodes=20)
    scene = make_synthetic_scene(
        seed=0, num_frames=12, num_tracks=40, with_modalities=True,
        modality_dropout=0.2,
    )
    windows = [w for w in build_scene_graphs(scene, 5, cfg) if w.num_edges > 0]
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
    model = MultimodalGNN()
    variables = dict(jax.jit(model.init)(
        jax.random.key(0), jax.tree.map(lambda x: x[0], batch)
    ))
    params = variables.pop("params")
    enc = (
        jnp.zeros((B, mn, 96)), jnp.zeros((B, mn, 256)),
        jnp.zeros((B, mn, 256)), jnp.ones((B, mn), bool),
        jnp.ones((B, mn), bool),
    )

    for tiles in tile_counts:
        def loss(p, tiles=tiles):
            if tiles == 0:  # XLA-autodiff baseline (same encoded forward)
                vs = {"params": p, **variables}
                scores, _ = jax.vmap(
                    lambda g, xi, pn, rn, lp, rp: model.apply(
                        vs, g, xi, pn, rn, lp, rp,
                        method=model.forward_from_encodings,
                    )
                )(batch, *enc)
            else:
                scores = fused_training_scores(
                    model, variables, p, batch, encodings=enc,
                    force_tiles=tiles,
                )
            return jnp.sum(
                jnp.where(batch.edge_mask, scores * batch.edge_weight, 0.0)
            )

        def make(K):
            @jax.jit
            def run(p):
                def body(c, _):
                    # perturb params by the carry so the grad is NOT
                    # loop-invariant — XLA hoists invariant computations
                    # out of the scan (measured: the XLA-autodiff body
                    # timed ~0 without this)
                    pp = jax.tree.map(lambda x: x + c * 1e-30, p)
                    l, g = jax.value_and_grad(loss)(pp)
                    return c + l + g["edge_classifier"]["dense_0"]["bias"][0], None

                out, _ = jax.lax.scan(body, 0.0, None, length=K)
                return out

            return run

        try:
            ts = {}
            for K in (2, 14):
                run = make(K)
                np.asarray(run(params))
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    np.asarray(run(params))
                    best = min(best, time.perf_counter() - t0)
                ts[K] = best
            per = (ts[14] - ts[2]) / 12
            desc = "XLA autodiff" if tiles == 0 else f"tsz {me // tiles}"
            print(f"tiles {tiles:3d} ({desc}): {per * 1e3:.2f} ms/grad")
        except Exception as e:  # noqa: BLE001 — compiler OOMs expected at big tiles
            print(f"tiles {tiles:3d}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
