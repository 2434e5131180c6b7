"""Hardware probe: edge-tiled INFERENCE kernel at the big buckets
((256, 4096), (512, 8192)) x short AND long grids, after the [1, E]
index-row switch.

These buckets were previously XLA-only: with [E, 1] index columns the
src/dst pair cost E x 128 physical lanes x 2 double-buffered inputs
(8 MB at E=4096), making near-limit configurations grid-length-fragile
((256, 4096) ran 256.5K over at 40-window grids) and (512, 8192) OOM
outright. The row layout removes that term; this probe checks fit,
numerics vs XLA, and the speedup at both grid lengths before the caps in
`ops.pallas_mp` are raised.

Run: python scripts/probe_tiled_big.py [tiles ...]
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
from batch3dmot_tpu.ops.pallas_mp import fused_scores_from_encodings


def time_fn(fn, batch, *encs, reps=(2, 10)):
    """Scanned-repetition differential (relay-safe timing). The carry
    perturbs batch.pose each rep so XLA cannot hoist the loop-invariant
    body out of the scan (the bench.py trap)."""
    import dataclasses

    outs = {}
    for k in reps:
        @jax.jit
        def run(b, *e, k=k):
            def body(c, _):
                bp = dataclasses.replace(b, pose=b.pose + c * 1e-30)
                r = fn(bp, *e)
                return c + r.sum() * 1e-30, None

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
            return c

        np.asarray(run(batch, *encs))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(batch, *encs))
            best = min(best, time.perf_counter() - t0)
        outs[k] = best
    return (outs[reps[1]] - outs[reps[0]]) / (reps[1] - reps[0])


def main():
    tiles_arg = [int(a) for a in sys.argv[1:]] or [None]
    cfg = GraphConstructionConfig(top_knn_nodes=40)
    scene = make_synthetic_scene(
        seed=0, num_frames=16, num_tracks=48, with_modalities=True,
        modality_dropout=0.2,
    )
    windows = [w for w in build_scene_graphs(scene, 5, cfg) if w.num_edges > 0]
    model = MultimodalGNN()
    buckets = [(256, 4096), (512, 8192)]
    if os.environ.get("B3D_PROBE_BUCKETS"):
        buckets = [
            tuple(int(x) for x in b.split(","))
            for b in os.environ["B3D_PROBE_BUCKETS"].split(";")
        ]
    for mn, me in buckets:
        fit = [w for w in windows if w.num_nodes <= mn and w.num_edges <= me]
        for B in (8, 40):
            graphs = [
                pad_graph(
                    pose=w.pose, edge_src=w.edge_src, edge_dst=w.edge_dst,
                    edge_attr=w.edge_attr, node_time=w.node_time,
                    node_class=w.node_class, max_nodes=mn, max_edges=me,
                    img=scene.img[w.det_index], lidar=scene.lidar[w.det_index],
                    radar=scene.radar[w.det_index],
                )
                for w in (fit * ((B // len(fit)) + 1))[:B]
            ]
            batch = batch_graphs(graphs)
            variables = jax.jit(model.init)(
                jax.random.key(0), jax.tree.map(lambda x: x[0], batch)
            )

            def enc(g):
                xi, pn, rn = model.apply(
                    variables, g.img, g.lidar, g.radar,
                    method=model.encode_frozen,
                )
                lp = g.lidar.sum(axis=(1, 2)) != 0
                rp = g.radar.sum(axis=(1, 2)) != 0
                return xi, pn, rn, lp, rp

            encs = jax.jit(jax.vmap(enc))(batch)

            def xla_scores(b, *e):
                def one(g, xi, pn, rn, lp, rp):
                    return model.apply(
                        variables, g, xi, pn, rn, lp, rp,
                        method=model.forward_from_encodings,
                    )[0]

                return jax.vmap(one)(b, *e)

            ref = np.asarray(jax.jit(xla_scores)(batch, *encs))
            mask = np.asarray(batch.edge_mask)
            t_x = time_fn(xla_scores, batch, *encs)
            for ft in tiles_arg:
                desc = f"({mn},{me}) x{B} tiles={ft or 'auto'}"
                try:
                    def fused(b, *e):
                        return fused_scores_from_encodings(
                            model, variables, b, *e, force_tiles=ft
                        )

                    got = np.asarray(jax.jit(fused)(batch, *encs))
                    err = float(np.abs((got - ref) * mask).max())
                    t_f = time_fn(fused, batch, *encs)
                    print(
                        f"{desc}: XLA {t_x*1e3:.2f} ms / fused {t_f*1e3:.2f} ms"
                        f" ({t_x/t_f:.2f}x)  max|err| {err:.2e}",
                        flush=True,
                    )
                except Exception as ex:
                    msg = str(ex).split("\n")[0][:220]
                    print(f"{desc}: FAILED {type(ex).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
