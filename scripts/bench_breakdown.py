"""Where the inference milliseconds go, measured on the real chip.

Differential in-jit repetition timing (CLAUDE.md relay rules) of the
components of the mm scoring program at several (max_nodes, max_edges)
buckets and dtypes — drives the round-2 perf work (padding budgets, bf16,
fused Pallas message passing).
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

from batch3dmot_tpu.config import GraphConstructionConfig
from batch3dmot_tpu.data.synthetic import make_synthetic_scene
from batch3dmot_tpu.graphs import build_scene_graphs
from batch3dmot_tpu.graph import batch_graphs, pad_graph
from batch3dmot_tpu.models import MultimodalGNN


def diff_time(fn, args, reps_a=1, reps_b=33):
    """fn(c, *args) must CONSUME the carry c (e.g. add c*0 to an input) so
    XLA cannot hoist the body out of the repetition scan."""

    def make(reps):
        @jax.jit
        def run(*a):
            def rep(c, _):
                return c + fn(c, *a) * 1e-30, None

            c, _ = jax.lax.scan(rep, jnp.float32(0.0), None, length=reps)
            return c

        return run

    out = {}
    for reps in (reps_a, reps_b):
        r = make(reps)
        np.asarray(r(*args))  # compile + first run
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(r(*args))
            best = min(best, time.perf_counter() - t0)
        out[reps] = best
    return (out[reps_b] - out[reps_a]) / (reps_b - reps_a)


def main():
    cfg = GraphConstructionConfig(top_knn_nodes=10)
    scene = make_synthetic_scene(
        seed=0, num_frames=10, num_tracks=14, with_modalities=True,
        modality_dropout=0.2,
    )
    windows = [w for w in build_scene_graphs(scene, 3, cfg) if w.num_edges > 0]
    sizes = [(w.num_nodes, w.num_edges) for w in windows]
    print("window sizes:", sizes)

    model = MultimodalGNN()
    B = 8

    for mn, me in [(128, 1024), (64, 512)]:
        graphs = [
            pad_graph(
                pose=w.pose, edge_src=w.edge_src, edge_dst=w.edge_dst,
                edge_attr=w.edge_attr, node_time=w.node_time,
                node_class=w.node_class, max_nodes=mn, max_edges=me,
                img=scene.img[w.det_index], lidar=scene.lidar[w.det_index],
                radar=scene.radar[w.det_index],
            )
            for w in (windows * B)[:B]
        ]
        batch = batch_graphs(graphs)
        variables = jax.jit(model.init)(jax.random.key(0), graphs[0])
        real_edges = sum(w.num_edges for w in (windows * B)[:B])

        def full(c, b):
            # every input must depend on the carry or XLA hoists its whole
            # consumer subgraph out of the repetition scan
            b = dataclasses.replace(
                b,
                pose=b.pose + c * 1e-30,
                img=b.img + c * 1e-30,
                lidar=b.lidar + c * 1e-30,
                radar=b.radar + c * 1e-30,
                edge_attr=b.edge_attr + c * 1e-30,
            )
            scores, _ = jax.vmap(lambda g: model.apply(variables, g))(b)
            return jnp.sum(scores)

        def encode_only(c, b):
            xi, pn, rn = jax.vmap(
                lambda g: model.apply(
                    variables, g.img + c * 1e-30, g.lidar + c * 1e-30,
                    g.radar + c * 1e-30, method=model.encode_frozen,
                )
            )(b)
            return jnp.sum(xi) + jnp.sum(pn) + jnp.sum(rn)

        def gnn_only(c, b, xi, pn, rn, lp, rp):
            b = dataclasses.replace(
                b,
                pose=b.pose + c * 1e-30,
                edge_attr=b.edge_attr + c * 1e-30,
            )
            scores, _ = jax.vmap(
                lambda g, a, c2, d, e, f: model.apply(
                    variables, g, a, c2, d, e, f,
                    method=model.forward_from_encodings,
                )
            )(b, xi + c * 1e-30, pn + c * 1e-30, rn + c * 1e-30, lp, rp)
            return jnp.sum(scores)

        xi = jnp.zeros((B, mn, 96))
        pn = jnp.zeros((B, mn, 256))
        rn = jnp.zeros((B, mn, 256))
        lp = jnp.ones((B, mn), bool)
        rp = jnp.ones((B, mn), bool)

        t_full = diff_time(full, (batch,))
        t_enc = diff_time(encode_only, (batch,))
        t_gnn = diff_time(gnn_only, (batch, xi, pn, rn, lp, rp))

        # bf16 compute everywhere: params + float inputs cast, f32 matmul accum
        bf = jnp.bfloat16
        cast = lambda t: jax.tree.map(
            lambda x: x.astype(bf)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            t,
        )
        variables_bf = cast(variables)
        batch_bf = cast(batch)

        def full_bf(c, b):
            c = c.astype(bf)
            b = dataclasses.replace(
                b,
                pose=b.pose + c * 1e-30,
                img=b.img + c * 1e-30,
                lidar=b.lidar + c * 1e-30,
                radar=b.radar + c * 1e-30,
                edge_attr=b.edge_attr + c * 1e-30,
            )
            scores, _ = jax.vmap(lambda g: model.apply(variables_bf, g))(b)
            return jnp.sum(scores.astype(jnp.float32))

        def gnn_bf(c, b, xi, pn, rn, lp, rp):
            c = c.astype(bf)
            b = dataclasses.replace(
                b,
                pose=b.pose + c * 1e-30,
                edge_attr=b.edge_attr + c * 1e-30,
            )
            scores, _ = jax.vmap(
                lambda g, a, c2, d, e, f: model.apply(
                    variables_bf, g, a, c2, d, e, f,
                    method=model.forward_from_encodings,
                )
            )(b, xi + c * 1e-30, pn + c * 1e-30, rn + c * 1e-30, lp, rp)
            return jnp.sum(scores.astype(jnp.float32))

        def enc_bf(c, b):
            c = c.astype(bf)
            xi, pn, rn = jax.vmap(
                lambda g: model.apply(
                    variables_bf, g.img + c * 1e-30, g.lidar + c * 1e-30,
                    g.radar + c * 1e-30, method=model.encode_frozen,
                )
            )(b)
            return (
                jnp.sum(xi.astype(jnp.float32))
                + jnp.sum(pn.astype(jnp.float32))
                + jnp.sum(rn.astype(jnp.float32))
            )

        t_full_bf = diff_time(full_bf, (batch_bf,))
        t_enc_bf = diff_time(enc_bf, (batch_bf,))
        t_gnn_bf = diff_time(
            gnn_bf, (batch_bf, xi.astype(bf), pn.astype(bf), rn.astype(bf), lp, rp)
        )
        print(
            f"bucket ({mn},{me}): full {t_full*1e3:.2f} ms | encoders "
            f"{t_enc*1e3:.2f} ms | gnn {t_gnn*1e3:.2f} ms | "
            f"bf16 full {t_full_bf*1e3:.2f} ms enc {t_enc_bf*1e3:.2f} ms "
            f"gnn {t_gnn_bf*1e3:.2f} ms | "
            f"{real_edges} real edges -> {real_edges/t_full/1e3:.0f}k (f32) / "
            f"{real_edges/t_full_bf/1e3:.0f}k (bf16) edges/s"
        )


def bench_fused_kernel():
    """Fused Pallas MP kernel vs the XLA forward_from_encodings path."""
    from batch3dmot_tpu.ops.pallas_mp import fused_scores_from_encodings

    cfg = GraphConstructionConfig(top_knn_nodes=10)
    scene = make_synthetic_scene(
        seed=0, num_frames=10, num_tracks=14, with_modalities=True,
        modality_dropout=0.2,
    )
    windows = [w for w in build_scene_graphs(scene, 3, cfg) if w.num_edges > 0]
    print("window sizes:", [(w.num_nodes, w.num_edges) for w in windows])
    model = MultimodalGNN()
    B = 8
    for mn, me in [(64, 256), (64, 512), (128, 1024), (128, 2048),
                   (128, 4096), (256, 2048), (256, 4096), (512, 8192)]:
        if any(w.num_nodes > mn or w.num_edges > me for w in windows):
            print(f"bucket ({mn},{me}): windows do not fit, skipped")
            continue
        graphs = [
            pad_graph(
                pose=w.pose, edge_src=w.edge_src, edge_dst=w.edge_dst,
                edge_attr=w.edge_attr, node_time=w.node_time,
                node_class=w.node_class, max_nodes=mn, max_edges=me,
                img=scene.img[w.det_index], lidar=scene.lidar[w.det_index],
                radar=scene.radar[w.det_index],
            )
            for w in (windows * B)[:B]
        ]
        batch = batch_graphs(graphs)
        variables = jax.jit(model.init)(jax.random.key(0), graphs[0])
        real_edges = sum(w.num_edges for w in (windows * B)[:B])

        xi = jnp.zeros((B, mn, 96))
        pn = jnp.zeros((B, mn, 256))
        rn = jnp.zeros((B, mn, 256))
        lp = jnp.ones((B, mn), bool)
        rp = jnp.ones((B, mn), bool)

        def xla_path(c, b, a1, a2, a3, a4, a5):
            b = dataclasses.replace(
                b, pose=b.pose + c * 1e-30, edge_attr=b.edge_attr + c * 1e-30
            )
            s, _ = jax.vmap(
                lambda g, p, q, r, s_, t: model.apply(
                    variables, g, p, q, r, s_, t,
                    method=model.forward_from_encodings,
                )
            )(b, a1 + c * 1e-30, a2, a3, a4, a5)
            return jnp.sum(s)

        def fused_path(c, b, a1, a2, a3, a4, a5):
            b = dataclasses.replace(
                b, pose=b.pose + c * 1e-30, edge_attr=b.edge_attr + c * 1e-30
            )
            s = fused_scores_from_encodings(
                model, variables, b, a1 + c * 1e-30, a2, a3, a4, a5
            )
            return jnp.sum(s)

        args = (batch, xi, pn, rn, lp, rp)
        t_xla = diff_time(xla_path, args)
        t_fused = diff_time(fused_path, args)
        print(
            f"bucket ({mn},{me}) x{B}: gnn XLA {t_xla*1e3:.2f} ms | "
            f"fused pallas {t_fused*1e3:.2f} ms | "
            f"{real_edges/t_fused/1e3:.0f}k edges/s (fused, gnn-only)"
        )


def bench_scene_encode():
    """Per-scene encode cost (the SceneEncodedScorer / bench.py workload):
    all scene detections through the three frozen encoders once, at several
    padded detection counts and dtypes."""
    from batch3dmot_tpu.graph import IMG_SHAPE, LIDAR_SHAPE, RADAR_SHAPE

    model = MultimodalGNN()
    scene = make_synthetic_scene(
        seed=0, num_frames=10, num_tracks=14, with_modalities=True,
        modality_dropout=0.2,
    )
    cfg = GraphConstructionConfig(top_knn_nodes=10)
    windows = [w for w in build_scene_graphs(scene, 3, cfg) if w.num_edges > 0]
    w = windows[0]
    example = pad_graph(
        pose=w.pose, edge_src=w.edge_src, edge_dst=w.edge_dst,
        edge_attr=w.edge_attr, node_time=w.node_time, node_class=w.node_class,
        max_nodes=64, max_edges=512, img=scene.img[w.det_index],
        lidar=scene.lidar[w.det_index], radar=scene.radar[w.det_index],
    )
    variables = jax.jit(model.init)(jax.random.key(0), example)
    bf = jnp.bfloat16
    cast = lambda t: jax.tree.map(
        lambda x: x.astype(bf)
        if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x,
        t,
    )
    variables_bf = cast(variables)
    m = scene.num_detections
    print(f"scene has {m} detections")
    for m_pad in (64 * -(-m // 64), 256):
        mods = []
        for arr, tail in ((scene.img, IMG_SHAPE), (scene.lidar, LIDAR_SHAPE),
                          (scene.radar, RADAR_SHAPE)):
            buf = np.zeros((m_pad, *tail), np.float32)
            buf[:m] = arr
            mods.append(jnp.asarray(buf))

        def enc(c, img, lidar, radar, v):
            xi, pn, rn = model.apply(
                v, img + c * 1e-30, lidar + c * 1e-30, radar + c * 1e-30,
                method=model.encode_frozen,
            )
            return (
                jnp.sum(xi.astype(jnp.float32))
                + jnp.sum(pn.astype(jnp.float32))
                + jnp.sum(rn.astype(jnp.float32))
            )

        t_f32 = diff_time(enc, (*mods, variables))
        t_bf = diff_time(
            enc, (*[x.astype(bf) for x in mods], variables_bf)
        )
        print(
            f"m_pad {m_pad}: scene encode f32 {t_f32*1e3:.3f} ms | "
            f"bf16 {t_bf*1e3:.3f} ms"
        )


if __name__ == "__main__":
    if os.environ.get("B3D_BENCH_FUSED"):
        bench_fused_kernel()
    elif os.environ.get("B3D_BENCH_SCENE_ENCODE"):
        bench_scene_encode()
    else:
        main()
