"""Benchmark: multimodal GNN window-scoring throughput (edges/sec).

This is the reference's headline workload: scoring every candidate edge of
every sliding-window tracking graph with the camera+lidar+radar GNN
(reference ``predict.py:172-197`` runs it one window at a time on CPU with
``map_location='cpu'`` — the >10x BASELINE.md target).

Workload density (round 3): the reference's PRODUCTION graph shape — window
length 5 and top-40 weighted kNN as ``cl_config.yaml:68-69`` configures,
over scenes with ~40 concurrent tracks and a car-dominated class mix like
nuScenes trainval. These windows land in the (256, 4096) node/edge bucket —
the shape the fused Pallas kernels and real trainval runs actually execute.
``B3D_BENCH_DEMO=1`` switches back to the small demo density that rounds
1-2 measured ((64, 512) bucket; ~2.0M edges/s in ``BENCH_r02.json``) for
series comparability.

  * TPU path: windows padded to one bucket, stacked, scored by a single
    jitted vmapped program.
  * Baseline: an equivalent torch CPU model (same architecture/widths, eval
    mode) scoring the same windows one at a time, as the reference does.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# nuScenes-trainval-like class mix: car-dominated, so per-class kNN edge
# fan-in approaches the configured k as it does on real data (a uniform
# 7-class mix caps same-class candidates at ~tracks/7).
TRAINVAL_CLASS_MIX = (
    ["car"] * 5
    + ["pedestrian"] * 3
    + ["truck"] * 2
    + ["bus", "bicycle", "motorcycle", "trailer"]
)


def build_scenes(num_scenes=4, frames=16, tracks=40, window_len=5, knn=40,
                 classes=TRAINVAL_CLASS_MIX):
    from batch3dmot_tpu.config import GraphConstructionConfig
    from batch3dmot_tpu.data.synthetic import make_synthetic_scene
    from batch3dmot_tpu.graphs import build_scene_graphs

    cfg = GraphConstructionConfig(top_knn_nodes=knn)
    out = []
    for seed in range(num_scenes):
        scene = make_synthetic_scene(
            seed=seed,
            num_frames=frames,
            num_tracks=tracks,
            with_modalities=True,
            modality_dropout=0.2,
            classes=list(classes) if classes else None,
        )
        windows = [
            w for w in build_scene_graphs(scene, window_len, cfg) if w.num_edges > 0
        ]
        out.append((scene, windows))
    return out


def demo_scenes():
    """The small round-1/2 workload ((64, 512) bucket) for series checks."""
    return build_scenes(
        num_scenes=4, frames=10, tracks=14, window_len=3, knn=10, classes=None
    )


def build_windows(**kw):
    return [w for _, windows in build_scenes(**kw) for w in windows]


def bench_tpu(scenes_windows, batch_size=12, reps_a=2, reps_b=18):
    """Device throughput of the production inference program: encode every
    scene detection ONCE, then scan the batched window forwards gathering
    embeddings by detection index (infer.predict.SceneEncodedScorer).

    The remote-TPU relay makes ``block_until_ready`` unreliable and host
    fetches expensive, so we time two in-program repetition counts and
    difference them: fixed dispatch/fetch overhead cancels and the
    per-repetition time is pure device work.
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from batch3dmot_tpu.graph import (
        IMG_SHAPE,
        LIDAR_SHAPE,
        RADAR_SHAPE,
        batch_graphs,
        empty_graph,
        pad_graph,
    )
    from batch3dmot_tpu.models import MultimodalGNN

    from batch3dmot_tpu.graph import pick_bucket

    # The bucket the PRODUCT path (score_windows/SceneEncodedScorer via
    # pick_bucket) would select for these windows — round 1 hardcoded
    # (128, 1024), ~3x padding waste over the (64, 512) the pipeline
    # actually uses at these window sizes.
    max_nodes, max_edges = pick_bucket(
        max(w.num_nodes for _, ws in scenes_windows for w in ws),
        max(w.num_edges for _, ws in scenes_windows for w in ws),
    )
    model = MultimodalGNN()

    # Pack every scene to IDENTICAL shapes (one m_pad, one window-batch
    # count) so all scenes stack into a single lax.scan — one compact XLA
    # program instead of per-scene inlining. Detection padding follows the
    # product scorer's quantum (infer.predict._pad_detection_count).
    from batch3dmot_tpu.infer.predict import _pad_detection_count

    m_pad = max(
        _pad_detection_count(s.num_detections) for s, _ in scenes_windows
    )
    nb = max(
        -(-len(ws) // batch_size) for _, ws in scenes_windows
    )
    real_edges = 0
    all_mods, all_batches, all_dets = [], [], []
    example = None
    for scene, windows in scenes_windows:
        m = scene.num_detections
        mods = []
        for arr, tail in ((scene.img, IMG_SHAPE), (scene.lidar, LIDAR_SHAPE),
                          (scene.radar, RADAR_SHAPE)):
            # dtype-preserving: uint8 crops upload at 1 byte/px and take
            # their /255 on device (models.encoders.image_input_f32)
            buf = np.zeros((m_pad, *tail), arr.dtype)
            buf[:m] = arr
            mods.append(buf)
        graphs, dets = [], []
        for w in windows:
            graphs.append(
                pad_graph(
                    pose=w.pose, edge_src=w.edge_src, edge_dst=w.edge_dst,
                    edge_attr=w.edge_attr, node_time=w.node_time,
                    node_class=w.node_class, max_nodes=max_nodes,
                    max_edges=max_edges, include_modalities=False,
                )
            )
            di = np.zeros(max_nodes, np.int32)
            di[: w.num_nodes] = w.det_index
            dets.append(di)
            real_edges += w.num_edges
        while len(graphs) < nb * batch_size:
            graphs.append(empty_graph(max_nodes, max_edges, include_modalities=False))
            dets.append(np.zeros(max_nodes, np.int32))
        stacked = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[
                batch_graphs(graphs[i * batch_size : (i + 1) * batch_size])
                for i in range(nb)
            ],
        )
        if example is None:
            # init needs real modality shapes (the scoring graphs themselves
            # are modality-free; embeddings come from the scene encode)
            w = windows[0]
            example = pad_graph(
                pose=w.pose, edge_src=w.edge_src, edge_dst=w.edge_dst,
                edge_attr=w.edge_attr, node_time=w.node_time,
                node_class=w.node_class, max_nodes=max_nodes,
                max_edges=max_edges, img=scene.img[w.det_index],
                lidar=scene.lidar[w.det_index], radar=scene.radar[w.det_index],
            )
        all_mods.append(mods)
        all_batches.append(stacked)
        all_dets.append(np.stack(dets).reshape(nb, batch_size, max_nodes))

    scene_mods = [
        jnp.asarray(np.stack([m[i] for m in all_mods])) for i in range(3)
    ]
    scene_batches = jax.tree.map(lambda *xs: jnp.stack(xs), *all_batches)
    scene_dets = jnp.asarray(np.stack(all_dets))

    variables = jax.jit(model.init)(jax.random.key(0), example)
    jax.block_until_ready(variables)

    def score_scene(c, mods, stacked, det_idx, variables):
        # the carry perturbation must be non-foldable (c * 0 is simplified
        # away by XLA algsimp, which would hoist the body out of the scan)
        img, lidar, radar = mods
        img = img.astype(jnp.float32) / 255.0 if img.dtype == jnp.uint8 else img
        img, lidar, radar = (m + c * 1e-30 for m in (img, lidar, radar))
        x_img, pn, rn = model.apply(
            variables, img, lidar, radar, method=model.encode_frozen
        )
        lp = lidar.sum(axis=(1, 2)) != 0
        rp = radar.sum(axis=(1, 2)) != 0

        def body(c2, bd):
            import dataclasses

            from batch3dmot_tpu.ops.pallas_mp import fused_scores_from_encodings

            batch, idx = bd
            batch = dataclasses.replace(batch, pose=batch.pose + c2 * 1e-30)
            # production scorer path: fused Pallas MP kernel (same VMEM
            # guard as the scorers — falls back to XLA at big buckets)
            from batch3dmot_tpu.ops.pallas_mp import fused_supported

            if fused_supported(max_nodes, max_edges, grid=batch_size):
                s = fused_scores_from_encodings(
                    model, variables, batch,
                    x_img[idx], pn[idx], rn[idx], lp[idx], rp[idx],
                    grid=batch_size,
                )
            else:
                def one(g, i):
                    scores, _ = model.apply(
                        variables, g, x_img[i], pn[i], rn[i], lp[i], rp[i],
                        method=model.forward_from_encodings,
                    )
                    return scores

                s = jax.vmap(one)(batch, idx)
            return c2 + jnp.sum(s) * 1e-30, None

        c2, _ = jax.lax.scan(body, c, (stacked, det_idx))
        return c2

    def make_run(reps):
        # `variables` rides in as an ARGUMENT — a closure would embed the
        # weights as HLO constants, and lowering fetches each leaf back
        # through the TPU relay at ~0.9 s/leaf (~3 min of wall per compile;
        # scripts/profile_predict.py). This also matches the production
        # scorer programs, which take weights as inputs.
        @jax.jit
        def run(scene_mods, scene_batches, scene_dets, variables):
            def rep(c, _):
                def per_scene(c2, data):
                    mods, batches, dets = data
                    return score_scene(c2, mods, batches, dets, variables), None

                c3, _ = jax.lax.scan(
                    per_scene, c, (tuple(scene_mods), scene_batches, scene_dets)
                )
                return c3, None

            c, _ = jax.lax.scan(rep, jnp.float32(0.0), None, length=reps)
            return c

        return run

    def timeit(run):
        # best-of-4: the relay's dispatch/fetch overhead is noisy run to
        # run (it cancels in the differential only if both measurements hit
        # their best case); the wider reps_a/reps_b spread does the rest
        args = (scene_mods, scene_batches, scene_dets, variables)
        np.asarray(run(*args))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(run(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    ta = timeit(make_run(reps_a))
    tb = timeit(make_run(reps_b))
    per_sweep = (tb - ta) / (reps_b - reps_a)
    return real_edges / per_sweep, per_sweep


def bench_torch_cpu(windows, max_seconds=60.0):
    """Reference-style CPU scoring: one window at a time, torch eval mode."""
    import torch
    import torch.nn as nn

    torch.set_num_threads(1)

    def mlp(*dims):
        layers = []
        for i in range(len(dims) - 1):
            layers.append(nn.Linear(dims[i], dims[i + 1]))
            if i < len(dims) - 2:
                layers.append(nn.ReLU())
        return nn.Sequential(*layers)

    class TorchMMGNN(nn.Module):
        """Architecture twin of batch3dmot_tpu.models.MultimodalGNN for an
        apples-to-apples CPU throughput baseline."""

        def __init__(self, depth=6):
            super().__init__()
            self.depth = depth
            # ResNet-AE encoder twin
            self.stem = nn.Conv2d(3, 12, 4, 2, 1)
            def res(cin, cout, k, s, dk, ds):
                return nn.ModuleDict(
                    dict(
                        c1=nn.Conv2d(cin, cout, k, s, 1),
                        b1=nn.BatchNorm2d(cout),
                        c2=nn.Conv2d(cout, cout, k, s, 1),
                        b2=nn.BatchNorm2d(cout),
                        dn=nn.Sequential(nn.Conv2d(cin, cout, dk, ds), nn.BatchNorm2d(cout)),
                    )
                )
            self.blocks = nn.ModuleList(
                [res(12, 24, 4, 2, 5, 3), res(24, 48, 3, 1, 1, 1), res(48, 96, 3, 2, 3, 2)]
            )
            # PointNet twin (stn + point mlps + head)
            self.stn_mlp = nn.Sequential(
                nn.Conv1d(3, 64, 1), nn.BatchNorm1d(64), nn.ReLU(),
                nn.Conv1d(64, 128, 1), nn.BatchNorm1d(128), nn.ReLU(),
                nn.Conv1d(128, 1024, 1), nn.BatchNorm1d(1024), nn.ReLU(),
            )
            self.stn_fc = nn.Sequential(
                nn.Linear(1024, 512), nn.BatchNorm1d(512), nn.ReLU(),
                nn.Linear(512, 256), nn.BatchNorm1d(256), nn.ReLU(), nn.Linear(256, 9),
            )
            self.pn_mlp = nn.Sequential(
                nn.Conv1d(3, 64, 1), nn.BatchNorm1d(64), nn.ReLU(),
                nn.Conv1d(64, 128, 1), nn.BatchNorm1d(128), nn.ReLU(),
                nn.Conv1d(128, 1024, 1), nn.BatchNorm1d(1024),
            )
            self.pn_head = nn.Sequential(
                nn.Linear(1024, 512), nn.BatchNorm1d(512), nn.ReLU(),
                nn.Linear(512, 256), nn.BatchNorm1d(256), nn.ReLU(),
            )
            # RadarNet twin
            self.rn_mlp = nn.Sequential(
                nn.Conv1d(4, 64, 1), nn.BatchNorm1d(64), nn.ReLU(),
                nn.Conv1d(64, 128, 1), nn.BatchNorm1d(128), nn.ReLU(),
                nn.Conv1d(128, 1024, 1), nn.BatchNorm1d(1024),
            )
            self.rn_head = nn.Sequential(
                nn.Linear(1024, 512), nn.BatchNorm1d(512), nn.ReLU(),
                nn.Linear(512, 256), nn.BatchNorm1d(256), nn.ReLU(),
            )
            self.fc_lidar = mlp(256, 192, 128)
            self.fc_radar = mlp(256, 192, 128, 64)
            self.edge_enc = mlp(4, 16, 32, 64)
            self.node_enc = mlp(19, 48, 96)
            self.att = nn.ModuleDict(
                dict(img=mlp(96, 96, 96), lid=mlp(128, 128, 128), rad=mlp(64, 64, 64))
            )
            self.att_edge_enc = mlp(640, 512, 384, 256, 128, 64)
            self.edge_update = mlp(320, 256, 128, 64)
            self.past = mlp(256, 192, 128)
            self.future = mlp(256, 192, 128)
            self.combine = mlp(256, 192, 128, 96)
            self.classifier = nn.Sequential(mlp(64, 32, 16, 8, 1), nn.Sigmoid())

        def _res(self, blk, x):
            import torch.nn.functional as F
            skip = blk["dn"](x)
            h = F.relu(blk["b1"](blk["c1"](x)))
            h = blk["b2"](blk["c2"](h))
            return F.relu(h + skip)

        def forward(self, pose, img, lidar, radar, src, dst, edge_attr):
            import torch
            import torch.nn.functional as F

            h = self.stem(img)
            for blk in self.blocks:
                h = self._res(blk, h)
            x_img = h.flatten(1)

            t = self.stn_mlp(lidar).max(-1).values
            trans = self.stn_fc(t).view(-1, 3, 3) + torch.eye(3)
            pts = torch.bmm(trans, lidar)
            pf = self.pn_mlp(pts).max(-1).values
            x_lidar = self.fc_lidar(self.pn_head(pf))

            rf = self.rn_mlp(radar).max(-1).values
            x_radar = self.fc_radar(self.rn_head(rf))

            e = self.edge_enc(edge_attr)
            si = torch.cat(
                [self.att["rad"](x_radar[dst]), self.att["lid"](x_lidar[dst]), self.att["img"](x_img[dst])], 1
            )
            sj = torch.cat(
                [self.att["rad"](x_radar[src]), self.att["lid"](x_lidar[src]), self.att["img"](x_img[src])], 1
            )
            att_e = self.att_edge_enc(torch.cat([si, sj, e], 1))

            x = self.node_enc(pose)
            x0 = x
            n = x.shape[0]
            for _ in range(self.depth):
                ue = self.edge_update(torch.cat([x[dst], x[src], e, att_e], 1))
                fm = self.future(torch.cat([x[dst], ue, x0[dst]], 1))
                pm = self.past(torch.cat([x[src], ue, x0[src]], 1))
                agg_p = torch.zeros(n, pm.shape[1]).index_add_(0, dst, pm)
                agg_f = torch.zeros(n, fm.shape[1]).index_add_(0, src, fm)
                x = self.combine(torch.cat([agg_p, agg_f], 1))
                e = ue
            return self.classifier(e)

    model = TorchMMGNN().eval()

    tensors = []
    for w in windows:
        img = w.img.astype(np.float32) / 255.0 if w.img.dtype == np.uint8 else w.img
        tensors.append(
            (
                torch.from_numpy(w.pose),
                torch.from_numpy(np.ascontiguousarray(img.transpose(0, 3, 1, 2))),
                torch.from_numpy(np.ascontiguousarray(w.lidar.transpose(0, 2, 1))),
                torch.from_numpy(np.ascontiguousarray(w.radar.transpose(0, 2, 1))),
                torch.from_numpy(w.edge_src.astype(np.int64)),
                torch.from_numpy(w.edge_dst.astype(np.int64)),
                torch.from_numpy(w.edge_attr),
            )
        )

    with torch.no_grad():
        model(*tensors[0])  # warmup
        done_edges = 0
        t0 = time.perf_counter()
        for w, t in zip(windows, tensors):
            model(*t)
            done_edges += w.num_edges
            if time.perf_counter() - t0 > max_seconds:
                break
        dt = time.perf_counter() - t0
    return done_edges / dt


def main():
    if os.environ.get("B3D_BENCH_DEMO"):
        scenes_windows = demo_scenes()
        batch_size = 8
    else:
        scenes_windows = build_scenes()
        batch_size = 12
    windows = [w for _, ws in scenes_windows for w in ws]
    tpu_eps, _ = bench_tpu(scenes_windows, batch_size=batch_size)
    # median of 3 CPU-twin runs: this host has ONE contended CPU core and
    # the single measurement swung ~2.7x between rounds (round-3 VERDICT
    # weak #1 — the headline RATIO drifted while the edges/s numerator
    # reproduced); the median pins the denominator
    cpu_eps = float(
        np.median([bench_torch_cpu(windows, max_seconds=30.0) for _ in range(3)])
    )
    print(
        json.dumps(
            {
                "metric": "mm_gnn_edge_scoring_throughput",
                "value": round(tpu_eps, 1),
                "unit": "edges/s",
                "vs_baseline": round(tpu_eps / cpu_eps, 2),
                "baseline_cpu_edges_per_s": round(cpu_eps, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
