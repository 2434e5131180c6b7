"""End-to-end fused device-pipeline throughput (scenes/s), real chip.

Measures the steady state of `DeviceScenePipeline.score_scene` over a batch
of same-quanta synthetic scenes: on-device window construction + encode +
scoring, host fetch, and cross-window averaging — the full serving loop for
one scene. Pass 1 pays compiles; pass 2 is the number reported in
docs/RESULTS.md.

Run: python scripts/bench_pipeline.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

import numpy as np

from batch3dmot_tpu.data.synthetic import make_synthetic_scene
from batch3dmot_tpu.graph import pad_graph
from batch3dmot_tpu.infer.device_pipeline import DeviceScenePipeline
from batch3dmot_tpu.models import MultimodalGNN


def main(n_scenes=8, num_frames=12, num_tracks=12, window_len=3, k=8):
    scenes = [
        make_synthetic_scene(
            seed=200 + i, num_frames=num_frames, num_tracks=num_tracks,
            with_modalities=True, modality_dropout=0.2,
        )
        for i in range(n_scenes)
    ]
    if os.environ.get("B3D_BENCH_POINT_F16"):
        # the CLI predict default (predict.point_dtype=float16): half the
        # lidar/radar upload bytes, upcast on device
        import dataclasses

        scenes = [
            dataclasses.replace(
                s,
                lidar=s.lidar.astype(np.float16),
                radar=s.radar.astype(np.float16),
            )
            for s in scenes
        ]
    model = MultimodalGNN()
    s = scenes[0]
    idx = np.arange(min(8, s.num_detections))
    example = pad_graph(
        pose=np.zeros((4, 19), np.float32),
        edge_src=np.zeros(4, np.int32), edge_dst=np.zeros(4, np.int32),
        edge_attr=np.zeros((4, 4), np.float32),
        node_time=np.zeros(4, np.int32), node_class=np.ones(4, np.int32),
        max_nodes=8, max_edges=16,
        img=s.img[idx][:4], lidar=s.lidar[idx][:4], radar=s.radar[idx][:4],
    )
    variables = jax.jit(model.init)(jax.random.key(0), example)
    pipe = DeviceScenePipeline(model, variables, window_len=window_len, k=k)

    def sweep(label, score_pass):
        t0 = time.time()
        total_edges = score_pass()
        dt = time.time() - t0
        print(
            f"{label} [frames={num_frames} tracks={num_tracks} "
            f"L={window_len} k={k}]: {n_scenes} scenes in {dt:.2f}s = "
            f"{n_scenes/dt:.2f} scenes/s ({total_edges} averaged edges)",
            flush=True,
        )

    def per_scene():
        return sum(len(pipe.score_scene(s)) for s in scenes)

    for label in ("pass1 (compiles)", "pass2 (steady)"):
        sweep(label, per_scene)

    # 1-deep pipelined dispatch: scene i+1's upload overlaps scene i's
    # device compute + fetch (the CLI predict loop's dispatch/finalize
    # staging)
    def pipelined():
        total, pending = 0, None
        for s in scenes:
            nxt = pipe.dispatch_scene(s)
            if pending is not None:
                total += len(pipe.finalize_scene(pending))
            pending = nxt
        return total + len(pipe.finalize_scene(pending))

    sweep("pipelined steady", pipelined)

    # cross-scene grouped dispatch: one program call per G scenes
    for g in (2, 4):
        def grouped():
            total = 0
            for i in range(0, n_scenes, g):
                total += sum(
                    len(r) for r in pipe.score_scenes(scenes[i : i + g])
                )
            return total

        sweep(f"group{g} pass1 (compiles)", grouped)
        sweep(f"group{g} steady", grouped)

        def grouped_pipelined():
            total, pending = 0, None
            for i in range(0, n_scenes, g):
                nxt = pipe.dispatch_scenes(scenes[i : i + g])
                if pending is not None:
                    total += sum(
                        len(r) for r in pipe.finalize_scenes(pending)
                    )
                pending = nxt
            return total + sum(
                len(r) for r in pipe.finalize_scenes(pending)
            )

        sweep(f"group{g} pipelined steady", grouped_pipelined)


if __name__ == "__main__":
    if os.environ.get("B3D_BENCH_TRAINVAL_SCALE"):
        # nuScenes-trainval-like density: 40-frame scenes, dozens of
        # concurrent tracks, predict window L=2 (reference cl_config) and a
        # denser L=5 variant
        main(n_scenes=4, num_frames=40, num_tracks=40, window_len=2, k=16)
        main(n_scenes=4, num_frames=40, num_tracks=40, window_len=5, k=16)
    else:
        main()
