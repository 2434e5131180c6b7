"""Interleaved A/B: device-side vs host-side cross-window averaging.

Relay dispatch latency swings ~10x between sessions (CLAUDE.md), so
process-level before/after runs of scripts/bench_pipeline.py are not
comparable. This probe loads the PREVIOUS device_pipeline module (host
averaging, [3, W, E] fetch) from git alongside the current one (device
averaging, [2, m_pad, (L-1)*k] fetch) and times them in alternating
rounds within one process — drift cancels, compiles are paid up front.

Run (real chip): python scripts/ab_device_average.py [git-rev]
"""

import importlib.util
import os
import subprocess
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


def load_old(rev: str):
    src = subprocess.run(
        ["git", "show", f"{rev}:batch3dmot_tpu/infer/device_pipeline.py"],
        capture_output=True, text=True, check=True,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
    ).stdout
    spec = importlib.util.spec_from_loader("old_device_pipeline", loader=None)
    mod = importlib.util.module_from_spec(spec)
    exec(compile(src, "old_device_pipeline.py", "exec"), mod.__dict__)
    return mod.DeviceScenePipeline


def main(rev="HEAD", num_frames=40, num_tracks=40, rounds=5):
    scenes = [
        make_synthetic_scene(
            seed=200 + i, num_frames=num_frames, num_tracks=num_tracks,
            with_modalities=True, modality_dropout=0.2,
        )
        for i in range(4)
    ]
    model = MultimodalGNN()
    s = scenes[0]
    idx = np.arange(4)
    example = pad_graph(
        pose=np.zeros((4, 19), np.float32),
        edge_src=np.zeros(4, np.int32), edge_dst=np.zeros(4, np.int32),
        edge_attr=np.zeros((4, 4), np.float32),
        node_time=np.zeros(4, np.int32), node_class=np.ones(4, np.int32),
        max_nodes=8, max_edges=16,
        img=s.img[idx], lidar=s.lidar[idx], radar=s.radar[idx],
    )
    variables = jax.jit(model.init)(jax.random.key(0), example)
    OldPipeline = load_old(rev)

    for window_len, k in ((2, 16), (5, 16)):
        pipes = {
            "old(host-avg)": OldPipeline(
                model, variables, window_len=window_len, k=k
            ),
            "new(dev-avg)": DeviceScenePipeline(
                model, variables, window_len=window_len, k=k
            ),
        }
        # warmup/compile both
        for name, p in pipes.items():
            t0 = time.time()
            n_edges = sum(len(p.score_scene(sc)) for sc in scenes)
            print(
                f"L={window_len} {name} compile pass: {time.time()-t0:.1f}s "
                f"({n_edges} edges)", flush=True,
            )
        times = {name: [] for name in pipes}
        for _ in range(rounds):
            for name, p in pipes.items():
                t0 = time.time()
                for sc in scenes:
                    p.score_scene(sc)
                times[name].append(time.time() - t0)
        for name, ts in times.items():
            ts = np.array(ts)
            print(
                f"L={window_len} {name}: median {np.median(ts):.2f}s "
                f"min {ts.min():.2f}s over {rounds} rounds of 4 scenes "
                f"-> {4/np.median(ts):.2f} scenes/s (best {4/ts.min():.2f})",
                flush=True,
            )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "HEAD")
