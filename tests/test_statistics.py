"""Dataset statistics + JSON merge + full-state resume tests."""

import numpy as np
import pytest

from batch3dmot_tpu.config import GNNConfig, GraphConstructionConfig
from batch3dmot_tpu.data.synthetic import make_synthetic_scene
from batch3dmot_tpu.graphs import build_scene_graphs
from batch3dmot_tpu.graphs.statistics import (
    edge_class_histogram,
    positive_rate,
    relative_frequencies,
)
from batch3dmot_tpu.io import save_scene_graphs
from batch3dmot_tpu.models import PoseGNN
from batch3dmot_tpu.train import GNNTrainer
from batch3dmot_tpu.train.data import GraphBatcher, to_padded
from batch3dmot_tpu.utils.json_tools import merge_split_keyed

BUCKETS = ((64, 256),)


def test_edge_class_histogram(tmp_path):
    scene = make_synthetic_scene(seed=0, num_frames=6, num_tracks=6)
    windows = list(build_scene_graphs(scene, 3, GraphConstructionConfig(top_knn_nodes=4)))
    path = save_scene_graphs(windows, str(tmp_path))
    hist = edge_class_histogram([path])
    total_edges = sum(w.num_edges for w in windows)
    assert sum(hist.values()) == total_edges
    freq = relative_frequencies(hist)
    assert sum(freq.values()) == pytest.approx(1.0)
    pr = positive_rate([path])
    assert 0.0 < pr < 1.0


def test_merge_split_keyed():
    a = {"train": [1, 2], "val": [3]}
    b = {"train": [4], "test": [5]}
    out = merge_split_keyed(a, b)
    assert out == {"train": [1, 2, 4], "val": [3], "test": [5]}


def test_full_state_resume(tmp_path):
    windows = list(
        build_scene_graphs(
            make_synthetic_scene(seed=0, num_frames=6, num_tracks=5),
            3,
            GraphConstructionConfig(top_knn_nodes=4),
        )
    )
    batcher = GraphBatcher(windows, 2, BUCKETS, seed=0)
    example = to_padded(windows[0], *BUCKETS[0])
    cfg = GNNConfig(lr=1e-3, batch_size=2)

    t1 = GNNTrainer(PoseGNN(depth=2), example, cfg, seed=0)
    batch = next(batcher.epoch(shuffle=False))
    t1.state, _, _ = t1._train_step(t1.state, batch)
    ckpt = t1.save_state(str(tmp_path / "state.msgpack"))

    t2 = GNNTrainer(PoseGNN(depth=2), example, cfg, seed=1)  # different init
    t2.load_state(ckpt)
    assert int(t2.state.step) == 1

    # both continue identically
    t1.state, loss1, _ = t1._train_step(t1.state, batch)
    t2.state, loss2, _ = t2._train_step(t2.state, batch)
    assert float(loss1) == pytest.approx(float(loss2), rel=1e-6)
    for a, b in zip(
        np.asarray(list(t1.state.params["edge_encoder"]["dense_0"].values())[0]).ravel(),
        np.asarray(list(t2.state.params["edge_encoder"]["dense_0"].values())[0]).ravel(),
    ):
        assert a == pytest.approx(b, rel=1e-6)
