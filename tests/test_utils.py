"""Tests for observability + checkpoint utilities."""

import json
import time

import numpy as np

from batch3dmot_tpu.utils.checkpoint import (
    epoch_checkpoint_name,
    load_checkpoint,
    merge_encoder_params,
    save_checkpoint,
)
from batch3dmot_tpu.utils.metric_logging import MetricWriter
from batch3dmot_tpu.utils.profiling import StepTimer


def test_metric_writer_jsonl(tmp_path):
    w = MetricWriter(str(tmp_path), tensorboard=False)
    w.log(0, {"loss": 1.5, "ap": 0.7})
    w.log(1, {"loss": 1.2, "ap": 0.8})
    w.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["loss"] == 1.5 and lines[1]["step"] == 1


def test_step_timer_summary():
    t = StepTimer(warmup=1)
    for _ in range(4):
        with t:
            time.sleep(0.01)
    s = t.summary()
    assert s["steps"] == 3
    # upper bound only guards against unit errors (ms/ns recorded as s);
    # it must survive a loaded single-core host where sleep(0.01) can
    # take hundreds of ms wall-clock
    assert 0.005 < s["mean_s"] < 5.0


def test_checkpoint_roundtrip(tmp_path):
    tree = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}}
    path = save_checkpoint(str(tmp_path / "ck.msgpack"), tree, {"ap": 0.5})
    loaded = load_checkpoint(path, {"params": {"w": np.zeros((2, 3), np.float32)}})
    np.testing.assert_array_equal(loaded["params"]["w"], tree["params"]["w"])
    meta = json.load(open(path + ".meta.json"))
    assert meta["ap"] == 0.5


def test_epoch_checkpoint_name():
    name = epoch_checkpoint_name("/logs", "gnn", 3, "v1.0-mini", 0.9123456, 0.85)
    assert "epoch3" in name and "TrainAP0.912346" in name and name.endswith(".msgpack")


def test_merge_encoder_params():
    gnn = {"params": {"edge_encoder": {"k": 1}}}
    enc = {"params": {"stem": {"k": 2}}, "batch_stats": {"bn": {"m": 3}}}
    out = merge_encoder_params(gnn, resnet=enc)
    assert out["params"]["resnet"]["stem"]["k"] == 2
    assert out["batch_stats"]["resnet"]["bn"]["m"] == 3
    assert out["params"]["edge_encoder"]["k"] == 1
