"""CLI smoke test: the full synthetic pipeline through the demo command."""

import glob
import os

import pytest

from batch3dmot_tpu.cli import main
from batch3dmot_tpu.config import Config


def test_config_override_rederives_paths():
    cfg = Config()
    cfg.apply_overrides(["paths.tmp=/tmp/xyz"])
    assert cfg.paths.graphs_dir.startswith("/tmp/xyz")
    assert cfg.paths.models.startswith("/tmp/xyz")
    cfg2 = Config()
    cfg2.apply_overrides(["paths.tmp=/tmp/xyz", "paths.models=/keep/me"])
    assert cfg2.paths.models == "/keep/me"


@pytest.mark.slow
def test_cli_build_and_train(tmp_path, capsys):
    main([
        "build-graphs", "--synthetic", "1",
        "--set", f"paths.tmp={tmp_path}",
        "--set", "graph_construction.batch_size_graph=3",
        "--set", "graph_construction.top_knn_nodes=4",
    ])
    cfg = Config()
    cfg.apply_overrides([f"paths.tmp={tmp_path}"])
    stores = glob.glob(os.path.join(cfg.paths.graphs_dir, "*.b3d"))
    assert len(stores) == 1
    out = capsys.readouterr().out
    assert "build-graphs" in out

    main([
        "train-gnn", "--model", "pose", "--epochs", "1",
        "--set", f"paths.tmp={tmp_path}",
        "--set", "gnn.gnn_depth=2",
        "--set", "gnn.batch_size=2",
    ])
    ckpts = glob.glob(os.path.join(cfg.paths.models, "gnn", "*.msgpack"))
    assert ckpts

    main([
        "predict", "--model", "pose", "--checkpoint", ckpts[-1],
        "--set", f"paths.tmp={tmp_path}",
        "--set", "gnn.gnn_depth=2",
    ])
    assert os.path.exists(os.path.join(cfg.paths.eval, "submission.json"))
