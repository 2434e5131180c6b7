"""Model-family registry + the import-checkpoint / eval CLI surfaces."""

import json

import jax
import numpy as np
import pytest

from batch3dmot_tpu.cli import main
from batch3dmot_tpu.models import MODEL_REGISTRY, MultimodalGNN, PoseGNN, make_model


def test_registry_covers_reference_family():
    # the model modules the reference's predict.py imports (SURVEY.md §0)
    for name in ("clr_att_gnn", "cl_att_gnn", "cl_gnn_trad", "gnn_baseline",
                 "gnn_transfer_cl", "gnn_transfer_cl_med", "pose_gnn"):
        assert name in MODEL_REGISTRY, name

    m = make_model("clr_att_gnn", depth=2)
    assert isinstance(m, MultimodalGNN)
    assert m.modalities == ("img", "lidar", "radar") and m.use_attention

    m = make_model("cl_att_gnn")
    assert m.modalities == ("img", "lidar") and m.use_attention

    m = make_model("cl_gnn_trad")
    assert m.modalities == ("img", "lidar") and not m.use_attention

    assert isinstance(make_model("gnn_baseline"), PoseGNN)
    # transfer variants share the cl architecture
    assert make_model("gnn_transfer_cl").modalities == ("img", "lidar")

    with pytest.raises(ValueError, match="Unknown model"):
        make_model("nope")


def test_import_checkpoint_cli_roundtrip(tmp_path, capsys):
    import torch

    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_torch_import import _TorchPoseGNN

    twin = _TorchPoseGNN(depth=2).eval()
    pth = tmp_path / "ref.pth"
    torch.save(twin.state_dict(), pth)

    out = tmp_path / "imported.msgpack"
    main([
        "import-checkpoint", "--torch", str(pth), "--arch", "pose",
        "--out", str(out),
    ])
    assert out.exists()
    assert "import-checkpoint[pose]" in capsys.readouterr().out

    # the imported variables must drive the flax model to the same logits
    from batch3dmot_tpu.graph import pad_graph
    from batch3dmot_tpu.utils.checkpoint import load_checkpoint

    rng = np.random.default_rng(0)
    n, e = 6, 10
    pose = rng.standard_normal((n, 19)).astype(np.float32)
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    attr = rng.standard_normal((e, 4)).astype(np.float32)

    model = PoseGNN(depth=2)
    g = pad_graph(pose=pose, edge_src=src, edge_dst=dst, edge_attr=attr,
                  node_time=np.zeros(n, np.int32), node_class=np.ones(n, np.int32),
                  max_nodes=n, max_edges=e)
    template = jax.jit(model.init)(jax.random.key(0), g)
    variables = load_checkpoint(str(out), template)
    got, _ = model.apply(variables, g)

    import torch as t

    with t.no_grad():
        want = twin(t.from_numpy(pose), t.from_numpy(src.astype(np.int64)),
                    t.from_numpy(dst.astype(np.int64)), t.from_numpy(attr))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=2e-5, atol=1e-5)


def test_eval_requires_gt_or_devkit(tmp_path):
    sub = tmp_path / "sub.json"
    sub.write_text(json.dumps({"results": {}}))
    with pytest.raises(SystemExit, match="--gt is required"):
        main(["eval", "--submission", str(sub)])


def test_train_gnn_accepts_reference_model_name(tmp_path):
    main([
        "build-graphs", "--synthetic", "1",
        "--set", f"paths.tmp={tmp_path}",
        "--set", "graph_construction.batch_size_graph=3",
        "--set", "graph_construction.top_knn_nodes=4",
    ])
    history = main([
        "train-gnn", "--model", "gnn_baseline", "--epochs", "1",
        "--set", f"paths.tmp={tmp_path}",
        "--set", "gnn.gnn_depth=2",
        "--set", "gnn.batch_size=2",
    ])
    assert history and np.isfinite(history[0]["train/loss"])
