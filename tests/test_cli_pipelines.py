"""CLI predict fast paths: the encode-once `encoded` pipeline (the mm
default) must reproduce the re-encoding `windows` path, and the store-backed
scene reconstruction must carry real yaw/velocity (not the round-1 zero
fill)."""

import glob
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from batch3dmot_tpu.cli import main, _scene_from_store
from batch3dmot_tpu.io import GraphStoreReader


@pytest.fixture(scope="module")
def mm_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli_pipe")
    common = [
        "--set", f"paths.tmp={tmp}",
        "--set", "graph_construction.batch_size_graph=3",
        "--set", "graph_construction.top_knn_nodes=4",
        "--set", "gnn.gnn_depth=2",
        "--set", "gnn.batch_size=2",
    ]
    main(["build-graphs", "--synthetic", "2", *common])
    main(["train-gnn", "--model", "mm", "--epochs", "1", *common])
    ckpts = sorted(
        glob.glob(os.path.join(tmp, "nuscenes", "models", "gnn", "*.msgpack")),
        key=os.path.getmtime,
    )
    assert ckpts
    return tmp, ckpts[-1], common


def _edge_scores(eval_dir):
    out = {}
    for p in glob.glob(os.path.join(eval_dir, "predict", "*_edge_scores.json")):
        out[os.path.basename(p)] = json.load(open(p))
    return out


def test_encoded_pipeline_matches_windows(mm_setup):
    tmp, ckpt, common = mm_setup

    def run(pipeline):
        eval_dir = os.path.join(tmp, f"eval_{pipeline}")
        main([
            "predict", "--model", "mm", "--checkpoint", ckpt,
            "--pipeline", pipeline,
            *common,
            "--set", f"paths.eval={eval_dir}",
        ])
        return _edge_scores(eval_dir)

    sw = run("windows")
    se = run("encoded")
    assert sw.keys() == se.keys() and sw
    for name in sw:
        assert sw[name].keys() == se[name].keys()
        a = np.array([sw[name][k] for k in sw[name]])
        b = np.array([se[name][k] for k in sw[name]])
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_auto_pipeline_is_encoded_for_mm(mm_setup, capsys):
    tmp, ckpt, common = mm_setup
    eval_dir = os.path.join(tmp, "eval_auto")
    main([
        "predict", "--model", "mm", "--checkpoint", ckpt,
        *common,
        "--set", f"paths.eval={eval_dir}",
    ])
    assert "predict[encoded]" in capsys.readouterr().out


def test_scene_from_store_restores_yaw_vel_and_modalities(mm_setup):
    tmp, _, _ = mm_setup
    store = glob.glob(os.path.join(tmp, "nuscenes", "graphs", "*.b3d"))[0]
    windows = GraphStoreReader(store).windows()
    scene = _scene_from_store(store, windows, with_modalities=True)
    # synthetic scenes move: yaw/velocity must not be all-zero
    assert np.abs(scene.vel_g).sum() > 0
    assert scene.img is not None and scene.img.shape[1:] == (32, 32, 3)
    assert scene.lidar is not None and scene.lidar.shape[1:] == (128, 3)
    # modality rows must match the windows' node features exactly
    w = windows[0]
    np.testing.assert_array_equal(scene.img[w.det_index], w.img)


def test_pose_rejects_encoded_pipeline(mm_setup):
    tmp, ckpt, common = mm_setup
    with pytest.raises(SystemExit):
        main([
            "predict", "--model", "pose", "--checkpoint", ckpt,
            "--pipeline", "encoded", *common,
        ])


def test_train_gnn_encoded_with_grafted_encoders(mm_setup, tmp_path, capsys):
    """CLI --encoded trains on precomputed embeddings, with a pretrained
    encoder checkpoint grafted into the tracker (reference train.py:54-61)."""
    tmp, _, common = mm_setup

    # train a resnet encoder (synthetic) and graft it
    main([
        "train-resnet", "--epochs", "1", "--synthetic",
        "--set", f"paths.tmp={tmp_path}",
    ])
    enc_ck = sorted(
        glob.glob(os.path.join(tmp_path, "nuscenes", "models", "resnet", "*.msgpack")),
        key=os.path.getmtime,
    )[-1]

    history = main([
        "train-gnn", "--model", "mm", "--epochs", "1", "--encoded",
        "--resnet-checkpoint", enc_ck,
        *common,
        "--set", f"paths.models={tmp_path}/models2",
    ])
    out = capsys.readouterr().out
    assert "grafted frozen resnet encoder" in out
    assert history and np.isfinite(history[0]["train/loss"])
    assert glob.glob(os.path.join(str(tmp_path), "models2", "gnn", "*mm*.msgpack"))


def test_train_gnn_encoded_rejects_pose(mm_setup):
    tmp, _, common = mm_setup
    with pytest.raises(SystemExit, match="multimodal"):
        main(["train-gnn", "--model", "pose", "--encoded", "--epochs", "1", *common])


def test_predict_skip_existing_resumes(mm_setup):
    """--skip-existing reuses per-scene results JSONs: a re-run with half
    the scenes pre-scored (and half deleted, as after an interruption)
    produces an identical submission."""
    tmp, ckpt, common = mm_setup
    eval_dir = os.path.join(tmp, "eval_resume")
    args = [
        "predict", "--model", "mm", "--checkpoint", ckpt,
        *common, "--set", f"paths.eval={eval_dir}",
    ]
    main(args)
    sub1 = json.load(open(os.path.join(eval_dir, "submission.json")))
    results_files = sorted(
        glob.glob(os.path.join(eval_dir, "predict", "*_results.json"))
    )
    assert len(results_files) >= 2
    # simulate an interrupted run: one scene's results survive, the rest
    # are gone; the submission from the full run is also gone
    os.remove(os.path.join(eval_dir, "submission.json"))
    for p in results_files[1:]:
        os.remove(p)
    main(args + ["--skip-existing"])
    sub2 = json.load(open(os.path.join(eval_dir, "submission.json")))
    assert sub1["results"].keys() == sub2["results"].keys()
    for token in sub1["results"]:
        a = sorted(sub1["results"][token], key=lambda b: (b["tracking_id"], b["sample_token"]))
        b = sorted(sub2["results"][token], key=lambda b: (b["tracking_id"], b["sample_token"]))
        assert len(a) == len(b)
        for x, y in zip(a, b):
            assert x["tracking_name"] == y["tracking_name"]
            np.testing.assert_allclose(x["translation"], y["translation"])
            assert x["tracking_id"] == y["tracking_id"]

def test_device_pipeline_grouped_matches_ungrouped(mm_setup):
    """predict --pipeline device with predict.scenes_per_batch>1 (one
    vmapped program per scene GROUP) must produce the same per-scene edge
    scores and submission as scenes_per_batch=1, including with a group
    size that doesn't divide the scene count."""
    tmp, ckpt, common = mm_setup

    def run(tag, scenes_per_batch):
        eval_dir = os.path.join(tmp, f"eval_grp_{tag}")
        main([
            "predict", "--model", "mm", "--checkpoint", ckpt,
            "--pipeline", "device", "--synthetic", "3",
            *common,
            "--set", f"paths.eval={eval_dir}",
            "--set", f"predict.scenes_per_batch={scenes_per_batch}",
        ])
        sub = json.load(open(os.path.join(eval_dir, "submission.json")))
        return _edge_scores(eval_dir), sub

    s1, sub1 = run("one", 1)
    s2, sub2 = run("two", 2)  # 3 scenes -> group of 2 + group of 1
    assert s1.keys() == s2.keys() and len(s1) == 3
    for name in s1:
        assert s1[name].keys() == s2[name].keys()
        a = np.array([s1[name][k] for k in s1[name]])
        b = np.array([s2[name][k] for k in s1[name]])
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    assert sub1["results"].keys() == sub2["results"].keys()
    for token in sub1["results"]:
        assert len(sub1["results"][token]) == len(sub2["results"][token])


def test_encoded_pipeline_grouped_matches_ungrouped(mm_setup):
    """predict --pipeline encoded with predict.scenes_per_batch>1 (one
    grouped encode + one scanned scoring dispatch per scene group) must
    produce the same per-scene edge scores and submission as
    scenes_per_batch=1, including a partial last group."""
    tmp, ckpt, common = mm_setup

    def run(tag, scenes_per_batch):
        eval_dir = os.path.join(tmp, f"eval_egrp_{tag}")
        main([
            "predict", "--model", "mm", "--checkpoint", ckpt,
            "--pipeline", "encoded",
            *common,
            "--set", f"paths.eval={eval_dir}",
            "--set", f"predict.scenes_per_batch={scenes_per_batch}",
        ])
        sub = json.load(open(os.path.join(eval_dir, "submission.json")))
        return _edge_scores(eval_dir), sub

    s1, sub1 = run("one", 1)
    s3, sub3 = run("three", 3)  # 2 store scenes -> one partial group of 2
    assert s1.keys() == s3.keys() and len(s1) == 2
    for name in s1:
        assert s1[name].keys() == s3[name].keys()
        a = np.array([s1[name][k] for k in s1[name]])
        b = np.array([s3[name][k] for k in s1[name]])
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    assert sub1["results"].keys() == sub3["results"].keys()
    for token in sub1["results"]:
        assert len(sub1["results"][token]) == len(sub3["results"][token])


def test_encoded_pipeline_grouped_multichip_matches_single(mm_setup):
    """Grouped encoded predict on a 2-chip mesh (scanned stack's window
    batch axis sharded, encodings replicated) must reproduce the
    single-device ungrouped scores at the CLI surface."""
    tmp, ckpt, common = mm_setup

    def run(tag, scenes_per_batch, devices):
        eval_dir = os.path.join(tmp, f"eval_egrpm_{tag}")
        args = [
            "predict", "--model", "mm", "--checkpoint", ckpt,
            "--pipeline", "encoded",
            *common,
            "--set", f"paths.eval={eval_dir}",
            "--set", f"predict.scenes_per_batch={scenes_per_batch}",
        ]
        if devices:
            args += ["--devices", str(devices)]
        main(args)
        return _edge_scores(eval_dir)

    s1 = run("single", 1, 0)
    sm = run("mesh", 3, 2)
    assert s1.keys() == sm.keys() and len(s1) == 2
    for name in s1:
        assert s1[name].keys() == sm[name].keys()
        a = np.array([s1[name][k] for k in s1[name]])
        b = np.array([sm[name][k] for k in s1[name]])
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_device_pipeline_group_routes_biggest_bucket_to_singles(monkeypatch):
    """The HBM-staged fused kernel is unavailable under jax.vmap, so scene
    GROUPS whose shared bucket is (512, 8192) — fused only single-scene —
    must be scored scene-by-scene (the per-scene kernel win beats the
    grouped dispatch amortization there; scripts/probe_pipeline_big.py)."""
    from batch3dmot_tpu.data.synthetic import make_synthetic_scene
    from batch3dmot_tpu.infer.device_pipeline import DeviceScenePipeline
    from batch3dmot_tpu.models import MultimodalGNN

    scenes = [
        make_synthetic_scene(
            seed=50 + i, num_frames=12, num_tracks=90, fp_per_frame=6.0,
            with_modalities=True, scene_token=f"dense{i}",
        )
        for i in range(2)
    ]
    pipe = DeviceScenePipeline(
        MultimodalGNN(), variables=None, window_len=5, k=16, fused=True
    )
    # the dense scenes must land in the 512-node quantum for the routing
    # condition to trigger
    assert max(pipe._quanta(s)[2] for s in scenes) == 512

    # the pipelined singles path goes dispatch_scene -> finalize_scene
    called = []
    monkeypatch.setattr(
        type(pipe), "dispatch_scene",
        lambda self, s: called.append(s.scene_token) or "pend",
    )
    monkeypatch.setattr(
        type(pipe), "finalize_scene",
        lambda self, p: {(0, 1): 0.5} if p == "pend" else {},
    )
    results = pipe.score_scenes(scenes)
    assert called == ["dense0", "dense1"]
    assert all(r == {(0, 1): 0.5} for r in results)


def test_device_pipeline_group_routes_chip_filling_scenes_to_singles(
    monkeypatch,
):
    """Density-aware grouped dispatch (round-3 VERDICT next #6): trainval
    L=5-shaped scenes (W*N*E ~42M edge-node products per scene, where
    grouping measured 0.62-1.03x vs per-scene) must be scored per-scene
    even when scenes_per_batch would group them; trainval L=2-shaped
    scenes (~10M, where grouping wins 1.4-1.6x) must still group."""
    from batch3dmot_tpu.data.synthetic import make_synthetic_scene
    from batch3dmot_tpu.infer.device_pipeline import DeviceScenePipeline
    from batch3dmot_tpu.models import MultimodalGNN

    scenes = [
        make_synthetic_scene(
            seed=70 + i, num_frames=40, num_tracks=40,
            with_modalities=True, scene_token=f"tv{i}",
        )
        for i in range(2)
    ]

    # the pipelined singles path goes dispatch_scene -> finalize_scene
    called = []
    cls = type(DeviceScenePipeline(MultimodalGNN(), None, 2, 4))
    monkeypatch.setattr(
        cls, "dispatch_scene",
        lambda self, s: called.append(s.scene_token) or "pend",
    )
    monkeypatch.setattr(
        cls, "finalize_scene",
        lambda self, p: {(0, 1): 0.5} if p == "pend" else {},
    )

    # L=5 trainval density: chip-filling -> per-scene
    pipe5 = DeviceScenePipeline(
        MultimodalGNN(), variables=None, window_len=5, k=16, fused=True
    )
    m_pad, w, n = pipe5._quanta(scenes[0])
    assert (-(-w // 8) * 8) * n * n * 16 >= 32_000_000  # above the ceiling
    assert pipe5.score_scenes(scenes) == [{(0, 1): 0.5}] * 2
    assert called == ["tv0", "tv1"]

    # L=2 trainval density: underfills -> grouped (dispatch_scene NOT called;
    # the grouped path would need real variables, so a sentinel raise
    # proves the branch taken)
    called.clear()
    pipe2 = DeviceScenePipeline(
        MultimodalGNN(), variables=None, window_len=2, k=16, fused=True
    )
    m_pad, w, n = pipe2._quanta(scenes[0])
    assert (-(-w // 8) * 8) * n * n * 16 < 32_000_000
    try:
        pipe2.score_scenes(scenes)
    except Exception:
        pass  # grouped path dies on variables=None AFTER the routing branch
    assert called == []


def test_train_gnn_device_dataset_matches_streamed(mm_setup, tmp_path, capsys):
    """CLI --encoded --device-dataset (whole dataset uploaded once, one
    scanned program per epoch) must train, checkpoint, and report a
    finite loss in the same range as the streamed path; without --encoded
    the flag is rejected."""
    tmp, _, common = mm_setup

    with pytest.raises(SystemExit, match="needs --encoded"):
        main(["train-gnn", "--model", "mm", "--device-dataset",
              "--epochs", "1", *common])

    history = main([
        "train-gnn", "--model", "mm", "--epochs", "2", "--encoded",
        "--device-dataset",
        *common,
        "--set", f"paths.models={tmp_path}/models_dd",
    ])
    out = capsys.readouterr().out
    assert "device-resident dataset" in out
    assert history and np.isfinite(history[0]["train/loss"])
    assert history[-1]["train/loss"] <= history[0]["train/loss"] * 1.5
    assert glob.glob(
        os.path.join(str(tmp_path), "models_dd", "gnn", "*mm*.msgpack")
    )


def test_train_gnn_device_dataset_pose(mm_setup, tmp_path):
    """The pose model's device-resident path (plain window dataset, no
    encodings) trains and checkpoints through the CLI."""
    tmp, _, common = mm_setup
    history = main([
        "train-gnn", "--model", "pose", "--epochs", "2", "--device-dataset",
        *common,
        "--set", f"paths.models={tmp_path}/models_pose_dd",
    ])
    assert history and np.isfinite(history[0]["train/loss"])
    assert glob.glob(
        os.path.join(str(tmp_path), "models_pose_dd", "gnn", "*pose*.msgpack")
    )


def test_train_gnn_encoded_auto_device_dataset(mm_setup, capsys, monkeypatch):
    """`--encoded` with neither `--device-dataset` nor `--stream`
    auto-upgrades to the device-resident dataset when the estimated dedup
    size fits the HBM budget (device epochs run ~40x faster through the
    relay); `--stream` pins scene-streaming; an impossible budget makes
    the estimator choose streaming."""
    tmp, _, common = mm_setup

    h = main([
        "train-gnn", "--model", "mm", "--encoded", "--epochs", "1",
        *common, "--set", f"paths.models={tmp}/models_auto",
    ])
    out = capsys.readouterr().out
    assert "auto device-resident dataset" in out
    assert "device-resident dataset (" in out
    assert h and np.isfinite(h[0]["train/loss"])

    h = main([
        "train-gnn", "--model", "mm", "--encoded", "--stream",
        "--epochs", "1",
        *common, "--set", f"paths.models={tmp}/models_stream",
    ])
    out = capsys.readouterr().out
    assert "auto device-resident" not in out
    assert "train batches/epoch" in out
    assert h and np.isfinite(h[0]["train/loss"])

    monkeypatch.setenv("B3D_DEVICE_DATASET_GB", "0.000001")
    h = main([
        "train-gnn", "--model", "mm", "--encoded", "--epochs", "1",
        *common, "--set", f"paths.models={tmp}/models_tiny",
    ])
    out = capsys.readouterr().out
    assert "exceeds" in out and "train batches/epoch" in out
    assert h and np.isfinite(h[0]["train/loss"])


def test_encoded_pipeline_embedding_cache_roundtrip(mm_setup, capsys):
    """Cached-embedding predict (predict.embedding_cache): `write` builds
    the per-scene .enc.npz caches and scores from uploaded embeddings;
    a warm `auto` re-run reuses them bit-identically; at f32 transport the
    scores also match the raw encode-on-device path."""
    tmp, ckpt, common = mm_setup

    def run(tag, extra):
        eval_dir = os.path.join(tmp, f"eval_embc_{tag}")
        main([
            "predict", "--model", "mm", "--checkpoint", ckpt,
            "--pipeline", "encoded", *common,
            "--set", f"paths.eval={eval_dir}", *extra,
        ])
        return _edge_scores(eval_dir), capsys.readouterr().out

    s_off, out_off = run("off", ["--set", "predict.embedding_cache=off"])
    assert "cached-embedding path" not in out_off

    s_w, out_w = run("write", [
        "--set", "predict.embedding_cache=write",
        "--set", "predict.embedding_dtype=float32",
    ])
    assert "cached-embedding path" in out_w
    stores = glob.glob(os.path.join(tmp, "nuscenes", "graphs", "*.b3d"))
    assert stores and all(os.path.exists(f"{p}.enc.npz") for p in stores)

    # f32 transport carries the same embeddings the raw path computes
    assert s_off.keys() == s_w.keys() and s_off
    for name in s_off:
        assert s_off[name].keys() == s_w[name].keys()
        a = np.array([s_off[name][k] for k in s_off[name]])
        b = np.array([s_w[name][k] for k in s_off[name]])
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    # warm auto re-run: same caches, same program -> bit-identical scores
    s_a, out_a = run("auto", ["--set", "predict.embedding_dtype=float32"])
    assert "cached-embedding path" in out_a
    for name in s_w:
        assert s_w[name] == s_a[name]

    # default f16 transport stays within rounding of the raw scores
    s_16, out_16 = run("auto16", [])
    assert "cached-embedding path" in out_16
    for name in s_off:
        a = np.array([s_off[name][k] for k in s_off[name]])
        b = np.array([s_16[name][k] for k in s_off[name]])
        np.testing.assert_allclose(a, b, atol=5e-3)

    # a STALE cache (digest matches, row count doesn't — the store was
    # rebuilt in place) must not misalign scores: it is skipped (loudly)
    # and `auto` falls back to the raw grouped encode — scores unchanged
    with np.load(f"{stores[0]}.enc.npz", allow_pickle=False) as z:
        full = {k: z[k] for k in z.files}
    np.savez(
        f"{stores[0]}.enc.npz",
        **{k: (v[:-1] if getattr(v, "ndim", 0) else v)
           for k, v in full.items()},
    )
    s_s, out_s = run("stale", ["--set", "predict.embedding_dtype=float32"])
    assert "ignoring stale embedding cache" in out_s
    assert "cached-embedding path" not in out_s
    for name in s_off:
        assert s_off[name] == s_s[name]

    # a corrupt cache file must not crash `auto`: it is skipped (loudly)
    # and the run falls back to the raw grouped encode — scores unchanged
    with open(f"{stores[0]}.enc.npz", "wb") as f:
        f.write(b"not an npz")
    s_c, out_c = run("corrupt", ["--set", "predict.embedding_dtype=float32"])
    assert "ignoring unreadable embedding cache" in out_c
    assert "cached-embedding path" not in out_c
    for name in s_off:
        assert s_off[name] == s_c[name]
