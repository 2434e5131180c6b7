"""The `preprocess` CLI stage + real-data encoder training through the CLI
(fab-nusc end-to-end: preprocess -> train-resnet/pointnet/radarnet on the
generated artifacts; the round-1 CLI trained encoders on RNG noise)."""

import json
import os

import pytest

from batch3dmot_tpu.cli import main


@pytest.fixture(scope="module")
def fab(tmp_path_factory):
    from fab_nusc import make_fab_dataset

    return make_fab_dataset(tmp_path_factory.mktemp("clipp"), num_samples=4)


@pytest.fixture(scope="module")
def preprocessed(fab, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pp_out")
    common = [
        "--set", f"paths.data={fab}",
        "--set", f"paths.tmp={tmp}",
        "--set", "main.version=v1.0-mini",
    ]
    main(["preprocess", "--modality", "all", *common])
    pre = os.path.join(tmp, "nuscenes", "preprocessed")
    return tmp, pre, common


def test_preprocess_outputs(preprocessed):
    _, pre, _ = preprocessed
    for kind in ("img", "lidar", "radar"):
        path = os.path.join(pre, f"processed_{kind}_anns.json")
        assert os.path.exists(path), path
        anns = json.load(open(path))
        assert sum(len(v) for v in anns.values()) == 4
    # per-annotation npy artifacts
    assert len(os.listdir(os.path.join(pre, "lidar"))) == 4
    assert len(os.listdir(os.path.join(pre, "radar"))) == 4


def test_preprocess_skip_existing(preprocessed, capsys):
    tmp, pre, common = preprocessed
    before = os.path.getmtime(os.path.join(pre, "processed_img_anns.json"))
    main(["preprocess", "--modality", "img", "--skip-existing", *common])
    after = os.path.getmtime(os.path.join(pre, "processed_img_anns.json"))
    assert before == after  # untouched


@pytest.mark.parametrize(
    "cmd,section",
    [
        ("train-resnet", "resnet"),
        ("train-pointnet", "pointnet"),
        ("train-radarnet", "radarnet"),
    ],
)
def test_encoder_cli_trains_on_real_artifacts(preprocessed, cmd, section):
    tmp, _, common = preprocessed
    history = main([
        cmd, "--epochs", "1",
        *common,
        "--set", f"{section}.batch_size=2",
    ])
    assert history and "train/loss" in history[0]
    assert history[0]["train/loss"] == history[0]["train/loss"]  # not NaN
    import glob

    ckpts = glob.glob(
        os.path.join(tmp, "nuscenes", "models", section, f"{section}_*.msgpack")
    )
    assert ckpts


@pytest.mark.parametrize(
    "cmd,section",
    [
        ("train-resnet", "resnet"),
        ("train-pointnet", "pointnet"),
        ("train-radarnet", "radarnet"),
    ],
)
def test_encoder_cli_device_dataset(preprocessed, cmd, section):
    """--device-dataset trains each encoder on the materialized artifacts
    (decode-once upload + one scanned program per epoch); --devices 2
    shards the dataset across the CPU mesh."""
    tmp, _, common = preprocessed
    history = main([
        cmd, "--epochs", "2", "--device-dataset", "--devices", "2",
        *common,
        "--set", f"{section}.batch_size=2",
    ])
    assert len(history) == 2 and "train/loss" in history[0]
    assert all(h["train/loss"] == h["train/loss"] for h in history)  # no NaN
    import glob

    ckpts = glob.glob(
        os.path.join(tmp, "nuscenes", "models", section, f"{section}_*.msgpack")
    )
    assert ckpts


def test_encoder_cli_synthetic_flag(preprocessed):
    tmp, _, common = preprocessed
    history = main([
        "train-radarnet", "--epochs", "1", "--synthetic", *common,
    ])
    assert history and "train/loss" in history[0]


def test_concat_jsons(tmp_path):
    a = {"train": [{"x": 1}], "val": [{"x": 2}]}
    b = {"train": [{"x": 3}], "test": [{"x": 4}]}
    pa, pb, out = tmp_path / "a.json", tmp_path / "b.json", tmp_path / "o.json"
    pa.write_text(json.dumps(a))
    pb.write_text(json.dumps(b))
    main(["concat-jsons", "--file1", str(pa), "--file2", str(pb),
          "--outfile", str(out)])
    merged = json.load(open(out))
    assert [e["x"] for e in merged["train"]] == [1, 3]
    assert [e["x"] for e in merged["val"]] == [2]
    assert [e["x"] for e in merged["test"]] == [4]


def test_encoder_cli_counts_filtered_entries(preprocessed, tmp_path):
    """The batch-size guard must count entries AFTER the min-points/ego
    filters (review finding: a filtered-empty iterator used to crash with
    IndexError deep in the trainer)."""
    tmp, pre, common = preprocessed
    import shutil

    pre2 = tmp_path / "pre2"
    shutil.copytree(pre, pre2)
    anns_path = pre2 / "processed_lidar_anns.json"
    anns = json.load(open(anns_path))
    for entries in anns.values():
        for e in entries:
            e["num_lidar_pts"] = 0  # below min -> all filtered
    anns_path.write_text(json.dumps(anns))
    with pytest.raises(SystemExit, match="usable annotations"):
        main([
            "train-pointnet", "--epochs", "1",
            "--set", f"paths.data={tmp}",  # unused for lidar
            "--set", f"paths.tmp={tmp}",
            "--set", f"paths.preprocessed={pre2}",
            "--set", "pointnet.batch_size=2",
        ])
