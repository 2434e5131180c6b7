"""validate-data doctor: schema checks over a real-shaped dataroot +
detection JSON + splits, with deliberately corrupted variants (round-3
VERDICT next #5 — the fab dress rehearsal exercises the pipeline's own
assumptions; the doctor is written from the devkit's documented schema so
real-data mismatches surface as actionable findings, not KeyErrors)."""

import json
import os
import shutil

import pytest

from fab_nusc import make_fab_dataset_multi, make_fab_detections


@pytest.fixture(scope="module")
def fab(tmp_path_factory):
    parent = tmp_path_factory.mktemp("nusc_validate")
    root, splits_json = make_fab_dataset_multi(
        parent,
        num_scenes=2,
        num_samples=4,
        splits={"train": [0], "val": [1]},
        version="v1.0-trainval",
    )
    det_path = make_fab_detections(
        root, "v1.0-trainval",
        os.path.join(root, "detections", "megvii", "results_val.json"),
        scene_tokens=["scene1"], seed=0,
    )
    return str(root), str(splits_json), det_path


def _errors(findings):
    return [f for f in findings if f.level == "error"]


def _warns(findings):
    return [f for f in findings if f.level == "warn"]


def test_clean_dataset_no_errors(fab):
    from batch3dmot_tpu.data.validate import (
        validate_detection_json,
        validate_splits_json,
        validate_tables,
    )

    root, splits_json, det_path = fab
    findings = validate_tables(root, "v1.0-trainval")
    assert _errors(findings) == [], [str(f) for f in _errors(findings)]

    with open(os.path.join(root, "v1.0-trainval", "sample.json")) as f:
        toks = [s["token"] for s in json.load(f)]
    df = validate_detection_json(det_path, toks)
    assert _errors(df) == [], [str(f) for f in _errors(df)]

    sf = validate_splits_json(splits_json, ["scene-0001", "scene-0002"], split="val")
    assert _errors(sf) == []


def test_missing_table_and_broken_chain(fab, tmp_path):
    from batch3dmot_tpu.data.validate import validate_tables

    root, _, _ = fab
    broken = tmp_path / "broken"
    shutil.copytree(root, broken)
    tdir = broken / "v1.0-trainval"

    os.remove(tdir / "ego_pose.json")
    findings = validate_tables(str(broken), "v1.0-trainval")
    assert any(
        f.level == "error" and "ego_pose" in f.where for f in findings
    )

    # restore, then corrupt a scene chain
    shutil.copy(
        os.path.join(root, "v1.0-trainval", "ego_pose.json"),
        tdir / "ego_pose.json",
    )
    with open(tdir / "scene.json") as f:
        scenes = json.load(f)
    scenes[0]["first_sample_token"] = "no_such_sample"
    with open(tdir / "scene.json", "w") as f:
        json.dump(scenes, f)
    findings = validate_tables(str(broken), "v1.0-trainval")
    assert any(
        f.level == "error" and "unknown token" in f.msg for f in findings
    )


def test_missing_lidar_keyframes_is_error(fab, tmp_path):
    from batch3dmot_tpu.data.validate import validate_tables

    root, _, _ = fab
    broken = tmp_path / "nolidar"
    shutil.copytree(root, broken)
    tdir = broken / "v1.0-trainval"
    with open(tdir / "sample_data.json") as f:
        sds = json.load(f)
    for sd in sds:
        if sd["calibrated_sensor_token"] == "cs_lidar":
            sd["is_key_frame"] = False
    with open(tdir / "sample_data.json", "w") as f:
        json.dump(sds, f)
    findings = validate_tables(str(broken), "v1.0-trainval")
    assert any(
        f.level == "error" and "LIDAR_TOP" in f.msg for f in findings
    )


def test_detection_schema_variants(fab, tmp_path):
    from batch3dmot_tpu.data.validate import validate_detection_json

    root, _, det_path = fab
    with open(det_path) as f:
        raw = json.load(f)

    # bare mapping (no 'results' wrapper): warning, not error
    bare = tmp_path / "bare.json"
    with open(bare, "w") as f:
        json.dump(raw["results"], f)
    findings = validate_detection_json(str(bare))
    assert _errors(findings) == []
    assert any("wrapper" in f.msg for f in _warns(findings))

    # truncated translation: schema error
    bad = json.loads(json.dumps(raw))
    first = next(iter(bad["results"].values()))
    first[0]["translation"] = [1.0, 2.0]
    badp = tmp_path / "bad.json"
    with open(badp, "w") as f:
        json.dump(bad, f)
    findings = validate_detection_json(str(badp))
    assert any("translation" in f.msg for f in _errors(findings))

    # non-tracking detection names only: error
    alien = json.loads(json.dumps(raw))
    for boxes in alien["results"].values():
        for b in boxes:
            b["detection_name"] = "traffic_cone"
    alienp = tmp_path / "alien.json"
    with open(alienp, "w") as f:
        json.dump(alien, f)
    findings = validate_detection_json(str(alienp))
    assert any("tracking-class" in f.msg for f in _errors(findings))

    # foreign sample tokens: error against this dataroot's samples
    findings = validate_detection_json(det_path, ["not_a_real_token"])
    assert any("wrong split" in f.msg for f in _errors(findings))

    # NaN velocities: info, missing velocity: warning — never errors
    nanv = json.loads(json.dumps(raw))
    boxes = next(iter(nanv["results"].values()))
    boxes[0]["velocity"] = [float("nan"), 0.0]
    del boxes[1]["velocity"]
    nanp = tmp_path / "nan.json"
    with open(nanp, "w") as f:
        json.dump(nanv, f)
    findings = validate_detection_json(str(nanp))
    assert _errors(findings) == []
    assert any("no velocity" in f.msg for f in _warns(findings))


def test_splits_errors(fab):
    from batch3dmot_tpu.data.validate import validate_splits_json

    _, splits_json, _ = fab
    findings = validate_splits_json(
        splits_json, ["scene-0001", "scene-0002"], split="test"
    )
    assert any("'test' not present" in f.msg for f in _errors(findings))

    # split matching NO dataroot scene
    findings = validate_splits_json(
        splits_json, ["other0", "other1"], split="val"
    )
    assert any("matches NO scene" in f.msg for f in _errors(findings))


def test_cli_validate_data_clean_and_strict(fab, capsys):
    from batch3dmot_tpu.cli import main

    root, splits_json, det_path = fab
    args = [
        "validate-data",
        "--set", f"paths.data={root}",
        "--set", "main.version=v1.0-trainval",
        "--set", f"paths.detections_dir={os.path.join(root, 'detections')}",
        "--set", f"paths.splits_json={splits_json}",
        "--set", "detections.megvii.val=megvii/results_val.json",
        "--set", "graph_construction.split=val",
    ]
    main(args)  # no errors -> returns normally
    out = capsys.readouterr().out
    assert "0 error(s)" in out

    # missing detections config -> warning; --strict turns it into exit 1
    strict_args = []
    skip_next = False
    for i, a in enumerate(args):
        if skip_next:
            skip_next = False
            continue
        if a == "--set" and args[i + 1].startswith("detections.megvii"):
            skip_next = True
            continue
        strict_args.append(a)
    with pytest.raises(SystemExit):
        main(strict_args + ["--strict"])
