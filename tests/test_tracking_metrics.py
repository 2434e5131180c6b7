"""Tests for the native AMOTA/AMOTP tracking evaluator."""

import numpy as np
import pytest

from batch3dmot_tpu.eval.tracking_metrics import evaluate_tracking


def _make_gt(num_tracks=3, num_frames=10, cls="car"):
    gt = []
    for t in range(num_tracks):
        for f in range(num_frames):
            gt.append(
                {
                    "sample_token": f"f{f}",
                    "translation": [10.0 * t, 1.0 * f, 0.0],
                    "tracking_name": cls,
                    "instance": f"inst{t}",
                }
            )
    return gt


def _perfect_preds(gt):
    return [
        {
            "sample_token": g["sample_token"],
            "translation": g["translation"],
            "tracking_name": g["tracking_name"],
            "tracking_id": g["instance"],
            "tracking_score": 0.9,
        }
        for g in gt
    ]


FRAMES = [f"f{f}" for f in range(10)]


def test_perfect_tracking_amota_one():
    gt = _make_gt()
    res = evaluate_tracking(gt, _perfect_preds(gt), FRAMES)
    assert res.per_class["car"]["amota"] == pytest.approx(1.0, abs=1e-6)
    assert res.per_class["car"]["ids"] == 0
    assert res.amota == pytest.approx(1.0, abs=1e-6)
    assert res.per_class["car"]["amotp"] == pytest.approx(0.0, abs=1e-9)


def test_empty_predictions_amota_nan():
    """A class with GT but no predictions has all-NaN bins: the devkit
    reports NaN (not 0) and excludes the class from the aggregate
    (see the derivation table in eval/tracking_metrics.py)."""
    gt = _make_gt()
    res = evaluate_tracking(gt, [], FRAMES)
    assert np.isnan(res.per_class["car"]["amota"])
    assert res.per_class["car"]["fn"] == len(gt)
    assert np.isnan(res.amota)  # no class has any achieved bin


def test_id_switch_detected():
    gt = _make_gt(num_tracks=1)
    preds = _perfect_preds(gt)
    # switch track id halfway
    for p in preds:
        if int(p["sample_token"][1:]) >= 5:
            p["tracking_id"] = "other"
    res = evaluate_tracking(gt, preds, FRAMES)
    assert res.per_class["car"]["ids"] == 1
    assert res.per_class["car"]["amota"] < 1.0


def test_false_positives_lower_amota():
    gt = _make_gt()
    preds = _perfect_preds(gt)
    for f in range(10):
        preds.append(
            {
                "sample_token": f"f{f}",
                "translation": [500.0, 0, 0],
                "tracking_name": "car",
                "tracking_id": "fp",
                "tracking_score": 0.95,
            }
        )
    res = evaluate_tracking(gt, preds, FRAMES)
    assert res.per_class["car"]["amota"] < 1.0


def test_missed_half_lower_recall():
    gt = _make_gt(num_tracks=2)
    preds = _perfect_preds([g for g in gt if g["instance"] == "inst0"])
    res = evaluate_tracking(gt, preds, FRAMES)
    m = res.per_class["car"]
    assert m["recall"] == pytest.approx(0.5, abs=0.05)
    assert 0.0 < m["amota"] < 0.6


def test_distance_gate_2m():
    """Predictions 3 m off never match (2 m BEV gate): all-NaN bins, so
    the class reports NaN (devkit semantics) with every GT box a FN and
    every prediction a FP."""
    gt = _make_gt(num_tracks=1)
    preds = _perfect_preds(gt)
    for p in preds:
        p["translation"] = [p["translation"][0] + 3.0, p["translation"][1], 0]
    res = evaluate_tracking(gt, preds, FRAMES)
    assert np.isnan(res.per_class["car"]["amota"])
    assert res.per_class["car"]["fn"] == len(gt)


def test_multi_class_average():
    """Cross-class AMOTA is the mean over classes with achieved bins: car
    perfect (1.0), pedestrian at half recall (18 achieved bins of MOTAR 1
    out of 40 -> 0.45, the closed form from test_amota_golden)."""
    gt = _make_gt(cls="car") + _make_gt(cls="pedestrian")
    car_preds = _perfect_preds([g for g in gt if g["tracking_name"] == "car"])
    ped_half = _perfect_preds([
        g for g in gt
        if g["tracking_name"] == "pedestrian"
        and int(g["sample_token"][1:]) < 5
    ])
    res = evaluate_tracking(gt, car_preds + ped_half, FRAMES)
    assert res.per_class["car"]["amota"] == pytest.approx(1.0, abs=1e-6)
    assert res.per_class["pedestrian"]["amota"] == pytest.approx(18 / 40)
    assert res.amota == pytest.approx((1.0 + 18 / 40) / 2, abs=1e-6)


def test_summary_renders():
    gt = _make_gt()
    res = evaluate_tracking(gt, _perfect_preds(gt), FRAMES)
    s = res.summary()
    assert "car" in s and "AMOTA" in s


def test_json_safe_strict_json():
    """The NaN an all-unmatched run reports internally must serialize as
    strict-JSON null through `json_safe` — `json.dumps` alone emits a bare
    `NaN` literal that non-Python consumers reject (cmd_eval and the
    convergence/sweep scripts all emit through json_safe)."""
    import json

    from batch3dmot_tpu.eval.tracking_metrics import json_safe

    gt = _make_gt()
    res = evaluate_tracking(gt, [], FRAMES)
    assert np.isnan(res.amota)
    payload = {"amota": res.amota, "amotp": res.amotp,
               "per_class": res.per_class, "frames": [1.0, float("inf")]}
    with pytest.raises(ValueError):
        json.dumps(payload, allow_nan=False)
    text = json.dumps(json_safe(payload), allow_nan=False)  # no raise
    back = json.loads(text)
    assert back["amota"] is None
    assert back["per_class"]["car"]["amota"] is None
    assert back["per_class"]["car"]["fn"] == len(gt)  # ints untouched
    assert back["frames"] == [1.0, None]
