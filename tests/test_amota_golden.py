"""Golden cross-checks for the native AMOTA/AMOTP scorer.

The official devkit is not installable in this image (CLAUDE.md), so the
goldens are *hand-derived closed forms* of the published protocol the devkit
implements (nuScenes tracking_nips_2019: 40 recall bins on [0.1, 1];
MOTAR(r) = max(0, 1 - (IDS + FP + FN - (1-r)P) / (rP)); AMOTA = sum of
per-bin MOTAR / 40, unachieved bins contributing 0). Any scorer implementing
that protocol — devkit included — must produce these exact values; each case
documents its derivation. Real-data devkit parity remains standing debt
(VERDICT r1 §missing-6).
"""

import numpy as np

from batch3dmot_tpu.eval.tracking_metrics import evaluate_tracking

FRAMES = [f"f{i}" for i in range(10)]


def _gt_track(cls="car", spacing=100.0):
    """10 GT boxes of one instance, one per frame, far apart in space."""
    return [
        {
            "sample_token": f"f{i}",
            "translation": [i * spacing, 0.0, 0.0],
            "tracking_name": cls,
            "instance": "inst0",
        }
        for i in range(10)
    ]


def _preds_on(gt, score=0.9, track_id="t0"):
    return [
        {
            "sample_token": g["sample_token"],
            "translation": list(g["translation"]),
            "tracking_name": g["tracking_name"],
            "tracking_id": track_id,
            "tracking_score": score,
        }
        for g in gt
    ]


def test_perfect_tracking_amota_one():
    """Every recall bin achieves recall 1 with zero FP/IDS -> MOTAR = 1 in
    all 40 bins -> AMOTA = 40/40 = 1. Exact matches -> AMOTP = 0."""
    gt = _gt_track()
    res = evaluate_tracking(gt, _preds_on(gt), FRAMES)
    assert res.per_class["car"]["amota"] == 1.0
    assert res.amota == 1.0
    assert res.amotp == 0.0
    assert res.per_class["car"]["ids"] == 0


def test_single_high_scoring_fp_golden():
    """P = 10 GT; 10 TPs at score 0.9; 1 far FP at score 0.95.

    Derivation (devkit threshold semantics — thresholds come from the
    MATCHED predictions' scores, ``compute_thresholds`` in
    nuscenes/eval/tracking/algo.py): matched scores are [0.9 x10], so
    every bin's threshold is 0.9. At 0.9 the FP (0.95) passes too:
    recall 1.0, FP = 1, IDS = 0 -> MOTAR = 1 - 1/(1.0 * 10) = 0.9 in all
    40 bins -> AMOTA = 0.9 exactly. (Deriving thresholds from ALL scores
    instead would hand the r = 0.1 bin to the FP alone and skip bins
    whose achieved recall lands below target — the round-4 trailer bug,
    where one confident interpolated FP zeroed 39/40 bins.)
    """
    gt = _gt_track()
    preds = _preds_on(gt) + [
        {
            "sample_token": "f0",
            "translation": [5000.0, 5000.0, 0.0],
            "tracking_name": "car",
            "tracking_id": "t_fp",
            "tracking_score": 0.95,
        }
    ]
    res = evaluate_tracking(gt, preds, FRAMES)
    np.testing.assert_allclose(res.per_class["car"]["amota"], 0.9)
    assert res.per_class["car"]["fp"] == 1
    assert res.amotp == 0.0


def test_low_scoring_fp_is_cut_by_confidence_sweep():
    """FP score 0.1 < TP score 0.9: every bin's threshold is 0.9 (ceil(10r)
    <= 10 always indexes a TP score), the FP never passes -> AMOTA = 1."""
    gt = _gt_track()
    preds = _preds_on(gt) + [
        {
            "sample_token": "f0",
            "translation": [5000.0, 5000.0, 0.0],
            "tracking_name": "car",
            "tracking_id": "t_fp",
            "tracking_score": 0.1,
        }
    ]
    res = evaluate_tracking(gt, preds, FRAMES)
    assert res.per_class["car"]["amota"] == 1.0


def test_one_id_switch_golden():
    """Track splits into two ids at frame 5 -> exactly 1 IDS per bin, all
    bins achieve recall 1 -> MOTAR = 1 - 1/10 = 0.9 in all 40 bins ->
    AMOTA = 0.9; MOTA = 1 - 1/10 = 0.9."""
    gt = _gt_track()
    preds = _preds_on(gt[:5], track_id="tA") + _preds_on(gt[5:], track_id="tB")
    res = evaluate_tracking(gt, preds, FRAMES)
    np.testing.assert_allclose(res.per_class["car"]["amota"], 0.9)
    assert res.per_class["car"]["ids"] == 1
    np.testing.assert_allclose(res.per_class["car"]["mota"], 0.9)


def test_amotp_is_mean_match_distance():
    """Predictions offset by exactly 1 m everywhere (within the 2 m gate):
    recall 1 in every bin, AMOTP = 1.0."""
    gt = _gt_track()
    preds = _preds_on(gt)
    for p in preds:
        p["translation"][1] += 1.0
    res = evaluate_tracking(gt, preds, FRAMES)
    np.testing.assert_allclose(res.per_class["car"]["amotp"], 1.0)
    assert res.per_class["car"]["amota"] == 1.0


def test_half_recall_golden():
    """Only the first 5 of 10 GT are ever predicted (scores 0.9).

    Derivation: max recall = 0.5. Bins with r <= 0.5 (r in linspace(0.1, 1,
    40); 18 bins satisfy ceil(10r) <= 5 AND achieved recall 0.5 >= r):
    threshold 0.9, tp = 5, FP = 0, IDS = 0, achieved recall = 0.5 ->
    MOTAR = 1. Bins with r > 0.5 never achieve r -> contribute 0.
    Count: ceil(10r) <= 5 means r <= 0.5; linspace(0.1, 1, 40) has step
    0.9/39 ~ 0.023077; r_i = 0.1 + i * step <= 0.5 for i <= 17.33 -> 18
    bins. AMOTA = 18/40 = 0.45.
    """
    gt = _gt_track()
    preds = _preds_on(gt[:5])
    res = evaluate_tracking(gt, preds, FRAMES)
    np.testing.assert_allclose(res.per_class["car"]["amota"], 18 / 40)
    assert res.per_class["car"]["recall"] == 0.5


def test_amotp_worst_fills_unachieved_bins():
    """Devkit AMOTP averages over ALL 40 bins, filling unachieved ones with
    metric_worst['amotp'] = 2.0 (the match gate) — evaluate.py replaces NaN
    bins with the worst value before nanmean.

    Half-recall case (18 achieved bins, see test_half_recall_golden) with
    exact-position matches (per-bin MOTP 0):
    AMOTP = (18 * 0 + 22 * 2.0) / 40 = 1.1.
    """
    gt = _gt_track()
    preds = _preds_on(gt[:5])
    res = evaluate_tracking(gt, preds, FRAMES)
    np.testing.assert_allclose(res.per_class["car"]["amotp"], 22 * 2.0 / 40)


def test_amota_no_match_class_is_nan():
    """A class with GT but ZERO matched predictions has all-NaN bins; the
    devkit then reports its amota/amotp as NaN (evaluate.py: all-NaN ->
    value = NaN) and the class-level nanmean EXCLUDES it. Reporting 0
    instead would deflate the aggregate below the official protocol."""
    gt_car = _gt_track("car")
    gt_ped = _gt_track("pedestrian")  # no predictions at all
    res = evaluate_tracking(gt_car + gt_ped, _preds_on(gt_car), FRAMES)
    assert np.isnan(res.per_class["pedestrian"]["amota"])
    assert np.isnan(res.per_class["pedestrian"]["amotp"])
    assert res.per_class["pedestrian"]["fn"] == 10
    assert res.amota == 1.0  # car alone; pedestrian excluded, not averaged in
    assert res.amotp == 0.0


def test_traditional_metrics_at_best_mota_bin():
    """Per-class mota/ids/tp/fp/fn/recall report at the BEST-MOTA bin
    (evaluate.py nanargmax over md.mota), not the last achieved bin.

    10 TPs with descending scores 1.0, 0.95, ..., 0.55; 8 far FPs at score
    0.55. Matched staircase = the TP scores, so the recall-0.9 bin's
    threshold is 0.6 (no FP passes: fn=1, mota=0.9) while the recall-1.0
    bin's threshold is 0.55 (all 8 FPs pass: mota = 1 - 8/10 = 0.2). Best
    MOTA is the recall-0.9 bin; the last-achieved bin would report 0.2.
    """
    gt = _gt_track()
    preds = _preds_on(gt)
    for i, p in enumerate(preds):
        p["tracking_score"] = 1.0 - 0.05 * i
    fps = [
        {
            "sample_token": f"f{i}",
            "translation": [5000.0 + 300.0 * i, 5000.0, 0.0],
            "tracking_name": "car",
            "tracking_id": f"t_fp{i}",
            "tracking_score": 0.55,
        }
        for i in range(8)
    ]
    res = evaluate_tracking(gt, preds + fps, FRAMES)
    m = res.per_class["car"]
    np.testing.assert_allclose(m["mota"], 0.9)
    assert m["recall"] == 0.9
    assert m["fn"] == 1
    assert m["fp"] == 0


def test_best_mota_all_bins_identical_reports_full_recall():
    """Perfect tracking with uniform scores collapses every bin to ONE
    threshold (identical stats); the reported recall is 1.0 regardless of
    tie-break direction."""
    gt = _gt_track()
    res = evaluate_tracking(gt, _preds_on(gt), FRAMES)
    assert res.per_class["car"]["recall"] == 1.0
    assert res.per_class["car"]["fn"] == 0


def test_best_mota_tie_breaks_to_lowest_recall():
    """devkit tie-break: ``np.nanargmax(md.mota)`` returns the FIRST max
    over the ascending-recall bins — ties report the LOWEST-recall bin.

    10 TPs with scores 1.0, 0.95, ..., 0.55 and one far FP at 0.58: the
    recall-1.0 bin (threshold 0.55) admits the FP (fp=1, fn=0, mota=0.9)
    while bins with thresholds in (0.58, 0.6] drop the last TP but exclude
    the FP (fp=0, fn=1, mota=0.9) — a tie with DIFFERENT stats. nanargmax
    picks the lower-recall bin: recall 0.9, fn=1, fp=0."""
    gt = _gt_track()
    preds = _preds_on(gt)
    for i, p in enumerate(preds):
        p["tracking_score"] = 1.0 - 0.05 * i
    fp = {
        "sample_token": "f0",
        "translation": [5000.0, 5000.0, 0.0],
        "tracking_name": "car",
        "tracking_id": "t_fp",
        "tracking_score": 0.58,
    }
    res = evaluate_tracking(gt, preds + [fp], FRAMES)
    m = res.per_class["car"]
    np.testing.assert_allclose(m["mota"], 0.9)
    assert m["recall"] == 0.9
    assert m["fn"] == 1
    assert m["fp"] == 0


def test_mt_ml_coverage_golden():
    """MT = GT tracks matched >= 80% of their present frames; ML = < 20%
    (motmetrics mostly_tracked / mostly_lost, reported at the best-MOTA
    bin). One fully-covered track, one covered 1/10 frames."""
    gt_a = _gt_track()
    gt_b = [dict(g, instance="inst1",
                 translation=[g["translation"][0], 500.0, 0.0])
            for g in _gt_track()]
    preds = _preds_on(gt_a, track_id="tA") + _preds_on(
        gt_b[:1], track_id="tB"
    )
    res = evaluate_tracking(gt_a + gt_b, preds, FRAMES)
    m = res.per_class["car"]
    assert m["mt"] == 1  # inst0: 10/10
    assert m["ml"] == 1  # inst1: 1/10 < 0.2
    assert m["frag"] == 0


def test_frag_counts_reacquisitions():
    """A track matched on frames 0-3, unmatched (but present) on 4-5, and
    matched again on 6-9 fragments exactly once; coverage 8/10 >= 0.8 so
    it still counts as mostly-tracked."""
    gt = _gt_track()
    preds = _preds_on(gt[:4] + gt[6:], track_id="tA")
    res = evaluate_tracking(gt, preds, FRAMES)
    m = res.per_class["car"]
    assert m["frag"] == 1
    assert m["mt"] == 1
    assert m["ids"] == 0  # same track id on re-acquisition


def test_faf_per_100_frames():
    """FAF = FP / num_frames x 100 over ALL frames of the split: 5 far FPs
    at the TPs' score over 10 frames -> 50.0."""
    gt = _gt_track()
    fps = [
        {
            "sample_token": f"f{i}",
            "translation": [5000.0 + 300.0 * i, 5000.0, 0.0],
            "tracking_name": "car",
            "tracking_id": f"fp{i}",
            "tracking_score": 0.9,
        }
        for i in range(5)
    ]
    res = evaluate_tracking(gt, _preds_on(gt) + fps, FRAMES)
    np.testing.assert_allclose(res.per_class["car"]["faf"], 50.0)
