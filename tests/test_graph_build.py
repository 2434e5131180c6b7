"""Tests for vectorized window-graph construction.

Includes a naive per-node loop oracle written directly from the reference's
documented semantics (SURVEY.md §3.2; construct...parallel.py:525-602,
graph_utils.py:33-88) to differential-test the vectorized builder.
"""

import numpy as np
import pytest

from batch3dmot_tpu import geometry as geo
from batch3dmot_tpu.config import GraphConstructionConfig, TRACKING_CLASSES
from batch3dmot_tpu.data.synthetic import make_synthetic_scene
from batch3dmot_tpu.data.types import SceneDetections
from batch3dmot_tpu.graphs import build_scene_graphs, build_window_graph
from batch3dmot_tpu.graphs.weights import cb_scaling_factor


def _mini_scene(rows, num_frames):
    """rows: (frame, center3, yaw, vel3, wlh3, class_id, score, token)."""
    m = len(rows)
    mk = lambda i, d: np.array([r[i] for r in rows], dtype=d)
    center = np.array([r[1] for r in rows], float)
    vel = np.array([r[3] for r in rows], float)
    wlh = np.array([r[4] for r in rows], float)
    return SceneDetections(
        scene_token="mini",
        num_frames=num_frames,
        frame_idx=mk(0, np.int32),
        center_g=center,
        yaw_g=mk(2, float),
        vel_g=vel,
        center_e=center,
        yaw_e=mk(2, float),
        vel_e=vel,
        wlh=wlh,
        class_id=mk(5, np.int32),
        score=mk(6, float),
        token_id=mk(7, np.int32),
        metadata=[{} for _ in range(m)],
    )


CAR = TRACKING_CLASSES["car"]
PED = TRACKING_CLASSES["pedestrian"]


def test_two_frame_same_track():
    wlh = (2, 4, 1.5)
    scene = _mini_scene(
        [
            (0, (0, 0, 0), 0.0, (1, 0, 0), wlh, CAR, 0.9, 7),
            (1, (1, 0, 0), 0.0, (1, 0, 0), wlh, CAR, 0.8, 7),
        ],
        num_frames=2,
    )
    g = build_window_graph(scene, 0, 2)
    assert g.num_nodes == 2
    assert g.num_edges == 1
    assert (g.edge_src[0], g.edge_dst[0]) == (0, 1)
    assert g.edge_label[0] == 1.0
    # edge features: d_xy=1, dyaw=0, logvol=0, dt=1
    np.testing.assert_allclose(g.edge_attr[0], [1, 0, 0, 1], atol=1e-6)
    # pose feature layout: center(3) wlh(3) yaw(1) vel(3) onehot(7) score(1) rel_t(1)
    assert g.pose.shape == (2, 19)
    np.testing.assert_allclose(g.pose[1][:3], [1, 0, 0])
    np.testing.assert_allclose(g.pose[1][3:6], wlh)
    assert g.pose[1][6] == 0.0
    np.testing.assert_allclose(g.pose[1][7:10], [1, 0, 0])
    assert g.pose[1][10 + CAR - 1] == 1.0  # one-hot slot = class_id - 1
    assert g.pose[1][17] == pytest.approx(0.8)
    assert g.pose[1][18] == 1.0  # relative time


def test_category_disjoint_edges():
    wlh = (2, 4, 1.5)
    pwlh = (0.6, 0.7, 1.7)
    scene = _mini_scene(
        [
            (0, (0, 0, 0), 0.0, (0, 0, 0), wlh, CAR, 0.9, 1),
            (0, (5, 0, 0), 0.0, (0, 0, 0), pwlh, PED, 0.9, 2),
            (1, (0, 0, 0), 0.0, (0, 0, 0), wlh, CAR, 0.9, 1),
            (1, (5, 0, 0), 0.0, (0, 0, 0), pwlh, PED, 0.9, 2),
        ],
        num_frames=2,
    )
    g = build_window_graph(scene, 0, 2)
    assert g.num_edges == 2
    for s, d in zip(g.edge_src, g.edge_dst):
        assert g.node_class[s] == g.node_class[d]
    assert g.edge_label.sum() == 2.0


def test_min_dt_label_rule():
    """dt > 1 positive only when it is the minimal same-token dt (the
    reference's rank-0 rule, construct...parallel.py:564-582)."""
    wlh = (2, 4, 1.5)
    scene = _mini_scene(
        [
            (0, (0, 0, 0), 0.0, (1, 0, 0), wlh, CAR, 0.9, 7),  # node 0
            (1, (1, 0, 0), 0.0, (1, 0, 0), wlh, CAR, 0.9, 7),  # node 1
            (2, (2, 0, 0), 0.0, (1, 0, 0), wlh, CAR, 0.9, 7),  # node 2
        ],
        num_frames=3,
    )
    g = build_window_graph(scene, 0, 3)
    edges = {(int(s), int(d)): float(l) for s, d, l in zip(g.edge_src, g.edge_dst, g.edge_label)}
    assert edges[(0, 1)] == 1.0  # dt=1
    assert edges[(1, 2)] == 1.0  # dt=1, minimal for node 2
    assert edges[(0, 2)] == 0.0  # dt=2, rank 1 -> negative


def test_min_dt_label_when_closer_missing():
    """If the dt=1 detection is missing, the dt=2 edge becomes rank 0 -> 1."""
    wlh = (2, 4, 1.5)
    scene = _mini_scene(
        [
            (0, (0, 0, 0), 0.0, (1, 0, 0), wlh, CAR, 0.9, 7),
            (1, (50, 50, 0), 0.0, (0, 0, 0), wlh, CAR, 0.9, -1),  # unrelated FP
            (2, (2, 0, 0), 0.0, (1, 0, 0), wlh, CAR, 0.9, 7),
        ],
        num_frames=3,
    )
    g = build_window_graph(scene, 0, 3)
    edges = {(int(s), int(d)): float(l) for s, d, l in zip(g.edge_src, g.edge_dst, g.edge_label)}
    assert edges[(0, 2)] == 1.0
    # FP edges are negative
    assert edges.get((1, 2), 0.0) == 0.0


def test_unmatched_tokens_never_positive():
    wlh = (2, 4, 1.5)
    scene = _mini_scene(
        [
            (0, (0, 0, 0), 0.0, (0, 0, 0), wlh, CAR, 0.9, -1),
            (1, (0, 0, 0), 0.0, (0, 0, 0), wlh, CAR, 0.9, -1),
        ],
        num_frames=2,
    )
    g = build_window_graph(scene, 0, 2)
    assert g.num_edges == 1
    assert g.edge_label[0] == 0.0


def test_topk_limits_edges():
    wlh = (2, 4, 1.5)
    rows = [(0, (i * 2.0, 0, 0), 0.0, (0, 0, 0), wlh, CAR, 0.9, i) for i in range(10)]
    rows.append((1, (0, 0, 0), 0.0, (0, 0, 0), wlh, CAR, 0.9, 0))
    scene = _mini_scene(rows, num_frames=2)
    cfg = GraphConstructionConfig(top_knn_nodes=3)
    g = build_window_graph(scene, 0, 2, cfg)
    assert g.num_edges == 3
    # nearest 3 past nodes by x distance are 0, 1, 2
    assert set(g.edge_src.tolist()) == {0, 1, 2}


def test_knn_weighted_distance_prefers_matching_motion():
    """Two candidates equidistant in xy; the one with matching yaw+velocity
    must win the kNN ranking (weights 1/2, 1/4, 1/4)."""
    wlh = (2, 4, 1.5)
    scene = _mini_scene(
        [
            (0, (0, 5, 0), 0.0, (2, 0, 0), wlh, CAR, 0.9, 1),  # matches motion
            (0, (0, -5, 0), 2.0, (-3, 1, 0), wlh, CAR, 0.9, 2),  # differs
            (1, (0, 0, 0), 0.0, (2, 0, 0), wlh, CAR, 0.9, 1),
        ],
        num_frames=2,
    )
    cfg = GraphConstructionConfig(top_knn_nodes=1)
    g = build_window_graph(scene, 0, 2, cfg)
    assert g.num_edges == 1
    assert g.edge_src[0] == 0


def test_cb_weights_golden():
    # w(c) = (1-b)/(1-b^(5*freq)) with b=0.8 (graph_data.py:126-138)
    b = 0.8
    freq_car = 0.44736907722651076
    expected = (1 - b) / (1 - b ** (5 * freq_car))
    assert cb_scaling_factor("car") == pytest.approx(expected)
    scene = _mini_scene(
        [
            (0, (0, 0, 0), 0.0, (0, 0, 0), (2, 4, 1.5), CAR, 0.9, 1),
            (1, (0, 0, 0), 0.0, (0, 0, 0), (2, 4, 1.5), CAR, 0.9, 1),
        ],
        num_frames=2,
    )
    g = build_window_graph(scene, 0, 2)
    assert g.edge_weight[0] == pytest.approx(expected, rel=1e-6)


# ---------------------------------------------------------------------------
# Differential test against a naive oracle
# ---------------------------------------------------------------------------


def _oracle_edges(scene, start, length, k_max):
    """Direct per-node loop translation of the documented semantics."""
    idx = scene.window_indices(start, length)
    time = scene.frame_idx[idx] - start
    cls = scene.class_id[idx]
    tok = scene.token_id[idx]
    centers = scene.center_g[idx]
    yaws = scene.yaw_g[idx]
    vels = scene.vel_g[idx]
    wlh = scene.wlh[idx]
    n = len(idx)

    edges, labels, feats = [], [], []
    for i in range(n):
        cand = [j for j in range(n) if time[j] < time[i] and cls[j] == cls[i]]
        if not cand:
            continue
        d_xy = np.array([np.linalg.norm(centers[i][:2] - centers[j][:2]) for j in cand])
        d_y = np.array([abs(geo.angle_diff(yaws[i], yaws[j])) for j in cand])
        d_v = np.array([abs(np.linalg.norm(vels[i] - vels[j])) for j in cand])

        def nz(d):
            mx = d.max()
            return d / mx if mx > 0 else np.zeros_like(d)

        comb = 0.5 * nz(d_xy) + 0.25 * nz(d_y) + 0.25 * nz(d_v)
        k = min(k_max, len(cand))
        sel = np.argsort(comb, kind="stable")[:k]
        knn = [cand[s] for s in sel]
        # labels
        same_tok_dts = [abs(time[i] - time[j]) for j in knn if tok[j] == tok[i] and tok[i] >= 0]
        for j in knn:
            dt = abs(int(time[i]) - int(time[j]))
            if tok[i] >= 0 and tok[j] == tok[i]:
                lab = 1.0 if dt == min(same_tok_dts) else 0.0
            else:
                lab = 0.0
            edges.append((j, i))
            labels.append(lab)
            feats.append(
                [
                    np.linalg.norm(centers[j][:2] - centers[i][:2]),
                    abs(geo.angle_diff(yaws[j], yaws[i])),
                    np.log(np.prod(wlh[j]) / np.prod(wlh[i])),
                    dt,
                ]
            )
    return edges, labels, feats


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_differential_vs_oracle(seed):
    scene = make_synthetic_scene(seed=seed, num_frames=8, num_tracks=8)
    cfg = GraphConstructionConfig(top_knn_nodes=5, batch_size_graph=4)
    for start in range(0, scene.num_frames - 4 + 1, 2):
        g = build_window_graph(scene, start, 4, cfg)
        o_edges, o_labels, o_feats = _oracle_edges(scene, start, 4, 5)
        got = sorted(zip(g.edge_src.tolist(), g.edge_dst.tolist(), g.edge_label.tolist()))
        want = sorted([(s, d, l) for (s, d), l in zip(o_edges, o_labels)])
        assert got == want
        # features match per-edge (order-independent compare via dict)
        feat_map = {
            (int(s), int(d)): f for s, d, f in zip(g.edge_src, g.edge_dst, g.edge_attr)
        }
        for (s, d), f in zip(o_edges, o_feats):
            np.testing.assert_allclose(feat_map[(s, d)], f, rtol=1e-5, atol=1e-5)


def test_build_scene_graphs_window_count():
    scene = make_synthetic_scene(seed=0, num_frames=10)
    graphs = list(build_scene_graphs(scene, window_len=3))
    assert len(graphs) == 8  # nbr_samples - L + 1
    assert all(g.window_len == 3 for g in graphs)


# ---------------------------------------------------------------------------
# Device-side builder equivalence
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 3])
def test_device_builder_matches_numpy(seed):
    from batch3dmot_tpu.graphs.build_device import build_scene_graphs_device

    scene = make_synthetic_scene(seed=seed, num_frames=8, num_tracks=8)
    cfg = GraphConstructionConfig(top_knn_nodes=5)
    np_windows = list(build_scene_graphs(scene, 3, cfg))
    dv_windows = build_scene_graphs_device(scene, 3, cfg)
    assert len(np_windows) == len(dv_windows)
    for a, b in zip(np_windows, dv_windows):
        assert a.num_nodes == b.num_nodes
        np.testing.assert_array_equal(a.det_index, b.det_index)
        np.testing.assert_allclose(a.pose, b.pose, rtol=1e-5, atol=1e-5)
        # edge sets with labels must match exactly
        got = sorted(zip(b.edge_src.tolist(), b.edge_dst.tolist(), b.edge_label.tolist()))
        want = sorted(zip(a.edge_src.tolist(), a.edge_dst.tolist(), a.edge_label.tolist()))
        assert got == want
        # features per edge
        fa = {(int(s), int(d)): f for s, d, f in zip(a.edge_src, a.edge_dst, a.edge_attr)}
        for s, d, f in zip(b.edge_src, b.edge_dst, b.edge_attr):
            np.testing.assert_allclose(f, fa[(int(s), int(d))], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            sorted(a.edge_weight.tolist()), sorted(b.edge_weight.tolist()), rtol=1e-6
        )


def test_buckets_cover_trainval_knn40():
    """A len-5 window with top_knn_nodes=40 (the trainval config) must fit a
    default bucket."""
    from batch3dmot_tpu.graph import DEFAULT_BUCKETS, pick_bucket

    scene = make_synthetic_scene(seed=0, num_frames=6, num_tracks=40,
                                 fp_per_frame=5.0)
    g = build_window_graph(scene, 0, 5, GraphConstructionConfig(top_knn_nodes=40))
    bucket = pick_bucket(g.num_nodes, g.num_edges, DEFAULT_BUCKETS)
    assert bucket[0] >= g.num_nodes and bucket[1] >= g.num_edges
    # worst-case ratio sanity: 1024 nodes x 40 knn fits the largest bucket
    assert pick_bucket(700, 700 * 40, DEFAULT_BUCKETS) == (1024, 32768)
