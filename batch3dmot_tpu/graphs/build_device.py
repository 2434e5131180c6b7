"""Device-side (jit/vmap) window-graph construction.

The reference builds tracking graphs in pure-Python loops across an 8-way ray
pool (``construct_detection_graph_disjoint_parallel.py:690-716``). The
host-side numpy builder (:mod:`batch3dmot_tpu.graphs.build`) already
vectorizes one window; this module moves the whole scene onto the TPU: every
sliding window's kNN candidate edges, GT labels, edge features and pose
features are computed by ONE jitted program that vmaps over windows — the
"graph construction moves into vectorized device-side ops" north star.

Key structural fact making this cheap: detections are stored frame-major, so
each window's members are a *contiguous* slice of the scene arrays; a window
is fully described by its (start, count) pair and node i of window w is
detection ``lo_w + i``.

Semantics are identical to the numpy builder (differential-tested); the only
representational difference is that every window's edge list is laid out as
the dense [N, k] top-k grid with a mask, in the same (dst-major, ascending
distance) order.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from batch3dmot_tpu.config import NUM_CLASSES, GraphConstructionConfig
from batch3dmot_tpu.data.types import SceneDetections, WindowGraphArrays
from batch3dmot_tpu.graphs.weights import cb_weight_table

_BIG = jnp.float32(1e30)


def _angle_diff(x, y):
    period = 2 * jnp.pi
    diff = (x - y + period / 2) % period - period / 2
    return jnp.where(diff > jnp.pi, diff - 2 * jnp.pi, diff)


@functools.partial(
    jax.jit, static_argnames=("window_len", "k", "max_nodes")
)
def build_windows_device(
    # scene arrays, padded to a fixed M with det_mask:
    frame_idx: jax.Array,  # [M] i32 (frame-major sorted)
    center_g: jax.Array,  # [M, 3]
    yaw_g: jax.Array,  # [M]
    vel_g: jax.Array,  # [M, 3]
    center_e: jax.Array,  # [M, 3]
    yaw_e: jax.Array,  # [M]
    vel_e: jax.Array,  # [M, 3]
    wlh: jax.Array,  # [M, 3]
    class_id: jax.Array,  # [M] i32 (1-indexed)
    score: jax.Array,  # [M]
    token_id: jax.Array,  # [M] i32 (-1 unmatched)
    det_mask: jax.Array,  # [M] bool
    window_starts: jax.Array,  # [W] i32
    *,
    window_len: int,
    k: int,
    max_nodes: int,
):
    """Build all W windows on device.

    Returns a dict of [W, ...] arrays: det_index/node data [W, N, ...],
    node_mask, and the dense [W, N*k] edge arrays with masks.
    """
    m = frame_idx.shape[0]
    n = max_nodes
    cb_table = jnp.asarray(cb_weight_table())

    # detections are frame-major: windows are contiguous slices
    big_frame = jnp.where(det_mask, frame_idx, jnp.int32(2**30))

    def one_window(start):
        lo = jnp.searchsorted(big_frame, start)
        hi = jnp.searchsorted(big_frame, start + window_len)
        count = jnp.minimum(hi - lo, n)
        idx = jnp.clip(lo + jnp.arange(n), 0, m - 1).astype(jnp.int32)
        valid = jnp.arange(n) < count

        time = jnp.where(valid, frame_idx[idx] - start, -1)
        cls = jnp.where(valid, class_id[idx], 0)
        tok = jnp.where(valid, token_id[idx], -2)
        cg = center_g[idx]
        yg = yaw_g[idx]
        vg = vel_g[idx]
        sz = wlh[idx]

        # pose features [N, 19]
        onehot = jax.nn.one_hot(cls - 1, NUM_CLASSES, dtype=jnp.float32)
        pose = jnp.concatenate(
            [
                center_e[idx].astype(jnp.float32),
                sz.astype(jnp.float32),
                yaw_e[idx, None].astype(jnp.float32),
                vel_e[idx].astype(jnp.float32),
                onehot,
                score[idx, None].astype(jnp.float32),
                time[:, None].astype(jnp.float32),
            ],
            axis=1,
        )
        pose = jnp.where(valid[:, None], pose, 0.0)

        # candidates: strictly-past frames, same class, both valid
        cand = (
            (time[None, :] < time[:, None])
            & (cls[None, :] == cls[:, None])
            & valid[:, None]
            & valid[None, :]
        )

        d_xy = jnp.linalg.norm(cg[:, None, :2] - cg[None, :, :2], axis=-1)
        d_yaw = jnp.abs(_angle_diff(yg[:, None], yg[None, :]))
        d_vel = jnp.linalg.norm(vg[:, None, :] - vg[None, :, :], axis=-1)

        def norm_rows(d):
            masked = jnp.where(cand, d, 0.0)
            row_max = masked.max(axis=1, keepdims=True)
            return jnp.where(row_max > 0, d / jnp.where(row_max > 0, row_max, 1.0), 0.0)

        combined = (
            0.5 * norm_rows(d_xy) + 0.25 * norm_rows(d_yaw) + 0.25 * norm_rows(d_vel)
        )
        combined = jnp.where(cand, combined, _BIG)

        neg, order = jax.lax.top_k(-combined, k)  # [N, k] ascending distance
        edge_ok = neg > -_BIG

        e_src = order.astype(jnp.int32)  # [N, k]
        e_dst = jax.lax.broadcasted_iota(jnp.int32, (n, k), 0)

        dt = time[e_dst] - time[e_src]  # [N, k]
        tok_match = edge_ok & (tok[e_src] == tok[e_dst]) & (tok[e_dst] >= 0)
        dt_or_big = jnp.where(tok_match, dt, jnp.int32(2**30))
        min_dt = dt_or_big.min(axis=1, keepdims=True)
        labels = (tok_match & (dt == min_dt)).astype(jnp.float32)

        feat_d = jnp.linalg.norm(cg[e_src][..., :2] - cg[e_dst][..., :2], axis=-1)
        feat_y = jnp.abs(_angle_diff(yg[e_src], yg[e_dst]))
        vol = jnp.prod(sz, axis=-1)
        feat_v = jnp.log(jnp.where(edge_ok, vol[e_src] / vol[e_dst], 1.0))
        edge_attr = jnp.stack(
            [feat_d, feat_y, feat_v, dt.astype(jnp.float32)], axis=-1
        )
        edge_attr = jnp.where(edge_ok[..., None], edge_attr, 0.0)

        weights = jnp.where(edge_ok, cb_table[cls[e_src]], 0.0)

        flat = lambda a: a.reshape(n * k, *a.shape[2:])
        emask = flat(edge_ok)
        return {
            "det_index": jnp.where(valid, idx, 0),
            "pose": pose,
            "node_time": jnp.where(valid, time, -1).astype(jnp.int32),
            "node_class": cls.astype(jnp.int32),
            "node_mask": valid,
            "edge_src": jnp.where(emask, flat(e_src), 0),
            "edge_dst": jnp.where(emask, flat(e_dst), 0),
            "edge_attr": flat(edge_attr),
            "edge_mask": emask,
            "edge_label": flat(labels),
            "edge_weight": flat(weights),
            "num_nodes": count,
        }

    return jax.vmap(one_window)(window_starts)


def build_scene_graphs_device(
    scene: SceneDetections,
    window_len: int,
    cfg: Optional[GraphConstructionConfig] = None,
    max_nodes: Optional[int] = None,
) -> List[WindowGraphArrays]:
    """Drop-in replacement for :func:`graphs.build.build_scene_graphs` that
    runs the whole scene's window construction as one device program."""
    cfg = cfg or GraphConstructionConfig()
    m = scene.num_detections
    num_windows = scene.num_frames - window_len + 1
    if m == 0 or num_windows <= 0:
        from batch3dmot_tpu.graphs.build import build_scene_graphs

        return list(build_scene_graphs(scene, window_len, cfg))

    # frame-major order is a precondition
    assert np.all(np.diff(scene.frame_idx) >= 0), "detections must be frame-major"

    if max_nodes is None:
        counts = np.bincount(scene.frame_idx, minlength=scene.num_frames)
        window_sizes = [
            int(counts[s : s + window_len].sum()) for s in range(num_windows)
        ]
        max_nodes = max(1, -(-max(window_sizes) // 32) * 32)

    m_pad = -(-m // 64) * 64
    pad1 = lambda a, v=0: np.pad(a, (0, m_pad - m), constant_values=v)
    pad2 = lambda a: np.pad(a, ((0, m_pad - m), (0, 0)))

    out = build_windows_device(
        jnp.asarray(pad1(scene.frame_idx.astype(np.int32), 0)),
        jnp.asarray(pad2(scene.center_g.astype(np.float32))),
        jnp.asarray(pad1(scene.yaw_g.astype(np.float32))),
        jnp.asarray(pad2(scene.vel_g.astype(np.float32))),
        jnp.asarray(pad2(scene.center_e.astype(np.float32))),
        jnp.asarray(pad1(scene.yaw_e.astype(np.float32))),
        jnp.asarray(pad2(scene.vel_e.astype(np.float32))),
        jnp.asarray(pad2(scene.wlh.astype(np.float32))),
        jnp.asarray(pad1(scene.class_id.astype(np.int32))),
        jnp.asarray(pad1(scene.score.astype(np.float32))),
        jnp.asarray(pad1(scene.token_id.astype(np.int32), -1)),
        jnp.asarray(pad1(np.ones(m, bool), False)),
        jnp.arange(num_windows, dtype=np.int32),
        window_len=window_len,
        k=min(cfg.top_knn_nodes, max_nodes),
        max_nodes=max_nodes,
    )
    out = jax.tree.map(np.asarray, out)

    windows: List[WindowGraphArrays] = []
    for w in range(num_windows):
        nmask = out["node_mask"][w]
        emask = out["edge_mask"][w]
        n_w = int(out["num_nodes"][w])
        e_idx = np.nonzero(emask)[0]
        windows.append(
            WindowGraphArrays(
                scene_token=scene.scene_token,
                window_start=w,
                window_len=window_len,
                det_index=out["det_index"][w][:n_w],
                pose=out["pose"][w][:n_w],
                node_time=out["node_time"][w][:n_w],
                node_class=out["node_class"][w][:n_w],
                edge_src=out["edge_src"][w][e_idx],
                edge_dst=out["edge_dst"][w][e_idx],
                edge_attr=out["edge_attr"][w][e_idx],
                edge_label=out["edge_label"][w][e_idx],
                edge_weight=out["edge_weight"][w][e_idx],
                img=None if scene.img is None else scene.img[out["det_index"][w][:n_w]],
                lidar=None if scene.lidar is None else scene.lidar[out["det_index"][w][:n_w]],
                radar=None if scene.radar is None else scene.radar[out["det_index"][w][:n_w]],
            )
        )
    return windows
