"""Batched window scoring and cross-window edge-score aggregation.

Re-designs the reference inference path (``predict.py:143-259``):

  * the reference scores one window at a time on CPU through a freshly
    re-built model per scene (``predict.py:384-405``) — here all windows of a
    scene are padded into shape buckets and scored in device batches through
    one jitted program per bucket;
  * global node identity: the reference round-trips node metadata through
    ``str(dict)`` / ``eval`` hashes (``predict.py:207,224``); here every
    window node carries its scene-level detection index
    (``WindowGraphArrays.det_index``) so cross-window averaging is an exact
    integer join;
  * duplicate-edge scores across overlapping windows are averaged, then
    thresholded per class and greedily rounded to at most one
    best-incoming/best-outgoing edge per node (``predict.py:92-117,226-257``).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from batch3dmot_tpu.config import (
    Config,
    DEFAULT_EDGE_SCORE_THRESHOLDS,
    TRACKING_CLASSES,
)
from batch3dmot_tpu.data.types import SceneDetections, WindowGraphArrays
from batch3dmot_tpu.graph import (
    DEFAULT_BUCKETS,
    batch_graphs,
    empty_graph,
    pad_graph,
    pick_bucket,
)
from batch3dmot_tpu.train.data import to_padded


def make_scorer(model, variables, mesh=None) -> Callable:
    """A jitted batched scorer: PaddedGraph[B, ...] -> scores [B, E].

    With ``mesh`` the window batch dimension is sharded across the data axis
    (multi-chip inference; params replicated, no collectives needed — each
    device scores its window shard independently over ICI-free SPMD).
    """
    from_logits = type(model).__name__ == "PoseGNN"

    shard = None
    if mesh is not None:
        from batch3dmot_tpu.parallel import replicate, shard_batch_fn

        variables = replicate(variables, mesh)
        shard = shard_batch_fn(mesh)

    @jax.jit
    def run(batch):
        scores, _ = jax.vmap(lambda g: model.apply(variables, g))(batch)
        if from_logits:
            scores = jax.nn.sigmoid(scores)
        return scores

    if shard is None:
        return run
    return lambda batch: run(shard(batch))


def make_scene_encoded_scorer(model, variables) -> "SceneEncodedScorer":
    """Encode-once inference for the multimodal GNN.

    The reference re-runs the frozen encoders on every node of every window,
    so a detection appearing in L overlapping windows is encoded L times
    (``predict.py:172-197``) — and the encoders are where the FLOPs are.
    Here all detections of a scene are encoded in ONE dense device batch and
    the per-window forwards gather the embeddings by detection index.
    """
    return SceneEncodedScorer(model, variables)


class SceneEncodedScorer:
    def __init__(self, model, variables):
        self.model = model
        self.variables = variables

        @jax.jit
        def encode(img, lidar, radar):
            x_img, pn, rn = model.apply(
                variables, img, lidar, radar, method=model.encode_frozen
            )
            lp = (lidar.sum(axis=(1, 2)) != 0)
            rp = (radar.sum(axis=(1, 2)) != 0)
            return x_img, pn, rn, lp, rp

        @jax.jit
        def fwd(batch, det_index, enc):
            x_img, pn, rn, lp, rp = enc

            def one(g, idx):
                scores, _ = model.apply(
                    self.variables,
                    g,
                    x_img[idx],
                    pn[idx],
                    rn[idx],
                    lp[idx],
                    rp[idx],
                    method=model.forward_from_encodings,
                )
                return scores

            return jax.vmap(one)(batch, det_index)

        self._encode = encode
        self._fwd = fwd

    def score_scene(
        self,
        scene: "SceneDetections",
        windows: Sequence[WindowGraphArrays],
        windows_per_batch: int = 8,
        buckets=DEFAULT_BUCKETS,
    ) -> List[np.ndarray]:
        import jax.numpy as jnp

        m = scene.num_detections
        m_pad = max(256, -(-m // 256) * 256)  # bucket to multiples of 256

        def padm(a, shape_tail):
            out = np.zeros((m_pad, *shape_tail), np.float32)
            if a is not None and m:
                out[:m] = a
            return jnp.asarray(out)

        from batch3dmot_tpu.graph import IMG_SHAPE, LIDAR_SHAPE, RADAR_SHAPE

        enc = self._encode(
            padm(scene.img, IMG_SHAPE),
            padm(scene.lidar, LIDAR_SHAPE),
            padm(scene.radar, RADAR_SHAPE),
        )

        results: List[Optional[np.ndarray]] = [None] * len(windows)
        by_bucket: Dict[Tuple[int, int], List[int]] = defaultdict(list)
        for i, w in enumerate(windows):
            if w.num_nodes == 0 or w.num_edges == 0:
                results[i] = np.zeros((0,), np.float32)
                continue
            by_bucket[pick_bucket(w.num_nodes, w.num_edges, buckets)].append(i)

        for (mn, me), idxs in by_bucket.items():
            for lo in range(0, len(idxs), windows_per_batch):
                chunk = idxs[lo : lo + windows_per_batch]
                graphs, dets = [], []
                for i in chunk:
                    w = windows[i]
                    # modality arrays intentionally omitted: embeddings are
                    # gathered from the scene-level encode
                    graphs.append(
                        pad_graph(
                            pose=w.pose, edge_src=w.edge_src, edge_dst=w.edge_dst,
                            edge_attr=w.edge_attr, node_time=w.node_time,
                            node_class=w.node_class, max_nodes=mn, max_edges=me,
                            edge_label=w.edge_label, edge_weight=w.edge_weight,
                            include_modalities=False,
                        )
                    )
                    di = np.zeros(mn, np.int32)
                    di[: w.num_nodes] = w.det_index
                    dets.append(di)
                while len(graphs) < windows_per_batch:
                    graphs.append(empty_graph(mn, me, include_modalities=False))
                    dets.append(np.zeros(mn, np.int32))
                scores = np.asarray(
                    self._fwd(
                        batch_graphs(graphs),
                        jnp.asarray(np.stack(dets)),
                        enc,
                    )
                )
                for slot, i in enumerate(chunk):
                    results[i] = scores[slot, : windows[i].num_edges]
        return results  # type: ignore[return-value]


def score_windows(
    scorer: Callable,
    windows: Sequence[WindowGraphArrays],
    windows_per_batch: int = 8,
    buckets=DEFAULT_BUCKETS,
) -> List[np.ndarray]:
    """Score all windows; returns per-window [num_edges] arrays (unpadded).

    Windows are grouped by shape bucket and stacked ``windows_per_batch`` at
    a time; empty windows get empty score arrays (the reference skips them,
    ``predict.py:179``).
    """
    results: List[Optional[np.ndarray]] = [None] * len(windows)
    by_bucket: Dict[Tuple[int, int], List[int]] = defaultdict(list)
    for i, w in enumerate(windows):
        if w.num_nodes == 0 or w.num_edges == 0:
            results[i] = np.zeros((0,), np.float32)
            continue
        by_bucket[pick_bucket(w.num_nodes, w.num_edges, buckets)].append(i)

    for (mn, me), idxs in by_bucket.items():
        for lo in range(0, len(idxs), windows_per_batch):
            chunk = idxs[lo : lo + windows_per_batch]
            graphs = [to_padded(windows[i], mn, me) for i in chunk]
            while len(graphs) < windows_per_batch:
                graphs.append(empty_graph(mn, me))
            scores = np.asarray(scorer(batch_graphs(graphs)))
            for slot, i in enumerate(chunk):
                results[i] = scores[slot, : windows[i].num_edges]
    return results  # type: ignore[return-value]


def average_scene_edges(
    windows: Sequence[WindowGraphArrays],
    window_scores: Sequence[np.ndarray],
) -> Dict[Tuple[int, int], float]:
    """Mean per-edge score across overlapping windows, keyed by scene-level
    (src_det_index, dst_det_index) (reference ``predict.py:199-227``)."""
    acc: Dict[Tuple[int, int], List[float]] = defaultdict(list)
    for w, s in zip(windows, window_scores):
        if len(s) == 0:
            continue
        gsrc = w.det_index[w.edge_src]
        gdst = w.det_index[w.edge_dst]
        for a, b, v in zip(gsrc.tolist(), gdst.tolist(), s.tolist()):
            acc[(a, b)].append(v)
    return {k: float(np.mean(v)) for k, v in acc.items()}


def threshold_edges(
    avg_scores: Dict[Tuple[int, int], float],
    scene: SceneDetections,
    thresholds: Optional[Dict[str, float]] = None,
) -> Dict[Tuple[int, int], float]:
    """Keep edges whose mean score clears the per-class threshold of the
    source node's category (reference ``predict.py:231-233``)."""
    thresholds = thresholds or DEFAULT_EDGE_SCORE_THRESHOLDS
    id2name = {v: k for k, v in TRACKING_CLASSES.items()}
    out = {}
    for (a, b), v in avg_scores.items():
        cname = id2name[int(scene.class_id[a])]
        if v > thresholds[cname]:
            out[(a, b)] = v
    return out


def greedy_round(
    edges: Dict[Tuple[int, int], float],
) -> List[Tuple[Tuple[int, int], float]]:
    """Keep, per node, its best-scoring incoming and outgoing edge
    (reference ``predict.py:92-117,243-257``). As in the reference this does
    *not* enforce global degree constraints — two different nodes may keep
    edges into the same successor; the clustering stage resolves conflicts
    by score order."""
    best_in: Dict[int, Tuple[int, float]] = {}
    best_out: Dict[int, Tuple[int, float]] = {}
    for (a, b), v in edges.items():
        if a not in best_out or v > best_out[a][1]:
            best_out[a] = (b, v)
        if b not in best_in or v > best_in[b][1]:
            best_in[b] = (a, v)
    kept: Dict[Tuple[int, int], float] = {}
    for a, (b, v) in best_out.items():
        kept[(a, b)] = v
    for b, (a, v) in best_in.items():
        kept[(a, b)] = v
    return list(kept.items())


def predict_scene(
    scorer: Callable,
    scene: SceneDetections,
    windows: Sequence[WindowGraphArrays],
    cfg: Optional[Config] = None,
    windows_per_batch: int = 8,
):
    """Full per-scene edge pipeline: batched scoring -> cross-window
    averaging -> per-class thresholding -> greedy rounding.

    Returns (pred_edges, avg_scores) where pred_edges is the greedy-rounded
    [(det_i, det_j), score] list in scene detection indices.
    """
    thresholds = (
        cfg.predict.edge_score_thresholds if cfg else DEFAULT_EDGE_SCORE_THRESHOLDS
    )
    wpb = cfg.predict.windows_per_batch if cfg else windows_per_batch
    if isinstance(scorer, SceneEncodedScorer):
        scores = scorer.score_scene(scene, windows, wpb)
    else:
        scores = score_windows(scorer, windows, wpb)
    avg = average_scene_edges(windows, scores)
    kept = threshold_edges(avg, scene, thresholds)
    pred_edges = greedy_round(kept)
    return pred_edges, avg
