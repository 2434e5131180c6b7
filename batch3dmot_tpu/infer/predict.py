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
    pick_bucket,
)
from batch3dmot_tpu.train.data import to_padded


def make_scorer(model, variables) -> Callable:
    """A jitted batched scorer: PaddedGraph[B, ...] -> scores [B, E]."""
    from_logits = type(model).__name__ == "PoseGNN"

    @jax.jit
    def run(batch):
        scores, _ = jax.vmap(lambda g: model.apply(variables, g))(batch)
        if from_logits:
            scores = jax.nn.sigmoid(scores)
        return scores

    return run


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
    scores = score_windows(scorer, windows, wpb)
    avg = average_scene_edges(windows, scores)
    kept = threshold_edges(avg, scene, thresholds)
    pred_edges = greedy_round(kept)
    return pred_edges, avg
