"""Host-side batching of window graphs into fixed-shape device batches.

Replaces the reference's PyG DataLoader + per-item ``torch.load`` of 9 files
(``utils/graph_data.py:152-256``, ``train.py:85-97``) with: windows padded
into a small set of (max_nodes, max_edges) buckets, shuffled, and stacked
``batch_size`` at a time along a leading window dimension. One XLA program
per bucket; incomplete batches are filled with all-padding graphs so shapes
never change.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from batch3dmot_tpu.graph import (
    DEFAULT_BUCKETS,
    PaddedGraph,
    batch_graphs,
    empty_graph,
    pad_graph,
    pick_bucket,
)
from batch3dmot_tpu.data.types import WindowGraphArrays


def to_padded(
    g: WindowGraphArrays, max_nodes: int, max_edges: int
) -> PaddedGraph:
    return pad_graph(
        pose=g.pose,
        edge_src=g.edge_src,
        edge_dst=g.edge_dst,
        edge_attr=g.edge_attr,
        node_time=g.node_time,
        node_class=g.node_class,
        max_nodes=max_nodes,
        max_edges=max_edges,
        img=g.img,
        lidar=g.lidar,
        radar=g.radar,
        edge_label=g.edge_label,
        edge_weight=g.edge_weight,
    )


def uniform_bucket(
    sizes: Sequence[Tuple[int, int]],
    buckets: Sequence[Tuple[int, int]] = DEFAULT_BUCKETS,
    max_waste: float = 4.0,
) -> Tuple[Tuple[int, int], ...]:
    """The single bucket fitting every (num_nodes, num_edges) in ``sizes``.

    Training prefers ONE shape for the whole epoch over tighter per-window
    padding: the K-step fused scan (`GNNTrainer.train_epoch(fused_steps=K)`)
    can only group same-shape batches, so mixed buckets fragment the groups
    into extra dispatches — measured slower end-to-end even when each batch
    is individually cheaper (docs/RESULTS.md). Inference keeps per-window
    bucketing (no cross-batch grouping to protect).

    Outlier guard: when a few dense windows would force the WHOLE epoch
    into a bucket more than ``max_waste``x the area of the median window's
    own bucket (a real hazard on trainval, where one crowded scene can be
    16x the typical window), the uniform tradeoff inverts — fall back to
    per-window bucketing instead of silently paying the padding.
    """
    if not sizes:
        return tuple(buckets)
    uni = pick_bucket(
        max(n for n, _ in sizes), max(e for _, e in sizes), buckets
    )
    per_window = sorted(
        pick_bucket(n, e, buckets)[0] * pick_bucket(n, e, buckets)[1]
        for n, e in sizes
    )
    median_area = per_window[len(per_window) // 2]
    if uni[0] * uni[1] > max_waste * median_area:
        return tuple(buckets)
    return (uni,)


class GraphBatcher:
    """Bucket + shuffle + stack window graphs into PaddedGraph batches."""

    def __init__(
        self,
        windows: Sequence[WindowGraphArrays],
        batch_size: int,
        buckets: Sequence[Tuple[int, int]] = DEFAULT_BUCKETS,
        drop_empty: bool = True,
        seed: int = 0,
        uniform: bool = False,
    ):
        self.batch_size = batch_size
        windows = [
            w
            for w in windows
            if not (drop_empty and (w.num_nodes == 0 or w.num_edges == 0))
            # reference skips empty windows at inference (predict.py:179)
        ]
        if uniform:
            buckets = uniform_bucket(
                [(w.num_nodes, w.num_edges) for w in windows], buckets
            )
        self.buckets = tuple(buckets)
        self._rng = np.random.default_rng(seed)
        self.by_bucket: Dict[Tuple[int, int], List[WindowGraphArrays]] = {}
        for w in windows:
            b = pick_bucket(w.num_nodes, w.num_edges, self.buckets)
            self.by_bucket.setdefault(b, []).append(w)

    def __len__(self) -> int:
        return sum(
            (len(ws) + self.batch_size - 1) // self.batch_size
            for ws in self.by_bucket.values()
        )

    def epoch(self, shuffle: bool = True) -> Iterator[PaddedGraph]:
        """Yield stacked [B, ...] PaddedGraph batches for one epoch."""
        order: List[Tuple[Tuple[int, int], int]] = []
        per_bucket: Dict[Tuple[int, int], List[int]] = {}
        for b, ws in self.by_bucket.items():
            idxs = np.arange(len(ws))
            if shuffle:
                self._rng.shuffle(idxs)
            per_bucket[b] = list(idxs)
        batches: List[Tuple[Tuple[int, int], List[int]]] = []
        for b, idxs in per_bucket.items():
            for i in range(0, len(idxs), self.batch_size):
                batches.append((b, idxs[i : i + self.batch_size]))
        if shuffle:
            self._rng.shuffle(batches)
        for b, idxs in batches:
            (mn, me) = b
            graphs = [to_padded(self.by_bucket[b][i], mn, me) for i in idxs]
            while len(graphs) < self.batch_size:
                graphs.append(
                    empty_graph(mn, me, img_dtype=graphs[0].img.dtype)
                )
            yield batch_graphs(graphs)


def single_bucket_for(
    sizes, buckets: Sequence[Tuple[int, int]] = DEFAULT_BUCKETS
) -> Tuple[int, int]:
    """ONE bucket covering every (num_nodes, num_edges) — for the
    device-resident datasets, which need a single uniform shape per
    group. ``uniform_bucket``'s choice when its outlier guard allows
    one, else the bucket fitting the densest window (the guard's
    multi-bucket fallback would crash a single-shape consumer)."""
    out = uniform_bucket(sizes, buckets)
    if len(out) == 1:
        return out[0]
    return pick_bucket(
        max(n for n, _ in sizes), max(e for _, e in sizes), buckets
    )


def group_sizes_by_bucket(
    sizes, buckets: Sequence[Tuple[int, int]] = DEFAULT_BUCKETS
):
    """Item-index groups for the device-resident datasets: one group (the
    ``uniform_bucket`` shape) when the outlier guard allows it, else one
    group per occupied ``pick_bucket`` bucket — a crowded trainval scene
    must not force EVERY step's shapes to the densest window's bucket
    (~4x padding waste; the host batchers bucket per window for the same
    reason). Returns [(bucket, [item indices])]."""
    out = uniform_bucket(sizes, buckets)
    if len(out) == 1:
        return [(out[0], list(range(len(sizes))))]
    by_bucket: Dict[Tuple[int, int], List[int]] = {}
    for i, (n, e) in enumerate(sizes):
        by_bucket.setdefault(pick_bucket(n, e, buckets), []).append(i)
    return sorted(by_bucket.items())


def materialize_graph_datasets(
    windows, buckets: Sequence[Tuple[int, int]] = DEFAULT_BUCKETS
):
    """List of device-resident dataset groups, one per occupied bucket
    (``group_sizes_by_bucket``); ``GNNTrainer.fit_device`` runs one
    scanned program per group per epoch."""
    items = [w for w in windows if w.num_nodes > 0 and w.num_edges > 0]
    assert items, "materialize_graph_datasets: no non-empty windows"
    groups = group_sizes_by_bucket(
        [(w.num_nodes, w.num_edges) for w in items], buckets
    )
    return [
        materialize_graph_dataset([items[i] for i in idxs], bucket=b)
        for b, idxs in groups
    ]


def materialize_graph_dataset(
    windows, buckets: Sequence[Tuple[int, int]] = DEFAULT_BUCKETS,
    bucket: Optional[Tuple[int, int]] = None,
):
    """The whole (modality-free) window set as ONE stacked pytree for
    DEVICE-RESIDENT training (``GNNTrainer.fit_device``; the pose-model
    counterpart of ``train.encoded.materialize_encoded_dataset``): every
    window padded to a single uniform bucket and stacked on a leading
    [W+1] axis, with an EMPTY window appended at index W for remainder
    padding. Returns (graphs, None, bucket)."""
    import jax

    items = [w for w in windows if w.num_nodes > 0 and w.num_edges > 0]
    assert items, "materialize_graph_dataset: no non-empty windows"
    mn, me = bucket or single_bucket_for(
        [(w.num_nodes, w.num_edges) for w in items], buckets
    )

    # modality-free by construction (the pose model never reads them;
    # windows from sensor-built stores may carry crops); preallocated
    # [W+1, ...] buffers filled row by row (stack-of-copies would
    # transiently double host RAM)
    def one(w):
        return pad_graph(
            pose=w.pose, edge_src=w.edge_src, edge_dst=w.edge_dst,
            edge_attr=w.edge_attr, node_time=w.node_time,
            node_class=w.node_class, max_nodes=mn, max_edges=me,
            edge_label=w.edge_label, edge_weight=w.edge_weight,
            include_modalities=False,
        )

    W = len(items)
    g0 = one(items[0])
    graphs = jax.tree.map(
        lambda a: np.zeros((W + 1, *np.shape(a)), np.asarray(a).dtype), g0
    )

    def fill(k, g1):
        jax.tree.map(
            lambda dst, src: dst.__setitem__(k, np.asarray(src)), graphs, g1
        )

    fill(0, g0)
    for k, w in enumerate(items[1:], start=1):
        fill(k, one(w))
    fill(W, empty_graph(mn, me, include_modalities=False))
    return graphs, None, (mn, me)
