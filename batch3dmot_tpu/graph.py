"""Fixed-shape padded tracking-graph containers.

The reference keeps graphs as dynamic Python lists / variable-length PyG
``Data`` objects (``utils/graph_data.py:152-256``). On TPU everything under
``jit`` must have static shapes, so a window graph is padded to a
``(max_nodes, max_edges)`` budget and batched by stacking along a leading
window dimension — which turns every per-edge MLP and every segment reduction
into one big MXU-friendly batched matmul.

Padding conventions:
  * padded node slots have ``node_mask == False`` and all-zero features;
  * padded edge slots have ``edge_mask == False`` and ``src == dst == 0``;
    segment reductions multiply messages by ``edge_mask`` so padded edges
    contribute exactly zero to node 0;
  * ``node_time`` of padded slots is -1, ``node_class`` is 0 (classes are
    1-indexed).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Feature-dimension contract (SURVEY.md §2.2, reference
# construct...parallel.py:119-124,400-436 + graph_utils.py:7-30):
POSE_DIM = 19  # center(3) + wlh(3) + yaw(1) + velocity(3) + onehot(7) + score(1) + rel_time(1)
EDGE_DIM = 4  # [l2 xy dist, |yaw diff|, log volume ratio, |dt|]
IMG_SHAPE = (32, 32, 3)  # NHWC crop (reference stores CHW; converted on load)
LIDAR_SHAPE = (128, 3)  # points x channels (reference: 3 x 128)
RADAR_SHAPE = (64, 4)  # points x channels (reference: 4 x 64)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PaddedGraph:
    """One (optionally leading-batched) padded window graph.

    All arrays share an optional leading batch dimension ``[B, ...]`` when
    produced by :func:`batch_graphs`.
    """

    pose: jax.Array  # [N, 19] f32
    img: jax.Array  # [N, 32, 32, 3] uint8 (0..255) or f32 ([0,1])
    lidar: jax.Array  # [N, 128, 3] f32
    radar: jax.Array  # [N, 64, 4] f32
    node_time: jax.Array  # [N] i32 (-1 for padding)
    node_class: jax.Array  # [N] i32, 1-indexed (0 for padding)
    node_mask: jax.Array  # [N] bool
    edge_src: jax.Array  # [E] i32 — past node j (edge_index[0] in reference)
    edge_dst: jax.Array  # [E] i32 — current node i (edge_index[1])
    edge_attr: jax.Array  # [E, 4] f32
    edge_mask: jax.Array  # [E] bool
    edge_label: jax.Array  # [E] f32 (GT active/inactive)
    edge_weight: jax.Array  # [E] f32 (class-balanced loss weights)

    @property
    def max_nodes(self) -> int:
        return self.pose.shape[-2]

    @property
    def max_edges(self) -> int:
        return self.edge_src.shape[-1]

    @property
    def num_nodes(self) -> jax.Array:
        return self.node_mask.sum(axis=-1)

    @property
    def num_edges(self) -> jax.Array:
        return self.edge_mask.sum(axis=-1)


def _pad_to(arr: np.ndarray, size: int, axis: int = 0, value=0) -> np.ndarray:
    pad = size - arr.shape[axis]
    if pad < 0:
        raise ValueError(
            f"Array of size {arr.shape[axis]} exceeds padding budget {size}"
        )
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths, mode="constant", constant_values=value)


def pad_graph(
    pose: np.ndarray,
    edge_src: np.ndarray,
    edge_dst: np.ndarray,
    edge_attr: np.ndarray,
    node_time: np.ndarray,
    node_class: np.ndarray,
    max_nodes: int,
    max_edges: int,
    img: Optional[np.ndarray] = None,
    lidar: Optional[np.ndarray] = None,
    radar: Optional[np.ndarray] = None,
    edge_label: Optional[np.ndarray] = None,
    edge_weight: Optional[np.ndarray] = None,
    dtype=np.float32,
    include_modalities: bool = True,
    img_dtype=np.float32,
) -> PaddedGraph:
    """Pad raw per-window numpy arrays into a :class:`PaddedGraph`.

    ``include_modalities=False`` stores zero-size [N, 0, 0, 0] modality
    placeholders — for the precomputed-encoding and device-pipeline paths
    that never read g.img/lidar/radar, full-size zero arrays would otherwise
    dominate host->device traffic.

    ``img`` may be uint8 (0..255): its dtype is PRESERVED so the crop rides
    host->device at 1 byte/pixel (4x less relay traffic than f32 — the
    per-scene upload wall, docs/RESULTS.md round 4) and the encoders divide
    by 255 on device (``models.encoders.image_input_f32``), matching the
    reference's PIL-uint8 + ToTensor/255 semantics (``dataset.py:149-161``).
    ``img_dtype`` sets the placeholder dtype when ``img`` is absent so empty
    fill graphs stack with their uint8 batch peers.
    """
    n = pose.shape[0]
    e = edge_src.shape[0]
    if not include_modalities:
        img = lidar = radar = np.zeros((n, 0, 0, 0), dtype)
    if img is None:
        img = np.zeros((n, *IMG_SHAPE), img_dtype)
    if lidar is None:
        lidar = np.zeros((n, *LIDAR_SHAPE), dtype)
    if radar is None:
        radar = np.zeros((n, *RADAR_SHAPE), dtype)
    if edge_label is None:
        edge_label = np.zeros((e,), dtype)
    if edge_weight is None:
        edge_weight = np.ones((e,), dtype)

    node_mask = np.zeros((max_nodes,), bool)
    node_mask[:n] = True
    edge_mask = np.zeros((max_edges,), bool)
    edge_mask[:e] = True

    # numpy-backed on purpose: a PaddedGraph is host-side staging data.
    # Converting each field here (13 device_puts per window) and stacking
    # on device (eager expand_dims+concat per window through the TPU relay)
    # measurably dominated the steady-state predict host time — numpy until
    # the jit boundary means ONE transfer per field per batch.
    return PaddedGraph(
        pose=_pad_to(pose.astype(dtype), max_nodes),
        img=_pad_to(
            img if img.dtype == np.uint8 else img.astype(dtype), max_nodes
        ),
        lidar=_pad_to(lidar.astype(dtype), max_nodes),
        radar=_pad_to(radar.astype(dtype), max_nodes),
        node_time=_pad_to(node_time.astype(np.int32), max_nodes, value=-1),
        node_class=_pad_to(node_class.astype(np.int32), max_nodes),
        node_mask=node_mask,
        edge_src=_pad_to(edge_src.astype(np.int32), max_edges),
        edge_dst=_pad_to(edge_dst.astype(np.int32), max_edges),
        edge_attr=_pad_to(edge_attr.astype(dtype), max_edges),
        edge_mask=edge_mask,
        edge_label=_pad_to(edge_label.astype(dtype), max_edges),
        edge_weight=_pad_to(edge_weight.astype(dtype), max_edges),
    )


def stack_host_or_device(*xs):
    """Stack leaves along a new leading axis — on the HOST when every
    input is numpy (one transfer per field at the jit boundary instead of
    eager per-item device stacks through a TPU relay), with jnp otherwise
    (callers batching already-transferred arrays)."""
    if len({np.dtype(x.dtype) for x in xs}) > 1:
        # a uint8 image batched with an f32 fill graph would silently
        # promote to f32 carrying 0..255 values, which the on-device /255
        # (uint8-gated) would then NOT rescale — fail loudly instead; pass
        # img_dtype=np.uint8 to empty_graph/pad_graph for the fill slots
        raise TypeError(
            f"refusing to stack mixed dtypes {[x.dtype for x in xs]}"
        )
    if all(isinstance(x, np.ndarray) for x in xs):
        return np.stack(xs, axis=0)
    return jnp.stack(xs, axis=0)


def batch_graphs(graphs: Sequence[PaddedGraph]) -> PaddedGraph:
    """Stack same-budget graphs along a new leading window dimension
    (host-side for numpy-staged graphs, the pad_graph contract)."""
    return jax.tree.map(stack_host_or_device, *graphs)


def empty_graph(
    max_nodes: int,
    max_edges: int,
    dtype=np.float32,
    include_modalities: bool = True,
    img_dtype=np.float32,
) -> PaddedGraph:
    """An all-padding graph (used to fill incomplete window batches).
    ``img_dtype`` must match the batch peers' image dtype (uint8 stores)."""
    return pad_graph(
        include_modalities=include_modalities,
        img_dtype=img_dtype,
        pose=np.zeros((0, POSE_DIM), dtype),
        edge_src=np.zeros((0,), np.int32),
        edge_dst=np.zeros((0,), np.int32),
        edge_attr=np.zeros((0, EDGE_DIM), dtype),
        node_time=np.zeros((0,), np.int32),
        node_class=np.zeros((0,), np.int32),
        max_nodes=max_nodes,
        max_edges=max_edges,
    )


# ---------------------------------------------------------------------------
# Size bucketing
# ---------------------------------------------------------------------------

# Default (max_nodes, max_edges) buckets; windows are assigned to the smallest
# bucket that fits, limiting XLA recompilation to a handful of shapes. The
# high-edge variants cover trainval graphs (top_knn_nodes=40 gives up to
# ~40 edges per node, far above the 8x ratio of the small buckets).
DEFAULT_BUCKETS: Tuple[Tuple[int, int], ...] = (
    (64, 256),
    (64, 512),
    (128, 1024),
    (128, 4096),
    (256, 2048),
    (256, 4096),
    (256, 8192),
    (512, 4096),
    (512, 8192),
    (512, 16384),
    (1024, 8192),
    (1024, 32768),
)


def pick_bucket(
    num_nodes: int,
    num_edges: int,
    buckets: Sequence[Tuple[int, int]] = DEFAULT_BUCKETS,
) -> Tuple[int, int]:
    for n, e in buckets:
        if num_nodes <= n and num_edges <= e:
            return (n, e)
    raise ValueError(
        f"Window with {num_nodes} nodes / {num_edges} edges exceeds the "
        f"largest bucket {buckets[-1]}"
    )
