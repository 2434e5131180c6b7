"""Precomputed-encoding training for the multimodal GNN.

The reference runs the frozen ResNet/PointNet/RadarNet on every node of
every window on every epoch (``clr_att_gnn.py:125-141`` inside the training
forward) — but frozen encoders are constants of the data, so their outputs
can be computed exactly once per dataset and the GNN trained on gathered
embeddings. With window length L and E epochs this removes a factor ~L*E of
the dominant FLOPs from training (identical numbers: the trainable parts —
fc_lidar/fc_radar projections, attention, message passing — are untouched).
"""

from __future__ import annotations

import functools
from typing import Dict, Iterator, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from batch3dmot_tpu.data.types import SceneDetections, WindowGraphArrays
from batch3dmot_tpu.graph import (
    DEFAULT_BUCKETS,
    IMG_SHAPE,
    LIDAR_SHAPE,
    RADAR_SHAPE,
    PaddedGraph,
    batch_graphs,
    empty_graph,
    pad_graph,
    pick_bucket,
)

ENC_DIMS = {"x_img": 96, "pn": 256, "rn": 256}


# Module-level jit, model static, variables as an ARGUMENT: a per-call jit
# wrapper would re-trace every scene, and closure-captured device arrays are
# fetched leaf-by-leaf at lowering (seconds per compile through the TPU
# relay; scripts/profile_predict.py). flax Modules are frozen/hashable, so
# they key the trace cache directly.
@functools.partial(jax.jit, static_argnames="model")
def _encode_frozen(model, variables, img, lidar, radar):
    return model.apply(variables, img, lidar, radar, method=model.encode_frozen)


def precompute_scene_encodings(
    model, variables, scene: SceneDetections, chunk: int = 512
) -> Dict[str, np.ndarray]:
    """Frozen-encoder outputs + presence masks for every scene detection.

    Returns numpy arrays: x_img [M, 96], pn [M, 256], rn [M, 256],
    lidar_present [M], radar_present [M].
    """
    m = scene.num_detections
    enc = lambda *a: _encode_frozen(model, variables, *a)

    xs, ps, rs = [], [], []
    for lo in range(0, max(m, 1), chunk):
        hi = min(lo + chunk, m)
        pad = chunk - (hi - lo)

        def grab(arr, tail):
            buf = np.zeros((chunk, *tail), np.float32)
            if arr is not None and hi > lo:
                buf[: hi - lo] = arr[lo:hi]
            return jnp.asarray(buf)

        xi, pn, rn = enc(
            grab(scene.img, IMG_SHAPE),
            grab(scene.lidar, LIDAR_SHAPE),
            grab(scene.radar, RADAR_SHAPE),
        )
        xs.append(np.asarray(xi)[: hi - lo])
        ps.append(np.asarray(pn)[: hi - lo])
        rs.append(np.asarray(rn)[: hi - lo])

    def cat(parts, d):
        return np.concatenate(parts) if m else np.zeros((0, d), np.float32)

    lidar = scene.lidar if scene.lidar is not None else np.zeros((m, 1, 1))
    radar = scene.radar if scene.radar is not None else np.zeros((m, 1, 1))
    return {
        "x_img": cat(xs, 96),
        "pn": cat(ps, 256),
        "rn": cat(rs, 256),
        "lidar_present": lidar.reshape(m, -1).sum(1) != 0,
        "radar_present": radar.reshape(m, -1).sum(1) != 0,
    }


class EncodedGraphBatcher:
    """Yields (PaddedGraph-without-modalities, encoding pytree) batches.

    Each item pairs a window with its scene's precomputed encoding table;
    node embeddings are gathered host-side into fixed [B, N, .] buffers.
    """

    def __init__(
        self,
        windows_with_encodings: Sequence[Tuple[WindowGraphArrays, Dict[str, np.ndarray]]],
        batch_size: int,
        buckets: Sequence[Tuple[int, int]] = DEFAULT_BUCKETS,
        seed: int = 0,
        uniform: bool = False,
    ):
        self.batch_size = batch_size
        self._rng = np.random.default_rng(seed)
        self.by_bucket: Dict[Tuple[int, int], List[int]] = {}
        self.items = [
            (w, enc)
            for (w, enc) in windows_with_encodings
            if w.num_nodes > 0 and w.num_edges > 0
        ]
        if uniform:
            from batch3dmot_tpu.train.data import uniform_bucket

            buckets = uniform_bucket(
                [(w.num_nodes, w.num_edges) for w, _ in self.items], buckets
            )
        self.buckets = tuple(buckets)
        for i, (w, _) in enumerate(self.items):
            b = pick_bucket(w.num_nodes, w.num_edges, self.buckets)
            self.by_bucket.setdefault(b, []).append(i)

    def __len__(self) -> int:
        return sum(
            (len(v) + self.batch_size - 1) // self.batch_size
            for v in self.by_bucket.values()
        )

    def epoch(self, shuffle: bool = True) -> Iterator[Tuple[PaddedGraph, Tuple]]:
        batches = []
        for b, idxs in self.by_bucket.items():
            order = np.array(idxs)
            if shuffle:
                self._rng.shuffle(order)
            for lo in range(0, len(order), self.batch_size):
                batches.append((b, order[lo : lo + self.batch_size]))
        if shuffle:
            self._rng.shuffle(batches)

        for (mn, me), idxs in batches:
            graphs = []
            xi = np.zeros((self.batch_size, mn, 96), np.float32)
            pn = np.zeros((self.batch_size, mn, 256), np.float32)
            rn = np.zeros((self.batch_size, mn, 256), np.float32)
            lp = np.zeros((self.batch_size, mn), bool)
            rp = np.zeros((self.batch_size, mn), bool)
            for slot, i in enumerate(idxs):
                w, enc = self.items[i]
                graphs.append(
                    pad_graph(
                        pose=w.pose, edge_src=w.edge_src, edge_dst=w.edge_dst,
                        edge_attr=w.edge_attr, node_time=w.node_time,
                        node_class=w.node_class, max_nodes=mn, max_edges=me,
                        edge_label=w.edge_label, edge_weight=w.edge_weight,
                        include_modalities=False,
                    )
                )
                n = w.num_nodes
                di = w.det_index
                xi[slot, :n] = enc["x_img"][di]
                pn[slot, :n] = enc["pn"][di]
                rn[slot, :n] = enc["rn"][di]
                lp[slot, :n] = enc["lidar_present"][di]
                rp[slot, :n] = enc["radar_present"][di]
            while len(graphs) < self.batch_size:
                graphs.append(empty_graph(mn, me, include_modalities=False))
            # numpy staging end to end — one device transfer per field at
            # the jit boundary (graph.batch_graphs rationale)
            yield batch_graphs(graphs), (xi, pn, rn, lp, rp)
