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
import os
from typing import Any, Dict, Iterator, List, NamedTuple, Optional, Sequence, Tuple

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
            # dtype-preserving: a uint8 crop assigned into an f32 buffer
            # would carry 0..255 floats past the model's uint8-gated /255
            buf = np.zeros(
                (chunk, *tail), arr.dtype if arr is not None else np.float32
            )
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


def _encoder_digest(model, variables) -> str:
    """Digest of the frozen-encoder parameter subtrees — keys the on-disk
    encoding caches so a re-grafted encoder checkpoint invalidates them."""
    from batch3dmot_tpu.infer.aot import pytree_digest

    params = dict(variables).get("params", {})
    stats = dict(variables).get("batch_stats", {})
    subtrees = {
        name: (params.get(name), stats.get(name))
        for name in ("resnet", "pointnet", "radarnet")
        if name in params
    }
    return pytree_digest(subtrees)


def store_detection_count(store_path: str) -> Optional[int]:
    """Detection-row count from the store's metadata sidecar
    (``<scene>_metadata.json``, one entry per detection — written by
    ``save_scene_graphs``). None when the store has no readable sidecar
    (non-CLI callers with custom scene loaders)."""
    import json

    meta_path = store_path.replace(".b3d", "_metadata.json")
    try:
        with open(meta_path) as f:
            return len(json.load(f))
    except Exception:
        return None


def probe_scene_encoding_cache(
    store_path: str, digest: str, expected_rows: Optional[int] = None,
    load: bool = True,
):
    """Validity probe for ``<store>.enc.npz``: the cache must exist, be
    readable, carry this encoder ``digest``, and (when the store's row
    count is known) agree with it — the digest keys the ENCODERS only, so
    a store rebuilt in place at a different density would otherwise
    silently misalign every row. Returns the encoding dict (``load=True``)
    or ``True`` (``load=False``, a cheap header/key check that does not
    materialize arrays); ``None`` when absent or invalid. Stale/unreadable
    caches are reported loudly — every consumer (training recompute,
    predict raw-path fallback) wants the operator to know."""
    cache_path = f"{store_path}.enc.npz"
    if not os.path.exists(cache_path):
        return None
    try:
        with np.load(cache_path, allow_pickle=False) as z:
            if str(z["digest"]) != digest:
                return None
            if expected_rows is not None and len(z["x_img"]) != expected_rows:
                print(
                    f"encodings: ignoring stale embedding cache {cache_path} "
                    f"({len(z['x_img'])} rows vs {expected_rows} store "
                    "detections — the store was rebuilt in place)"
                )
                return None
            return {k: z[k] for k in ENC_KEYS} if load else True
    except Exception as e:
        # corrupt/foreign npz: writes are atomic (os.replace) but the
        # disk is not trusted
        print(
            f"encodings: ignoring unreadable embedding cache {cache_path} "
            f"({e})"
        )
        return None


def scene_encodings_cached(
    model, variables, store_path: str, scene_loader, cache: bool = True,
    digest: Optional[str] = None, expected_rows: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Per-scene encoding table, persisted next to the ``.b3d`` store as
    ``<store>.enc.npz`` keyed by the frozen-encoder digest (round-3: lets
    ``--encoded`` training stream scene-by-scene and restart without
    re-encoding; the reference has no equivalent — it re-encodes every
    window every epoch, ``clr_att_gnn.py:125-141``).

    ``digest``: pass the precomputed encoder digest when calling per scene —
    recomputing it here costs a device fetch per call. ``expected_rows``:
    the store's detection count; defaults to the metadata sidecar's row
    count so EVERY caller (streaming training, dedup materialization,
    predict cache-write) rejects a digest-matching cache whose row count
    disagrees — a store rebuilt in place (e.g. at a different density)
    is recomputed, not trusted."""
    if digest is None:
        digest = _encoder_digest(model, variables)
    if expected_rows is None:
        expected_rows = store_detection_count(store_path)
    if cache:
        hit = probe_scene_encoding_cache(store_path, digest, expected_rows)
        if hit is not None:
            return hit
    cache_path = f"{store_path}.enc.npz"
    scene = scene_loader(store_path)
    enc = precompute_scene_encodings(model, variables, scene)
    if cache:
        # atomic via rename; np.savez appends '.npz' unless present
        tmp = f"{cache_path}.{os.getpid()}.tmp.npz"
        np.savez(tmp, digest=digest, **enc)
        os.replace(tmp, cache_path)
    return enc


ENC_KEYS = ("x_img", "pn", "rn", "lidar_present", "radar_present")


class StreamingEncodedBatcher:
    """Scene-streaming variant of :class:`EncodedGraphBatcher`.

    Memory is bounded by ONE scene: window sizes are indexed from the store
    headers alone (``GraphStoreReader.window_sizes``), each epoch walks the
    scenes in shuffled order, and a scene's windows + encoding table are
    only resident while its batches are being emitted. Encoding tables are
    computed once and persisted via :func:`scene_encodings_cached`.

    The trade-off vs the in-RAM batcher is shuffle granularity: windows
    shuffle within a scene and scenes shuffle across the epoch, but one
    batch never mixes scenes (the reference's DataLoader shuffles globally;
    at ~36 windows/scene and batch size 2 the gradient-noise difference is
    negligible while memory drops from O(dataset) to O(scene)).
    """

    def __init__(
        self,
        store_paths: Sequence[str],
        model,
        variables,
        scene_loader,
        batch_size: int,
        buckets: Sequence[Tuple[int, int]] = DEFAULT_BUCKETS,
        seed: int = 0,
        uniform: bool = False,
        cache: bool = True,
    ):
        from batch3dmot_tpu.io.store import GraphStoreReader

        self.batch_size = batch_size
        self.model = model
        # own COPY of the (frozen-encoder) variables: scenes are encoded
        # lazily DURING training, and the trainer's step donates its state
        # buffers — holding the caller's arrays would hit
        # 'Array has been deleted' on the second scene
        self.variables = jax.tree.map(lambda x: jnp.array(x), variables)
        self.scene_loader = scene_loader
        self.cache = cache
        # digest once per batcher, not per scene per epoch: each
        # _encoder_digest call fetches the packed encoder bytes (one relay
        # round trip; docs/RESULTS.md round 5 "the 95 s digest fetch")
        self._digest = _encoder_digest(model, self.variables)
        self._rng = np.random.default_rng(seed)
        self.store_paths = list(store_paths)
        # header-only size index (no array data loaded)
        self._sizes = []
        all_sizes = []
        for p in self.store_paths:
            nodes, edges = GraphStoreReader(p).window_sizes()
            self._sizes.append((nodes, edges))
            all_sizes.extend(
                (n, e) for n, e in zip(nodes, edges) if n > 0 and e > 0
            )
        if uniform:
            from batch3dmot_tpu.train.data import uniform_bucket

            buckets = uniform_bucket(all_sizes, buckets)
        self.buckets = tuple(buckets)

    def __len__(self) -> int:
        total = 0
        for nodes, edges in self._sizes:
            by_bucket: Dict[Tuple[int, int], int] = {}
            for n, e in zip(nodes, edges):
                if n > 0 and e > 0:
                    b = pick_bucket(n, e, self.buckets)
                    by_bucket[b] = by_bucket.get(b, 0) + 1
            total += sum(
                (c + self.batch_size - 1) // self.batch_size
                for c in by_bucket.values()
            )
        return total

    def epoch(self, shuffle: bool = True) -> Iterator[Tuple[PaddedGraph, Tuple]]:
        from batch3dmot_tpu.io.store import GraphStoreReader

        scene_order = np.arange(len(self.store_paths))
        if shuffle:
            self._rng.shuffle(scene_order)
        for si in scene_order:
            path = self.store_paths[si]
            nodes, edges = self._sizes[si]
            live = [i for i in range(len(nodes)) if nodes[i] > 0 and edges[i] > 0]
            if not live:
                continue
            enc = scene_encodings_cached(
                self.model, self.variables, path, self.scene_loader,
                self.cache, digest=self._digest,
            )
            reader = GraphStoreReader(path)
            by_bucket: Dict[Tuple[int, int], List[int]] = {}
            for i in live:
                b = pick_bucket(nodes[i], edges[i], self.buckets)
                by_bucket.setdefault(b, []).append(i)
            scene_batches = []
            for b, idxs in by_bucket.items():
                order = np.array(idxs)
                if shuffle:
                    self._rng.shuffle(order)
                for lo in range(0, len(order), self.batch_size):
                    scene_batches.append((b, order[lo : lo + self.batch_size]))
            if shuffle:
                self._rng.shuffle(scene_batches)
            for (mn, me), idxs in scene_batches:
                windows = [reader.window(int(i)) for i in idxs]
                yield _assemble_encoded_batch(
                    windows, [enc] * len(windows), self.batch_size, mn, me
                )
            del reader, enc  # scene residency ends here


def _assemble_encoded_batch(windows, encs, batch_size, mn, me):
    """Fixed-shape (PaddedGraph, encoding-tuple) batch from window/enc
    pairs (shared by the in-RAM and streaming batchers)."""
    graphs = []
    xi = np.zeros((batch_size, mn, 96), np.float32)
    pn = np.zeros((batch_size, mn, 256), np.float32)
    rn = np.zeros((batch_size, mn, 256), np.float32)
    lp = np.zeros((batch_size, mn), bool)
    rp = np.zeros((batch_size, mn), bool)
    for slot, (w, enc) in enumerate(zip(windows, encs)):
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
    while len(graphs) < batch_size:
        graphs.append(empty_graph(mn, me, include_modalities=False))
    # numpy staging end to end — one device transfer per field at the jit
    # boundary (graph.batch_graphs rationale)
    return batch_graphs(graphs), (xi, pn, rn, lp, rp)


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
            pairs = [self.items[i] for i in idxs]
            yield _assemble_encoded_batch(
                [w for w, _ in pairs], [e for _, e in pairs],
                self.batch_size, mn, me,
            )


def materialize_encoded_datasets(
    windows_with_encodings, buckets=DEFAULT_BUCKETS
):
    """List of device-resident dataset groups, one per occupied bucket
    (``train.data.group_sizes_by_bucket``); ``GNNTrainer.fit_device``
    runs one scanned program per group per epoch."""
    from batch3dmot_tpu.train.data import group_sizes_by_bucket

    items = [
        (w, e)
        for (w, e) in windows_with_encodings
        if w.num_nodes > 0 and w.num_edges > 0
    ]
    assert items, "materialize_encoded_datasets: no non-empty windows"
    groups = group_sizes_by_bucket(
        [(w.num_nodes, w.num_edges) for w, _ in items], buckets
    )
    return [
        materialize_encoded_dataset([items[i] for i in idxs], bucket=b)
        for b, idxs in groups
    ]


class DedupEncodings(NamedTuple):
    """Device-resident encodings in DEDUPLICATED form.

    The dense materializer stores per-WINDOW gathered encoding buffers
    ``[W+1, mn, 608]`` — every detection's embedding duplicated once per
    window it appears in (~L copies at window length L, plus node padding
    to ``mn``). This form keeps ONE global per-detection table and gathers
    rows ON DEVICE inside the scanned epoch instead: at trainval L=5
    density it is the difference between a dataset that cannot fit one
    chip's HBM (~12 GiB encodings for 550 scenes) and one that can
    (~2 GiB), i.e. between streaming at per-batch relay cost and
    device-resident epochs. NamedTuple => a JAX pytree, so it rides
    through ``jax.jit``/``device_put`` unchanged.
    """

    # [W+1, mn] int32 rows into ``table`` (padded node slots and the empty
    # window point at the all-zero row D)
    det_index: Any
    # (x_img [D+1,96], pn [D+1,256], rn [D+1,256],
    #  lidar_present [D+1] bool, radar_present [D+1] bool)
    table: Tuple[Any, Any, Any, Any, Any]


def build_encoding_table(encs: Sequence[Dict[str, np.ndarray]]):
    """Concatenate DISTINCT per-scene encoding tables (dedup by object
    identity — windows of one scene share their scene's dict) into one
    global table with an all-zero row appended at index D.

    Returns ``(table_tuple, {id(enc): row_offset}, D)``.
    """
    offsets: Dict[int, int] = {}
    uniq: List[Dict[str, np.ndarray]] = []
    total = 0
    for enc in encs:
        if id(enc) in offsets:
            continue
        offsets[id(enc)] = total
        uniq.append(enc)
        total += len(enc["x_img"])
    tails = {"x_img": (96,), "pn": (256,), "rn": (256,),
             "lidar_present": (), "radar_present": ()}
    dtypes = {"lidar_present": bool, "radar_present": bool}
    table = tuple(
        np.concatenate(
            [np.asarray(e[k]) for e in uniq]
            + [np.zeros((1, *tails[k]), dtypes.get(k, np.float32))]
        )
        for k in ENC_KEYS
    )
    return table, offsets, total


def _padded_window(w: WindowGraphArrays, mn: int, me: int) -> PaddedGraph:
    return pad_graph(
        pose=w.pose, edge_src=w.edge_src, edge_dst=w.edge_dst,
        edge_attr=w.edge_attr, node_time=w.node_time,
        node_class=w.node_class, max_nodes=mn, max_edges=me,
        edge_label=w.edge_label, edge_weight=w.edge_weight,
        include_modalities=False,
    )


def materialize_encoded_dataset_dedup(
    windows_with_encodings: Sequence[
        Tuple[WindowGraphArrays, Dict[str, np.ndarray]]
    ],
    buckets: Sequence[Tuple[int, int]] = DEFAULT_BUCKETS,
    bucket: Optional[Tuple[int, int]] = None,
    _shared: Optional[Tuple] = None,
) -> Tuple[PaddedGraph, DedupEncodings, Tuple[int, int]]:
    """:func:`materialize_encoded_dataset` with the encodings in
    :class:`DedupEncodings` form (same training numbers — the device-side
    double gather returns the identical rows the dense form pre-gathered
    on host). ``_shared`` threads a prebuilt ``(table, offsets, D)``
    through the per-bucket plural form so every group references ONE
    table object (uploaded once by ``GNNTrainer._upload_dataset_groups``).
    """
    from batch3dmot_tpu.train.data import single_bucket_for

    items = [
        (w, e)
        for (w, e) in windows_with_encodings
        if w.num_nodes > 0 and w.num_edges > 0
    ]
    assert items, "materialize_encoded_dataset_dedup: no non-empty windows"
    mn, me = bucket or single_bucket_for(
        [(w.num_nodes, w.num_edges) for w, _ in items], buckets
    )
    table, offsets, D = _shared or build_encoding_table(
        [e for _, e in items]
    )

    W = len(items)
    g0 = batch_graphs([_padded_window(items[0][0], mn, me)])
    graphs = jax.tree.map(
        lambda a: np.zeros((W + 1, *a.shape[1:]), a.dtype), g0
    )
    det_index = np.full((W + 1, mn), D, np.int32)

    def fill(k, g1):
        jax.tree.map(lambda dst, src: dst.__setitem__(k, src[0]), graphs, g1)

    fill(0, g0)
    det_index[0, : items[0][0].num_nodes] = (
        offsets[id(items[0][1])] + items[0][0].det_index
    )
    for k, (w, e) in enumerate(items[1:], start=1):
        fill(k, batch_graphs([_padded_window(w, mn, me)]))
        det_index[k, : w.num_nodes] = offsets[id(e)] + w.det_index
    fill(W, batch_graphs([empty_graph(mn, me, include_modalities=False)]))
    return graphs, DedupEncodings(det_index, table), (mn, me)


def materialize_encoded_datasets_dedup(
    windows_with_encodings, buckets=DEFAULT_BUCKETS
):
    """Per-bucket groups (``materialize_encoded_datasets``) in dedup form;
    all groups share ONE encoding table object."""
    from batch3dmot_tpu.train.data import group_sizes_by_bucket

    items = [
        (w, e)
        for (w, e) in windows_with_encodings
        if w.num_nodes > 0 and w.num_edges > 0
    ]
    assert items, "materialize_encoded_datasets_dedup: no non-empty windows"
    shared = build_encoding_table([e for _, e in items])
    groups = group_sizes_by_bucket(
        [(w.num_nodes, w.num_edges) for w, _ in items], buckets
    )
    return [
        materialize_encoded_dataset_dedup(
            [items[i] for i in idxs], bucket=b, _shared=shared
        )
        for b, idxs in groups
    ]


def materialize_encoded_dataset(
    windows_with_encodings: Sequence[
        Tuple[WindowGraphArrays, Dict[str, np.ndarray]]
    ],
    buckets: Sequence[Tuple[int, int]] = DEFAULT_BUCKETS,
    bucket: Optional[Tuple[int, int]] = None,
) -> Tuple[PaddedGraph, Tuple, Tuple[int, int]]:
    """The whole encoded dataset as ONE stacked pytree for DEVICE-RESIDENT
    training (``GNNTrainer.fit_device``): every window padded to a single
    uniform bucket and stacked on a leading [W+1] axis (numpy — the
    trainer uploads once), with an EMPTY window appended at index W so
    remainder batches can be padded with a fully-masked slot (exact: the
    loss masks it to zero, same as the host batcher's empty-graph fill).

    Rationale: the per-epoch host->device batch transfer dominates wall
    time on remote-relay TPU deployments (~3 MB/step re-shipped every
    epoch through a ~40 MB/s link, CLAUDE.md relay economics) even though
    the dataset is STATIC. Returns (graphs [W+1, ...], encodings tuple
    [W+1, ...], bucket)."""
    from batch3dmot_tpu.train.data import single_bucket_for

    items = [
        (w, e)
        for (w, e) in windows_with_encodings
        if w.num_nodes > 0 and w.num_edges > 0
    ]
    assert items, "materialize_encoded_dataset: no non-empty windows"
    mn, me = bucket or single_bucket_for(
        [(w.num_nodes, w.num_edges) for w, _ in items], buckets
    )

    # fill preallocated [W+1, ...] buffers row by row — building W+1
    # single-window batches and concatenating would transiently double
    # the dataset's host RAM at exactly the scale this feature targets
    W = len(items)

    def alloc(a):
        return np.zeros((W + 1, *a.shape[1:]), a.dtype)

    g0, e0 = _assemble_encoded_batch([items[0][0]], [items[0][1]], 1, mn, me)
    graphs = jax.tree.map(alloc, g0)
    encs = tuple(alloc(a) for a in e0)

    def fill(k, g1, e1):
        jax.tree.map(lambda dst, src: dst.__setitem__(k, src[0]), graphs, g1)
        for dst, src in zip(encs, e1):
            dst[k] = src[0]

    fill(0, g0, e0)
    for k, (w, e) in enumerate(items[1:], start=1):
        fill(k, *_assemble_encoded_batch([w], [e], 1, mn, me))
    fill(W, *_assemble_encoded_batch([], [], 1, mn, me))  # empty slot
    return graphs, encs, (mn, me)
