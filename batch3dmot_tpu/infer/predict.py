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
    TRACKING_CLASS_NAMES,
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


def _pad_detection_count(m: int) -> int:
    """Padded per-scene detection count for the encode-once batch.

    Multiples of 64 below 512 (fine enough that small demo/mini scenes don't
    pay up to 2x encoder waste, coarse enough to bound compile-cache
    variants), multiples of 256 above (trainval scenes run thousands of
    detections — 256 keeps the variant count low at <2% waste). Every value
    divides the usual mesh sizes (2/4/8/16/32/64) for sharded encodes.
    """
    if m <= 512:
        return max(64, -(-m // 64) * 64)
    return -(-m // 256) * 256


def make_scorer(model, variables, mesh=None, fused="auto") -> Callable:
    """A jitted batched scorer: PaddedGraph[B, ...] -> scores [B, E].

    With ``mesh`` the window batch dimension is sharded across the data axis
    (multi-chip inference; params replicated, no collectives needed — each
    device scores its window shard independently over ICI-free SPMD).
    ``fused='auto'`` uses the fused Pallas MP kernel on-device (single-chip,
    'noop' knn-conv mode) for both model families.
    """
    from_logits = type(model).__name__ == "PoseGNN"

    if fused == "auto":
        fused = (
            jax.default_backend() != "cpu"
            and mesh is None
            and getattr(model, "knn_conv_mode", "") == "noop"
        )
    interpret = jax.default_backend() == "cpu"

    shard = None
    if mesh is not None:
        from batch3dmot_tpu.parallel import replicate, shard_batch_fn

        variables = replicate(variables, mesh)
        shard = shard_batch_fn(mesh)

    # variables enter as a jit ARGUMENT, never a closure: closure-captured
    # device arrays are embedded as HLO constants, and lowering fetches each
    # leaf back to the host — ~0.9 s per leaf through this TPU relay, ~200 s
    # per compiled shape for the full model (scripts/profile_predict.py).
    @jax.jit
    def run(variables, batch):
        from batch3dmot_tpu.ops.pallas_mp import fused_supported

        if fused and fused_supported(
            batch.pose.shape[1], batch.edge_src.shape[1],
            batch.pose.shape[0],
        ):
            from batch3dmot_tpu.ops.pallas_mp import (
                fused_logits_pose,
                fused_scores_full,
            )

            if from_logits:
                return jax.nn.sigmoid(
                    fused_logits_pose(model, variables, batch, interpret=interpret)
                )
            return fused_scores_full(model, variables, batch, interpret=interpret)
        scores, _ = jax.vmap(lambda g: model.apply(variables, g))(batch)
        if from_logits:
            scores = jax.nn.sigmoid(scores)
        return scores

    if shard is None:
        return lambda batch: run(variables, batch)
    return lambda batch: run(variables, shard(batch))


def make_scene_encoded_scorer(
    model, variables, mesh=None, fused="auto", encode_dtype=None
) -> "SceneEncodedScorer":
    """Encode-once inference for the multimodal GNN.

    The reference re-runs the frozen encoders on every node of every window,
    so a detection appearing in L overlapping windows is encoded L times
    (``predict.py:172-197``) — and the encoders are where the FLOPs are.
    Here all detections of a scene are encoded in ONE dense device batch and
    the per-window forwards gather the embeddings by detection index.
    """
    return SceneEncodedScorer(
        model, variables, mesh=mesh, fused=fused, encode_dtype=encode_dtype
    )


class SceneEncodedScorer:
    def __init__(self, model, variables, mesh=None, fused="auto",
                 encode_dtype=None, embedding_dtype="float16"):
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            # multi-chip: params + scene encodings replicated, the window
            # batch dim sharded — each device scores its window shard with
            # no collectives (pure SPMD over the data axis).
            from batch3dmot_tpu.parallel import replicate, shard_batch_fn

            variables = replicate(variables, mesh)
            self._shard = shard_batch_fn(mesh)
            self._replicate = lambda tree: replicate(tree, mesh)
        else:
            self._shard = lambda x: x
            self._replicate = lambda x: x
        self.variables = variables

        # Fused Pallas message-passing kernel (ops/pallas_mp.py): ~1.6x the
        # XLA forward at pipeline buckets on the real chip. auto = on-device
        # single-chip MultimodalGNN in the reference 'noop' knn-conv mode.
        if fused == "auto":
            fused = (
                jax.default_backend() != "cpu"
                and mesh is None
                and type(model).__name__ == "MultimodalGNN"
                and getattr(model, "knn_conv_mode", "") == "noop"
            )
        self.fused = bool(fused)
        interpret = jax.default_backend() == "cpu"

        # Optional reduced-precision encode: the frozen encoders are the
        # FLOPs-heavy stage (PointNet/RadarNet 128->1024 point MLPs) and are
        # MXU matmuls end to end, so bf16 halves their time; embeddings are
        # cast back to f32 for the message-passing stage. Presence flags are
        # computed from the f32 inputs (a bf16 sum could round a tiny cloud
        # to zero). Default None keeps full f32 (bit-parity with the
        # reference's CPU inference, docs/PARITY.md).
        import jax.numpy as jnp

        enc_dtype = jnp.dtype(encode_dtype) if encode_dtype else None
        self.encode_dtype = enc_dtype

        # variables enter the jitted fns as ARGUMENTS, never closures:
        # closure-captured device arrays become HLO constants, and lowering
        # fetches every leaf back to the host — ~0.9 s per leaf through this
        # TPU relay, ~200 s per compiled shape for the full model
        # (scripts/profile_predict.py). As arguments they also keep the
        # persistent compile cache checkpoint-independent. The optional
        # reduced-precision cast happens INSIDE the jit (an eager tree-wide
        # cast would pay relay latency per leaf, and XLA dead-code-eliminates
        # the casts of the non-encoder subtrees).
        @jax.jit
        def encode(variables, img, lidar, radar):
            lp = (lidar.sum(axis=(1, 2)) != 0)
            rp = (radar.sum(axis=(1, 2)) != 0)
            if enc_dtype is not None:
                variables = jax.tree.map(
                    lambda x: x.astype(enc_dtype)
                    if hasattr(x, "dtype") and x.dtype == jnp.float32
                    else x,
                    variables,
                )
                # uint8 crops must take their /255 here (the model's
                # uint8-gated conversion won't see uint8 after this cast)
                img = (
                    img.astype(enc_dtype) / 255.0
                    if img.dtype == jnp.uint8
                    else img.astype(enc_dtype)
                )
                lidar = lidar.astype(enc_dtype)
                radar = radar.astype(enc_dtype)
            x_img, pn, rn = model.apply(
                variables, img, lidar, radar, method=model.encode_frozen
            )
            f32 = jnp.float32
            return x_img.astype(f32), pn.astype(f32), rn.astype(f32), lp, rp

        def fwd_inner(variables, batch, det_index, enc):
            from batch3dmot_tpu.ops.pallas_mp import fused_supported

            x_img, pn, rn, lp, rp = enc

            if self.fused and fused_supported(
                batch.pose.shape[1], batch.edge_src.shape[1],
                batch.pose.shape[0],
            ):
                from batch3dmot_tpu.ops.pallas_mp import (
                    fused_scores_from_encodings,
                )

                return fused_scores_from_encodings(
                    model, variables, batch,
                    x_img[det_index], pn[det_index], rn[det_index],
                    lp[det_index], rp[det_index], interpret=interpret,
                )

            def one(g, idx):
                scores, _ = model.apply(
                    variables,
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

        fwd = jax.jit(fwd_inner)

        # Scanned multi-batch forward for cross-scene grouped scoring:
        # batches' leaves carry a leading [NB] stack dimension and all NB
        # window batches are scored in ONE dispatch (lax.scan keeps the
        # fused Pallas kernel on its single-batch shape — vmap cannot, see
        # docs/KERNELS.md). One program + one fetch per scene GROUP instead
        # of one round trip per window batch: through the TPU relay each
        # round trip costs ~0.1-1 s, which dominates multi-scene predict.
        @jax.jit
        def fwd_stack(variables, batches, det_indices, enc):
            def step(carry, bd):
                b, di = bd
                return carry, fwd_inner(variables, b, di, enc)

            _, scores = jax.lax.scan(step, 0, (batches, det_indices))
            return scores

        # Cached-embedding path: re-runs upload the persisted 608-d
        # frozen-encoder outputs (train/encoded.scene_encodings_cached,
        # digest-keyed) instead of raw crops+points — at f16 that is
        # ~1.2 KB/det vs ~4.4 KB/det raw, a ~3.6x cut of the per-scene
        # upload wall (docs/RESULTS.md round 4 declared it the binding
        # constraint), and it skips the encoder FLOPs entirely. The
        # embeddings themselves were computed by the SAME encoders (the
        # digest pins that), so transport rounding is the main difference
        # vs the encode-on-device path; "float32" transport is bit-exact
        # vs raw only at predict.point_dtype=float32 (caches encode
        # full-precision points; the default raw path encodes f16-rounded
        # ones — a ~1e-5 relative residual).
        self.embedding_dtype = np.dtype(embedding_dtype or np.float32)

        @jax.jit
        def upcast(x_img, pn, rn, lp, rp):
            f32 = jnp.float32
            return (x_img.astype(f32), pn.astype(f32), rn.astype(f32),
                    lp, rp)

        self._encode = lambda *a: encode(self.variables, *a)
        self._upcast = upcast
        self._fwd = lambda *a: fwd(self.variables, *a)
        self._fwd_stack = lambda *a: fwd_stack(self.variables, *a)

    def _enc_from_tables(self, encs, m_pad: int, shard_m, G=None):
        """Device encoding tuple from PRECOMPUTED per-scene encoding dicts
        (``train.encoded.ENC_KEYS`` layout), scene g's rows at offset
        ``g * m_pad`` — the exact row layout the grouped raw-modality
        encode produces, so the window forwards are unchanged. ``G`` pads
        the group dimension (program-shape pinning, as the raw path's
        ``group_pad``); surplus rows stay the all-zero absent encoding."""
        import jax.numpy as jnp

        from batch3dmot_tpu.train.encoded import ENC_DIMS

        G = G or len(encs)
        assert len(encs) <= G, (len(encs), G)
        parts = []
        for k in ("x_img", "pn", "rn"):
            buf = np.zeros((G * m_pad, ENC_DIMS[k]), self.embedding_dtype)
            for g, e in enumerate(encs):
                rows = np.asarray(e[k])
                assert len(rows) <= m_pad, (k, len(rows), m_pad)
                buf[g * m_pad : g * m_pad + len(rows)] = rows
            parts.append(buf)
        for k in ("lidar_present", "radar_present"):
            buf = np.zeros((G * m_pad,), bool)
            for g, e in enumerate(encs):
                rows = np.asarray(e[k])
                buf[g * m_pad : g * m_pad + len(rows)] = rows
            parts.append(buf)
        return self._replicate(
            self._upcast(*(shard_m(jnp.asarray(p)) for p in parts))
        )

    def score_scene(
        self,
        scene: "SceneDetections",
        windows: Sequence[WindowGraphArrays],
        windows_per_batch: int = 8,
        buckets=DEFAULT_BUCKETS,
        m_pad: Optional[int] = None,
        encodings: Optional[Dict[str, np.ndarray]] = None,
    ) -> List[np.ndarray]:
        """``m_pad``/``buckets`` pin the program shapes; multi-scene callers
        should pass run-global values (every distinct shape is a separate
        compiled program, and on relay-attached deployments each program
        load costs seconds — see cli._run_predict). ``encodings`` (the
        ``train.encoded.ENC_KEYS`` per-scene dict) skips the raw-modality
        upload + device encode entirely (see ``_enc_from_tables``)."""
        import jax.numpy as jnp

        m = scene.num_detections
        if m_pad is None:
            m_pad = _pad_detection_count(m)
        assert m_pad >= m, (m_pad, m)

        def padm(a, shape_tail):
            # source dtype preserved: uint8 crops upload at 1 byte/px
            out = np.zeros(
                (m_pad, *shape_tail),
                a.dtype if a is not None else np.float32,
            )
            if a is not None and m:
                out[:m] = a
            return jnp.asarray(out)

        from batch3dmot_tpu.graph import IMG_SHAPE, LIDAR_SHAPE, RADAR_SHAPE

        if self.mesh is not None and windows_per_batch % self.mesh.size:
            windows_per_batch = (
                -(-windows_per_batch // self.mesh.size) * self.mesh.size
            )
        # encode inputs shard only when m_pad divides the mesh (m_pad is a
        # multiple of 64; odd mesh sizes replicate the encode instead)
        shard_m = (
            self._shard if self.mesh is None or m_pad % self.mesh.size == 0
            else self._replicate
        )
        if encodings is not None:
            enc = self._enc_from_tables([encodings], m_pad, shard_m)
        else:
            enc = self._encode(
                shard_m(padm(scene.img, IMG_SHAPE)),
                shard_m(padm(scene.lidar, LIDAR_SHAPE)),
                shard_m(padm(scene.radar, RADAR_SHAPE)),
            )
            # window forwards gather arbitrary detection rows -> encodings
            # must be fully replicated (one all-gather per scene)
            enc = self._replicate(enc)

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
                        self._shard(batch_graphs(graphs)),
                        self._shard(jnp.asarray(np.stack(dets))),
                        enc,
                    )
                )
                for slot, i in enumerate(chunk):
                    results[i] = scores[slot, : windows[i].num_edges]
        return results  # type: ignore[return-value]

    def dispatch_scenes(
        self,
        scenes: Sequence["SceneDetections"],
        windows_list: Sequence[Sequence[WindowGraphArrays]],
        windows_per_batch: int = 8,
        buckets=DEFAULT_BUCKETS,
        m_pad: Optional[int] = None,
        group_pad: Optional[int] = None,
        num_batches: Optional[int] = None,
        encodings_list: Optional[Sequence[Dict[str, np.ndarray]]] = None,
    ):
        """Upload + enqueue WITHOUT the fetch (see
        :meth:`DeviceScenePipeline.dispatch_scene` for why): returns an
        opaque pending object for :meth:`finalize_scenes`, letting the
        caller overlap the next group's host->device transfer with this
        group's device compute. Cross-scene grouped scoring: ONE encode
        dispatch for the whole
        scene group (detections stacked at ``g * m_pad`` row offsets) and ONE
        scanned scoring dispatch + fetch per bucket, pooling every scene's
        windows into shared batches.

        The reference amortizes per-scene overhead by fanning scenes out over
        a ray pool (``predict.py:636-650``); here the per-scene cost is relay
        round trips, so the fan-in is batching: per group of G scenes this
        path pays ~3 round trips where :meth:`score_scene` pays
        ``G * (1 + ceil(windows / windows_per_batch) * 2)``.

        ``group_pad``/``m_pad``/``num_batches`` pin the program shapes —
        multi-group callers should pass run-global values so every group
        reuses one compiled program (each distinct shape costs seconds of
        executable load through a relay). Returns per-scene lists of
        per-window score arrays, identical to :meth:`score_scene`.
        """
        import jax.numpy as jnp

        if self.mesh is not None:
            # multi-chip: shard the WINDOW batch dim — axis 1 of the scanned
            # [NB, B, ...] stack (the scan axis NB stays replicated; each
            # device scores its window shard of every scanned step, the same
            # collective-free SPMD shape as score_scene). Encodings and
            # params are replicated, so the per-window gathers stay local.
            from batch3dmot_tpu.parallel import shard_batch_fn

            if windows_per_batch % self.mesh.size:
                windows_per_batch = (
                    -(-windows_per_batch // self.mesh.size) * self.mesh.size
                )
            shard_stack = shard_batch_fn(self.mesh, axis=1)
        else:
            shard_stack = lambda x: x  # noqa: E731

        G = group_pad if group_pad is not None else len(scenes)
        assert len(scenes) <= G, (len(scenes), G)
        if m_pad is None:
            m_pad = max(
                _pad_detection_count(s.num_detections) for s in scenes
            )
        for s in scenes:
            assert m_pad >= s.num_detections, (m_pad, s.num_detections)

        from batch3dmot_tpu.graph import IMG_SHAPE, LIDAR_SHAPE, RADAR_SHAPE

        def padg(get, shape_tail):
            dts = {
                get(s).dtype for s in scenes if get(s) is not None
            } or {np.dtype(np.float32)}
            assert len(dts) == 1, f"mixed modality dtypes in group: {dts}"
            out = np.zeros((G * m_pad, *shape_tail), dts.pop())
            for g, s in enumerate(scenes):
                a = get(s)
                if a is not None and s.num_detections:
                    out[g * m_pad : g * m_pad + s.num_detections] = a
            return jnp.asarray(out)

        # encode inputs shard along the stacked G*m_pad row axis when the
        # mesh divides it (m_pad is a multiple of 64, so it always does for
        # the usual mesh sizes); the output is re-replicated because window
        # forwards gather arbitrary detection rows.
        shard_m = (
            self._shard
            if self.mesh is None or (G * m_pad) % self.mesh.size == 0
            else self._replicate
        )
        if encodings_list is not None:
            assert len(encodings_list) == len(scenes) and all(
                e is not None for e in encodings_list
            ), "encodings_list must cover every scene in the group"
            enc = self._enc_from_tables(
                list(encodings_list), m_pad, shard_m, G=G
            )
        else:
            enc = self._encode(
                shard_m(padg(lambda s: s.img, IMG_SHAPE)),
                shard_m(padg(lambda s: s.lidar, LIDAR_SHAPE)),
                shard_m(padg(lambda s: s.radar, RADAR_SHAPE)),
            )
            enc = self._replicate(enc)

        results: List[List[Optional[np.ndarray]]] = [
            [None] * len(ws) for ws in windows_list
        ]
        by_bucket: Dict[Tuple[int, int], List[Tuple[int, int]]] = defaultdict(
            list
        )
        for g, ws in enumerate(windows_list):
            for i, w in enumerate(ws):
                if w.num_nodes == 0 or w.num_edges == 0:
                    results[g][i] = np.zeros((0,), np.float32)
                    continue
                by_bucket[
                    pick_bucket(w.num_nodes, w.num_edges, buckets)
                ].append((g, i))

        fetches = []
        for (mn, me), idxs in by_bucket.items():
            nb = -(-len(idxs) // windows_per_batch)
            nb_pad = max(num_batches or nb, nb)
            graphs, dets = [], []
            for g, i in idxs:
                w = windows_list[g][i]
                graphs.append(
                    pad_graph(
                        pose=w.pose, edge_src=w.edge_src,
                        edge_dst=w.edge_dst, edge_attr=w.edge_attr,
                        node_time=w.node_time, node_class=w.node_class,
                        max_nodes=mn, max_edges=me,
                        edge_label=w.edge_label, edge_weight=w.edge_weight,
                        include_modalities=False,
                    )
                )
                di = np.zeros(mn, np.int32)
                di[: w.num_nodes] = w.det_index + g * m_pad
                dets.append(di)
            while len(graphs) < nb_pad * windows_per_batch:
                graphs.append(empty_graph(mn, me, include_modalities=False))
                dets.append(np.zeros(mn, np.int32))
            stacked = jax.tree.map(
                lambda x: x.reshape(nb_pad, windows_per_batch, *x.shape[1:]),
                batch_graphs(graphs),
            )
            det_stack = np.stack(dets).reshape(nb_pad, windows_per_batch, mn)
            fetches.append((
                idxs,
                self._fwd_stack(
                    shard_stack(stacked),
                    shard_stack(jnp.asarray(det_stack)),
                    enc,
                ),
            ))
        return results, fetches, windows_list, windows_per_batch

    def finalize_scenes(self, pending) -> List[List[np.ndarray]]:
        """Fetch + slice a :meth:`dispatch_scenes` result (blocks on the
        device programs and the relay transfers)."""
        results, fetches, windows_list, windows_per_batch = pending
        for idxs, dev in fetches:
            scores = np.asarray(dev)
            for pos, (g, i) in enumerate(idxs):
                b, slot = divmod(pos, windows_per_batch)
                results[g][i] = scores[
                    b, slot, : windows_list[g][i].num_edges
                ]
        return results  # type: ignore[return-value]

    def score_scenes(
        self,
        scenes: Sequence["SceneDetections"],
        windows_list: Sequence[Sequence[WindowGraphArrays]],
        windows_per_batch: int = 8,
        buckets=DEFAULT_BUCKETS,
        m_pad: Optional[int] = None,
        group_pad: Optional[int] = None,
        num_batches: Optional[int] = None,
        encodings_list=None,
    ) -> List[List[np.ndarray]]:
        """:meth:`dispatch_scenes` + :meth:`finalize_scenes` in one call."""
        return self.finalize_scenes(
            self.dispatch_scenes(
                scenes, windows_list, windows_per_batch, buckets,
                m_pad=m_pad, group_pad=group_pad, num_batches=num_batches,
                encodings_list=encodings_list,
            )
        )


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
                graphs.append(
                    empty_graph(mn, me, img_dtype=graphs[0].img.dtype)
                )
            scores = np.asarray(scorer(batch_graphs(graphs)))
            for slot, i in enumerate(chunk):
                results[i] = scores[slot, : windows[i].num_edges]
    return results  # type: ignore[return-value]


def average_edge_scores_raw(
    src: np.ndarray, dst: np.ndarray, scores: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized duplicate-edge averaging: unique (src, dst) pairs and the
    mean score of each, as arrays. One ``np.unique`` + two ``np.bincount``
    passes instead of a per-edge Python loop — on trainval-shaped inputs
    (~1e6 edge observations) this removes the serial host bottleneck."""
    if len(scores) == 0:
        z = np.zeros(0, np.int64)
        return z, z, np.zeros(0, np.float64)
    key = src.astype(np.int64) << 32 | dst.astype(np.int64)
    uniq, inv = np.unique(key, return_inverse=True)
    sums = np.bincount(inv, weights=scores.astype(np.float64))
    counts = np.bincount(inv)
    means = sums / counts
    return (uniq >> 32), (uniq & 0xFFFFFFFF), means


def average_edge_scores_arrays(
    src: np.ndarray, dst: np.ndarray, scores: np.ndarray
) -> Dict[Tuple[int, int], float]:
    """Dict view of :func:`average_edge_scores_raw` (kept for the per-scene
    edge-score JSON contract, reference ``predict.py:238-240``)."""
    ua, ub, means = average_edge_scores_raw(src, dst, scores)
    return {
        (int(a), int(b)): float(v)
        for a, b, v in zip(ua.tolist(), ub.tolist(), means.tolist())
    }


def average_scene_edges(
    windows: Sequence[WindowGraphArrays],
    window_scores: Sequence[np.ndarray],
) -> Dict[Tuple[int, int], float]:
    """Mean per-edge score across overlapping windows, keyed by scene-level
    (src_det_index, dst_det_index) (reference ``predict.py:199-227``)."""
    srcs, dsts, vals = [], [], []
    for w, s in zip(windows, window_scores):
        if len(s) == 0:
            continue
        srcs.append(w.det_index[w.edge_src])
        dsts.append(w.det_index[w.edge_dst])
        vals.append(np.asarray(s))
    if not srcs:
        return {}
    return average_edge_scores_arrays(
        np.concatenate(srcs), np.concatenate(dsts), np.concatenate(vals)
    )


def threshold_edges(
    avg_scores: Dict[Tuple[int, int], float],
    scene: SceneDetections,
    thresholds: Optional[Dict[str, float]] = None,
) -> Dict[Tuple[int, int], float]:
    """Keep edges whose mean score clears the per-class threshold of the
    source node's category (reference ``predict.py:231-233``)."""
    thresholds = thresholds or DEFAULT_EDGE_SCORE_THRESHOLDS
    out = {}
    for (a, b), v in avg_scores.items():
        cname = TRACKING_CLASS_NAMES[int(scene.class_id[a])]
        if v > thresholds[cname]:
            out[(a, b)] = v
    return out


def threshold_mask(
    src: np.ndarray,
    means: np.ndarray,
    class_id: np.ndarray,
    thresholds: Optional[Dict[str, float]] = None,
) -> np.ndarray:
    """Array form of :func:`threshold_edges`: boolean keep-mask over unique
    edges, thresholded by the source node's class."""
    thresholds = thresholds or DEFAULT_EDGE_SCORE_THRESHOLDS
    thr_by_id = np.zeros(max(TRACKING_CLASSES.values()) + 1)
    for name, cid in TRACKING_CLASSES.items():
        thr_by_id[cid] = thresholds[name]
    return means > thr_by_id[class_id[src]]


def greedy_round_arrays(
    src: np.ndarray, dst: np.ndarray, scores: np.ndarray
) -> np.ndarray:
    """Array form of :func:`greedy_round`: boolean mask keeping, per node,
    its best-scoring outgoing and incoming edge. First-occurrence-after-sort
    replaces the dict insertion race; ties resolve to the same edge the dict
    loop keeps (first seen wins on strictly-greater comparison, and the
    stable sort preserves input order within equal scores)."""
    k = len(scores)
    keep = np.zeros(k, bool)
    if k == 0:
        return keep
    # stable sort by descending score keeps input order among equals, so
    # "first index per node" == the dict loop's strictly-greater winner
    order = np.argsort(-scores, kind="stable")
    for nodes in (src, dst):
        n_sorted = nodes[order]
        _, first = np.unique(n_sorted, return_index=True)
        keep[order[first]] = True
    return keep


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
    buckets=DEFAULT_BUCKETS,
    m_pad: Optional[int] = None,
    encodings: Optional[Dict[str, np.ndarray]] = None,
):
    """Full per-scene edge pipeline: batched scoring -> cross-window
    averaging -> per-class thresholding -> greedy rounding.

    Returns (pred_edges, avg_scores) where pred_edges is the greedy-rounded
    [(det_i, det_j), score] list in scene detection indices. Multi-scene
    callers should pass run-global ``buckets``/``m_pad`` so every scene
    shares the same compiled programs (see SceneEncodedScorer.score_scene).
    """
    thresholds = (
        cfg.predict.edge_score_thresholds if cfg else DEFAULT_EDGE_SCORE_THRESHOLDS
    )
    wpb = cfg.predict.windows_per_batch if cfg else windows_per_batch
    if isinstance(scorer, SceneEncodedScorer):
        scores = scorer.score_scene(
            scene, windows, wpb, buckets, m_pad=m_pad, encodings=encodings
        )
    else:
        assert encodings is None, "encodings need a SceneEncodedScorer"
        scores = score_windows(scorer, windows, wpb, buckets)
    return aggregate_scene_edges(scene, windows, scores, thresholds)


def aggregate_scene_edges(
    scene: SceneDetections,
    windows: Sequence[WindowGraphArrays],
    scores: Sequence[np.ndarray],
    thresholds: Optional[Dict[str, float]] = None,
):
    """Cross-window averaging -> per-class thresholding -> greedy rounding
    for one scene's window scores (array-native: dicts only materialize for
    the small kept set and the edge-score JSON dump)."""
    srcs, dsts, vals = [], [], []
    for w, s in zip(windows, scores):
        if len(s) == 0:
            continue
        srcs.append(w.det_index[w.edge_src])
        dsts.append(w.det_index[w.edge_dst])
        vals.append(np.asarray(s))
    if not srcs:
        return [], {}
    usrc, udst, means = average_edge_scores_raw(
        np.concatenate(srcs), np.concatenate(dsts), np.concatenate(vals)
    )
    keep = threshold_mask(usrc, means, scene.class_id, thresholds)
    ks, kd, kv = usrc[keep], udst[keep], means[keep]
    sel = greedy_round_arrays(ks, kd, kv)
    pred_edges = [
        ((int(a), int(b)), float(v))
        for a, b, v in zip(ks[sel].tolist(), kd[sel].tolist(), kv[sel].tolist())
    ]
    avg = {
        (int(a), int(b)): float(v)
        for a, b, v in zip(usrc.tolist(), udst.tolist(), means.tolist())
    }
    return pred_edges, avg


def dispatch_predict_scenes(
    scorer: "SceneEncodedScorer",
    items: Sequence[Tuple[SceneDetections, Sequence[WindowGraphArrays]]],
    cfg: Optional[Config] = None,
    buckets=DEFAULT_BUCKETS,
    m_pad: Optional[int] = None,
    group_pad: Optional[int] = None,
    num_batches: Optional[int] = None,
    encodings_list: Optional[Sequence[Dict[str, np.ndarray]]] = None,
):
    """Upload + enqueue half of :func:`predict_scenes` (see
    ``SceneEncodedScorer.dispatch_scenes``): the CLI predict loop dispatches
    group i+1 while group i's fetch + aggregation run on a worker thread,
    overlapping the relay transfer with device compute."""
    thresholds = (
        cfg.predict.edge_score_thresholds if cfg else DEFAULT_EDGE_SCORE_THRESHOLDS
    )
    wpb = cfg.predict.windows_per_batch if cfg else 8
    pending = scorer.dispatch_scenes(
        [s for s, _ in items],
        [ws for _, ws in items],
        wpb,
        buckets,
        m_pad=m_pad,
        group_pad=group_pad,
        num_batches=num_batches,
        encodings_list=encodings_list,
    )
    return items, thresholds, pending


def finalize_predict_scenes(
    scorer: "SceneEncodedScorer", staged
) -> List[Tuple[list, dict]]:
    """Fetch + aggregate a :func:`dispatch_predict_scenes` result."""
    items, thresholds, pending = staged
    all_scores = scorer.finalize_scenes(pending)
    return [
        aggregate_scene_edges(scene, windows, scores, thresholds)
        for (scene, windows), scores in zip(items, all_scores)
    ]


def predict_scenes(
    scorer: "SceneEncodedScorer",
    items: Sequence[Tuple[SceneDetections, Sequence[WindowGraphArrays]]],
    cfg: Optional[Config] = None,
    buckets=DEFAULT_BUCKETS,
    m_pad: Optional[int] = None,
    group_pad: Optional[int] = None,
    num_batches: Optional[int] = None,
    encodings_list: Optional[Sequence[Dict[str, np.ndarray]]] = None,
) -> List[Tuple[list, dict]]:
    """Grouped form of :func:`predict_scene` over a scene batch: one grouped
    encode + one scanned scoring dispatch (``SceneEncodedScorer.score_scenes``)
    then per-scene aggregation. Returns ``[(pred_edges, avg_scores), ...]``
    in input order."""
    return finalize_predict_scenes(
        scorer,
        dispatch_predict_scenes(
            scorer, items, cfg, buckets,
            m_pad=m_pad, group_pad=group_pad, num_batches=num_batches,
            encodings_list=encodings_list,
        ),
    )
