"""Fully-fused device inference: graph construction + encoding + scoring in
ONE jitted program per scene.

The reference pipeline round-trips through the filesystem between every
stage (SURVEY.md §1: "control flow between layers is entirely through the
filesystem"). Here a scene goes device-side once: the sliding-window graphs
are built by :func:`graphs.build_device.build_windows_device`, every
detection is encoded once, all window forwards run inside the same XLA
program, and duplicate edge scores are averaged across overlapping windows
on device (:func:`device_average_scores`) — the host receives one compact
[2, m_pad, (L-1)*k] unique-edge result per scene.

Scene shapes are quantized coarsely (m_pad multiples of 256, 64-node window
budgets, window counts padded to 8 with parked start indices) so a whole
split shares a handful of compiled programs. The one-big-program compile
only pays off across many scenes; for a handful of scenes the chunked
:class:`infer.predict.SceneEncodedScorer` (small cached programs) is the
better choice.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from batch3dmot_tpu.config import Config, GraphConstructionConfig
from batch3dmot_tpu.data.types import SceneDetections
from batch3dmot_tpu.graph import (
    IMG_SHAPE,
    LIDAR_SHAPE,
    RADAR_SHAPE,
    PaddedGraph,
)
from batch3dmot_tpu.graphs.build_device import build_windows_device

# Per-scene device work (window grid x nodes x edge slots = W*N*E) above
# which grouped dispatch stops paying: at trainval L=2 density (~10M) the
# group win is 1.4-1.6x, at trainval L=5 (~42M) grouping measured
# 0.62-1.03x vs per-scene (docs/RESULTS.md). Config scenes_per_batch still
# sets the GROUP SIZE when grouping applies; this ceiling only routes
# chip-filling scenes to per-scene dispatch automatically.
_GROUP_WORK_CEILING = 32_000_000


def device_average_scores(
    scores_wnk: jax.Array,  # [W, N, k] f32 per-window edge scores
    gsrc_wnk: jax.Array,  # [W, N, k] i32 global src detection index
    emask_wnk: jax.Array,  # [W, N, k] bool edge validity
    frame_idx: jax.Array,  # [M] i32 (frame-major, padded)
    det_mask: jax.Array,  # [M] bool
    window_starts: jax.Array,  # [W] i32 (parked entries >= 2**20)
    *,
    window_len: int,
    d_base=0,
    m_out: int = None,
) -> jax.Array:
    """Cross-window duplicate-edge score averaging ON DEVICE.

    The reference averages duplicate edge scores across overlapping windows
    on the host (``predict.py:226-227``); fetching every window's scored edge
    grid to do so costs ``[3, W, N*k]`` f32 over a ~10-40 MB/s relay — the
    per-scene wall once the GNN kernel is fused (round-3 VERDICT next #1).

    Structure makes this cheap without a global sort: detections are
    frame-major, so window w's node r is detection ``lo_w + r`` and every
    edge INTO detection d lives in exactly the ``window_len - 1`` windows
    starting at ``frame(d)-L+1 .. frame(d)-1``, at row ``d - lo_w``. Gather
    those rows per dst, sort each tiny ``(L-1)*k`` row by src index, and
    run-mean equal keys with cumulative sums — O(M·(L-1)·k) work, a fixed
    ``[2, m_out, (L-1)*k]`` output (row 0 = src index, -1 on invalid /
    duplicate slots; row 1 = f32 mean bitcast to i32 — bit-exact through the
    fetch, unlike int->f32 bitcasts which the TPU flushes as denormals).

    ``d_base``/``m_out`` select a dst shard (multi-chip: each chip averages
    the dst rows of its detection shard from the all-gathered window grids).
    """
    W, N, k = scores_wnk.shape
    L = window_len
    m_pad = frame_idx.shape[0]
    if m_out is None:
        m_out = m_pad
    R = (L - 1) * k
    big_frame = jnp.where(det_mask, frame_idx, jnp.int32(2**30))
    lo_all = jnp.searchsorted(big_frame, window_starts).astype(jnp.int32)

    d = d_base + jnp.arange(m_out, dtype=jnp.int32)
    fd = frame_idx[d]
    # windows holding edges into d: starts frame(d)-L+1 .. frame(d)-1
    s = fd[:, None] - (L - 1) + jnp.arange(L - 1, dtype=jnp.int32)[None, :]
    s_c = jnp.clip(s, 0, W - 1)
    ok = (
        (s >= 0)
        & (s < W)
        & det_mask[d][:, None]
        & (window_starts[s_c] == s_c)  # parked windows never scored
    )
    r = d[:, None] - lo_all[s_c]
    ok &= (r >= 0) & (r < N)
    r_c = jnp.clip(r, 0, N - 1)

    sc = scores_wnk[s_c, r_c].reshape(m_out, R)
    gs = gsrc_wnk[s_c, r_c].reshape(m_out, R)
    em = (emask_wnk[s_c, r_c] & ok[..., None]).reshape(m_out, R)

    sent = jnp.int32(2**30)
    key = jnp.where(em, gs, sent)
    if L == 2:
        # one window per edge: rows hold distinct srcs, nothing to merge
        is_new, key_s, mean = em, key, sc
    else:
        key_s, sc_s = jax.lax.sort((key, sc), dimension=1, num_keys=1)
        valid = key_s < sent
        prev = jnp.pad(key_s[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
        is_new = valid & (key_s != prev)
        # run extents via suffix-min of next-run-start marks
        pos = jnp.arange(R, dtype=jnp.int32)
        mark = jnp.where(is_new, pos, R)
        suf = jax.lax.cummin(mark[:, ::-1], axis=1)[:, ::-1]
        nxt = jnp.concatenate(
            [suf[:, 1:], jnp.full((m_out, 1), R, jnp.int32)], axis=1
        )
        end = jnp.clip(nxt - 1, 0, R - 1)  # last slot of each run
        csum = jnp.cumsum(jnp.where(valid, sc_s, 0.0), axis=1)
        ccnt = jnp.cumsum(valid.astype(jnp.float32), axis=1)
        take = lambda c: jnp.take_along_axis(c, end, axis=1)
        pad0 = lambda c: jnp.pad(c[:, :-1], ((0, 0), (1, 0)))
        run_sum = take(csum) - pad0(csum)
        run_cnt = take(ccnt) - pad0(ccnt)
        mean = run_sum / jnp.maximum(run_cnt, 1.0)

    out_src = jnp.where(is_new, key_s, -1).astype(jnp.int32)
    out_bits = jax.lax.bitcast_convert_type(
        jnp.where(is_new, mean, 0.0).astype(jnp.float32), jnp.int32
    )
    return jnp.stack([out_src, out_bits])  # [2, m_out, R] i32


class DeviceScenePipeline:
    """scene arrays -> per-edge scores, one XLA program per shape bucket."""

    def __init__(self, model, variables, window_len: int, k: int, fused="auto",
                 aot_dir: Optional[str] = None, mesh=None):
        self.model = model
        self.variables = variables
        self.window_len = window_len
        self.k = k
        # Multi-chip: the per-scene program is shard_map'ed over a 1-D mesh —
        # the window grid and the encoder inputs shard along 'data', the
        # scene pose arrays replicate, and the frozen-encoder outputs
        # all-gather so every chip can gather any window's node encodings
        # (the reference's 8-way inference fan-out, predict.py:636-650,
        # re-expressed as SPMD over ICI instead of a process pool).
        self.mesh = mesh
        if mesh is not None and aot_dir:
            print(
                "device pipeline: --aot-cache is single-chip only "
                "(shard_map programs are not exported); ignoring it"
            )
            aot_dir = None
        # serialize lowered programs to disk (infer/aot.py) so later
        # processes skip the minutes-long cold remote compile; weights are
        # program inputs, so artifacts are keyed by the params SHAPE tree
        # and stay valid across checkpoints of the same architecture
        self.aot_dir = aot_dir
        self._var_digest = None
        if aot_dir:
            from batch3dmot_tpu.infer.aot import pytree_shape_digest

            self._var_digest = pytree_shape_digest(variables)
            # shape-INVISIBLE architecture hyperparameters (depth reuses the
            # same MP weights every layer, models/gnn.py; knn_conv_mode
            # changes control flow only) must rotate the artifact key too —
            # a params-shape digest alone would silently reuse a program
            # compiled for a different architecture. Digest every dataclass
            # field of the flax module.
            import dataclasses
            import hashlib

            fields = {
                f.name: getattr(model, f.name)
                for f in dataclasses.fields(model)
                if f.name not in ("parent", "name")
            }
            self._arch_digest = hashlib.sha1(
                repr(sorted(fields.items(), key=lambda kv: kv[0])).encode()
            ).hexdigest()[:12]
        # fused Pallas MP kernel (see infer.predict.SceneEncodedScorer)
        if fused == "auto":
            fused = (
                jax.default_backend() != "cpu"
                and type(model).__name__ == "MultimodalGNN"
                and getattr(model, "knn_conv_mode", "") == "noop"
            )
        self.fused = bool(fused)
        self._interpret = jax.default_backend() == "cpu"
        self._compiled: Dict[Tuple[int, int, int], callable] = {}

    def _build_fn(self, m_pad: int, num_windows: int, max_nodes: int,
                  mesh_gather: bool = False, grid_len: int = None,
                  vmapped: bool = False, mesh_size: int = 1):
        # grid_len: effective Pallas grid length of the final program when
        # it differs from num_windows (the grouped dispatch vmaps S scenes
        # over this fn -> S x W grid; the biggest fused buckets only fit
        # at short grids, ops.pallas_mp._tiles_for). vmapped: the caller
        # wraps this fn in jax.vmap — Pallas cannot batch ANY-memory-space
        # operands, so the HBM-staged kernel variant must not be selected
        grid_len = num_windows if grid_len is None else grid_len
        model = self.model
        window_len, k = self.window_len, min(self.k, max_nodes)

        # variables enter as an ARGUMENT, not a closure: closure-captured
        # device arrays are baked into the HLO as constants and lowering
        # fetches every leaf back to the host (~0.9 s/leaf through the TPU
        # relay — scripts/profile_predict.py); as an input the program is
        # also checkpoint-independent, so AOT artifacts and the persistent
        # compile cache survive retraining.
        def run(variables, frame_idx, center_g, yaw_g, vel_g, center_e,
                yaw_e, vel_e, wlh, class_id, score, token_id, det_mask,
                img, lidar, radar, window_starts):
            g = build_windows_device(
                frame_idx, center_g, yaw_g, vel_g, center_e, yaw_e, vel_e,
                wlh, class_id, score, token_id, det_mask,
                window_starts,
                window_len=window_len, k=k, max_nodes=max_nodes,
            )
            x_img, pn, rn = model.apply(
                variables, img, lidar, radar, method=model.encode_frozen
            )
            lp = lidar.sum(axis=(1, 2)) != 0
            rp = radar.sum(axis=(1, 2)) != 0
            if mesh_gather:
                # each chip encoded its m-shard; gather the full tables so
                # window det_index gathers (arbitrary detections) resolve
                from batch3dmot_tpu.parallel.mesh import DATA_AXIS

                gather = lambda a: jax.lax.all_gather(
                    a, DATA_AXIS, axis=0, tiled=True
                )
                x_img, pn, rn = gather(x_img), gather(pn), gather(rn)
                lp, rp = gather(lp), gather(rp)

            n = max_nodes
            dummy = jnp.zeros((n, 0, 0, 0), jnp.float32)

            def window_graph(w):
                return PaddedGraph(
                    pose=g["pose"][w],
                    img=dummy,  # unused by forward_from_encodings
                    lidar=dummy,
                    radar=dummy,
                    node_time=g["node_time"][w],
                    node_class=g["node_class"][w],
                    node_mask=g["node_mask"][w],
                    edge_src=g["edge_src"][w],
                    edge_dst=g["edge_dst"][w],
                    edge_attr=g["edge_attr"][w],
                    edge_mask=g["edge_mask"][w],
                    edge_label=g["edge_label"][w],
                    edge_weight=g["edge_weight"][w],
                )

            from batch3dmot_tpu.ops.pallas_mp import fused_supported

            if self.fused and fused_supported(
                max_nodes, g["edge_src"].shape[1], grid_len, vmapped=vmapped
            ):
                from batch3dmot_tpu.ops.pallas_mp import (
                    fused_scores_from_encodings,
                )

                batch = jax.vmap(window_graph)(jnp.arange(num_windows))
                det = g["det_index"]  # [W, N]
                scores = fused_scores_from_encodings(
                    model, variables, batch,
                    x_img[det], pn[det], rn[det], lp[det], rp[det],
                    interpret=self._interpret,
                    # the grouped dispatch vmaps S scenes over this fn: the
                    # variant choice must see the EFFECTIVE S x W grid the
                    # guard above was checked with, and may not pick the
                    # HBM-staged kernel under vmap
                    grid=grid_len,
                    force_variant="vmem" if vmapped else None,
                )
            else:
                def one(w):
                    graph = window_graph(w)
                    di = g["det_index"][w]
                    scores, _ = model.apply(
                        variables, graph, x_img[di], pn[di], rn[di],
                        lp[di], rp[di],
                        method=model.forward_from_encodings,
                    )
                    return scores

                scores = jax.vmap(one)(jnp.arange(num_windows))
            # cross-window averaging ON DEVICE (device_average_scores): the
            # result fetch shrinks from [3, W, N*k] f32 (every duplicated
            # edge slot) to one packed [2, m_pad, (L-1)*k] i32 — one row per
            # possible unique edge — and the host unpack is a boolean select
            # instead of an np.unique pass over W*N*k rows.
            det = g["det_index"]
            gsrc = jnp.take_along_axis(det, g["edge_src"], axis=1)
            w_loc = scores.shape[0]
            grid = lambda a: a.reshape(w_loc, max_nodes, k)
            scores_g, gsrc_g, emask_g = (
                grid(scores), grid(gsrc), grid(g["edge_mask"])
            )
            ws = window_starts
            d_base, m_out = 0, m_pad
            if mesh_gather:
                # window grids are sharded over the mesh; averaging crosses
                # windows, so gather them (a few MB over ICI) and split the
                # dst rows instead — each chip averages its detection shard
                from batch3dmot_tpu.parallel.mesh import DATA_AXIS

                gw = lambda a: jax.lax.all_gather(
                    a, DATA_AXIS, axis=0, tiled=True
                )
                scores_g, gsrc_g, emask_g = (
                    gw(scores_g), gw(gsrc_g), gw(emask_g)
                )
                ws = gw(window_starts)
                m_out = m_pad // mesh_size
                d_base = jax.lax.axis_index(DATA_AXIS) * m_out
            return device_average_scores(
                scores_g, gsrc_g, emask_g, frame_idx, det_mask, ws,
                window_len=window_len, d_base=d_base, m_out=m_out,
            )

        return run

    def _quanta(self, scene: SceneDetections):
        """(m_pad, real_windows, max_nodes) shape quanta for one scene, or
        None when the scene produces no windows. Coarse quanta so scenes
        share compiled programs."""
        m = scene.num_detections
        real_windows = scene.num_frames - self.window_len + 1
        if m == 0 or real_windows <= 0:
            return None
        assert np.all(np.diff(scene.frame_idx) >= 0)
        counts = np.bincount(scene.frame_idx, minlength=scene.num_frames)
        max_nodes = max(
            int(counts[s : s + self.window_len].sum()) for s in range(real_windows)
        )
        max_nodes = max(64, -(-max_nodes // 64) * 64)
        m_pad = max(256, -(-m // 256) * 256)
        # the averaged-result transport packs src indices as i32 rows next
        # to f32-bitcast score means (device_average_scores); the bound
        # only guards against a absurdly-sized pad blowing the i32 packing
        assert m_pad < (1 << 24), m_pad
        return m_pad, real_windows, max_nodes

    def _prepare(self, scene, m_pad: int, num_windows: int):
        """Padded numpy argument tuple for one scene at the given quanta
        (window starts beyond the scene are parked far past it so they
        select zero detections — fully masked windows, not partial ones)."""
        m = scene.num_detections
        real_windows = scene.num_frames - self.window_len + 1
        pad1 = lambda a, v=0: np.pad(a, (0, m_pad - m), constant_values=v)
        pad2 = lambda a: np.pad(a, ((0, m_pad - m), (0, 0)))

        def padm(a, tail):
            # source dtype preserved: uint8 crops upload at 1 byte/px (the
            # per-scene relay wall is this transfer, docs/RESULTS.md r4)
            dt = a.dtype if a is not None else np.float32
            buf = np.zeros((m_pad, *tail), dt)
            if a is not None:
                buf[:m] = a
            return buf

        window_starts = np.full(num_windows, 1 << 20, np.int32)
        window_starts[:real_windows] = np.arange(real_windows, dtype=np.int32)
        return (
            pad1(scene.frame_idx.astype(np.int32)),
            pad2(scene.center_g.astype(np.float32)),
            pad1(scene.yaw_g.astype(np.float32)),
            pad2(scene.vel_g.astype(np.float32)),
            pad2(scene.center_e.astype(np.float32)),
            pad1(scene.yaw_e.astype(np.float32)),
            pad2(scene.vel_e.astype(np.float32)),
            pad2(scene.wlh.astype(np.float32)),
            pad1(scene.class_id.astype(np.int32)),
            pad1(scene.score.astype(np.float32)),
            pad1(scene.token_id.astype(np.int32), -1),
            pad1(np.ones(m, bool), False),
            padm(scene.img, IMG_SHAPE),
            padm(scene.lidar, LIDAR_SHAPE),
            padm(scene.radar, RADAR_SHAPE),
            window_starts,
        )

    @staticmethod
    def _average(packed: np.ndarray) -> Dict[Tuple[int, int], float]:
        """Unpack the device-averaged [2, m_pad, (L-1)*k] i32 result: row 0
        is the src index (-1 = empty slot), row 1 the f32 mean bitcast to
        i32; the dst index is the row position. Averaging already happened
        on device (device_average_scores), so this is a select + dict build
        over unique edges only."""
        src = np.asarray(packed[0])
        means = np.asarray(packed[1]).view(np.float32)
        dst = np.broadcast_to(
            np.arange(src.shape[0], dtype=np.int64)[:, None], src.shape
        )
        sel = src >= 0
        return {
            (int(a), int(b)): float(v)
            for a, b, v in zip(
                src[sel].tolist(), dst[sel].tolist(), means[sel].tolist()
            )
        }

    def dispatch_scene(self, scene: SceneDetections):
        """Upload one scene's arrays and ENQUEUE its scoring program,
        returning the un-fetched device result (or None for empty scenes).

        Dispatch is asynchronous: splitting it from :meth:`finalize_scene`
        lets a caller upload scene i+1 while the chip still computes scene
        i — through the TPU relay the host->device transfer (~MB/scene at
        10-40 MB/s) is the per-scene wall, and serializing it behind the
        previous fetch wastes exactly that compute+fetch time
        (docs/RESULTS.md round 4)."""
        q = self._quanta(scene)
        if q is None:
            return None
        m_pad, real_windows, max_nodes = q
        # window-count quantum: 8, lifted to a multiple of the mesh so the
        # window grid shards evenly (m_pad multiples of 256 already divide)
        wq = 8 if self.mesh is None else int(np.lcm(8, self.mesh.size))
        num_windows = -(-real_windows // wq) * wq

        args = tuple(
            jnp.asarray(a) for a in self._prepare(scene, m_pad, num_windows)
        )
        key = (m_pad, num_windows, max_nodes)
        if key not in self._compiled and self.mesh is not None:
            from jax.sharding import PartitionSpec as P

            from batch3dmot_tpu.parallel.mesh import DATA_AXIS

            # the program body sees LOCAL shapes: W/D windows, m/D encoder
            # rows; pose arrays replicate (every window needs every
            # detection's pose)
            local = self._build_fn(
                m_pad, num_windows // self.mesh.size, max_nodes,
                mesh_gather=True, mesh_size=self.mesh.size,
            )
            d = P(DATA_AXIS)
            rep = P()
            self._compiled[key] = jax.jit(
                jax.shard_map(
                    local,
                    mesh=self.mesh,
                    in_specs=(rep,) + (rep,) * 12 + (d, d, d, d),
                    out_specs=P(None, DATA_AXIS, None),
                )
            )
        if key not in self._compiled:
            fn = self._build_fn(m_pad, num_windows, max_nodes)
            if self.aot_dir:
                from batch3dmot_tpu.infer.aot import cached_jit

                # weights are program INPUTS, so artifacts are keyed by
                # shapes only and survive retraining (stale-weight hazards
                # are structurally gone; the digest key records the params
                # SHAPE tree, not values)
                self._compiled[key] = cached_jit(
                    fn,
                    "device_pipeline",
                    f"{m_pad}_{num_windows}_{max_nodes}_{self.window_len}_"
                    f"{self.k}_{self.fused}_{type(self.model).__name__}_"
                    # modality upload dtypes are part of the program input
                    # signature (uint8 crops, f16 points)
                    f"{args[12].dtype}_{args[13].dtype}_{args[14].dtype}_"
                    f"{self._arch_digest}_{self._var_digest}",
                    self.aot_dir,
                    (self.variables, *args),
                )
            else:
                self._compiled[key] = jax.jit(fn)
        return self._compiled[key](self.variables, *args)

    def finalize_scene(self, pending) -> Dict[Tuple[int, int], float]:
        """Fetch + unpack a :meth:`dispatch_scene` result (blocks on the
        device program and the relay transfer)."""
        if pending is None:
            return {}
        return self._average(np.asarray(pending))

    def score_scene(
        self, scene: SceneDetections
    ) -> Dict[Tuple[int, int], float]:
        """Cross-window-averaged edge scores keyed by scene detection
        indices (equivalent to infer.predict.average_scene_edges over the
        host pipeline's windows)."""
        return self.finalize_scene(self.dispatch_scene(scene))

    def dispatch_scenes(self, scenes: List[SceneDetections]):
        """Cross-scene grouped dispatch WITHOUT the fetch: upload a GROUP of
        scenes and enqueue its scoring (one vmapped program when grouping
        applies, per-scene programs when density routing rejects grouping —
        either way every dispatch is enqueued before any result is fetched).
        Returns an opaque pending object for :meth:`finalize_scenes`; see
        :meth:`dispatch_scene` for why dispatch and fetch are split."""
        if len(scenes) == 1:
            return ("singles", [self.dispatch_scene(scenes[0])])
        quanta = [self._quanta(s) for s in scenes]
        live = [i for i, q in enumerate(quanta) if q is not None]
        if not live:
            return ("singles", [None] * len(scenes))
        # group quanta: max over members (coarse quantization keeps the
        # waste bounded; a whole split shares a handful of group programs)
        m_pad = max(quanta[i][0] for i in live)
        max_nodes = max(quanta[i][2] for i in live)
        num_windows = max(
            -(-quanta[i][1] // 8) * 8 for i in live
        )
        # the HBM-staged kernel is unavailable under vmap (Pallas cannot
        # batch ANY-memory-space operands): when the group bucket is fused
        # only single-scene — the 4M-product (512, 8192) bucket — the
        # per-scene kernel win outweighs the grouped dispatch amortization
        # (scripts/probe_pipeline_big.py: singles 1.70 s vs grouped 2.04 s
        # for 2 dense scenes), so score such groups scene-by-scene.
        # Density-aware routing (round-3 VERDICT next #6): grouping also
        # LOSES when one scene already fills the chip — measured 0.62-1.03x
        # vs per-scene at trainval L=5 density (docs/RESULTS.md "Grouped
        # device-pipeline dispatch"), where W*N*E per-scene work is ~42M
        # edge-node products; the relay round trip being amortized is minor
        # against per-scene device time there. Group only under the ceiling.
        from batch3dmot_tpu.ops.pallas_mp import fused_supported

        e_cnt = max_nodes * min(self.k, max_nodes)
        # S: the stacked scene count the group program is BUILT with (live
        # scenes padded up to a mesh-size multiple); under shard_map each
        # chip vmaps only its S/mesh shard, so the Pallas variant choice
        # (grid-length-sensitive near the VMEM limit) must see the
        # per-chip grid — the same value the guard below checks, or the
        # routing would promise a fused group the built program then
        # silently downgrades to the unfused vmap path.
        S = len(live)
        if self.mesh is not None:
            S = -(-S // self.mesh.size) * self.mesh.size
        chip_grid = (
            S // self.mesh.size if self.mesh is not None else S
        ) * num_windows
        underfills = (
            num_windows * max_nodes * e_cnt < _GROUP_WORK_CEILING
        )
        if not underfills or (
            self.fused
            and not fused_supported(
                max_nodes, e_cnt, chip_grid, vmapped=True
            )
            and fused_supported(max_nodes, e_cnt, num_windows)
        ):
            live_set = set(live)
            return (
                "singles",
                [
                    self.dispatch_scene(s) if i in live_set else None
                    for i, s in enumerate(scenes)
                ],
            )
        prepared = [
            self._prepare(scenes[i], m_pad, num_windows) for i in live
        ]
        n_live = len(prepared)
        if S > n_live:
            # dummy scenes: fully-masked (det_mask False, parked windows)
            dummy = [np.zeros_like(a) for a in prepared[0]]
            dummy[-1] = np.full(num_windows, 1 << 20, np.int32)
            prepared += [tuple(dummy)] * (S - n_live)
        stacked = tuple(
            jnp.asarray(np.stack([p[j] for p in prepared]))
            for j in range(len(prepared[0]))
        )

        key = ("grp", S, m_pad, num_windows, max_nodes)
        if key not in self._compiled:
            single = self._build_fn(
                m_pad, num_windows, max_nodes, grid_len=chip_grid,
                vmapped=True,
            )
            in_axes = (None,) + (0,) * 16
            if self.mesh is not None:
                from jax.sharding import PartitionSpec as P

                from batch3dmot_tpu.parallel.mesh import DATA_AXIS

                body = lambda v, *s: jax.vmap(
                    single, in_axes=in_axes
                )(v, *s)
                d0, rep = P(DATA_AXIS), P()
                self._compiled[key] = jax.jit(
                    jax.shard_map(
                        body,
                        mesh=self.mesh,
                        in_specs=(rep,) + (d0,) * 16,
                        out_specs=d0,
                    )
                )
            else:
                fn = jax.vmap(single, in_axes=in_axes)
                if self.aot_dir:
                    from batch3dmot_tpu.infer.aot import cached_jit

                    self._compiled[key] = cached_jit(
                        fn,
                        "device_pipeline_grp",
                        f"{S}_{m_pad}_{num_windows}_{max_nodes}_"
                        f"{self.window_len}_{self.k}_{self.fused}_"
                        f"{stacked[12].dtype}_{stacked[13].dtype}_"
                        f"{stacked[14].dtype}_"
                        f"{type(self.model).__name__}_{self._arch_digest}_"
                        f"{self._var_digest}",
                        self.aot_dir,
                        (self.variables, *stacked),
                    )
                else:
                    self._compiled[key] = jax.jit(fn)
        return (
            "group",
            self._compiled[key](self.variables, *stacked),
            live,
            len(scenes),
        )

    def finalize_scenes(
        self, pending
    ) -> List[Dict[Tuple[int, int], float]]:
        """Fetch + unpack a :meth:`dispatch_scenes` result."""
        kind = pending[0]
        if kind == "singles":
            return [self.finalize_scene(h) for h in pending[1]]
        _, packed_dev, live, n = pending
        packed = np.asarray(packed_dev)
        results: List[Dict[Tuple[int, int], float]] = [{} for _ in range(n)]
        for row, i in enumerate(live):
            results[i] = self._average(packed[row])
        return results

    def score_scenes(
        self, scenes: List[SceneDetections]
    ) -> List[Dict[Tuple[int, int], float]]:
        """Cross-scene grouped dispatch: score a GROUP of scenes in ONE
        program call (scene axis vmapped; on a mesh, whole scenes shard
        across chips — the reference's 8-way inference fan-out,
        ``predict.py:636-650``, as SPMD instead of a process pool).

        Equivalent to ``[score_scene(s) for s in scenes]`` but pays the
        relay round trip (host->device transfer, dispatch, result fetch)
        once per group instead of once per scene — that round trip is the
        steady-state floor of per-scene dispatch (docs/RESULTS.md)."""
        return self.finalize_scenes(self.dispatch_scenes(scenes))


def predict_scene_device(
    model,
    variables,
    scene: SceneDetections,
    cfg: Optional[Config] = None,
    window_len: Optional[int] = None,
):
    """Full device-pipeline analogue of :func:`infer.predict.predict_scene`."""
    from batch3dmot_tpu.config import DEFAULT_EDGE_SCORE_THRESHOLDS
    from batch3dmot_tpu.infer.predict import greedy_round, threshold_edges

    gc = cfg.graph_construction if cfg else GraphConstructionConfig()
    wl = window_len or (cfg.predict.batch_size_graph if cfg else 2)
    pipeline = DeviceScenePipeline(model, variables, wl, gc.top_knn_nodes)
    avg = pipeline.score_scene(scene)
    thresholds = (
        cfg.predict.edge_score_thresholds if cfg else DEFAULT_EDGE_SCORE_THRESHOLDS
    )
    kept = threshold_edges(avg, scene, thresholds)
    return greedy_round(kept), avg
