"""Command-line interface.

Replaces the reference's per-stage scripts (``preprocess_*.py``,
``construct_detection_graph_*.py``, ``train*.py``, ``predict.py``,
``eval_nuscenes.py``, ``utils/concat_jsons.py``) with one config-driven
entry point:

    python -m batch3dmot_tpu.cli preprocess   --config cfg.yaml [--modality all]
    python -m batch3dmot_tpu.cli build-graphs --config cfg.yaml [--synthetic N]
    python -m batch3dmot_tpu.cli train-gnn    --config cfg.yaml [--model pose|mm] [--devices N]
    python -m batch3dmot_tpu.cli train-resnet | train-pointnet | train-radarnet
    python -m batch3dmot_tpu.cli predict      --config cfg.yaml --checkpoint ck [--pipeline encoded]
    python -m batch3dmot_tpu.cli eval         --submission sub.json --gt gt.json
    python -m batch3dmot_tpu.cli concat-jsons --file1 a.json --file2 b.json --outfile out.json
    python -m batch3dmot_tpu.cli demo         # full synthetic pipeline

Every command accepts ``--set section.key=value`` overrides. On a machine
with the nuScenes dataset, ``build-graphs`` reads the tables natively
(:mod:`batch3dmot_tpu.data.nuscenes_tables`) and the detector JSONs
configured under ``detections``; without it, ``--synthetic`` generates
fixed-seed scenes so the entire pipeline runs anywhere.

``--devices N`` on the training/predict commands builds an N-device
``jax.sharding.Mesh`` and shards batches along their leading dimension
(data parallel; the reference's 4-way NCCL DDP equivalent,
``train_resnet_ae_ddp.py:288-290``).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time
from typing import List, Optional

import numpy as np

from batch3dmot_tpu.config import Config


def _load_config(args) -> Config:
    cfg = Config.from_yaml(args.config) if args.config else Config()
    if args.set:
        cfg.apply_overrides(args.set)
    return cfg


def _store_dir(cfg: Config) -> str:
    return cfg.paths.graphs_dir


def _active_modalities(cfg: Config):
    """Sensor subset from main.sensors_used — the graduated config family
    (poses-only / +camera / +lidar / full multimodal, BASELINE.md)."""
    mods = tuple(
        m for m in ("img", "lidar", "radar") if cfg.main.sensors_used.get(m)
    )
    return mods or ("img", "lidar", "radar")


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache for the product commands (first
    remote compiles cost 10-300 s on this class of deployment; see
    CLAUDE.md). No-op when a cache is already configured (tests pin their
    own), disable with B3D_COMPILE_CACHE=''."""
    import jax

    if jax.config.jax_compilation_cache_dir:
        return
    cache = os.environ.get("B3D_COMPILE_CACHE", "/tmp/b3d_compile_cache")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _mesh_from_args(args):
    """N-device data-parallel mesh from --devices (None for single-device)."""
    n = getattr(args, "devices", None)
    if not n or n <= 1:
        return None
    from batch3dmot_tpu.parallel import make_mesh

    return make_mesh(n)


def _build_synthetic_scenes(cfg: Config, num_scenes: int, with_mods: bool):
    from batch3dmot_tpu.data.synthetic import make_synthetic_scene

    gc = cfg.graph_construction
    base = gc.synthetic_seed_base
    return [
        make_synthetic_scene(
            seed=base + s,
            num_frames=gc.synthetic_frames,
            num_tracks=gc.synthetic_tracks,
            with_modalities=with_mods,
        )
        for s in range(num_scenes)
    ]


def cmd_build_graphs(args) -> None:
    cfg = _load_config(args)
    from batch3dmot_tpu.graphs import build_scene_graphs
    from batch3dmot_tpu.io import save_scene_graphs

    out_dir = _store_dir(cfg)
    window_len = cfg.graph_construction.batch_size_graph
    t0 = time.time()
    total_windows = total_edges = n_scenes = 0
    n_skipped = [0]

    def already_built(scene_token: str) -> bool:
        # idempotent / restartable per scene (the reference resumes by
        # hand-slicing the scene list, SURVEY.md §5). The skip decision
        # happens BEFORE any modality extraction so resume is actually cheap.
        if getattr(args, "skip_existing", False) and os.path.exists(
            os.path.join(out_dir, f"{scene_token}_len{window_len}.b3d")
        ):
            n_skipped[0] += 1
            return True
        return False

    if args.synthetic:
        scenes = iter(
            _build_synthetic_scenes(
                cfg, args.synthetic, cfg.main.sensors_used.get("img", False)
            )
        )
    else:
        # streamed: one scene's detections + modality arrays in memory at a
        # time (a trainval scene carries ~10-100 MB of raw crops/clouds)
        scenes = _load_nuscenes_scenes(cfg, skip=already_built)

    for scene in scenes:
        if args.synthetic and already_built(scene.scene_token):
            continue
        n_scenes += 1
        windows = list(
            build_scene_graphs(scene, window_len, cfg.graph_construction)
        )
        if not windows:
            continue
        save_scene_graphs(
            windows, out_dir, metadata=scene.metadata,
            frame_tokens=scene.frame_tokens,
        )
        total_windows += len(windows)
        total_edges += sum(w.num_edges for w in windows)
    dt = time.time() - t0
    print(
        f"build-graphs: {n_scenes} scenes ({n_skipped[0]} skipped), "
        f"{total_windows} windows, {total_edges} edges -> {out_dir} in {dt:.1f}s"
    )


def _load_nuscenes_scenes(cfg: Config, skip=None, split: Optional[str] = None):
    """Generator over SceneDetections built from the tables + detector JSON
    for ONE split (build-graphs: ``graph_construction.split``; predict
    passes the eval split — the reference likewise walks only the
    configured split, ``utils/load_scenes.py:5-59``, ``predict.py:632-635``).
    The detection-JSON key is derived from the SAME split knob so scenes
    are never matched against another split's detector file.

    Streams one scene at a time (a trainval scene's raw modality arrays are
    ~10-100 MB — materializing a whole split would not fit) and applies the
    ``skip(scene_token)`` predicate BEFORE the expensive per-detection
    modality extraction so resumes are cheap.
    """
    from batch3dmot_tpu.data.detections import load_detection_results, scene_from_frames
    from batch3dmot_tpu.data.nuscenes_tables import NuScenesTables

    tables = NuScenesTables(cfg.paths.data, cfg.main.version)
    split = split or cfg.graph_construction.split
    split_key = "mini" if cfg.main.version == "v1.0-mini" else split
    det_path = (
        cfg.detections.get(cfg.main.detections, {}).get(split_key)
        if cfg.detections
        else None
    )
    if det_path is None:
        raise SystemExit(
            f"No detection JSON configured for detector={cfg.main.detections} "
            f"split={split_key}; set detections.{cfg.main.detections}.{split_key}"
        )
    dets = load_detection_results(os.path.join(cfg.paths.detections_dir, det_path))
    # Raw modality features per detection (reference extracts them inside
    # graph construction, construct...parallel.py:162-385) — only for the
    # sensors the config enables (poses-only configs skip the whole stage).
    want = tuple(
        m for m in ("img", "lidar", "radar") if cfg.main.sensors_used.get(m)
    )
    try:
        metas = tables.scene_metas_for_split(
            split, cfg.paths.splits_json or None
        )
    except KeyError as e:
        raise SystemExit(str(e))
    for meta in metas:
        if skip is not None and skip(meta["token"]):
            continue
        toks, ego_t, ego_q = tables.scene_ego_poses(meta["token"])
        gt = tables.scene_gt(meta["token"])
        img = lidar = radar = None
        if want:
            from batch3dmot_tpu.data.preprocess import (
                extract_detection_modalities,
            )

            img, lidar, radar, cam_ok = extract_detection_modalities(
                tables, toks, dets, cfg, modalities=want
            )
        yield scene_from_frames(
            meta["token"], toks, dets, gt, ego_t, ego_q,
            cfg.graph_construction,
            ego_rad_min=cfg.pointnet.ego_rad_min,
            ego_rad_max=cfg.pointnet.ego_rad_max,
            img=img, lidar=lidar, radar=radar,
            camera_keep=cam_ok if want and "img" in want else None,
        )


def _load_stores(cfg: Config):
    from batch3dmot_tpu.io import GraphStoreReader

    paths = sorted(glob.glob(os.path.join(_store_dir(cfg), "*.b3d")))
    if not paths:
        raise SystemExit(
            f"No .b3d graph stores under {_store_dir(cfg)}; run build-graphs first"
        )
    return paths


def _graft_encoder_checkpoints(args, trainer) -> None:
    """Load separately-trained encoder checkpoints into the tracker's frozen
    submodules (the reference composes its tracker from three pretrained
    encoder .pth files, ``train.py:54-61``). Only leaves that exist in the
    GNN's tree are taken (standalone encoder checkpoints also carry their
    classification heads / decoder, which the GNN never instantiates), so
    the optimizer state built from the original tree stays valid."""
    wanted = [
        (name, getattr(args, f"{name}_checkpoint", None))
        for name in ("resnet", "pointnet", "radarnet")
    ]
    if not any(path for _, path in wanted):
        return
    from flax import serialization

    def take_matching(dst, src, where):
        if isinstance(dst, dict):
            out = {}
            for k, v in dst.items():
                if k not in src:
                    raise SystemExit(
                        f"encoder checkpoint missing '{where}/{k}' — wrong "
                        f"architecture for this submodule?"
                    )
                out[k] = take_matching(v, src[k], f"{where}/{k}")
            return out
        if hasattr(dst, "shape") and tuple(dst.shape) != tuple(src.shape):
            raise SystemExit(
                f"encoder checkpoint shape mismatch at '{where}': "
                f"{tuple(src.shape)} vs expected {tuple(dst.shape)}"
            )
        return src

    variables = trainer.variables
    for name, path in wanted:
        if not path:
            continue
        with open(path, "rb") as f:
            enc = serialization.msgpack_restore(f.read())
        for coll in ("params", "batch_stats"):
            if coll in variables and name in variables[coll]:
                variables[coll] = dict(variables[coll])
                variables[coll][name] = take_matching(
                    variables[coll][name], enc.get(coll, {}), f"{name}/{coll}"
                )
        print(f"train-gnn: grafted frozen {name} encoder from {path}")
    variables = dict(variables)
    params = variables.pop("params")
    trainer.state = trainer.state.replace(
        params=params, extra_variables=variables
    )


def _estimate_dedup_device_bytes(*path_sets) -> int:
    """Cheap estimate of the device-resident DEDUP dataset size (padded
    window graphs at their materialization buckets + det_index + one
    encoding-table row per detection) from store headers and metadata
    sidecars alone — no array data is read and nothing is encoded. Gates
    the automatic ``--encoded`` device-resident upgrade; the exact
    post-materialization guard in ``_fit_device_dataset`` still runs
    afterwards. Each positional arg is one path set materialized as its
    own dataset (train / val), mirroring ``group_sizes_by_bucket``'s
    uniform-bucket coalescing — summing per-window ``pick_bucket`` sizes
    instead undercounted the trainval set ~25% (the 4x-waste guard pads
    most windows UP to the densest window's bucket; round-5 convergence
    run: est 3.27 vs 4.26 GiB actual). Pinned within 5% of the
    materialized ``nbytes`` by ``tests/test_device_bytes_estimate.py``."""
    import json as _json

    from batch3dmot_tpu.io import GraphStoreReader
    from batch3dmot_tpu.train.data import group_sizes_by_bucket

    total = 0
    dets = 0
    total_nodes = 0
    window_len = 2
    for paths in path_sets:
        sizes = []
        for p in paths:
            r = GraphStoreReader(p)
            window_len = max(window_len, getattr(r, "window_len", 2))
            nodes, edges = r.window_sizes()
            sizes.extend(
                (n, e) for n, e in zip(nodes, edges) if n > 0 and e > 0
            )
            total_nodes += sum(n for n, e in zip(nodes, edges) if n > 0 and e > 0)
            meta_path = p.replace(".b3d", "_metadata.json")
            if os.path.exists(meta_path) and dets >= 0:
                with open(meta_path) as f:
                    dets += len(_json.load(f))
            else:
                dets = -1  # force the fallback estimate below
        if not sizes:
            continue
        for (mn, me), idxs in group_sizes_by_bucket(sizes):
            # modality-free PaddedGraph leaves: pose 76B/node + time/class
            # i32 + mask ~85B/node + det_index 4B/node; src/dst/attr/mask/
            # label/weight ~33B/edge; +1 = the empty pad slot per group
            total += (len(idxs) + 1) * (mn * 89 + me * 33)
    if dets < 0:
        # no sidecars: each detection appears in ~window_len windows
        dets = total_nodes // max(window_len, 1) + 1
    # table rows: x_img [D+1,96] + pointnet/radarnet [D+1,256] f32 + 2 bools
    total += (dets + 1) * (96 * 4 + 256 * 4 + 256 * 4 + 2)
    return total


def cmd_train_gnn(args) -> None:
    cfg = _load_config(args)
    _enable_compile_cache()
    from batch3dmot_tpu.io import GraphStoreReader
    from batch3dmot_tpu.models import MultimodalGNN, PoseGNN
    from batch3dmot_tpu.train import GNNTrainer
    from batch3dmot_tpu.train.data import to_padded
    from batch3dmot_tpu.train.store_data import make_batcher
    from batch3dmot_tpu.graph import pick_bucket
    from batch3dmot_tpu.utils.metric_logging import MetricWriter

    store_paths = _load_stores(cfg)
    n_val_scenes = max(1, len(store_paths) // 10)
    train_paths = store_paths[:-n_val_scenes] or store_paths
    val_paths = store_paths[-n_val_scenes:]

    model = _make_cli_model(cfg, args.model)

    mesh = _mesh_from_args(args)
    if mesh is not None and cfg.gnn.batch_size % mesh.size:
        new_bs = -(-cfg.gnn.batch_size // mesh.size) * mesh.size
        print(
            f"train-gnn: rounding gnn.batch_size {cfg.gnn.batch_size} -> "
            f"{new_bs} (divisible by {mesh.size} devices)"
        )
        cfg.gnn.batch_size = new_bs

    first = GraphStoreReader(store_paths[0]).window(0)
    bucket = pick_bucket(max(first.num_nodes, 1), max(first.num_edges, 1))
    example = to_padded(first, *bucket)
    trainer = GNNTrainer(model, example, cfg.gnn, mesh=mesh)
    if args.init_checkpoint:
        from batch3dmot_tpu.utils.checkpoint import load_checkpoint

        trainer_vars = load_checkpoint(args.init_checkpoint, trainer.variables)
        trainer.state = trainer.state.replace(
            params=trainer_vars.pop("params"), extra_variables=trainer_vars
        )
    _graft_encoder_checkpoints(args, trainer)

    def _fit_device_dataset(train_ds, val_ds):
        """Shared tail of the two --device-dataset branches: HBM budget
        guard (per chip, scaled by the mesh the dataset shards across),
        then one scanned program per bucket group per epoch
        (train/trainer.fit_device) — validation device-resident too."""
        import jax

        groups = train_ds if isinstance(train_ds, list) else [train_ds]
        if val_ds is not None:
            groups = groups + (
                val_ds if isinstance(val_ds, list) else [val_ds]
            )
        seen_ids = set()
        ds_bytes = 0
        for g in groups:
            for a in jax.tree.leaves(g[0] if g[1] is None else g[:2]):
                # dedup-form groups share one encoding table object;
                # count each shared array once
                if id(a) not in seen_ids:
                    seen_ids.add(id(a))
                    ds_bytes += a.nbytes
        n_chips = mesh.size if mesh is not None else 1
        limit_gb = float(os.environ.get("B3D_DEVICE_DATASET_GB", "6"))
        if ds_bytes > limit_gb * 2**30 * n_chips:
            raise SystemExit(
                f"--device-dataset: dataset is {ds_bytes / 2**30:.1f} GiB "
                f"(> {limit_gb} GiB/chip x {n_chips}; override with "
                "B3D_DEVICE_DATASET_GB or add --devices) — drop the flag "
                "to stream"
            )
        tgroups = train_ds if isinstance(train_ds, list) else [train_ds]
        n_windows = sum(g[0].pose.shape[0] - 1 for g in tgroups)
        print(
            f"train-gnn: device-resident dataset "
            f"({n_windows} train windows, {ds_bytes / 2**20:.0f} MiB "
            f"incl. val, buckets {[g[2] for g in tgroups]})"
        )
        log_dir = os.path.join(cfg.paths.models, "gnn")
        with _maybe_profile(getattr(args, "profile", None)):
            history = trainer.fit_device(
                train_ds,
                epochs=args.epochs or cfg.gnn.num_epochs,
                val_dataset=val_ds,
                log_dir=log_dir,
                version=f"{cfg.main.version}-{args.model}",
                writer=MetricWriter(log_dir),
            )
        print(f"train-gnn: done, checkpoints in {log_dir}")
        return history

    if getattr(args, "device_dataset", False) and not getattr(args, "encoded", False):
        # plain (modality-free) dataset: the pose model's counterpart of
        # the encoded device-resident path
        if type(model).__name__ != "PoseGNN":
            raise SystemExit(
                "--device-dataset needs --encoded for multimodal models "
                "(the raw-modality dataset would re-run the frozen "
                "encoders in-graph every step)"
            )
        from batch3dmot_tpu.train.data import materialize_graph_datasets

        windows = []
        for p in train_paths:
            windows.extend(GraphStoreReader(p).windows())
        val_windows = [
            w for p in val_paths for w in GraphStoreReader(p).windows()
            if w.num_nodes > 0 and w.num_edges > 0
        ]
        return _fit_device_dataset(
            materialize_graph_datasets(windows),
            materialize_graph_datasets(val_windows) if val_windows else None,
        )
    if getattr(args, "encoded", False):
        # Precompute the frozen encoders ONCE per scene and train the GNN on
        # gathered embeddings: with window length L and E epochs this
        # removes a ~L*E factor of the dominant FLOPs (train/encoded.py; the
        # reference re-encodes every node of every window on every epoch,
        # clr_att_gnn.py:125-141).
        if type(model).__name__ == "PoseGNN":
            raise SystemExit("--encoded applies to the multimodal models only")
        from batch3dmot_tpu.train.encoded import StreamingEncodedBatcher

        def scene_loader(path):
            windows = GraphStoreReader(path).windows()
            scene = _scene_from_store(path, windows, with_modalities=True)
            if scene.img is None and scene.lidar is None and scene.radar is None:
                raise SystemExit(
                    f"--encoded: {path} carries no modality arrays; "
                    "build graphs with sensors enabled"
                )
            return scene

        device_flag = getattr(args, "device_dataset", False)
        auto_upgrade = False
        if not device_flag and not getattr(args, "stream", False):
            # AUTO: device-resident epochs run ~40x faster than streaming
            # through the TPU relay (26 s vs 1023 s warm epoch over 550
            # trainval-shape scenes, docs/RESULTS.md round 4), so upgrade
            # whenever the dedup dataset fits the advisory HBM budget —
            # same auto-with-override pattern as the density-aware grouped
            # predict dispatch. --stream pins the unbounded-memory path.
            n_chips = mesh.size if mesh is not None else 1
            budget = (
                float(os.environ.get("B3D_DEVICE_DATASET_GB", "6"))
                * 2**30 * n_chips
            )
            est = _estimate_dedup_device_bytes(train_paths, val_paths)
            if est <= 0.8 * budget:
                print(
                    f"train-gnn: auto device-resident dataset (est. "
                    f"{est / 2**30:.2f} GiB fits the {budget / 2**30:.0f} "
                    f"GiB budget; --stream to disable)"
                )
                device_flag = auto_upgrade = True
            else:
                print(
                    f"train-gnn: streaming (est. device-resident size "
                    f"{est / 2**30:.2f} GiB exceeds 0.8 x {budget / 2**30:.0f}"
                    f" GiB; raise B3D_DEVICE_DATASET_GB or add --devices to "
                    f"go device-resident)"
                )
        if device_flag:
            # DEVICE-RESIDENT dataset: every window uploads once and each
            # epoch runs as one scanned program gathering batches on
            # device — after the upload no training data crosses the host
            # link (the per-epoch batch re-upload is the wall-clock floor
            # through a remote-TPU relay, CLAUDE.md relay economics).
            # The dataset must fit in (mesh-combined) HBM next to the
            # working set (the streaming path has no such bound).
            # Deduplicated form (train/encoded.DedupEncodings): one global
            # per-detection embedding table gathered on device instead of
            # per-window pre-gathered buffers — ~L x less HBM at window
            # length L, which is what lets trainval-scale datasets go
            # device-resident on ONE chip.
            from batch3dmot_tpu.train.encoded import (
                materialize_encoded_datasets_dedup,
                scene_encodings_cached,
            )

            from batch3dmot_tpu.train.encoded import _encoder_digest

            # one digest for the whole materialization (per-scene
            # recomputation costs a device fetch per call)
            enc_digest = _encoder_digest(model, trainer.variables)

            def encoded_items(paths):
                items = []
                for p in paths:
                    enc = scene_encodings_cached(
                        model, trainer.variables, p, scene_loader,
                        digest=enc_digest,
                    )
                    items.extend(
                        (w, enc)
                        for w in GraphStoreReader(p).windows()
                        if w.num_nodes > 0 and w.num_edges > 0
                    )
                return items

            try:
                val_items = encoded_items(val_paths)
                return _fit_device_dataset(
                    materialize_encoded_datasets_dedup(
                        encoded_items(train_paths)
                    ),
                    materialize_encoded_datasets_dedup(val_items)
                    if val_items else None,
                )
            except SystemExit as e:
                if not auto_upgrade:
                    raise
                # the exact post-materialization guard disagreed with the
                # 0.8-margin estimate — stream instead (the per-scene
                # encoding caches built above are reused, nothing re-runs)
                print(f"train-gnn: {e} — falling back to streaming")
        # scene-streaming: memory bounded by one scene; encoding tables
        # persist next to the stores keyed by the encoder digest, so a
        # restarted run re-encodes nothing. uniform=True: one shape for
        # the whole epoch so the K-step fused scan groups cleanly.
        train_batcher = StreamingEncodedBatcher(
            train_paths, model, trainer.variables, scene_loader,
            cfg.gnn.batch_size, uniform=True,
        )
        val_batcher = (
            StreamingEncodedBatcher(
                val_paths, model, trainer.variables, scene_loader,
                cfg.gnn.batch_size, uniform=True,
            )
            if val_paths
            else None
        )
    else:
        train_batcher = make_batcher(
            train_paths, cfg.gnn.batch_size, uniform=True
        )
        val_batcher = (
            make_batcher(val_paths, cfg.gnn.batch_size, uniform=True)
            if val_paths
            else None
        )
    print(
        f"train-gnn: {len(store_paths)} scene stores, "
        f"{len(train_batcher)} train batches/epoch"
    )
    log_dir = os.path.join(cfg.paths.models, "gnn")
    with _maybe_profile(getattr(args, "profile", None)):
        history = trainer.fit(
            train_batcher,
            val_batcher,
            epochs=args.epochs or cfg.gnn.num_epochs,
            log_dir=log_dir,
            # model family goes into the checkpoint name — a cl_att_gnn
            # checkpoint loaded into an mm predict fails with an opaque
            # flax restore error otherwise
            version=f"{cfg.main.version}-{args.model}",
            writer=MetricWriter(log_dir),
            fused_steps=getattr(args, "fused_steps", 8),
        )
    print(f"train-gnn: done, checkpoints in {log_dir}")
    return history


def _maybe_profile(log_dir: Optional[str]):
    """jax.profiler trace context when --profile DIR is given."""
    if not log_dir:
        import contextlib

        return contextlib.nullcontext()
    from batch3dmot_tpu.utils.profiling import profile_trace

    return profile_trace(log_dir)


def _split_entries(anns: dict):
    """(train_entries, val_entries) from a split-keyed processed-anns dict
    (keys like train/val or mini_train/mini_val; fallback: everything)."""
    train, val = [], []
    for key, entries in anns.items():
        if "train" in key:
            train.extend(entries)
        elif "val" in key:
            val.extend(entries)
    if not train:
        train = [e for entries in anns.values() for e in entries]
    return train, val


def _synthetic_encoder_batches(prefix: str, batch_size: int = 8, n: int = 16):
    """Shape-compatible random batches (explicit --synthetic only)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    if prefix == "resnet":
        return [
            jnp.asarray(rng.random((batch_size, 32, 32, 3), dtype=np.float32))
            for _ in range(n)
        ]
    pts_shape = (
        (batch_size, 128, 3) if prefix == "pointnet" else (batch_size, 64, 4)
    )
    return [
        (
            jnp.asarray(rng.standard_normal(pts_shape).astype(np.float32)),
            jnp.asarray(rng.integers(0, 7, batch_size)),
        )
        for _ in range(n)
    ]


def _encoder_device_dataset(
    cfg, args, make_trainer, prefix, pre, bs, train_entries, val_entries,
    mesh,
):
    """--device-dataset tail of the encoder commands: decode/load every
    item once (``data/preprocess.materialize_*_dataset``), upload the
    stacked arrays, and train with ``EncoderTrainer.fit_device`` — the
    host loaders' per-epoch randomness runs in-graph
    (``train/encoders.{image,lidar,radar}_transform``)."""
    import jax

    from batch3dmot_tpu.train import encoders as enc_mod

    enc_cfg = getattr(cfg, prefix)
    enc_cfg.batch_size = bs  # mesh-rounded; fit_device reads cfg.batch_size
    if prefix == "resnet":
        from batch3dmot_tpu.data.preprocess import materialize_image_dataset

        mat = lambda entries: materialize_image_dataset(  # noqa: E731
            cfg.paths.data, entries, res_size=cfg.resnet.res_size
        )
        transform = enc_mod.image_transform(cfg.resnet.res_size)
    elif prefix == "pointnet":
        from batch3dmot_tpu.data.preprocess import materialize_lidar_dataset

        mat = lambda entries: materialize_lidar_dataset(  # noqa: E731
            os.path.join(pre, "lidar"), entries,
            min_pts=cfg.pointnet.min_lidar_pts,
            ego_rad=(cfg.pointnet.ego_rad_min, cfg.pointnet.ego_rad_max),
            num_points=cfg.pointnet.num_points,
            rng=np.random.default_rng(enc_cfg.manual_seed),
        )
        transform = enc_mod.lidar_transform(cfg.pointnet.num_points)
    else:
        from batch3dmot_tpu.data.preprocess import materialize_radar_dataset

        mat = lambda entries: materialize_radar_dataset(  # noqa: E731
            os.path.join(pre, "radar"), entries,
            min_pts=cfg.radarnet.min_radar_pts,
            ego_rad=(cfg.radarnet.ego_rad_min, cfg.radarnet.ego_rad_max),
            num_points=cfg.radarnet.num_points,
            rng=np.random.default_rng(enc_cfg.manual_seed),
        )
        transform = enc_mod.radar_transform(cfg.radarnet.num_points)

    train_ds = mat(train_entries)
    val_ds = mat(val_entries) if len(val_entries) >= bs else None
    ds_bytes = sum(
        a.nbytes
        for ds in ([train_ds] + ([val_ds] if val_ds is not None else []))
        for a in jax.tree.leaves(ds)
    )
    n_chips = mesh.size if mesh is not None else 1
    limit_gb = float(os.environ.get("B3D_DEVICE_DATASET_GB", "6"))
    if ds_bytes > limit_gb * 2**30 * n_chips:
        raise SystemExit(
            f"--device-dataset: dataset is {ds_bytes / 2**30:.1f} GiB "
            f"(> {limit_gb} GiB/chip x {n_chips}; override with "
            "B3D_DEVICE_DATASET_GB or add --devices) — drop the flag "
            "to stream"
        )
    n_train = jax.tree.leaves(train_ds)[0].shape[0]
    print(
        f"train-{prefix}: device-resident dataset ({n_train} train items, "
        f"{ds_bytes / 2**20:.0f} MiB incl. val, batch {bs})"
    )
    trainer = make_trainer(steps_per_epoch=max(1, n_train // bs), mesh=mesh)
    return trainer.fit_device(
        train_ds,
        transform=transform,
        val_dataset=val_ds,
        epochs=args.epochs or enc_cfg.num_epochs,
        log_dir=os.path.join(cfg.paths.models, prefix),
        prefix=prefix,
        seed=enc_cfg.manual_seed,
    )


def _encoder_cmd(args, make_trainer, prefix: str):
    """Shared body of train-resnet / train-pointnet / train-radarnet.

    Default: train on the L2 preprocessing artifacts under
    ``paths.preprocessed`` (the reference's ``train_resnet_ae.py:172-219`` /
    ``train_pointnet.py:127-170`` / ``train_radarnet.py`` data paths).
    ``--synthetic`` trains on random shape-compatible batches instead.
    """
    cfg = _load_config(args)
    _enable_compile_cache()
    mesh = _mesh_from_args(args)
    enc_cfg = getattr(cfg, prefix)
    bs = enc_cfg.batch_size
    if mesh is not None and bs % mesh.size:
        bs = -(-bs // mesh.size) * mesh.size
        print(f"train-{prefix}: rounding batch_size to {bs} for {mesh.size} devices")

    if getattr(args, "synthetic", False):
        batches = _synthetic_encoder_batches(prefix, batch_size=bs)
        train_iter = lambda: iter(batches)  # noqa: E731
        val_iter = None
        steps_per_epoch = len(batches)
    else:
        from batch3dmot_tpu.data.preprocess import (
            image_batches,
            lidar_batches,
            radar_batches,
        )

        pre = cfg.paths.preprocessed
        kind = "img" if prefix == "resnet" else (
            "lidar" if prefix == "pointnet" else "radar"
        )
        anns_path = os.path.join(pre, f"processed_{kind}_anns.json")
        if not os.path.exists(anns_path):
            raise SystemExit(
                f"{anns_path} not found; run `preprocess` first "
                f"(or pass --synthetic for random batches)"
            )
        with open(anns_path) as f:
            anns = json.load(f)
        train_entries, val_entries = _split_entries(anns)
        if prefix == "pointnet":
            pred = lambda e: (  # noqa: E731 (mirrors lidar_batches)
                e["num_lidar_pts"] > cfg.pointnet.min_lidar_pts
                and cfg.pointnet.ego_rad_min < e["ann_ego_radius"] < cfg.pointnet.ego_rad_max
            )
        elif prefix == "radarnet":
            pred = lambda e: (  # noqa: E731 (mirrors radar_batches)
                e["num_radar_pts"] >= cfg.radarnet.min_radar_pts
                and cfg.radarnet.ego_rad_min < e["ann_ego_radius"] < cfg.radarnet.ego_rad_max
            )
        else:
            pred = lambda e: True  # noqa: E731
        train_entries = [e for e in train_entries if pred(e)]
        val_entries = [e for e in val_entries if pred(e)]
        if len(train_entries) < bs:
            raise SystemExit(
                f"train-{prefix}: only {len(train_entries)} usable annotations "
                f"< batch_size {bs}; lower {prefix}.batch_size"
            )
        if getattr(args, "device_dataset", False):
            return _encoder_device_dataset(
                cfg, args, make_trainer, prefix, pre, bs,
                train_entries, val_entries, mesh,
            )
        rng = np.random.default_rng(enc_cfg.manual_seed)
        if prefix == "resnet":
            mk = lambda entries, shuffle: lambda: image_batches(  # noqa: E731
                cfg.paths.data, entries, bs,
                res_size=cfg.resnet.res_size, rng=rng, shuffle=shuffle,
            )
        elif prefix == "pointnet":
            mk = lambda entries, shuffle: lambda: lidar_batches(  # noqa: E731
                os.path.join(pre, "lidar"), entries, bs,
                min_pts=cfg.pointnet.min_lidar_pts,
                ego_rad=(cfg.pointnet.ego_rad_min, cfg.pointnet.ego_rad_max),
                num_points=cfg.pointnet.num_points,
                augment=shuffle,  # augmentation on the train split only
                rng=rng, shuffle=shuffle,
            )
        else:
            mk = lambda entries, shuffle: lambda: radar_batches(  # noqa: E731
                os.path.join(pre, "radar"), entries, bs,
                min_pts=cfg.radarnet.min_radar_pts,
                ego_rad=(cfg.radarnet.ego_rad_min, cfg.radarnet.ego_rad_max),
                num_points=cfg.radarnet.num_points,
                rng=rng, shuffle=shuffle,
            )
        train_iter = mk(train_entries, True)
        val_iter = mk(val_entries, False) if len(val_entries) >= bs else None
        steps_per_epoch = max(1, len(train_entries) // bs)
        print(
            f"train-{prefix}: {len(train_entries)} train / "
            f"{len(val_entries)} val annotations, batch {bs}"
        )

    trainer = make_trainer(steps_per_epoch=steps_per_epoch, mesh=mesh)
    return trainer.fit(
        train_iter,
        val_iter,
        epochs=args.epochs or enc_cfg.num_epochs,
        log_dir=os.path.join(cfg.paths.models, prefix),
        prefix=prefix,
    )


def cmd_train_resnet(args):
    from batch3dmot_tpu.train.encoders import make_resnet_trainer

    cfg = _load_config(args)
    return _encoder_cmd(
        args, lambda **kw: make_resnet_trainer(cfg.resnet, **kw), "resnet"
    )


def cmd_train_pointnet(args):
    from batch3dmot_tpu.train.encoders import make_pointnet_trainer

    cfg = _load_config(args)
    return _encoder_cmd(
        args, lambda **kw: make_pointnet_trainer(cfg.pointnet, **kw), "pointnet"
    )


def cmd_train_radarnet(args):
    from batch3dmot_tpu.train.encoders import make_radarnet_trainer

    cfg = _load_config(args)
    return _encoder_cmd(
        args, lambda **kw: make_radarnet_trainer(cfg.radarnet, **kw), "radarnet"
    )


def cmd_predict(args) -> None:
    cfg = _load_config(args)
    return _run_predict(
        cfg,
        args.checkpoint,
        args.model,
        pipeline=getattr(args, "pipeline", "auto"),
        mesh=_mesh_from_args(args),
        synthetic=getattr(args, "synthetic", 0),
        aot_cache=getattr(args, "aot_cache", None),
        skip_existing=getattr(args, "skip_existing", False),
    )


def _make_cli_model(cfg: Config, name: str):
    """Model from a family name: 'mm'/'pose' take modalities/attention from
    the config; reference family names (clr_att_gnn, cl_att_gnn,
    cl_gnn_trad, gnn_baseline, gnn_transfer_cl...) fix them per the
    registry (models/registry.py)."""
    from batch3dmot_tpu.models import MultimodalGNN, PoseGNN, make_model

    if name == "mm":
        return MultimodalGNN(
            depth=cfg.gnn.gnn_depth,
            use_attention=cfg.gnn.attention,
            knn_conv_mode=cfg.gnn.knn_conv_mode,
            modalities=_active_modalities(cfg),
        )
    if name == "pose":
        return PoseGNN(depth=cfg.gnn.gnn_depth, knn_conv_mode=cfg.gnn.knn_conv_mode)
    return make_model(
        name, depth=cfg.gnn.gnn_depth, knn_conv_mode=cfg.gnn.knn_conv_mode
    )


def _run_predict(
    cfg: Config,
    checkpoint: Optional[str],
    model_kind: str,
    pipeline: str = "auto",
    mesh=None,
    synthetic: int = 0,
    aot_cache: Optional[str] = None,
    skip_existing: bool = False,
):
    """Batched inference over graph stores (or, for the fully-fused device
    pipeline, over scenes built straight from source data).

    Pipelines (the round-1 CLI always used the slow re-encoding ``windows``
    path; the fast paths are now the product surface):
      * ``windows``  — per-window scoring; mm re-encodes every node of every
        window (the reference's behavior, its baseline).
      * ``encoded``  — encode every detection of a scene ONCE, gather
        embeddings per window (mm default).
      * ``device``   — one fused XLA program per scene: graph construction +
        encoding + scoring on device; bypasses stores (mm only).
    """
    import jax

    _enable_compile_cache()

    from batch3dmot_tpu.graph import pick_bucket
    from batch3dmot_tpu.infer.predict import (
        SceneEncodedScorer,
        make_scorer,
        predict_scene,
    )
    from batch3dmot_tpu.infer.tracks import (
        all_scene_sample_tokens,
        assemble_submission,
        hierarchical_clusters,
        scene_results,
    )
    from batch3dmot_tpu.io import GraphStoreReader
    from batch3dmot_tpu.train.data import to_padded
    from batch3dmot_tpu.utils.checkpoint import load_checkpoint

    model = _make_cli_model(cfg, model_kind)
    is_pose = type(model).__name__ == "PoseGNN"
    if mesh is not None and cfg.predict.windows_per_batch % mesh.size:
        cfg.predict.windows_per_batch = (
            -(-cfg.predict.windows_per_batch // mesh.size) * mesh.size
        )
    if pipeline == "auto":
        pipeline = "windows" if is_pose else "encoded"
    if is_pose and pipeline in ("encoded", "device"):
        raise SystemExit(
            f"--pipeline {pipeline} applies to the multimodal models; "
            f"'{model_kind}' has no frozen encoders (use --pipeline windows)"
        )

    enc_by_token: Dict[str, dict] = {}
    use_enc_cache = False
    if pipeline == "device":
        # no stores: scenes come straight from source data
        scenes = (
            _build_synthetic_scenes(cfg, synthetic, True)
            if synthetic
            # inference walks the EVAL split (reference predict.py:632-635
            # processes the configured eval set, not the training split)
            else _load_nuscenes_scenes(cfg, split=cfg.eval.eval_set)
        )
        variables = _init_variables_for_scene_model(cfg, model)
        if checkpoint:
            variables = load_checkpoint(checkpoint, variables)
        scene_iter = ((s, None) for s in scenes)  # streamed
    else:
        paths = _load_stores(cfg)
        first = GraphStoreReader(paths[0]).window(0)
        bucket = pick_bucket(first.num_nodes, max(first.num_edges, 1))
        example = to_padded(first, *bucket)
        variables = jax.jit(model.init)(jax.random.key(0), example)
        if checkpoint:
            variables = load_checkpoint(checkpoint, variables)
        # Cached-embedding predict: when the per-scene encoder caches
        # (<store>.b3d.enc.npz, digest-keyed to THIS checkpoint's frozen
        # encoders — --encoded training writes them) cover the split,
        # upload 608-d embeddings instead of raw crops+points: ~3.6x
        # fewer bytes on the per-scene upload wall (docs/RESULTS.md) and
        # no encoder FLOPs. embedding_cache=write builds missing caches
        # (first run pays per-scene encodes); =off pins the raw path.
        cache_valid: set = set()
        if pipeline == "encoded" and cfg.predict.embedding_cache != "off":
            mode = cfg.predict.embedding_cache
            if mode not in ("auto", "write"):
                raise SystemExit(
                    f"predict.embedding_cache must be auto|write|off, got "
                    f"'{mode}'"
                )
            from batch3dmot_tpu.train.encoded import (
                _encoder_digest,
                probe_scene_encoding_cache,
                store_detection_count,
            )

            digest = _encoder_digest(model, variables)
            # validity pass WITHOUT materializing arrays (load=False):
            # whether the cached path is taken at all depends on coverage,
            # and eagerly loading 550 scenes' embeddings only to discard
            # them on a single miss would double peak host RAM. Digest
            # mismatches (a different checkpoint's encoders) are NOT
            # recomputed in auto mode — the run just falls back to the
            # grouped raw encode; stale row counts (store rebuilt in
            # place) and unreadable caches are reported by the probe.
            for p in paths:
                if probe_scene_encoding_cache(
                    p, digest, store_detection_count(p), load=False
                ):
                    cache_valid.add(p)
            use_enc_cache = mode == "write" or len(cache_valid) == len(paths)
            if not use_enc_cache and cache_valid:
                print(
                    f"predict: valid embedding caches cover "
                    f"{len(cache_valid)}/{len(paths)} stores — using "
                    "raw-modality encode (predict.embedding_cache=write "
                    "builds the rest)"
                )
        scene_iter = []
        for path in paths:
            windows = GraphStoreReader(path).windows()
            need_mods = pipeline == "encoded" and (
                not use_enc_cache or path not in cache_valid
            )
            scene = _scene_from_store(
                path, windows, with_modalities=need_mods
            )
            if use_enc_cache:
                enc = None
                if path in cache_valid:
                    enc = probe_scene_encoding_cache(
                        path, digest, scene.num_detections
                    )
                if enc is None:  # write mode: compute + persist
                    if not need_mods:
                        # auto mode validated this cache in the first pass
                        # but it vanished/changed before the load — the
                        # scene was read modality-free, so recomputing
                        # here is impossible
                        raise SystemExit(
                            f"predict: embedding cache for {path} became "
                            "invalid mid-run; re-run (or use "
                            "predict.embedding_cache=write)"
                        )
                    from batch3dmot_tpu.train.encoded import (
                        scene_encodings_cached,
                    )

                    enc = scene_encodings_cached(
                        model, variables, path,
                        lambda p, s=scene: s,
                        digest=digest,
                        expected_rows=scene.num_detections,
                    )
                enc_by_token[scene.scene_token] = enc
            scene_iter.append((scene, windows))
        if use_enc_cache:
            print(
                f"predict: cached-embedding path "
                f"({cfg.predict.embedding_dtype} uploads, "
                f"{len(paths)} scenes)"
            )

    # lidar/radar upload at half precision by default (predict.point_dtype;
    # models.encoders.points_input_f32 upcasts on device — the MXU ingests
    # operands as bf16 anyway, so nothing the chip computes gets coarser).
    # Cast ONCE at load so every pipeline sees the same f16-rounded values:
    # the 'windows' parity path re-casts to f32 on host (pad_graph) and so
    # uploads full-width but IDENTICAL values — cross-pipeline equivalence
    # stays exact.
    if not is_pose and cfg.predict.point_dtype == "float16":
        import dataclasses as _dc

        def _half(obj):
            if obj is None:
                return None
            rep = {
                f: getattr(obj, f).astype(np.float16)
                for f in ("lidar", "radar")
                if getattr(obj, f) is not None
                and getattr(obj, f).dtype == np.float32
            }
            return _dc.replace(obj, **rep) if rep else obj

        if pipeline == "device":
            scene_iter = ((_half(s), ws) for s, ws in scene_iter)
        else:
            scene_iter = [
                (_half(s), [_half(w) for w in ws]) for s, ws in scene_iter
            ]

    if pipeline == "windows":
        scorer = make_scorer(model, variables, mesh=mesh)
    elif pipeline == "encoded":
        scorer = SceneEncodedScorer(
            model, variables, mesh=mesh,
            embedding_dtype=cfg.predict.embedding_dtype,
        )
    elif pipeline == "device":
        from batch3dmot_tpu.infer.device_pipeline import DeviceScenePipeline

        device_pipe = DeviceScenePipeline(
            model,
            variables,
            cfg.predict.batch_size_graph,
            cfg.graph_construction.top_knn_nodes,
            aot_dir=aot_cache,
            mesh=mesh,
        )
    else:
        raise SystemExit(f"Unknown pipeline '{pipeline}'")

    all_results = []
    all_tokens: List[str] = []
    edge_scores_dir = os.path.join(cfg.paths.eval, "predict")
    os.makedirs(edge_scores_dir, exist_ok=True)
    track_offset = 0
    t0 = time.time()
    n_edges = 0
    n_scenes = 0
    n_resumed = 0
    n_resumed_edges = 0

    def _device_postprocess(items, avgs):
        from batch3dmot_tpu.infer.predict import greedy_round, threshold_edges

        out = []
        for (scene, _), avg in zip(items, avgs):
            kept = threshold_edges(
                avg, scene, cfg.predict.edge_score_thresholds
            )
            # averaged UNIQUE edges (other pipelines count raw
            # per-window observations — the printed label differs)
            out.append((greedy_round(kept), avg, len(avg)))
        return out

    def _score_one(scene, windows):
        pred_edges, avg_scores = predict_scene(
            scorer, scene, windows, cfg,
            buckets=run_buckets, m_pad=run_m_pad,
            # direct index, like the grouped path: a miss here is a bug
            # (desynced dicts) and must raise, not silently score the
            # all-zero absent-modality encoding
            encodings=enc_by_token[scene.scene_token]
            if use_enc_cache else None,
        )
        return pred_edges, avg_scores, sum(w.num_edges for w in windows)

    # Pin ONE set of program shapes for the whole run: per-scene detection
    # counts and window sizes would otherwise each compile (and, through a
    # relay, load) their own program variant — measured ~5 s/scene of pure
    # executable-load overhead on a 12-scene split before this.
    from batch3dmot_tpu.graph import DEFAULT_BUCKETS as _DB

    run_buckets, run_m_pad, run_nb = _DB, None, 0
    if pipeline != "device" and scene_iter:
        from batch3dmot_tpu.infer.predict import _pad_detection_count

        sized = [
            (w.num_nodes, w.num_edges)
            for _, ws in scene_iter
            for w in ws
            if w.num_nodes and w.num_edges
        ]
        if sized:
            run_buckets = (
                pick_bucket(
                    max(n for n, _ in sized), max(e for _, e in sized), _DB
                ),
            )
        if pipeline == "encoded":
            run_m_pad = max(
                _pad_detection_count(s.num_detections) for s, _ in scene_iter
            )
            run_nb = max(
                (
                    sum(1 for w in ws if w.num_nodes and w.num_edges)
                    for _, ws in scene_iter
                ),
                default=0,
            )

    # Two-stage software pipeline: the next batch's scoring (device
    # dispatch + relay fetch, GIL released) runs on a worker thread while
    # the main thread assembles the current batch's tracks and writes its
    # JSONs — the relay round trip is the steady-state floor otherwise
    # (docs/RESULTS.md). The device pipeline additionally GROUPS
    # cfg.predict.scenes_per_batch scenes into ONE program dispatch
    # (DeviceScenePipeline.score_scenes) so that round trip is paid per
    # group, not per scene (the reference fans scenes out over a ray pool,
    # predict.py:636-650; here the fan-out is one batched XLA program).
    from concurrent.futures import ThreadPoolExecutor

    group_size = (
        max(1, cfg.predict.scenes_per_batch)
        if pipeline in ("device", "encoded")
        else 1
    )
    # run-global scan length for grouped encoded scoring: covers any group
    # (every distinct stack depth is its own compiled program)
    enc_num_batches = (
        -(-group_size * run_nb // cfg.predict.windows_per_batch)
        if run_nb
        else None
    )

    def _results_path(scene):
        return os.path.join(
            edge_scores_dir, f"{scene.scene_token}_results.json"
        )

    def _score_group(items):
        # device groups and encoded groups (group_size > 1) are staged via
        # dispatch/finalize in _stage below; this handles the rest
        return [_score_one(s, w) for s, w in items]

    def _items():
        """('cached', scene, payload) singles and ('group', [(scene,
        windows), ...]) batches, in scene order (the buffer flushes before
        a cached scene so resumed runs keep their numbering)."""
        buf = []
        for scene, windows in scene_iter:
            if skip_existing and os.path.exists(_results_path(scene)):
                if buf:
                    yield ("group", buf)
                    buf = []
                with open(_results_path(scene)) as f:
                    yield ("cached", scene, json.load(f))
                continue
            buf.append((scene, windows))
            if len(buf) >= group_size:
                yield ("group", buf)
                buf = []
        if buf:
            yield ("group", buf)

    def _assemble(scene, pred_edges, avg_scores, scored):
        nonlocal n_edges
        n_edges += scored
        with open(
            os.path.join(
                edge_scores_dir, f"{scene.scene_token}_edge_scores.json"
            ),
            "w",
        ) as f:
            json.dump({str(k): v for k, v in avg_scores.items()}, f)
        cats = {i: m["category_name"] for i, m in enumerate(scene.metadata)}
        tracks = hierarchical_clusters(
            pred_edges, cats, cfg.predict.join_score_thresholds
        )
        results = scene_results(
            tracks, scene, cfg.predict.interpolate_trailer_tracks
        )
        # persist for --skip-existing resume (atomic via rename so a kill
        # mid-write can't leave a readable half file)
        tmp = f"{_results_path(scene)}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(
                {"results": results, "num_tracks": len(tracks),
                 "scored": scored},
                f,
            )
        os.replace(tmp, _results_path(scene))
        all_results.append(results)
        scene_track_counts.append(len(tracks))

    scene_track_counts: List[int] = []
    with ThreadPoolExecutor(max_workers=1) as ex:

        def _stage(item):
            if item is None or item[0] == "cached":
                return item
            items = item[1]
            if pipeline == "device":
                # dispatch (host->device upload + program enqueue) on THIS
                # thread, so staging group i+1 overlaps its relay transfer
                # with the chip still computing group i; the worker thread
                # only fetches the compact result + postprocesses. Through
                # the relay the upload is the per-scene wall — serializing
                # it behind the previous fetch wastes the whole device/fetch
                # time (docs/RESULTS.md round 4).
                pending = device_pipe.dispatch_scenes(
                    [s for s, _ in items]
                )
                return (
                    "fut",
                    items,
                    ex.submit(
                        lambda p=pending, it=items: _device_postprocess(
                            it, device_pipe.finalize_scenes(p)
                        )
                    ),
                )
            if pipeline == "encoded" and group_size > 1:
                # same dispatch/finalize overlap for the store-backed
                # encoded path (one grouped encode + one scanned scoring
                # dispatch per group; the worker fetches + aggregates)
                from batch3dmot_tpu.infer.predict import (
                    dispatch_predict_scenes,
                    finalize_predict_scenes,
                )

                staged_enc = dispatch_predict_scenes(
                    scorer, items, cfg,
                    buckets=run_buckets, m_pad=run_m_pad,
                    group_pad=group_size, num_batches=enc_num_batches,
                    encodings_list=[
                        enc_by_token[s.scene_token] for s, _ in items
                    ] if use_enc_cache else None,
                )

                def _fin(s=staged_enc, it=items):
                    outs = finalize_predict_scenes(scorer, s)
                    return [
                        (pe, avg, sum(w.num_edges for w in ws))
                        for (pe, avg), (_, ws) in zip(outs, it)
                    ]

                return ("fut", items, ex.submit(_fin))
            return ("fut", items, ex.submit(_score_group, items))

        it = _items()
        staged = _stage(next(it, None))
        while staged is not None:
            staged_next = _stage(next(it, None))  # enqueue BEFORE blocking
            if staged[0] == "cached":
                # per-scene results from a previous (interrupted) run;
                # track ids are scene-local and re-offset at assembly.
                # Counted separately: cached scenes cost ~0 time and would
                # inflate the printed throughput of a resumed run.
                _, scene, payload = staged
                n_scenes += 1
                n_resumed += 1
                n_resumed_edges += int(payload["scored"])
                all_results.append(payload["results"])
                scene_track_counts.append(int(payload["num_tracks"]))
                all_tokens.extend(all_scene_sample_tokens(scene))
            else:
                _, items, fut = staged
                for (scene, _), out in zip(items, fut.result()):
                    n_scenes += 1
                    _assemble(scene, *out)
                    all_tokens.extend(all_scene_sample_tokens(scene))
            staged = staged_next

    # scene-local track ids -> globally unique (applied AFTER the loop so
    # resumed scenes from a previous process keep consistent numbering)
    for results, ntracks in zip(all_results, scene_track_counts):
        if track_offset:
            for boxes in results.values():
                for b in boxes:
                    b["tracking_id"] = str(
                        track_offset + int(b["tracking_id"])
                    )
        track_offset += ntracks
    dt = time.time() - t0

    submission = assemble_submission(
        all_results,
        all_tokens,
        use_camera=cfg.main.sensors_used.get("img", True),
        use_lidar=cfg.main.sensors_used.get("lidar", True),
        use_radar=False,
    )
    os.makedirs(cfg.paths.eval, exist_ok=True)
    sub_path = os.path.join(cfg.paths.eval, "submission.json")
    with open(sub_path, "w") as f:
        json.dump(submission, f)
    unit = "unique edges" if pipeline == "device" else "edges"
    resumed = (
        f" + {n_resumed} resumed ({n_resumed_edges} {unit})" if n_resumed else ""
    )
    print(
        f"predict[{pipeline}]: {n_scenes - n_resumed} scenes, {n_edges} {unit} "
        f"scored in {dt:.1f}s ({n_edges / max(dt, 1e-9):.0f} {unit}/s)"
        f"{resumed} -> {sub_path}"
    )
    return submission


def _init_variables_for_scene_model(cfg: Config, model):
    """Init mm-model variables from a tiny synthetic modality-bearing graph
    (shape-only; real weights come from the checkpoint)."""
    import jax

    from batch3dmot_tpu.data.synthetic import make_synthetic_scene
    from batch3dmot_tpu.graphs import build_window_graph
    from batch3dmot_tpu.train.data import to_padded

    scene = make_synthetic_scene(
        seed=0, num_frames=3, num_tracks=3, with_modalities=True
    )
    g = build_window_graph(scene, 0, 2, cfg.graph_construction)
    example = to_padded(g, 32, 64)
    return jax.jit(model.init)(jax.random.key(0), example)


def _scene_from_store(path: str, windows, with_modalities: bool = False):
    """Reconstruct the SceneDetections view needed by prediction from a
    store + its metadata sidecar.

    Global-frame yaw/velocity are rebuilt from the metadata's rotation
    quaternion and 2D velocity (trailer-track interpolation reads them,
    ``infer/tracks.py``); ego-frame fields come from the sidecar's ``ego``
    entries (written at build time) so no physical quantity on a
    store-reconstructed scene is ever silently zero — stores written before
    the ego sidecar existed are rejected with a rebuild hint rather than
    zero-filled. With ``with_modalities`` the raw
    per-detection modality arrays are re-assembled from the windows' node
    features via ``det_index`` (each detection takes its feature from any
    window containing it — windows store identical copies)."""
    from batch3dmot_tpu import geometry as geo
    from batch3dmot_tpu.data.types import SceneDetections

    meta_path = path.replace(".b3d", "_metadata.json")
    with open(meta_path, "r") as f:
        metadata = json.load(f)
    m = len(metadata)
    scene_token = os.path.basename(path).split("_len")[0]
    frame_idx = np.array([md["time"] for md in metadata], np.int32)
    from batch3dmot_tpu.config import TRACKING_CLASSES

    class_id = np.array(
        [TRACKING_CLASSES[md["category_name"]] for md in metadata], np.int32
    )
    center_g = np.array([md["translation"] for md in metadata], float).reshape(m, 3)
    quats = np.array(
        [md.get("rotation", [1.0, 0.0, 0.0, 0.0]) for md in metadata], float
    ).reshape(m, 4)
    yaw_g = geo.quaternion_yaw(quats) if m else np.zeros((0,))
    vel_g = np.zeros((m, 3))
    for i, md in enumerate(metadata):
        v = md.get("velocity")
        if v:
            vel_g[i, : len(v[:2])] = v[:2]
    # frames sidecar (written at build time): the REAL per-frame sample
    # tokens, covering frames with zero surviving detections — including
    # TRAILING empty frames, which frame_idx.max() would silently drop
    # from the submission. Legacy stores without it fall back to the
    # detection-derived frame count + synthesized tokens.
    frame_tokens = None
    frames_path = path.replace(".b3d", "_frames.json")
    if os.path.exists(frames_path):
        with open(frames_path) as f:
            frame_tokens = json.load(f)
    num_frames = (
        len(frame_tokens) if frame_tokens is not None
        else (int(frame_idx.max()) + 1 if m else 0)
    )
    if any("ego" not in md for md in metadata):
        raise SystemExit(
            f"{meta_path} predates the ego-pose sidecar fields; re-run "
            "build-graphs for this scene (stores are rebuilt per scene, "
            "--skip-existing leaves the others untouched)"
        )
    center_e = np.array([md["ego"]["center"] for md in metadata], float)
    yaw_e = np.array([md["ego"]["yaw"] for md in metadata], float)
    vel_e = np.array([md["ego"]["vel"] for md in metadata], float)
    token_map = {}
    token_id = np.full(m, -1, np.int32)
    for i, md in enumerate(metadata):
        tok = md.get("token")
        if tok:
            token_id[i] = token_map.setdefault(tok, len(token_map))

    img = lidar = radar = None
    if with_modalities:
        from batch3dmot_tpu.graph import IMG_SHAPE, LIDAR_SHAPE, RADAR_SHAPE

        has = {
            name: any(
                getattr(w, name) is not None and getattr(w, name).size
                for w in windows
            )
            for name in ("img", "lidar", "radar")
        }
        img_dt = next(
            (w.img.dtype for w in windows if w.img is not None and w.img.size),
            np.float32,
        )
        img = np.zeros((m, *IMG_SHAPE), img_dt) if has["img"] else None
        lidar = np.zeros((m, *LIDAR_SHAPE), np.float32) if has["lidar"] else None
        radar = np.zeros((m, *RADAR_SHAPE), np.float32) if has["radar"] else None
        for w in windows:
            for name, buf in (("img", img), ("lidar", lidar), ("radar", radar)):
                arr = getattr(w, name)
                if buf is not None and arr is not None and arr.size:
                    buf[w.det_index] = arr

    return SceneDetections(
        scene_token=scene_token,
        num_frames=num_frames,
        frame_idx=frame_idx,
        center_g=center_g,
        yaw_g=np.asarray(yaw_g, float).reshape(m),
        vel_g=vel_g,
        center_e=center_e.reshape(m, 3),
        yaw_e=yaw_e.reshape(m),
        vel_e=vel_e.reshape(m, 3),
        wlh=np.array([md["size"] for md in metadata], float).reshape(m, 3),
        class_id=class_id,
        score=np.array([md["score"] for md in metadata], float),
        token_id=token_id,
        metadata=metadata,
        frame_tokens=frame_tokens,
        img=img,
        lidar=lidar,
        radar=radar,
    )


def cmd_preprocess(args) -> None:
    """L2 modality preprocessing stage: per-annotation artifacts for encoder
    training (the reference's ``preprocess_{img,lidar,radar}.py`` CLIs,
    ``preprocess_img.py:170-176``, ``preprocess_lidar.py:278-304``,
    ``preprocess_radar.py:219-234``). Idempotent per modality via
    ``--skip-existing``."""
    cfg = _load_config(args)
    from batch3dmot_tpu.data.nuscenes_tables import NuScenesTables
    from batch3dmot_tpu.data.preprocess import (
        generate_image_annotations,
        preprocess_lidar_annotations,
        preprocess_radar_annotations,
    )

    tables = NuScenesTables(cfg.paths.data, cfg.main.version)
    pre = cfg.paths.preprocessed
    os.makedirs(pre, exist_ok=True)
    wanted = (
        ("img", "lidar", "radar") if args.modality == "all" else (args.modality,)
    )
    skip = getattr(args, "skip_existing", False)

    def done(kind):
        return os.path.join(pre, f"processed_{kind}_anns.json")

    sj = cfg.paths.splits_json or None
    t0 = time.time()
    if "img" in wanted and not (skip and os.path.exists(done("img"))):
        anns = generate_image_annotations(tables, cfg, splits_json=sj)
        with open(done("img"), "w") as f:
            json.dump(anns, f)
        n = sum(len(v) for v in anns.values())
        print(f"preprocess img: {n} annotations -> {done('img')}")
    def _need_img_anns(kind):
        # lidar/radar membership follows the image-annotation records
        # (reference preprocess_{lidar,radar}.py load params.paths.image_anns)
        if not os.path.exists(done("img")):
            raise SystemExit(
                f"{kind} preprocessing needs processed_img_anns.json "
                "(dataset membership + camera->radar channels); run "
                "`preprocess --modality img` first"
            )
        with open(done("img")) as f:
            return json.load(f)

    if "lidar" in wanted and not (skip and os.path.exists(done("lidar"))):
        anns = preprocess_lidar_annotations(
            tables, os.path.join(pre, "lidar"), _need_img_anns("lidar"),
            cfg, splits_json=sj,
        )
        with open(done("lidar"), "w") as f:
            json.dump(anns, f)
        n = sum(len(v) for v in anns.values())
        print(f"preprocess lidar: {n} annotations -> {done('lidar')}")
    if "radar" in wanted and not (skip and os.path.exists(done("radar"))):
        img_anns = _need_img_anns("radar")
        anns = preprocess_radar_annotations(
            tables, os.path.join(pre, "radar"), img_anns, cfg, splits_json=sj
        )
        with open(done("radar"), "w") as f:
            json.dump(anns, f)
        n = sum(len(v) for v in anns.values())
        print(f"preprocess radar: {n} annotations -> {done('radar')}")
    print(f"preprocess: done in {time.time() - t0:.1f}s -> {pre}")


def cmd_concat_jsons(args) -> None:
    """Merge two split-keyed annotation JSONs (mini detection-file assembly;
    reference ``utils/concat_jsons.py:10-34`` extends file1's split lists
    with file2's)."""
    with open(args.file1) as f:
        a = json.load(f)
    with open(args.file2) as f:
        b = json.load(f)
    for split, entries in b.items():
        if split in a and isinstance(a[split], list):
            a[split].extend(entries)
        else:
            a[split] = entries
    with open(args.outfile, "w") as f:
        json.dump(a, f)
    print(
        f"concat-jsons: {list(a.keys())} -> {args.outfile} "
        f"({sum(len(v) for v in a.values() if isinstance(v, list))} entries)"
    )


def cmd_validate_data(args) -> None:
    """Doctor pass over the configured data plane (tables, splits JSON,
    detection JSON) BEFORE any expensive stage — actionable findings
    instead of a KeyError hours into preprocessing. Exit code 1 on errors
    (and on warnings with --strict). First command of the real-data
    runbook (README)."""
    cfg = _load_config(args)
    from batch3dmot_tpu.data.validate import validate_config_data

    findings = validate_config_data(cfg, split=args.split)
    for f in findings:
        print(f)
    n_err = sum(1 for f in findings if f.level == "error")
    n_warn = sum(1 for f in findings if f.level == "warn")
    print(
        f"validate-data: {n_err} error(s), {n_warn} warning(s) for "
        f"dataroot={cfg.paths.data} version={cfg.main.version} "
        f"detector={cfg.main.detections}"
    )
    if n_err or (args.strict and n_warn):
        raise SystemExit(1)


def cmd_export_gt(args) -> None:
    """Export GT tracking boxes from the nuScenes tables into the JSON the
    native evaluator consumes ({"boxes": [...]}) — lets `eval` run without
    the devkit."""
    cfg = _load_config(args)
    from batch3dmot_tpu.data.nuscenes_tables import NuScenesTables

    from batch3dmot_tpu.config import TRACKING_CLASSES

    tables = NuScenesTables(cfg.paths.data, cfg.main.version)
    id2name = {v: k for k, v in TRACKING_CLASSES.items()}
    boxes = []
    frames = []
    # GT export covers the EVAL split only — exporting every scene would
    # make the scorer treat all other splits' frames as missed tracks.
    try:
        metas = tables.scene_metas_for_split(
            cfg.eval.eval_set, cfg.paths.splits_json or None
        )
    except KeyError as e:
        raise SystemExit(str(e))
    for scene in metas:
        for tok in tables.scene_sample_tokens(scene["token"]):
            frames.append(tok)
            gt = tables.gt_frame_boxes(tok)
            for i in range(len(gt)):
                boxes.append(
                    {
                        "sample_token": tok,
                        "translation": gt.center[i].tolist(),
                        "tracking_name": id2name[int(gt.class_id[i])],
                        "instance": gt.instance[i],
                    }
                )
    with open(args.out, "w") as f:
        json.dump({"boxes": boxes, "frames": frames}, f)
    print(f"export-gt: {len(boxes)} boxes over {len(frames)} frames -> {args.out}")


def cmd_import_checkpoint(args) -> None:
    """Convert a reference torch ``.pth`` checkpoint into this framework's
    msgpack variables (bit-parity importers, ``utils/torch_import.py``;
    forward-parity tested in ``tests/test_torch_import.py``)."""
    from batch3dmot_tpu.utils import torch_import as ti
    from batch3dmot_tpu.utils.checkpoint import save_checkpoint

    importers = {
        "resnet": lambda sd: ti.import_resnet_ae(sd),
        "pointnet": ti.import_pointnet,
        "radarnet": ti.import_radarnet,
        "mm": ti.import_mm_gnn,
        "pose": ti.import_pose_gnn,
    }
    import jax

    sd = ti.load_torch_state_dict(args.torch)
    variables = importers[args.arch](sd)
    path = save_checkpoint(args.out, variables, metadata={"source": args.torch})
    n = sum(np.asarray(x).size for x in jax.tree.leaves(variables))
    print(f"import-checkpoint[{args.arch}]: {n} params {args.torch} -> {path}")


def cmd_eval(args) -> None:
    with open(args.submission) as f:
        submission = json.load(f)

    if not getattr(args, "devkit", False) and not args.gt:
        raise SystemExit("eval: --gt is required (or pass --devkit)")
    if getattr(args, "devkit", False):
        # official nuScenes TrackingEval (requires nuscenes-devkit + dataset)
        from batch3dmot_tpu.eval.nuscenes_eval import devkit_available, run_official_eval

        if not devkit_available():
            raise SystemExit(
                "nuscenes-devkit is not installed; re-run without --devkit "
                "to use the native AMOTA scorer"
            )
        cfg = _load_config(args)
        metrics = run_official_eval(submission, cfg)
        print(json.dumps(metrics))
        return

    from batch3dmot_tpu.eval.tracking_metrics import evaluate_tracking

    with open(args.gt) as f:
        gt = json.load(f)
    pred_boxes = [b for boxes in submission["results"].values() for b in boxes]
    frames = list(submission["results"].keys())
    res = evaluate_tracking(gt["boxes"], pred_boxes, frames)
    print(res.summary())
    from batch3dmot_tpu.eval.tracking_metrics import json_safe

    # json_safe: a run where no class ever matched reports NaN internally
    # (devkit semantics); emit strict-JSON null instead of a bare NaN
    print(json.dumps(json_safe({"amota": res.amota, "amotp": res.amotp})))


def cmd_demo(args) -> None:
    """Full synthetic pipeline: build -> train -> predict -> eval."""
    import tempfile

    from batch3dmot_tpu.eval.tracking_metrics import (
        evaluate_tracking,
        gt_boxes_from_scene,
    )

    tmp = tempfile.mkdtemp(prefix="b3d_demo_")
    args.config = None
    args.set = (args.set or []) + [
        f"paths.tmp={tmp}",
        "graph_construction.batch_size_graph=3",
        "graph_construction.top_knn_nodes=5",
        "gnn.gnn_depth=2",
        "gnn.lr=1e-3",
        "gnn.weight_decay=0.0",
    ]
    args.synthetic = args.synthetic or 3
    cmd_build_graphs(args)

    args.model = "pose"
    args.epochs = args.epochs or 6
    args.init_checkpoint = None
    cmd_train_gnn(args)

    cfg = _load_config(args)
    ckpts = sorted(
        glob.glob(os.path.join(cfg.paths.models, "gnn", "*.msgpack")),
        key=os.path.getmtime,
    )
    submission = _run_predict(cfg, ckpts[-1] if ckpts else None, "pose")

    # evaluate against the synthetic GT
    scenes = _build_synthetic_scenes(cfg, args.synthetic, False)
    gt_boxes = [b for s in scenes for b in gt_boxes_from_scene(s)]
    pred_boxes = [b for boxes in submission["results"].values() for b in boxes]
    frames = list(submission["results"].keys())
    res = evaluate_tracking(gt_boxes, pred_boxes, frames)
    print(res.summary())
    print(f"demo complete: AMOTA={res.amota:.3f} (artifacts in {tmp})")


def main(argv: Optional[List[str]] = None) -> None:
    parser = argparse.ArgumentParser(prog="batch3dmot_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    def common(p):
        p.add_argument("--config", type=str, default=None)
        p.add_argument("--set", action="append", default=[],
                       help="override section.key=value")
        return p

    def devices_arg(p):
        p.add_argument("--devices", type=int, default=None,
                       help="data-parallel device mesh size (default: 1)")
        return p

    p = common(sub.add_parser("preprocess"))
    p.add_argument("--modality", choices=["img", "lidar", "radar", "all"],
                   default="all")
    p.add_argument("--skip-existing", action="store_true",
                   help="skip modalities whose anns JSON already exists")
    p.set_defaults(fn=cmd_preprocess)

    p = common(sub.add_parser("build-graphs"))
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate N synthetic scenes instead of nuScenes")
    p.add_argument("--skip-existing", action="store_true",
                   help="skip scenes whose store already exists (resume)")
    p.set_defaults(fn=cmd_build_graphs)

    from batch3dmot_tpu.models.registry import MODEL_REGISTRY

    model_names = sorted(MODEL_REGISTRY)

    p = devices_arg(common(sub.add_parser("train-gnn")))
    p.add_argument("--model", choices=model_names, default="mm",
                   help="model family: short aliases (pose/mm) follow the "
                        "config's sensors; reference family names "
                        "(clr_att_gnn, cl_att_gnn, cl_gnn_trad, "
                        "gnn_baseline, ...) fix their modalities")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--init-checkpoint", type=str, default=None)
    p.add_argument("--fused-steps", type=int, default=8,
                   help="optimizer steps fused into one device program")
    p.add_argument("--profile", type=str, default=None,
                   help="write a jax.profiler trace to this directory")
    p.add_argument("--encoded", action="store_true",
                   help="precompute the frozen encoders once per scene and "
                        "train on gathered embeddings (removes the L-fold "
                        "per-window re-encoding)")
    p.add_argument("--device-dataset", action="store_true",
                   help="upload the whole padded dataset to the device once "
                        "and run each epoch as one scanned program (no "
                        "per-epoch batch re-upload — the wall-clock floor "
                        "through a remote-TPU relay); multimodal models "
                        "need --encoded, pose trains on the plain window "
                        "dataset; with --devices N the dataset shards "
                        "along the window axis across the mesh; must fit "
                        "in (combined) HBM (B3D_DEVICE_DATASET_GB budget "
                        "per chip, default 6). With --encoded this is "
                        "AUTOMATIC whenever the estimated dedup dataset "
                        "fits the budget")
    p.add_argument("--stream", action="store_true",
                   help="with --encoded: force scene-streaming training "
                        "(memory bounded by one scene) instead of the "
                        "automatic device-resident upgrade")
    for enc in ("resnet", "pointnet", "radarnet"):
        p.add_argument(f"--{enc}-checkpoint", type=str, default=None,
                       help=f"graft a pretrained {enc} encoder checkpoint "
                            "into the tracker's frozen submodule")
    p.set_defaults(fn=cmd_train_gnn)

    for name, fn in [
        ("train-resnet", cmd_train_resnet),
        ("train-pointnet", cmd_train_pointnet),
        ("train-radarnet", cmd_train_radarnet),
    ]:
        p = devices_arg(common(sub.add_parser(name)))
        p.add_argument("--epochs", type=int, default=None)
        p.add_argument("--synthetic", action="store_true",
                       help="train on random shape-compatible batches")
        p.add_argument("--device-dataset", action="store_true",
                       help="decode/load every item ONCE, upload the stacked "
                            "dataset to the device, and run each epoch as "
                            "one scanned program with the loader's per-epoch "
                            "randomness (augmentation, subsampling) in-graph "
                            "— removes both the per-epoch host decode work "
                            "and the per-batch relay round trips; with "
                            "--devices N the dataset shards across the mesh "
                            "(B3D_DEVICE_DATASET_GB budget per chip)")
        p.set_defaults(fn=fn)

    p = devices_arg(common(sub.add_parser("predict")))
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--model", choices=model_names, default="mm")
    p.add_argument("--pipeline",
                   choices=["auto", "windows", "encoded", "device"],
                   default="auto",
                   help="windows: per-window scoring; encoded: encode-once "
                        "(mm default); device: fused on-device graph build + "
                        "scoring straight from source data")
    p.add_argument("--synthetic", type=int, default=0,
                   help="(--pipeline device) predict N synthetic scenes")
    p.add_argument("--aot-cache", type=str, default=None,
                   help="(--pipeline device) dir of serialized AOT-exported "
                        "programs; kills the cold remote compile for serving")
    p.add_argument("--skip-existing", action="store_true",
                   help="resume an interrupted run: scenes with a per-scene "
                        "results JSON under <eval>/predict/ are loaded, not "
                        "re-scored (the submission still covers every scene)")
    p.set_defaults(fn=cmd_predict)

    p = sub.add_parser("concat-jsons")
    p.add_argument("--file1", required=True)
    p.add_argument("--file2", required=True)
    p.add_argument("--outfile", required=True)
    p.set_defaults(fn=cmd_concat_jsons)

    p = common(sub.add_parser("validate-data"))
    p.add_argument("--strict", action="store_true",
                   help="exit nonzero on warnings too")
    p.add_argument("--split", default=None,
                   help="split to validate (default: graph_construction.split)")
    p.set_defaults(fn=cmd_validate_data)

    p = common(sub.add_parser("export-gt"))
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_export_gt)

    p = common(sub.add_parser("eval"))
    p.add_argument("--submission", required=True)
    p.add_argument("--gt", default=None,
                   help="GT boxes JSON (export-gt output); required unless --devkit")
    p.add_argument("--devkit", action="store_true",
                   help="score with the official nuScenes TrackingEval "
                        "(needs nuscenes-devkit + dataset) instead of the "
                        "native scorer")
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("import-checkpoint")
    p.add_argument("--torch", required=True, help="reference .pth checkpoint")
    p.add_argument("--arch", required=True,
                   choices=["resnet", "pointnet", "radarnet", "mm", "pose"])
    p.add_argument("--out", required=True, help="output .msgpack path")
    p.set_defaults(fn=cmd_import_checkpoint)

    p = common(sub.add_parser("demo"))
    p.add_argument("--synthetic", type=int, default=3)
    p.add_argument("--epochs", type=int, default=None)
    p.set_defaults(fn=cmd_demo)

    args = parser.parse_args(argv)
    return args.fn(args)


def script_main() -> int:
    """Console entry point (pyproject). main() returns command results for
    in-process callers/tests; setuptools wraps the entry point in
    sys.exit(fn()), so this discards them and returns a proper status."""
    main()
    return 0


if __name__ == "__main__":
    main()
