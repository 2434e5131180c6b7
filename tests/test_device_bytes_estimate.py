"""Pin `cli._estimate_dedup_device_bytes` to the actually-materialized
dataset's bytes (VERDICT r4 weak #7: the per-node/per-edge byte constants
were hand-derived from the PaddedGraph layout with no test asserting them —
a silent field drift would misroute the default `--encoded` path at exactly
trainval scale, where the post-materialization guard falls back to the 40x
slower streaming path without anyone noticing why)."""

import glob
import os

import jax

from batch3dmot_tpu.cli import _estimate_dedup_device_bytes, main
from batch3dmot_tpu.config import Config

def test_dedup_byte_estimate_pins_materialized_nbytes(tmp_path):
    main([
        "build-graphs", "--synthetic", "2",
        "--set", f"paths.tmp={tmp_path}",
        "--set", "graph_construction.batch_size_graph=2",
        "--set", "graph_construction.synthetic_frames=8",
        "--set", "graph_construction.synthetic_tracks=6",
    ])
    cfg = Config()
    cfg.apply_overrides([f"paths.tmp={tmp_path}"])
    stores = sorted(glob.glob(os.path.join(cfg.paths.graphs_dir, "*.b3d")))
    assert len(stores) == 2

    est = _estimate_dedup_device_bytes(stores)

    # Materialize exactly what cmd_train_gnn's device-resident branch would
    # (encoded_items -> materialize_encoded_datasets_dedup).
    from batch3dmot_tpu.cli import _scene_from_store
    from batch3dmot_tpu.io import GraphStoreReader
    from batch3dmot_tpu.models import MultimodalGNN
    from batch3dmot_tpu.train.data import to_padded
    from batch3dmot_tpu.train.encoded import (
        materialize_encoded_datasets_dedup,
        precompute_scene_encodings,
    )

    model = MultimodalGNN(depth=2)
    items = []
    variables = None
    for p in stores:
        windows = GraphStoreReader(p).windows()
        scene = _scene_from_store(p, windows, with_modalities=True)
        if variables is None:
            from batch3dmot_tpu.graph import pick_bucket

            w0 = next(w for w in windows if w.num_edges > 0)
            example = to_padded(w0, *pick_bucket(w0.num_nodes, w0.num_edges))
            variables = jax.jit(model.init)(jax.random.key(0), example)
        enc = precompute_scene_encodings(model, variables, scene)
        items.extend(
            (w, enc) for w in windows
            if w.num_nodes > 0 and w.num_edges > 0
        )
    groups = materialize_encoded_datasets_dedup(items)

    # actual bytes, counted the way _fit_device_dataset counts them
    # (shared table arrays once, by object identity)
    seen = set()
    actual = 0
    for g in groups:
        for a in jax.tree.leaves(g[:2]):
            if id(a) not in seen:
                seen.add(id(a))
                actual += a.nbytes

    # The estimate mirrors group_sizes_by_bucket's uniform-bucket
    # coalescing (round-5 fix: per-window pick_bucket sums undercounted
    # the trainval set ~25%) and counts the empty pad slot per group, so
    # it must sit within 5% of the real figure; a PaddedGraph/table
    # layout or grouping drift breaks this instead of silently
    # misrouting trainval-scale training.
    assert abs(est - actual) <= 0.05 * actual, (est, actual)

def test_dedup_byte_estimate_fallback_without_sidecars(tmp_path):
    """Deleting the metadata sidecars exercises the dets-from-window-count
    fallback; the estimate must stay the same order of magnitude."""
    main([
        "build-graphs", "--synthetic", "1",
        "--set", f"paths.tmp={tmp_path}",
        "--set", "graph_construction.batch_size_graph=2",
        "--set", "graph_construction.synthetic_frames=8",
        "--set", "graph_construction.synthetic_tracks=6",
    ])
    cfg = Config()
    cfg.apply_overrides([f"paths.tmp={tmp_path}"])
    stores = sorted(glob.glob(os.path.join(cfg.paths.graphs_dir, "*.b3d")))
    with_sidecar = _estimate_dedup_device_bytes(stores)
    for p in stores:
        os.remove(p.replace(".b3d", "_metadata.json"))
    without = _estimate_dedup_device_bytes(stores)
    assert 0.3 * with_sidecar < without < 3 * with_sidecar
