"""Fused Pallas message-passing kernel vs the XLA forward: numerics must
match within f32 reassociation tolerance on real padded window batches
(run through the Pallas interpreter on the CPU backend)."""

import jax
import numpy as np
import pytest

from batch3dmot_tpu.config import GraphConstructionConfig
from batch3dmot_tpu.data.synthetic import make_synthetic_scene
from batch3dmot_tpu.graph import batch_graphs, pad_graph
from batch3dmot_tpu.graphs import build_scene_graphs
from batch3dmot_tpu.models import MultimodalGNN
from batch3dmot_tpu.ops.pallas_mp import fused_scores_from_encodings


@pytest.fixture(scope="module")
def setup():
    cfg = GraphConstructionConfig(top_knn_nodes=5)
    scene = make_synthetic_scene(
        seed=3, num_frames=6, num_tracks=6, with_modalities=True,
        modality_dropout=0.3,
    )
    windows = [w for w in build_scene_graphs(scene, 3, cfg) if w.num_edges > 0][:4]
    mn, me = 32, 128
    graphs = [
        pad_graph(
            pose=w.pose, edge_src=w.edge_src, edge_dst=w.edge_dst,
            edge_attr=w.edge_attr, node_time=w.node_time,
            node_class=w.node_class, max_nodes=mn, max_edges=me,
            img=scene.img[w.det_index], lidar=scene.lidar[w.det_index],
            radar=scene.radar[w.det_index],
        )
        for w in windows
    ]
    batch = batch_graphs(graphs)
    return windows, batch


def _encodings(model, variables, batch):
    import jax.numpy as jnp

    def enc(g):
        xi, pn, rn = model.apply(
            variables, g.img, g.lidar, g.radar, method=model.encode_frozen
        )
        lp = g.lidar.sum(axis=(1, 2)) != 0
        rp = g.radar.sum(axis=(1, 2)) != 0
        return xi, pn, rn, lp, rp

    return jax.vmap(enc)(batch)


@pytest.mark.slow
@pytest.mark.parametrize("use_attention", [True, False])
def test_fused_kernel_matches_xla_forward(setup, use_attention):
    windows, batch = setup
    model = MultimodalGNN(depth=3, use_attention=use_attention)
    variables = jax.jit(model.init)(jax.random.key(0), jax.tree.map(lambda x: x[0], batch))

    xi, pn, rn, lp, rp = _encodings(model, variables, batch)

    ref_scores, _ = jax.vmap(
        lambda g, a, b, c, d, e: model.apply(
            variables, g, a, b, c, d, e, method=model.forward_from_encodings
        )
    )(batch, xi, pn, rn, lp, rp)
    fused = fused_scores_from_encodings(
        model, variables, batch, xi, pn, rn, lp, rp, interpret=True
    )

    ref_scores = np.asarray(ref_scores)
    fused = np.asarray(fused)
    for k, w in enumerate(windows):
        np.testing.assert_allclose(
            fused[k, : w.num_edges], ref_scores[k, : w.num_edges],
            rtol=2e-4, atol=2e-5,
        )


def test_fused_kernel_full_depth(setup):
    windows, batch = setup
    model = MultimodalGNN()  # depth 6, production widths
    variables = jax.jit(model.init)(jax.random.key(1), jax.tree.map(lambda x: x[0], batch))
    xi, pn, rn, lp, rp = _encodings(model, variables, batch)
    ref_scores, _ = jax.vmap(
        lambda g, a, b, c, d, e: model.apply(
            variables, g, a, b, c, d, e, method=model.forward_from_encodings
        )
    )(batch, xi, pn, rn, lp, rp)
    fused = fused_scores_from_encodings(
        model, variables, batch, xi, pn, rn, lp, rp, interpret=True
    )
    for k, w in enumerate(windows):
        np.testing.assert_allclose(
            np.asarray(fused)[k, : w.num_edges],
            np.asarray(ref_scores)[k, : w.num_edges],
            rtol=2e-4, atol=2e-5,
        )


@pytest.mark.slow
def test_scene_encoded_scorer_fused_integration(setup):
    """SceneEncodedScorer(fused=True) through the interpreter must match the
    default (XLA) scorer on a real scene."""
    from batch3dmot_tpu.config import GraphConstructionConfig
    from batch3dmot_tpu.data.synthetic import make_synthetic_scene
    from batch3dmot_tpu.graphs import build_scene_graphs
    from batch3dmot_tpu.infer.predict import SceneEncodedScorer

    cfg = GraphConstructionConfig(top_knn_nodes=5)
    scene = make_synthetic_scene(
        seed=5, num_frames=5, num_tracks=5, with_modalities=True
    )
    windows = [w for w in build_scene_graphs(scene, 3, cfg) if w.num_edges > 0]
    model = MultimodalGNN(depth=2)
    _, batch = setup
    variables = jax.jit(model.init)(
        jax.random.key(2), jax.tree.map(lambda x: x[0], batch)
    )
    buckets = ((32, 128),)
    plain = SceneEncodedScorer(model, variables, fused=False)
    fused = SceneEncodedScorer(model, variables, fused=True)
    s_plain = plain.score_scene(scene, windows, windows_per_batch=4, buckets=buckets)
    s_fused = fused.score_scene(scene, windows, windows_per_batch=4, buckets=buckets)
    for a, b in zip(s_plain, s_fused):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_device_pipeline_fused_matches_unfused():
    """DeviceScenePipeline(fused=True) (interpreter) == fused=False scores."""
    from batch3dmot_tpu.infer.device_pipeline import DeviceScenePipeline

    scene = make_synthetic_scene(
        seed=6, num_frames=5, num_tracks=4, with_modalities=True
    )
    model = MultimodalGNN(depth=2)
    from batch3dmot_tpu.graph import pad_graph

    g = pad_graph(
        pose=np.zeros((4, 19), np.float32),
        edge_src=np.zeros(4, np.int32), edge_dst=np.zeros(4, np.int32),
        edge_attr=np.zeros((4, 4), np.float32),
        node_time=np.zeros(4, np.int32), node_class=np.ones(4, np.int32),
        max_nodes=8, max_edges=16,
        img=np.zeros((4, 32, 32, 3), np.float32),
        lidar=np.zeros((4, 128, 3), np.float32),
        radar=np.zeros((4, 64, 4), np.float32),
    )
    variables = jax.jit(model.init)(jax.random.key(3), g)
    plain = DeviceScenePipeline(model, variables, window_len=3, k=4, fused=False)
    fused = DeviceScenePipeline(model, variables, window_len=3, k=4, fused=True)
    a = plain.score_scene(scene)
    b = fused.score_scene(scene)
    assert set(a) == set(b) and a
    for key in a:
        assert abs(a[key] - b[key]) < 5e-4, key


def test_fused_pose_logits_match_xla():
    """fused_logits_pose == PoseGNN.__call__ logits (interpreter)."""
    from batch3dmot_tpu.models import PoseGNN
    from batch3dmot_tpu.ops.pallas_mp import fused_logits_pose
    from batch3dmot_tpu.graph import pad_graph, batch_graphs

    cfg = GraphConstructionConfig(top_knn_nodes=5)
    scene = make_synthetic_scene(seed=9, num_frames=6, num_tracks=6)
    windows = [w for w in build_scene_graphs(scene, 3, cfg) if w.num_edges > 0][:4]
    graphs = [
        pad_graph(
            pose=w.pose, edge_src=w.edge_src, edge_dst=w.edge_dst,
            edge_attr=w.edge_attr, node_time=w.node_time,
            node_class=w.node_class, max_nodes=32, max_edges=128,
        )
        for w in windows
    ]
    batch = batch_graphs(graphs)
    model = PoseGNN(depth=4)
    variables = jax.jit(model.init)(jax.random.key(0), graphs[0])
    ref, _ = jax.vmap(lambda g: model.apply(variables, g))(batch)
    fused = fused_logits_pose(model, variables, batch, interpret=True)
    # the HBM-staged variant's attention-free path (dummy att operand)
    fused_hbm = fused_logits_pose(
        model, variables, batch, interpret=True, force_tiles=4,
        force_variant="hbm",
    )
    for k, w in enumerate(windows):
        np.testing.assert_allclose(
            np.asarray(fused)[k, : w.num_edges],
            np.asarray(ref)[k, : w.num_edges],
            rtol=2e-4, atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(fused_hbm)[k, : w.num_edges],
            np.asarray(ref)[k, : w.num_edges],
            rtol=2e-4, atol=2e-5,
        )


def test_fused_full_forward_matches_call(setup):
    """fused_scores_full == MultimodalGNN.__call__ scores (interpreter)."""
    from batch3dmot_tpu.ops.pallas_mp import fused_scores_full

    windows, batch = setup
    model = MultimodalGNN(depth=2)
    variables = jax.jit(model.init)(
        jax.random.key(4), jax.tree.map(lambda x: x[0], batch)
    )
    ref, _ = jax.vmap(lambda g: model.apply(variables, g))(batch)
    fused = fused_scores_full(model, variables, batch, interpret=True)
    for k, w in enumerate(windows):
        np.testing.assert_allclose(
            np.asarray(fused)[k, : w.num_edges],
            np.asarray(ref)[k, : w.num_edges],
            rtol=2e-4, atol=2e-5,
        )


def test_tiles_for_vmem_model():
    """Bucket gating: single-shot up to (128, 1024)-product; edge-tiled
    (in-kernel one-hot generation) up to 8192 edges / 1024 nodes with
    8-aligned tile sizes; XLA beyond."""
    from batch3dmot_tpu.ops.pallas_mp import _tiles_for, fused_supported

    assert _tiles_for(64, 256) == 1
    assert _tiles_for(128, 1024) == 1
    assert _tiles_for(128, 2048) == 2
    assert _tiles_for(128, 4096) == 8
    assert _tiles_for(256, 2048) == 4
    # beyond 512k edge*node: the round-3 [1, E] index-row regime with
    # fixed hardware-picked tile sizes (scripts/probe_tiled_big.py)
    assert _tiles_for(256, 4096) == 16  # grid-robust (probed at 8 AND 40)
    assert _tiles_for(512, 4096) == 16
    # 4M-product buckets fit only at short (<= 8-window) grids
    assert _tiles_for(512, 8192) is None  # unknown grid -> treated long
    assert _tiles_for(512, 8192, grid=40) is None
    assert _tiles_for(512, 8192, grid=8) == 16
    assert _tiles_for(1024, 32768) is None
    # the HBM-staged variant (round 3) covers (512, 8192) at ANY grid —
    # the VMEM-resident variants stay preferred where they fit
    from batch3dmot_tpu.ops.pallas_mp import _hbm_tiles_for

    assert _hbm_tiles_for(512, 8192) == 16
    assert _hbm_tiles_for(1024, 8192) is None
    assert _hbm_tiles_for(512, 16384) is None
    assert fused_supported(256, 4096) and fused_supported(512, 8192)
    assert fused_supported(512, 8192, 40)
    assert fused_supported(512, 8192, 8)
    assert not fused_supported(1024, 16384)
    # the dispatch must mirror the guard AT THE CALLER'S EFFECTIVE GRID:
    # the grouped scene dispatch vmaps S scenes over an 8-window program
    # (effective grid S x 8) — choosing by the local batch dim would
    # compile the short-grid VMEM variant on a long grid (compiler OOM)
    from batch3dmot_tpu.ops.pallas_mp import _select_variant

    assert _select_variant(512, 8192, grid=8) == (16, "vmem")
    assert _select_variant(512, 8192, grid=40) == (16, "hbm")
    assert _select_variant(256, 4096, grid=40) == (16, "vmem")
    # Pallas cannot batch ANY-memory-space operands: under jax.vmap (the
    # grouped scene dispatch) the HBM-staged variant is unavailable —
    # guard and dispatch must agree on the fallback to XLA
    assert not fused_supported(512, 8192, 80, vmapped=True)
    assert fused_supported(256, 4096, 80, vmapped=True)
    assert _select_variant(512, 8192, grid=80, force_variant="vmem") == (
        None, "vmem",
    )


def test_fused_kernel_tiled_matches_xla(setup):
    """The edge-tiled kernel variant (forced tiling at a small bucket) must
    match the XLA forward exactly like the single-shot kernel does."""
    windows, batch = setup
    model = MultimodalGNN(depth=3)
    variables = jax.jit(model.init)(
        jax.random.key(2), jax.tree.map(lambda x: x[0], batch)
    )
    xi, pn, rn, lp, rp = _encodings(model, variables, batch)
    ref_scores, _ = jax.vmap(
        lambda g, a, b, c, d, e: model.apply(
            variables, g, a, b, c, d, e, method=model.forward_from_encodings
        )
    )(batch, xi, pn, rn, lp, rp)
    for tiles in (2, 4):
        fused = fused_scores_from_encodings(
            model, variables, batch, xi, pn, rn, lp, rp,
            interpret=True, force_tiles=tiles,
        )
        for k, w in enumerate(windows):
            np.testing.assert_allclose(
                np.asarray(fused)[k, : w.num_edges],
                np.asarray(ref_scores)[k, : w.num_edges],
                rtol=2e-4, atol=2e-5,
            )


def test_fused_kernel_hbm_matches_xla(setup):
    """The HBM-staged tiled variant (forced at a small bucket) must match
    the XLA forward like the VMEM-resident variants do — it is the
    production path for (512, 8192) windows at long grids."""
    windows, batch = setup
    model = MultimodalGNN(depth=3)
    variables = jax.jit(model.init)(
        jax.random.key(2), jax.tree.map(lambda x: x[0], batch)
    )
    xi, pn, rn, lp, rp = _encodings(model, variables, batch)
    ref_scores, _ = jax.vmap(
        lambda g, a, b, c, d, e: model.apply(
            variables, g, a, b, c, d, e, method=model.forward_from_encodings
        )
    )(batch, xi, pn, rn, lp, rp)
    fused = fused_scores_from_encodings(
        model, variables, batch, xi, pn, rn, lp, rp,
        interpret=True, force_tiles=4, force_variant="hbm",
    )
    for k, w in enumerate(windows):
        np.testing.assert_allclose(
            np.asarray(fused)[k, : w.num_edges],
            np.asarray(ref_scores)[k, : w.num_edges],
            rtol=2e-4, atol=2e-5,
        )


def test_fused_kernel_all_masked_window(setup):
    """A batch slot holding an entirely-empty (all-padding) window — as
    incomplete batches produce via empty_graph fill — must yield finite
    scores in every slot and not disturb the real windows' scores."""
    import dataclasses

    import jax.numpy as jnp

    windows, batch = setup
    model = MultimodalGNN(depth=2)
    variables = jax.jit(model.init)(
        jax.random.key(4), jax.tree.map(lambda x: x[0], batch)
    )
    xi, pn, rn, lp, rp = _encodings(model, variables, batch)
    base = np.asarray(
        fused_scores_from_encodings(
            model, variables, batch, xi, pn, rn, lp, rp, interpret=True
        )
    )
    # blank out the last slot entirely
    def blank_last(a):
        a = np.asarray(a).copy()
        a[-1] = 0
        return jnp.asarray(a)

    wiped = dataclasses.replace(
        batch,
        pose=blank_last(batch.pose),
        edge_attr=blank_last(batch.edge_attr),
        edge_src=blank_last(batch.edge_src),
        edge_dst=blank_last(batch.edge_dst),
        node_mask=blank_last(batch.node_mask),
        edge_mask=blank_last(batch.edge_mask),
    )
    out = np.asarray(
        fused_scores_from_encodings(
            model, variables, wiped, xi, pn, rn, lp, rp, interpret=True
        )
    )
    assert np.isfinite(out).all()
    for k, w in enumerate(windows[:-1]):
        np.testing.assert_allclose(
            out[k, : w.num_edges], base[k, : w.num_edges], rtol=1e-6
        )


@pytest.mark.slow
def test_fused_kernel_randomized_configs():
    """Property sweep: random scene densities, window lengths, kNN, model
    depths, modality subsets and forced tile counts must all match the XLA
    forward within f32 reassociation tolerance (interpreter)."""
    rng = np.random.default_rng(123)
    for trial in range(6):
        tracks = int(rng.integers(3, 9))
        frames = int(rng.integers(4, 8))
        L = int(rng.integers(2, min(4, frames)))
        knn = int(rng.integers(2, 7))
        depth = int(rng.integers(1, 4))
        mods = [("img",), ("img", "lidar"), ("img", "lidar", "radar")][
            int(rng.integers(0, 3))
        ]
        cfg = GraphConstructionConfig(top_knn_nodes=knn)
        scene = make_synthetic_scene(
            seed=1000 + trial, num_frames=frames, num_tracks=tracks,
            with_modalities=True, modality_dropout=float(rng.uniform(0, 0.5)),
        )
        windows = [
            w for w in build_scene_graphs(scene, L, cfg) if w.num_edges > 0
        ][:3]
        if not windows:
            continue
        mn = 8 * -(-max(w.num_nodes for w in windows) // 8)
        me = max(16, 8 * -(-max(w.num_edges for w in windows) // 8))
        graphs = [
            pad_graph(
                pose=w.pose, edge_src=w.edge_src, edge_dst=w.edge_dst,
                edge_attr=w.edge_attr, node_time=w.node_time,
                node_class=w.node_class, max_nodes=mn, max_edges=me,
                img=scene.img[w.det_index], lidar=scene.lidar[w.det_index],
                radar=scene.radar[w.det_index],
            )
            for w in windows
        ]
        batch = batch_graphs(graphs)
        model = MultimodalGNN(depth=depth, modalities=mods)
        variables = jax.jit(model.init)(
            jax.random.key(trial), jax.tree.map(lambda x: x[0], batch)
        )
        xi, pn, rn, lp, rp = _encodings(model, variables, batch)
        ref, _ = jax.vmap(
            lambda g, a, b, c, d, e: model.apply(
                variables, g, a, b, c, d, e,
                method=model.forward_from_encodings,
            )
        )(batch, xi, pn, rn, lp, rp)
        tile_opts = [1] + [t for t in (2, 4) if me % t == 0 and (me // t) % 8 == 0]
        tiles = tile_opts[int(rng.integers(0, len(tile_opts)))]
        # a third of the trials also exercise the HBM-staged variant
        variant = "hbm" if tiles > 1 and rng.integers(0, 3) == 0 else None
        fused = fused_scores_from_encodings(
            model, variables, batch, xi, pn, rn, lp, rp,
            interpret=True, force_tiles=tiles,
            force_variant=variant,
        )
        desc = f"trial {trial}: tracks={tracks} L={L} knn={knn} depth={depth} mods={mods} bucket=({mn},{me}) tiles={tiles} variant={variant}"
        for k, w in enumerate(windows):
            np.testing.assert_allclose(
                np.asarray(fused)[k, : w.num_edges],
                np.asarray(ref)[k, : w.num_edges],
                rtol=2e-4, atol=2e-5, err_msg=desc,
            )
