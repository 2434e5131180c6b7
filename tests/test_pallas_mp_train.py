"""Fused training kernels: the hand-written Pallas backward must produce
the same loss AND the same gradients (for every parameter leaf) as XLA
autodiff through the reference forward (interpreter on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from batch3dmot_tpu.config import GNNConfig, GraphConstructionConfig
from batch3dmot_tpu.data.synthetic import make_synthetic_scene
from batch3dmot_tpu.graph import batch_graphs, pad_graph
from batch3dmot_tpu.graphs import build_scene_graphs
from batch3dmot_tpu.models import MultimodalGNN, PoseGNN
from batch3dmot_tpu.train import GNNTrainer

pytestmark = pytest.mark.slow


def _batch(with_modalities, mn=32, me=128, n_windows=3):
    cfg = GraphConstructionConfig(top_knn_nodes=5)
    scene = make_synthetic_scene(
        seed=11, num_frames=6, num_tracks=5, with_modalities=with_modalities,
        modality_dropout=0.3 if with_modalities else 0.0,
    )
    windows = [w for w in build_scene_graphs(scene, 3, cfg) if w.num_edges > 0]
    windows = windows[:n_windows]
    graphs = [
        pad_graph(
            pose=w.pose, edge_src=w.edge_src, edge_dst=w.edge_dst,
            edge_attr=w.edge_attr, node_time=w.node_time,
            node_class=w.node_class, max_nodes=mn, max_edges=me,
            img=None if not with_modalities else scene.img[w.det_index],
            lidar=None if not with_modalities else scene.lidar[w.det_index],
            radar=None if not with_modalities else scene.radar[w.det_index],
            edge_label=w.edge_label, edge_weight=w.edge_weight,
        )
        for w in windows
    ]
    return batch_graphs(graphs)


def _grad_compare(model, batch, depth_desc):
    cfg = GNNConfig(batch_size=batch.pose.shape[0])
    ref = GNNTrainer(model, jax.tree.map(lambda x: x[0], batch), cfg, fused=False)
    fused = GNNTrainer(
        model, jax.tree.map(lambda x: x[0], batch), cfg, fused=True,
        init_variables=ref.variables,
    )

    def loss_of(trainer):
        def f(params):
            loss, _ = trainer._loss(params, trainer.state.extra_variables, batch)
            return loss

        return f

    l_ref, g_ref = jax.value_and_grad(loss_of(ref))(ref.state.params)
    l_fused, g_fused = jax.value_and_grad(loss_of(fused))(fused.state.params)

    np.testing.assert_allclose(float(l_fused), float(l_ref), rtol=1e-4)
    flat_ref = jax.tree.leaves_with_path(g_ref)
    flat_fused = dict(
        (jax.tree_util.keystr(k), v) for k, v in jax.tree.leaves_with_path(g_fused)
    )
    checked = 0
    for k, v_ref in flat_ref:
        name = jax.tree_util.keystr(k)
        v_f = flat_fused[name]
        scale = max(float(np.abs(v_ref).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(v_f), np.asarray(v_ref),
            rtol=5e-3, atol=2e-4 * scale,
            err_msg=f"{depth_desc}: grad mismatch at {name}",
        )
        checked += 1
    assert checked > 20  # every MP + classifier + encoder-side leaf compared


def test_fused_training_grads_pose():
    model = PoseGNN(depth=3)
    _grad_compare(model, _batch(False), "pose depth3")


def test_fused_training_grads_multimodal():
    model = MultimodalGNN(depth=2)
    _grad_compare(model, _batch(True), "mm depth2")


def test_fused_training_grads_modality_subset():
    """The graduated config family (cam-only etc.) trains through the same
    fused kernels — attention edge features are always consumed by the MP
    loop regardless of the modality subset (models/gnn.py)."""
    model = MultimodalGNN(depth=2, modalities=("img",))
    _grad_compare(model, _batch(True), "mm img-only depth2")


def test_fused_train_guard_coverage():
    """Monolithic kernels cover up to (64, 512); the edge-tiled pair
    (round-3) extends coverage to the trainval training buckets; beyond
    the tiled VMEM model callers fall back to XLA autodiff."""
    from batch3dmot_tpu.ops.pallas_mp_train import (
        _train_tiles_for,
        fused_train_supported,
    )

    assert _train_tiles_for(64, 256) == 1  # monolithic
    assert _train_tiles_for(64, 512) == 1
    assert _train_tiles_for(128, 1024) == 2  # tiled from here up
    assert _train_tiles_for(256, 2048) == 4
    assert _train_tiles_for(256, 4096) == 8  # trainval L=5 training bucket
    assert fused_train_supported(256, 4096)
    # the 2M-product bucket wins only on the precomputed-encoding
    # training form (trainer-step arbiter, docs/RESULTS.md) — admitted
    # via encoded=True only; (512, 8192) measured parity and stays XLA
    # on both forms
    assert not fused_train_supported(512, 4096)
    assert _train_tiles_for(512, 4096, encoded=True) == 16
    assert not fused_train_supported(512, 8192)
    assert not fused_train_supported(512, 8192, encoded=True)
    # tile edge-size is capped at the hardware-validated 512: the natural
    # 4-tile split of (128, 4096) (tile size 1024) overflowed scoped VMEM
    # by 4.5 KB in the backward — caught by the trainval-scale soak (r4)
    for n, e in ((128, 4096), (64, 4096), (64, 2048), (128, 2048)):
        tiles = _train_tiles_for(n, e)
        assert tiles is not None and e // tiles <= 512, (n, e, tiles)


def _grad_compare_tiled(model, batch, n_tiles, desc):
    """Tiled fused kernels vs XLA autodiff on the raw score path (the
    trainer-level comparison is covered by _grad_compare; here the tile
    count is forced so small CPU-sized buckets exercise the tiled code)."""
    from batch3dmot_tpu.ops.pallas_mp_train import fused_training_scores

    variables = jax.jit(model.init)(
        jax.random.key(0), jax.tree.map(lambda x: x[0], batch)
    )
    variables = dict(variables)
    params = variables.pop("params")

    def f_xla(p):
        vs = {"params": p, **variables}
        scores = jax.vmap(lambda g: model.apply(vs, g)[0])(batch)
        return jnp.sum(jnp.where(batch.edge_mask, scores * batch.edge_weight, 0.0))

    def f_tiled(p):
        scores = fused_training_scores(
            model, variables, p, batch, interpret=True, force_tiles=n_tiles
        )
        return jnp.sum(jnp.where(batch.edge_mask, scores * batch.edge_weight, 0.0))

    l_ref, g_ref = jax.value_and_grad(f_xla)(params)
    l_t, g_t = jax.value_and_grad(f_tiled)(params)
    np.testing.assert_allclose(float(l_t), float(l_ref), rtol=1e-4)
    flat_t = dict(
        (jax.tree_util.keystr(k), v) for k, v in jax.tree.leaves_with_path(g_t)
    )
    checked = 0
    for k, v_ref in jax.tree.leaves_with_path(g_ref):
        name = jax.tree_util.keystr(k)
        scale = max(float(np.abs(v_ref).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(flat_t[name]), np.asarray(v_ref),
            rtol=5e-3, atol=2e-4 * scale,
            err_msg=f"{desc}: grad mismatch at {name}",
        )
        checked += 1
    assert checked > 10


def test_tiled_training_grads_pose():
    _grad_compare_tiled(PoseGNN(depth=3), _batch(False), 4, "pose tiled depth3")


def test_tiled_training_grads_multimodal():
    _grad_compare_tiled(MultimodalGNN(depth=2), _batch(True), 4, "mm tiled depth2")


def test_tiled_training_grads_trainval_bucket():
    """Gradient equivalence at a REAL tiled bucket: (256, 2048) with its
    auto-chosen 8 tiles (depth 2, one window, to keep CPU interpret time
    bounded)."""
    batch = _batch(False, mn=256, me=2048, n_windows=1)
    _grad_compare_tiled(
        PoseGNN(depth=2), batch, None, "pose tiled (256,2048)"
    )


def test_tiled_training_through_trainer():
    """The trainer auto-dispatches to the tiled kernels at buckets above
    the monolithic ceiling: a few steps at (64, 1024) (2 tiles) must run
    and reduce the loss."""
    batch = _batch(False, mn=64, me=1024)
    model = PoseGNN(depth=2)
    cfg = GNNConfig(batch_size=batch.pose.shape[0], lr=1e-3, weight_decay=0.0)
    tr = GNNTrainer(model, jax.tree.map(lambda x: x[0], batch), cfg, fused=True)
    losses = []
    for _ in range(4):
        tr.state, loss, _ = tr._train_step(tr.state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_fused_training_step_learns_pose():
    """A few fused train steps must reduce the loss (end-to-end step path,
    incl. optimizer + donated buffers)."""
    batch = _batch(False)
    model = PoseGNN(depth=2)
    cfg = GNNConfig(batch_size=batch.pose.shape[0], lr=1e-3, weight_decay=0.0)
    tr = GNNTrainer(model, jax.tree.map(lambda x: x[0], batch), cfg, fused=True)
    losses = []
    for _ in range(5):
        tr.state, loss, _ = tr._train_step(tr.state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
