"""Model tests: shapes, padding invariance, presence gating, vmap batching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from batch3dmot_tpu.config import GraphConstructionConfig
from batch3dmot_tpu.data.synthetic import make_synthetic_scene
from batch3dmot_tpu.graph import batch_graphs, pad_graph
from batch3dmot_tpu.graphs import build_window_graph
from batch3dmot_tpu.models import MultimodalGNN, PoseGNN, ResNetAE
from batch3dmot_tpu.models.encoders import PointNetClassifier, RadarNetClassifier


def _padded(seed=0, max_nodes=64, max_edges=256, with_mods=True, L=3):
    scene = make_synthetic_scene(seed=seed, num_frames=6, num_tracks=6,
                                 with_modalities=with_mods,
                                 modality_dropout=0.4)
    g = build_window_graph(scene, 0, L, GraphConstructionConfig(top_knn_nodes=5))
    return pad_graph(
        pose=g.pose, edge_src=g.edge_src, edge_dst=g.edge_dst,
        edge_attr=g.edge_attr, node_time=g.node_time, node_class=g.node_class,
        max_nodes=max_nodes, max_edges=max_edges,
        img=g.img, lidar=g.lidar, radar=g.radar,
        edge_label=g.edge_label, edge_weight=g.edge_weight,
    ), g


@pytest.fixture(scope="module")
def mm_setup():
    g, raw = _padded()
    model = MultimodalGNN()
    variables = model.init(jax.random.key(0), g)
    return model, variables, g, raw


def test_resnet_ae_shapes():
    model = ResNetAE()
    x = jnp.zeros((2, 32, 32, 3))
    vars_ = model.init(jax.random.key(0), x)
    recon = model.apply(vars_, x)
    assert recon.shape == (2, 32, 32, 3)
    z = model.apply(vars_, x, method=model.encode)
    assert z.shape == (2, 96)


def test_pointnet_shapes():
    model = PointNetClassifier(num_classes=7)
    x = jnp.zeros((3, 128, 3))
    vars_ = model.init(jax.random.key(0), x)
    logp, trans, _ = model.apply(vars_, x)
    assert logp.shape == (3, 7)
    assert trans.shape == (3, 3, 3)
    feat = model.apply(vars_, x, method=model.feat_256)
    assert feat.shape == (3, 256)
    # log_softmax rows sum to 1 in prob space
    np.testing.assert_allclose(np.exp(logp).sum(-1), np.ones(3), rtol=1e-5)


def test_radarnet_shapes():
    model = RadarNetClassifier(num_classes=7)
    x = jnp.zeros((3, 64, 4))
    vars_ = model.init(jax.random.key(0), x)
    logp = model.apply(vars_, x)
    assert logp.shape == (3, 7)


def test_mm_gnn_forward_shapes(mm_setup):
    model, variables, g, raw = mm_setup
    scores, x_sens = model.apply(variables, g)
    assert scores.shape == (g.max_edges,)
    assert x_sens.shape == (g.max_nodes, 96 + 128 + 64)
    assert np.all((np.asarray(scores) > 0) & (np.asarray(scores) < 1))


def test_mm_gnn_padding_invariance(mm_setup):
    """Scores on real edges must not depend on the padding budget."""
    model, variables, g_small, raw = mm_setup
    g_big, _ = _padded(max_nodes=128, max_edges=512)
    s_small, _ = model.apply(variables, g_small)
    s_big, _ = model.apply(variables, g_big)
    e = raw.num_edges
    np.testing.assert_allclose(
        np.asarray(s_small)[:e], np.asarray(s_big)[:e], rtol=2e-4, atol=2e-5
    )


def test_mm_gnn_lidar_presence_gating(mm_setup):
    """Nodes with all-zero lidar must produce zero x_lidar contribution:
    flipping their lidar values from zero to nonzero changes scores, while
    zero stays equivalent to 'absent' (reference zero-sum check)."""
    model, variables, g, raw = mm_setup
    lidar = np.asarray(g.lidar)
    present = lidar.reshape(lidar.shape[0], -1).sum(1) != 0
    assert present.any() and (~present[: raw.num_nodes]).any()
    scores_ref, x_sens = model.apply(variables, g)
    # x_sens lidar block (96:224) must be exactly zero for absent nodes
    x_sens = np.asarray(x_sens)
    assert np.all(x_sens[~present, 96:224] == 0)


def test_mm_gnn_vmap_batches(mm_setup):
    model, variables, g, raw = mm_setup
    gb = batch_graphs([g, g])
    scores, _ = jax.vmap(lambda gg: model.apply(variables, gg))(gb)
    assert scores.shape == (2, g.max_edges)
    single, _ = model.apply(variables, g)
    np.testing.assert_allclose(scores[0], single, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(scores[0], scores[1], rtol=1e-6)


def test_pose_gnn_forward():
    g, raw = _padded(with_mods=False)
    model = PoseGNN()
    variables = model.init(jax.random.key(0), g)
    logits, x_enc = model.apply(variables, g)
    assert logits.shape == (g.max_edges,)
    assert x_enc.shape == (g.max_nodes, 48)
    assert np.isfinite(np.asarray(logits)).all()


def test_pose_gnn_knn_active_mode_runs():
    g, raw = _padded(with_mods=False)
    model = PoseGNN(knn_conv_mode="active", knn_conv_k=4)
    variables = model.init(jax.random.key(0), g)
    logits, _ = model.apply(variables, g)
    assert np.isfinite(np.asarray(logits)).all()


def test_pose_gnn_param_widths():
    """Reference layer widths (pose_gnn.py:29-55, 89-120)."""
    g, _ = _padded(with_mods=False)
    model = PoseGNN()
    params = model.init(jax.random.key(0), g)["params"]
    mp = params["message_passing"]
    assert mp["edge_update"]["dense_0"]["kernel"].shape == (128, 96)
    assert mp["edge_update"]["dense_2"]["kernel"].shape == (64, 32)
    assert mp["past_msgs"]["dense_0"]["kernel"].shape == (128, 96)
    assert mp["combine"]["dense_2"]["kernel"].shape == (64, 48)
    assert params["edge_encoder"]["dense_0"]["kernel"].shape == (4, 8)
    assert params["node_encoder"]["dense_0"]["kernel"].shape == (19, 24)
    assert params["edge_classifier"]["dense_3"]["kernel"].shape == (4, 1)


def test_mm_gnn_param_widths(mm_setup):
    """Reference layer widths (clr_att_gnn.py:35-93, 196-222)."""
    model, variables, g, _ = mm_setup
    params = variables["params"]
    mp = params["message_passing"]
    assert mp["edge_update"]["dense_0"]["kernel"].shape == (320, 256)
    assert mp["edge_update"]["dense_2"]["kernel"].shape == (128, 64)
    assert mp["past_msgs"]["dense_0"]["kernel"].shape == (256, 192)
    assert mp["combine"]["dense_2"]["kernel"].shape == (128, 96)
    assert params["att_edge_encoder"]["dense_0"]["kernel"].shape == (640, 512)
    assert params["fc_lidar_encoder"]["dense_1"]["kernel"].shape == (192, 128)
    assert params["fc_radar_encoder"]["dense_2"]["kernel"].shape == (128, 64)
    assert params["edge_encoder"]["dense_0"]["kernel"].shape == (4, 16)
    assert params["node_encoder"]["dense_1"]["kernel"].shape == (48, 96)


def test_mm_gnn_knn_active_mode_runs(mm_setup):
    _, _, g, _ = mm_setup
    model = MultimodalGNN(depth=2, knn_conv_mode="active", knn_conv_k=4)
    variables = model.init(jax.random.key(1), g)
    scores, _ = model.apply(variables, g)
    assert np.isfinite(np.asarray(scores)).all()


@pytest.mark.parametrize("mods,att_in", [
    (("img", "lidar"), 2 * (96 + 128) + 64),   # the missing cl_att_gnn family
    (("img",), 2 * 96 + 64),
])
def test_mm_gnn_modality_subsets(mm_setup, mods, att_in):
    _, _, g, _ = mm_setup
    model = MultimodalGNN(depth=2, modalities=mods)
    variables = model.init(jax.random.key(2), g)
    params = variables["params"]
    assert params["att_edge_encoder"]["dense_0"]["kernel"].shape[0] == att_in
    assert ("radarnet" in params) == ("radar" in mods)
    assert ("pointnet" in params) == ("lidar" in mods)
    scores, x_sens = model.apply(variables, g)
    assert np.isfinite(np.asarray(scores)).all()
    # disabled modality blocks of x_sens are zero
    x_sens = np.asarray(x_sens)
    if "radar" not in mods:
        assert (x_sens[:, 224:] == 0).all()
    if "lidar" not in mods:
        assert (x_sens[:, 96:224] == 0).all()
