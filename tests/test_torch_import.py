"""Checkpoint-import parity: torch modules in the reference's state-dict
layout vs the flax models after import — numeric forward equivalence."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from batch3dmot_tpu.graph import pad_graph  # noqa: E402
from batch3dmot_tpu.models import PoseGNN, ResNetAE  # noqa: E402
from batch3dmot_tpu.models.encoders import (  # noqa: E402
    PointNetClassifier,
    RadarNetClassifier,
)
from batch3dmot_tpu.utils import torch_import as ti  # noqa: E402


# ---- torch twins emitting reference-layout state dicts --------------------


class _TorchResBlock(tnn.Module):
    def __init__(self, cin, cout, k, s, dk, ds):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, k, s, padding=1)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, k, s, padding=1)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = tnn.Sequential(
            tnn.Conv2d(cin, cout, dk, ds), tnn.BatchNorm2d(cout)
        )

    def forward(self, x):
        skip = self.downsample(x)
        h = torch.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        return torch.relu(h + skip)


class _TorchResNetAE(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv = tnn.Conv2d(3, 12, 4, 2, 1)
        self.res_block1 = _TorchResBlock(12, 24, 4, 2, 5, 3)
        self.res_block2 = _TorchResBlock(24, 48, 3, 1, 1, 1)
        self.res_block3 = _TorchResBlock(48, 96, 3, 2, 3, 2)
        ct = lambda i, o: tnn.ConvTranspose2d(i, o, 4, stride=2, padding=1)
        self.conv_decoder = tnn.Sequential(
            ct(96, 72), tnn.ReLU(), ct(72, 48), tnn.ReLU(), ct(48, 24),
            tnn.ReLU(), ct(24, 12), tnn.ReLU(), ct(12, 3), tnn.Sigmoid(),
        )

    def encode(self, x):
        h = self.conv(x)
        h = self.res_block1(h)
        h = self.res_block2(h)
        h = self.res_block3(h)
        return h.flatten(1)

    def forward(self, x):
        z = self.encode(x)
        return self.conv_decoder(z.view(-1, 96, 1, 1))


class _TorchSTN(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv1d(3, 64, 1)
        self.conv2 = tnn.Conv1d(64, 128, 1)
        self.conv3 = tnn.Conv1d(128, 1024, 1)
        self.fc1 = tnn.Linear(1024, 512)
        self.fc2 = tnn.Linear(512, 256)
        self.fc3 = tnn.Linear(256, 9)
        self.bn1 = tnn.BatchNorm1d(64)
        self.bn2 = tnn.BatchNorm1d(128)
        self.bn3 = tnn.BatchNorm1d(1024)
        self.bn4 = tnn.BatchNorm1d(512)
        self.bn5 = tnn.BatchNorm1d(256)

    def forward(self, x):
        h = torch.relu(self.bn1(self.conv1(x)))
        h = torch.relu(self.bn2(self.conv2(h)))
        h = torch.relu(self.bn3(self.conv3(h)))
        h = h.max(2).values
        h = torch.relu(self.bn4(self.fc1(h)))
        h = torch.relu(self.bn5(self.fc2(h)))
        h = self.fc3(h)
        return h.view(-1, 3, 3) + torch.eye(3)


class _TorchPNFeat(tnn.Module):
    def __init__(self):
        super().__init__()
        self.stn = _TorchSTN()
        self.conv1 = tnn.Conv1d(3, 64, 1)
        self.conv2 = tnn.Conv1d(64, 128, 1)
        self.conv3 = tnn.Conv1d(128, 1024, 1)
        self.bn1 = tnn.BatchNorm1d(64)
        self.bn2 = tnn.BatchNorm1d(128)
        self.bn3 = tnn.BatchNorm1d(1024)

    def forward(self, x):
        trans = self.stn(x)
        h = torch.bmm(x.transpose(2, 1), trans).transpose(2, 1)
        h = torch.relu(self.bn1(self.conv1(h)))
        h = torch.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return h.max(2).values


class _TorchPointNet(tnn.Module):
    def __init__(self, k=7):
        super().__init__()
        self.feat = _TorchPNFeat()
        self.fc1 = tnn.Linear(1024, 512)
        self.fc2 = tnn.Linear(512, 256)
        self.fc3 = tnn.Linear(256, k)
        self.dropout = tnn.Dropout(0.3)
        self.bn1 = tnn.BatchNorm1d(512)
        self.bn2 = tnn.BatchNorm1d(256)

    def forward_feat(self, x):
        h = self.feat(x)
        h = torch.relu(self.bn1(self.fc1(h)))
        h = torch.relu(self.bn2(self.dropout(self.fc2(h))))
        return h


class _TorchRNFeat(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv1d(4, 64, 1)
        self.conv2 = tnn.Conv1d(64, 128, 1)
        self.conv3 = tnn.Conv1d(128, 1024, 1)
        self.bn1 = tnn.BatchNorm1d(64)
        self.bn2 = tnn.BatchNorm1d(128)
        self.bn3 = tnn.BatchNorm1d(1024)

    def forward(self, x):
        h = torch.relu(self.bn1(self.conv1(x)))
        h = torch.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return h.max(2).values


class _TorchRadarNet(tnn.Module):
    def __init__(self, k=7):
        super().__init__()
        self.feat = _TorchRNFeat()
        self.fc1 = tnn.Linear(1024, 512)
        self.fc2 = tnn.Linear(512, 256)
        self.fc3 = tnn.Linear(256, k)
        self.dropout = tnn.Dropout(0.3)
        self.bn1 = tnn.BatchNorm1d(512)
        self.bn2 = tnn.BatchNorm1d(256)

    def forward_feat(self, x):
        h = self.feat(x)
        h = torch.relu(self.bn1(self.fc1(h)))
        h = torch.relu(self.bn2(self.dropout(self.fc2(h))))
        return h


def _mlp_seq(dims):
    layers = []
    for i in range(len(dims) - 1):
        layers.append(tnn.Linear(dims[i], dims[i + 1]))
        if i < len(dims) - 2:
            layers.append(tnn.ReLU())
    return tnn.Sequential(*layers)


class _TorchCausalMP(tnn.Module):
    def __init__(self):
        super().__init__()
        self.edge_update = _mlp_seq((128, 96, 64, 32))
        self.create_past_msgs = _mlp_seq((128, 96, 64))
        self.create_future_msgs = _mlp_seq((128, 96, 64))
        self.combine_future_past = _mlp_seq((128, 96, 64, 48))

    def forward(self, x, src, dst, edge_attr, initial_x):
        n = x.shape[0]
        ue = self.edge_update(torch.cat([x[dst], x[src], edge_attr], 1))
        fm = self.create_future_msgs(torch.cat([x[dst], ue, initial_x[dst]], 1))
        pm = self.create_past_msgs(torch.cat([x[src], ue, initial_x[src]], 1))
        agg_p = torch.zeros(n, pm.shape[1]).index_add_(0, dst, pm)
        agg_f = torch.zeros(n, fm.shape[1]).index_add_(0, src, fm)
        return self.combine_future_past(torch.cat([agg_p, agg_f], 1)), ue


class _TorchPoseGNN(tnn.Module):
    def __init__(self, depth=2):
        super().__init__()
        self.depth = depth
        self.edge_encoder = _mlp_seq((4, 8, 16, 32))
        self.node_encoder = _mlp_seq((19, 24, 36, 48))
        self.edge_classifier = _mlp_seq((32, 16, 8, 4, 1))
        self.message_passing = _TorchCausalMP()

    def forward(self, pose, src, dst, edge_attr):
        e = self.edge_encoder(edge_attr)
        x = self.node_encoder(pose)
        x0 = x
        for _ in range(self.depth):
            x, e = self.message_passing(x, src, dst, e, x0)
        return self.edge_classifier(e).squeeze(1)


def _np_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


# ---- parity tests ---------------------------------------------------------


def test_resnet_ae_import_parity(rng):
    tm = _TorchResNetAE().eval()
    # randomize BN running stats so the import actually matters
    for m in tm.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    x = rng.random((3, 32, 32, 3), dtype=np.float32)
    with torch.no_grad():
        t_lat = tm.encode(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        t_rec = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    variables = ti.import_resnet_ae(_np_sd(tm))
    fm = ResNetAE()
    ref = fm.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    assert jax.tree.structure(ref) == jax.tree.structure(
        jax.tree.map(jnp.asarray, variables)
    )
    f_lat = fm.apply(variables, jnp.asarray(x), method=fm.encode)
    np.testing.assert_allclose(np.asarray(f_lat), t_lat, rtol=2e-3, atol=2e-4)
    f_rec = fm.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(f_rec), t_rec.transpose(0, 2, 3, 1), rtol=2e-3, atol=2e-4
    )


def test_pointnet_import_parity(rng):
    tm = _TorchPointNet().eval()
    for m in tm.modules():
        if isinstance(m, tnn.BatchNorm1d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    x = rng.standard_normal((4, 128, 3)).astype(np.float32)
    with torch.no_grad():
        t_feat = tm.forward_feat(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
    variables = ti.import_pointnet(_np_sd(tm))
    fm = PointNetClassifier(7)
    f_feat = fm.apply(variables, jnp.asarray(x), method=fm.feat_256)
    np.testing.assert_allclose(np.asarray(f_feat), t_feat, rtol=2e-3, atol=2e-4)


def test_radarnet_import_parity(rng):
    tm = _TorchRadarNet().eval()
    x = rng.standard_normal((4, 64, 4)).astype(np.float32)
    with torch.no_grad():
        t_feat = tm.forward_feat(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
    variables = ti.import_radarnet(_np_sd(tm))
    fm = RadarNetClassifier(7)
    f_feat = fm.apply(variables, jnp.asarray(x), method=fm.feat_256)
    np.testing.assert_allclose(np.asarray(f_feat), t_feat, rtol=2e-3, atol=2e-4)


def test_pose_gnn_import_parity(rng):
    depth = 2
    tm = _TorchPoseGNN(depth).eval()
    n, e = 10, 30
    pose = rng.standard_normal((n, 19)).astype(np.float32)
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    edge_attr = rng.standard_normal((e, 4)).astype(np.float32)
    with torch.no_grad():
        t_logits = tm(
            torch.from_numpy(pose),
            torch.from_numpy(src),
            torch.from_numpy(dst),
            torch.from_numpy(edge_attr),
        ).numpy()

    variables = ti.import_pose_gnn(_np_sd(tm))
    g = pad_graph(
        pose=pose,
        edge_src=src.astype(np.int32),
        edge_dst=dst.astype(np.int32),
        edge_attr=edge_attr,
        node_time=np.zeros(n, np.int32),
        node_class=np.ones(n, np.int32),
        max_nodes=n,
        max_edges=e,
    )
    fm = PoseGNN(depth=depth)
    f_logits, _ = fm.apply(variables, g)
    np.testing.assert_allclose(np.asarray(f_logits), t_logits, rtol=2e-3, atol=2e-4)


def test_mm_gnn_import_structure(rng):
    """Structural check: a reference-layout multimodal state dict imports
    into a tree matching MultimodalGNN.init (shapes and paths)."""
    from batch3dmot_tpu.models import MultimodalGNN
    from batch3dmot_tpu.data.synthetic import make_synthetic_scene
    from batch3dmot_tpu.graphs import build_window_graph
    from batch3dmot_tpu.train.data import to_padded
    from batch3dmot_tpu.config import GraphConstructionConfig

    sd = {}
    for prefix, mod in (
        ("resnet.", _TorchResNetAE()),
        ("pointnet.", _TorchPointNet()),
        ("radarnet.", _TorchRadarNet()),
    ):
        sd.update({prefix + k: v for k, v in _np_sd(mod).items()})
    sd.update(_np_sd_prefixed("edge_encoder.", _mlp_seq((4, 16, 32, 64))))
    sd.update(_np_sd_prefixed("node_encoder.", _mlp_seq((19, 48, 96))))
    sd.update(_np_sd_prefixed("edge_classifier.", _mlp_seq((64, 32, 16, 8, 1))))
    sd.update(_np_sd_prefixed("fc_lidar_encoder.", _mlp_seq((256, 192, 128))))
    sd.update(_np_sd_prefixed("fc_radar_encoder.", _mlp_seq((256, 192, 128, 64))))
    sd.update(
        _np_sd_prefixed("att_edge_encoder.", _mlp_seq((640, 512, 384, 256, 128, 64)))
    )
    for name, dim in (("c2c_att", 96), ("l2l_att", 128), ("r2r_att", 64)):
        mha = tnn.MultiheadAttention(dim, 2, batch_first=True)
        sd.update({f"{name}.{k}": v.detach().numpy() for k, v in mha.state_dict().items()})
    mp = {
        "edge_update": _mlp_seq((320, 256, 128, 64)),
        "create_past_msgs": _mlp_seq((256, 192, 128)),
        "create_future_msgs": _mlp_seq((256, 192, 128)),
        "combine_future_past": _mlp_seq((256, 192, 128, 96)),
    }
    for k, m in mp.items():
        sd.update(_np_sd_prefixed(f"message_passing.{k}.", m))

    variables = ti.import_mm_gnn(sd)

    scene = make_synthetic_scene(seed=0, num_frames=4, num_tracks=4, with_modalities=True)
    g = to_padded(
        build_window_graph(scene, 0, 3, GraphConstructionConfig(top_knn_nodes=3)),
        64, 256,
    )
    model = MultimodalGNN()
    ref = model.init(jax.random.key(0), g)

    ref_shapes = jax.tree.map(lambda x: x.shape, ref)
    got_shapes = jax.tree.map(lambda x: np.asarray(x).shape, variables)
    # params must match exactly; batch_stats of the GATConv-free path too
    assert ref_shapes["params"] == got_shapes["params"], "param tree mismatch"
    scores, _ = model.apply(variables, g)
    assert np.isfinite(np.asarray(scores)).all()


def _np_sd_prefixed(prefix, module):
    return {prefix + k: v.detach().numpy() for k, v in module.state_dict().items()}


class _TorchMMCausalMP(tnn.Module):
    def __init__(self):
        super().__init__()
        self.edge_update = _mlp_seq((320, 256, 128, 64))
        self.create_past_msgs = _mlp_seq((256, 192, 128))
        self.create_future_msgs = _mlp_seq((256, 192, 128))
        self.combine_future_past = _mlp_seq((256, 192, 128, 96))

    def forward(self, x, src, dst, edge_attr, initial_x, att_edge_attr):
        n = x.shape[0]
        ue = self.edge_update(torch.cat([x[dst], x[src], edge_attr, att_edge_attr], 1))
        fm = self.create_future_msgs(torch.cat([x[dst], ue, initial_x[dst]], 1))
        pm = self.create_past_msgs(torch.cat([x[src], ue, initial_x[src]], 1))
        agg_p = torch.zeros(n, pm.shape[1]).index_add_(0, dst, pm)
        agg_f = torch.zeros(n, fm.shape[1]).index_add_(0, src, fm)
        return self.combine_future_past(torch.cat([agg_p, agg_f], 1)), ue


class _TorchMMGNNRef(tnn.Module):
    """Reference-layout (state-dict-compatible) multimodal GNN twin."""

    def __init__(self, depth=2):
        super().__init__()
        self.depth = depth
        self.resnet = _TorchResNetAE()
        self.pointnet = _TorchPointNet()
        self.radarnet = _TorchRadarNet()
        self.edge_encoder = _mlp_seq((4, 16, 32, 64))
        self.node_encoder = _mlp_seq((19, 48, 96))
        self.edge_classifier = _mlp_seq((64, 32, 16, 8, 1))
        self.fc_lidar_encoder = _mlp_seq((256, 192, 128))
        self.fc_radar_encoder = _mlp_seq((256, 192, 128, 64))
        self.c2c_att = tnn.MultiheadAttention(96, 2, batch_first=True)
        self.l2l_att = tnn.MultiheadAttention(128, 2, batch_first=True)
        self.r2r_att = tnn.MultiheadAttention(64, 2, batch_first=True)
        self.att_edge_encoder = _mlp_seq((640, 512, 384, 256, 128, 64))
        self.message_passing = _TorchMMCausalMP()

    def forward(self, pose, img, lidar, radar, src, dst, edge_attr):
        lid_present = lidar.flatten(1).sum(1) != 0
        rad_present = radar.flatten(1).sum(1) != 0

        x_img = self.resnet.encode(img)
        x_lidar = torch.zeros(pose.shape[0], 128)
        x_lidar[lid_present] = self.fc_lidar_encoder(
            self.pointnet.forward_feat(lidar[lid_present])
        )
        x_radar = torch.zeros(pose.shape[0], 64)
        x_radar[rad_present] = self.fc_radar_encoder(
            self.radarnet.forward_feat(radar[rad_present])
        )

        e = self.edge_encoder(edge_attr)

        def att1(mha, xq, xkv):
            out, _ = mha(xq.unsqueeze(1), xkv.unsqueeze(1), xkv.unsqueeze(1),
                         need_weights=False)
            return out.squeeze(1)

        # reference attends value=endpoint features; query irrelevant (1 token)
        xj_img, xi_img = att1(self.c2c_att, x_img[dst], x_img[src]), att1(self.c2c_att, x_img[src], x_img[dst])
        xj_lid, xi_lid = att1(self.l2l_att, x_lidar[dst], x_lidar[src]), att1(self.l2l_att, x_lidar[src], x_lidar[dst])
        xj_rad, xi_rad = att1(self.r2r_att, x_radar[dst], x_radar[src]), att1(self.r2r_att, x_radar[src], x_radar[dst])
        sens_j = torch.cat([xj_rad, xj_lid, xj_img], 1)
        sens_i = torch.cat([xi_rad, xi_lid, xi_img], 1)
        att_e = self.att_edge_encoder(torch.cat([sens_i, sens_j, e], 1))

        x = self.node_encoder(pose)
        x0 = x
        for _ in range(self.depth):
            x, e = self.message_passing(x, src, dst, e, x0, att_e)
        return torch.sigmoid(self.edge_classifier(e)).squeeze(1)


@pytest.mark.slow
def test_mm_gnn_import_forward_parity(rng):
    """Full multimodal forward: reference-layout torch state dict imported
    into MultimodalGNN must reproduce the torch scores numerically."""
    from batch3dmot_tpu.config import GraphConstructionConfig
    from batch3dmot_tpu.data.synthetic import make_synthetic_scene
    from batch3dmot_tpu.graphs import build_window_graph
    from batch3dmot_tpu.models import MultimodalGNN
    from batch3dmot_tpu.train.data import to_padded

    depth = 2
    tm = _TorchMMGNNRef(depth).eval()
    for m in tm.modules():
        if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
            m.running_mean.normal_(0, 0.3)
            m.running_var.uniform_(0.5, 2.0)

    scene = make_synthetic_scene(seed=11, num_frames=4, num_tracks=5,
                                 with_modalities=True, modality_dropout=0.4)
    w = build_window_graph(scene, 0, 3, GraphConstructionConfig(top_knn_nodes=4))
    n, e = w.num_nodes, w.num_edges

    # torch twin consumes f32 [0,1] (the reference's ToTensor/255); the
    # flax side receives the raw uint8 crop and divides on device
    img_f32 = w.img.astype(np.float32) / 255.0
    with torch.no_grad():
        t_scores = tm(
            torch.from_numpy(w.pose),
            torch.from_numpy(np.ascontiguousarray(img_f32.transpose(0, 3, 1, 2))),
            torch.from_numpy(np.ascontiguousarray(w.lidar.transpose(0, 2, 1))),
            torch.from_numpy(np.ascontiguousarray(w.radar.transpose(0, 2, 1))),
            torch.from_numpy(w.edge_src.astype(np.int64)),
            torch.from_numpy(w.edge_dst.astype(np.int64)),
            torch.from_numpy(w.edge_attr),
        ).numpy()

    variables = ti.import_mm_gnn(_np_sd(tm))
    model = MultimodalGNN(depth=depth)
    g = to_padded(w, n, e)  # exact-size padding: every slot real
    f_scores, _ = model.apply(variables, g)
    np.testing.assert_allclose(np.asarray(f_scores), t_scores, rtol=3e-3, atol=3e-4)
