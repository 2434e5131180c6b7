"""Import reference PyTorch checkpoints into flax variable trees.

The reference ships ``.pth`` state dicts for the three encoders and the GNN
(``train.py:54-61,73-75``, ``predict.py:384-405``). This module converts them
into this framework's flax parameter layout so trained reference weights can
be re-used for bit-parity debugging and warm starts (SURVEY.md §7 step 3).

Layout conversions:
  * Linear:          weight [out, in]        -> kernel [in, out]
  * Conv1d(k=1):     weight [out, in, 1]     -> Dense kernel [in, out]
  * Conv2d:          weight [O, I, H, W]     -> kernel [H, W, I, O]
  * ConvTranspose2d: weight [I, O, H, W]     -> input-dilated Conv kernel
                     [H, W, I, O] spatially flipped (the decoder expresses
                     transposed conv as a dilated conv)
  * BatchNorm:       weight/bias -> scale/bias; running stats -> batch_stats
  * MultiheadAttention (1 kv token): only the value slice of in_proj and
    out_proj survive — softmax over one key is 1, so q/k projections have no
    effect (models/layers.py SingleTokenAttention).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _t(w) -> np.ndarray:
    return np.asarray(w, dtype=np.float32)


def linear(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def conv1d_as_dense(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    w = _t(sd[f"{prefix}.weight"])[:, :, 0]  # [out, in]
    return {"kernel": w.T, "bias": _t(sd[f"{prefix}.bias"])}


def conv2d(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    w = _t(sd[f"{prefix}.weight"])  # [O, I, H, W]
    out = {"kernel": w.transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def conv_transpose2d_as_dilated(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    w = _t(sd[f"{prefix}.weight"])  # [I, O, H, W]
    w = w[:, :, ::-1, ::-1]  # spatial flip
    return {
        "kernel": np.ascontiguousarray(w.transpose(2, 3, 0, 1)),
        "bias": _t(sd[f"{prefix}.bias"]),
    }


def batchnorm(sd: Dict, prefix: str) -> Tuple[Dict, Dict]:
    params = {
        "scale": _t(sd[f"{prefix}.weight"]),
        "bias": _t(sd[f"{prefix}.bias"]),
    }
    stats = {
        "mean": _t(sd[f"{prefix}.running_mean"]),
        "var": _t(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def mlp(sd: Dict, prefix: str, torch_indices) -> Dict[str, Dict]:
    """nn.Sequential(Linear, ReLU, ...) -> MLP dense_i tree."""
    return {
        f"dense_{i}": linear(sd, f"{prefix}.{ti}")
        for i, ti in enumerate(torch_indices)
    }


def single_token_attention(sd: Dict, prefix: str, dim: int) -> Dict[str, Dict]:
    in_w = _t(sd[f"{prefix}.in_proj_weight"])  # [3D, D]
    in_b = _t(sd[f"{prefix}.in_proj_bias"])
    v_w = in_w[2 * dim : 3 * dim]
    v_b = in_b[2 * dim : 3 * dim]
    return {
        "v_proj": {"kernel": v_w.T, "bias": v_b},
        "out_proj": linear(sd, f"{prefix}.out_proj"),
    }


# ---------------------------------------------------------------------------
# Model-level importers
# ---------------------------------------------------------------------------


def import_resnet_ae(sd: Dict, include_decoder: bool = True) -> Dict[str, Any]:
    """Reference ``resnet_fully_conv.ResNetAE`` state dict -> flax variables."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["stem"] = conv2d(sd, "conv")

    for i, name in ((1, "block1"), (2, "block2"), (3, "block3")):
        p: Dict[str, Any] = {}
        s: Dict[str, Any] = {}
        ref = f"res_block{i}"
        p["conv1"] = conv2d(sd, f"{ref}.conv1")
        p["bn1"], s["bn1"] = batchnorm(sd, f"{ref}.bn1")
        p["conv2"] = conv2d(sd, f"{ref}.conv2")
        p["bn2"], s["bn2"] = batchnorm(sd, f"{ref}.bn2")
        p["down_conv"] = conv2d(sd, f"{ref}.downsample.0")
        p["down_bn"], s["down_bn"] = batchnorm(sd, f"{ref}.downsample.1")
        params[name] = p
        stats[name] = s

    if include_decoder:
        for j, ti in enumerate((0, 2, 4, 6, 8)):
            params[f"dec_{j}"] = conv_transpose2d_as_dilated(
                sd, f"conv_decoder.{ti}"
            )

    return {"params": params, "batch_stats": stats}


def import_pointnet(sd: Dict) -> Dict[str, Any]:
    """Reference ``pointnet.PointNetClassifier`` state dict -> flax variables."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    feat_p: Dict[str, Any] = {}
    feat_s: Dict[str, Any] = {}

    stn_p: Dict[str, Any] = {}
    stn_s: Dict[str, Any] = {}
    for i in range(3):
        stn_p[f"mlp_{i}"] = conv1d_as_dense(sd, f"feat.stn.conv{i + 1}")
        stn_p[f"bn_{i}"], stn_s[f"bn_{i}"] = batchnorm(sd, f"feat.stn.bn{i + 1}")
    for i in range(2):
        stn_p[f"fc_{i}"] = linear(sd, f"feat.stn.fc{i + 1}")
        stn_p[f"fc_bn_{i}"], stn_s[f"fc_bn_{i}"] = batchnorm(
            sd, f"feat.stn.bn{i + 4}"
        )
    stn_p["fc_out"] = linear(sd, "feat.stn.fc3")
    feat_p["stn"] = stn_p
    feat_s["stn"] = stn_s

    for i in range(3):
        feat_p[f"mlp_{i}"] = conv1d_as_dense(sd, f"feat.conv{i + 1}")
        feat_p[f"bn_{i}"], feat_s[f"bn_{i}"] = batchnorm(sd, f"feat.bn{i + 1}")
    params["feat"] = feat_p
    stats["feat"] = feat_s

    params["fc1"] = linear(sd, "fc1")
    params["bn1"], stats["bn1"] = batchnorm(sd, "bn1")
    params["fc2"] = linear(sd, "fc2")
    params["bn2"], stats["bn2"] = batchnorm(sd, "bn2")
    params["fc3"] = linear(sd, "fc3")
    return {"params": params, "batch_stats": stats}


def import_radarnet(sd: Dict) -> Dict[str, Any]:
    """Reference ``radarnet.RadarNetClassifier`` state dict -> flax variables."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    feat_p: Dict[str, Any] = {}
    feat_s: Dict[str, Any] = {}
    for i in range(3):
        feat_p[f"mlp_{i}"] = conv1d_as_dense(sd, f"feat.conv{i + 1}")
        feat_p[f"bn_{i}"], feat_s[f"bn_{i}"] = batchnorm(sd, f"feat.bn{i + 1}")
    params["feat"] = feat_p
    stats["feat"] = feat_s
    params["fc1"] = linear(sd, "fc1")
    params["bn1"], stats["bn1"] = batchnorm(sd, "bn1")
    params["fc2"] = linear(sd, "fc2")
    params["bn2"], stats["bn2"] = batchnorm(sd, "bn2")
    params["fc3"] = linear(sd, "fc3")
    return {"params": params, "batch_stats": stats}


_SEQ3 = (0, 2, 4)
_SEQ2 = (0, 2)


def import_mm_gnn(sd: Dict) -> Dict[str, Any]:
    """Reference ``clr_att_gnn.GNN`` state dict -> MultimodalGNN variables
    (including the nested frozen encoders)."""
    # the GNN only calls resnet.encode and the feat_256 heads — the decoder
    # and the fc3 classification heads never initialize inside the GNN tree
    enc_res = import_resnet_ae(_subdict(sd, "resnet."), include_decoder=False)
    enc_pn = import_pointnet(_subdict(sd, "pointnet."))
    enc_rn = import_radarnet(_subdict(sd, "radarnet."))
    enc_pn["params"].pop("fc3", None)
    enc_rn["params"].pop("fc3", None)

    params: Dict[str, Any] = {
        "resnet": enc_res["params"],
        "pointnet": enc_pn["params"],
        "radarnet": enc_rn["params"],
        "edge_encoder": mlp(sd, "edge_encoder", _SEQ3),
        "node_encoder": mlp(sd, "node_encoder", _SEQ2),
        "edge_classifier": mlp(sd, "edge_classifier", (0, 2, 4, 6)),
        "fc_lidar_encoder": mlp(sd, "fc_lidar_encoder", _SEQ2),
        "fc_radar_encoder": mlp(sd, "fc_radar_encoder", (0, 2, 4)),
        "att_edge_encoder": mlp(sd, "att_edge_encoder", (0, 2, 4, 6, 8)),
        "c2c_att": single_token_attention(sd, "c2c_att", 96),
        "l2l_att": single_token_attention(sd, "l2l_att", 128),
        "r2r_att": single_token_attention(sd, "r2r_att", 64),
        "message_passing": {
            "edge_update": mlp(sd, "message_passing.edge_update", _SEQ3),
            "past_msgs": mlp(sd, "message_passing.create_past_msgs", _SEQ2),
            "future_msgs": mlp(sd, "message_passing.create_future_msgs", _SEQ2),
            "combine": mlp(sd, "message_passing.combine_future_past", (0, 2, 4)),
        },
    }
    stats = {
        "resnet": enc_res["batch_stats"],
        "pointnet": enc_pn["batch_stats"],
        "radarnet": enc_rn["batch_stats"],
    }
    return {"params": params, "batch_stats": stats}


def import_pose_gnn(sd: Dict) -> Dict[str, Any]:
    """Reference ``pose_gnn.PoseGNN`` state dict -> PoseGNN variables."""
    params = {
        "edge_encoder": mlp(sd, "edge_encoder", (0, 2, 4)),
        "node_encoder": mlp(sd, "node_encoder", (0, 2, 4)),
        "edge_classifier": mlp(sd, "edge_classifier", (0, 2, 4, 6)),
        "message_passing": {
            "edge_update": mlp(sd, "message_passing.edge_update", _SEQ3),
            "past_msgs": mlp(sd, "message_passing.create_past_msgs", _SEQ2),
            "future_msgs": mlp(sd, "message_passing.create_future_msgs", _SEQ2),
            "combine": mlp(sd, "message_passing.combine_future_past", (0, 2, 4)),
        },
    }
    return {"params": params}


def _subdict(sd: Dict, prefix: str) -> Dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth state dict to numpy (torch CPU)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}
