"""Per-detection modality encoders (flax).

Functional re-implementations of the reference's three frozen encoders:
ResNet image autoencoder (``models/resnet_fully_conv.py``), PointNet LiDAR
classifier (``models/pointnet.py``), RadarNet (``models/radarnet.py``).
Layouts are TPU-native: images NHWC, point clouds [batch, points, channels]
(a conv1d with kernel 1 is a per-point Dense — pure MXU matmul).

BatchNorm semantics: when used as frozen feature extractors inside the GNN
these run with running statistics (``use_running_average=True``). The
reference instead leaves them in train mode during GNN training except when
fewer than two modality-present nodes exist (``clr_att_gnn.py:128-138``) —
a BatchNorm crash guard. Frozen-means-frozen is the deliberate fix here
(SURVEY.md §7 hard-part 6).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch BatchNorm defaults: eps=1e-5, momentum=0.1 (flax momentum = 0.9)
_BN = dict(momentum=0.9, epsilon=1e-5)


def points_input_f32(x: jax.Array) -> jax.Array:
    """Accept float16 or float32 point clouds; compute in f32.

    LiDAR/radar points upload at half precision by default at inference
    (``predict.point_dtype``): they are ~45% of the per-scene host->device
    bytes through the TPU relay (the per-scene wall, docs/RESULTS.md round
    4), and the MXU already ingests matmul operands as bf16 — which is
    COARSER than f16 — so the cast costs no accuracy the chip wasn't
    already paying. The upcast happens here, on device, inside the jit."""
    if x.dtype in (jnp.float16, jnp.bfloat16):
        return x.astype(jnp.float32)
    return x


def image_input_f32(x: jax.Array) -> jax.Array:
    """Accept uint8 (0..255) or float ([0,1]) image batches.

    Crops are stored and uploaded as uint8 — 4x less host->device relay
    traffic (the per-scene wall at trainval density, docs/RESULTS.md round
    4) and bit-identical to the reference, whose PIL crops ARE uint8 and
    are divided by 255 at load (``utils/dataset.py:149-161``). The /255
    happens here, on device, inside the jit."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x


# ---------------------------------------------------------------------------
# ResNet autoencoder (camera crops, 32x32 -> 96-d latent)
# ---------------------------------------------------------------------------


class ResidualBlock(nn.Module):
    """Conv-BN-ReLU-Conv-BN + projected skip; *both* convs carry the stride
    (a quirk of the reference block, ``resnet_fully_conv.py:42-73``)."""

    out_chs: int
    kernel: int
    stride: int
    down_kernel: int
    down_stride: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        skip = nn.Conv(
            self.out_chs,
            (self.down_kernel, self.down_kernel),
            strides=(self.down_stride, self.down_stride),
            padding="VALID",
            name="down_conv",
        )(x)
        skip = nn.BatchNorm(use_running_average=not train, name="down_bn", **_BN)(skip)

        k = (self.kernel, self.kernel)
        s = (self.stride, self.stride)
        pad = [(1, 1), (1, 1)]
        h = nn.Conv(self.out_chs, k, strides=s, padding=pad, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, name="bn1", **_BN)(h)
        h = nn.relu(h)
        h = nn.Conv(self.out_chs, k, strides=s, padding=pad, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn2", **_BN)(h)
        return nn.relu(h + skip)


class ResNetAE(nn.Module):
    """32x32 RGB crop -> 96-d latent; transposed-conv decoder for the MSE
    reconstruction objective. ``encode`` is what the GNN consumes
    (reference ``resnet_fully_conv.py:155-161``)."""

    latent_dim: int = 96

    def setup(self) -> None:
        self.stem = nn.Conv(12, (4, 4), strides=(2, 2), padding=[(1, 1), (1, 1)])
        # (12->24, k4 s2, down k5 s3), (24->48, k3 s1, down k1 s1),
        # (48->96, k3 s2, down k3 s2): 32 -> 16 -> 4 -> 4 -> 1 spatial.
        self.block1 = ResidualBlock(24, 4, 2, 5, 3)
        self.block2 = ResidualBlock(48, 3, 1, 1, 1)
        self.block3 = ResidualBlock(self.latent_dim, 3, 2, 3, 2)
        # Transposed conv k=4 s=2 p=1 (doubles spatial size) expressed as an
        # input-dilated conv: dilate by 2, pad k-1-p=2, stride 1.
        _up = dict(
            kernel_size=(4, 4),
            strides=(1, 1),
            padding=[(2, 2), (2, 2)],
            input_dilation=(2, 2),
        )
        self.dec = [
            nn.Conv(72, **_up),
            nn.Conv(48, **_up),
            nn.Conv(24, **_up),
            nn.Conv(12, **_up),
            nn.Conv(3, **_up),
        ]

    def encode(self, x: jax.Array, train: bool = False) -> jax.Array:
        """x: [B, 32, 32, 3] (uint8 0..255 or f32 [0,1]) -> [B, latent_dim]."""
        h = self.stem(image_input_f32(x))
        h = self.block1(h, train)
        h = self.block2(h, train)
        h = self.block3(h, train)
        return h.reshape(h.shape[0], -1)

    def decode(self, z: jax.Array) -> jax.Array:
        h = z.reshape(z.shape[0], 1, 1, self.latent_dim)
        for i, layer in enumerate(self.dec):
            h = layer(h)
            h = nn.relu(h) if i < len(self.dec) - 1 else nn.sigmoid(h)
        return h

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return self.decode(self.encode(x, train))


# ---------------------------------------------------------------------------
# PointNet (LiDAR, [B, 128, 3] -> 256-d feature)
# ---------------------------------------------------------------------------


class _TNet(nn.Module):
    """Spatial transformer producing a k x k alignment matrix initialized at
    identity (reference STN3d/STNkd, ``pointnet.py:9-108``)."""

    k: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # x: [B, P, k]
        h = x
        for i, f in enumerate((64, 128, 1024)):
            h = nn.Dense(f, name=f"mlp_{i}")(h)
            h = nn.BatchNorm(use_running_average=not train, name=f"bn_{i}", **_BN)(h)
            h = nn.relu(h)
        h = h.max(axis=1)  # global max pool over points
        for i, f in enumerate((512, 256)):
            h = nn.Dense(f, name=f"fc_{i}")(h)
            h = nn.BatchNorm(use_running_average=not train, name=f"fc_bn_{i}", **_BN)(h)
            h = nn.relu(h)
        h = nn.Dense(
            self.k * self.k,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="fc_out",
        )(h)
        eye = jnp.eye(self.k, dtype=h.dtype).reshape(1, self.k * self.k)
        return (h + eye).reshape(-1, self.k, self.k)


class PointNetFeat(nn.Module):
    """Shared point MLPs 3->64->128->1024 with input T-Net and global max
    pool -> 1024-d (reference ``pointnet.py:111-165``). Zero-padded points
    participate in the max exactly as in the reference's fixed-128 collate."""

    feature_transform: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        x = points_input_f32(x)
        trans = _TNet(3, name="stn")(x, train)
        h = jnp.einsum("bpc,bcd->bpd", x, trans)
        h = nn.Dense(64, name="mlp_0")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn_0", **_BN)(h)
        h = nn.relu(h)
        trans_feat = None
        if self.feature_transform:
            trans_feat = _TNet(64, name="fstn")(h, train)
            h = jnp.einsum("bpc,bcd->bpd", h, trans_feat)
        h = nn.Dense(128, name="mlp_1")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn_1", **_BN)(h)
        h = nn.relu(h)
        h = nn.Dense(1024, name="mlp_2")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn_2", **_BN)(h)
        h = h.max(axis=1)
        return h, trans, trans_feat


class PointNetClassifier(nn.Module):
    """Classifier head over PointNetFeat; ``feat_256`` is the 256-d feature
    the GNN consumes (reference ``forward_feat``, ``pointnet.py:188-192``)."""

    num_classes: int = 7
    feature_transform: bool = False
    dropout: float = 0.3

    def setup(self) -> None:
        self.feat = PointNetFeat(self.feature_transform)
        self.fc1 = nn.Dense(512)
        self.bn1 = nn.BatchNorm(**_BN)
        self.fc2 = nn.Dense(256)
        self.bn2 = nn.BatchNorm(**_BN)
        self.fc3 = nn.Dense(self.num_classes)
        self.drop = nn.Dropout(self.dropout)

    def feat_256(
        self, x: jax.Array, train: bool = False, deterministic: bool = True
    ) -> jax.Array:
        h, _, _ = self.feat(x, train)
        h = nn.relu(self.bn1(self.fc1(h), use_running_average=not train))
        h = self.drop(self.fc2(h), deterministic=deterministic)
        h = nn.relu(self.bn2(h, use_running_average=not train))
        return h

    def __call__(self, x: jax.Array, train: bool = False, deterministic: bool = True):
        h, trans, trans_feat = self.feat(x, train)
        h = nn.relu(self.bn1(self.fc1(h), use_running_average=not train))
        h = self.drop(self.fc2(h), deterministic=deterministic)
        h = nn.relu(self.bn2(h, use_running_average=not train))
        logits = self.fc3(h)
        return nn.log_softmax(logits), trans, trans_feat


def feature_transform_regularizer(trans: jax.Array) -> jax.Array:
    """|| T T^t - I ||_F mean — orthogonality loss (``pointnet.py:195-202``)."""
    k = trans.shape[-1]
    eye = jnp.eye(k)[None]
    diff = jnp.einsum("bij,bkj->bik", trans, trans) - eye
    return jnp.mean(jnp.linalg.norm(diff, axis=(1, 2)))


# ---------------------------------------------------------------------------
# RadarNet ([B, 64, 4] -> 256-d feature)
# ---------------------------------------------------------------------------


class RadarNetFeat(nn.Module):
    """PointNet-style 4->64->128->1024 without any T-Net
    (reference ``radarnet.py:9-37``)."""

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = nn.Dense(64, name="mlp_0")(points_input_f32(x))
        h = nn.BatchNorm(use_running_average=not train, name="bn_0", **_BN)(h)
        h = nn.relu(h)
        h = nn.Dense(128, name="mlp_1")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn_1", **_BN)(h)
        h = nn.relu(h)
        h = nn.Dense(1024, name="mlp_2")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn_2", **_BN)(h)
        return h.max(axis=1)


class RadarNetClassifier(nn.Module):
    """Head over RadarNetFeat; ``feat_256`` feeds the GNN
    (reference ``forward_feat``, ``radarnet.py:60-64``)."""

    num_classes: int = 7
    dropout: float = 0.3

    def setup(self) -> None:
        self.feat = RadarNetFeat()
        self.fc1 = nn.Dense(512)
        self.bn1 = nn.BatchNorm(**_BN)
        self.fc2 = nn.Dense(256)
        self.bn2 = nn.BatchNorm(**_BN)
        self.fc3 = nn.Dense(self.num_classes)
        self.drop = nn.Dropout(self.dropout)

    def feat_256(
        self, x: jax.Array, train: bool = False, deterministic: bool = True
    ) -> jax.Array:
        h = self.feat(x, train)
        h = nn.relu(self.bn1(self.fc1(h), use_running_average=not train))
        h = self.drop(self.fc2(h), deterministic=deterministic)
        h = nn.relu(self.bn2(h, use_running_average=not train))
        return h

    def __call__(self, x: jax.Array, train: bool = False, deterministic: bool = True):
        h = self.feat_256(x, train, deterministic)
        return nn.log_softmax(self.fc3(h))
