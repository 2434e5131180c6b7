"""Time-aware tracking GNNs with cross-edge modality attention (flax).

Functional re-design of the reference's two model families:

  * :class:`MultimodalGNN` — the paper's model (reference
    ``models/clr_att_gnn.py``): frozen ResNet/PointNet/RadarNet encoders run
    *inside* the forward over all nodes of the padded graph, per-edge
    cross-edge modality attention fuses endpoint modality embeddings into a
    64-d attribute, and a depth-6 causal message-passing stack (weights
    shared across depth, as in the reference where one
    ``CausalMessagePassing`` instance serves all layers) classifies edges.
  * :class:`PoseGNN` — the poses-only ablation (reference
    ``models/pose_gnn.py``): same topology at smaller widths, logit output
    (the reference classifier has no Sigmoid — it pairs with a
    BCE-with-logits trainer).

TPU mapping: all gathers are indexed loads over fixed-shape arrays; the two
per-layer scatter-adds (past messages by edge destination, future messages by
edge source — reference ``clr_att_gnn.py:288-300``) run as one-hot MXU
matmuls via :func:`batch3dmot_tpu.ops.segment_sum`; padded edges are masked
out of every reduction. Batched windows are handled by ``jax.vmap`` over a
leading window dimension.

The reference's every-other-layer frame-wise kNN GATConv computes a result
that is then **discarded** (``x[ts == t] == x_t`` — comparison, not
assignment; ``clr_att_gnn.py:178-184``, SURVEY.md §6.1-1). Trained reference
checkpoints embed that behavior, so ``knn_conv_mode='noop'`` (default) skips
the conv entirely; ``'active'`` applies it, which is what the code visibly
intended.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from batch3dmot_tpu.graph import PaddedGraph
from batch3dmot_tpu.models.encoders import (
    PointNetClassifier,
    RadarNetClassifier,
    ResNetAE,
)
from batch3dmot_tpu.models.layers import MLP, GATConv, SingleTokenAttention
from batch3dmot_tpu.ops import knn_graph_masked, segment_sum


class CausalMessagePassing(nn.Module):
    """One step of time-directed edge/node message passing.

    Per edge (j -> i, j in the past):
      updated_edge = MLP([x_i, x_j, edge_attr(, att_edge_attr)])
      future_msg   = MLP([x_i, updated_edge, initial_x_i])  -> sum into j
      past_msg     = MLP([x_j, updated_edge, initial_x_j])  -> sum into i
      x'           = MLP([sum past, sum future])
    (reference ``clr_att_gnn.py:191-356`` / ``pose_gnn.py:89-252``).
    """

    node_dim: int  # 96 (multimodal) / 48 (pose)
    edge_dim: int  # 64 / 32
    msg_dim: int  # 128 / 64
    # hidden widths of the edge-update MLP (reference: 320->256->128->64
    # multimodal, 128->96->64->32 pose)
    edge_update_hidden: Tuple[int, int] = (256, 128)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [N, node_dim]
        edge_attr: jax.Array,  # [E, edge_dim]
        initial_x: jax.Array,  # [N, node_dim]
        src: jax.Array,  # [E]
        dst: jax.Array,  # [E]
        edge_mask: jax.Array,  # [E] bool
        att_edge_attr: Optional[jax.Array] = None,  # [E, edge_dim] or None
    ) -> Tuple[jax.Array, jax.Array]:
        n = x.shape[0]
        x_j, x_i = x[src], x[dst]
        init_j, init_i = initial_x[src], initial_x[dst]

        edge_in = [x_i, x_j, edge_attr]
        if att_edge_attr is not None:
            edge_in.append(att_edge_attr)
        updated_edge = MLP(
            (*self.edge_update_hidden, self.edge_dim), name="edge_update"
        )(jnp.concatenate(edge_in, axis=1))

        m = self.msg_dim
        future = MLP((m + m // 2, m), name="future_msgs")(
            jnp.concatenate([x_i, updated_edge, init_i], axis=1)
        )
        past = MLP((m + m // 2, m), name="past_msgs")(
            jnp.concatenate([x_j, updated_edge, init_j], axis=1)
        )

        # past messages flow into the present node (dst); future messages
        # flow back into the past node (src).
        agg_past = segment_sum(past, dst, n, edge_mask)
        agg_future = segment_sum(future, src, n, edge_mask)
        combined = jnp.concatenate([agg_past, agg_future], axis=1)
        x_new = MLP((m + m // 2, m, self.node_dim), name="combine")(combined)
        return x_new, updated_edge


class MultimodalGNN(nn.Module):
    """Camera+LiDAR+radar tracking GNN with cross-edge modality attention.

    Output: (edge_scores [E] in (0,1), x_sens [N, 288]) — matching the
    reference forward contract (``clr_att_gnn.py:95-188``).
    """

    depth: int = 6
    node_dim: int = 96
    edge_dim: int = 64
    img_dim: int = 96
    lidar_dim: int = 128
    radar_dim: int = 64
    use_attention: bool = True
    knn_conv_mode: str = "noop"  # 'noop' (reference behavior) | 'active'
    knn_conv_k: int = 20
    num_classes: int = 7
    # Frozen encoders (reference sets requires_grad=False on all three,
    # clr_att_gnn.py:26-33); stop_gradient also skips their backward pass.
    freeze_encoders: bool = True
    # Active sensor subset — covers the reference's graduated model family
    # (pose_gnn < cl_att_gnn [img+lidar, the missing module predict.py
    # instantiates] < clr_att_gnn [full]). Disabled modalities contribute
    # neither encoders nor attention blocks; the att_edge_encoder input
    # shrinks accordingly.
    modalities: Tuple[str, ...] = ("img", "lidar", "radar")

    def setup(self) -> None:
        if "img" in self.modalities:
            self.resnet = ResNetAE()
        if "lidar" in self.modalities:
            self.pointnet = PointNetClassifier(self.num_classes)
            self.fc_lidar_encoder = MLP((192, self.lidar_dim))
        if "radar" in self.modalities:
            self.radarnet = RadarNetClassifier(self.num_classes)
            self.fc_radar_encoder = MLP((192, 128, self.radar_dim))

        self.edge_encoder = MLP((16, 32, self.edge_dim))
        self.node_encoder = MLP((48, self.node_dim))
        self.edge_classifier = MLP((32, 16, 8, 1))

        if "img" in self.modalities:
            self.c2c_att = SingleTokenAttention(self.img_dim)
        if "lidar" in self.modalities:
            self.l2l_att = SingleTokenAttention(self.lidar_dim)
        if "radar" in self.modalities:
            self.r2r_att = SingleTokenAttention(self.radar_dim)

        # 640 = 2 * (radar 64 + lidar 128 + img 96) + edge 64 with attention;
        # the no-attention ablation concatenates [img_i, lidar_i, img_j,
        # lidar_j, edge] = 512 (the reference would feed 512 into a 640-wide
        # layer and crash — sized correctly here).
        self.att_edge_encoder = MLP((512, 384, 256, 128, self.edge_dim))
        self.message_passing = CausalMessagePassing(
            self.node_dim, self.edge_dim, 128
        )
        self.knn_conv = GATConv(self.node_dim)

    def encode_frozen(
        self, img: jax.Array, lidar: jax.Array, radar: jax.Array
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Frozen-encoder features for a batch of detections.

        Exposed separately so inference can encode every scene detection
        exactly ONCE and let overlapping windows gather the embeddings —
        the reference (and the plain ``__call__``) re-encodes each detection
        in every window it appears in (L-fold waste on the dominant FLOPs).

        Returns raw (x_img [., 96], pointnet_256, radarnet_256) — presence
        gating and the trainable projection heads happen in
        :meth:`forward_from_encodings` so this output is checkpoint-stable.
        Disabled modalities return zeros.
        """
        n = img.shape[0]
        x_img = (
            self.resnet.encode(img)
            if "img" in self.modalities
            else jnp.zeros((n, self.img_dim))
        )
        pn = (
            self.pointnet.feat_256(lidar)
            if "lidar" in self.modalities
            else jnp.zeros((n, 256))
        )
        rn = (
            self.radarnet.feat_256(radar)
            if "radar" in self.modalities
            else jnp.zeros((n, 256))
        )
        if self.freeze_encoders:
            x_img = jax.lax.stop_gradient(x_img)
            pn = jax.lax.stop_gradient(pn)
            rn = jax.lax.stop_gradient(rn)
        return x_img, pn, rn

    def __call__(self, g: PaddedGraph) -> Tuple[jax.Array, jax.Array]:
        x_img, pn, rn = self.encode_frozen(g.img, g.lidar, g.radar)
        lidar_present = jnp.sum(g.lidar, axis=(1, 2)) != 0
        radar_present = jnp.sum(g.radar, axis=(1, 2)) != 0
        return self.forward_from_encodings(
            g, x_img, pn, rn, lidar_present, radar_present
        )

    def pre_message_passing(
        self,
        g: PaddedGraph,
        x_img: jax.Array,
        pn: jax.Array,
        rn: jax.Array,
        lidar_present: jax.Array,
        radar_present: jax.Array,
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        """Everything before the message-passing loop: (x0, edge_attr0,
        att_edge_attr, x_sens). Exposed so the fused Pallas MP kernel
        (:mod:`batch3dmot_tpu.ops.pallas_mp`) can take over from here at
        inference."""
        src, dst = g.edge_src, g.edge_dst
        has = lambda m: m in self.modalities

        edge_attr = self.edge_encoder(g.edge_attr)

        n = x_img.shape[0]
        x_lidar = (
            jnp.where(lidar_present[:, None], self.fc_lidar_encoder(pn), 0.0)
            if has("lidar")
            else jnp.zeros((n, self.lidar_dim))
        )
        x_radar = (
            jnp.where(radar_present[:, None], self.fc_radar_encoder(rn), 0.0)
            if has("radar")
            else jnp.zeros((n, self.radar_dim))
        )

        if self.use_attention:
            # concat order matches the reference: radar, lidar, img (:161)
            blocks_j, blocks_i = [], []
            if has("radar"):
                blocks_j.append(self.r2r_att(x_radar[src]))
                blocks_i.append(self.r2r_att(x_radar[dst]))
            if has("lidar"):
                blocks_j.append(self.l2l_att(x_lidar[src]))
                blocks_i.append(self.l2l_att(x_lidar[dst]))
            if has("img"):
                blocks_j.append(self.c2c_att(x_img[src]))
                blocks_i.append(self.c2c_att(x_img[dst]))
            x_sens_j = jnp.concatenate(blocks_j, axis=1)
            x_sens_i = jnp.concatenate(blocks_i, axis=1)
            att_edge_attr = self.att_edge_encoder(
                jnp.concatenate([x_sens_i, x_sens_j, edge_attr], axis=1)
            )
        else:
            parts = []
            if has("img"):
                parts += [x_img[dst]]
            if has("lidar"):
                parts += [x_lidar[dst]]
            if has("img"):
                parts += [x_img[src]]
            if has("lidar"):
                parts += [x_lidar[src]]
            att_edge_attr = self.att_edge_encoder(
                jnp.concatenate(parts + [edge_attr], axis=1)
            )

        x_sens = jnp.concatenate([x_img, x_lidar, x_radar], axis=1)
        x = self.node_encoder(g.pose)
        return x, edge_attr, att_edge_attr, x_sens

    def forward_from_encodings(
        self,
        g: PaddedGraph,
        x_img: jax.Array,  # [N, 96]
        pn: jax.Array,  # [N, 256] pointnet features
        rn: jax.Array,  # [N, 256] radarnet features
        lidar_present: jax.Array,  # [N] bool — vectorized form of the
        radar_present: jax.Array,  # reference's per-node loop (:107-121)
    ) -> Tuple[jax.Array, jax.Array]:
        src, dst, emask = g.edge_src, g.edge_dst, g.edge_mask
        x, edge_attr, att_edge_attr, x_sens = self.pre_message_passing(
            g, x_img, pn, rn, lidar_present, radar_present
        )
        initial_x = x

        for layer in range(self.depth):
            if layer % 2 == 0 and self.knn_conv_mode == "active":
                same_t = (g.node_time[None, :] == g.node_time[:, None])
                k_src, k_dst, k_mask = knn_graph_masked(
                    x, self.knn_conv_k, valid=g.node_mask, pair_valid=same_t
                )
                x_conv = self.knn_conv(x, k_src, k_dst, k_mask)
                x = jnp.where(g.node_mask[:, None], x_conv, x)
            x, edge_attr = self.message_passing(
                x, edge_attr, initial_x, src, dst, emask, att_edge_attr
            )

        scores = nn.sigmoid(self.edge_classifier(edge_attr)[:, 0])
        return scores, x_sens


class PoseGNN(nn.Module):
    """Poses-only tracking GNN; returns *logits* (no sigmoid, reference
    ``pose_gnn.py:45-53``) and the encoded node features."""

    depth: int = 6
    node_dim: int = 48
    edge_dim: int = 32
    knn_conv_mode: str = "noop"
    knn_conv_k: int = 20

    def setup(self) -> None:
        self.edge_encoder = MLP((8, 16, self.edge_dim))
        self.node_encoder = MLP((24, 36, self.node_dim))
        self.edge_classifier = MLP((16, 8, 4, 1))
        self.message_passing = CausalMessagePassing(
            self.node_dim, self.edge_dim, 64, edge_update_hidden=(96, 64)
        )
        self.knn_conv = GATConv(self.node_dim)

    def pre_message_passing(self, g: PaddedGraph) -> Tuple[jax.Array, jax.Array]:
        """(x0, edge_attr0) — the fused-kernel handoff point (no modality
        attention in the pose model)."""
        return self.node_encoder(g.pose), self.edge_encoder(g.edge_attr)

    def __call__(self, g: PaddedGraph) -> Tuple[jax.Array, jax.Array]:
        src, dst, emask = g.edge_src, g.edge_dst, g.edge_mask
        x, edge_attr = self.pre_message_passing(g)
        initial_x = x
        x_enc = x

        for layer in range(self.depth):
            if layer % 2 == 0 and self.knn_conv_mode == "active":
                same_t = (g.node_time[None, :] == g.node_time[:, None])
                k_src, k_dst, k_mask = knn_graph_masked(
                    x, self.knn_conv_k, valid=g.node_mask, pair_valid=same_t
                )
                x_conv = self.knn_conv(x, k_src, k_dst, k_mask)
                x = jnp.where(g.node_mask[:, None], x_conv, x)
            x, edge_attr = self.message_passing(
                x, edge_attr, initial_x, src, dst, emask
            )

        logits = self.edge_classifier(edge_attr)[:, 0]
        return logits, x_enc
