"""Shared flax layers: MLPs, degenerate single-token attention, GAT conv."""

from __future__ import annotations

from typing import Optional, Sequence

import jax

from flax import linen as nn

from batch3dmot_tpu.ops import segment_softmax, segment_sum


class MLP(nn.Module):
    """Dense stack with ReLU between layers (never after the last, matching
    the reference's ``nn.Sequential(Linear, ReLU, ..., Linear)`` blocks).

    ``dtype`` is the *compute* dtype (params stay f32): bf16 halves the MXU
    cycle count on TPU; matmul accumulation remains f32 in XLA."""

    features: Sequence[int]
    dtype: Optional[jax.typing.DTypeLike] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, f in enumerate(self.features):
            x = nn.Dense(f, name=f"dense_{i}", dtype=self.dtype)(x)
            if i < len(self.features) - 1:
                x = nn.relu(x)
        return x


class SingleTokenAttention(nn.Module):
    """Cross-edge modality "attention" with one key/value token.

    The reference wraps per-edge endpoint features in
    ``nn.MultiheadAttention`` with a single kv token
    (``clr_att_gnn.py:77-79,143-159``). Softmax over one key is identically 1
    for every head, so the whole block degenerates to the value/output
    projections applied to the (single) value token — the query has *no*
    effect. On TPU we therefore implement it as exactly that: two fused
    affine maps, ``out = (x @ Wv + bv) @ Wo + bo`` — a pure MXU op with no
    softmax at all. (Checkpoint import maps torch's in_proj value slice and
    out_proj onto these two Dense layers.)
    """

    dim: int
    dtype: Optional[jax.typing.DTypeLike] = None

    @nn.compact
    def __call__(self, value: jax.Array) -> jax.Array:
        v = nn.Dense(self.dim, name="v_proj", dtype=self.dtype)(value)
        return nn.Dense(self.dim, name="out_proj", dtype=self.dtype)(v)


class GATConv(nn.Module):
    """Single-head graph attention convolution over a masked edge list.

    Matches ``torch_geometric.nn.GATConv(in, out, add_self_loops=False)``:
    e_ij = LeakyReLU(a_src . (W x_j) + a_dst . (W x_i)); alpha = scatter
    softmax over incoming edges of i; out_i = sum_j alpha_ij (W x_j) + bias.
    Used for the frame-wise kNN convolution (reference ``clr_att_gnn.py:93``,
    ``pose_gnn.py:55``; note the reference *discards* its result — see
    ``GNNConfig.knn_conv_mode``).
    """

    features: int
    negative_slope: float = 0.2

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [N, F]
        src: jax.Array,  # [E]
        dst: jax.Array,  # [E]
        edge_mask: Optional[jax.Array] = None,  # [E]
    ) -> jax.Array:
        n = x.shape[0]
        wx = nn.Dense(self.features, use_bias=False, name="lin")(x)
        a_src = self.param("att_src", nn.initializers.glorot_uniform(), (self.features, 1))
        a_dst = self.param("att_dst", nn.initializers.glorot_uniform(), (self.features, 1))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        alpha = (wx @ a_src)[src, 0] + (wx @ a_dst)[dst, 0]  # [E]
        alpha = nn.leaky_relu(alpha, self.negative_slope)
        alpha = segment_softmax(alpha, dst, n, edge_mask)
        msgs = wx[src] * alpha[:, None]
        out = segment_sum(msgs, dst, n, edge_mask)
        return out + bias
