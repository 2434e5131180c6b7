"""Segment (scatter) reductions over padded edge arrays.

This is **the** hot op of the tracker GNN: every message-passing layer does two
scatter-adds (past messages by destination node, future messages by source
node — reference ``clr_att_gnn.py:288-300,344``), i.e. 2 x depth = 12 per
forward. The reference relies on ``torch_scatter.scatter`` (CUDA). Here the
default implementation is a **one-hot matmul** that runs on the MXU: with a
padded graph of N nodes and E edges the scatter becomes

    out[N, D] = onehot[N, E] @ (data[E, D] * mask[E, None])

which XLA fuses with the surrounding MLPs and which beats gather/scatter
lowering for the graph sizes this pipeline produces (N <= 1024, E <= 8192).
An ``xla_scatter`` path (``jax.ops.segment_sum``) is kept for very large
graphs, and a Pallas kernel (``ops/pallas_segment.py``) generates the one-hot
tiles in VMEM without materializing [N, E] in HBM.

All functions are single-graph; batched graphs go through ``jax.vmap`` (the
one-hot path then becomes one batched matmul).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# Above this many one-hot elements (N * E) fall back to XLA scatter.
_ONEHOT_LIMIT = 32 * 1024 * 1024


def _one_hot_matrix(
    ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array],
    dtype=jnp.float32,
) -> jax.Array:
    """[N, E] one-hot selection matrix, zero columns for masked edges.

    dtype follows the data so a bf16 pipeline stays bf16 on the MXU (0/1
    entries are exact in any float dtype; accumulation is f32 regardless via
    preferred_element_type)."""
    seg = jax.lax.broadcasted_iota(jnp.int32, (num_segments, ids.shape[0]), 0)
    onehot = (seg == ids[None, :]).astype(dtype)
    if mask is not None:
        onehot = onehot * mask.astype(dtype)[None, :]
    return onehot


def segment_sum(
    data: jax.Array,
    ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    method: str = "auto",
) -> jax.Array:
    """Sum ``data[e]`` into ``out[ids[e]]``; padded edges contribute zero.

    data: [E, D] (or [E]); ids: [E] int; mask: [E] bool or None.
    """
    squeeze = data.ndim == 1
    if squeeze:
        data = data[:, None]
    e, d = data.shape

    if method == "auto":
        method = "onehot" if num_segments * e <= _ONEHOT_LIMIT else "xla_scatter"

    if method == "onehot":
        onehot = _one_hot_matrix(
            ids, num_segments, mask,
            dtype=data.dtype if jnp.issubdtype(data.dtype, jnp.floating) else jnp.float32,
        )
        out = jnp.dot(onehot, data, preferred_element_type=jnp.float32).astype(
            data.dtype
        )
    elif method == "xla_scatter":
        if mask is not None:
            # park masked edges in an extra segment that is sliced away
            data = data * mask.astype(data.dtype)[:, None]
            ids = jnp.where(mask, ids, num_segments)
            out = jax.ops.segment_sum(data, ids, num_segments=num_segments + 1)
            out = out[:num_segments]
        else:
            out = jax.ops.segment_sum(data, ids, num_segments=num_segments)
    else:
        raise ValueError(f"Unknown segment_sum method '{method}'")
    return out[:, 0] if squeeze else out


def segment_mean(
    data: jax.Array,
    ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    total = segment_sum(data, ids, num_segments, mask)
    ones = jnp.ones(ids.shape, data.dtype)
    count = segment_sum(ones, ids, num_segments, mask)
    return total / jnp.maximum(count, 1.0)[..., None] if data.ndim > 1 else (
        total / jnp.maximum(count, 1.0)
    )


def segment_max(
    data: jax.Array,
    ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    initial: float = -jnp.inf,
) -> jax.Array:
    """Max-reduce ``data[e]`` into ``out[ids[e]]``; empty segments = initial."""
    squeeze = data.ndim == 1
    if squeeze:
        data = data[:, None]
    if mask is not None:
        data = jnp.where(mask[:, None], data, -jnp.inf)
        ids = jnp.where(mask, ids, num_segments)
    out = jax.ops.segment_max(
        data, ids, num_segments=num_segments + (1 if mask is not None else 0)
    )
    if mask is not None:
        out = out[:num_segments]
    out = jnp.where(jnp.isfinite(out), out, initial)
    return out[:, 0] if squeeze else out


def segment_softmax(
    scores: jax.Array,
    ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Numerically stable softmax of ``scores`` within each segment.

    scores: [E] (or [E, H] per-head). Masked entries return 0. This is the
    scatter-softmax that torch_geometric's GATConv uses internally.
    """
    squeeze = scores.ndim == 1
    if squeeze:
        scores = scores[:, None]
    seg_max = segment_max(scores, ids, num_segments, mask, initial=0.0)
    shifted = scores - seg_max[ids]
    if mask is not None:
        shifted = jnp.where(mask[:, None], shifted, -jnp.inf)
    expd = jnp.exp(shifted)
    expd = jnp.where(jnp.isfinite(expd), expd, 0.0)
    denom = segment_sum(expd, ids, num_segments, mask)
    out = expd / jnp.maximum(denom[ids], 1e-16)
    return out[:, 0] if squeeze else out
