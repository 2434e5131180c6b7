"""Masked on-device kNN graph construction.

Replaces ``torch_geometric.nn.knn_graph`` (CUDA kNN), which the reference
calls *inside* the GNN forward per unique timestamp
(``clr_att_gnn.py:178-184``). On TPU, dynamic per-timestamp sub-tensors are
impossible under ``jit``; instead we compute one padded [N, N] pairwise
distance matrix, mask out invalid pairs (padding, different timestamps,
self-loops) and take a top-k per row with ``jax.lax.top_k``. The result is a
fixed-size edge list of N*k entries with a validity mask.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e30)


def pairwise_sq_dists(x: jax.Array) -> jax.Array:
    """Squared euclidean distances [N, N] via the MXU-friendly expansion
    ||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b."""
    sq = jnp.sum(x * x, axis=-1)
    cross = jnp.dot(x, x.T, preferred_element_type=jnp.float32)
    d = sq[:, None] + sq[None, :] - 2.0 * cross
    return jnp.maximum(d, 0.0)


def knn_graph_masked(
    x: jax.Array,
    k: int,
    valid: Optional[jax.Array] = None,
    pair_valid: Optional[jax.Array] = None,
    loop: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """kNN edges (src=neighbor j, dst=query i) over masked points.

    x: [N, D] features; valid: [N] bool node mask; pair_valid: [N, N] bool
    extra pair constraint (e.g. same-timestamp). Matches
    ``torch_geometric.nn.knn_graph(x, k, loop=False)`` semantics on the valid
    subset: each valid query node i receives edges from its k nearest valid
    neighbors j (j -> i).

    Returns (src [N*k], dst [N*k], mask [N*k]); masked entries have src=dst=0.
    """
    n = x.shape[0]
    d = pairwise_sq_dists(x)
    allowed = jnp.ones((n, n), bool)
    if valid is not None:
        allowed &= valid[None, :] & valid[:, None]
    if pair_valid is not None:
        allowed &= pair_valid
    if not loop:
        allowed &= ~jnp.eye(n, dtype=bool)
    d = jnp.where(allowed, d, _INF)

    k = min(k, n)
    neg_d, idx = jax.lax.top_k(-d, k)  # idx: [N, k] nearest neighbors per row
    edge_valid = neg_d > -_INF  # neighbor was allowed

    dst = jax.lax.broadcasted_iota(jnp.int32, (n, k), 0).reshape(-1)
    src = idx.astype(jnp.int32).reshape(-1)
    mask = edge_valid.reshape(-1)
    src = jnp.where(mask, src, 0)
    dst = jnp.where(mask, dst, 0)
    return src, dst, mask
