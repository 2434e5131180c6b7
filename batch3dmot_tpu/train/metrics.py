"""Losses and masked metrics in pure jnp.

Replaces torchmetrics ``average_precision`` (reference ``train.py:143-155``)
and ``torch.nn.BCELoss(weight=...)`` (``train.py:136-141``) with fixed-shape,
mask-aware implementations that run under ``jit`` on padded edge arrays.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_EPS = 1e-7


def masked_bce(
    scores: jax.Array,
    labels: jax.Array,
    mask: jax.Array,
    weights: Optional[jax.Array] = None,
    from_logits: bool = False,
) -> jax.Array:
    """Mean BCE over real (masked-in) edges, optionally per-edge weighted.

    Matches torch ``BCELoss(weight=w)`` semantics: mean of w * bce over the
    real edges. ``from_logits=True`` gives the numerically-stable
    BCE-with-logits pairing for the sigmoid-less PoseGNN head.
    """
    if from_logits:
        # log(1+exp(-|x|)) formulation
        z = scores
        per_edge = jnp.maximum(z, 0) - z * labels + jnp.log1p(jnp.exp(-jnp.abs(z)))
    else:
        s = jnp.clip(scores, _EPS, 1.0 - _EPS)
        per_edge = -(labels * jnp.log(s) + (1.0 - labels) * jnp.log(1.0 - s))
    if weights is not None:
        per_edge = per_edge * weights
    m = mask.astype(per_edge.dtype)
    return jnp.sum(per_edge * m) / jnp.maximum(jnp.sum(m), 1.0)


def average_precision(
    scores: jax.Array,
    labels: jax.Array,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Binary average precision: sum over score thresholds of
    ``(recall_n - recall_{n-1}) * precision_n`` — tied scores form ONE
    threshold, matching torchmetrics (the reference metric,
    ``train.py:143-155``) and sklearn; differential-tested against sklearn in
    ``tests/test_train.py``. Fixed-shape: masked entries sort last (their own
    -inf tie group) and contribute nothing. Returns NaN when there are no
    positives (callers nanmean across batches, as the reference does with
    np.nanmean, train.py:210)."""
    if mask is None:
        mask = jnp.ones_like(scores, dtype=bool)
    neg_inf = jnp.finfo(scores.dtype).min
    s = jnp.where(mask, scores, neg_inf)
    order = jnp.argsort(-s)
    s_sorted = s[order]
    y = jnp.where(mask, labels, 0.0)[order]
    valid = mask[order].astype(scores.dtype)
    tp = jnp.cumsum(y)
    seen = jnp.cumsum(valid)
    # last index of each tie group, broadcast to every member of the group
    n = s_sorted.shape[0]
    is_last = jnp.concatenate(
        [s_sorted[1:] != s_sorted[:-1], jnp.ones((1,), bool)]
    )
    end = jnp.where(is_last, jnp.arange(n), n)
    end = jax.lax.cummin(end[::-1])[::-1]
    precision = tp[end] / jnp.maximum(seen[end], 1.0)
    num_pos = jnp.sum(y)
    ap = jnp.sum(precision * y) / num_pos  # NaN if num_pos == 0 (intended)
    return ap


def average_precision_multi(
    scores: jax.Array,
    labels: jax.Array,
    sels: jax.Array,
) -> jax.Array:
    """Binary AP for SEVERAL selection rows off ONE shared sort.

    ``sels`` is ``[C, n]`` bool; row ``c``'s AP equals
    ``average_precision(scores, labels, sels[c])`` (pinned by
    ``tests/test_train.py``) but the argsort + tie-group pass runs once
    instead of per row — the scanned device epochs compute overall + 7
    per-class APs per step, and 8 argsorts of the same [B*E] vector cost
    more than the fused training step itself (11.7 ms vs 10.4 ms at
    (256, 4096) x 8 on hardware, ``scripts/bench_device_metrics.py``).

    Why sharing the sort is exact: tie groups are defined by SCORE values,
    and a row's cumulative tp/seen at a tie-group end count only that
    row's selected entries with score >= the group's value — entries
    outside the row contribute 0 to its cumsums, which is the same number
    a dedicated sort (with excluded entries at -inf) produces. Entries
    selected by NO row sort last as one -inf group and contribute nothing.
    Rows with no positives return NaN (callers nanmean, as the reference).
    """
    neg_inf = jnp.finfo(scores.dtype).min
    any_sel = sels.any(axis=0)
    s = jnp.where(any_sel, scores, neg_inf)
    order = jnp.argsort(-s)
    s_sorted = s[order]
    n = s_sorted.shape[0]
    is_last = jnp.concatenate(
        [s_sorted[1:] != s_sorted[:-1], jnp.ones((1,), bool)]
    )
    end = jnp.where(is_last, jnp.arange(n), n)
    end = jax.lax.cummin(end[::-1])[::-1]
    y_sorted = labels[order]

    def one(sel):
        sel_s = sel[order].astype(scores.dtype)
        yc = y_sorted * sel_s
        tp = jnp.cumsum(yc)
        seen = jnp.cumsum(sel_s)
        precision = tp[end] / jnp.maximum(seen[end], 1.0)
        return jnp.sum(precision * yc) / jnp.sum(yc)  # NaN if no positives

    return jax.vmap(one)(sels)


def masked_accuracy(
    scores: jax.Array,
    labels: jax.Array,
    mask: jax.Array,
    threshold: float = 0.5,
) -> jax.Array:
    pred = (scores > threshold).astype(labels.dtype)
    correct = (pred == labels).astype(jnp.float32) * mask
    return jnp.sum(correct) / jnp.maximum(jnp.sum(mask), 1.0)
