"""Fused message-passing TRAINING kernels: forward + hand-written backward.

Training is the dominant workload for users of this framework (the reference
trains the GNN for 100 epochs, ``cl_config.yaml``), and its device time is
the message-passing loop forward AND backward. The inference kernel
(:mod:`batch3dmot_tpu.ops.pallas_mp`) already beats XLA's forward 1.6x; this
module adds the matching backward so the whole differentiable segment
(message-passing loop + edge classifier) runs as two Pallas kernels under a
``jax.custom_vjp``:

  * forward kernel: the inference computation, additionally stashing each
    layer's carries (x_t [depth, N, nd], e_t [depth+1, E, ed]) — the only
    residuals the backward needs;
  * backward kernel: reverse ``fori_loop`` over layers; per layer it
    RECOMPUTES the intra-layer intermediates from the stashed carries
    (standard rematerialization — one extra forward's worth of matmuls) and
    back-propagates with pure MXU ops: dX = W^T chains, weight grads
    dW = h_in^T @ d_out, gather/scatter transposes as one-hot contractions.
    Weight gradients ACCUMULATE across the window grid in VMEM-resident
    output blocks (zero-initialized at grid step 0).

The upstream stages (frozen encoders, attention, node/edge encoders) stay in
flax/XLA — their gradients flow through the custom_vjp's dx0/de0/datt
cotangents. Weight-extraction from the params pytree happens INSIDE the loss
so the returned weight cotangents land in the optimizer's tree
automatically.

Architecture contract (asserted): edge-update MLP of 3 layers, message MLPs
of 2, combine of 3, classifier of 4 — the production shape of both
MultimodalGNN and PoseGNN (``models/gnn.py``; reference widths
``clr_att_gnn.py:35-93`` / ``pose_gnn.py:24-60``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from batch3dmot_tpu.ops.pallas_mp import _unpack, extract_mp_params

_dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)


# VMEM ceiling for one window's TRAINING working set. The backward kernel
# carries far more live state than the inference kernel (stashed per-layer
# x/e carries, the full weight-gradient set as output blocks, and the
# recompute intermediates), so its guard is tighter than
# pallas_mp._FUSED_MAX_EDGE_NODE_PRODUCT: (64, 512) compiles and wins ~2x
# on hardware; (128, 1024) exceeds scoped VMEM at 20.1 MB (> 16 MB/core).
_FUSED_TRAIN_MAX_EDGE_NODE_PRODUCT = 512 * 64


def fused_train_supported(max_nodes: int, max_edges: int) -> bool:
    """Whether the fused TRAINING kernels' VMEM working set fits at this
    bucket (callers fall back to XLA autodiff above it)."""
    return max_edges * max_nodes <= _FUSED_TRAIN_MAX_EDGE_NODE_PRODUCT


def _mm_t(dy, w):
    """dy [M, F] x W [K, F] -> dX [M, K]  (dX = dY @ W^T)."""
    return jax.lax.dot_general(
        dy, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _grad_w(x, dy):
    """x [M, K] x dy [M, F] -> dW [K, F]  (dW = X^T @ dY)."""
    return jax.lax.dot_general(
        x, dy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _scatter_t(oh, d):
    """oh [E, N] x d [E, F] -> [N, F]  (transpose of the one-hot gather)."""
    return jax.lax.dot_general(
        oh, d, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _bsum(d):
    """Column sum as an [8, F] tile (all rows identical; the caller slices
    row 0). Computed as ones[8, E] @ d on the MXU: Mosaic cannot relayout
    the sublane-replicated vectors a broadcasted keepdims-sum produces, and
    [1, F] results can't live in the loop carry at all."""
    ones = jnp.ones((8, d.shape[0]), jnp.float32)
    return _dot(ones, d)


def _assert_production_shape(meta):
    assert meta["n_eu"] == 2 and meta["n_eub"] == 3, meta
    assert meta["n_fut"] == 1 and meta["n_futb"] == 2, meta
    assert meta["n_past"] == 1 and meta["n_pastb"] == 2, meta
    assert meta["n_comb"] == 2 and meta["n_combb"] == 3, meta
    assert meta["n_cls"] == 4 and meta["n_clsb"] == 4, meta


def _layer_forward(x, e, att, ii, ij, oh_src, oh_dst, W, with_attention):
    """One MP layer, returning every intermediate the backward recomputes."""
    (eu0, eu_rest, eu_b, fut0, fut_rest, fut_b, past0, past_rest, past_b,
     comb0, comb_rest, comb_b, _, _) = W
    x_j = _dot(oh_src, x)
    x_i = _dot(oh_dst, x)
    h1p = _dot(x_i, eu0[0]) + _dot(x_j, eu0[1]) + _dot(e, eu0[2])
    if with_attention:
        h1p = h1p + _dot(att, eu0[3])
    h1 = jnp.maximum(h1p + eu_b[0], 0.0)
    h2 = jnp.maximum(_dot(h1, eu_rest[0]) + eu_b[1], 0.0)
    ue = _dot(h2, eu_rest[1]) + eu_b[2]
    f1 = jnp.maximum(
        _dot(x_i, fut0[0]) + _dot(ue, fut0[1]) + _dot(ii, fut0[2]) + fut_b[0], 0.0
    )
    f = _dot(f1, fut_rest[0]) + fut_b[1]
    p1 = jnp.maximum(
        _dot(x_j, past0[0]) + _dot(ue, past0[1]) + _dot(ij, past0[2]) + past_b[0], 0.0
    )
    p = _dot(p1, past_rest[0]) + past_b[1]
    agg_p = _scatter_t(oh_dst, p)
    agg_f = _scatter_t(oh_src, f)
    c1 = jnp.maximum(_dot(agg_p, comb0[0]) + _dot(agg_f, comb0[1]) + comb_b[0], 0.0)
    c2 = jnp.maximum(_dot(c1, comb_rest[0]) + comb_b[1], 0.0)
    x_new = _dot(c2, comb_rest[1]) + comb_b[2]
    return dict(x_j=x_j, x_i=x_i, h1=h1, h2=h2, ue=ue, f1=f1, f=f, p1=p1,
                p=p, agg_p=agg_p, agg_f=agg_f, c1=c1, c2=c2, x_new=x_new)


def _classifier_forward(e, cls_w, cls_b):
    hs = [e]
    h = e
    for i, (w, b) in enumerate(zip(cls_w, cls_b)):
        h = _dot(h, w) + b
        if i < len(cls_w) - 1:
            h = jnp.maximum(h, 0.0)
        hs.append(h)
    return hs  # [e, h1, h2, h3, logits[E,1]]


def _train_fwd_kernel(meta, depth, with_attention, logits,
                      x0_ref, e0_ref, att_ref, oh_src_ref, oh_dst_ref,
                      *rest):
    w_refs = rest[:-3]
    scores_ref, xs_ref, es_ref = rest[-3:]
    W = _unpack(meta, tuple(r[:] for r in w_refs))
    cls_w, cls_b = W[-2], W[-1]
    x0 = x0_ref[0]
    e = e0_ref[0]
    att = att_ref[0] if with_attention else None
    oh_src = oh_src_ref[0]
    oh_dst = oh_dst_ref[0]
    ii = _dot(oh_dst, x0)
    ij = _dot(oh_src, x0)

    def layer(t, carry):
        x, e = carry
        xs_ref[0, t] = x
        es_ref[0, t] = e
        out = _layer_forward(x, e, att, ii, ij, oh_src, oh_dst, W, with_attention)
        return out["x_new"], out["ue"]

    x, e = jax.lax.fori_loop(0, depth, layer, (x0, e))
    es_ref[0, depth] = e
    out = _classifier_forward(e, cls_w, cls_b)[-1][:, 0]
    if not logits:
        out = jax.nn.sigmoid(out)
    scores_ref[0] = jnp.broadcast_to(out[None, :], (8, out.shape[0]))


def _zero_grads_like(W, with_attention):
    zs = []
    for group in W:
        zs.append(tuple(jnp.zeros(w.shape, jnp.float32) for w in group))
    return tuple(zs)


def _train_bwd_kernel(meta, depth, with_attention, logits,
                      ds_ref, xs_ref, es_ref, att_ref, oh_src_ref, oh_dst_ref,
                      *rest):
    n_w = meta["_n_flat"]
    w_refs = rest[:n_w]
    out_refs = rest[n_w:]
    dx0_ref, de0_ref, datt_ref = out_refs[:3]
    wgrad_refs = out_refs[3:]

    W = _unpack(meta, tuple(r[:] for r in w_refs))
    (eu0, eu_rest, eu_b, fut0, fut_rest, fut_b, past0, past_rest, past_b,
     comb0, comb_rest, comb_b, cls_w, cls_b) = W
    att = att_ref[0] if with_attention else None
    oh_src = oh_src_ref[0]
    oh_dst = oh_dst_ref[0]
    x0 = xs_ref[0, 0]
    ii = _dot(oh_dst, x0)
    ij = _dot(oh_src, x0)

    # ---- classifier backward (+ sigmoid when the primal emits scores) ----
    e_final = es_ref[0, depth]
    hs = _classifier_forward(e_final, cls_w, cls_b)
    ds = ds_ref[0, 0][:, None]  # [E, 1]
    if not logits:
        s = jax.nn.sigmoid(hs[-1])
        ds = ds * s * (1.0 - s)
    dcls_w, dcls_b = [], []
    dh = ds
    for i in range(len(cls_w) - 1, -1, -1):
        dcls_w.insert(0, _grad_w(hs[i], dh))
        dcls_b.insert(0, _bsum(dh))
        dh = _mm_t(dh, cls_w[i])
        if i > 0:
            dh = dh * (hs[i] > 0)
    de_next = dh  # cotangent of e_{depth} (the final edge attr)

    # ---- reverse loop over layers ----
    nd = x0.shape[1]
    ed = es_ref.shape[3]
    e_cnt = oh_src.shape[0]

    def g0(groups):
        def z(w):
            shape = (8, w.shape[1]) if w.shape[0] == 1 else w.shape
            return jnp.zeros(shape, jnp.float32)

        return tuple(tuple(z(w) for w in g) for g in groups)

    grads0 = g0((eu0, eu_rest, eu_b, fut0, fut_rest, fut_b, past0, past_rest,
                 past_b, comb0, comb_rest, comb_b))

    def step(k, carry):
        t = depth - 1 - k
        (dX, dUE, dII, dIJ, dATT, G) = carry
        (g_eu0, g_eu, g_eub, g_fut0, g_fut, g_futb, g_past0, g_past, g_pastb,
         g_comb0, g_comb, g_combb) = G
        x = xs_ref[0, t]
        e = es_ref[0, t]
        o = _layer_forward(x, e, att, ii, ij, oh_src, oh_dst, W, with_attention)

        # combine backward (dX is the cotangent of o["x_new"])
        dWc3 = _grad_w(o["c2"], dX)
        dbc3 = _bsum(dX)
        dc2 = _mm_t(dX, comb_rest[1]) * (o["c2"] > 0)
        dWc2 = _grad_w(o["c1"], dc2)
        dbc2 = _bsum(dc2)
        dc1 = _mm_t(dc2, comb_rest[0]) * (o["c1"] > 0)
        dWc1a = _grad_w(o["agg_p"], dc1)
        dWc1b = _grad_w(o["agg_f"], dc1)
        dbc1 = _bsum(dc1)
        dA = _mm_t(dc1, comb0[0])
        dB = _mm_t(dc1, comb0[1])
        dp = _dot(oh_dst, dA)
        df = _dot(oh_src, dB)

        # past message backward
        dWp2 = _grad_w(o["p1"], dp)
        dbp2 = _bsum(dp)
        dp1 = _mm_t(dp, past_rest[0]) * (o["p1"] > 0)
        dWp1a = _grad_w(o["x_j"], dp1)
        dWp1b = _grad_w(o["ue"], dp1)
        dWp1c = _grad_w(ij, dp1)
        dbp1 = _bsum(dp1)
        dx_j = _mm_t(dp1, past0[0])
        due = _mm_t(dp1, past0[1])
        dIJ = dIJ + _mm_t(dp1, past0[2])

        # future message backward
        dWf2 = _grad_w(o["f1"], df)
        dbf2 = _bsum(df)
        df1 = _mm_t(df, fut_rest[0]) * (o["f1"] > 0)
        dWf1a = _grad_w(o["x_i"], df1)
        dWf1b = _grad_w(o["ue"], df1)
        dWf1c = _grad_w(ii, df1)
        dbf1 = _bsum(df1)
        dx_i = _mm_t(df1, fut0[0])
        due = due + _mm_t(df1, fut0[1])
        dII = dII + _mm_t(df1, fut0[2])

        # edge-update backward; dUE carries d(e_{t+1}) = d(ue_t)
        due = due + dUE
        dW3 = _grad_w(o["h2"], due)
        db3 = _bsum(due)
        dh2 = _mm_t(due, eu_rest[1]) * (o["h2"] > 0)
        dW2 = _grad_w(o["h1"], dh2)
        db2 = _bsum(dh2)
        dh1 = _mm_t(dh2, eu_rest[0]) * (o["h1"] > 0)
        dW1a = _grad_w(o["x_i"], dh1)
        dW1b = _grad_w(o["x_j"], dh1)
        dW1c = _grad_w(e, dh1)
        db1 = _bsum(dh1)
        dx_i = dx_i + _mm_t(dh1, eu0[0])
        dx_j = dx_j + _mm_t(dh1, eu0[1])
        de = _mm_t(dh1, eu0[2])
        if with_attention:
            dW1d = _grad_w(att, dh1)
            dATT = dATT + _mm_t(dh1, eu0[3])
            g_eu0_new = (g_eu0[0] + dW1a, g_eu0[1] + dW1b, g_eu0[2] + dW1c,
                         g_eu0[3] + dW1d)
        else:
            g_eu0_new = (g_eu0[0] + dW1a, g_eu0[1] + dW1b, g_eu0[2] + dW1c)

        dX_new = _scatter_t(oh_src, dx_j) + _scatter_t(oh_dst, dx_i)

        G_new = (
            g_eu0_new,
            (g_eu[0] + dW2, g_eu[1] + dW3),
            (g_eub[0] + db1, g_eub[1] + db2, g_eub[2] + db3),
            (g_fut0[0] + dWf1a, g_fut0[1] + dWf1b, g_fut0[2] + dWf1c),
            (g_fut[0] + dWf2,),
            (g_futb[0] + dbf1, g_futb[1] + dbf2),
            (g_past0[0] + dWp1a, g_past0[1] + dWp1b, g_past0[2] + dWp1c),
            (g_past[0] + dWp2,),
            (g_pastb[0] + dbp1, g_pastb[1] + dbp2),
            (g_comb0[0] + dWc1a, g_comb0[1] + dWc1b),
            (g_comb[0] + dWc2, g_comb[1] + dWc3),
            (g_combb[0] + dbc1, g_combb[1] + dbc2, g_combb[2] + dbc3),
        )
        return (dX_new, de, dII, dIJ, dATT, G_new)

    carry0 = (
        jnp.zeros((x0.shape[0], nd), jnp.float32),  # x_depth is unused by loss
        de_next,
        jnp.zeros((e_cnt, nd), jnp.float32),
        jnp.zeros((e_cnt, nd), jnp.float32),
        jnp.zeros((e_cnt, ed), jnp.float32),
        grads0,
    )
    dX, dE0, dII, dIJ, dATT, G = jax.lax.fori_loop(0, depth, step, carry0)

    # initial-x gathers (loop-invariant in fwd) scatter back once
    dx0 = dX + _scatter_t(oh_dst, dII) + _scatter_t(oh_src, dIJ)

    dx0_ref[0] = dx0
    de0_ref[0] = dE0
    datt_ref[0] = dATT

    flat_grads = []
    for group in G:
        flat_grads.extend(group)
    flat_grads.extend(dcls_w)
    flat_grads.extend(dcls_b)
    first = pl.program_id(0) == 0
    for ref, g in zip(wgrad_refs, flat_grads):

        @pl.when(first)
        def _(ref=ref, g=g):
            ref[:] = g

        @pl.when(jnp.logical_not(first))
        def _(ref=ref, g=g):
            ref[:] = ref[:] + g


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

_VJP_CACHE = {}


def _win_spec(*tail):
    return pl.BlockSpec(
        (1, *tail), lambda i: (i, *([0] * len(tail))), memory_space=pltpu.VMEM
    )


def _g_shape(w):
    """In-kernel gradient shape for a weight: biases [1, F] are carried as
    [8, F] sublane tiles (see _bsum)."""
    return (8, w.shape[1]) if w.shape[0] == 1 else tuple(w.shape)


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in range(nd)), memory_space=pltpu.VMEM
    )


def _get_vjp(meta_key, meta, depth, with_attention, logits, interpret):
    key = (meta_key, depth, with_attention, logits, interpret)
    if key in _VJP_CACHE:
        return _VJP_CACHE[key]

    @jax.custom_vjp
    def mp_scores(x0, e0, att, oh_src, oh_dst, flat):
        out, _, _ = _fwd(x0, e0, att, oh_src, oh_dst, flat)
        return out

    def _fwd(x0, e0, att, oh_src, oh_dst, flat):
        b, n, nd = x0.shape
        e_cnt, ed = e0.shape[1], e0.shape[2]
        kernel = functools.partial(
            _train_fwd_kernel, meta, depth, with_attention, logits
        )
        scores, xs, es = pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[
                _win_spec(n, nd),
                _win_spec(e_cnt, ed),
                _win_spec(e_cnt, ed),
                _win_spec(e_cnt, n),
                _win_spec(e_cnt, n),
                *[_const_spec(w.shape) for w in flat],
            ],
            out_specs=[
                _win_spec(8, e_cnt),
                _win_spec(depth, n, nd),
                _win_spec(depth + 1, e_cnt, ed),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, 8, e_cnt), jnp.float32),
                jax.ShapeDtypeStruct((b, depth, n, nd), jnp.float32),
                jax.ShapeDtypeStruct((b, depth + 1, e_cnt, ed), jnp.float32),
            ],
            interpret=interpret,
        )(x0, e0, att, oh_src, oh_dst, *flat)
        return scores[:, 0, :], xs, es

    def fwd_rule(x0, e0, att, oh_src, oh_dst, flat):
        out, xs, es = _fwd(x0, e0, att, oh_src, oh_dst, flat)
        return out, (xs, es, att, oh_src, oh_dst, flat)

    def bwd_rule(res, ds):
        xs, es, att, oh_src, oh_dst, flat = res
        b, _, n, nd = xs.shape
        e_cnt, ed = es.shape[2], es.shape[3]
        meta2 = dict(meta)
        meta2["_n_flat"] = len(flat)
        kernel = functools.partial(
            _train_bwd_kernel, meta2, depth, with_attention, logits
        )
        ds8 = jnp.broadcast_to(ds[:, None, :], (b, 8, e_cnt))
        outs = pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[
                _win_spec(8, e_cnt),
                _win_spec(xs.shape[1], n, nd),
                _win_spec(es.shape[1], e_cnt, ed),
                _win_spec(e_cnt, ed),
                _win_spec(e_cnt, n),
                _win_spec(e_cnt, n),
                *[_const_spec(w.shape) for w in flat],
            ],
            out_specs=[
                _win_spec(n, nd),
                _win_spec(e_cnt, ed),
                _win_spec(e_cnt, ed),
                *[_const_spec(_g_shape(w)) for w in flat],
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, n, nd), jnp.float32),
                jax.ShapeDtypeStruct((b, e_cnt, ed), jnp.float32),
                jax.ShapeDtypeStruct((b, e_cnt, ed), jnp.float32),
                *[jax.ShapeDtypeStruct(_g_shape(w), jnp.float32) for w in flat],
            ],
            interpret=interpret,
        )(ds8, xs, es, att, oh_src, oh_dst, *flat)
        dx0, de0, datt = outs[:3]
        # bias grads come back as [8, F] tiles (all rows identical) — slice
        dflat = tuple(
            o[0:1] if w.shape[0] == 1 else o for o, w in zip(outs[3:], flat)
        )
        if not with_attention:
            datt = jnp.zeros_like(datt)
        # one-hot tiles are index data: zero cotangents (DCE'd by XLA)
        return (dx0, de0, datt, jnp.zeros_like(oh_src),
                jnp.zeros_like(oh_dst), dflat)

    mp_scores.defvjp(fwd_rule, bwd_rule)
    _VJP_CACHE[key] = mp_scores
    return mp_scores


def fused_training_scores(
    model, variables_extra: dict, params: dict, batch,
    encodings: Optional[Tuple] = None, interpret: bool = False
) -> jax.Array:
    """Differentiable fused scores [B, E] for the GNN trainer.

    ``params`` must be the pytree being differentiated (weight extraction
    happens inside so cotangents land in the right leaves);
    ``variables_extra`` holds the non-param collections (batch_stats).
    ``encodings=(x_img, pn, rn, lp, rp)`` for the multimodal model (from
    EncodedGraphBatcher or the in-graph frozen encoders); None for PoseGNN.
    """
    assert getattr(model, "knn_conv_mode", "noop") == "noop", (
        "fused training: knn_conv_mode must be 'noop'"
    )
    variables = {"params": params, **variables_extra}
    is_pose = type(model).__name__ == "PoseGNN"
    if is_pose:
        x0, e0 = jax.vmap(
            lambda g: model.apply(variables, g, method=model.pre_message_passing)
        )(batch)
        att = jnp.zeros_like(e0)
        with_attention = False
        logits = True
    else:
        if encodings is None:
            def enc(g):
                xi, pn, rn = model.apply(
                    variables, g.img, g.lidar, g.radar, method=model.encode_frozen
                )
                lp = g.lidar.sum(axis=(1, 2)) != 0
                rp = g.radar.sum(axis=(1, 2)) != 0
                return xi, pn, rn, lp, rp

            encodings = jax.vmap(enc)(batch)
        x0, e0, att, _ = jax.vmap(
            lambda g, a, b_, c, d, e_: model.apply(
                variables, g, a, b_, c, d, e_, method=model.pre_message_passing
            )
        )(batch, *encodings)
        with_attention = True
        logits = False

    flat, meta = extract_mp_params(
        params, with_attention, model.node_dim, model.edge_dim
    )
    _assert_production_shape(meta)

    b, n, _ = x0.shape
    e_cnt = batch.edge_src.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, e_cnt, n), 2)
    emask = batch.edge_mask[..., None]
    oh_src = ((iota == batch.edge_src[..., None]) & emask).astype(jnp.float32)
    oh_dst = ((iota == batch.edge_dst[..., None]) & emask).astype(jnp.float32)

    meta_key = tuple(sorted(meta.items()))
    fn = _get_vjp(meta_key, meta, model.depth, with_attention, logits, interpret)
    # pose emits LOGITS, mm emits sigmoid scores — same contract as the
    # models' __call__ (the trainer's masked_bce handles from_logits)
    return fn(x0, e0, att, oh_src, oh_dst, flat)