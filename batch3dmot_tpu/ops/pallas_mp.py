"""Fused causal message-passing stack as ONE Pallas TPU kernel.

The mm tracker forward spends its device time in the depth-6 message-passing
loop (reference hot loop ``clr_att_gnn.py:178-186,288-300``): per layer an
edge-update MLP, two message MLPs, two segment-sums and a node-combine MLP.
The XLA lowering materializes every intermediate between ops; at the small
per-window shapes this pipeline runs ((N, E) = (64, 512) buckets) that
overhead holds it to ~75% of the f32 matmul roofline.

This kernel runs the ENTIRE loop for one window per grid step with x
[N, node_dim], edge_attr [E, edge_dim] and the one-hot gather/scatter tiles
resident in VMEM across all 6 layers, plus the edge classifier — the
roadmap item from round 1 (VERDICT.md #6).

Design notes (TPU-first, not a translation — full writeup docs/KERNELS.md):
  * gathers/scatters are one-hot matmuls: x_j = oh_src @ x (MXU), scatter =
    oh^T contraction — no dynamic indexing inside the kernel;
  * the one-hot tiles are GENERATED in-kernel from [E, 1] index columns
    (broadcasted-iota compare; masked edges carry -1 -> all-zero rows, so
    padding contributes exactly zero to every aggregation and numerics
    match the masked XLA path up to f32 reassociation);
  * every concat-then-matmul is rewritten as a sum of row-split matmuls
    (x_i @ W[:96] + x_j @ W[96:192] + ...) — concat-free, pure MXU;
  * two variants: single-shot (whole loop resident) and edge-tiled for the
    big trainval buckets (see _tiles_for); training has its own fwd+bwd
    kernels in ops/pallas_mp_train.py.

Weight layout contract with :class:`models.gnn.CausalMessagePassing` /
``MultimodalGNN``/``PoseGNN`` (concat orders define the row splits):
  edge_update in  = [x_i, x_j, edge_attr, att_edge_attr?]
  future_msgs in  = [x_i, updated_edge, initial_x_i]
  past_msgs  in   = [x_j, updated_edge, initial_x_j]
  combine    in   = [agg_past, agg_future]
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# VMEM ceiling for one window's working set in the single-shot kernel.
# Measured on hardware: the (128, 1024) bucket compiles and wins; (256,
# 2048) OOMs scoped VMEM at 17.3 MB (> the 16 MB/core limit — one-hot tiles
# + live inputs + Mosaic's double buffering).
_FUSED_MAX_EDGE_NODE_PRODUCT = 1024 * 128

# Beyond it, the EDGE-TILED kernel variant processes each layer's edges in
# chunks: only one chunk's MLP intermediates are live at a time, the
# evolving edge attrs sit in a VMEM scratch ref, and TRANSPOSED one-hot
# gather/scatter tiles are GENERATED IN-KERNEL from the [1, E] src/dst
# index ROWS (broadcasted-iota compare) — no [E, N] one-hot ever exists in
# HBM or VMEM. The binding constraints are the full-E edge-attr buffers
# (input blocks x Mosaic double buffering + the scratch) and the node-side
# state, hence the caps below; above them, callers fall back to XLA (~75%
# of roofline at such sizes, docs/RESULTS.md).
#
# The caps are hardware-set, in two regimes. Up to edge*node <= 512k the
# round-2 per-tile formula is validated at every grid length. Round 3's
# [1, E] index-row switch (an [E, 1] s32 column tiles to E x 128 physical
# lanes — 2 MB double-buffered per input at E=4096, the term that made
# near-limit buckets grid-length-fragile) opened the bigger buckets:
# (256, 4096) at 16 tiles now wins 2.77x / 2.32x vs XLA at 8- / 40-window
# grids (scripts/probe_tiled_big.py; previously 256.5K over at 40), and
# (512, 8192) fits at SHORT (<= 8-window) grids (1.71x at 16 tiles) but
# still fails the compiler at 40-window grids — Mosaic pipelines deeper on
# longer grids — so 4M-product buckets are gated on the caller's grid
# length. Beyond THAT, the HBM-STAGED variant (_mp_kernel_tiled_hbm,
# round 3) covers (512, 8192) at ANY grid: 2.10x XLA at 40 windows
# (22.25 vs 46.67 ms), max|err| in the known hardware band. Only
# >4M-product shapes fall back to XLA now.
_TILED_MAX_EDGES = 8192
_TILED_MAX_NODES = 512
_TILED_MAX_PRODUCT = 2048 * 256  # per-tile-formula regime (grid-robust)
_TILED_MAX_PRODUCT_LONG = 4096 * 512  # validated at 40-window grids
_TILED_MAX_PRODUCT_SHORT = 8192 * 512  # validated at <= 8-window grids
_SHORT_GRID = 8


def _tiles_for(max_nodes: int, max_edges: int,
               grid: Optional[int] = None) -> Optional[int]:
    """Edge-tile count for the fused kernel at this bucket (1 = untiled),
    or None when the bucket exceeds the tiled variant's VMEM model.
    ``grid`` is the window-batch (Pallas grid) length when the caller
    knows it; near-limit buckets are grid-length-sensitive and unknown
    grids are treated as long."""
    product = max_edges * max_nodes
    if product <= _FUSED_MAX_EDGE_NODE_PRODUCT:
        return 1
    if max_edges > _TILED_MAX_EDGES or max_nodes > _TILED_MAX_NODES:
        return None
    if product > _TILED_MAX_PRODUCT:
        # extended (row-layout) regime: fixed hardware-picked tile sizes
        short = grid is not None and grid <= _SHORT_GRID
        cap = _TILED_MAX_PRODUCT_SHORT if short else _TILED_MAX_PRODUCT_LONG
        if product > cap:
            return None
        return max_edges // (256 if max_edges <= 4096 else 512)
    # 4096-edge buckets need a smaller tile target: the full-E edge-attr
    # buffers leave less VMEM headroom for per-tile intermediates
    per_tile = _FUSED_MAX_EDGE_NODE_PRODUCT // (2 if max_edges >= 4096 else 1)
    tiles = -(-product // per_tile)
    while max_edges % tiles:
        tiles += 1
    return tiles if (max_edges // tiles) % 8 == 0 else None


def _hbm_tiles_for(max_nodes: int, max_edges: int) -> Optional[int]:
    """Tile count for the HBM-STAGED tiled kernel — the coverage extension
    past the VMEM-resident tiled variant's grid-sensitive caps (round 3).
    The evolving edge state, e0 and att all ride in HBM in the transposed
    [ed, E] layout (the tiled TRAINING kernels' design,
    ops/pallas_mp_train.py) and are DMA'd per 512-edge tile through
    double-buffered scratches, so the VMEM model is tile-bound and
    grid-length-ROBUST: (512, 8192) compiles and wins at 40-window grids
    where the VMEM-resident variant fails the compiler. Only used where
    the VMEM-resident variant (faster when it fits — no DMA round trips)
    is unavailable."""
    if max_edges > _TILED_MAX_EDGES or max_nodes > _TILED_MAX_NODES:
        return None
    if max_edges * max_nodes > _TILED_MAX_PRODUCT_SHORT:
        return None
    tiles = max_edges // 512
    if tiles < 2 or max_edges % tiles or (max_edges // tiles) % 128:
        return None
    return tiles


def fused_supported(max_nodes: int, max_edges: int,
                    grid: Optional[int] = None,
                    vmapped: bool = False) -> bool:
    """Whether a fused MP kernel (single-shot, edge-tiled or HBM-staged)
    fits at this bucket; pass the window-batch length as ``grid`` when
    known (near-limit VMEM-resident buckets are grid-length-sensitive;
    the HBM-staged variant covers the rest up to (512, 8192)). Callers
    that ``jax.vmap`` the scoring program (the grouped scene dispatch)
    must pass ``vmapped=True``: Pallas cannot batch ANY-memory-space
    operands, so the HBM-staged variant is unavailable there and only
    the VMEM-resident coverage counts."""
    if _tiles_for(max_nodes, max_edges, grid) is not None:
        return True
    return (not vmapped) and _hbm_tiles_for(max_nodes, max_edges) is not None


def _split_rows(w, sizes):
    out = []
    lo = 0
    for s in sizes:
        out.append(w[lo : lo + s])
        lo += s
    return tuple(out)


def extract_mp_params(params: dict, with_attention: bool, node_dim: int,
                      edge_dim: int) -> Tuple:
    """Flatten the CausalMessagePassing + edge-classifier flax params into
    the kernel's weight tuple (f32 numpy-backed jax arrays)."""
    mp = params["message_passing"]

    def chain(mod):
        ws, bs = [], []
        i = 0
        while f"dense_{i}" in mod:
            ws.append(mod[f"dense_{i}"]["kernel"])
            bs.append(mod[f"dense_{i}"]["bias"][None, :])
            i += 1
        return ws, bs

    eu_w, eu_b = chain(mp["edge_update"])
    fut_w, fut_b = chain(mp["future_msgs"])
    past_w, past_b = chain(mp["past_msgs"])
    comb_w, comb_b = chain(mp["combine"])
    cls_w, cls_b = chain(params["edge_classifier"])

    # row-split the concat-consuming first layers
    eu_sizes = [node_dim, node_dim, edge_dim] + ([edge_dim] if with_attention else [])
    eu0 = _split_rows(eu_w[0], eu_sizes)
    msg_sizes = [node_dim, edge_dim, node_dim]
    fut0 = _split_rows(fut_w[0], msg_sizes)
    past0 = _split_rows(past_w[0], msg_sizes)
    m = comb_w[0].shape[0] // 2
    comb0 = _split_rows(comb_w[0], [m, m])

    flat = (
        *eu0, *eu_w[1:], *eu_b,
        *fut0, *fut_w[1:], *fut_b,
        *past0, *past_w[1:], *past_b,
        *comb0, *comb_w[1:], *comb_b,
        *cls_w, *cls_b,
    )
    meta = dict(
        n_eu0=len(eu0), n_eu=len(eu_w) - 1, n_eub=len(eu_b),
        n_fut=len(fut_w) - 1, n_futb=len(fut_b),
        n_past=len(past_w) - 1, n_pastb=len(past_b),
        n_comb=len(comb_w) - 1, n_combb=len(comb_b),
        n_cls=len(cls_w), n_clsb=len(cls_b),
    )
    return flat, meta


def _unpack(meta, ws):
    it = iter(ws)
    take = lambda k: tuple(next(it) for _ in range(k))
    eu0 = take(meta["n_eu0"])
    eu_rest = take(meta["n_eu"])
    eu_b = take(meta["n_eub"])
    fut0 = take(3)
    fut_rest = take(meta["n_fut"])
    fut_b = take(meta["n_futb"])
    past0 = take(3)
    past_rest = take(meta["n_past"])
    past_b = take(meta["n_pastb"])
    comb0 = take(2)
    comb_rest = take(meta["n_comb"])
    comb_b = take(meta["n_combb"])
    cls_w = take(meta["n_cls"])
    cls_b = take(meta["n_clsb"])
    return (eu0, eu_rest, eu_b, fut0, fut_rest, fut_b, past0, past_rest,
            past_b, comb0, comb_rest, comb_b, cls_w, cls_b)


def _mp_kernel(meta, depth, with_attention, x0_ref, e0_ref, att_ref,
               src_ref, dst_ref, *rest):
    # pallas passes refs as (*inputs, *outputs): weights then the out ref
    w_refs, out_ref = rest[:-1], rest[-1]
    (eu0, eu_rest, eu_b, fut0, fut_rest, fut_b, past0, past_rest, past_b,
     comb0, comb_rest, comb_b, cls_w, cls_b) = _unpack(
        meta, tuple(r[:] for r in w_refs)
    )
    x0 = x0_ref[0]
    e = e0_ref[0]
    att = att_ref[0] if with_attention else None
    # one-hot gather/scatter tiles generated from the [E, 1] index columns
    # (masked edges carry -1 -> all-zero rows); generating in-kernel beats
    # shipping [E, N] f32 tiles from HBM — no host build, no transfer, no
    # double-buffered input residency
    n = x0.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (src_ref.shape[1], n), 1)
    oh_src = (iota == src_ref[0]).astype(jnp.float32)
    oh_dst = (iota == dst_ref[0]).astype(jnp.float32)

    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)

    # initial_x gathers are loop-invariant: hoisted out of the 6 layers
    init_j = dot(oh_src, x0)
    init_i = dot(oh_dst, x0)
    init_j_fut = dot(init_i, fut0[2])  # future uses init_i
    init_j_past = dot(init_j, past0[2])

    def layer(_, carry):
        x, e = carry
        x_j = dot(oh_src, x)
        x_i = dot(oh_dst, x)

        # edge update MLP, first layer concat-free
        h = dot(x_i, eu0[0]) + dot(x_j, eu0[1]) + dot(e, eu0[2])
        if with_attention:
            h = h + dot(att, eu0[3])
        h = jnp.maximum(h + eu_b[0], 0.0)
        for w, b in zip(eu_rest, eu_b[1:]):
            h = dot(h, w) + b
            if w is not eu_rest[-1]:
                h = jnp.maximum(h, 0.0)
        ue = h

        f = jnp.maximum(dot(x_i, fut0[0]) + dot(ue, fut0[1]) + init_j_fut + fut_b[0], 0.0)
        for w, b in zip(fut_rest, fut_b[1:]):
            f = dot(f, w) + b
            if w is not fut_rest[-1]:
                f = jnp.maximum(f, 0.0)

        p = jnp.maximum(dot(x_j, past0[0]) + dot(ue, past0[1]) + init_j_past + past_b[0], 0.0)
        for w, b in zip(past_rest, past_b[1:]):
            p = dot(p, w) + b
            if w is not past_rest[-1]:
                p = jnp.maximum(p, 0.0)

        # scatter-adds: contract the edge dimension of the one-hot tiles
        agg_p = jax.lax.dot_general(
            oh_dst, p, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        agg_f = jax.lax.dot_general(
            oh_src, f, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        c = jnp.maximum(dot(agg_p, comb0[0]) + dot(agg_f, comb0[1]) + comb_b[0], 0.0)
        for w, b in zip(comb_rest, comb_b[1:]):
            c = dot(c, w) + b
            if w is not comb_rest[-1]:
                c = jnp.maximum(c, 0.0)
        return c, ue

    x, e = jax.lax.fori_loop(0, depth, layer, (x0, e))

    h = e
    for i, (w, b) in enumerate(zip(cls_w, cls_b)):
        h = dot(h, w) + b
        if i < len(cls_w) - 1:
            h = jnp.maximum(h, 0.0)
    # out block is [1, 8, E] (sublane dim must be divisible by 8); the
    # caller slices row 0
    out_ref[0] = jnp.broadcast_to(h[:, 0][None, :], (8, h.shape[0]))


def _mp_kernel_tiled(meta, depth, with_attention, n_tiles, x0_ref, e0_ref,
                     att_ref, src_ref, dst_ref, *rest):
    """Edge-tiled variant: per layer, edges are processed in ``n_tiles``
    chunks so only one chunk's MLP intermediates are live in VMEM at a
    time. TRANSPOSED [N, tsz] one-hot gather/scatter tiles are GENERATED
    per chunk from the [1, E] src/dst index ROWS (masked edges carry index
    -1, so a broadcasted-iota compare yields all-zero columns). Rows, not
    columns: an [E, 1] s32 column tiles to (8, 128) lanes — E x 128
    physical elements, double-buffered as a blocked input (8 MB for the
    src/dst pair at E=4096 — the term that made near-limit buckets
    grid-length-fragile); the [1, E] row costs E x 8. The transposed
    orientation makes scatters plain ``oh @ msgs`` matmuls and gathers
    contract-dim-0 matmuls — both MXU shapes, no in-kernel transpose.
    The evolving edge attrs live in a VMEM scratch ref sliced with
    dynamic starts (Mosaic lowers dynamic-start REF loads/stores but not
    value-level dynamic_slice); the loop-invariant initial-x projections
    are recomputed per tile (cheaper than holding [E, msg_dim] buffers
    live). In-place per-tile update of the edge scratch is safe: a tile's
    new rows are read only by the next layer."""
    w_refs, out_ref, e_scr = rest[:-2], rest[-2], rest[-1]
    (eu0, eu_rest, eu_b, fut0, fut_rest, fut_b, past0, past_rest, past_b,
     comb0, comb_rest, comb_b, cls_w, cls_b) = _unpack(
        meta, tuple(r[:] for r in w_refs)
    )
    x0 = x0_ref[0]
    n = x0.shape[0]
    e_total = src_ref.shape[-1]
    tsz = e_total // n_tiles
    e_scr[...] = e0_ref[0]

    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    tdot = lambda a, b_: jax.lax.dot_general(
        a, b_, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    def layer(_, x):
        def tile(t, acc):
            agg_p, agg_f = acc
            lo = t * tsz
            iota = jax.lax.broadcasted_iota(jnp.int32, (n, tsz), 0)
            oh_s = (iota == src_ref[0, 0:1, pl.ds(lo, tsz)]).astype(jnp.float32)
            oh_d = (iota == dst_ref[0, 0:1, pl.ds(lo, tsz)]).astype(jnp.float32)
            e_t = e_scr[pl.ds(lo, tsz)]
            x_j = tdot(oh_s, x)
            x_i = tdot(oh_d, x)
            init_j = tdot(oh_s, x0)
            init_i = tdot(oh_d, x0)

            h = dot(x_i, eu0[0]) + dot(x_j, eu0[1]) + dot(e_t, eu0[2])
            if with_attention:
                h = h + dot(att_ref[0, pl.ds(lo, tsz)], eu0[3])
            h = jnp.maximum(h + eu_b[0], 0.0)
            for w, b in zip(eu_rest, eu_b[1:]):
                h = dot(h, w) + b
                if w is not eu_rest[-1]:
                    h = jnp.maximum(h, 0.0)
            ue = h

            f = jnp.maximum(
                dot(x_i, fut0[0]) + dot(ue, fut0[1]) + dot(init_i, fut0[2])
                + fut_b[0], 0.0,
            )
            for w, b in zip(fut_rest, fut_b[1:]):
                f = dot(f, w) + b
                if w is not fut_rest[-1]:
                    f = jnp.maximum(f, 0.0)

            p = jnp.maximum(
                dot(x_j, past0[0]) + dot(ue, past0[1]) + dot(init_j, past0[2])
                + past_b[0], 0.0,
            )
            for w, b in zip(past_rest, past_b[1:]):
                p = dot(p, w) + b
                if w is not past_rest[-1]:
                    p = jnp.maximum(p, 0.0)

            e_scr[pl.ds(lo, tsz)] = ue
            # transposed tiles: scatters are plain oh @ msgs matmuls
            return agg_p + dot(oh_d, p), agg_f + dot(oh_s, f)

        msg_dim = comb0[0].shape[0]
        agg_p, agg_f = jax.lax.fori_loop(
            0, n_tiles, tile,
            (
                jnp.zeros((x.shape[0], msg_dim), jnp.float32),
                jnp.zeros((x.shape[0], msg_dim), jnp.float32),
            ),
        )
        c = jnp.maximum(dot(agg_p, comb0[0]) + dot(agg_f, comb0[1]) + comb_b[0], 0.0)
        for w, b in zip(comb_rest, comb_b[1:]):
            c = dot(c, w) + b
            if w is not comb_rest[-1]:
                c = jnp.maximum(c, 0.0)
        return c

    jax.lax.fori_loop(0, depth, layer, x0)

    h = e_scr[...]
    for i, (w, b) in enumerate(zip(cls_w, cls_b)):
        h = dot(h, w) + b
        if i < len(cls_w) - 1:
            h = jnp.maximum(h, 0.0)
    out_ref[0] = jnp.broadcast_to(h[:, 0][None, :], (8, h.shape[0]))


def _select_variant(n, e, grid, force_tiles=None, force_variant=None):
    """(n_tiles, variant) for the fused kernel dispatch: the VMEM-resident
    variants wherever their grid-sensitive model fits, the HBM-staged
    kernel beyond (must mirror ``fused_supported``). ``force_variant``:
    'hbm' forces the HBM-staged kernel; 'vmem' forbids it (required under
    ``jax.vmap`` — Pallas cannot batch ANY-memory-space operands)."""
    if force_variant == "hbm":
        tiles = force_tiles if force_tiles is not None else _hbm_tiles_for(n, e)
        return tiles, "hbm"
    tiles = force_tiles if force_tiles is not None else _tiles_for(n, e, grid)
    if tiles is None and force_tiles is None and force_variant != "vmem":
        return _hbm_tiles_for(n, e), "hbm"
    return tiles, "vmem"


def _mp_kernel_tiled_hbm(meta, depth, with_attention, n_tiles, x0_ref,
                         e0_hbm, att_hbm, src_ref, dst_ref, *rest):
    """HBM-staged tiled variant (see ``_hbm_tiles_for``): nothing full-E
    touches VMEM. The evolving edge state lives in the ``ework`` HBM
    buffer (an extra discarded output) in the TRANSPOSED [ed, E] layout —
    the 128-aligned tile slice rides the trailing edge dim — seeded from
    e0T by one slab DMA and updated in place per tile (safe: a tile's new
    rows are read only by the next layer, and the layer-end drains order
    the stores before them). Tile DMAs are double-buffered through 2-slot
    scratches exactly like the tiled training kernels; the ue-producing
    edge-update layer and its bias arrive pre-transposed ([ed, h2] /
    [ed, 1]) so ueT lands store-ready without any in-kernel transpose."""
    w_refs = rest[:-6]
    out_ref, ework, e_tile, ue_tile, att_tile, sem = rest[-6:]
    (eu0, eu_rest, eu_b, fut0, fut_rest, fut_b, past0, past_rest, past_b,
     comb0, comb_rest, comb_b, cls_w, cls_b) = _unpack(
        meta, tuple(r[:] for r in w_refs)
    )
    b = pl.program_id(0)
    x0 = x0_ref[0]
    n = x0.shape[0]
    e_total = src_ref.shape[-1]
    tsz = e_total // n_tiles
    msg_dim = comb0[0].shape[0]

    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    tdot = lambda a, b_: jax.lax.dot_general(
        a, b_, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    rdot = lambda a, b_: jax.lax.dot_general(
        a, b_, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    dma_seed = pltpu.make_async_copy(e0_hbm.at[b], ework.at[b], sem.at[6])
    dma_seed.start()
    dma_seed.wait()

    def e_dma(tt, slot):
        return pltpu.make_async_copy(
            ework.at[b, :, pl.ds(tt * tsz, tsz)], e_tile.at[slot],
            sem.at[slot],
        )

    def ue_dma(tt, slot):
        return pltpu.make_async_copy(
            ue_tile.at[slot], ework.at[b, :, pl.ds(tt * tsz, tsz)],
            sem.at[2 + slot],
        )

    def att_dma(tt, slot):
        return pltpu.make_async_copy(
            att_hbm.at[b, :, pl.ds(tt * tsz, tsz)], att_tile.at[slot],
            sem.at[4 + slot],
        )

    def layer(_, x):
        e_dma(0, 0).start()
        if with_attention:
            att_dma(0, 0).start()

        def tile(tt, acc):
            agg_p, agg_f = acc
            cur = jax.lax.rem(tt, 2)
            nxt = jax.lax.rem(tt + 1, 2)
            lo = tt * tsz
            iota = jax.lax.broadcasted_iota(jnp.int32, (n, tsz), 0)
            oh_s = (iota == src_ref[0, 0:1, pl.ds(lo, tsz)]).astype(jnp.float32)
            oh_d = (iota == dst_ref[0, 0:1, pl.ds(lo, tsz)]).astype(jnp.float32)
            e_dma(tt, cur).wait()
            if with_attention:
                att_dma(tt, cur).wait()

            @pl.when(tt + 1 < n_tiles)
            def _():
                e_dma(tt + 1, nxt).start()
                if with_attention:
                    att_dma(tt + 1, nxt).start()

            x_j = tdot(oh_s, x)
            x_i = tdot(oh_d, x)
            init_j = tdot(oh_s, x0)
            init_i = tdot(oh_d, x0)
            h = dot(x_i, eu0[0]) + dot(x_j, eu0[1]) + tdot(e_tile[cur], eu0[2])
            if with_attention:
                h = h + tdot(att_tile[cur], eu0[3])
            h = jnp.maximum(h + eu_b[0], 0.0)
            for w, bi in zip(eu_rest[:-1], eu_b[1:-1]):
                h = jnp.maximum(dot(h, w) + bi, 0.0)
            # eu_rest[-1] / eu_b[-1] staged transposed: ueT is store-ready
            ueT = rdot(eu_rest[-1], h) + eu_b[-1]

            f = jnp.maximum(
                dot(x_i, fut0[0]) + tdot(ueT, fut0[1]) + dot(init_i, fut0[2])
                + fut_b[0], 0.0,
            )
            for w, bi in zip(fut_rest, fut_b[1:]):
                f = dot(f, w) + bi
                if w is not fut_rest[-1]:
                    f = jnp.maximum(f, 0.0)

            p = jnp.maximum(
                dot(x_j, past0[0]) + tdot(ueT, past0[1]) + dot(init_j, past0[2])
                + past_b[0], 0.0,
            )
            for w, bi in zip(past_rest, past_b[1:]):
                p = dot(p, w) + bi
                if w is not past_rest[-1]:
                    p = jnp.maximum(p, 0.0)

            @pl.when(tt >= 2)
            def _():
                ue_dma(tt - 2, cur).wait()

            ue_tile[cur] = ueT
            ue_dma(tt, cur).start()
            return agg_p + dot(oh_d, p), agg_f + dot(oh_s, f)

        agg_p, agg_f = jax.lax.fori_loop(
            0, n_tiles, tile,
            (jnp.zeros((n, msg_dim), jnp.float32),
             jnp.zeros((n, msg_dim), jnp.float32)),
        )
        ue_dma(n_tiles - 2, (n_tiles - 2) % 2).wait()
        ue_dma(n_tiles - 1, (n_tiles - 1) % 2).wait()
        c = jnp.maximum(dot(agg_p, comb0[0]) + dot(agg_f, comb0[1]) + comb_b[0], 0.0)
        for w, bi in zip(comb_rest, comb_b[1:]):
            c = dot(c, w) + bi
            if w is not comb_rest[-1]:
                c = jnp.maximum(c, 0.0)
        return c

    jax.lax.fori_loop(0, depth, layer, x0)

    # classifier per edge tile (transposed first layer)
    e_dma(0, 0).start()

    def cls_tile(tt, _):
        cur = jax.lax.rem(tt, 2)
        nxt = jax.lax.rem(tt + 1, 2)
        lo = tt * tsz
        e_dma(tt, cur).wait()

        @pl.when(tt + 1 < n_tiles)
        def _():
            e_dma(tt + 1, nxt).start()

        h = tdot(e_tile[cur], cls_w[0]) + cls_b[0]
        if len(cls_w) > 1:
            h = jnp.maximum(h, 0.0)
        for i in range(1, len(cls_w)):
            h = dot(h, cls_w[i]) + cls_b[i]
            if i < len(cls_w) - 1:
                h = jnp.maximum(h, 0.0)
        out_ref[0, :, pl.ds(lo, tsz)] = jnp.broadcast_to(
            h[:, 0][None, :], (8, tsz)
        )
        return 0

    jax.lax.fori_loop(0, n_tiles, cls_tile, 0)


def fused_mp_scores(
    x0: jax.Array,  # [B, N, node_dim] encoded nodes
    e0: jax.Array,  # [B, E, edge_dim] encoded edge attrs
    att: Optional[jax.Array],  # [B, E, edge_dim] or None
    src: jax.Array,  # [B, E] int32
    dst: jax.Array,  # [B, E]
    edge_mask: jax.Array,  # [B, E] bool
    flat_weights: Tuple,
    meta: dict,
    depth: int,
    logits: bool = False,
    interpret: bool = False,
    force_tiles: Optional[int] = None,
    force_variant: Optional[str] = None,
    grid: Optional[int] = None,
) -> jax.Array:
    """Scores [B, E] from the fused kernel (sigmoid unless ``logits``).

    ``interpret=True`` runs the Pallas interpreter (CPU tests);
    ``force_tiles`` overrides the VMEM-model tile choice (tests)."""
    b, n, _ = x0.shape
    e = src.shape[1]
    # near-limit VMEM-resident buckets are grid-length-sensitive; callers
    # whose EFFECTIVE Pallas grid exceeds the local batch dim (the grouped
    # scene dispatch vmaps S scenes over this fn -> S x b grid) must pass
    # it, or the variant choice here could disagree with their
    # fused_supported guard and compile the VMEM variant on a long grid
    n_tiles, variant = _select_variant(
        n, e, b if grid is None else grid, force_tiles, force_variant
    )
    assert n_tiles is not None and e % n_tiles == 0, (n, e, n_tiles)
    with_attention = att is not None
    att_in = att if with_attention else jnp.zeros_like(e0)

    # masked edges forced to -1 so the in-kernel iota compare produces
    # all-zero one-hot rows/columns (exact padding zero contribution, same
    # as a host-built masked one-hot)
    neg = jnp.int32(-1)
    src_m = jnp.where(edge_mask, src, neg).astype(jnp.int32)
    dst_m = jnp.where(edge_mask, dst, neg).astype(jnp.int32)

    win_spec = lambda *tail: pl.BlockSpec(
        (1, *tail), lambda i: (i, *([0] * len(tail))), memory_space=pltpu.VMEM
    )
    if variant == "hbm":
        (eu0, eu_rest, eu_b, fut0, fut_rest, fut_b, past0, past_rest,
         past_b, comb0, comb_rest, comb_b, cls_w, cls_b) = _unpack(
            meta, flat_weights
        )
        flat_t = (
            *eu0, *eu_rest[:-1], eu_rest[-1].T, *eu_b[:-1], eu_b[-1].T,
            *fut0, *fut_rest, *fut_b, *past0, *past_rest, *past_b,
            *comb0, *comb_rest, *comb_b, *cls_w, *cls_b,
        )
        e0T = e0.transpose(0, 2, 1)
        # attention-free callers (pose) never issue an att DMA — a dummy
        # operand avoids materializing a full [B, ed, E] zeros buffer
        attT = (
            att_in.transpose(0, 2, 1) if with_attention
            else jnp.zeros((1, 1, 1), jnp.float32)
        )
        ed = e0T.shape[1]
        tsz = e // n_tiles
        src_row = src_m[:, None, :]
        dst_row = dst_m[:, None, :]
        kernel = functools.partial(
            _mp_kernel_tiled_hbm, meta, depth, with_attention, n_tiles
        )
        out, _ = pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[
                win_spec(n, x0.shape[2]),
                pl.BlockSpec(memory_space=pl.ANY),  # e0T: slab-DMA'd
                pl.BlockSpec(memory_space=pl.ANY),  # attT: DMA'd per tile
                win_spec(1, e),
                win_spec(1, e),
                *[
                    pl.BlockSpec(
                        w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
                    )
                    for w in flat_t
                ],
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, 8, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(memory_space=pl.ANY),  # ework: HBM edge state
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, 8, e), jnp.float32),
                jax.ShapeDtypeStruct((b, ed, e), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, ed, tsz), jnp.float32),
                pltpu.VMEM((2, ed, tsz), jnp.float32),
                pltpu.VMEM((2, ed, tsz), jnp.float32),
                pltpu.SemaphoreType.DMA((7,)),
            ],
            interpret=interpret,
        )(x0, e0T, attT, src_row, dst_row, *flat_t)
        out = out[:, 0, :]
        return out if logits else jax.nn.sigmoid(out)
    if n_tiles == 1:
        kernel = functools.partial(_mp_kernel, meta, depth, with_attention)
        scratch_shapes = []
    else:
        kernel = functools.partial(
            _mp_kernel_tiled, meta, depth, with_attention, n_tiles
        )
        scratch_shapes = [pltpu.VMEM((e, e0.shape[2]), jnp.float32)]
    # The single-shot kernel takes [E, 1] index COLUMNS; the tiled kernel
    # takes [1, E] ROWS (an [E, 1] s32 column tiles to E x 128 physical
    # lanes — 2 MB double-buffered per input at E=4096, the blow-up that
    # capped tiled coverage).
    if n_tiles == 1:
        gather_ins = (src_m[..., None], dst_m[..., None])
        gather_specs = [win_spec(e, 1), win_spec(e, 1)]
    else:
        gather_ins = (src_m[:, None, :], dst_m[:, None, :])
        gather_specs = [win_spec(1, e), win_spec(1, e)]
    w_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in flat_weights
    ]
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            win_spec(n, x0.shape[2]),
            win_spec(e, e0.shape[2]),
            win_spec(e, e0.shape[2]),
            *gather_specs,
            *w_specs,
        ],
        out_specs=pl.BlockSpec(
            (1, 8, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, 8, e), jnp.float32),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(x0, e0, att_in, *gather_ins, *flat_weights)
    out = out[:, 0, :]
    return out if logits else jax.nn.sigmoid(out)


def fused_scores_from_encodings(
    model, variables, batch, x_img, pn, rn, lp, rp, interpret: bool = False,
    force_tiles: Optional[int] = None, force_variant: Optional[str] = None,
    grid: Optional[int] = None,
) -> jax.Array:
    """Drop-in fused-kernel replacement for the batched
    ``forward_from_encodings`` score path: flax modules compute the pre-MP
    stage, the Pallas kernel runs the loop + classifier. Inference only
    (knn_conv must be in the reference 'noop' mode — the kernel has no
    between-layer conv)."""
    assert model.knn_conv_mode == "noop", "fused MP kernel: knn_conv_mode must be 'noop'"

    def pre(g, a, b_, c, d, e_):
        return model.apply(
            variables, g, a, b_, c, d, e_, method=model.pre_message_passing
        )

    x0, e0, att, _ = jax.vmap(pre)(batch, x_img, pn, rn, lp, rp)
    # MultimodalGNN's message passing ALWAYS consumes att_edge_attr — the
    # use_attention flag only changes how it is computed (gnn.py:236-265)
    flat, meta = extract_mp_params(
        dict(variables)["params"], True, model.node_dim, model.edge_dim
    )
    return fused_mp_scores(
        x0, e0, att,
        batch.edge_src, batch.edge_dst, batch.edge_mask,
        flat, meta, model.depth, interpret=interpret, force_tiles=force_tiles,
        force_variant=force_variant, grid=grid,
    )


def fused_scores_full(model, variables, batch, interpret: bool = False) -> jax.Array:
    """Fused-kernel replacement for the batched full ``__call__`` score
    path of MultimodalGNN: frozen encoders run per window, then the kernel
    (the `windows` pipeline's per-window re-encoding behavior, accelerated)."""

    def enc(g):
        xi, pn, rn = model.apply(
            variables, g.img, g.lidar, g.radar, method=model.encode_frozen
        )
        lp = g.lidar.sum(axis=(1, 2)) != 0
        rp = g.radar.sum(axis=(1, 2)) != 0
        return xi, pn, rn, lp, rp

    xi, pn, rn, lp, rp = jax.vmap(enc)(batch)
    return fused_scores_from_encodings(
        model, variables, batch, xi, pn, rn, lp, rp, interpret=interpret
    )


def fused_logits_pose(model, variables, batch, interpret: bool = False,
                      force_tiles: Optional[int] = None,
                      force_variant: Optional[str] = None) -> jax.Array:
    """Fused-kernel replacement for the batched PoseGNN forward: returns
    LOGITS [B, E] (the pose classifier has no sigmoid, gnn.py:288-291)."""
    assert model.knn_conv_mode == "noop", "fused MP kernel: knn_conv_mode must be 'noop'"

    def pre(g):
        return model.apply(variables, g, method=model.pre_message_passing)

    x0, e0 = jax.vmap(pre)(batch)
    flat, meta = extract_mp_params(
        dict(variables)["params"], False, model.node_dim, model.edge_dim
    )
    return fused_mp_scores(
        x0, e0, None,
        batch.edge_src, batch.edge_dst, batch.edge_mask,
        flat, meta, model.depth, logits=True, interpret=interpret,
        force_tiles=force_tiles, force_variant=force_variant,
    )
