"""Unified tracker-GNN trainer.

Re-designs the reference's ``Batch3DMOT`` training loop (``train.py:36-226``)
as a functional jit-compiled step over batched padded graphs:

  * optimizer: Adam with additive (torch-style) weight decay — grads get
    ``wd * p`` added *before* the Adam moments, matching
    ``torch.optim.Adam(lr, weight_decay, betas)`` (``train.py:106-109``);
  * loss: (optionally class-balanced) BCE over real edges, divided by the
    window batch size exactly as the reference divides its mean BCE by
    ``gnn.batch_size`` (``train.py:136-141``);
  * metrics: per-batch overall and per-class edge average precision,
    nanmean-aggregated per epoch (``train.py:143-155,210``);
  * checkpoints: per-epoch, AP-stamped filenames (``train.py:217-226``).

The train step is one XLA program per (batch, bucket) shape; window batches
come from :class:`batch3dmot_tpu.train.data.GraphBatcher`. Multi-chip data
parallelism shards the leading window dimension (see
``batch3dmot_tpu.parallel``).
"""

from __future__ import annotations

import time
import warnings
from collections import defaultdict
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from batch3dmot_tpu.config import GNNConfig, TRACKING_CLASSES
from batch3dmot_tpu.graph import PaddedGraph
from batch3dmot_tpu.train.data import GraphBatcher
from batch3dmot_tpu.train.metrics import (
    average_precision_multi,
    masked_bce,
)
from batch3dmot_tpu.utils.checkpoint import epoch_checkpoint_name, save_checkpoint


def torch_style_adam(
    lr: float, weight_decay: float, b1: float, b2: float
) -> optax.GradientTransformation:
    """torch.optim.Adam semantics: L2 term enters the gradient before the
    moment estimates (not decoupled AdamW)."""
    steps = [optax.scale_by_adam(b1=b1, b2=b2), optax.scale(-lr)]
    if weight_decay:
        steps.insert(0, optax.add_decayed_weights(weight_decay))
    return optax.chain(*steps)


class TrainState(struct.PyTreeNode):
    params: Any
    extra_variables: Any  # batch_stats etc. (frozen during GNN training)
    opt_state: Any
    step: jax.Array


class GNNTrainer:
    def __init__(
        self,
        model,
        example_graph: PaddedGraph,
        cfg: Optional[GNNConfig] = None,
        from_logits: Optional[bool] = None,
        seed: int = 0,
        init_variables: Optional[Dict] = None,
        shard_batch: Optional[Callable[[Any], Any]] = None,
        mesh=None,
        fused: Any = "auto",
    ):
        self.model = model
        self.cfg = cfg or GNNConfig()
        # PoseGNN emits logits (no sigmoid head); MultimodalGNN emits scores.
        if from_logits is None:
            from_logits = type(model).__name__ == "PoseGNN"
        self.from_logits = from_logits
        # With a mesh, window batches are sharded along their leading (batch)
        # dim — axis 1 for K-step-fused [K, B, ...] stacks — and the state is
        # replicated below; XLA inserts the gradient psum over ICI (the
        # reference's 4-way NCCL DDP, train_resnet_ae_ddp.py:125-290).
        self.mesh = mesh
        self.shard_stacked = None
        if mesh is not None:
            from batch3dmot_tpu.parallel import shard_batch_fn

            if shard_batch is None:
                shard_batch = shard_batch_fn(mesh)
            self.shard_stacked = shard_batch_fn(mesh, axis=1)
        self.shard_batch = shard_batch or (lambda x: x)
        # fused Pallas MP training kernels (forward + hand-written backward,
        # ops/pallas_mp_train.py), gradient-equivalence-tested against
        # autodiff on every parameter leaf (tests/test_pallas_mp_train.py).
        # Measured on the real chip at the production buckets they beat
        # XLA's autodiff ~2x (scripts/bench_train_step.py: full-path step
        # 1.18 -> 0.54 ms at (64,256)x8, 2.07 -> 1.10 ms at (64,512)x8;
        # docs/RESULTS.md), so 'auto' resolves to ON for on-device
        # single-chip training in the reference 'noop' knn-conv mode;
        # per-batch bucket support is still guarded by
        # fused_train_supported() (tighter than the inference guard — the
        # backward carries stashed activations + weight-grad blocks).
        if fused == "auto":
            fused = (
                jax.default_backend() != "cpu"
                and mesh is None
                and getattr(model, "knn_conv_mode", "") == "noop"
            )
        self.fused = bool(fused)
        self._interpret = jax.default_backend() == "cpu"

        if (
            init_variables is None
            and getattr(model, "modalities", None)
            and example_graph.img.size == 0
        ):
            raise ValueError(
                "example_graph has modality-free placeholders but the model "
                "has active modalities; init from a graph padded with "
                "include_modalities=True (the training batches themselves "
                "may be modality-free when using precomputed encodings)"
            )
        variables = init_variables or jax.jit(model.init)(
            jax.random.key(seed), example_graph
        )
        variables = dict(variables)
        params = variables.pop("params")
        tx = torch_style_adam(
            float(self.cfg.lr),
            float(self.cfg.weight_decay),
            self.cfg.beta_lo,
            self.cfg.beta_hi,
        )
        # Frozen encoders must receive NO update at all — stop_gradient only
        # zeroes their gradients; additive weight decay would still shrink
        # them. Mask the whole transform over the frozen subtrees (the
        # reference's requires_grad=False equivalent).
        frozen_roots = (
            {"resnet", "pointnet", "radarnet"}
            if getattr(model, "freeze_encoders", False)
            else set()
        )
        if frozen_roots:
            def _mask_tree(p):
                return {
                    k: jax.tree.map(lambda _: k not in frozen_roots, v)
                    for k, v in p.items()
                }
            tx = optax.masked(tx, _mask_tree)
        self.tx = tx
        self.state = TrainState(
            params=params,
            extra_variables=variables,
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )
        if mesh is not None:
            from batch3dmot_tpu.parallel import replicate

            self.state = replicate(self.state, mesh)
        self._train_step = jax.jit(self._step, donate_argnums=0)
        self._eval_step = jax.jit(self._forward_metrics)
        self._multi_step = jax.jit(self._scan_steps, donate_argnums=0)

    # ---- core steps ------------------------------------------------------

    def _apply(self, params, extra, batch):
        """batch: PaddedGraph, or (PaddedGraph, encoding-tuple) from
        EncodedGraphBatcher (precomputed frozen-encoder outputs)."""
        graph_for_guard = batch[0] if isinstance(batch, tuple) else batch
        from batch3dmot_tpu.ops.pallas_mp_train import fused_train_supported as fused_supported

        # encoded must mirror fused_training_scores' from_encodings
        # predicate exactly (pose has no encoding form) or the guard could
        # admit a bucket the dispatch then rejects
        encoded = (
            isinstance(batch, tuple)
            and type(self.model).__name__ != "PoseGNN"
        )
        if self.fused and fused_supported(
            graph_for_guard.pose.shape[1], graph_for_guard.edge_src.shape[1],
            encoded=encoded,
        ):
            from batch3dmot_tpu.ops.pallas_mp_train import fused_training_scores

            if isinstance(batch, tuple):
                graph, enc = batch
                return fused_training_scores(
                    self.model, extra, params, graph, encodings=enc,
                    interpret=self._interpret,
                )
            return fused_training_scores(
                self.model, extra, params, batch, interpret=self._interpret
            )
        variables = {"params": params, **extra}
        if isinstance(batch, tuple):
            graph, enc = batch
            scores, _ = jax.vmap(
                lambda g, xi, pn, rn, lp, rp: self.model.apply(
                    variables, g, xi, pn, rn, lp, rp,
                    method=self.model.forward_from_encodings,
                )
            )(graph, *enc)
        else:
            scores, _ = jax.vmap(lambda g: self.model.apply(variables, g))(batch)
        return scores  # [B, E]

    def _loss(self, params, extra, batch):
        scores = self._apply(params, extra, batch)
        graph = batch[0] if isinstance(batch, tuple) else batch
        weights = (
            graph.edge_weight if self.cfg.loss == "cb" else jnp.ones_like(graph.edge_weight)
        )
        bce = masked_bce(
            scores.reshape(-1),
            graph.edge_label.reshape(-1),
            graph.edge_mask.reshape(-1),
            weights.reshape(-1),
            from_logits=self.from_logits,
        )
        loss = bce / self.cfg.batch_size
        return loss, scores

    def _step(self, state: TrainState, batch: PaddedGraph):
        (loss, scores), grads = jax.value_and_grad(self._loss, has_aux=True)(
            state.params, state.extra_variables, batch
        )
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params, opt_state=opt_state, step=state.step + 1
        )
        return new_state, loss, scores

    def _forward_metrics(self, state: TrainState, batch: PaddedGraph):
        loss, scores = self._loss(state.params, state.extra_variables, batch)
        return loss, scores

    def _scan_steps(self, state: TrainState, batches):
        """K fused optimizer steps in one XLA program (batches have a
        leading K dimension). One dispatch instead of K — dispatch latency
        dominates small-model training, catastrophically so through a
        remote-TPU relay (docs/RESULTS.md)."""

        def body(st, batch):
            st, loss, scores = self._step(st, batch)
            return st, (loss, scores)

        state, (losses, scores) = jax.lax.scan(body, state, batches)
        return state, losses, scores

    # ---- epoch loops -----------------------------------------------------

    def _batch_metrics(
        self, metrics: Dict[str, List[float]], prefix: str, loss, scores, batch
    ) -> None:
        if isinstance(batch, tuple):
            batch = batch[0]
        scores = np.asarray(scores).reshape(-1)
        if self.from_logits:
            # clamp before exp: large-magnitude logits overflow f32 exp to
            # inf (harmless limit but a RuntimeWarning per batch); |x|=30
            # already saturates the f32 sigmoid
            scores = 1.0 / (1.0 + np.exp(-np.clip(scores, -30.0, 30.0)))
        labels = np.asarray(batch.edge_label).reshape(-1)
        mask = np.asarray(batch.edge_mask).reshape(-1)
        # per-edge class = class of the source node
        node_class = np.asarray(batch.node_class)
        src = np.asarray(batch.edge_src)
        edge_class = np.take_along_axis(node_class, src, axis=-1).reshape(-1)
        metrics[f"{prefix}/loss"].append(float(loss))
        metrics[f"{prefix}/avgprec"].append(
            average_precision_np(scores[mask], labels[mask])
        )
        for cname, cid in TRACKING_CLASSES.items():
            sel = mask & (edge_class == cid)
            if sel.any():
                metrics[f"{prefix}/avgprec/{cname}"].append(
                    average_precision_np(scores[sel], labels[sel])
                )

    def train_epoch(
        self, batcher: GraphBatcher, fused_steps: int = 1
    ) -> Dict[str, float]:
        """One epoch; with ``fused_steps=K`` same-shape batches are stacked
        and run as one K-step scanned program (leftovers run singly)."""
        metrics: Dict[str, List[float]] = defaultdict(list)
        if fused_steps <= 1:
            for batch in batcher.epoch(shuffle=True):
                dev = self.shard_batch(batch)
                self.state, loss, scores = self._train_step(self.state, dev)
                self._batch_metrics(metrics, "train", loss, scores, batch)
            return _nanmean_metrics(metrics)

        pending: Dict[Any, List] = defaultdict(list)
        for batch in batcher.epoch(shuffle=True):
            key = jax.tree.structure(batch), tuple(
                x.shape for x in jax.tree.leaves(batch)
            )
            pending[key].append(batch)
            if len(pending[key]) == fused_steps:
                self._run_fused(metrics, pending.pop(key))
        for group in pending.values():
            if len(group) > 1:
                self._run_fused(metrics, group)  # one smaller fused program
            else:
                batch = group[0]
                dev = self.shard_batch(batch)
                self.state, loss, scores = self._train_step(self.state, dev)
                self._batch_metrics(metrics, "train", loss, scores, batch)
        return _nanmean_metrics(metrics)

    def _run_fused(self, metrics, group) -> None:
        from batch3dmot_tpu.graph import stack_host_or_device

        stacked = jax.tree.map(stack_host_or_device, *group)
        if self.shard_stacked is not None:
            stacked = self.shard_stacked(stacked)
        self.state, losses, scores = self._multi_step(self.state, stacked)
        # ONE host fetch for the whole group, and only of the small metric
        # fields (per-step / full-graph fetches through a remote-TPU relay
        # would eat the fusion win)
        losses = np.asarray(losses)
        scores = np.asarray(scores)
        graphs = stacked[0] if isinstance(stacked, tuple) else stacked
        fields = {
            name: np.asarray(getattr(graphs, name))
            for name in ("edge_label", "edge_mask", "node_class", "edge_src")
        }
        for k in range(len(group)):
            view = _MetricsView(**{n: v[k] for n, v in fields.items()})
            self._batch_metrics(metrics, "train", losses[k], scores[k], view)


    def eval_epoch(self, batcher: GraphBatcher) -> Dict[str, float]:
        metrics: Dict[str, List[float]] = defaultdict(list)
        for batch in batcher.epoch(shuffle=False):
            dev = self.shard_batch(batch)
            loss, scores = self._eval_step(self.state, dev)
            # metrics read the HOST batch — the sharded copy's label/mask
            # fields would cost a relay fetch per field per batch
            self._batch_metrics(metrics, "val", loss, scores, batch)
        return _nanmean_metrics(metrics)

    def fit(
        self,
        train_batcher: GraphBatcher,
        val_batcher: Optional[GraphBatcher] = None,
        epochs: int = 1,
        log_dir: Optional[str] = None,
        version: str = "synthetic",
        verbose: bool = True,
        writer=None,
        fused_steps: int = 1,
    ) -> List[Dict[str, float]]:
        history = []
        for epoch in range(epochs):
            t0 = time.time()
            m = self.train_epoch(train_batcher, fused_steps=fused_steps)
            self._finish_epoch(
                epoch, m, t0, history,
                val_batcher=val_batcher, log_dir=log_dir, version=version,
                verbose=verbose, writer=writer,
            )
        return history

    def _finish_epoch(self, epoch, m, t0, history, *, val_batcher=None,
                      log_dir=None, version="synthetic", verbose=True,
                      writer=None):
        """Shared epoch tail: val metrics, logging, checkpointing."""
        if val_batcher is not None:
            m.update(self.eval_epoch(val_batcher))
        m["epoch_time_s"] = time.time() - t0
        history.append(m)
        if writer is not None:
            writer.log(epoch, m)
        if verbose:
            val_ap = m.get("val/avgprec", float("nan"))
            print(
                f"epoch {epoch}: loss={m['train/loss']:.4f} "
                f"AP={m['train/avgprec']:.4f} valAP={val_ap:.4f} "
                f"({m['epoch_time_s']:.1f}s)"
            )
        if log_dir is not None:
            path = epoch_checkpoint_name(
                log_dir,
                "gnn",
                epoch,
                version,
                m.get("train/avgprec", float("nan")),
                m.get("val/avgprec", float("nan")),
            )
            save_checkpoint(
                path,
                {"params": self.state.params, **self.state.extra_variables},
                metadata={k: v for k, v in m.items()},
            )

    # ---- device-resident dataset training ---------------------------------

    def _constrain_data(self, tree):
        """Re-shard a gathered batch along its batch axis on a mesh (the
        dataset is sharded along the window axis; the constraint keeps the
        step data-parallel — params replicated -> XLA inserts the gradient
        psum, parallel/mesh.py). No-op off-mesh."""
        if self.mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P

        from batch3dmot_tpu.parallel.mesh import DATA_AXIS

        s = NamedSharding(self.mesh, P(DATA_AXIS))
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, s), tree
        )

    def _gather_device_batch(self, graphs, enc, ib):
        from batch3dmot_tpu.train.encoded import DedupEncodings

        batch = self._constrain_data(jax.tree.map(lambda a: a[ib], graphs))
        if enc is None:
            return batch
        if isinstance(enc, DedupEncodings):
            # deduplicated form: gather the batch's det->table rows, then
            # gather embeddings from the global table ON DEVICE — identical
            # values to the dense per-window buffers at ~1/L the HBM
            rows = self._constrain_data(enc.det_index[ib])  # [B, mn]
            return batch, self._constrain_data(
                tuple(t[rows] for t in enc.table)
            )
        return batch, self._constrain_data(jax.tree.map(lambda a: a[ib], enc))

    def _device_batch_metrics(self, scores, batch):
        """``_batch_metrics`` computed IN-GRAPH: overall + per-class
        tie-corrected AP (``train.metrics.average_precision``, the
        sklearn/torchmetrics semantics pinned by the differential test)
        over the batch's masked edges. Returns
        ``(ap_overall, ap_class [C], present_class [C] bool)`` so a
        scanned epoch fetches a few scalars per step instead of the
        ``[n_steps, B, E]`` score tensor (MBs/epoch through the relay)
        plus a host-side sort over every epoch score. Sigmoid is skipped
        deliberately: it is strictly monotone, so ranking — and therefore
        AP, including tie groups — is unchanged from the host path."""
        if isinstance(batch, tuple):
            batch = batch[0]
        s = scores.reshape(-1)
        y = batch.edge_label.reshape(-1).astype(s.dtype)
        mask = batch.edge_mask.reshape(-1)
        # per-edge class = class of the source node (as _batch_metrics)
        edge_class = jnp.take_along_axis(
            batch.node_class, batch.edge_src, axis=-1
        ).reshape(-1)
        cids = jnp.asarray(list(TRACKING_CLASSES.values()))
        sel = mask[None, :] & (edge_class[None, :] == cids[:, None])  # [C,n]
        # ONE shared sort for overall + per-class APs (8 dedicated sorts
        # cost more than the fused train step, bench_device_metrics.py)
        aps = average_precision_multi(
            s, y, jnp.concatenate([mask[None, :], sel], axis=0)
        )
        return aps[0], aps[1:], sel.any(axis=1)

    def _accumulate_device_metrics(self, metrics, prefix, outs, n_steps):
        """Fold one scanned-epoch group's fetched per-step metrics into the
        host dict with exactly ``_batch_metrics``'s structure (a class key
        exists only for steps where the class has masked edges)."""
        losses, ap_all, ap_cls, present = (np.asarray(o) for o in outs)
        cnames = list(TRACKING_CLASSES)
        for k in range(n_steps):
            metrics[f"{prefix}/loss"].append(float(losses[k]))
            metrics[f"{prefix}/avgprec"].append(float(ap_all[k]))
            for i, cname in enumerate(cnames):
                if present[k, i]:
                    metrics[f"{prefix}/avgprec/{cname}"].append(
                        float(ap_cls[k, i])
                    )

    def _epoch_device(self, state, graphs, enc, idx):
        """One epoch as ONE program: scan over [n_steps, B] index rows,
        gathering each batch from the device-resident dataset in-graph.
        Diagnostic metrics (loss + tie-corrected APs) are computed in-graph
        too, so the per-epoch fetch is a few floats per step. ``enc`` is
        None for pose-model (modality-free) datasets."""

        def body(st, ib):
            batch = self._gather_device_batch(graphs, enc, ib)
            st, loss, scores = self._step(st, batch)
            return st, (loss, *self._device_batch_metrics(scores, batch))

        return jax.lax.scan(body, state, idx)

    def _epoch_device_eval(self, state, graphs, enc, idx):
        """Validation counterpart of ``_epoch_device``: one scanned program
        over fixed (unshuffled) batch index rows, no state update — a whole
        val pass costs one dispatch + one small metrics fetch per group,
        instead of an upload + dispatch + fetches per batch (the relay
        economics that motivated device-resident training apply to
        validation too)."""

        def body(c, ib):
            batch = self._gather_device_batch(graphs, enc, ib)
            loss, scores = self._forward_metrics(state, batch)
            return c, (loss, *self._device_batch_metrics(scores, batch))

        return jax.lax.scan(body, 0, idx)[1]

    def _upload_dataset_groups(self, groups):
        """Upload device-resident dataset groups ONCE (on a mesh: shard
        along the window axis, padding with copies of the empty slot so the
        axis divides — index n_items stays the canonical empty row).
        Returns [(graphs_dev, enc_dev, graphs_np, n_items)]."""
        from batch3dmot_tpu.train.encoded import DedupEncodings

        B = self.cfg.batch_size
        uploaded = []
        # dedup-form groups share ONE table object — upload it once
        table_memo: Dict[int, Any] = {}
        for graphs_np, enc_np, _bucket in groups:
            n_items = graphs_np.pose.shape[0] - 1  # last slot: empty pad
            dedup = isinstance(enc_np, DedupEncodings)
            # the per-window parts shard along the window axis; the dedup
            # table replicates (batch gathers index arbitrary rows)
            windowed_np = (
                (graphs_np, enc_np.det_index) if dedup
                else (graphs_np, enc_np)
            )
            if self.mesh is not None:
                # one chip's HBM no longer bounds the dataset
                # (trainval-scale); per-step batch gathers ride ICI
                from jax.sharding import NamedSharding, PartitionSpec as P

                from batch3dmot_tpu.parallel.mesh import DATA_AXIS

                assert B % self.mesh.size == 0, (B, self.mesh.size)
                pad_rows = (-(n_items + 1)) % self.mesh.size
                if pad_rows:
                    dup = lambda a: np.concatenate(
                        [a] + [a[-1:]] * pad_rows, axis=0
                    )
                    windowed_np = jax.tree.map(dup, windowed_np)
                shard = NamedSharding(self.mesh, P(DATA_AXIS))
                graphs = jax.device_put(windowed_np[0], shard)
                if dedup:
                    if id(enc_np.table) not in table_memo:
                        table_memo[id(enc_np.table)] = jax.device_put(
                            enc_np.table, NamedSharding(self.mesh, P())
                        )
                    enc = DedupEncodings(
                        jax.device_put(windowed_np[1], shard),
                        table_memo[id(enc_np.table)],
                    )
                else:
                    enc = (
                        jax.device_put(windowed_np[1], shard)
                        if windowed_np[1] is not None else None
                    )
                graphs_np = windowed_np[0]
            else:
                graphs = jax.device_put(graphs_np)
                if dedup:
                    if id(enc_np.table) not in table_memo:
                        table_memo[id(enc_np.table)] = jax.device_put(
                            enc_np.table
                        )
                    enc = DedupEncodings(
                        jax.device_put(enc_np.det_index),
                        table_memo[id(enc_np.table)],
                    )
                else:
                    enc = (
                        jax.device_put(enc_np)
                        if enc_np is not None else None
                    )
            uploaded.append((graphs, enc, graphs_np, n_items))
        return uploaded

    def fit_device(
        self,
        dataset,
        epochs: int = 1,
        val_batcher=None,
        val_dataset=None,
        log_dir: Optional[str] = None,
        version: str = "synthetic",
        verbose: bool = True,
        writer=None,
        seed: int = 0,
    ) -> List[Dict[str, float]]:
        """``fit`` over a DEVICE-RESIDENT dataset
        (``train.encoded.materialize_encoded_dataset``): the stacked
        windows upload once and every epoch runs as a single dispatched
        scan whose batches are gathered from the dataset ON DEVICE — after
        the upload, no training data crosses the host link. On
        remote-relay TPU deployments the per-epoch batch re-upload is the
        wall-clock floor (~3 MB/step over ~40 MB/s, CLAUDE.md relay
        economics); this removes it. Exact same math as ``fit`` with an
        EncodedGraphBatcher: per-epoch window reshuffling, remainder
        batches padded with the fully-masked empty slot (index W).
        Diagnostic metrics are computed IN-GRAPH
        (``_device_batch_metrics``) so an epoch's fetch is a few floats
        per step rather than every score — identical to the host metrics
        up to f32-vs-f64 rounding in the AP accumulation. On a
        mesh the dataset shards along the window axis (one chip's HBM no
        longer bounds it) and each step runs data-parallel.

        ``dataset`` may also be a LIST of per-bucket groups
        (``materialize_*_datasets``): each epoch runs one scanned program
        per group, in shuffled group order — faithful per-bucket padding
        instead of forcing every step to the densest window's bucket.
        (Ordering nuance vs the host batcher: batches are shuffled within
        a group but groups run blockwise; with one group — the common
        case — composition matches ``fit`` exactly.)

        ``val_dataset`` (same materialized forms) keeps validation
        device-resident too: each epoch's val pass is one scanned program
        per group over FIXED sequential batch rows — same numbers as
        ``eval_epoch`` on an unshuffled uniform batcher. Mutually
        exclusive with ``val_batcher`` (the host-streaming fallback)."""
        groups = dataset if isinstance(dataset, list) else [dataset]
        B = self.cfg.batch_size
        uploaded = self._upload_dataset_groups(groups)
        val_uploaded = None
        if val_dataset is not None:
            assert val_batcher is None, "pass val_dataset OR val_batcher"
            vgroups = (
                val_dataset if isinstance(val_dataset, list)
                else [val_dataset]
            )
            val_uploaded = []
            for graphs, enc, graphs_np, n_items in (
                self._upload_dataset_groups(vgroups)
            ):
                n_steps = -(-n_items // B)
                pad = n_steps * B - n_items
                idx = np.concatenate(
                    [np.arange(n_items), np.full(pad, n_items, np.int64)]
                ).reshape(n_steps, B).astype(np.int32)
                val_uploaded.append(
                    (graphs, enc, graphs_np, idx, jnp.asarray(idx))
                )
            eval_run = jax.jit(self._epoch_device_eval)
        rng = np.random.default_rng(seed)
        run = jax.jit(self._epoch_device, donate_argnums=0)

        history = []
        for epoch in range(epochs):
            t0 = time.time()
            metrics: Dict[str, List[float]] = defaultdict(list)
            # no rng draw in the common single-group case (keeps the batch
            # composition reproducible for the host-path exactness test)
            g_order = (
                rng.permutation(len(uploaded)) if len(uploaded) > 1 else [0]
            )
            for gi in g_order:
                graphs, enc, graphs_np, n_items = uploaded[gi]
                order = rng.permutation(n_items)
                n_steps = -(-n_items // B)
                pad = n_steps * B - n_items
                idx = np.concatenate(
                    [order, np.full(pad, n_items, np.int64)]
                ).reshape(n_steps, B).astype(np.int32)
                self.state, outs = run(
                    self.state, graphs, enc, jnp.asarray(idx)
                )
                # ONE small fetch per group per epoch: metrics were
                # computed in-graph (loss + APs per step) — no score
                # tensor crosses the relay and no host-side sort runs
                self._accumulate_device_metrics(
                    metrics, "train", outs, n_steps
                )
            if val_uploaded is not None:
                for graphs, enc, graphs_np, idx, idx_dev in val_uploaded:
                    outs = eval_run(self.state, graphs, enc, idx_dev)
                    self._accumulate_device_metrics(
                        metrics, "val", outs, idx.shape[0]
                    )
            self._finish_epoch(
                epoch, _nanmean_metrics(metrics), t0, history,
                val_batcher=val_batcher, log_dir=log_dir, version=version,
                verbose=verbose, writer=writer,
            )
        return history

    @property
    def variables(self) -> Dict[str, Any]:
        return {"params": self.state.params, **self.state.extra_variables}

    # ---- full-state checkpointing (resume with optimizer moments) --------

    def save_state(self, path: str) -> str:
        """Checkpoint params + frozen collections + optimizer state + step,
        so training resumes exactly (the reference only resumes model
        weights via strict=False, train.py:72-75)."""
        return save_checkpoint(
            path,
            {
                "variables": self.variables,
                "opt_state": self.state.opt_state,
                "step": self.state.step,
            },
        )

    def load_state(self, path: str) -> None:
        from batch3dmot_tpu.utils.checkpoint import load_checkpoint

        template = {
            "variables": self.variables,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }
        restored = load_checkpoint(path, template)
        variables = dict(restored["variables"])
        params = variables.pop("params")
        self.state = self.state.replace(
            params=params,
            extra_variables=variables,
            opt_state=restored["opt_state"],
            step=restored["step"],
        )


class _MetricsView:
    """Minimal numpy view of the graph fields _batch_metrics consumes."""

    def __init__(self, edge_label, edge_mask, node_class, edge_src):
        self.edge_label = edge_label
        self.edge_mask = edge_mask
        self.node_class = node_class
        self.edge_src = edge_src


def _nanmean_metrics(metrics: Dict[str, List[float]]) -> Dict[str, float]:
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # all-NaN class APs
        return {k: float(np.nanmean(v)) for k, v in metrics.items()}


def average_precision_np(scores: np.ndarray, labels: np.ndarray) -> float:
    """Host-side binary AP: sum over score thresholds of
    ``(recall_n - recall_{n-1}) * precision_n``.

    Tied scores form ONE threshold (every element of a tie group shares the
    precision at the group's end) — the semantics of the reference's
    torchmetrics ``average_precision`` (``train.py:143-155``) and sklearn's
    ``average_precision_score``, pinned by the differential test in
    ``tests/test_train.py``. The naive per-position form overstates AP when
    positives sort before negatives inside a tie group.
    """
    if len(scores) == 0 or labels.sum() == 0:
        return float("nan")
    order = np.argsort(-scores, kind="stable")
    s = scores[order]
    y = labels[order]
    n = len(y)
    tp = np.cumsum(y)
    # index of the last element of each tie group, broadcast to every member
    is_last = np.empty(n, bool)
    is_last[-1] = True
    is_last[:-1] = s[1:] != s[:-1]
    end = np.where(is_last, np.arange(n), n)
    end = np.minimum.accumulate(end[::-1])[::-1]
    precision_at_end = tp[end] / (end + 1)
    return float((precision_at_end * y).sum() / tp[-1])
