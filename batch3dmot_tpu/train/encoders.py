"""Encoder trainers: ResNet-AE (MSE reconstruction), PointNet and RadarNet
(NLL classification).

Replaces the reference's four encoder training scripts
(``training/train_resnet_ae.py``, ``train_resnet_ae_ddp.py``,
``train_pointnet.py``, ``train_radarnet.py``) with one functional trainer:

  * losses: MSE(recon, img) / batch_size for the AE
    (``train_resnet_ae.py:253-331``); NLL on log-softmax / batch_size for
    the classifiers (``train_pointnet.py:243-244``), with the optional
    feature-transform orthogonality regularizer;
  * optimizer: torch-style Adam + StepLR (gamma^(epoch // step));
  * multi-GPU: the reference's 4-way NCCL DDP (``train_resnet_ae_ddp.py``)
    becomes leading-dim batch sharding over the device mesh — pass
    ``shard_batch=shard_batch_fn(mesh)`` and replicate the state; XLA
    inserts the gradient psum over ICI;
  * BatchNorm running stats update through the ``batch_stats`` mutable
    collection; per-epoch metric-stamped checkpoints.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from batch3dmot_tpu.config import EncoderTrainConfig
from batch3dmot_tpu.models.encoders import (
    PointNetClassifier,
    RadarNetClassifier,
    ResNetAE,
    feature_transform_regularizer,
)
from batch3dmot_tpu.utils.checkpoint import save_checkpoint


class EncoderTrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array
    rng: jax.Array


def steplr_adam(
    cfg: EncoderTrainConfig, steps_per_epoch: int
) -> optax.GradientTransformation:
    """Adam with torch StepLR decay (gamma every ``scheduler_step_size``
    epochs) and torch-style additive weight decay."""
    schedule = optax.exponential_decay(
        init_value=float(cfg.lr),
        transition_steps=max(1, steps_per_epoch * cfg.scheduler_step_size),
        decay_rate=cfg.scheduler_gamma,
        staircase=True,
    )
    steps = [
        optax.scale_by_adam(b1=cfg.beta_lo, b2=cfg.beta_hi),
        optax.scale_by_schedule(lambda s: -schedule(s)),
    ]
    if cfg.weight_decay:
        steps.insert(0, optax.add_decayed_weights(float(cfg.weight_decay)))
    return optax.chain(*steps)


class EncoderTrainer:
    """Generic jit-stepped trainer; the loss_fn defines the model family."""

    def __init__(
        self,
        model,
        loss_fn: Callable,  # (model, variables, batch, rng, train) -> (loss, aux, new_batch_stats)
        example_batch,
        cfg: Optional[EncoderTrainConfig] = None,
        steps_per_epoch: int = 100,
        seed: int = 0,
        shard_batch: Optional[Callable] = None,
        mesh=None,
    ):
        self.model = model
        self.loss_fn = loss_fn
        self.cfg = cfg or EncoderTrainConfig()
        # mesh: data-parallel encoder training (the reference's 4-way NCCL
        # DDP, train_resnet_ae_ddp.py:125-290) — batches shard on their
        # leading dim, state replicates, XLA inserts the gradient psum.
        self.mesh = mesh
        if mesh is not None and shard_batch is None:
            from batch3dmot_tpu.parallel import shard_batch_fn

            shard_batch = shard_batch_fn(mesh)
        self.shard_batch = shard_batch or (lambda x: x)

        rng = jax.random.key(self.cfg.manual_seed + seed)
        init_rng, state_rng = jax.random.split(rng)
        init_input = (
            example_batch[0] if isinstance(example_batch, tuple) else example_batch
        )
        variables = model.init(init_rng, init_input)
        params = variables.get("params")
        batch_stats = variables.get("batch_stats", {})
        self.tx = steplr_adam(self.cfg, steps_per_epoch)
        self.state = EncoderTrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
            rng=state_rng,
        )
        if mesh is not None:
            from batch3dmot_tpu.parallel import replicate

            self.state = replicate(self.state, mesh)
        self._train_step = jax.jit(self._step, donate_argnums=0)
        self._eval_step = jax.jit(self._eval)

    def _step(self, state: EncoderTrainState, batch):
        rng, sub = jax.random.split(state.rng)

        def lf(params):
            return self.loss_fn(
                self.model,
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                sub,
                True,
            )

        (loss, (aux, new_stats)), grads = jax.value_and_grad(lf, has_aux=True)(
            state.params
        )
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                params=params,
                batch_stats=new_stats,
                opt_state=opt_state,
                step=state.step + 1,
                rng=rng,
            ),
            loss,
            aux,
        )

    def _eval(self, state: EncoderTrainState, batch):
        loss, (aux, _) = self.loss_fn(
            self.model,
            {"params": state.params, "batch_stats": state.batch_stats},
            batch,
            state.rng,
            False,
        )
        return loss, aux

    def fit(
        self,
        train_batches: Callable[[], Iterable],
        val_batches: Optional[Callable[[], Iterable]] = None,
        epochs: int = 1,
        log_dir: Optional[str] = None,
        prefix: str = "encoder",
        verbose: bool = True,
        writer=None,
    ) -> List[Dict[str, float]]:
        history = []
        for epoch in range(epochs):
            t0 = time.time()
            # metrics stay DEVICE scalars until the epoch ends — a
            # float() per batch is a host fetch per batch, ~0.1-0.2 s
            # each through the TPU relay (CLAUDE.md relay economics)
            losses, auxs = [], []
            for batch in train_batches():
                batch = self.shard_batch(batch)
                self.state, loss, aux = self._train_step(self.state, batch)
                losses.append(loss)
                auxs.append(aux)
            if not losses:
                raise RuntimeError(
                    "encoder training epoch produced no batches — too few "
                    "annotations survive the min-points/ego-radius filters "
                    "for this batch size"
                )
            m = {"train/loss": float(np.mean(np.asarray(jnp.stack(losses))))}
            for k in auxs[0]:
                m[f"train/{k}"] = float(
                    np.mean(np.asarray(jnp.stack([a[k] for a in auxs])))
                )
            if val_batches is not None:
                vl, va = [], []
                for batch in val_batches():
                    batch = self.shard_batch(batch)
                    loss, aux = self._eval_step(self.state, batch)
                    vl.append(loss)
                    va.append(aux)
                if vl:
                    m["val/loss"] = float(np.mean(np.asarray(jnp.stack(vl))))
                for k in (va[0] if va else {}):
                    m[f"val/{k}"] = float(
                        np.mean(np.asarray(jnp.stack([a[k] for a in va])))
                    )
            self._epoch_tail(
                epoch, m, t0, history,
                log_dir=log_dir, prefix=prefix, verbose=verbose,
                writer=writer,
            )
        return history

    def _epoch_tail(self, epoch, m, t0, history, *, log_dir=None,
                    prefix="encoder", verbose=True, writer=None):
        """Shared epoch tail: timing, logging, checkpointing."""
        m["epoch_time_s"] = time.time() - t0
        history.append(m)
        if writer is not None:
            writer.log(epoch, m)
        if verbose:
            print(f"{prefix} epoch {epoch}: {m}")
        if log_dir:
            save_checkpoint(
                f"{log_dir}/{prefix}_epoch{epoch}_loss{m['train/loss']:.6f}.msgpack",
                self.variables,
                metadata=m,
            )

    # ---- device-resident dataset training ---------------------------------

    def _constrain_data(self, tree):
        """Re-shard a gathered batch along its batch axis on a mesh (the
        dataset shards along the item axis; the constraint keeps each step
        data-parallel). No-op off-mesh."""
        if self.mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P

        from batch3dmot_tpu.parallel.mesh import DATA_AXIS

        s = NamedSharding(self.mesh, P(DATA_AXIS))
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, s), tree
        )

    def _upload_dataset(self, data):
        """Upload a stacked item pytree once (mesh: shard the leading dim,
        padding with copies of the last row so the axis divides; padded
        rows are never gathered — every epoch indexes only [0, N))."""
        n_items = jax.tree.leaves(data)[0].shape[0]
        if self.mesh is None:
            return jax.device_put(data), n_items
        from jax.sharding import NamedSharding, PartitionSpec as P

        from batch3dmot_tpu.parallel.mesh import DATA_AXIS

        pad_rows = (-n_items) % self.mesh.size
        if pad_rows:
            data = jax.tree.map(
                lambda a: np.concatenate([a] + [a[-1:]] * pad_rows, axis=0),
                data,
            )
        shard = NamedSharding(self.mesh, P(DATA_AXIS))
        return jax.device_put(data, shard), n_items

    def _epoch_device(self, state, data, idx, transform):
        """One training epoch as ONE scanned program: gather each batch
        from the device-resident dataset in-graph, run the in-graph
        transform (the host loader's per-epoch randomness — augmentation,
        subsampling), step. Returns (state, (losses, aux))."""

        def body(st, ib):
            rng_next, t_sub = jax.random.split(st.rng)
            batch = self._constrain_data(
                jax.tree.map(lambda a: a[ib], data)
            )
            batch = transform(t_sub, batch, True)
            st, loss, aux = self._step(st.replace(rng=rng_next), batch)
            return st, (loss, aux)

        return jax.lax.scan(body, state, idx)

    def _epoch_device_eval(self, state, data, idx, key, transform):
        """Validation counterpart: fixed sequential batch rows, no state
        update; ``key`` drives the transform's (train=False) randomness."""

        def body(c, scan_in):
            ib, i = scan_in
            batch = self._constrain_data(
                jax.tree.map(lambda a: a[ib], data)
            )
            batch = transform(jax.random.fold_in(key, i), batch, False)
            loss, aux = self._eval(state, batch)
            return c, (loss, aux)

        steps = jnp.arange(idx.shape[0])
        return jax.lax.scan(body, 0, (idx, steps))[1]

    def fit_device(
        self,
        dataset,
        transform=None,
        val_dataset=None,
        epochs: int = 1,
        log_dir: Optional[str] = None,
        prefix: str = "encoder",
        verbose: bool = True,
        writer=None,
        seed: int = 0,
    ) -> List[Dict[str, float]]:
        """``fit`` over a DEVICE-RESIDENT dataset: the stacked item rows
        (np arrays, leading dim N) upload once and every epoch runs as one
        scanned program — the per-epoch randomness of the host loaders
        (lidar augmentation, fixed-size subsampling) moves in-graph via
        ``transform(rng, batch, train)`` (see ``{image,lidar,radar}_
        transform``). After the upload only an index permutation crosses
        the host link per epoch, and — unlike the host loaders, which
        re-decode/re-load every item every epoch on this machine's single
        host core — the host does no per-epoch data work at all.
        Remainder items are dropped each epoch like the host loaders.
        Metrics are fetched once per epoch."""
        transform = transform or (lambda rng, batch, train: batch)
        B = self.cfg.batch_size
        data, n_items = self._upload_dataset(dataset)
        if n_items < B:
            raise RuntimeError(
                f"fit_device: {n_items} items < batch_size {B}"
            )
        val = None
        if val_dataset is not None:
            vdata, vn = self._upload_dataset(val_dataset)
            if vn >= B:
                vidx = np.arange((vn // B) * B, dtype=np.int32).reshape(
                    -1, B
                )
                val = (vdata, jnp.asarray(vidx))
        run = jax.jit(
            self._epoch_device, donate_argnums=0, static_argnums=3
        )
        run_eval = jax.jit(self._epoch_device_eval, static_argnums=4)
        rng = np.random.default_rng(seed)

        history = []
        for epoch in range(epochs):
            t0 = time.time()
            idx = rng.permutation(n_items)[: (n_items // B) * B]
            idx = idx.reshape(-1, B).astype(np.int32)
            self.state, (losses, auxs) = run(
                self.state, data, jnp.asarray(idx), transform
            )
            m = {"train/loss": float(np.mean(np.asarray(losses)))}
            for k in auxs:
                m[f"train/{k}"] = float(np.mean(np.asarray(auxs[k])))
            if val is not None:
                vdata, vidx = val
                vl, va = run_eval(
                    self.state, vdata, vidx,
                    jax.random.key(seed * 100003 + epoch), transform,
                )
                m["val/loss"] = float(np.mean(np.asarray(vl)))
                for k in va:
                    m[f"val/{k}"] = float(np.mean(np.asarray(va[k])))
            self._epoch_tail(
                epoch, m, t0, history,
                log_dir=log_dir, prefix=prefix, verbose=verbose,
                writer=writer,
            )
        return history

    @property
    def variables(self):
        return {"params": self.state.params, "batch_stats": self.state.batch_stats}


def _as_args(batch) -> Tuple:
    return batch if isinstance(batch, tuple) else (batch,)


# ---------------------------------------------------------------------------
# Loss functions per encoder family
# ---------------------------------------------------------------------------


def resnet_ae_loss(model: ResNetAE, variables, batch, rng, train: bool):
    """MSE reconstruction / batch_size (reference train_resnet_ae.py:253-331)."""
    imgs = batch[0] if isinstance(batch, tuple) else batch
    if train:
        recon, new_vars = model.apply(
            variables, imgs, train=True, mutable=["batch_stats"]
        )
    else:
        recon, new_vars = model.apply(variables, imgs, train=False), {}
    loss = jnp.mean((recon - imgs) ** 2)
    new_stats = new_vars.get("batch_stats", variables.get("batch_stats", {}))
    return loss, ({"mse": loss}, new_stats)


def _classifier_loss(model, variables, batch, rng, train, feature_transform, reg_weight=0.001):
    points, labels = batch
    kwargs = dict(train=train, deterministic=not train)
    if train:
        result, new_vars = model.apply(
            variables,
            points,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
            **kwargs,
        )
    else:
        result, new_vars = model.apply(variables, points, **kwargs), {}
    if isinstance(result, tuple):
        logp, trans, trans_feat = result
    else:
        logp, trans, trans_feat = result, None, None
    nll = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))
    loss = nll
    if feature_transform and trans_feat is not None:
        loss = loss + reg_weight * feature_transform_regularizer(trans_feat)
    acc = jnp.mean((jnp.argmax(logp, axis=1) == labels).astype(jnp.float32))
    new_stats = new_vars.get("batch_stats", variables.get("batch_stats", {}))
    return loss, ({"nll": nll, "accuracy": acc}, new_stats)


def pointnet_loss(model: PointNetClassifier, variables, batch, rng, train: bool):
    """NLL + optional T-Net orthogonality regularizer
    (reference train_pointnet.py:243-244)."""
    return _classifier_loss(
        model, variables, batch, rng, train, model.feature_transform
    )


def radarnet_loss(model: RadarNetClassifier, variables, batch, rng, train: bool):
    return _classifier_loss(model, variables, batch, rng, train, False)


# convenience constructors ---------------------------------------------------


def make_resnet_trainer(cfg=None, example=None, **kw) -> EncoderTrainer:
    model = ResNetAE()
    if example is None:
        example = jnp.zeros((2, 32, 32, 3))
    return EncoderTrainer(model, resnet_ae_loss, example, cfg, **kw)


def make_pointnet_trainer(cfg=None, num_classes=7, example=None, **kw) -> EncoderTrainer:
    model = PointNetClassifier(num_classes)
    if example is None:
        example = (jnp.zeros((2, 128, 3)), jnp.zeros((2,), jnp.int32))
    return EncoderTrainer(model, pointnet_loss, example, cfg, **kw)


def make_radarnet_trainer(cfg=None, num_classes=7, example=None, **kw) -> EncoderTrainer:
    model = RadarNetClassifier(num_classes)
    if example is None:
        example = (jnp.zeros((2, 64, 4)), jnp.zeros((2,), jnp.int32))
    return EncoderTrainer(model, radarnet_loss, example, cfg, **kw)


# ---------------------------------------------------------------------------
# Device-resident encoder training: in-graph per-epoch transforms
# (the host loaders' randomness — augmentation, fixed-size subsampling —
# re-expressed as jax ops over the padded dataset rows)
# ---------------------------------------------------------------------------


def _collate_in_graph(rng, pts, count, num_points: int):
    """[C, K] padded cloud -> [C, num_points]: random subsample WITHOUT
    replacement when count > num_points, zero-pad when shorter — the
    in-graph twin of ``modality.collate_fixed_size`` (random uniform keys,
    invalid columns pushed to +inf, argsort, take the first num_points;
    point ORDER randomizes where the host keeps it, immaterial to the
    permutation-invariant PointNet/RadarNet)."""
    K = pts.shape[1]
    keys = jnp.where(
        jnp.arange(K) < count, jax.random.uniform(rng, (K,)), jnp.inf
    )
    order = jnp.argsort(keys)[:num_points]
    out = jnp.take(pts, order, axis=1)
    valid = jnp.arange(num_points) < jnp.minimum(count, num_points)
    return jnp.where(valid[None, :], out, 0.0)


def _reference_normalize_in_graph(pc):
    """In-graph twin of ``modality.reference_normalize`` (the quirky
    per-point CHANNEL mean + max-over-channels norm,
    construct...parallel.py:299-302). Zero (padded) columns stay zero."""
    x = pc - jnp.mean(pc, axis=0, keepdims=True)
    dist = jnp.max(jnp.sqrt(jnp.sum(x**2, axis=1)))
    return jnp.where(dist > 0, x / dist, x)


def image_transform(res_size: int = 32):
    """uint8 [B, R, R, 3] -> f32 /255 (bit-identical to the host loader's
    conversion, ``data/preprocess.image_batches``)."""

    def f(rng, batch, train):
        imgs = batch[0] if isinstance(batch, tuple) else batch
        out = imgs.astype(jnp.float32) / 255.0
        return (out, batch[1]) if isinstance(batch, tuple) else out

    return f


def lidar_transform(num_points: int = 128, max_yaw: float = np.pi / 10):
    """Per-epoch in-graph twin of ``data/preprocess.lidar_batches``:
    train-only random yaw about the xyz centroid (reference
    train_pointnet.py augmentation), quirky all-channel normalization,
    then fixed-size collate of the first 3 channels -> [B, num_points, 3]."""

    def one(rng, pc, count):
        r_yaw, r_col = jax.random.split(rng)
        valid = (jnp.arange(pc.shape[1]) < count)[None, :]

        def augment(pc):
            yaw = jax.random.uniform(
                r_yaw, (), minval=-max_yaw, maxval=max_yaw
            )
            c, s = jnp.cos(yaw), jnp.sin(yaw)
            R = jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
            xyz = pc[0:3]
            centroid = jnp.sum(
                jnp.where(valid, xyz, 0.0), axis=1, keepdims=True
            ) / jnp.maximum(count, 1)
            rot = R @ (xyz - centroid) + centroid
            # padded columns must stay zero (they'd otherwise pick up the
            # centroid offset and leak into the channel-mixing normalize)
            return pc.at[0:3].set(jnp.where(valid, rot, 0.0))

        return one_cloud(augment, pc, valid, count, r_col)

    def one_cloud(augment, pc, valid, count, r_col):
        pc = augment(pc)
        pc = _reference_normalize_in_graph(pc)
        return _collate_in_graph(r_col, pc[0:3], count, num_points).T

    def f(rng, batch, train):
        clouds, counts, labels = batch
        rngs = jax.random.split(rng, clouds.shape[0])
        if train:
            pts = jax.vmap(one)(rngs, clouds, counts)
        else:
            pts = jax.vmap(
                lambda r, pc, ct: one_cloud(
                    lambda p: p,
                    pc,
                    (jnp.arange(pc.shape[1]) < ct)[None, :],
                    ct,
                    r,
                )
            )(rngs, clouds, counts)
        return pts, labels

    return f


def radar_transform(num_points: int = 64):
    """Per-epoch in-graph twin of ``data/preprocess.radar_batches``:
    normalization already ran at materialize time (deterministic), so only
    the fixed-size collate subsample runs here -> [B, num_points, 4]."""

    def f(rng, batch, train):
        vecs, counts, labels = batch
        rngs = jax.random.split(rng, vecs.shape[0])
        pts = jax.vmap(
            lambda r, v, ct: _collate_in_graph(r, v, ct, num_points).T
        )(rngs, vecs, counts)
        return pts, labels

    return f
