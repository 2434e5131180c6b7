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
