"""Encoder trainer tests: learning + BatchNorm stats update + DP sharding."""

import jax.numpy as jnp
import numpy as np
import pytest

from batch3dmot_tpu.config import EncoderTrainConfig
from batch3dmot_tpu.parallel import make_mesh, replicate, shard_batch_fn
from batch3dmot_tpu.train.encoders import (
    make_pointnet_trainer,
    make_radarnet_trainer,
    make_resnet_trainer,
)


def _img_batches(rng, n_batches=4, bs=8):
    data = [jnp.asarray(rng.random((bs, 32, 32, 3), dtype=np.float32)) for _ in range(n_batches)]
    return lambda: iter(data)


def _cloud_batches(rng, n_batches=4, bs=8, points=64, ch=3, classes=3):
    """Separable classes: class k clouds centered at offset k."""
    batches = []
    for _ in range(n_batches):
        labels = rng.integers(0, classes, bs)
        pts = rng.normal(0, 0.2, (bs, points, ch)).astype(np.float32)
        pts += labels[:, None, None] * 2.0
        batches.append((jnp.asarray(pts), jnp.asarray(labels)))
    return lambda: iter(batches)


def test_resnet_ae_reconstruction_improves(rng):
    cfg = EncoderTrainConfig(lr=3e-3, num_epochs=3)
    trainer = make_resnet_trainer(cfg, steps_per_epoch=4)
    hist = trainer.fit(_img_batches(rng), epochs=3, verbose=False)
    assert hist[-1]["train/loss"] < hist[0]["train/loss"]


def test_resnet_ae_batch_stats_update(rng):
    trainer = make_resnet_trainer(EncoderTrainConfig(lr=1e-3), steps_per_epoch=4)
    before = np.asarray(trainer.state.batch_stats["block1"]["bn1"]["mean"]).copy()
    trainer.fit(_img_batches(rng, 1), epochs=1, verbose=False)
    after = np.asarray(trainer.state.batch_stats["block1"]["bn1"]["mean"])
    assert not np.allclose(before, after)


def test_pointnet_learns_separable_classes(rng):
    cfg = EncoderTrainConfig(lr=1e-3)
    trainer = make_pointnet_trainer(
        cfg, num_classes=3,
        example=(jnp.zeros((2, 64, 3)), jnp.zeros((2,), jnp.int32)),
        steps_per_epoch=6,
    )
    hist = trainer.fit(_cloud_batches(rng, 6), epochs=4, verbose=False)
    assert hist[-1]["train/accuracy"] > 0.8


def test_radarnet_learns(rng):
    cfg = EncoderTrainConfig(lr=1e-3)
    trainer = make_radarnet_trainer(
        cfg, num_classes=3,
        example=(jnp.zeros((2, 32, 4)), jnp.zeros((2,), jnp.int32)),
        steps_per_epoch=6,
    )
    hist = trainer.fit(
        _cloud_batches(rng, 6, points=32, ch=4), epochs=4, verbose=False
    )
    assert hist[-1]["train/accuracy"] > 0.8


def test_resnet_dp_sharded(rng):
    mesh = make_mesh(8)
    trainer = make_resnet_trainer(
        EncoderTrainConfig(lr=1e-3), steps_per_epoch=2,
        shard_batch=shard_batch_fn(mesh),
    )
    trainer.state = trainer.state.replace(
        params=replicate(trainer.state.params, mesh),
        batch_stats=replicate(trainer.state.batch_stats, mesh),
        opt_state=replicate(trainer.state.opt_state, mesh),
    )
    hist = trainer.fit(_img_batches(rng, 2, bs=16), epochs=1, verbose=False)
    assert np.isfinite(hist[0]["train/loss"])


def test_checkpointing(tmp_path, rng):
    trainer = make_resnet_trainer(EncoderTrainConfig(lr=1e-3), steps_per_epoch=1)
    trainer.fit(
        _img_batches(rng, 1), epochs=1, log_dir=str(tmp_path),
        prefix="resnet", verbose=False,
    )
    assert list(tmp_path.glob("resnet_epoch0_*.msgpack"))
