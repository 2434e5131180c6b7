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


# ---- device-resident encoder training ------------------------------------


def test_collate_in_graph_matches_host_semantics(rng):
    """_collate_in_graph is the in-graph twin of modality.collate_fixed_size:
    short clouds keep every valid point (zero-padded), long clouds
    subsample WITHOUT replacement — in random order (immaterial to the
    permutation-invariant encoders)."""
    import jax

    from batch3dmot_tpu.train.encoders import _collate_in_graph

    pts = np.arange(1, 4 * 20 + 1, dtype=np.float32).reshape(4, 20)
    # short: count=5 <= num_points=8
    out = np.asarray(
        _collate_in_graph(jax.random.key(0), jnp.asarray(pts), 5, 8)
    )
    assert out.shape == (4, 8)
    assert sorted(out[0, :5].tolist()) == pts[0, :5].tolist()
    assert (out[:, 5:] == 0).all()
    # long: count=20 > num_points=8 -> 8 distinct valid columns
    out = np.asarray(
        _collate_in_graph(jax.random.key(1), jnp.asarray(pts), 20, 8)
    )
    cols = out[0].tolist()
    assert len(set(cols)) == 8 and all(c in pts[0].tolist() for c in cols)


def test_reference_normalize_in_graph_matches_host(rng):
    from batch3dmot_tpu.data import modality as mod
    from batch3dmot_tpu.train.encoders import _reference_normalize_in_graph

    pc = rng.normal(size=(5, 17)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(_reference_normalize_in_graph(jnp.asarray(pc))),
        mod.reference_normalize(pc),
        rtol=1e-5, atol=1e-6,
    )


def test_lidar_transform_eval_matches_host_loader(rng, tmp_path):
    """lidar_transform(train=False) on the materialized dataset must equal
    the host loader's un-augmented pipeline as a point MULTISET (collate
    randomizes order; use clouds shorter than num_points so no
    subsampling)."""
    import jax

    from batch3dmot_tpu.data.preprocess import (
        lidar_batches,
        materialize_lidar_dataset,
    )
    from batch3dmot_tpu.train.encoders import lidar_transform

    entries = []
    for i in range(4):
        k = int(rng.integers(8, 14))
        pc = rng.normal(size=(5, k)).astype(np.float32)
        tok = f"ann{i}"
        np.save(tmp_path / f"{tok}.npy", pc)
        entries.append({
            "sample_annotation_token": tok,
            "category_name": "vehicle.car",
            "num_lidar_pts": k,
            "ann_ego_radius": 10.0,
        })

    num_points = 16
    host = list(lidar_batches(
        str(tmp_path), entries, batch_size=4, min_pts=6,
        num_points=num_points, augment=False, shuffle=False,
    ))
    assert len(host) == 1
    host_pts, host_labels = host[0]

    ds = materialize_lidar_dataset(
        str(tmp_path), entries, min_pts=6, num_points=num_points
    )
    clouds, counts, labels = ds
    dev_pts, dev_labels = lidar_transform(num_points=num_points)(
        jax.random.key(0), jax.tree.map(jnp.asarray, ds), False
    )
    np.testing.assert_array_equal(np.asarray(dev_labels), host_labels)
    for i in range(4):
        a = np.sort(np.asarray(dev_pts)[i], axis=0)
        b = np.sort(host_pts[i], axis=0)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_lidar_transform_augment_matches_numpy_twin(rng):
    """Train-mode augmentation: zero max_yaw degenerates to the eval
    pipeline, and with a real yaw the output equals an exact numpy twin of
    rotate-about-centroid -> quirky normalize, fed the SAME yaw draws
    (extracted by replaying the transform's key splits on the host). No
    rotation-invariance shortcut is possible: the reference normalization
    subtracts a per-point CHANNEL mean, mixing xy into z."""
    import jax

    from batch3dmot_tpu.data import modality as mod
    from batch3dmot_tpu.train.encoders import lidar_transform

    clouds = rng.normal(size=(3, 5, 12)).astype(np.float32)
    counts = np.full((3,), 12, np.int32)
    labels = np.zeros((3,), np.int32)
    batch = (jnp.asarray(clouds), jnp.asarray(counts), jnp.asarray(labels))

    t0 = lidar_transform(num_points=12, max_yaw=0.0)
    a, _ = t0(jax.random.key(3), batch, True)
    b, _ = t0(jax.random.key(3), batch, False)
    np.testing.assert_allclose(
        np.sort(np.asarray(a), axis=1), np.sort(np.asarray(b), axis=1),
        rtol=1e-5, atol=1e-6,
    )

    max_yaw = np.pi / 10
    key = jax.random.key(4)
    c, _ = lidar_transform(num_points=12, max_yaw=max_yaw)(
        key, batch, True
    )
    c = np.asarray(c)
    rngs = jax.random.split(key, 3)
    for i in range(3):
        r_yaw, _ = jax.random.split(rngs[i])
        yaw = float(jax.random.uniform(
            r_yaw, (), minval=-max_yaw, maxval=max_yaw
        ))
        pc = clouds[i].copy()
        co, si = np.cos(yaw), np.sin(yaw)
        R = np.array([[co, -si, 0.0], [si, co, 0.0], [0.0, 0.0, 1.0]],
                     np.float32)
        centroid = pc[0:3].mean(axis=1, keepdims=True)
        pc[0:3] = R @ (pc[0:3] - centroid) + centroid
        want = mod.reference_normalize(pc)[0:3].T  # [12, 3]
        got = c[i]  # [12, 3] in collate-random order
        order_w = np.lexsort(want.T)
        order_g = np.lexsort(got.T)
        np.testing.assert_allclose(
            got[order_g], want[order_w], rtol=1e-4, atol=1e-5
        )


def test_radar_transform_matches_host_loader(rng, tmp_path):
    """radar_transform on the materialized dataset equals the host loader
    as a point multiset (short clouds: no subsampling)."""
    import jax

    from batch3dmot_tpu.data.preprocess import (
        materialize_radar_dataset,
        radar_batches,
    )
    from batch3dmot_tpu.train.encoders import radar_transform

    entries = []
    for i in range(4):
        k = int(rng.integers(3, 7))
        pc = rng.normal(size=(18, k)).astype(np.float32)
        tok = f"ann{i}"
        np.save(tmp_path / f"{tok}.npy", pc)
        entries.append({
            "sample_annotation_token": tok,
            "category_name": "human.pedestrian.adult",
            "num_radar_pts": k,
            "ann_ego_radius": 10.0,
        })

    host = list(radar_batches(
        str(tmp_path), entries, batch_size=4, min_pts=2,
        num_points=8, shuffle=False,
    ))
    host_pts, host_labels = host[0]

    ds = materialize_radar_dataset(
        str(tmp_path), entries, min_pts=2, num_points=8
    )
    dev_pts, dev_labels = radar_transform(num_points=8)(
        jax.random.key(0), jax.tree.map(jnp.asarray, ds), False
    )
    np.testing.assert_array_equal(np.asarray(dev_labels), host_labels)
    for i in range(4):
        np.testing.assert_allclose(
            np.sort(np.asarray(dev_pts)[i], axis=0),
            np.sort(host_pts[i], axis=0),
            rtol=1e-5, atol=1e-6,
        )


def test_encoder_fit_device_learns_and_shards(rng):
    """fit_device trains (loss decreases) and the mesh-sharded dataset
    path matches single-device within tolerance for the deterministic
    resnet transform."""
    from batch3dmot_tpu.parallel import make_mesh
    from batch3dmot_tpu.train.encoders import image_transform

    imgs = (rng.random((16, 32, 32, 3)) * 255).astype(np.uint8)
    labels = rng.integers(0, 7, (16,), dtype=np.int32)
    cfg = EncoderTrainConfig(batch_size=4, lr=1e-3)

    t1 = make_resnet_trainer(cfg)
    h1 = t1.fit_device(
        (imgs, labels), transform=image_transform(),
        val_dataset=(imgs[:8], labels[:8]), epochs=3, verbose=False,
    )
    assert h1[-1]["train/loss"] < h1[0]["train/loss"]
    assert np.isfinite(h1[-1]["val/loss"])

    mesh = make_mesh(2)
    t2 = make_resnet_trainer(cfg, mesh=mesh)
    h2 = t2.fit_device(
        (imgs, labels), transform=image_transform(), epochs=3,
        verbose=False,
    )
    assert h2[-1]["train/loss"] == pytest.approx(
        h1[-1]["train/loss"], rel=1e-4
    )
