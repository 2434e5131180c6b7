"""Sharded training tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from batch3dmot_tpu.config import GNNConfig, GraphConstructionConfig
from batch3dmot_tpu.data.synthetic import make_synthetic_scene
from batch3dmot_tpu.graphs import build_scene_graphs
from batch3dmot_tpu.models import PoseGNN
from batch3dmot_tpu.parallel import make_mesh, replicate, shard_batch_fn
from batch3dmot_tpu.train import GNNTrainer
from batch3dmot_tpu.train.data import GraphBatcher, to_padded

BUCKETS = ((64, 256),)


def _windows():
    gc = GraphConstructionConfig(top_knn_nodes=4)
    out = []
    for seed in range(2):
        scene = make_synthetic_scene(seed=seed, num_frames=8, num_tracks=5)
        out.extend(build_scene_graphs(scene, 3, gc))
    return out


def test_mesh_has_8_cpu_devices():
    mesh = make_mesh()
    assert mesh.size == 8


def test_sharded_train_step_matches_single_device():
    windows = _windows()
    example = to_padded(windows[0], *BUCKETS[0])
    cfg = GNNConfig(lr=1e-3, weight_decay=0.0, batch_size=8)

    batcher = GraphBatcher(windows, batch_size=8, buckets=BUCKETS, seed=0)
    batch = next(batcher.epoch(shuffle=False))

    # single-device trainer
    t1 = GNNTrainer(PoseGNN(depth=2), example, cfg, seed=0)
    s1, loss1, _ = t1._train_step(t1.state, batch)

    # sharded trainer with identical init
    mesh = make_mesh(8)
    t2 = GNNTrainer(
        PoseGNN(depth=2), example, cfg, seed=0, shard_batch=shard_batch_fn(mesh)
    )
    t2.state = t2.state.replace(params=replicate(t2.state.params, mesh))
    sharded_batch = shard_batch_fn(mesh)(batch)
    s2, loss2, _ = t2._train_step(t2.state, sharded_batch)

    assert float(loss1) == pytest.approx(float(loss2), rel=1e-5)
    p1 = jax.tree.leaves(s1.params)
    p2 = jax.tree.leaves(s2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_sharded_epoch_runs():
    windows = _windows()
    example = to_padded(windows[0], *BUCKETS[0])
    mesh = make_mesh(8)
    trainer = GNNTrainer(
        PoseGNN(depth=2),
        example,
        GNNConfig(lr=1e-3, batch_size=8),
        shard_batch=shard_batch_fn(mesh),
    )
    trainer.state = trainer.state.replace(
        params=replicate(trainer.state.params, mesh),
        opt_state=replicate(trainer.state.opt_state, mesh),
    )
    batcher = GraphBatcher(windows, batch_size=8, buckets=BUCKETS)
    metrics = trainer.train_epoch(batcher)
    assert np.isfinite(metrics["train/loss"])


def test_sharded_inference_matches_single_device():
    from batch3dmot_tpu.infer.predict import make_scorer, score_windows

    windows = _windows()
    example_windows = [w for w in windows if w.num_edges > 0][:8]
    import jax

    from batch3dmot_tpu.train.data import to_padded

    model = PoseGNN(depth=2)
    variables = model.init(
        jax.random.key(0), to_padded(example_windows[0], *BUCKETS[0])
    )

    plain = make_scorer(model, variables)
    s_plain = score_windows(plain, example_windows, windows_per_batch=8, buckets=BUCKETS)

    mesh = make_mesh(8)
    sharded = make_scorer(model, variables, mesh=mesh)
    s_shard = score_windows(sharded, example_windows, windows_per_batch=8, buckets=BUCKETS)

    for a, b in zip(s_plain, s_shard):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_fit_device_sharded_matches_single_device():
    """Device-resident dataset training with the dataset SHARDED along the
    window axis across the 8-device mesh must produce the same losses and
    parameters as the single-device path (same seed -> same batch
    composition; gathers ride the mesh, grads psum)."""
    from batch3dmot_tpu.train.data import materialize_graph_dataset

    windows = _windows()
    example = to_padded(windows[0], *BUCKETS[0])
    cfg = GNNConfig(lr=1e-3, weight_decay=0.0, batch_size=8)
    ds = materialize_graph_dataset(windows, buckets=BUCKETS)

    t1 = GNNTrainer(PoseGNN(depth=2), example, cfg, seed=0)
    h1 = t1.fit_device(ds, epochs=2, verbose=False, seed=3)
    t2 = GNNTrainer(PoseGNN(depth=2), example, cfg, seed=0, mesh=make_mesh(8))
    h2 = t2.fit_device(ds, epochs=2, verbose=False, seed=3)

    for m1, m2 in zip(h1, h2):
        assert m1["train/loss"] == pytest.approx(m2["train/loss"], rel=1e-4)
    for a, b in zip(
        jax.tree.leaves(t1.state.params), jax.tree.leaves(t2.state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_fit_device_dedup_sharded_matches_single_device():
    """The DEDUP encoded device-resident form on a mesh: det_index shards
    along the window axis with the graphs, the global embedding table
    replicates, and the double gather runs inside the data-parallel step —
    same losses and parameters as the single-device run."""
    from batch3dmot_tpu.models import MultimodalGNN
    from batch3dmot_tpu.train.encoded import (
        materialize_encoded_dataset_dedup,
        precompute_scene_encodings,
    )

    gc = GraphConstructionConfig(top_knn_nodes=4)
    scene = make_synthetic_scene(
        seed=2, num_frames=8, num_tracks=5, with_modalities=True,
        modality_dropout=0.3,
    )
    windows = [w for w in build_scene_graphs(scene, 3, gc) if w.num_edges > 0]
    example = to_padded(windows[0], *BUCKETS[0])
    cfg = GNNConfig(lr=1e-3, weight_decay=0.0, batch_size=8)
    model = MultimodalGNN(depth=2)

    t1 = GNNTrainer(model, example, cfg, seed=0)
    t2 = GNNTrainer(
        model, example, cfg, seed=0, mesh=make_mesh(8),
        init_variables=jax.tree.map(jax.numpy.array, t1.variables),
    )
    enc = precompute_scene_encodings(model, t1.variables, scene, chunk=64)
    ds = materialize_encoded_dataset_dedup(
        [(w, enc) for w in windows], buckets=BUCKETS
    )

    h1 = t1.fit_device(ds, epochs=2, verbose=False, seed=3)
    h2 = t2.fit_device(ds, epochs=2, verbose=False, seed=3)

    for m1, m2 in zip(h1, h2):
        assert m1["train/loss"] == pytest.approx(m2["train/loss"], rel=1e-4)
    for a, b in zip(
        jax.tree.leaves(t1.state.params), jax.tree.leaves(t2.state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )
