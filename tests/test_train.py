"""Training-loop tests: metrics goldens, loss decrease on synthetic data."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from batch3dmot_tpu.config import GNNConfig, GraphConstructionConfig
from batch3dmot_tpu.data.synthetic import make_synthetic_scene
from batch3dmot_tpu.graphs import build_scene_graphs
from batch3dmot_tpu.models import MultimodalGNN, PoseGNN
from batch3dmot_tpu.train import GNNTrainer, average_precision, masked_bce
from batch3dmot_tpu.train.data import GraphBatcher, to_padded
from batch3dmot_tpu.train.trainer import average_precision_np

BUCKETS = ((64, 256),)


def test_masked_bce_golden():
    s = jnp.array([0.9, 0.1, 0.5, 0.7])
    y = jnp.array([1.0, 0.0, 1.0, 0.0])
    m = jnp.array([True, True, True, False])
    got = masked_bce(s, y, m)
    want = -(np.log(0.9) + np.log(0.9) + np.log(0.5)) / 3
    assert float(got) == pytest.approx(want, rel=1e-5)


def test_masked_bce_logits_matches_probs():
    logits = jnp.array([2.0, -1.0, 0.3])
    y = jnp.array([1.0, 0.0, 1.0])
    m = jnp.ones(3, bool)
    a = masked_bce(jnp.asarray(1 / (1 + np.exp(-np.asarray(logits)))), y, m)
    b = masked_bce(logits, y, m, from_logits=True)
    assert float(a) == pytest.approx(float(b), rel=1e-5)


def test_masked_bce_weights():
    s = jnp.array([0.5, 0.5])
    y = jnp.array([1.0, 1.0])
    m = jnp.ones(2, bool)
    w = jnp.array([2.0, 0.0])
    assert float(masked_bce(s, y, m, w)) == pytest.approx(-np.log(0.5), rel=1e-5)


def test_average_precision_perfect_and_random():
    y = jnp.array([1.0, 1.0, 0.0, 0.0])
    s_perfect = jnp.array([0.9, 0.8, 0.2, 0.1])
    assert float(average_precision(s_perfect, y)) == pytest.approx(1.0)
    s_worst = jnp.array([0.1, 0.2, 0.8, 0.9])
    # positives at ranks 3,4 -> AP = (1/3 + 2/4)/2
    assert float(average_precision(s_worst, y)) == pytest.approx((1 / 3 + 0.5) / 2)


def test_average_precision_differential_vs_sklearn(rng):
    """average_precision_np stamps checkpoint names and gates model
    selection (round-3 VERDICT weak #6): pin it against sklearn's
    average_precision_score — the same grouped-threshold semantics as the
    reference's torchmetrics metric (train.py:143-155) — on random inputs,
    heavy ties, all-tied scores, and a single positive."""
    sklearn = pytest.importorskip("sklearn.metrics")

    cases = []
    for _ in range(5):
        n = 200
        cases.append(
            (rng.random(n).astype(np.float32), (rng.random(n) < 0.3))
        )
    # heavy ties: scores quantized to 4 levels
    q = (rng.integers(0, 4, 300) / 4.0).astype(np.float32)
    cases.append((q, rng.random(300) < 0.4))
    # all scores identical: AP must equal the positive rate, not the
    # per-position form's inflated value
    cases.append((np.full(50, 0.5, np.float32), rng.random(50) < 0.3))
    # single positive at a tied score
    one = np.zeros(10, bool)
    one[3] = True
    cases.append((np.full(10, 0.7, np.float32), one))

    for scores, labels in cases:
        labels = labels.astype(np.float32)
        if labels.sum() == 0:
            continue
        want = sklearn.average_precision_score(labels, scores)
        got_np = average_precision_np(scores, labels)
        assert got_np == pytest.approx(want, rel=1e-6), (scores[:5], want)
        got_dev = float(
            average_precision(jnp.array(scores), jnp.array(labels))
        )
        assert got_dev == pytest.approx(want, rel=1e-5)

    # masked device form: masked entries must not join any real tie group
    s = np.full(60, 0.5, np.float32)
    y = (rng.random(60) < 0.4).astype(np.float32)
    m = rng.random(60) > 0.3
    want = sklearn.average_precision_score(y[m], s[m])
    got = float(average_precision(jnp.array(s), jnp.array(y), jnp.array(m)))
    assert got == pytest.approx(want, rel=1e-5)


def test_average_precision_masked_matches_np(rng):
    s = rng.random(50).astype(np.float32)
    y = (rng.random(50) > 0.7).astype(np.float32)
    m = rng.random(50) > 0.3
    got = float(average_precision(jnp.array(s), jnp.array(y), jnp.array(m)))
    want = average_precision_np(s[m], y[m])
    assert got == pytest.approx(want, rel=1e-5)


def _windows(n_scenes=3, with_mods=False):
    cfg = GraphConstructionConfig(top_knn_nodes=4)
    out = []
    for seed in range(n_scenes):
        scene = make_synthetic_scene(
            seed=seed, num_frames=8, num_tracks=5, with_modalities=with_mods
        )
        out.extend(build_scene_graphs(scene, 3, cfg))
    return out


def test_pose_gnn_training_learns():
    windows = _windows()
    batcher = GraphBatcher(windows, batch_size=2, buckets=BUCKETS)
    example = to_padded(windows[0], *BUCKETS[0])
    cfg = GNNConfig(lr=1e-3, weight_decay=0.0, batch_size=2, loss="cb")
    trainer = GNNTrainer(PoseGNN(depth=2), example, cfg)
    hist = trainer.fit(batcher, epochs=8, verbose=False)
    first, last = hist[0], hist[-1]
    assert last["train/loss"] < first["train/loss"]
    assert last["train/avgprec"] > 0.7


def test_trainer_eval_and_checkpoint(tmp_path):
    windows = _windows(2)
    batcher = GraphBatcher(windows, batch_size=2, buckets=BUCKETS)
    example = to_padded(windows[0], *BUCKETS[0])
    trainer = GNNTrainer(PoseGNN(depth=2), example, GNNConfig(batch_size=2))
    hist = trainer.fit(
        batcher, val_batcher=batcher, epochs=1, log_dir=str(tmp_path), verbose=False
    )
    assert "val/avgprec" in hist[0]
    ckpts = list(tmp_path.glob("gnn_epoch0_*ValAP*.msgpack"))
    assert len(ckpts) == 1


@pytest.mark.slow
def test_multimodal_one_train_step():
    windows = _windows(1, with_mods=True)
    batcher = GraphBatcher(windows, batch_size=2, buckets=BUCKETS)
    example = to_padded(windows[0], *BUCKETS[0])
    cfg = GNNConfig(batch_size=2)
    trainer = GNNTrainer(MultimodalGNN(depth=2), example, cfg)
    batch = next(batcher.epoch())
    state0_step = int(trainer.state.step)
    trainer.state, loss, scores = trainer._train_step(trainer.state, batch)
    assert int(trainer.state.step) == state0_step + 1
    assert np.isfinite(float(loss))


def test_frozen_encoders_do_not_update():
    windows = _windows(1, with_mods=True)
    batcher = GraphBatcher(windows, batch_size=2, buckets=BUCKETS)
    example = to_padded(windows[0], *BUCKETS[0])
    trainer = GNNTrainer(MultimodalGNN(depth=2), example, GNNConfig(batch_size=2, lr=1e-2))
    before = np.asarray(
        trainer.state.params["resnet"]["stem"]["kernel"]
    ).copy()
    batch = next(batcher.epoch())
    trainer.state, _, _ = trainer._train_step(trainer.state, batch)
    after = np.asarray(trainer.state.params["resnet"]["stem"]["kernel"])
    np.testing.assert_array_equal(before, after)


@pytest.mark.slow
def test_encoded_training_matches_raw():
    """Precomputed-encoding training must produce the same loss and
    gradients step as the raw-modality path (frozen encoders = constants)."""
    import jax

    from batch3dmot_tpu.train.encoded import (
        EncodedGraphBatcher,
        precompute_scene_encodings,
    )

    gc = GraphConstructionConfig(top_knn_nodes=4)
    scene = make_synthetic_scene(
        seed=1, num_frames=6, num_tracks=5, with_modalities=True,
        modality_dropout=0.4,
    )
    windows = [w for w in build_scene_graphs(scene, 3, gc) if w.num_edges > 0]

    from batch3dmot_tpu.data.synthetic import make_synthetic_scene as _
    example = to_padded(windows[0], *BUCKETS[0])
    cfg = GNNConfig(lr=1e-3, weight_decay=0.0, batch_size=2)
    model = MultimodalGNN(depth=2)

    raw_trainer = GNNTrainer(model, example, cfg, seed=0)
    enc_trainer = GNNTrainer(model, example, cfg, seed=0)

    raw_batcher = GraphBatcher(windows, 2, BUCKETS, seed=0)
    enc = precompute_scene_encodings(model, raw_trainer.variables, scene, chunk=64)
    enc_batcher = EncodedGraphBatcher([(w, enc) for w in windows], 2, BUCKETS, seed=0)

    raw_batch = next(raw_batcher.epoch(shuffle=False))
    enc_batch = next(enc_batcher.epoch(shuffle=False))

    _, loss_raw, s_raw = raw_trainer._train_step(raw_trainer.state, raw_batch)
    _, loss_enc, s_enc = enc_trainer._train_step(enc_trainer.state, enc_batch)
    assert float(loss_raw) == pytest.approx(float(loss_enc), rel=1e-4)
    np.testing.assert_allclose(
        np.asarray(s_raw), np.asarray(s_enc), rtol=1e-4, atol=1e-5
    )


def test_encoded_training_learns():
    from batch3dmot_tpu.train.encoded import (
        EncodedGraphBatcher,
        precompute_scene_encodings,
    )

    gc = GraphConstructionConfig(top_knn_nodes=4)
    model = MultimodalGNN(depth=2)
    items = []
    example = None
    trainer = None
    for seed in range(2):
        scene = make_synthetic_scene(
            seed=seed, num_frames=6, num_tracks=5, with_modalities=True
        )
        windows = [w for w in build_scene_graphs(scene, 3, gc) if w.num_edges > 0]
        if example is None:
            example = to_padded(windows[0], *BUCKETS[0])
            trainer = GNNTrainer(
                model, example, GNNConfig(lr=1e-3, weight_decay=0.0, batch_size=2)
            )
        enc = precompute_scene_encodings(model, trainer.variables, scene, chunk=64)
        items.extend((w, enc) for w in windows)
    batcher = EncodedGraphBatcher(items, 2, BUCKETS)
    hist = trainer.fit(batcher, epochs=4, verbose=False)
    assert hist[-1]["train/loss"] < hist[0]["train/loss"]


def _streaming_fixture(tmp_path, n_scenes=3):
    """Scene stores on disk + scene objects for the streaming batcher."""
    from batch3dmot_tpu.io import save_scene_graphs

    gc = GraphConstructionConfig(top_knn_nodes=4)
    scenes, paths = [], []
    for seed in range(n_scenes):
        scene = make_synthetic_scene(
            seed=seed, num_frames=6, num_tracks=5, with_modalities=True,
            modality_dropout=0.3,
        )
        windows = list(build_scene_graphs(scene, 3, gc))
        save_scene_graphs(windows, str(tmp_path), metadata=scene.metadata)
        scenes.append(scene)
        paths.append(
            str(tmp_path / f"{scene.scene_token}_len3.b3d")
        )
    by_path = dict(zip(paths, scenes))
    return paths, lambda p: by_path[p]


def test_streaming_encoded_batcher_matches_in_ram(tmp_path):
    """The scene-streaming batcher must yield the same batch content as the
    in-RAM EncodedGraphBatcher (single scene, no shuffle), create on-disk
    encoding caches, and serve entirely from them on re-iteration."""
    import jax

    from batch3dmot_tpu.io import load_scene_graphs
    from batch3dmot_tpu.train import encoded as enc_mod
    from batch3dmot_tpu.train.encoded import (
        EncodedGraphBatcher,
        StreamingEncodedBatcher,
        precompute_scene_encodings,
    )

    paths, loader = _streaming_fixture(tmp_path, n_scenes=1)
    model = MultimodalGNN(depth=2)
    windows = [w for w in load_scene_graphs(paths[0]) if w.num_edges > 0]
    variables = jax.jit(model.init)(
        jax.random.key(0), to_padded(windows[0], *BUCKETS[0])
    )

    enc = precompute_scene_encodings(model, variables, loader(paths[0]), chunk=64)
    ram = EncodedGraphBatcher([(w, enc) for w in windows], 2, BUCKETS, seed=0)
    stream = StreamingEncodedBatcher(
        paths, model, variables, loader, 2, BUCKETS, seed=0
    )
    assert len(stream) == len(ram)
    for (g_r, e_r), (g_s, e_s) in zip(
        ram.epoch(shuffle=False), stream.epoch(shuffle=False)
    ):
        for a, b in zip(
            jax.tree.leaves((g_r, e_r)), jax.tree.leaves((g_s, e_s))
        ):
            # encodings computed at different chunk sizes (64 in-RAM here
            # vs the streaming default) differ by f32 padding-batch noise
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-3, atol=1e-5,
            )
    assert os.path.exists(paths[0] + ".enc.npz")

    # second epoch must be served from the cache: poison the encoder
    def boom(*a, **k):
        raise AssertionError("cache miss: re-encoded a cached scene")

    orig = enc_mod.precompute_scene_encodings
    enc_mod.precompute_scene_encodings = boom
    try:
        n = sum(1 for _ in stream.epoch())
    finally:
        enc_mod.precompute_scene_encodings = orig
    assert n == len(stream)


def test_streaming_encoded_batcher_covers_all_windows(tmp_path):
    """Every live window of every scene appears exactly once per epoch;
    __len__ matches the emitted batch count (multi-scene)."""
    import jax

    from batch3dmot_tpu.io import load_scene_graphs
    from batch3dmot_tpu.train.encoded import StreamingEncodedBatcher

    paths, loader = _streaming_fixture(tmp_path, n_scenes=3)
    model = MultimodalGNN(depth=2)
    first = [w for w in load_scene_graphs(paths[0]) if w.num_edges > 0][0]
    variables = jax.jit(model.init)(
        jax.random.key(0), to_padded(first, *BUCKETS[0])
    )
    stream = StreamingEncodedBatcher(
        paths, model, variables, loader, 2, BUCKETS, seed=1, uniform=True
    )
    want = sum(
        1
        for p in paths
        for w in load_scene_graphs(p)
        if w.num_nodes > 0 and w.num_edges > 0
    )
    got = 0
    batches = 0
    for g, _ in stream.epoch():
        batches += 1
        got += int(np.asarray(g.node_mask).any(axis=1).sum())
    # node_mask.any per slot counts real (non-empty-padding) windows
    assert got == want
    assert batches == len(stream)


def test_streaming_cache_invalidates_on_encoder_change(tmp_path):
    """A different encoder checkpoint must invalidate the on-disk encoding
    cache (digest mismatch -> re-encode)."""
    import jax

    from batch3dmot_tpu.io import load_scene_graphs
    from batch3dmot_tpu.train.encoded import scene_encodings_cached

    paths, loader = _streaming_fixture(tmp_path, n_scenes=1)
    model = MultimodalGNN(depth=2)
    first = [w for w in load_scene_graphs(paths[0]) if w.num_edges > 0][0]
    v1 = jax.jit(model.init)(jax.random.key(0), to_padded(first, *BUCKETS[0]))
    v2 = jax.jit(model.init)(jax.random.key(7), to_padded(first, *BUCKETS[0]))

    e1 = scene_encodings_cached(model, v1, paths[0], loader)
    e1_again = scene_encodings_cached(model, v1, paths[0], loader)
    np.testing.assert_array_equal(e1["x_img"], e1_again["x_img"])
    e2 = scene_encodings_cached(model, v2, paths[0], loader)
    assert not np.allclose(e1["x_img"], e2["x_img"])


def test_training_cache_rejects_stale_row_count(tmp_path, capsys):
    """A digest-matching cache whose row count disagrees with the store's
    metadata sidecar (the store was rebuilt in place at a different
    density) must be recomputed by the TRAINING path, not consumed — the
    dedup/streaming batchers would otherwise silently gather misaligned
    embedding rows. `expected_rows` defaults from the sidecar, so no
    caller has to remember to pass it."""
    import jax

    from batch3dmot_tpu.io import load_scene_graphs
    from batch3dmot_tpu.train.encoded import (
        ENC_KEYS,
        scene_encodings_cached,
    )

    paths, loader = _streaming_fixture(tmp_path, n_scenes=1)
    model = MultimodalGNN(depth=2)
    first = [w for w in load_scene_graphs(paths[0]) if w.num_edges > 0][0]
    v1 = jax.jit(model.init)(jax.random.key(0), to_padded(first, *BUCKETS[0]))

    e1 = scene_encodings_cached(model, v1, paths[0], loader)
    rows = len(e1["x_img"])
    assert rows > 1
    # shrink every per-detection row array in place: digest still matches,
    # rows no longer agree with the sidecar
    cache_path = f"{paths[0]}.enc.npz"
    with np.load(cache_path, allow_pickle=False) as z:
        full = {k: z[k] for k in z.files}
    np.savez(cache_path, **{
        k: (v[:-1] if k in ENC_KEYS else v) for k, v in full.items()
    })
    capsys.readouterr()
    e_again = scene_encodings_cached(model, v1, paths[0], loader)
    assert "ignoring stale embedding cache" in capsys.readouterr().out
    assert len(e_again["x_img"]) == rows
    np.testing.assert_array_equal(e_again["x_img"], e1["x_img"])
    # and the recompute rewrote a VALID cache
    with np.load(cache_path, allow_pickle=False) as z:
        assert len(z["x_img"]) == rows


def test_fused_multi_step_matches_sequential():
    """K scanned optimizer steps must equal K sequential steps exactly."""
    import jax
    import jax.numpy as jnp

    windows = _windows(2)
    batcher = GraphBatcher(windows, batch_size=2, buckets=BUCKETS, seed=0)
    batches = list(batcher.epoch(shuffle=False))[:3]
    example = to_padded(windows[0], *BUCKETS[0])
    cfg = GNNConfig(lr=1e-3, weight_decay=1e-4, batch_size=2)

    t_seq = GNNTrainer(PoseGNN(depth=2), example, cfg, seed=0)
    seq_losses = []
    for b in batches:
        t_seq.state, loss, _ = t_seq._train_step(t_seq.state, b)
        seq_losses.append(float(loss))

    t_fused = GNNTrainer(PoseGNN(depth=2), example, cfg, seed=0)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    t_fused.state, losses, _ = t_fused._multi_step(t_fused.state, stacked)

    np.testing.assert_allclose(np.asarray(losses), seq_losses, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(t_seq.state.params), jax.tree.leaves(t_fused.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
    assert int(t_fused.state.step) == 3


def test_train_epoch_fused_runs():
    windows = _windows(2)
    batcher = GraphBatcher(windows, batch_size=2, buckets=BUCKETS, seed=0)
    example = to_padded(windows[0], *BUCKETS[0])
    trainer = GNNTrainer(PoseGNN(depth=2), example, GNNConfig(lr=1e-3, batch_size=2))
    m = trainer.train_epoch(batcher, fused_steps=4)
    assert np.isfinite(m["train/loss"])


def test_uniform_bucketing_single_shape():
    """uniform=True funnels every window into ONE bucket (the smallest
    default bucket fitting the dataset max) so the K-step fused scan can
    group all batches; per-window bucketing stays available for inference."""
    from batch3dmot_tpu.graph import DEFAULT_BUCKETS
    from batch3dmot_tpu.train.data import uniform_bucket

    cfg = GraphConstructionConfig(top_knn_nodes=6)
    scene = make_synthetic_scene(seed=3, num_frames=8, num_tracks=6)
    windows = [w for w in build_scene_graphs(scene, 3, cfg) if w.num_edges > 0]

    multi = GraphBatcher(windows, batch_size=4)
    uni = GraphBatcher(windows, batch_size=4, uniform=True)
    assert len(uni.by_bucket) == 1
    (bucket,) = uni.by_bucket
    assert bucket == uniform_bucket(
        [(w.num_nodes, w.num_edges) for w in windows], DEFAULT_BUCKETS
    )[0]
    assert sum(len(v) for v in multi.by_bucket.values()) == sum(
        len(v) for v in uni.by_bucket.values()
    )
    # every batch a uniform epoch yields has the same padded shape
    shapes = {b.pose.shape for b in uni.epoch(shuffle=False)}
    assert len(shapes) == 1


def test_uniform_bucket_outlier_guard():
    """One dense outlier window must NOT drag the whole epoch into a
    many-times-larger bucket — uniform_bucket falls back to per-window
    bucketing when the uniform choice exceeds max_waste x the median
    window's own bucket area."""
    from batch3dmot_tpu.graph import DEFAULT_BUCKETS
    from batch3dmot_tpu.train.data import uniform_bucket

    homogeneous = [(30, 120)] * 20
    assert uniform_bucket(homogeneous, DEFAULT_BUCKETS) == ((64, 256),)
    with_outlier = homogeneous + [(500, 16000)]
    assert uniform_bucket(with_outlier, DEFAULT_BUCKETS) == tuple(DEFAULT_BUCKETS)


def test_fused_dispatch_encoded_form_gates_big_buckets(monkeypatch):
    """The trainer admits the 2M-product bucket to the fused kernels ONLY
    on the precomputed-encoding batch form (full-modality batches fall
    back to XLA there — hardware arbiter, docs/RESULTS.md). Wiring test:
    the guard must receive encoded=True exactly for tuple batches."""
    import jax

    from batch3dmot_tpu.ops import pallas_mp_train

    gc = GraphConstructionConfig(top_knn_nodes=4)
    scene = make_synthetic_scene(
        seed=1, num_frames=6, num_tracks=5, with_modalities=True,
    )
    windows = [w for w in build_scene_graphs(scene, 3, gc) if w.num_edges > 0]
    example = to_padded(windows[0], *BUCKETS[0])
    model = MultimodalGNN(depth=2)
    tr = GNNTrainer(model, example, GNNConfig(batch_size=1), fused=True)

    seen = []
    real_supported = pallas_mp_train.fused_train_supported

    def spy_supported(mn, me, encoded=False):
        seen.append((mn, me, encoded))
        return real_supported(mn, me, encoded)

    calls = []

    def fake_scores(model_, extra, params, graph, encodings=None, **kw):
        calls.append(encodings is not None)
        b, e = graph.edge_src.shape
        return jnp.zeros((b, e), jnp.float32)

    monkeypatch.setattr(
        pallas_mp_train, "fused_train_supported", spy_supported
    )
    monkeypatch.setattr(
        pallas_mp_train, "fused_training_scores", fake_scores
    )

    big = to_padded(windows[0], 512, 4096)
    batch = jax.tree.map(lambda x: x[None], big)
    enc = (
        jnp.zeros((1, 512, 96)), jnp.zeros((1, 512, 256)),
        jnp.zeros((1, 512, 256)), jnp.ones((1, 512), bool),
        jnp.ones((1, 512), bool),
    )

    # encoded (tuple) batch at the 2M bucket -> fused path, encoded=True
    scores = tr._apply(tr.state.params, tr.state.extra_variables, (batch, enc))
    assert seen[-1] == (512, 4096, True)
    assert calls and calls[-1] is True
    assert scores.shape == (1, 4096)

    # full-modality batch at the same bucket -> guard sees encoded=False
    # (and falls back to XLA: fake_scores is NOT called again)
    n_calls = len(calls)
    tr._apply(tr.state.params, tr.state.extra_variables, batch)
    assert seen[-1] == (512, 4096, False)
    assert len(calls) == n_calls


def test_fit_device_matches_host_steps():
    """Device-resident dataset training (one scanned program per epoch,
    batches gathered on device) must produce the same parameters, losses
    and metrics as stepping the same batch composition through the normal
    host-batched path — including a remainder batch padded with the
    fully-masked empty slot."""
    import jax

    from batch3dmot_tpu.train.encoded import (
        materialize_encoded_dataset,
        precompute_scene_encodings,
    )

    gc = GraphConstructionConfig(top_knn_nodes=4)
    scene = make_synthetic_scene(
        seed=3, num_frames=7, num_tracks=5, with_modalities=True,
        modality_dropout=0.3,
    )
    windows = [w for w in build_scene_graphs(scene, 3, gc) if w.num_edges > 0]
    assert len(windows) % 2 == 1, "want a remainder batch"
    example = to_padded(windows[0], *BUCKETS[0])
    cfg = GNNConfig(lr=1e-3, weight_decay=0.0, batch_size=2)
    model = MultimodalGNN(depth=2)

    tr_dev = GNNTrainer(model, example, cfg, seed=0)
    # independent buffer copy: both paths donate their state, and shared
    # leaves would be deleted by whichever runs first
    tr_host = GNNTrainer(
        model, example, cfg, seed=0,
        init_variables=jax.tree.map(jnp.array, tr_dev.variables),
    )

    enc = precompute_scene_encodings(model, tr_dev.variables, scene, chunk=64)
    items = [(w, enc) for w in windows]
    ds = materialize_encoded_dataset(items, buckets=BUCKETS)
    graphs_np, enc_np, bucket = ds
    assert bucket == BUCKETS[0]
    n_items = graphs_np.pose.shape[0] - 1
    assert n_items == len(windows)

    hist = tr_dev.fit_device(ds, epochs=1, verbose=False, seed=7)

    # replicate the device path's batch composition on the host path
    import numpy as np2

    rng = np2.random.default_rng(7)
    order = rng.permutation(n_items)
    B = cfg.batch_size
    n_steps = -(-n_items // B)
    idx = np2.concatenate(
        [order, np2.full(n_steps * B - n_items, n_items, np2.int64)]
    ).reshape(n_steps, B).astype(np2.int32)
    losses = []
    for k in range(n_steps):
        batch = jax.tree.map(lambda a: jnp.asarray(a[idx[k]]), graphs_np)
        eb = tuple(jnp.asarray(a[idx[k]]) for a in enc_np)
        tr_host.state, loss, _ = tr_host._train_step(
            tr_host.state, (batch, eb)
        )
        losses.append(float(loss))

    assert hist[0]["train/loss"] == pytest.approx(
        float(np.mean(losses)), rel=1e-5
    )
    for (kp, a), (_, b) in zip(
        jax.tree.leaves_with_path(tr_dev.state.params),
        jax.tree.leaves_with_path(tr_host.state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(kp),
        )


def test_fit_device_dedup_matches_dense():
    """DedupEncodings device-resident training (ONE global per-detection
    embedding table, gathered on device inside the scanned epoch) must
    produce the same losses, metrics and parameters as the dense
    per-window-buffer form — the double gather returns exactly the rows
    the dense materializer pre-gathered on host — while storing the
    encodings in strictly fewer bytes (windows overlap, so the dense form
    duplicates each detection's embedding ~L times plus node padding)."""
    import jax

    from batch3dmot_tpu.train.encoded import (
        DedupEncodings,
        materialize_encoded_dataset,
        materialize_encoded_dataset_dedup,
        precompute_scene_encodings,
    )

    gc = GraphConstructionConfig(top_knn_nodes=4)
    scenes = [
        make_synthetic_scene(
            seed=s, num_frames=6, num_tracks=5, with_modalities=True,
            modality_dropout=0.3,
        )
        for s in (3, 4)
    ]
    windows_by_scene = [
        [w for w in build_scene_graphs(s, 3, gc) if w.num_edges > 0]
        for s in scenes
    ]
    example = to_padded(windows_by_scene[0][0], *BUCKETS[0])
    cfg = GNNConfig(lr=1e-3, weight_decay=0.0, batch_size=2)
    model = MultimodalGNN(depth=2)
    tr_dense = GNNTrainer(model, example, cfg, seed=0)
    tr_dedup = GNNTrainer(
        model, example, cfg, seed=0,
        init_variables=jax.tree.map(jnp.array, tr_dense.variables),
    )

    items = []
    for s, ws in zip(scenes, windows_by_scene):
        enc = precompute_scene_encodings(model, tr_dense.variables, s, chunk=64)
        items.extend((w, enc) for w in ws)

    dense = materialize_encoded_dataset(items, buckets=BUCKETS)
    dedup = materialize_encoded_dataset_dedup(items, buckets=BUCKETS)
    assert isinstance(dedup[1], DedupEncodings)
    assert dedup[2] == dense[2]
    dense_bytes = sum(a.nbytes for a in dense[1])
    dedup_bytes = dedup[1].det_index.nbytes + sum(
        a.nbytes for a in dedup[1].table
    )
    assert dedup_bytes < dense_bytes

    h1 = tr_dense.fit_device(dense, epochs=2, verbose=False, seed=7)
    h2 = tr_dedup.fit_device(dedup, epochs=2, verbose=False, seed=7)
    for m1, m2 in zip(h1, h2):
        assert m1["train/loss"] == pytest.approx(m2["train/loss"], rel=1e-6)
        assert m1["train/avgprec"] == pytest.approx(
            m2["train/avgprec"], rel=1e-6
        )
    for (kp, a), (_, b) in zip(
        jax.tree.leaves_with_path(tr_dense.state.params),
        jax.tree.leaves_with_path(tr_dedup.state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7,
            err_msg=jax.tree_util.keystr(kp),
        )


def test_materialize_dedup_groups_share_one_table():
    """The plural dedup materializer must hand every per-bucket group the
    SAME table object (so the trainer uploads it once), and fit_device
    must train on the multi-group dedup form."""
    from batch3dmot_tpu.train.encoded import (
        materialize_encoded_datasets_dedup,
        precompute_scene_encodings,
    )

    model = MultimodalGNN(depth=2)
    small_scene = make_synthetic_scene(
        seed=0, num_frames=6, num_tracks=4, with_modalities=True
    )
    dense_scene = make_synthetic_scene(
        seed=1, num_frames=5, num_tracks=40, fp_per_frame=5.0,
        with_modalities=True,
    )
    gc_small = GraphConstructionConfig(top_knn_nodes=4)
    gc_dense = GraphConstructionConfig(top_knn_nodes=10)
    small = [
        w for w in build_scene_graphs(small_scene, 3, gc_small)
        if w.num_edges > 0
    ]
    dense = [
        w for w in build_scene_graphs(dense_scene, 3, gc_dense)
        if w.num_edges > 0
    ]
    buckets = ((32, 128), (64, 512), (256, 2048))

    example = to_padded(small[0], 64, 512)
    cfg = GNNConfig(lr=1e-3, weight_decay=0.0, batch_size=2)
    tr = GNNTrainer(model, example, cfg, seed=0)

    items = []
    for scene, ws in ((small_scene, small), (dense_scene, dense)):
        enc = precompute_scene_encodings(model, tr.variables, scene, chunk=64)
        items.extend((w, enc) for w in ws)
    ds = materialize_encoded_datasets_dedup(items, buckets=buckets)
    assert len(ds) > 1
    tables = {id(g[1].table) for g in ds}
    assert len(tables) == 1
    assert sum(g[0].pose.shape[0] - 1 for g in ds) == len(items)

    hist = tr.fit_device(ds, epochs=1, verbose=False, seed=5)
    assert np.isfinite(hist[0]["train/loss"])


def test_single_bucket_for_outlier_fallback():
    """Device-resident datasets need ONE bucket: when uniform_bucket's
    outlier guard returns the multi-bucket fallback (a crowded trainval
    scene), single_bucket_for pads to the densest window's bucket instead
    of crashing the single-shape consumer."""
    from batch3dmot_tpu.train.data import single_bucket_for, uniform_bucket

    sizes = [(10, 20)] * 50 + [(500, 4000)]
    assert len(uniform_bucket(sizes)) != 1  # the outlier guard trips
    mn, me = single_bucket_for(sizes)
    assert mn >= 500 and me >= 4000


def test_fit_device_multi_bucket_groups():
    """When window sizes span buckets (uniform_bucket's outlier guard),
    the plural materializers split into per-bucket groups and fit_device
    runs one scanned program per group per epoch — instead of padding
    every step to the densest window's bucket."""
    import jax

    from batch3dmot_tpu.train.data import (
        group_sizes_by_bucket,
        materialize_graph_datasets,
    )

    gc = GraphConstructionConfig(top_knn_nodes=4)
    small = [
        w
        for w in build_scene_graphs(
            make_synthetic_scene(seed=0, num_frames=8, num_tracks=4), 3, gc
        )
        if w.num_edges > 0
    ]
    dense = [
        w
        for w in build_scene_graphs(
            make_synthetic_scene(
                seed=1, num_frames=6, num_tracks=40, fp_per_frame=5.0
            ),
            3,
            GraphConstructionConfig(top_knn_nodes=10),
        )
        if w.num_edges > 0
    ]
    windows = small + dense
    sizes = [(w.num_nodes, w.num_edges) for w in windows]
    buckets = ((32, 128), (64, 512), (256, 2048))
    groups = group_sizes_by_bucket(sizes, buckets)
    assert len(groups) > 1, groups

    ds = materialize_graph_datasets(windows, buckets=buckets)
    assert len(ds) == len(groups)
    assert sum(g[0].pose.shape[0] - 1 for g in ds) == len(windows)

    example = to_padded(small[0], 32, 128)
    cfg = GNNConfig(lr=1e-3, weight_decay=0.0, batch_size=2)
    tr = GNNTrainer(PoseGNN(depth=2), example, cfg, seed=0)
    hist = tr.fit_device(ds, epochs=3, verbose=False, seed=1)
    assert all(np.isfinite(m["train/loss"]) for m in hist)
    assert hist[-1]["train/loss"] < hist[0]["train/loss"]


def test_fit_device_val_dataset_matches_eval_epoch():
    """Device-resident validation (one scanned eval program over fixed
    sequential batch rows per epoch) must report the same val metrics as
    ``eval_epoch`` on an unshuffled uniform host batcher — same batch
    composition: sequential order, remainder padded with the empty slot."""
    from batch3dmot_tpu.train.data import materialize_graph_datasets

    gc = GraphConstructionConfig(top_knn_nodes=4)
    train_w = [
        w
        for w in build_scene_graphs(
            make_synthetic_scene(seed=0, num_frames=8, num_tracks=4), 3, gc
        )
        if w.num_edges > 0
    ]
    val_w = [
        w
        for w in build_scene_graphs(
            make_synthetic_scene(seed=5, num_frames=7, num_tracks=4), 3, gc
        )
        if w.num_edges > 0
    ]
    if len(val_w) % 2 == 0:
        val_w = val_w[:-1]  # force a remainder batch at batch_size=2
    example = to_padded(train_w[0], *BUCKETS[0])
    cfg = GNNConfig(lr=1e-3, weight_decay=0.0, batch_size=2)
    tr = GNNTrainer(PoseGNN(depth=2), example, cfg, seed=0)

    hist = tr.fit_device(
        materialize_graph_datasets(train_w, buckets=BUCKETS),
        epochs=2,
        val_dataset=materialize_graph_datasets(val_w, buckets=BUCKETS),
        verbose=False,
        seed=1,
    )
    assert all(np.isfinite(m["val/loss"]) for m in hist)

    # the final state's host eval on the same composition must agree
    batcher = GraphBatcher(
        val_w, batch_size=2, buckets=BUCKETS, uniform=True
    )
    m = tr.eval_epoch(batcher)
    assert hist[-1]["val/loss"] == pytest.approx(m["val/loss"], rel=1e-4)
    assert hist[-1]["val/avgprec"] == pytest.approx(
        m["val/avgprec"], rel=1e-3
    )


def test_device_batch_metrics_match_host():
    """The scanned device epochs compute diagnostics IN-GRAPH
    (``_device_batch_metrics``: overall + per-class tie-corrected AP,
    sigmoid deliberately skipped as rank-preserving). Pin them per-batch
    against the host ``_batch_metrics`` numbers for identical scores —
    same AP values, same set of per-class entries, and NaN for a class
    that has masked edges but no positive labels."""
    from collections import defaultdict

    import jax

    from batch3dmot_tpu.config import TRACKING_CLASSES

    windows = _windows()
    batcher = GraphBatcher(windows, batch_size=3, buckets=BUCKETS)
    example = to_padded(windows[0], *BUCKETS[0])
    tr = GNNTrainer(PoseGNN(depth=2), example, GNNConfig(batch_size=3))
    assert tr.from_logits  # host path sigmoids; device path must not need to
    batch = next(iter(batcher.epoch(shuffle=False)))

    # force one class with edges but zero positives -> NaN AP on both paths
    edge_class = np.take_along_axis(
        np.asarray(batch.node_class), np.asarray(batch.edge_src), axis=-1
    )
    masked_counts = {
        c: int((np.asarray(batch.edge_mask) & (edge_class == i)).sum())
        for c, i in TRACKING_CLASSES.items()
    }
    nan_cls = max(masked_counts, key=masked_counts.get)
    labels = np.asarray(batch.edge_label).copy()
    labels[edge_class == TRACKING_CLASSES[nan_cls]] = 0.0
    import dataclasses

    batch = dataclasses.replace(batch, edge_label=jnp.asarray(labels))

    rng = np.random.default_rng(0)
    # quantized logits -> heavy tie groups (the semantics AP must honor)
    logits = np.round(
        rng.normal(size=np.asarray(batch.edge_mask).shape) * 2, 1
    ).astype(np.float32)

    host = defaultdict(list)
    tr._batch_metrics(host, "m", 0.0, logits, batch)
    ap_all, ap_cls, present = jax.jit(tr._device_batch_metrics)(
        jnp.asarray(logits), batch
    )
    ap_all, ap_cls, present = map(np.asarray, (ap_all, ap_cls, present))

    assert float(ap_all) == pytest.approx(host["m/avgprec"][0], rel=1e-4)
    for i, cname in enumerate(TRACKING_CLASSES):
        key = f"m/avgprec/{cname}"
        assert bool(present[i]) == (key in host), cname
        if not present[i]:
            continue
        h = host[key][0]
        if np.isnan(h):
            assert np.isnan(ap_cls[i]), cname
        else:
            assert float(ap_cls[i]) == pytest.approx(h, rel=1e-4), cname
    assert np.isnan(host[f"m/avgprec/{nan_cls}"][0])


def test_average_precision_multi_matches_per_row(rng):
    """average_precision_multi (one shared sort) must equal the per-row
    average_precision for every selection row — random scores with heavy
    tie groups, overlapping selections, an empty row, and a positive-free
    row (NaN)."""
    from batch3dmot_tpu.train.metrics import average_precision_multi

    for trial in range(5):
        n = 257
        scores = np.round(rng.random(n).astype(np.float32), 1)  # ties
        labels = (rng.random(n) < 0.4).astype(np.float32)
        sels = rng.random((6, n)) < rng.random((6, 1))
        sels[3] = False  # empty selection
        sels[4] = labels == 0.0  # edges but no positives -> NaN
        got = np.asarray(
            average_precision_multi(
                jnp.asarray(scores), jnp.asarray(labels), jnp.asarray(sels)
            )
        )
        for c in range(6):
            want = float(
                average_precision(
                    jnp.asarray(scores), jnp.asarray(labels),
                    jnp.asarray(sels[c]),
                )
            )
            if np.isnan(want):
                assert np.isnan(got[c]), (trial, c)
            else:
                assert got[c] == pytest.approx(want, rel=1e-5), (trial, c)
