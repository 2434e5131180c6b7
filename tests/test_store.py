"""Tests for the .b3d graph store: python writer/reader + native C++ loader."""

import numpy as np
import pytest

from batch3dmot_tpu.config import GraphConstructionConfig
from batch3dmot_tpu.data.synthetic import make_synthetic_scene
from batch3dmot_tpu.graphs import build_scene_graphs
from batch3dmot_tpu.io import GraphStoreReader, load_scene_graphs, save_scene_graphs
from batch3dmot_tpu.io.native import (
    NativeGraphStore,
    batch_to_padded_graph,
    native_available,
)
from batch3dmot_tpu.train.data import to_padded


@pytest.fixture(scope="module")
def scene_windows():
    scene = make_synthetic_scene(
        seed=0, num_frames=7, num_tracks=5, with_modalities=True
    )
    windows = list(
        build_scene_graphs(scene, 3, GraphConstructionConfig(top_knn_nodes=4))
    )
    return scene, windows


def test_roundtrip_python_reader(tmp_path, scene_windows):
    scene, windows = scene_windows
    path = save_scene_graphs(windows, str(tmp_path), metadata=scene.metadata)
    loaded = load_scene_graphs(path)
    assert len(loaded) == len(windows)
    for a, b in zip(windows, loaded):
        assert a.window_start == b.window_start
        np.testing.assert_array_equal(a.edge_src, b.edge_src)
        np.testing.assert_array_equal(a.edge_dst, b.edge_dst)
        np.testing.assert_allclose(a.pose, b.pose, rtol=1e-6)
        np.testing.assert_allclose(a.edge_attr, b.edge_attr, rtol=1e-6)
        np.testing.assert_array_equal(a.edge_label, b.edge_label)
        np.testing.assert_allclose(a.img, b.img, rtol=1e-6)
        np.testing.assert_allclose(a.lidar, b.lidar, rtol=1e-6)
    assert (tmp_path / f"{scene.scene_token}_len3_metadata.json").exists()


def test_native_loader_matches_python(tmp_path, scene_windows):
    if not native_available():
        pytest.skip("native toolchain unavailable")
    scene, windows = scene_windows
    path = save_scene_graphs(windows, str(tmp_path))
    store = NativeGraphStore(path)
    assert store.num_windows == len(windows)
    n, e = store.window_sizes()
    assert n.tolist() == [w.num_nodes for w in windows]
    assert e.tolist() == [w.num_edges for w in windows]

    batch = store.fill_padded_batch([0, 1, -1], 64, 256)
    g = batch_to_padded_graph(batch)

    ref0 = to_padded(windows[0], 64, 256)
    np.testing.assert_allclose(np.asarray(g.pose[0]), np.asarray(ref0.pose), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(g.edge_src[0]), np.asarray(ref0.edge_src))
    np.testing.assert_array_equal(np.asarray(g.node_mask[0]), np.asarray(ref0.node_mask))
    np.testing.assert_array_equal(np.asarray(g.node_time[0]), np.asarray(ref0.node_time))
    np.testing.assert_allclose(np.asarray(g.img[0]), np.asarray(ref0.img), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g.edge_weight[1]),
        np.asarray(to_padded(windows[1], 64, 256).edge_weight),
        rtol=1e-6,
    )
    # empty slot: all masks off, node_time = -1
    assert not np.asarray(g.node_mask[2]).any()
    assert not np.asarray(g.edge_mask[2]).any()
    assert (np.asarray(g.node_time[2]) == -1).all()
    store.close()


def test_native_budget_check(tmp_path, scene_windows):
    if not native_available():
        pytest.skip("native toolchain unavailable")
    scene, windows = scene_windows
    path = save_scene_graphs(windows, str(tmp_path))
    store = NativeGraphStore(path)
    with pytest.raises(ValueError):
        store.fill_padded_batch([0], 2, 2)
    store.close()


def test_store_batcher_matches_memory_batcher(tmp_path, scene_windows):
    """StoreGraphBatcher batches must carry the same per-window content as
    the in-memory GraphBatcher."""
    if not native_available():
        pytest.skip("native toolchain unavailable")
    from batch3dmot_tpu.train.data import GraphBatcher
    from batch3dmot_tpu.train.store_data import StoreGraphBatcher

    scene, windows = scene_windows
    path = save_scene_graphs(windows, str(tmp_path))
    buckets = ((64, 256),)

    sb = StoreGraphBatcher([path], batch_size=2, buckets=buckets, seed=0)
    mb = GraphBatcher([w for w in windows if w.num_edges > 0], 2, buckets, seed=0)
    assert len(sb) == len(mb)

    def window_set(batcher):
        out = {}
        for batch in batcher.epoch(shuffle=False):
            pose = np.asarray(batch.pose)
            emask = np.asarray(batch.edge_mask)
            labels = np.asarray(batch.edge_label)
            nmask = np.asarray(batch.node_mask)
            for b in range(pose.shape[0]):
                n = int(nmask[b].sum())
                if n == 0:
                    continue
                key = round(float(pose[b][: n].sum()), 3)
                out[key] = (n, int(emask[b].sum()), round(float(labels[b].sum()), 3))
        return out

    assert window_set(sb) == window_set(mb)
    sb.close()


def test_store_batcher_training_step(tmp_path, scene_windows):
    if not native_available():
        pytest.skip("native toolchain unavailable")
    from batch3dmot_tpu.config import GNNConfig
    from batch3dmot_tpu.models import PoseGNN
    from batch3dmot_tpu.train import GNNTrainer
    from batch3dmot_tpu.train.store_data import StoreGraphBatcher

    scene, windows = scene_windows
    path = save_scene_graphs(windows, str(tmp_path))
    buckets = ((64, 256),)
    batcher = StoreGraphBatcher([path], batch_size=2, buckets=buckets)
    example = to_padded(windows[0], *buckets[0])
    trainer = GNNTrainer(PoseGNN(depth=2), example, GNNConfig(batch_size=2))
    metrics = trainer.train_epoch(batcher)
    assert np.isfinite(metrics["train/loss"])
    batcher.close()

def test_scene_from_store_ego_fields_roundtrip(tmp_path, scene_windows):
    """Store-reconstructed scenes must carry the REAL ego-frame pose from
    the metadata sidecar (round-2 VERDICT weak #6: zero-filled center_e was
    a silent-corruption trap), and stores predating the ego sidecar must be
    rejected, not zero-filled."""
    import json

    from batch3dmot_tpu.cli import _scene_from_store

    scene, windows = scene_windows
    path = save_scene_graphs(windows, str(tmp_path), metadata=scene.metadata)
    rebuilt = _scene_from_store(path, windows)
    np.testing.assert_allclose(rebuilt.center_e, scene.center_e, atol=1e-9)
    np.testing.assert_allclose(rebuilt.yaw_e, scene.yaw_e, atol=1e-9)
    np.testing.assert_allclose(rebuilt.vel_e, scene.vel_e, atol=1e-9)
    assert float(np.abs(rebuilt.center_e).sum()) > 0  # really non-zero

    # strip the ego entries -> the loader must refuse the stale sidecar
    meta_path = path.replace(".b3d", "_metadata.json")
    meta = json.load(open(meta_path))
    for md in meta:
        md.pop("ego")
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    with pytest.raises(SystemExit, match="ego-pose sidecar"):
        _scene_from_store(path, windows)


def test_store_preserves_uint8_images(tmp_path, scene_windows):
    """uint8 crops must survive the store roundtrip AS uint8 (4x smaller on
    disk and over the host->device relay — the round-4 upload-wall fix) and
    the native filler must produce a uint8 batch buffer."""
    scene, windows = scene_windows
    assert windows[0].img.dtype == np.uint8  # synthetic crops are uint8
    path = save_scene_graphs(windows, str(tmp_path))
    loaded = load_scene_graphs(path)
    assert loaded[0].img.dtype == np.uint8
    np.testing.assert_array_equal(loaded[0].img, windows[0].img)
    if native_available():
        store = NativeGraphStore(path)
        batch = store.fill_padded_batch([0, 1], 64, 256)
        assert batch["img"].dtype == np.uint8
        np.testing.assert_array_equal(
            batch["img"][0, : windows[0].num_nodes], windows[0].img
        )


def test_uint8_encode_matches_f32_div255():
    """ResNetAE.encode on uint8 input must match encode on the same data
    pre-divided by 255 on the host (the on-device conversion,
    models.encoders.image_input_f32). Not bit-exact: XLA lowers the
    in-graph /255 as multiply-by-reciprocal (1 ulp vs numpy's true
    division), so compare at a tight tolerance."""
    import jax
    import jax.numpy as jnp

    from batch3dmot_tpu.models.encoders import ResNetAE

    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    model = ResNetAE()
    variables = jax.jit(model.init)(jax.random.key(0), jnp.asarray(u8))
    enc = jax.jit(lambda v, x: model.apply(v, x, method=model.encode))
    a = np.asarray(enc(variables, jnp.asarray(u8)))
    b = np.asarray(enc(variables, jnp.asarray(u8.astype(np.float32) / 255.0)))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_save_scene_graphs_atomic_on_crash(tmp_path, scene_windows, monkeypatch):
    """A kill mid-write must leave NO final .b3d (and no .tmp litter), so
    `build-graphs --skip-existing` re-runs the scene instead of trusting a
    truncated store — the restartability contract (SURVEY.md §5). The
    writer stages under a tmp name and os.replace()s it as the commit."""
    import builtins

    import batch3dmot_tpu.io.store as store_mod

    real_open = builtins.open

    class Boom(RuntimeError):
        pass

    class ExplodingFile:
        def __init__(self, f):
            self._f = f
            self._writes = 0

        def write(self, data):
            self._writes += 1
            if self._writes >= 4:  # inside the blob loop
                raise Boom("simulated kill mid-write")
            return self._f.write(data)

        def __getattr__(self, name):
            return getattr(self._f, name)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return self._f.__exit__(*a)

    def exploding_open(path, mode="r", *a, **k):
        f = real_open(path, mode, *a, **k)
        if "b" in mode and "w" in mode and ".b3d.tmp." in str(path):
            return ExplodingFile(f)
        return f

    scene, windows = scene_windows
    monkeypatch.setattr(store_mod, "open", exploding_open, raising=False)
    with pytest.raises(Boom):
        save_scene_graphs(windows, str(tmp_path), metadata=scene.metadata)
    monkeypatch.undo()

    final = tmp_path / f"{scene.scene_token}_len3.b3d"
    assert not final.exists(), "truncated store committed to the final path"
    assert not list(tmp_path.glob("*.tmp.*")), "tmp litter left behind"

    # the retry (same process/dir, as --skip-existing does) must succeed
    path = save_scene_graphs(windows, str(tmp_path), metadata=scene.metadata)
    assert len(load_scene_graphs(path)) == len(windows)
