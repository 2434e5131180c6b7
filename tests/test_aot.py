"""AOT export cache (infer/aot.py): round-trip equality, artifact reuse
across processes AND across retrained checkpoints (weights are program
inputs, keyed by the params shape tree)."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from batch3dmot_tpu.data.synthetic import make_synthetic_scene
from batch3dmot_tpu.graph import pad_graph
from batch3dmot_tpu.infer.aot import cached_jit, pytree_digest
from batch3dmot_tpu.infer.device_pipeline import DeviceScenePipeline
from batch3dmot_tpu.models import MultimodalGNN


def test_cached_jit_roundtrip(tmp_path):
    def fn(a, b):
        return jnp.dot(a, b) + 1.0

    x = jnp.ones((8, 16))
    y = jnp.ones((16, 8))
    direct = np.asarray(jax.jit(fn)(x, y))

    f1 = cached_jit(fn, "t", "k1", str(tmp_path), (x, y))
    np.testing.assert_allclose(np.asarray(f1(x, y)), direct)
    arts = glob.glob(os.path.join(tmp_path, "*.jaxexport"))
    assert len(arts) == 1

    # second construction deserializes the artifact instead of re-exporting
    before = os.path.getmtime(arts[0])
    f2 = cached_jit(fn, "t", "k1", str(tmp_path), (x, y))
    np.testing.assert_allclose(np.asarray(f2(x, y)), direct)
    assert os.path.getmtime(arts[0]) == before

    # a different key gets its own artifact
    cached_jit(fn, "t", "k2", str(tmp_path), (x, y))
    assert len(glob.glob(os.path.join(tmp_path, "*.jaxexport"))) == 2


def _mm_pipeline(seed, tmp_path):
    model = MultimodalGNN(depth=2)
    g = pad_graph(
        pose=np.zeros((4, 19), np.float32),
        edge_src=np.zeros(4, np.int32), edge_dst=np.zeros(4, np.int32),
        edge_attr=np.zeros((4, 4), np.float32),
        node_time=np.zeros(4, np.int32), node_class=np.ones(4, np.int32),
        max_nodes=8, max_edges=16,
        img=np.zeros((4, 32, 32, 3), np.float32),
        lidar=np.zeros((4, 128, 3), np.float32),
        radar=np.zeros((4, 64, 4), np.float32),
    )
    variables = jax.jit(model.init)(jax.random.key(seed), g)
    return DeviceScenePipeline(
        model, variables, window_len=3, k=4, fused=False,
        aot_dir=str(tmp_path),
    )


def test_device_pipeline_aot_matches_and_keys_on_weights(tmp_path):
    scene = make_synthetic_scene(
        seed=7, num_frames=5, num_tracks=4, with_modalities=True
    )
    p1 = _mm_pipeline(0, tmp_path)
    scores_aot = p1.score_scene(scene)
    arts = glob.glob(os.path.join(tmp_path, "*.jaxexport"))
    assert len(arts) == 1

    # plain pipeline, same weights: identical scores
    plain = DeviceScenePipeline(
        p1.model, p1.variables, window_len=3, k=4, fused=False
    )
    scores_plain = plain.score_scene(scene)
    assert set(scores_aot) == set(scores_plain)
    for key in scores_aot:
        assert abs(scores_aot[key] - scores_plain[key]) < 1e-6

    # a fresh process with the same weights deserializes (no new artifact)
    p2 = _mm_pipeline(0, tmp_path)
    p2.score_scene(scene)
    assert len(glob.glob(os.path.join(tmp_path, "*.jaxexport"))) == 1

    # weights are program INPUTS (never baked constants), so a RETRAINED
    # checkpoint of the same architecture reuses the artifact — and must
    # score with the NEW weights, not stale ones
    p3 = _mm_pipeline(1, tmp_path)
    scores_new = p3.score_scene(scene)
    assert len(glob.glob(os.path.join(tmp_path, "*.jaxexport"))) == 1
    plain_new = DeviceScenePipeline(
        p3.model, p3.variables, window_len=3, k=4, fused=False
    ).score_scene(scene)
    assert set(scores_new) == set(plain_new)
    for key in scores_new:
        assert abs(scores_new[key] - plain_new[key]) < 1e-6
    # different weights really do flow through the cached program
    assert any(
        abs(scores_new[k] - scores_aot[k]) > 1e-7 for k in scores_new
    )


def test_pytree_digest_changes_with_content():
    a = {"w": jnp.ones((3, 3))}
    b = {"w": jnp.ones((3, 3)) * 2}
    assert pytree_digest(a) != pytree_digest(b)
    assert pytree_digest(a) == pytree_digest({"w": jnp.ones((3, 3))})


def test_pytree_digest_host_device_identical():
    """The single-fetch packed path (device leaves) must produce the SAME
    digest as the host tobytes path (numpy leaves): caches written by one
    residency must validate under the other, and digests from before the
    round-5 pack change must stay valid."""
    import hashlib

    import numpy as np

    rng = np.random.default_rng(7)
    host = {
        "f32": rng.standard_normal((5, 3)).astype(np.float32),
        "scalar": np.float32(1.5),
        "i32": rng.integers(-9, 9, (4,), dtype=np.int32),
        "b": np.array([True, False, True]),
        "u8": rng.integers(0, 255, (6,), dtype=np.uint8),
        "f16": rng.standard_normal((3, 2)).astype(np.float16),
    }
    dev = jax.tree.map(jnp.asarray, host)
    d_host = pytree_digest(host)
    assert pytree_digest(dev) == d_host
    # and both equal the original (pre-pack) formula, byte for byte
    h = hashlib.sha1()
    for leaf in jax.tree.leaves(host):
        arr = np.asarray(leaf)
        h.update(str(arr.shape).encode())
        h.update(str(arr.dtype).encode())
        h.update(arr.tobytes())
    assert d_host == h.hexdigest()[:16]
