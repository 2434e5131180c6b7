"""Tests for segment reductions and masked kNN ops (numpy goldens)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from batch3dmot_tpu.ops import (
    knn_graph_masked,
    pairwise_sq_dists,
    segment_max,
    segment_mean,
    segment_softmax,
    segment_sum,
)


def np_segment_sum(data, ids, n, mask=None):
    out = np.zeros((n,) + data.shape[1:], dtype=np.float64)
    for e in range(len(ids)):
        if mask is None or mask[e]:
            out[ids[e]] += data[e]
    return out


@pytest.mark.parametrize("method", ["onehot", "xla_scatter"])
def test_segment_sum_matches_numpy(rng, method):
    e, n, dim = 100, 17, 8
    data = rng.normal(size=(e, dim)).astype(np.float32)
    ids = rng.integers(0, n, size=e)
    out = segment_sum(jnp.array(data), jnp.array(ids), n, method=method)
    np.testing.assert_allclose(out, np_segment_sum(data, ids, n), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("method", ["onehot", "xla_scatter"])
def test_segment_sum_masked(rng, method):
    e, n, dim = 64, 9, 4
    data = rng.normal(size=(e, dim)).astype(np.float32)
    ids = rng.integers(0, n, size=e)
    mask = rng.random(e) > 0.3
    out = segment_sum(jnp.array(data), jnp.array(ids), n, jnp.array(mask), method)
    np.testing.assert_allclose(out, np_segment_sum(data, ids, n, mask), rtol=1e-5, atol=1e-5)


def test_segment_sum_1d(rng):
    e, n = 50, 7
    data = rng.normal(size=e).astype(np.float32)
    ids = rng.integers(0, n, size=e)
    out = segment_sum(jnp.array(data), jnp.array(ids), n)
    assert out.shape == (n,)
    np.testing.assert_allclose(out, np_segment_sum(data[:, None], ids, n)[:, 0], rtol=1e-5, atol=1e-5)


def test_segment_sum_under_vmap(rng):
    b, e, n, dim = 3, 40, 8, 5
    data = rng.normal(size=(b, e, dim)).astype(np.float32)
    ids = rng.integers(0, n, size=(b, e))
    out = jax.vmap(lambda d, i: segment_sum(d, i, n))(jnp.array(data), jnp.array(ids))
    for i in range(b):
        np.testing.assert_allclose(out[i], np_segment_sum(data[i], ids[i], n), rtol=1e-5, atol=1e-5)


def test_segment_max(rng):
    e, n = 60, 6
    data = rng.normal(size=(e, 3)).astype(np.float32)
    ids = rng.integers(0, n - 1, size=e)  # leave segment n-1 empty
    out = segment_max(jnp.array(data), jnp.array(ids), n, initial=0.0)
    golden = np.full((n, 3), 0.0)
    for s in range(n):
        sel = data[ids == s]
        if len(sel):
            golden[s] = sel.max(axis=0)
    np.testing.assert_allclose(out, golden, rtol=1e-5, atol=1e-5)


def test_segment_mean(rng):
    e, n = 30, 5
    data = rng.normal(size=(e, 2)).astype(np.float32)
    ids = rng.integers(0, n, size=e)
    out = segment_mean(jnp.array(data), jnp.array(ids), n)
    sums = np_segment_sum(data, ids, n)
    counts = np.maximum(np.bincount(ids, minlength=n), 1)[:, None]
    np.testing.assert_allclose(out, sums / counts, rtol=1e-5, atol=1e-5)


def test_segment_softmax_sums_to_one(rng):
    e, n = 80, 10
    scores = rng.normal(size=e).astype(np.float32) * 5
    ids = rng.integers(0, n, size=e)
    mask = rng.random(e) > 0.2
    sm = segment_softmax(jnp.array(scores), jnp.array(ids), n, jnp.array(mask))
    sm = np.asarray(sm)
    assert np.all(sm[~mask] == 0)
    for s in range(n):
        sel = sm[(ids == s) & mask]
        if len(sel):
            assert sel.sum() == pytest.approx(1.0, abs=1e-5)


def test_segment_softmax_matches_numpy(rng):
    e, n = 40, 4
    scores = rng.normal(size=e).astype(np.float32)
    ids = rng.integers(0, n, size=e)
    sm = np.asarray(segment_softmax(jnp.array(scores), jnp.array(ids), n))
    for s in range(n):
        sel = scores[ids == s]
        if len(sel):
            golden = np.exp(sel - sel.max())
            golden /= golden.sum()
            np.testing.assert_allclose(sm[ids == s], golden, rtol=1e-5, atol=1e-5)


def test_pairwise_sq_dists(rng):
    x = rng.normal(size=(10, 3)).astype(np.float32)
    d = pairwise_sq_dists(jnp.array(x))
    golden = ((x[:, None] - x[None, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d, golden, atol=1e-4)


def test_knn_graph_basic():
    # 4 points on a line; k=2 neighbors
    x = jnp.array([[0.0], [1.0], [2.0], [10.0]])
    src, dst, mask = knn_graph_masked(x, k=2)
    edges = {(int(s), int(t)) for s, t, m in zip(src, dst, mask) if m}
    # node 0's 2 nearest: 1, 2; node 3's: 2, 1
    assert (1, 0) in edges and (2, 0) in edges
    assert (2, 3) in edges and (1, 3) in edges
    # no self loops
    assert all(s != t for (s, t) in edges)


def test_knn_graph_masked_nodes():
    x = jnp.array([[0.0], [1.0], [2.0], [3.0]])
    valid = jnp.array([True, True, False, True])
    src, dst, mask = knn_graph_masked(x, k=2, valid=valid)
    edges = {(int(s), int(t)) for s, t, m in zip(src, dst, mask) if m}
    assert all(s != 2 and t != 2 for (s, t) in edges)
    # node 3's nearest valid neighbors are 1 and 0
    assert (1, 3) in edges and (0, 3) in edges


def test_knn_graph_pair_constraint():
    # same-timestamp constraint: nodes {0,1} at t=0, {2,3} at t=1
    x = jnp.array([[0.0], [0.1], [0.2], [0.3]])
    t = jnp.array([0, 0, 1, 1])
    pair = t[None, :] == t[:, None]
    src, dst, mask = knn_graph_masked(x, k=3, pair_valid=pair)
    edges = {(int(s), int(t_)) for s, t_, m in zip(src, dst, mask) if m}
    assert edges == {(1, 0), (0, 1), (3, 2), (2, 3)}


def test_pallas_segment_sum_interpret(rng):
    """Pallas kernel vs numpy golden (interpreter mode on CPU)."""
    from batch3dmot_tpu.ops.pallas_segment import segment_sum_pallas

    e, n, dim = 300, 70, 32
    data = rng.normal(size=(e, dim)).astype(np.float32)
    ids = rng.integers(0, n, size=e)
    mask = rng.random(e) > 0.2
    out = segment_sum_pallas(
        jnp.array(data), jnp.array(ids), n, jnp.array(mask), interpret=True
    )
    np.testing.assert_allclose(
        out, np_segment_sum(data, ids, n, mask), rtol=1e-5, atol=1e-5
    )
