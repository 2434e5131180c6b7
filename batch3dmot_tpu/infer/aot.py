"""AOT compile/export cache for the big fused inference programs.

The device pipeline's one-program-per-scene-shape design trades compile time
for steady-state throughput; through this environment's remote-compile relay
a cold compile of the fused program costs minutes (docs/RESULTS.md). This
module serializes lowered+compiled programs (``jax.export``) to disk so a
serving process starts hot: first run per shape exports, subsequent
processes deserialize and skip XLA entirely.

The serialized artifact embeds the StableHLO and the lowering platform —
keyed here by (platform, shape-key, framework version) so a CPU-exported
program is never fed to a TPU runtime.
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable, Optional, Sequence

import jax
from jax import export as jax_export

# v2: device-pipeline output contract changed to the packed [3, W, E]
# (src-as-f32, dst-as-f32, score-or--1) form — old artifacts must not be
# loaded into it. (Indices travel as plain f32 values, NOT bitcast: the TPU
# path flushes denormals, which corrupts bitcast int32 payloads.)
_FORMAT_VERSION = 2

_PACK_JIT = None


def _packed_leaf_bytes(leaves):
    """Every leaf's raw bytes as ONE device uint8 vector (tobytes order).

    ``np.asarray(leaf)`` per leaf costs a synchronous device round trip
    each; through the TPU relay that is ~0.1-1 s x hundreds of leaves
    (measured 95 s for the mm encoder subtrees on a congested relay,
    docs/RESULTS.md round 5). Bitcasting each leaf to uint8 on device and
    concatenating makes it one dispatch + one fetch of the same bytes —
    `lax.bitcast_convert_type` to a narrower type appends a minor byte
    dimension in little-endian order, exactly `tobytes()` on this (LE)
    host, so digests are unchanged (test_aot.py pins host/device equality).
    """
    import jax.numpy as jnp
    from jax import lax

    def leaf_bytes(x):
        if x.dtype == jnp.bool_:
            x = x.astype(jnp.uint8)  # same bytes: \x00/\x01
        if x.dtype == jnp.uint8:
            return x.reshape(-1)
        return lax.bitcast_convert_type(x, jnp.uint8).reshape(-1)

    # ONE module-level jit wrapper: a fresh `jax.jit(lambda ...)` per call
    # would retrace (and, through the relay, reload the executable) on
    # every digest of the same tree — per scene in write-mode cached
    # predict and per scene per epoch in streaming --encoded training
    global _PACK_JIT
    if _PACK_JIT is None:
        _PACK_JIT = jax.jit(
            lambda ls: jnp.concatenate([leaf_bytes(x) for x in ls])
        )
    return _PACK_JIT(leaves)


def pytree_digest(tree) -> str:
    """Short content digest of a pytree of arrays (shape+dtype+values).
    Use for keys that must change with a checkpoint's VALUES."""
    import numpy as np

    leaves = jax.tree.leaves(tree)
    # committed (on-device) leaves: fetch ALL their bytes in one transfer
    dev_idx = [
        i for i, l in enumerate(leaves)
        if isinstance(l, jax.Array) and l.size and not isinstance(l, np.ndarray)
    ]
    packed = {}
    if dev_idx:
        buf = np.asarray(_packed_leaf_bytes([leaves[i] for i in dev_idx]))
        off = 0
        for i in dev_idx:
            nb = leaves[i].size * leaves[i].dtype.itemsize
            packed[i] = buf[off : off + nb].tobytes()
            off += nb
        assert off == buf.size, (off, buf.size)
    h = hashlib.sha1()
    for i, leaf in enumerate(leaves):
        if i in packed:
            h.update(str(tuple(leaf.shape)).encode())
            h.update(str(leaf.dtype).encode())
            h.update(packed[i])
        else:
            arr = np.asarray(leaf)
            h.update(str(arr.shape).encode())
            h.update(str(arr.dtype).encode())
            h.update(arr.tobytes())
    return h.hexdigest()[:16]


def pytree_shape_digest(tree) -> str:
    """Digest of a pytree's STRUCTURE (paths + shapes + dtypes) only.

    The inference programs take weights as inputs (never baked constants),
    so artifacts are valid across checkpoints of the same architecture —
    this keys them without fetching any device values."""
    h = hashlib.sha1()
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        h.update(jax.tree_util.keystr(path).encode())
        h.update(str(getattr(leaf, "shape", ())).encode())
        h.update(str(getattr(leaf, "dtype", type(leaf))).encode())
    return h.hexdigest()[:16]


def _artifact_path(cache_dir: str, name: str, key: str) -> str:
    platform = jax.default_backend()
    digest = hashlib.sha1(
        f"{_FORMAT_VERSION}|{platform}|{name}|{key}".encode()
    ).hexdigest()[:16]
    return os.path.join(cache_dir, f"{name}_{platform}_{digest}.jaxexport")


def cached_jit(
    fn: Callable,
    name: str,
    key: str,
    cache_dir: Optional[str],
    example_args: Sequence,
):
    """jit ``fn``, round-tripping through a serialized export on disk.

    Returns a callable with ``fn``'s signature. Without ``cache_dir`` this
    is plain ``jax.jit``. With it: deserialize the artifact if present
    (no compile), else export+serialize after the first trace.
    """
    if cache_dir is None:
        return jax.jit(fn)

    os.makedirs(cache_dir, exist_ok=True)
    path = _artifact_path(cache_dir, name, key)
    if os.path.exists(path):
        with open(path, "rb") as f:
            exported = jax_export.deserialize(bytearray(f.read()))
        return exported.call

    exported = jax_export.export(jax.jit(fn))(*example_args)
    data = exported.serialize()
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic: concurrent processes race safely
    return exported.call
