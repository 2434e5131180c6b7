"""ctypes binding to the native .b3d loader (native/graphstore.cc).

Builds the shared library on first use (``make -C native``) and exposes the
multithreaded padded-batch fill; falls back to the numpy reader in
:mod:`batch3dmot_tpu.io.store` when compilation is impossible.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libgraphstore.so"))

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _ensure_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    src = os.path.join(os.path.abspath(_NATIVE_DIR), "graphstore.cc")
    stale = os.path.exists(_LIB_PATH) and os.path.exists(src) and (
        os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    )
    if not os.path.exists(_LIB_PATH) or stale:
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)]
                + (["-B"] if stale else []),
                check=True,
                capture_output=True,
            )
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _build_failed = True
        return None
    lib.b3d_open.restype = ctypes.c_void_p
    lib.b3d_open.argtypes = [ctypes.c_char_p]
    lib.b3d_close.argtypes = [ctypes.c_void_p]
    lib.b3d_num_windows.argtypes = [ctypes.c_void_p]
    lib.b3d_num_windows.restype = ctypes.c_int
    lib.b3d_window_len.argtypes = [ctypes.c_void_p]
    lib.b3d_window_len.restype = ctypes.c_int
    lib.b3d_window_start.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.b3d_window_start.restype = ctypes.c_int
    lib.b3d_num_nodes.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.b3d_num_nodes.restype = ctypes.c_int
    lib.b3d_num_edges.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.b3d_num_edges.restype = ctypes.c_int
    lib.b3d_img_dtype.argtypes = [ctypes.c_void_p]
    lib.b3d_img_dtype.restype = ctypes.c_int
    f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    anyarr = np.ctypeslib.ndpointer(flags="C_CONTIGUOUS")  # img: f32 or u8
    lib.b3d_fill_padded_batch.argtypes = [
        ctypes.c_void_p, i32, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32, anyarr, ctypes.c_int, f32, f32, i32, i32, u8, i32, i32, f32,
        u8, f32, f32,
        ctypes.c_int,
    ]
    lib.b3d_fill_padded_batch.restype = ctypes.c_int
    _lib = lib
    return _lib


def native_available() -> bool:
    return _ensure_lib() is not None


class NativeGraphStore:
    """Native mmap'd scene store with one-call padded batch assembly."""

    def __init__(self, path: str):
        lib = _ensure_lib()
        if lib is None:
            raise RuntimeError("native graphstore library unavailable")
        self._lib = lib
        self._h = lib.b3d_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open graph store {path}")
        self.num_windows = lib.b3d_num_windows(self._h)
        self.window_len = lib.b3d_window_len(self._h)

    def close(self) -> None:
        if self._h:
            self._lib.b3d_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def window_sizes(self) -> Tuple[np.ndarray, np.ndarray]:
        n = np.array(
            [self._lib.b3d_num_nodes(self._h, i) for i in range(self.num_windows)],
            np.int32,
        )
        e = np.array(
            [self._lib.b3d_num_edges(self._h, i) for i in range(self.num_windows)],
            np.int32,
        )
        return n, e

    def fill_padded_batch(
        self,
        window_indices: Sequence[int],
        max_nodes: int,
        max_edges: int,
        num_threads: int = 4,
    ):
        """Assemble a padded [B, ...] batch dict of numpy arrays.

        window index -1 yields an all-padding slot.
        """
        b = len(window_indices)
        idx = np.asarray(window_indices, np.int32)
        # image buffer dtype follows the store (uint8 crops: 4x smaller
        # host buffers AND host->device uploads; device-side /255)
        img_dtype = np.uint8 if self._lib.b3d_img_dtype(self._h) == 2 else np.float32
        out = {
            "pose": np.empty((b, max_nodes, 19), np.float32),
            "img": np.empty((b, max_nodes, 32, 32, 3), img_dtype),
            "lidar": np.empty((b, max_nodes, 128, 3), np.float32),
            "radar": np.empty((b, max_nodes, 64, 4), np.float32),
            "node_time": np.empty((b, max_nodes), np.int32),
            "node_class": np.empty((b, max_nodes), np.int32),
            "node_mask": np.empty((b, max_nodes), np.uint8),
            "edge_src": np.empty((b, max_edges), np.int32),
            "edge_dst": np.empty((b, max_edges), np.int32),
            "edge_attr": np.empty((b, max_edges, 4), np.float32),
            "edge_mask": np.empty((b, max_edges), np.uint8),
            "edge_label": np.empty((b, max_edges), np.float32),
            "edge_weight": np.empty((b, max_edges), np.float32),
        }
        rc = self._lib.b3d_fill_padded_batch(
            self._h, idx, b, max_nodes, max_edges,
            out["pose"], out["img"], np.dtype(img_dtype).itemsize,
            out["lidar"], out["radar"],
            out["node_time"], out["node_class"], out["node_mask"],
            out["edge_src"], out["edge_dst"], out["edge_attr"],
            out["edge_mask"], out["edge_label"], out["edge_weight"],
            num_threads,
        )
        if rc == -2:
            raise ValueError("store image dtype is inconsistent across windows")
        if rc != 0:
            raise ValueError("window exceeds padding budget")
        return out


def batch_to_padded_graph(out: dict):
    """Native batch dict -> PaddedGraph (bool masks, numpy-backed: staging
    stays on host and transfers once per field at the jit boundary — see
    graph.pad_graph)."""
    from batch3dmot_tpu.graph import PaddedGraph

    return PaddedGraph(
        pose=out["pose"],
        img=out["img"],
        lidar=out["lidar"],
        radar=out["radar"],
        node_time=out["node_time"],
        node_class=out["node_class"],
        node_mask=out["node_mask"].astype(bool),
        edge_src=out["edge_src"],
        edge_dst=out["edge_dst"],
        edge_attr=out["edge_attr"],
        edge_mask=out["edge_mask"].astype(bool),
        edge_label=out["edge_label"],
        edge_weight=out["edge_weight"],
    )
