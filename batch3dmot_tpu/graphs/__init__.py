"""Tracking-graph construction: vectorized window graphs, labels, weights."""

from batch3dmot_tpu.graphs.build import build_window_graph, build_scene_graphs  # noqa: F401
from batch3dmot_tpu.graphs.weights import cb_edge_weight  # noqa: F401
