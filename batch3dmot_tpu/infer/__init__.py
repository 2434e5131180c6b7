"""Inference: batched window scoring, cross-window score averaging, greedy
rounding, trajectory clustering, submission assembly."""

from batch3dmot_tpu.infer.predict import predict_scene, score_windows  # noqa: F401
from batch3dmot_tpu.infer.tracks import (  # noqa: F401
    assemble_submission,
    hierarchical_clusters,
    scene_results,
)
