"""Tracking evaluation: native AMOTA metrics + official devkit wrapper."""

from batch3dmot_tpu.eval.tracking_metrics import (  # noqa: F401
    TrackingEvalResult,
    evaluate_tracking,
)
