"""Flax models: modality encoders, tracking GNNs, shared layers."""

from batch3dmot_tpu.models.encoders import (  # noqa: F401
    PointNetClassifier,
    RadarNetClassifier,
    ResNetAE,
)
from batch3dmot_tpu.models.gnn import MultimodalGNN, PoseGNN  # noqa: F401
from batch3dmot_tpu.models.registry import (  # noqa: F401
    MODEL_REGISTRY,
    make_model,
)
