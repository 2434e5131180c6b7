"""Training: losses, metrics, batching, the unified GNN trainer, encoder trainers."""

from batch3dmot_tpu.train.metrics import average_precision, masked_bce  # noqa: F401
from batch3dmot_tpu.train.trainer import GNNTrainer, TrainState  # noqa: F401
