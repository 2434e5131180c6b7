"""batch3dmot_tpu — a TPU-native (JAX/XLA/Pallas) offline 3D multi-object tracking
framework with the capabilities of Batch3DMOT (robot-learning-freiburg/Batch3DMOT,
RA-L 2022).

The pipeline: off-the-shelf 3D detections are assembled into directed, acyclic,
category-disjoint tracking graphs over sliding windows of frames; a time-aware
edge/node message-passing GNN with cross-edge modality attention classifies each
candidate edge as active/inactive; overlapping window scores are averaged,
greedily rounded and clustered into trajectories, and scored with the official
nuScenes TrackingEval.

Everything on the compute path is built TPU-first:
  * padded, fixed-shape graph batches (`batch3dmot_tpu.graph`),
  * MXU-friendly segment/scatter kernels (`batch3dmot_tpu.ops`),
  * flax models with batched frozen-encoder inference fused into the GNN
    forward (`batch3dmot_tpu.models`),
  * pjit/shard_map data-parallel training over a device mesh
    (`batch3dmot_tpu.parallel`).
"""

__version__ = "0.1.0"
