"""TPU-native graph kernels: segment reductions, masked kNN, cross-edge attention."""

from batch3dmot_tpu.ops.segment import (  # noqa: F401
    segment_sum,
    segment_max,
    segment_softmax,
    segment_mean,
)
from batch3dmot_tpu.ops.knn import knn_graph_masked, pairwise_sq_dists  # noqa: F401
