from action_segmentation_tpu.ops.span_codec import (
    labels_to_spans,
    spans_to_labels,
    rle_spans,
)
from action_segmentation_tpu.ops.hsmm import (
    HsmmPotentials,
    hsmm_partition,
    hsmm_viterbi,
    hsmm_gold_score,
    hsmm_log_prob,
    hsmm_frame_marginals,
)

__all__ = [
    "labels_to_spans",
    "spans_to_labels",
    "rle_spans",
    "HsmmPotentials",
    "hsmm_partition",
    "hsmm_viterbi",
    "hsmm_gold_score",
    "hsmm_log_prob",
    "hsmm_frame_marginals",
]
