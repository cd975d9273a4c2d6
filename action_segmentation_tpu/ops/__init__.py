from action_segmentation_tpu.ops.span_codec import (
    labels_to_spans,
    spans_to_labels,
    rle_spans,
)

__all__ = ["labels_to_spans", "spans_to_labels", "rle_spans"]
