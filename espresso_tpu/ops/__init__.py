from espresso_tpu.ops.masking import (
    sequence_mask,
    chunk_streaming_mask,
    lengths_after_subsampling,
)
from espresso_tpu.ops.losses import (
    label_smoothed_cross_entropy,
    cross_entropy_loss,
)
from espresso_tpu.ops.ctc import ctc_loss
from espresso_tpu.ops.rnnt import rnnt_loss

__all__ = [
    "sequence_mask",
    "chunk_streaming_mask",
    "lengths_after_subsampling",
    "label_smoothed_cross_entropy",
    "cross_entropy_loss",
    "ctc_loss",
    "rnnt_loss",
]
