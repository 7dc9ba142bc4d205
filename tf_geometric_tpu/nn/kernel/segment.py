"""Segment reduction primitives — re-exported from the package-root core
module (``tf_geometric_tpu/_segment_core.py``) so that ``sparse`` can use
them without importing the full ``nn`` package (avoids a circular import:
``nn/__init__`` pulls in conv ops which build on ``sparse``)."""
from ..._segment_core import (segment_sum, segment_mean, segment_max, segment_min,
                              segment_softmax, segment_count, segment_normalize,
                              segment_op_with_pad)

__all__ = ["segment_sum", "segment_mean", "segment_max", "segment_min",
           "segment_softmax", "segment_count", "segment_normalize",
           "segment_op_with_pad"]
