"""Functional ops (the reference's tfg.nn surface, nn/__init__.py:6-29)."""
from .kernel.map_reduce import (aggregate_neighbors, identity_mapper, gcn_mapper,
                                neighbor_count_mapper,
                                sum_reducer, mean_reducer, max_reducer, min_reducer,
                                identity_updater, sum_updater)
from .kernel.segment import (segment_sum, segment_mean, segment_max, segment_min,
                             segment_softmax, segment_count, segment_normalize,
                             segment_op_with_pad)
from .conv import *
from .pool import *
from .sampling import *
