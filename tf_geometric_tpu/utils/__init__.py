from . import graph_utils
from . import union_utils
from . import data_utils
from . import tf_sparse_utils
from . import jax_utils
from . import metrics
from . import profiling
