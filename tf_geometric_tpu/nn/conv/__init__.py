from .gcn import (gcn, gcn_norm_adj, gcn_build_cache_by_adj, gcn_build_cache_for_graph,
                  gcn_norm_edge, gcn_cache_normed_edge, gcn_mapper)
from .gat import gat
from .appnp import appnp
from .sgc import sgc
from .ssgc import ssgc
from .tagcn import tagcn
from .chebynet import chebynet, chebynet_norm_edge, chebynet_cache_normed_edge
from .gin import gin
from .le_conv import le_conv
from .graph_sage import (mean_graph_sage, sum_graph_sage, gcn_graph_sage,
                         mean_pool_graph_sage, max_pool_graph_sage, lstm_graph_sage,
                         mean_graph_sage_fixed_k, sum_graph_sage_fixed_k)
