from .common_pool import mean_pool, sum_pool, max_pool, min_pool
from .topk_pool import topk_pool, topk_pool_fixed
from .cluster_pool import cluster_pool
from .diff_pool import diff_pool, diff_pool_coarsen
from .min_cut_pool import min_cut_pool, min_cut_pool_coarsen, min_cut_pool_compute_losses
from .sag_pool import sag_pool
from .sort_pool import sort_pool
from .asap import asap
from .set2set import set2set
