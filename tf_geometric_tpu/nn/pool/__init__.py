from .common_pool import mean_pool, sum_pool, max_pool, min_pool
