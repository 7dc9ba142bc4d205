"""Multi-chip graph parallelism (docs/distributed.md).

The reference has no distributed library code (SURVEY §2.8 — replication via
MirroredStrategy in two demos only); this package is the TPU-native
replacement: block partitioning + halo exchange + shard_map training steps.
"""
from .partition import (EdgePartition, apply_node_permutation,
                        bandwidth_reduction_order, community_order,
                        nodes_per_part, partition_edges_by_row,
                        partition_order)
from .halo import HaloSpec, build_halo_spec, halo_exchange, halo_spmm_split
from .sharded import (build_mesh, make_graph_parallel_gat_step,
                      make_graph_parallel_gcn_step,
                      make_graph_parallel_mincut_step, sharded_spmm_local)
from .sampled_sage import build_csr_shards, make_sampled_sage_step

__all__ = [
    "EdgePartition", "apply_node_permutation", "bandwidth_reduction_order",
    "community_order", "nodes_per_part", "partition_edges_by_row",
    "partition_order",
    "HaloSpec", "build_halo_spec", "halo_exchange", "halo_spmm_split",
    "build_mesh", "make_graph_parallel_gcn_step", "make_graph_parallel_gat_step",
    "make_graph_parallel_mincut_step", "sharded_spmm_local",
    "build_csr_shards", "make_sampled_sage_step",
]
