"""Graph data structures (reference: tf_geometric/data/ — SURVEY §2.6)."""
from .graph import BatchGraph, Graph, HeteroBatchGraph, HeteroGraph
from .dataset import Dataset, DownloadableDataset, default_dataset_root
from .padding import PaddingSpec, bucket_size, pad_batch_graph, pad_graph

__all__ = [
    "Graph", "BatchGraph", "HeteroGraph", "HeteroBatchGraph",
    "Dataset", "DownloadableDataset", "default_dataset_root",
    "PaddingSpec", "bucket_size", "pad_graph", "pad_batch_graph",
]
