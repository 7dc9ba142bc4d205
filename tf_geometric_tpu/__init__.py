"""tf_geometric_tpu: TPU-native GNN message-passing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
CrawlScript/tf_geometric (see SURVEY.md): functional ops under ``nn``,
flax layer wrappers under ``layers``, graph containers under ``data``,
the dataset zoo under ``datasets``, the COO sparse core under ``sparse``,
Pallas/XLA kernels under ``ops``, and the multi-chip graph-parallel
runtime under ``parallel``.
"""
from . import nn
from . import layers
from . import sparse
from . import ops
from . import utils
from . import data
from . import datasets
from .data.graph import Graph, BatchGraph, HeteroGraph, HeteroBatchGraph
from .sparse.matrix import SparseMatrix

__version__ = "0.1.0"
