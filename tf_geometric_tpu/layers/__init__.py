"""OOP layer surface (the reference's tfg.layers, layers/__init__.py:2-24)."""
from .conv import (GCN, GAT, SGC, TAGCN, APPNP, SSGC, ChebyNet, GIN, LEConv,
                   MeanGraphSage, SumGraphSage, GCNGraphSage,
                   MeanPoolGraphSage, MaxPoolGraphSage, LSTMGraphSage)
from .pool import (CommonPool, MeanPool, SumPool, MaxPool, MinPool,
                   DiffPool, MinCutPool, SAGPool, SortPool, ASAP, Set2Set)
from .kernel import MapReduceGNN
from .sampling import DropEdge
