from .gcn import GCN
from .gat import GAT
from .propagation import SGC, TAGCN, APPNP, SSGC, ChebyNet, GIN, LEConv
from .graph_sage import (MeanGraphSage, SumGraphSage, GCNGraphSage,
                         MeanPoolGraphSage, MaxPoolGraphSage, LSTMGraphSage)
