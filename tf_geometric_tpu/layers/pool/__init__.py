from .pool_layers import (CommonPool, MeanPool, SumPool, MaxPool, MinPool,
                          DiffPool, MinCutPool, SAGPool, SortPool, ASAP, Set2Set)
