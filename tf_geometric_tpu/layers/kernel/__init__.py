from .map_reduce import MapReduceGNN
