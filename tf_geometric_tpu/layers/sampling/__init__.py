from .drop_edge import DropEdge
