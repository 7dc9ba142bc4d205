from .drop_edge import drop_edge
