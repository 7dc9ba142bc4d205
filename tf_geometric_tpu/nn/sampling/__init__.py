from .drop_edge import drop_edge
from .device_sampler import DeviceNeighborSampler
