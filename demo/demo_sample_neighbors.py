"""Neighbor-sampling walkthrough (reference: demo/demo_sample_neighbors.py):
RandomNeighborSampler modes — k / ratio / padding / restricted node sets."""
import numpy as np

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tf_geometric_tpu.utils.graph_utils import (RandomNeighborSampler,
                                                UniformNeighborSampler)


def main():
    rng = np.random.default_rng(0)
    edge_index = rng.integers(0, 12, size=(2, 60)).astype(np.int32)
    sampler = RandomNeighborSampler(edge_index, rng=0)

    ei, ew = sampler.sample(k=3)
    print(f"k=3 sample: {ei.shape[1]} edges")

    ei, ew = sampler.sample(k=4, padding=True)
    counts = np.bincount(ei[0], minlength=12)
    print(f"k=4 padded: every present node has exactly 4: "
          f"{sorted(set(counts[counts > 0].tolist()))}")

    ei, ew = sampler.sample(ratio=0.5)
    print(f"ratio=0.5 sample: {ei.shape[1]} edges")

    sampled_nodes = np.array([0, 2, 4, 6])
    ei, ew = sampler.sample(k=3, sampled_node_index=sampled_nodes)
    print(f"restricted to {sampled_nodes.tolist()}: edge ids < "
          f"{int(ei.max(initial=0)) + 1} (virtual reindexed)")

    uni = UniformNeighborSampler(edge_index, rng=0)
    ei, ew = uni.sample(p=0.5) if hasattr(uni, "p") else uni.sample(0.5)
    print(f"uniform p=0.5: {ei.shape[1]} edges")
    return True


if __name__ == "__main__":
    main()
