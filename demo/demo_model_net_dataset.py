"""ModelNet mesh-graph classification (reference: demo/demo_model_net_dataset.py).

Downloads are unavailable offline; this demo synthesizes OFF-style mesh
graphs when ModelNet files are absent, then trains a GCN + mean-pool
classifier over the mesh graphs.
"""
import jax
import numpy as np

from demo_utils import run_graph_classification
from demo_mean_pool import MeanPoolNetwork


def load_model_net_graphs():
    """Returns (graphs, num_classes, official_split_or_None). The real
    ModelNet split is OFFICIAL — re-splitting randomly would leak test
    meshes into training."""
    from tf_geometric_tpu.datasets import ModelNet10Dataset
    try:
        train_graphs, test_graphs, label_names = ModelNet10Dataset().load_data()
        return (train_graphs + test_graphs, len(label_names),
                (train_graphs, test_graphs))
    except Exception:
        print("ModelNet10 unavailable — synthesizing mesh-like graphs")
        from tf_geometric_tpu.data.graph import Graph
        rng = np.random.default_rng(0)
        graphs = []
        for _ in range(300):
            label = int(rng.integers(0, 2))
            n = int(rng.integers(12, 24))
            # class 0: chain-mesh; class 1: fan-mesh
            if label == 0:
                tri = np.stack([np.arange(n - 2), np.arange(1, n - 1),
                                np.arange(2, n)], axis=1)
            else:
                tri = np.stack([np.zeros(n - 2, np.int64), np.arange(1, n - 1),
                                np.arange(2, n)], axis=1)
            edges = np.concatenate([tri[:, :2], tri[:, 1:], tri[:, ::2]], axis=0)
            ei = np.concatenate([edges.T, edges.T[::-1]], axis=1).astype(np.int32)
            x = rng.normal(size=(n, 3)).astype(np.float32)
            graphs.append(Graph(x=x, edge_index=ei, y=[label]))
        return graphs, 2, None


def main(num_steps=200):
    import demo_utils
    graphs, num_classes, split = load_model_net_graphs()
    orig = demo_utils.load_graph_classification_data
    demo_utils.load_graph_classification_data = \
        lambda *a, **k: (graphs, num_classes)
    try:
        return run_graph_classification(
            lambda c, g: MeanPoolNetwork(num_classes=c, num_graphs=g),
            batch_size=16, num_steps=num_steps, split=split)
    finally:
        demo_utils.load_graph_classification_data = orig


if __name__ == "__main__":
    main()
