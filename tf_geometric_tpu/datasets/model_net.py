"""ModelNet10/40 mesh datasets (reference: datasets/model_net.py:12-135):
OFF meshes → graphs (triangle edges symmetrized, deduped), parallel parsing."""
from __future__ import annotations

import os
from multiprocessing import Pool

import numpy as np

from ..data.dataset import DownloadableDataset
from ..data.graph import Graph

__all__ = ["ModelNetDataset", "ModelNet10Dataset", "ModelNet40Dataset"]


class ModelNetDataset(DownloadableDataset):

    def __init__(self, dataset_name, download_urls=None, dataset_root_path=None,
                 num_processes: int = 8):
        super().__init__(dataset_name, download_urls,
                         download_file_name=f"{dataset_name}.zip",
                         cache_name="cache.p",
                         dataset_root_path=dataset_root_path)
        self.num_processes = num_processes

    def read_off(self, off_file_info):
        """Parse one OFF mesh into a Graph (model_net.py:20-74)."""
        import scipy.sparse as sp
        off_fpath, label_index = off_file_info
        with open(off_fpath, encoding="utf-8") as f:
            line = f.readline()
            # some files put the counts on the OFF line itself
            line = line[3:] if line.strip() != "OFF" else f.readline()
            num_nodes, num_faces, _ = [int(v) for v in line.split()]
            node_features = [[float(v) for v in f.readline().split()]
                             for _ in range(num_nodes)]
            triangles = []
            for _ in range(num_faces):
                items = [int(v) for v in f.readline().split()]
                if items[0] == 3:
                    triangles.append(items[1:4])
                else:  # split quads into two triangles
                    triangles.append([items[1], items[2], items[3]])
                    triangles.append([items[1], items[3], items[4]])

        x = np.array(node_features)
        tri = np.array(triangles)
        edges = np.concatenate([tri[:, :2], tri[:, 1:], tri[:, ::2]], axis=0)
        row = np.concatenate([edges[:, 0], edges[:, 1]])
        col = np.concatenate([edges[:, 1], edges[:, 0]])
        adj = sp.csr_matrix((np.ones_like(row), (row, col)),
                            shape=[num_nodes, num_nodes])
        adj.data[adj.data > 1] = 1
        adj = adj.tocoo()
        edge_index = np.stack([adj.row, adj.col], axis=0)
        return Graph(x=x, edge_index=edge_index, y=[label_index])

    def process(self):
        data_dir = os.path.join(self.raw_root_path, self.dataset_name)
        label_names = sorted(d for d in os.listdir(data_dir)
                             if os.path.isdir(os.path.join(data_dir, d)))
        train_graphs, test_graphs = [], []
        # one worker pool for the whole dataset (not one per class directory)
        with Pool(processes=self.num_processes) as pool:
            for label_index, label_name in enumerate(label_names):
                for split in ("train", "test"):
                    split_graphs = (train_graphs if split == "train"
                                    else test_graphs)
                    split_path = os.path.join(data_dir, label_name, split)
                    off_paths = [os.path.join(split_path, f)
                                 for f in os.listdir(split_path)
                                 if f != ".DS_Store"]
                    inputs = [(p, label_index) for p in off_paths]
                    for graph in pool.imap_unordered(self.read_off, inputs):
                        split_graphs.append(graph)
        return train_graphs, test_graphs, label_names


class ModelNet10Dataset(ModelNetDataset):
    def __init__(self, dataset_root_path=None, num_processes: int = 8):
        super().__init__(
            "ModelNet10",
            download_urls="http://vision.princeton.edu/projects/2014/3DShapeNets/ModelNet10.zip",
            dataset_root_path=dataset_root_path, num_processes=num_processes)


class ModelNet40Dataset(ModelNetDataset):
    def __init__(self, dataset_root_path=None, num_processes: int = 8):
        super().__init__(
            "ModelNet40",
            download_urls="http://modelnet.cs.princeton.edu/ModelNet40.zip",
            dataset_root_path=dataset_root_path, num_processes=num_processes)
