"""ARXIV-SCALE head-to-head: executed reference vs repo at 169k nodes.

BASELINE asks for accuracy parity on "Cora/Citeseer/Pubmed and ogbn-scale
graphs"; the cora/citeseer/pubmed cells live in head_to_head_hard.json, and
this runner closes the ogbn-scale half: GCN + SGC trained on the hard
arxiv-shaped graph (HardCitationDataset "arxiv": 169,343 nodes / 40 classes
/ ~1.2M edges — the no-egress stand-in for reference datasets/ogb.py:10-48)
under the SHARED 100-step protocol (head_to_head.DATASET_OVERRIDES: hidden
64 for the 40-class output, eval every 2nd step on both sides — a full-graph
eval costs ~40% of a train step at this size).

Both sides train the identical data: the reference's own Keras models are
executed under TF via the tf_sparse shim (head_to_head.run_reference), the
repo side runs its bench scripts with TFG_HARD_PROTOCOL=1 BENCH_DATASET=
arxiv. Only GCN and SGC run at this scale — the reference's own early-stop
benchmark family (bench_node_cls_early_stop_*.py) is what the protocol
mirrors, and a 169k-node GAT/APPNP reference run on the 2-core CI host is
hours per seed.

Output: head_to_head_arxiv.json (same entry schema as the hard JSON),
gated by tests/test_head_to_head_hard.py::test_arxiv_scale_parity.

Usage: python head_to_head_arxiv.py [num_seeds]   (default 5)
"""
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

if __name__ == "__main__":
    os.environ["TFG_H2H_OUT"] = "head_to_head_arxiv.json"
    import head_to_head_hard
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    keys = sys.argv[2:] or ["gcn_arxiv", "sgc_arxiv"]
    head_to_head_hard.main(n, only=keys)
