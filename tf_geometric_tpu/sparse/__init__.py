from .matrix import SparseMatrix, diags, eye, concat, sparse_shape

# Parity alias for the reference's ``tfs.shape`` call sites
# (reference nn/conv/gat.py:40) — works on dense arrays and SparseMatrix.
shape = sparse_shape

