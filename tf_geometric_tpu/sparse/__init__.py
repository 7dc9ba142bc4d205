from .matrix import SparseMatrix, diags, eye, concat, sparse_shape
