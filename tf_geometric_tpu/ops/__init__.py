"""TPU kernels: COO/ELL SpMM + SDDMM + fused attention (SURVEY §2.9's
tf_sparse role, rebuilt as packed layouts with custom VJPs).

The COO ``spmm``/``sddmm`` functions live in the ``spmm`` submodule (their
names collide with it, so they are not re-bound here).
"""
from . import (config, ell, ell_attention, ell_attention_bucketed,
               ell_bucketed, pallas_segment, spmm)
from .ell import EllAdj, build_ell_arrays, ell_spmm, ell_spmm_multihead
from .ell_bucketed import BucketedEllAdj, bucketed_spmm
from .ell_attention import GatEllLayout, build_gat_layout, gat_attention_ell
from .ell_attention_bucketed import (BucketedGatLayout,
                                     build_gat_layout_bucketed,
                                     gat_attention_bucketed)
from .spmm import sddmm_xla, spmm_xla

__all__ = [
    "EllAdj", "build_ell_arrays", "ell_spmm", "ell_spmm_multihead",
    "BucketedEllAdj", "bucketed_spmm",
    "GatEllLayout", "build_gat_layout", "gat_attention_ell",
    "BucketedGatLayout", "build_gat_layout_bucketed", "gat_attention_bucketed",
    "spmm_xla", "sddmm_xla", "config",
]
