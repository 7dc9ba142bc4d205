from . import spmm, pallas_spmm
