from . import spmm, pallas_spmm, ell, config
