from .host import host_matmul, sdmult, ssmult, scale
