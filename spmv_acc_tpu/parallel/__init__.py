from .dist_spmv import dist_spmv, dist_spmv_fn, make_mesh, shard_partitioned, unpad_y
from .partition import (
    PartitionedCSR,
    balance_row_cuts,
    pad_vector,
    partition_rows,
    unpad_vector,
)

__all__ = [
    "dist_spmv",
    "dist_spmv_fn",
    "make_mesh",
    "shard_partitioned",
    "unpad_y",
    "PartitionedCSR",
    "balance_row_cuts",
    "pad_vector",
    "partition_rows",
    "unpad_vector",
]
