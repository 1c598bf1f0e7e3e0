from polara_tpu.ops.sparse import (CooMatrix, MatmulOperator, PaddedRows,
                                   coo_from_arrays, dense_from_coo,
                                   dense_operator, inner_product_at,
                                   pad_rows)
from polara_tpu.ops.rsvd import randomized_svd, SvdResult, orthogonalize
from polara_tpu.ops.topk import mask_and_topk, top_k_indices, downvote_items
from polara_tpu.ops.scoring import ChunkedTestData, TestChunk, run_scoring

__all__ = ["CooMatrix", "MatmulOperator", "PaddedRows", "coo_from_arrays",
           "dense_from_coo", "dense_operator", "inner_product_at",
           "pad_rows", "randomized_svd", "SvdResult", "orthogonalize",
           "mask_and_topk", "top_k_indices", "downvote_items",
           "ChunkedTestData", "TestChunk", "run_scoring"]
