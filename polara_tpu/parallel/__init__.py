from polara_tpu.parallel.distributed import (cholesky_qr2,
                                             distributed_randomized_svd,
                                             score_mask_topk_step,
                                             full_train_step)
from polara_tpu.runtime.mesh import make_mesh, user_sharding, shard_rows

__all__ = ["cholesky_qr2", "distributed_randomized_svd",
           "score_mask_topk_step", "full_train_step",
           "make_mesh", "user_sharding", "shard_rows"]
