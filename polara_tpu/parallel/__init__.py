from polara_tpu.parallel.distributed import (cholesky_qr2,
                                             distributed_randomized_svd,
                                             distributed_chunked_rsvd,
                                             distributed_ials,
                                             distributed_ials_events,
                                             distributed_bpr,
                                             distributed_hooi,
                                             score_mask_topk_step,
                                             sharded_score_topk_2d,
                                             full_train_step)
from polara_tpu.runtime.mesh import (make_mesh, user_sharding, shard_rows,
                                     set_default_mesh, get_default_mesh,
                                     use_mesh)

__all__ = ["cholesky_qr2", "distributed_randomized_svd",
           "distributed_chunked_rsvd",
           "distributed_ials", "distributed_ials_events",
           "distributed_bpr", "distributed_hooi",
           "score_mask_topk_step", "sharded_score_topk_2d",
           "full_train_step",
           "make_mesh", "user_sharding", "shard_rows",
           "set_default_mesh", "get_default_mesh", "use_mesh"]
