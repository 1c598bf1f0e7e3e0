from polara_tpu.runtime.timing import track_time, timed_blocked, format_elapsed_time
from polara_tpu.runtime.rng import check_random_state, random_seeds, key_from_seed
from polara_tpu.runtime.mesh import make_mesh, user_sharding, shard_rows
from polara_tpu.runtime.memory import plan_user_chunks, range_division, pad_dim

__all__ = [
    "track_time", "timed_blocked", "format_elapsed_time",
    "check_random_state", "random_seeds", "key_from_seed",
    "make_mesh", "user_sharding", "shard_rows",
    "plan_user_chunks", "range_division", "pad_dim",
]
