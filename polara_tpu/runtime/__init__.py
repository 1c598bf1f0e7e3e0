from polara_tpu.runtime.timing import (track_time, timed_blocked,
                                       format_elapsed_time, profiler_trace,
                                       enable_compilation_cache)
from polara_tpu.runtime.rng import (check_random_state, random_seeds,
                                    key_from_seed)
from polara_tpu.runtime.mesh import (make_mesh, user_sharding, shard_rows,
                                     set_default_mesh, get_default_mesh,
                                     use_mesh)
from polara_tpu.runtime.memory import (plan_user_chunks, range_division,
                                       pad_dim, array_split, get_chunk_size,
                                       get_available_memory,
                                       read_npz_from_url)
from polara_tpu.runtime.checkpoint import save_factors, load_factors
from polara_tpu.runtime.display import print_frames, suppress_stdout
from polara_tpu.runtime.serving import ServingBundle

__all__ = [
    "track_time", "timed_blocked", "format_elapsed_time",
    "profiler_trace", "enable_compilation_cache",
    "check_random_state", "random_seeds", "key_from_seed",
    "make_mesh", "user_sharding", "shard_rows",
    "set_default_mesh", "get_default_mesh", "use_mesh",
    "plan_user_chunks", "range_division", "pad_dim", "array_split",
    "get_chunk_size", "get_available_memory", "read_npz_from_url",
    "save_factors", "load_factors", "print_frames", "suppress_stdout",
    "ServingBundle",
]
