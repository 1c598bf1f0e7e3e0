"""Multi-chip scale-out on a device mesh.

The reference is single-process; this framework shards the same
workloads over a ``jax.sharding.Mesh``.  This example runs on a virtual
8-device CPU mesh (set up below) so it works anywhere; on a real TPU
slice the identical code runs over ICI — only the mesh construction
changes.
"""
import os

if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np          # noqa: E402
import jax                  # noqa: E402
import jax.numpy as jnp     # noqa: E402

from polara_tpu.data import RecommenderData                  # noqa: E402
from polara_tpu.datasets import make_synthetic_interactions  # noqa: E402
from polara_tpu.models import SVDModel                       # noqa: E402
from polara_tpu.ops.sparse import dense_from_coo             # noqa: E402
from polara_tpu.parallel.distributed import (                # noqa: E402
    distributed_hooi, distributed_ials, distributed_randomized_svd)
from polara_tpu.runtime.mesh import make_mesh, use_mesh      # noqa: E402


def main():
    print(f"devices: {len(jax.devices())} ({jax.default_backend()})")
    mesh = make_mesh(n_devices=8, axes=("users",), shape=(8,))

    events = make_synthetic_interactions(512, 200, 12_000, seed=0)

    # --- the easy path: hand any model a mesh (or scope one with
    # use_mesh) and the whole build -> score -> evaluate pipeline runs
    # SPMD over it, numerically identical to single-device
    data = RecommenderData(events.copy(), "userid", "movieid", "rating",
                           seed=0, verbose=False)
    data.warm_start = False
    data.holdout_size = 2
    data.prepare()
    with use_mesh(mesh):
        svd = SVDModel(data)
        svd.verbose = False
        svd.rank = 16
        print(f"mesh-built SVD relevance: {svd.evaluate('relevance')}")

    # --- the explicit ops, for custom pipelines:
    idx = events[["userid", "movieid"]].values
    val = events["rating"].values.astype(float)
    dense = dense_from_coo(idx, val, (512, 200))

    # row-sharded randomized SVD: Gram psums over the mesh
    result = distributed_randomized_svd(dense, k=16, mesh=mesh, n_iter=6)
    print(f"rSVD factors: u{result.u.shape} s{result.s.shape} "
          f"v{result.v.shape}; top sigma {float(result.s[0]):.2f}")

    # row-sharded confidence-weighted ALS
    factors = distributed_ials(dense, rank=8, mesh=mesh, num_epochs=4)
    print(f"iALS factors: user{factors.user.shape} item{factors.item.shape}")

    # event-sharded HOOI (tensor mode)
    fb_levels = events["rating"].values.astype(int) - 1
    tensor_idx = np.column_stack([idx, fb_levels])
    hooi_result = distributed_hooi(tensor_idx, np.ones(len(val)),
                                   (512, 200, 5), (8, 6, 2), mesh,
                                   num_iters=4, growth_tol=0.0)
    print(f"HOOI core: {hooi_result.core.shape}, "
          f"{len(hooi_result.growth_history)} sweeps")


if __name__ == "__main__":
    main()
