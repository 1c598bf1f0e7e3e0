"""Truncated-SVD model family: PureSVD and the EigenRec-style ScaledSVD.

Reference: ``polara/recommender/models.py:800-898``.  The ARPACK ``svds``
build is replaced by randomized subspace iteration on device
(:mod:`polara_tpu.ops.rsvd`), and the scoring path
``R_test · V · Vᵀ`` runs as a fused gather → segment-sum → two MXU matmuls
per user chunk without materializing the test profile matrix.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from polara_tpu import config as defaults
from polara_tpu.models.base import RecommenderModel, EmbeddingsMixin
from polara_tpu.ops.rsvd import randomized_svd
from polara_tpu.ops.scoring import TestChunk
from polara_tpu.ops.sparse import MatmulOperator, CooMatrix
from polara_tpu.runtime.timing import track_time


class SVDModel(RecommenderModel):
    """PureSVD (Cremonesi et al.): ranks items by projection onto the
    dominant left-singular subspace of the rating matrix."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._rank = defaults.get_default("svd_rank")
        self.method = "PureSVD"
        self.factors: dict = {}
        # accuracy knobs of the randomized solver
        self.svd_tol: Optional[float] = 1e-9
        self.svd_iters = 8
        self.svd_oversample: Optional[int] = None
        self.seed: Optional[int] = 0
        # "subspace" (tolerance-controlled power iteration with block
        # auto-escalation, the accuracy-first default) or "krylov"
        # (block-Krylov Rayleigh-Ritz: ~half the passes over the rating
        # matrix per build at a slightly looser f32 floor — the
        # throughput choice for rebuild-heavy sweeps).  NOTE: the krylov
        # path is depth-controlled (depth = ``svd_iters // 2``); it has
        # no stopping test, so ``svd_tol`` and the auto-escalation it
        # drives apply ONLY to the subspace path.
        self.svd_method = "subspace"
        # optional low-precision dtype (e.g. "bfloat16") for the
        # bandwidth-bound power iterations; the Rayleigh-Ritz projection
        # stays full-precision (see ops.sparse.dense_power_operator)
        self.svd_power_dtype = None

    @property
    def rank(self) -> int:
        return self._rank

    @rank.setter
    def rank(self, new_value: int):
        if new_value != self._rank:
            self._rank = new_value
            self._check_reduced_rank(new_value)
            self._recommendations = None

    def _check_reduced_rank(self, rank: int) -> None:
        """Truncate cached factors instead of recomputing when the rank is
        lowered — the rank-sweep trick of the reference
        (``models.py:819-832``) that makes hyper-parameter search cheap."""
        for entity, factor in self.factors.items():
            if factor is None:
                continue
            if factor.shape[-1] < rank:
                self._is_ready = False
                self.factors = dict.fromkeys(self.factors.keys())
                break
            self.factors = dict(**self.factors)
            self.factors[entity] = factor[..., :rank]

    def build(self, operator: Optional[MatmulOperator] = None,
              return_factors: str = "vh"):
        mesh = self.active_mesh
        power_op = None
        true_rows = None
        if operator is not None:
            svd_matrix = operator
        else:
            matrix = self.get_training_matrix()
            # Prefer the dense HBM-resident operator: the COO segment-sum
            # matmul is scatter-bound on TPU, while rating matrices at
            # research scale fit HBM densely (SURVEY §7 "sparse-on-TPU").
            # The densified block is cached across rebuilds, keyed by the
            # scaling signature so ScaledSVD sweeps stay correct (one
            # entry at a time — sweeps must not accumulate dense blocks).
            # With a mesh, the per-device HBM budget scales by the mesh
            # size (rows shard over the ``users`` axis).
            budget = defaults.get_default("hbm_score_budget_gb") * 2**30
            if mesh is not None:
                budget *= mesh.devices.size
            n_rows, n_cols = matrix.shape
            dense_bytes = n_rows * n_cols * jnp.dtype(self.compute_dtype).itemsize
            if dense_bytes <= budget:
                from polara_tpu.ops.sparse import dense_operator
                cache = self.data.__dict__.setdefault(
                    "_device_matrix_cache", {})
                if self._scaling_signature() == () and mesh is None:
                    # unscaled single-device block == the plain dense
                    # training matrix — share ONE HBM copy with every
                    # other model on this data (iALS, similarity, ...)
                    key = None
                    dense = self.get_training_matrix(dense=True)
                else:
                    key = ("svd_dense", mesh) + self._scaling_signature()
                    dense = cache.get(key)
                track_key = key if key is not None else ("svd_dense", mesh)
                if track_key != getattr(self, "_last_dense_key", None):
                    # sweeps over this model's own scaling/mesh config
                    # must not accumulate ~GB dense blocks, but the cache
                    # is shared across models now — evict only THIS
                    # model's previous block (and its power operator),
                    # never a sibling's
                    self._evict_dense_entries(cache)
                    self._last_dense_key = track_key
                if dense is None:
                    dense = matrix.to_dense()
                    if mesh is not None:
                        # rows over the users axis; GSPMD turns the Gram
                        # products inside CholeskyQR2 into b×b psums.
                        # shard_rows zero-pads rows to a multiple of the
                        # mesh axis — zero rows leave AᵀA (hence s, V)
                        # unchanged and surface as zero rows of the left
                        # panel, sliced back off after the solve.
                        from polara_tpu.runtime.mesh import shard_rows
                        dense = shard_rows(dense, mesh)
                    cache[key] = dense
                if mesh is not None:
                    true_rows = n_rows
                svd_matrix = dense_operator(dense)
                if self.svd_power_dtype is not None:
                    from polara_tpu.ops.sparse import dense_power_operator
                    lo_key = (key or ("svd_dense", mesh)) \
                        + ("power", str(self.svd_power_dtype))
                    power_op = cache.get(lo_key)
                    if power_op is None:
                        power_op = dense_power_operator(
                            dense, jnp.dtype(self.svd_power_dtype))
                        cache[lo_key] = power_op
            else:
                # even the COO operator has a per-matmul (nnz, block)
                # intermediate; past the budget, stream it in chunks —
                # and under a mesh, shard the event stream into
                # user-row bands (one shard_map program, panel-sized
                # collectives only)
                block = self.rank + (self.svd_oversample
                                     if self.svd_oversample is not None
                                     else max(10, self.rank))
                coo_bytes = (matrix.nnz * block
                             * jnp.dtype(self.compute_dtype).itemsize)
                if coo_bytes > budget and mesh is not None:
                    from polara_tpu.parallel.distributed import \
                        distributed_chunked_rsvd
                    with track_time(self.training_time,
                                    verbose=self.verbose,
                                    model=self.method):
                        result = jax.block_until_ready(
                            distributed_chunked_rsvd(
                                np.asarray(matrix.rows),
                                np.asarray(matrix.cols),
                                np.asarray(matrix.vals), matrix.shape,
                                self.rank, mesh,
                                oversample=self.svd_oversample,
                                n_iter=self.svd_iters, seed=self.seed,
                                tol=self.svd_tol,
                                split_head=defaults.get_default(
                                    "streaming_split_head"),
                                head_budget_gb=defaults.get_default(
                                    "streaming_head_gb"),
                                dtype=jnp.dtype(self.compute_dtype)))
                    self._store_factors(result, return_factors)
                    return
                if coo_bytes > budget:
                    # tile-aligned streaming layout: 2.6x faster per
                    # pass than the event-scatter chunked operator —
                    # with the Zipf head of the stream lifted into a
                    # dense MXU block when item margins are skewed
                    # enough to pay (measured r5 on chip at Netflix
                    # scale: build+score 1.58s split vs 3.24s tiled,
                    # recorded in benchmarks/results_r05.json and
                    # docs/PERFORMANCE.md)
                    if defaults.get_default("streaming_split_head"):
                        svd_matrix = matrix.split_operator(
                            head_budget_gb=defaults.get_default(
                                "streaming_head_gb"))
                    else:
                        svd_matrix = matrix.tiled_operator()
                else:
                    svd_matrix = matrix.operator()

        # CholeskyQR2 panels SPMD cleanly (Gram psums); Householder QR
        # would gather the full panel onto one device
        qr_method = "cholesky2" if mesh is not None else None
        with track_time(self.training_time, verbose=self.verbose,
                        model=self.method):
            if self.svd_method == "krylov":
                from polara_tpu.ops.rsvd import randomized_svd_krylov
                result = randomized_svd_krylov(
                    svd_matrix, self.rank,
                    depth=max(2, self.svd_iters // 2),
                    oversample=self.svd_oversample,
                    seed=self.seed, qr_method=qr_method,
                    power_operator=power_op)
            else:
                result = randomized_svd(
                    svd_matrix, self.rank,
                    oversample=self.svd_oversample,
                    n_iter=self.svd_iters, tol=self.svd_tol,
                    seed=self.seed, qr_method=qr_method,
                    power_operator=power_op)
            result = jax.block_until_ready(result)

        self._store_factors(result, return_factors, true_rows)

    def _store_factors(self, result, return_factors: str,
                       true_rows: Optional[int] = None) -> None:
        userid, itemid, _ = self.data.fields
        u = result.u if "u" in return_factors else None
        if u is not None and true_rows is not None \
                and u.shape[0] != true_rows:
            u = u[:true_rows]
        self.factors[userid] = u
        self.factors[itemid] = result.v
        self.factors["singular_values"] = result.s

    def _scaling_signature(self) -> tuple:
        """Cache key component for the densified training matrix
        (ScaledMatrixMixin adds its scaling exponents)."""
        return ()

    def _evict_dense_entries(self, cache: dict) -> None:
        """Drop this model's previously cached dense block (and any power
        operator derived from it) when its cache key changed."""
        last = getattr(self, "_last_dense_key", None)
        if last is None:
            return
        for stale in [k for k in cache
                      if isinstance(k, tuple) and k[:len(last)] == last]:
            del cache[stale]

    def score_params(self) -> dict:
        v = self.factors[self.data.fields.itemid]
        return {"item_factors": v, "item_panel": v}

    @staticmethod
    def proj_chunk(params: dict, chunk: TestChunk) -> jax.Array:
        """User-side panel ``R_chunk @ V`` without materializing R_chunk
        (feeds both the XLA and the fused Pallas backend)."""
        v = params["item_factors"]
        contrib = chunk.vals[:, None].astype(v.dtype) * v[chunk.cols]
        contrib = jnp.where(chunk.valid[:, None], contrib, 0)
        return jax.ops.segment_sum(contrib, chunk.rows,
                                   num_segments=chunk.users.shape[0])

    @staticmethod
    def score_chunk(params: dict, chunk: TestChunk) -> jax.Array:
        return SVDModel.proj_chunk(params, chunk) @ params["item_panel"].T


class ScaledMatrixMixin:
    """EigenRec-style popularity rescaling of the rating matrix
    (reference ``models.py:864-895`` + ``preprocessing/matrices.py:71-93``):
    column j is scaled by ``nnz_j^((d-1)/2)`` with d = col_scaling (default
    0.4 damps popular items), rows likewise."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._col_scaling = 0.4
        self._row_scaling = 1
        self.method = f"{self.method}-s"

    @property
    def col_scaling(self):
        return self._col_scaling

    @col_scaling.setter
    def col_scaling(self, new_value):
        if new_value != self._col_scaling:
            self._col_scaling = new_value
            self._recommendations = None

    @property
    def row_scaling(self):
        return self._row_scaling

    @row_scaling.setter
    def row_scaling(self, new_value):
        if new_value != self._row_scaling:
            self._row_scaling = new_value
            self._recommendations = None

    def get_training_matrix(self, *args, **kwargs):
        matrix = super().get_training_matrix(*args, **kwargs)
        if not isinstance(matrix, CooMatrix):
            raise TypeError("scaled models need the COO training matrix")
        return rescale_coo(rescale_coo(matrix, self._row_scaling, axis=1),
                           self._col_scaling, axis=0)

    def _scaling_signature(self) -> tuple:
        return (float(self._row_scaling), float(self._col_scaling))


@jax.jit
def _scale_vals(vals, norms, idx, scaling):
    safe = jnp.where(norms > 0, norms, 1.0)
    factors = jnp.power(safe, scaling - 1.0).astype(vals.dtype)
    return vals * factors[idx]


def rescale_coo(matrix: CooMatrix, scaling: float, axis: int) -> CooMatrix:
    """Scale rows (axis=1) or columns (axis=0) by the binary Euclidean norm
    (sqrt of nnz count) raised to ``scaling - 1``."""
    if scaling == 1:
        return matrix
    if axis == 1:
        norms = jnp.sqrt(matrix.row_nnz())
        idx = matrix.rows
    else:
        norms = jnp.sqrt(matrix.col_nnz())
        idx = matrix.cols
    vals = _scale_vals(matrix.vals, norms, idx, float(scaling))
    return CooMatrix(matrix.rows, matrix.cols, vals, matrix.shape)


class ScaledSVD(ScaledMatrixMixin, SVDModel):
    """PureSVD-s, a.k.a. EigenRec."""
