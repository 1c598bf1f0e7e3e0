"""Hybrid models: side-information-aware recommenders.

Reference: ``polara/recommender/hybrid/models.py``.

* :class:`SimilarityAggregation` — score by propagating the test profile
  through the item similarity matrix;
* :class:`KernelizedPMF` — PMF with graph-kernel regularization (KPMF,
  Zhou et al.);
* :class:`LCEModel` — local collective embeddings (multiplicative-update
  NMF coupling item features and interactions over an item kNN graph);
* :class:`HybridSVD` — PureSVD of the similarity-augmented matrix
  ``L_u^T R L_i`` via the implicit operator, with left/right projectors
  for scoring.  Device dense Cholesky replaces CHOLMOD
  (``polara_tpu.ops.cholesky``).
"""
from __future__ import annotations

import math
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from polara_tpu.models.base import RecommenderModel
from polara_tpu.models.mf import ProbabilisticMF
from polara_tpu.models.svd import SVDModel, ScaledMatrixMixin
from polara_tpu.ops.cholesky import CholeskyFactor, hybrid_operator
from polara_tpu.ops.factorize import KernelOperator
from polara_tpu.ops.scoring import TestChunk
from polara_tpu.runtime.timing import track_time


class SimilarityAggregation(RecommenderModel):
    """'SIM': score = R_test · S_item with zeroed diagonal
    (reference ``hybrid/models.py:25-44``)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.method = "SIM"
        self.implicit = False

    def build(self):
        similarity = self.data.item_relations
        eye = jnp.eye(similarity.shape[0], dtype=bool)
        self.item_similarity_matrix = jnp.where(
            eye, jnp.asarray(0, similarity.dtype), similarity)

    def score_params(self) -> dict:
        return {"similarity": self.item_similarity_matrix,
                "implicit": jnp.asarray(self.implicit)}

    @staticmethod
    def score_chunk(params: dict, chunk: TestChunk) -> jax.Array:
        s = params["similarity"]
        vals = jnp.where(params["implicit"],
                         jnp.ones_like(chunk.vals), chunk.vals)
        vals = jnp.where(chunk.valid, vals, 0.0).astype(s.dtype)
        profile = jnp.zeros((chunk.users.shape[0], s.shape[0]), s.dtype)
        profile = profile.at[chunk.rows, chunk.cols].add(vals)
        return profile @ s


class KernelizedRecommenderMixin:
    """Graph-kernel regularization (KPMF, reference
    ``hybrid/models.py:47-105``): regularized-laplacian ``I + gamma L`` or
    diffusion ``expm(beta L)`` kernels built from the data model's
    relations matrices."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.kernel_type = "reg"
        self.beta = 0.01
        self.gamma = 0.1
        entities = [self.data.fields.userid, self.data.fields.itemid]
        self.factor_sigma = dict.fromkeys(entities, 1.0)
        self._kernel_matrices: Dict = dict.fromkeys(entities)
        self.data.subscribe(self.data.on_change_event,
                            self._clean_kernel_data)

    def _clean_kernel_data(self):
        self._kernel_matrices = dict.fromkeys(self._kernel_matrices.keys())

    def _compute_kernel(self, laplacian: jax.Array,
                        kernel_type: Optional[str] = None) -> jax.Array:
        kernel_type = kernel_type or self.kernel_type
        if kernel_type == "dif":
            return jax.scipy.linalg.expm(self.beta * laplacian)
        if kernel_type == "reg":
            eye = jnp.eye(laplacian.shape[0], dtype=laplacian.dtype)
            return eye + self.gamma * laplacian
        raise ValueError(f"Unknown kernel type {kernel_type!r}")

    def get_kernel_matrix(self, entity: str) -> jax.Array:
        if self._kernel_matrices.get(entity) is None:
            laplacian = self.data.get_relations_matrix(entity)
            if laplacian is None:
                sigma = self.factor_sigma[entity]
                n = self.data.get_entity_index(entity).shape[0]
                kernel = (sigma ** 2) * jnp.eye(n, dtype=self.compute_dtype)
            else:
                kernel = self._compute_kernel(laplacian)
            self._kernel_matrices[entity] = kernel.astype(self.compute_dtype)
        return self._kernel_matrices[entity]

    @property
    def user_kernel_matrix(self) -> jax.Array:
        return self.get_kernel_matrix(self.data.fields.userid)

    @property
    def item_kernel_matrix(self) -> jax.Array:
        return self.get_kernel_matrix(self.data.fields.itemid)


class KernelizedPMF(KernelizedRecommenderMixin, ProbabilisticMF):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.method = "KPMF"

    def build(self, *args, **kwargs):
        kwargs.setdefault("row_kernel",
                          KernelOperator.from_dense(self.user_kernel_matrix))
        kwargs.setdefault("col_kernel",
                          KernelOperator.from_dense(self.item_kernel_matrix))
        super().build(*args, **kwargs)


# --------------------------------------------------------------------------
# Local collective embeddings
# --------------------------------------------------------------------------

def knn_graph(features: jax.Array, n_neighbors: int,
              binary: bool = True) -> jax.Array:
    """Symmetric-free kNN adjacency by euclidean distance (the sklearn
    NearestNeighbors graph of reference ``hybrid/models.py:172-181``,
    computed as one masked top-k on device).  Includes self-neighbors,
    matching ``kneighbors_graph(n_neighbors=1+k)``."""
    sq = jnp.sum(features ** 2, axis=1)
    d2 = sq[:, None] - 2.0 * (features @ features.T) + sq[None, :]
    d2 = jnp.maximum(d2, 0.0)
    neg, idx = jax.lax.top_k(-d2, min(1 + n_neighbors, d2.shape[0]))
    n = features.shape[0]
    graph = jnp.zeros((n, n), features.dtype)
    rows = jnp.repeat(jnp.arange(n), idx.shape[1])
    vals = (jnp.ones_like(neg) if binary else jnp.sqrt(-neg)).ravel()
    return graph.at[rows, idx.ravel()].set(vals)


def local_collective_embeddings(xs: jax.Array, xu: jax.Array,
                                adjacency: jax.Array, k: int = 15,
                                alpha: float = 0.1, beta: float = 0.05,
                                lamb: float = 1.0, epsilon: float = 1e-4,
                                maxiter: int = 15,
                                seed: Optional[int] = None,
                                verbose: bool = False):
    """Multiplicative-update LCE (Saveski & Mantrach; reference
    ``lib/optimize.py:309-391``) on dense device arrays — every update is
    a handful of MXU matmuls."""
    n = xs.shape[0]
    key = jax.random.key(0 if seed is None else seed)
    kw, ks, ku = jax.random.split(key, 3)
    dtype = xs.dtype
    w = jax.random.uniform(kw, (n, k), dtype)
    hs = jax.random.uniform(ks, (k, xs.shape[1]), dtype)
    hu = jax.random.uniform(ku, (k, xu.shape[1]), dtype)

    degree = jnp.sum(adjacency, axis=0)
    gamma = 1.0 - alpha
    tr_xs = jnp.sum(xs * xs)
    tr_xu = jnp.sum(xu * xu)

    @jax.jit
    def step(w, hs, hu):
        wtw = w.T @ w
        hs_new = hs * (alpha * (w.T @ xs)) / jnp.maximum(
            alpha * (wtw @ hs) + lamb * hs, 1e-10)
        hu_new = hu * (gamma * (w.T @ xu)) / jnp.maximum(
            gamma * (wtw @ hu) + lamb * hu, 1e-10)
        num = (alpha * (xs @ hs_new.T) + gamma * (xu @ hu_new.T)
               + beta * (adjacency @ w))
        den = (alpha * (w @ (hs_new @ hs_new.T))
               + gamma * (w @ (hu_new @ hu_new.T))
               + beta * (degree[:, None] * w) + lamb * w)
        w_new = w * num / jnp.maximum(den, 1e-10)

        wtw = w_new.T @ w_new
        t1 = alpha * (tr_xs - 2 * jnp.sum(hs_new * (w_new.T @ xs))
                      + jnp.sum(hs_new * (wtw @ hs_new)))
        t2 = gamma * (tr_xu - 2 * jnp.sum(hu_new * (w_new.T @ xu))
                      + jnp.sum(hu_new * (wtw @ hu_new)))
        t3 = beta * (jnp.sum(w_new * (degree[:, None] * w_new))
                     - jnp.sum(w_new * (adjacency @ w_new)))
        t4 = lamb * (jnp.trace(wtw) + jnp.sum(hs_new * hs_new)
                     + jnp.sum(hu_new * hu_new))
        return w_new, hs_new, hu_new, t1 + t2 + t3 + t4

    history = []
    for it in range(maxiter + 1):
        w, hs, hu, objective = step(w, hs, hu)
        history.append(float(objective))
        if verbose and it > 0:
            print(f"Iteration: {it + 1} Objective: {history[-1]} "
                  f"Delta: {abs(history[-1] - history[-2])}")
        if it > 0 and abs(history[-1] - history[-2]) < epsilon:
            break
    return w, hu, hs


class LCEModel(RecommenderModel):
    def __init__(self, *args, item_features=None, **kwargs):
        super().__init__(*args, **kwargs)
        self._rank = 10
        self.factors: dict = {}
        self.alpha = 0.1
        self.beta = 0.05
        self.max_neighbours = 10
        self.item_features = item_features
        self.binary_features = True
        self._item_data = None
        self.item_features_labels = None
        self.seed = None
        self.show_error = False
        self.regularization = 1.0
        self.max_iterations = 15
        self.tolerance = 1e-4
        self.method = "LCE"
        self.data.subscribe(self.data.on_change_event, self._clean_metadata)

    def _clean_metadata(self):
        self._item_data = None
        self.item_features_labels = None

    @property
    def rank(self):
        return self._rank

    @rank.setter
    def rank(self, new_value):
        if new_value != self._rank:
            self._rank = new_value
            self._is_ready = False
            self._recommendations = None

    @property
    def item_data(self):
        if self.item_features is None:
            return None
        if self._item_data is None:
            item_index = self.data.get_entity_index(self.data.fields.itemid)
            reindexed = self.item_features.reindex(item_index["old"].values)
            self._item_data = reindexed.apply(
                lambda col: col.map(lambda v: v if isinstance(v, (list,
                                                                  tuple,
                                                                  set))
                                    else []))
        return self._item_data

    def build(self):
        from polara_tpu.preprocessing.features import stack_features
        xs_sparse, labels = stack_features(self.item_data, normalize=False)
        xs = jnp.asarray(xs_sparse.toarray(), self.compute_dtype)
        coo = self.get_training_matrix()
        xu = coo.to_dense().T  # items x users

        n_nbrs = min(self.max_neighbours, int(math.sqrt(xs.shape[0])))
        adjacency = knn_graph(xs, n_nbrs, binary=self.binary_features)

        with track_time(self.training_time, verbose=self.verbose,
                        model=self.method):
            w, hu, hs = local_collective_embeddings(
                xs, xu, adjacency, k=self.rank, alpha=self.alpha,
                beta=self.beta, lamb=self.regularization,
                epsilon=self.tolerance, maxiter=self.max_iterations,
                seed=self.seed, verbose=self.show_error)
            jax.block_until_ready(w)

        userid = self.data.fields.userid
        itemid = self.data.fields.itemid
        self.factors[userid] = hu.T
        self.factors[itemid] = w
        self.factors[f"{itemid}_features"] = hs.T
        self.item_features_labels = labels

    def score_params(self) -> dict:
        return {"user_factors": self.factors[self.data.fields.userid],
                "item_factors": self.factors[self.data.fields.itemid],
                "item_panel": self.factors[self.data.fields.itemid]}

    # same factor-lookup scoring (and shared compiled step) as PMF
    score_chunk = staticmethod(ProbabilisticMF.score_chunk)
    proj_chunk = staticmethod(ProbabilisticMF.proj_chunk)

    def get_recommendations(self):
        if self.data.warm_start:
            raise NotImplementedError("LCE has no warm-start folding-in")
        return super().get_recommendations()


# --------------------------------------------------------------------------
# HybridSVD
# --------------------------------------------------------------------------

class CholeskyFactorsMixin:
    """Per-entity Cholesky factors of ``S + beta I`` with
    ``beta = (1 - w)/w`` (reference ``hybrid/models.py:228-332``)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        entities = [self.data.fields.userid, self.data.fields.itemid]
        self._cholesky: Dict = dict.fromkeys(entities)
        self._features_weight = 0.5
        self.data.subscribe(self.data.on_change_event, self._clean_cholesky)

    def _clean_cholesky(self):
        self._cholesky = dict.fromkeys(self._cholesky.keys())

    @property
    def features_weight(self):
        return self._features_weight

    @features_weight.setter
    def features_weight(self, new_value):
        if new_value != self._features_weight:
            self._features_weight = new_value
            beta = (1.0 - new_value) / new_value
            for entity, factor in self._cholesky.items():
                if factor is not None:
                    similarity = self.data.get_relations_matrix(entity)
                    factor.update_inplace(
                        similarity.astype(self.compute_dtype), beta)
            self._renew_model()

    def get_cholesky_factor(self, entity: str) -> Optional[CholeskyFactor]:
        if self._cholesky.get(entity) is None:
            similarity = self.data.get_relations_matrix(entity)
            if similarity is None:
                return None
            beta = (1.0 - self.features_weight) / self.features_weight
            if self.verbose:
                print(f"Performing dense Cholesky decomposition for "
                      f"{entity} similarity")
            self._cholesky[entity] = CholeskyFactor.factorize(
                similarity.astype(self.compute_dtype), beta)
        return self._cholesky[entity]

    @property
    def item_cholesky_factor(self):
        return self.get_cholesky_factor(self.data.fields.itemid)

    @property
    def user_cholesky_factor(self):
        return self.get_cholesky_factor(self.data.fields.userid)

    def build_item_projector(self, v: jax.Array) -> None:
        cholesky_items = self.item_cholesky_factor
        if cholesky_items is None:
            return
        itemid = self.data.fields.itemid
        if self.verbose:
            print(f"Building {itemid} projector for {self.method}")
        self.factors[f"{itemid}_projector_left"] = \
            cholesky_items.T.solve(v)
        self.factors[f"{itemid}_projector_right"] = cholesky_items.dot(v)

    def get_item_projector(self):
        itemid = self.data.fields.itemid
        return (self.factors.get(f"{itemid}_projector_left"),
                self.factors.get(f"{itemid}_projector_right"))


class HybridSVD(CholeskyFactorsMixin, SVDModel):
    """SVD of the similarity-augmented rating matrix via the implicit
    ``L_u^T R L_i`` operator; scoring projects test profiles through the
    right/left projectors (reference ``hybrid/models.py:335-394``)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.method = "HybridSVD"
        self.precompute_auxiliary_matrix = False

    def _check_reduced_rank(self, rank):
        super()._check_reduced_rank(rank)
        vl, vr = self.get_item_projector()
        if vl is not None and rank < vl.shape[1]:
            itemid = self.data.fields.itemid
            self.factors[f"{itemid}_projector_left"] = vl[:, :rank]
            self.factors[f"{itemid}_projector_right"] = vr[:, :rank]

    def build(self, *args, **kwargs):
        from polara_tpu import config as defaults
        coo = self.get_training_matrix()
        cholesky_items = self.item_cholesky_factor
        cholesky_users = self.user_cholesky_factor
        budget = int(defaults.get_default("hbm_score_budget_gb") * 2**30)
        operator = hybrid_operator(
            coo,
            cholesky_users.L if cholesky_users is not None else None,
            cholesky_items.L if cholesky_items is not None else None,
            dense_budget_bytes=budget)
        super().build(*args, operator=operator, **kwargs)
        self.build_item_projector(self.factors[self.data.fields.itemid])

    def score_params(self) -> dict:
        vl, vr = self.get_item_projector()
        if vl is None:
            return super().score_params()
        return {"projector_left": vl, "projector_right": vr,
                "item_panel": vl}

    @staticmethod
    def proj_chunk(params: dict, chunk: TestChunk) -> jax.Array:
        if "projector_right" not in params:
            return SVDModel.proj_chunk(params, chunk)
        vr = params["projector_right"]
        contrib = chunk.vals[:, None].astype(vr.dtype) * vr[chunk.cols]
        contrib = jnp.where(chunk.valid[:, None], contrib, 0)
        return jax.ops.segment_sum(contrib, chunk.rows,
                                   num_segments=chunk.users.shape[0])

    @staticmethod
    def score_chunk(params: dict, chunk: TestChunk) -> jax.Array:
        if "projector_left" not in params:
            return SVDModel.score_chunk(params, chunk)
        return HybridSVD.proj_chunk(params, chunk) \
            @ params["projector_left"].T


class ScaledHybridSVD(ScaledMatrixMixin, HybridSVD):
    pass
