import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from polara_tpu.data.hybrid import SimilarityDataModel
from polara_tpu.models.hybrid import (SimilarityAggregation, KernelizedPMF,
                                      LCEModel, HybridSVD, ScaledHybridSVD,
                                      knn_graph, local_collective_embeddings)
from polara_tpu.models.svd import SVDModel
from polara_tpu.ops.cholesky import CholeskyFactor, hybrid_operator
from polara_tpu.ops.sparse import CooMatrix


def make_similarity(n, seed=0):
    rs = np.random.RandomState(seed)
    base = rs.rand(n, 5)
    sim = base @ base.T
    sim = sim / np.sqrt(np.outer(np.diag(sim), np.diag(sim)))
    return sim


@pytest.fixture
def hybrid_data(synthetic_interactions):
    df = synthetic_interactions
    n_items = df["movieid"].nunique()
    item_ids = np.sort(df["movieid"].unique())
    sim = make_similarity(len(item_ids))
    data = SimilarityDataModel(
        df, "userid", "movieid", "rating",
        relations_matrices={"movieid": sim, "userid": None},
        relations_indices={"movieid": item_ids, "userid": None},
        seed=0, verbose=False)
    data.warm_start = False
    data.holdout_size = 2
    data.update()
    return data


class TestCholeskyFactor:
    def test_factorization_roundtrip(self):
        sim = jnp.asarray(make_similarity(12))
        factor = CholeskyFactor.factorize(sim, beta=1.0)
        recon = np.asarray(factor.L @ factor.L.T)
        np.testing.assert_allclose(recon, np.asarray(sim) + np.eye(12),
                                   atol=1e-8)

    def test_transpose_solve(self):
        sim = jnp.asarray(make_similarity(8))
        factor = CholeskyFactor.factorize(sim, beta=0.5)
        y = jnp.asarray(np.random.RandomState(0).randn(8, 3))
        x = factor.T.solve(y)
        np.testing.assert_allclose(np.asarray(factor.L.T @ x),
                                   np.asarray(y), atol=1e-8)

    def test_hybrid_operator_matches_explicit(self):
        rs = np.random.RandomState(1)
        r = rs.rand(10, 8) * (rs.rand(10, 8) < 0.5)
        rows, cols = np.nonzero(r)
        coo = CooMatrix.from_numpy(rows, cols, r[rows, cols], r.shape,
                                   dtype=jnp.float64)
        l_i = jnp.asarray(np.linalg.cholesky(make_similarity(8) +
                                             np.eye(8)))
        op = hybrid_operator(coo, None, l_i)
        x = jnp.asarray(rs.randn(8, 3))
        expect = r @ np.asarray(l_i) @ np.asarray(x)
        np.testing.assert_allclose(np.asarray(op.mm(x)), expect,
                                   atol=1e-8)
        y = jnp.asarray(rs.randn(10, 3))
        expect_r = np.asarray(l_i).T @ (r.T @ np.asarray(y))
        np.testing.assert_allclose(np.asarray(op.rmm(y)), expect_r,
                                   atol=1e-8)


class TestSimilarityData:
    def test_relations_reindexed(self, hybrid_data):
        rel = hybrid_data.item_relations
        n_items = hybrid_data.index.itemid.shape[0]
        assert rel.shape == (n_items, n_items)
        np.testing.assert_allclose(np.asarray(jnp.diagonal(rel)), 1.0)

    def test_relations_invalidated_on_change(self, hybrid_data):
        _ = hybrid_data.item_relations
        assert hybrid_data._relations["movieid"] is not None
        hybrid_data.test_fold = 1
        hybrid_data.update()
        assert hybrid_data._relations["movieid"] is None


class TestSimilarityAggregation:
    def test_end_to_end(self, hybrid_data):
        model = SimilarityAggregation(hybrid_data)
        model.verbose = False
        scores = model.evaluate()
        assert len(scores) == 4


class TestHybridSVD:
    def test_build_and_evaluate(self, hybrid_data):
        model = HybridSVD(hybrid_data)
        model.verbose = False
        model.rank = 6
        scores = model.evaluate()
        assert len(scores) == 4
        vl, vr = model.get_item_projector()
        assert vl.shape == vr.shape

    def test_differs_from_pure_svd(self, hybrid_data):
        hybrid = HybridSVD(hybrid_data)
        hybrid.verbose = False
        hybrid.rank = 6
        hybrid.build()
        pure = SVDModel(hybrid_data)
        pure.verbose = False
        pure.rank = 6
        pure.build()
        s_h = np.asarray(hybrid.factors["singular_values"])
        s_p = np.asarray(pure.factors["singular_values"])
        assert not np.allclose(s_h, s_p)

    def test_rank_truncation_rounds_projectors(self, hybrid_data):
        model = HybridSVD(hybrid_data)
        model.verbose = False
        model.rank = 8
        model.build()
        model.rank = 4
        vl, vr = model.get_item_projector()
        assert vl.shape[1] == 4 and vr.shape[1] == 4
        assert model._is_ready

    def test_features_weight_refactorizes(self, hybrid_data):
        model = HybridSVD(hybrid_data)
        model.verbose = False
        model.rank = 4
        model.build()
        l_before = np.asarray(model.item_cholesky_factor.L).copy()
        model.features_weight = 0.8
        l_after = np.asarray(model.item_cholesky_factor.L)
        assert not np.allclose(l_before, l_after)
        assert not model._is_ready

    def test_scaled_variant_builds(self, hybrid_data):
        model = ScaledHybridSVD(hybrid_data)
        model.verbose = False
        model.rank = 4
        model.build()
        assert model.factors["singular_values"].shape == (4,)


class TestKPMF:
    def test_kernels_and_training(self, hybrid_data):
        model = KernelizedPMF(hybrid_data, seed=0)
        model.verbose = False
        model.rank = 4
        model.num_epochs = 3
        model.build()
        k_item = model.item_kernel_matrix
        n_items = hybrid_data.index.itemid.shape[0]
        assert k_item.shape == (n_items, n_items)
        # no user relations -> identity kernel
        k_user = model.user_kernel_matrix
        np.testing.assert_allclose(np.asarray(jnp.diagonal(k_user)), 1.0)
        assert model.rmse_history


class TestLCE:
    def test_knn_graph(self):
        rs = np.random.RandomState(0)
        f = jnp.asarray(rs.rand(20, 6))
        g = np.asarray(knn_graph(f, 3))
        assert g.shape == (20, 20)
        np.testing.assert_array_equal(g.sum(axis=1), 4)  # self + 3
        assert (np.diag(g) == 1).all()

    def test_lce_objective_decreases(self):
        rs = np.random.RandomState(1)
        xs = jnp.asarray(rs.rand(15, 6))
        xu = jnp.asarray(rs.rand(15, 12))
        a = knn_graph(xs, 3)
        w, hu, hs = local_collective_embeddings(xs, xu, a, k=4,
                                                maxiter=10, seed=0)
        assert w.shape == (15, 4)
        assert hu.shape == (4, 12)
        assert hs.shape == (4, 6)
        assert bool(jnp.all(w >= 0))

    def test_lce_model_end_to_end(self, hybrid_data):
        item_index = hybrid_data.index.itemid
        rs = np.random.RandomState(0)
        features = pd.DataFrame(
            {"genre": [[rs.randint(5)] for _ in range(len(item_index))]},
            index=item_index["old"].values)
        model = LCEModel(hybrid_data, item_features=features)
        model.verbose = False
        model.rank = 4
        model.max_iterations = 3
        scores = model.evaluate("relevance")
        assert 0 <= scores.recall <= 1
