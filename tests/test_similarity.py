import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

from polara_tpu.ops import similarity as sim
from polara_tpu.preprocessing import features as feat


def random_features(n=30, f=12, density=0.3, seed=0, weighted=False):
    rs = np.random.RandomState(seed)
    mat = (rs.rand(n, f) < density).astype(float)
    if weighted:
        mat *= rs.rand(n, f)
    # ensure no empty rows for clean oracles
    for i in range(n):
        if mat[i].sum() == 0:
            mat[i, rs.randint(f)] = 1.0
    return mat


class TestSimilarityKernels:
    def test_cosine_matches_oracle(self):
        f = random_features(weighted=True)
        got = np.asarray(sim.cosine_similarity(f, fill_diagonal=False))
        norms = np.linalg.norm(f, axis=1, keepdims=True)
        expect = (f / norms) @ (f / norms).T
        np.testing.assert_allclose(got, expect, atol=1e-6)

    def test_cosine_fill_diagonal(self):
        f = random_features()
        got = np.asarray(sim.cosine_similarity(f))
        np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-12)

    def test_jaccard_matches_oracle(self):
        f = random_features()
        got = np.asarray(sim.jaccard_similarity(f, fill_diagonal=False))
        b = f != 0
        for i in range(5):
            for j in range(5):
                inter = (b[i] & b[j]).sum()
                union = (b[i] | b[j]).sum()
                assert got[i, j] == pytest.approx(inter / union)

    def test_weighted_jaccard_matches_oracle(self):
        f = random_features(weighted=True, seed=3)
        got = np.asarray(sim.jaccard_similarity_weighted(
            f, fill_diagonal=False))
        for i in range(4):
            for j in range(4):
                mins = np.minimum(f[i], f[j]).sum()
                maxs = np.maximum(f[i], f[j]).sum()
                assert got[i, j] == pytest.approx(mins / maxs, rel=1e-5)

    def test_tfidf_matches_oracle(self):
        f = random_features()
        got = np.asarray(sim.tfidf_transform(f))
        df = 1 + (f != 0).sum(axis=0)
        idf = np.log((1 + f.shape[0]) / df)
        expect = (f != 0) * idf[None, :]
        np.testing.assert_allclose(got, expect, rtol=1e-6)

    def test_sparse_input_accepted(self):
        f = sp.csr_matrix(random_features())
        got = np.asarray(sim.cosine_similarity(f))
        assert got.shape == (30, 30)

    def test_similarity_function_lookup(self):
        assert sim.similarity_function("jaccard") is sim.jaccard_similarity
        with pytest.raises(ValueError):
            sim.similarity_function("nope")


class TestFeatureEncoding:
    def setup_method(self):
        self.meta = pd.DataFrame({
            "genre": [["action", "drama"], ["drama"],
                      ["comedy", "action", "drama"]],
            "tag": [["a"], ["b", "a"], ["c"]],
        })

    def test_feature2sparse_onehot(self):
        mat, labels = feat.feature2sparse(self.meta["genre"])
        assert mat.shape == (3, 3)
        dense = mat.toarray()
        assert dense[0].sum() == 2
        assert dense[2].sum() == 3
        assert set(labels) == {"action", "drama", "comedy"}

    def test_feature2sparse_linear_ranking(self):
        mat, labels = feat.feature2sparse(self.meta["genre"],
                                          ranking="linear")
        row0 = mat.toarray()[0]
        assert row0[labels["action"]] == pytest.approx(1.0)
        assert row0[labels["drama"]] == pytest.approx(0.5)

    def test_feature2sparse_known_labels(self):
        labels = {"drama": 0, "comedy": 1}
        mat, _ = feat.feature2sparse(self.meta["genre"], labels=labels)
        assert mat.shape == (3, 2)
        assert mat.toarray()[0, 0] == 1  # drama kept, action dropped

    def test_stack_features_identity_and_norm(self):
        stacked, labels = feat.stack_features(self.meta, add_identity=True,
                                              stacked_index=True)
        n_cols = 3 + 3 + 3  # identity + genres + tags
        assert stacked.shape == (3, n_cols)
        rows = stacked.toarray()
        np.testing.assert_allclose(rows.sum(axis=1), 1.0)
        # stacked index shifted past the identity block
        assert min(labels["genre"].values()) >= 3

    def test_build_indicator_matrix(self):
        labels = pd.Series([[0, 2], [1], [2]])
        mat = feat.build_indicator_matrix(labels)
        assert mat.shape == (3, 3)
        assert mat[0, 2]

    def test_get_similarity_data(self):
        sims = feat.get_similarity_data(self.meta, "jaccard")
        assert set(sims) == {"genre", "tag"}
        s = np.asarray(sims["genre"])
        np.testing.assert_allclose(np.diag(s), 1.0)

    def test_combine_similarity_data(self):
        combined = np.asarray(feat.combine_similarity_data(self.meta))
        assert combined.shape == (3, 3)
        np.testing.assert_allclose(np.diag(combined), 1.0)
        assert combined.max() <= 1.0 + 1e-12
