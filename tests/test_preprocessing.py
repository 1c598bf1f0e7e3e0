"""Stateless preprocessing API (dataframes + matrices).

Mirrors the reference's only formal test (``tests/preprocessing_test.py``)
and extends coverage to the matrix-level helpers.
"""
import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

from polara_tpu.preprocessing import dataframes as pdf
from polara_tpu.preprocessing import matrices as pmx


@pytest.fixture
def ts_data_short():
    """7-event, 3-user synthetic timeline (reference
    ``tests/dataset_fixtures.py:6-22``)."""
    return pd.DataFrame({
        "userid":    [0, 0, 0, 1, 1, 2, 2],
        "movieid":   [0, 1, 2, 0, 1, 2, 3],
        "rating":    [2, 4, 5, 3, 5, 4, 5],
        "timestamp": [1, 2, 3, 2, 3, 1, 2],
    })


def test_split_earliest_last(ts_data_short):
    observed, holdout, future = pdf.split_earliest_last(
        ts_data_short, userid="userid", priority="timestamp")
    # every user contributes exactly one (their latest continuous) event
    assert sorted(holdout["userid"]) == [0, 1, 2]
    for uid, group in holdout.groupby("userid"):
        user_obs = observed[observed["userid"] == uid]
        assert (user_obs["timestamp"] < group["timestamp"].iloc[0]).all()
    # no event is lost or duplicated
    total = pd.concat([observed, holdout, future]).sort_index()
    pd.testing.assert_frame_equal(total, ts_data_short)


def test_reindex_filters_invalid(ts_data_short):
    index = pd.Index([0, 1, 2], name="movieid")
    out = pdf.reindex(ts_data_short, index)
    assert (out["movieid"] >= 0).all()
    assert len(out) == 6  # movieid 3 dropped


def test_matrix_from_observations(ts_data_short):
    matrix, uidx, iidx = pdf.matrix_from_observations(
        ts_data_short, userid="userid", itemid="movieid", feedback="rating")
    assert matrix.shape == (3, 4)
    dense = matrix.toarray()
    assert dense[0, :3].tolist() == [2, 4, 5]
    # reuse the returned indexes
    matrix2, _, _ = pdf.matrix_from_observations(
        ts_data_short, userid="userid", itemid="movieid",
        user_index=uidx, item_index=iidx, feedback="rating")
    assert (matrix2.toarray() == dense).all()


def test_split_holdout_frames(ts_data_short):
    observed, holdout = pdf.split_holdout(
        ts_data_short, userid="userid", feedback="rating",
        sample_max_rated=True, random_state=np.random.RandomState(0))
    assert len(holdout) == 3
    assert sorted(holdout["userid"]) == [0, 1, 2]
    # max-rated rule
    expect = ts_data_short.groupby("userid")["rating"].max()
    got = holdout.set_index("userid")["rating"].sort_index()
    assert (got == expect).all()
    assert len(observed) + len(holdout) == len(ts_data_short)
    pdf.verify_split(observed, holdout, random_holdout=False,
                     feedback="rating", userid="userid")


def test_sample_unseen_interactions_frames(ts_data_short):
    pool = np.arange(10)
    sampled = pdf.sample_unseen_interactions(
        ts_data_short, pool, n_random=4,
        random_state=0, userid="userid", itemid="movieid")
    seen = ts_data_short.groupby("userid")["movieid"].apply(set)
    for uid, items in sampled.items():
        assert len(items) == 4
        assert not (set(items) & seen[uid])


def test_filter_sessions_by_length(ts_data_short):
    out = pdf.filter_sessions_by_length(ts_data_short, "userid",
                                        min_session_length=3)
    assert set(out["userid"]) == {0}


def _random_csr(n_users=50, n_items=40, density=0.3, seed=0):
    rs = np.random.RandomState(seed)
    dense = (rs.rand(n_users, n_items) < density) * \
        rs.randint(1, 6, (n_users, n_items))
    dense[dense.sum(axis=1) == 0, 0] = 3  # no empty rows
    return sp.csr_matrix(dense)


def test_matrix_split_holdout_max_rated():
    matrix = _random_csr()
    holdout = pmx.split_holdout(matrix, sample_max_rated=True,
                                random_state=0)
    dense = matrix.toarray()
    assert holdout.shape == (matrix.shape[0],)
    picked = dense[np.arange(dense.shape[0]), holdout]
    assert (picked == dense.max(axis=1)).all()


def test_matrix_split_holdout_random_is_seen():
    matrix = _random_csr(seed=1)
    holdout = pmx.split_holdout(matrix, sample_max_rated=False,
                                random_state=1)
    dense = matrix.toarray()
    assert (dense[np.arange(dense.shape[0]), holdout] > 0).all()


def test_mask_holdout():
    matrix = _random_csr(seed=2)
    holdout = pmx.split_holdout(matrix, random_state=2)
    masked = pmx.mask_holdout(matrix, holdout)
    assert masked[np.arange(matrix.shape[0]), holdout].sum() == 0
    assert masked.nnz == matrix.nnz - matrix.shape[0]
    # original untouched (copy=True)
    assert matrix[np.arange(matrix.shape[0]), holdout].sum() > 0


def test_sample_unseen_matrix():
    out = pmx.sample_unseen(100, 10, [5, 6, 7], random_state=0)
    assert len(set(out)) == 10
    assert not (set(out) & {5, 6, 7})


def test_sample_unseen_interactions_matrix():
    matrix = _random_csr(n_users=30, n_items=60, density=0.2, seed=3)
    holdout = pmx.split_holdout(matrix, random_state=3)
    masked = pmx.mask_holdout(matrix, holdout)
    sample = pmx.sample_unseen_interactions(masked, holdout, size=20,
                                            random_state=3, chunk_rows=7)
    dense = masked.toarray()
    for i in range(matrix.shape[0]):
        row = set(sample[i].tolist())
        assert len(row) == 20
        assert holdout[i] not in row
        assert not (row & set(np.flatnonzero(dense[i]).tolist()))


def test_rescale_matrix_matches_manual():
    matrix = _random_csr(seed=4)
    scaled, values = pmx.rescale_matrix(matrix, 0.4, axis=0,
                                        return_scaling_values=True)
    nnz = matrix.getnnz(axis=0)
    expect = np.power(np.sqrt(nnz), -0.6, where=nnz > 0,
                      out=np.ones(len(nnz)))
    np.testing.assert_allclose(values, expect)
    np.testing.assert_allclose(scaled.toarray(),
                               matrix.toarray() * expect[None, :])


def test_rescale_matrix_device_coo():
    from polara_tpu.ops.sparse import CooMatrix
    matrix = _random_csr(n_users=12, n_items=9, seed=5)
    coo = matrix.tocoo()
    device = CooMatrix.from_numpy(coo.row, coo.col,
                                  coo.data.astype(np.float32), coo.shape)
    scaled = pmx.rescale_matrix(device, 0.4, axis=0)
    expect = pmx.rescale_matrix(matrix, 0.4, axis=0).toarray()
    np.testing.assert_allclose(np.asarray(scaled.to_dense()), expect,
                               rtol=1e-5)
