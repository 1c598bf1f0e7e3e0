"""Native C++ host kernels: compile, parity with numpy/python fallbacks."""
import numpy as np
import pytest

from polara_tpu import native
from polara_tpu.ops.samplers import split_top_continuous as py_split


def _csr_fixture(seed=0, n_rows=50, n_cols=80, density=0.2):
    rs = np.random.RandomState(seed)
    dense = rs.rand(n_rows, n_cols) < density
    rows, cols = np.nonzero(dense)
    indptr = native.build_indptr(rows.astype(np.int32), n_rows)
    return indptr, cols.astype(np.int32), n_rows, n_cols


def test_native_compiles():
    assert native.native_available(), \
        "C++ toolchain present in image; native build must succeed"


def test_build_indptr_matches_bincount():
    rs = np.random.RandomState(1)
    rows = np.sort(rs.randint(0, 30, 500)).astype(np.int32)
    indptr = native.build_indptr(rows, 30)
    expect = np.concatenate(([0], np.cumsum(np.bincount(rows,
                                                        minlength=30))))
    np.testing.assert_array_equal(indptr, expect)


def test_sample_unseen_rows_excludes_seen():
    indptr, indices, n_rows, n_cols = _csr_fixture()
    out = native.sample_unseen_rows(indptr, indices, n_cols, k=15, seed=7)
    assert out.shape == (n_rows, 15)
    for r in range(n_rows):
        seen = set(indices[indptr[r]:indptr[r + 1]].tolist())
        sampled = out[r].tolist()
        assert len(set(sampled)) == 15          # no replacement
        assert not (set(sampled) & seen)        # exclusion holds
        assert all(0 <= s < n_cols for s in sampled)


def test_sample_unseen_rows_deterministic():
    indptr, indices, _, n_cols = _csr_fixture(seed=2)
    a = native.sample_unseen_rows(indptr, indices, n_cols, k=10, seed=3)
    b = native.sample_unseen_rows(indptr, indices, n_cols, k=10, seed=3)
    np.testing.assert_array_equal(a, b)
    c = native.sample_unseen_rows(indptr, indices, n_cols, k=10, seed=4)
    assert (a != c).any()


def test_sample_unseen_rows_overflow_guard():
    indptr = np.array([0, 3], dtype=np.int64)
    indices = np.array([0, 1, 2], dtype=np.int32)
    with pytest.raises(ValueError):
        native.sample_unseen_rows(indptr, indices, n_cols=4, k=2)


def test_split_top_continuous_native_parity():
    if not native.native_available():
        pytest.skip("no toolchain")
    rs = np.random.RandomState(5)
    tasks = rs.randint(0, 200, 5000).astype(np.int64)
    priorities = rs.rand(5000)
    top_n, low_n, non_n = native.split_top_continuous(tasks, priorities)
    top_p, low_p, non_p = py_split(tasks, priorities)
    assert sorted(top_n) == sorted(top_p)
    assert sorted(low_n) == sorted(low_p)
    assert sorted(non_n) == sorted(non_p)


def test_split_top_continuous_large_routes_native():
    rs = np.random.RandomState(6)
    tasks = rs.randint(0, 500, 20_000).astype(np.int64)
    priorities = rs.rand(20_000)
    top, low, nonseq = py_split(tasks, priorities)  # routes natively
    assert len(top) + len(low) + len(nonseq) == 20_000
    # every task has exactly one top pick
    assert len(top) == len(np.unique(tasks))


def test_row_unique_counts():
    rows = np.array([0, 0, 0, 2, 2], dtype=np.int32)
    cols = np.array([1, 1, 3, 0, 4], dtype=np.int32)
    out = native.row_unique_counts(rows, cols, 4)
    np.testing.assert_array_equal(out, [2, 0, 2, 0])


def test_split_top_continuous_native_exact_order():
    """Native and Python paths return identical index *sequences*, not
    just identical sets — downstream frame row order must not depend on
    toolchain availability."""
    rs = np.random.RandomState(7)
    tasks = rs.randint(0, 50, 2000).astype(np.int64)
    priorities = rs.rand(2000)
    native_out = native.split_top_continuous(tasks, priorities)
    python_out = py_split(tasks, priorities)
    for a, b in zip(native_out, python_out):
        assert list(a) == list(b)


def test_group_top_k_matches_pandas_nlargest():
    import pandas as pd
    rs = np.random.RandomState(9)
    groups = rs.randint(0, 20, 1000).astype(np.int32)
    values = rs.randint(1, 6, 1000).astype(np.float64)  # many ties
    idx, counts = native.group_top_k(groups, values, 20, k=3)
    frame = pd.Series(values).groupby(pd.Series(groups), sort=False)
    expect = frame.nlargest(3, keep="last")
    expect_idx = set(expect.index.get_level_values(1))
    assert set(idx.tolist()) == expect_idx
    assert counts.sum() == len(expect)
    # per-group counts respected
    sizes = pd.Series(groups).value_counts()
    for g in range(20):
        assert counts[g] == min(3, sizes.get(g, 0))


def test_numpy_fallbacks_match_native():
    """Every native entry point keeps working (and agrees) without the
    compiled library."""
    rs = np.random.RandomState(11)
    groups = rs.randint(0, 15, 800).astype(np.int32)
    values = rs.randint(1, 5, 800).astype(np.float64)
    rows = np.sort(rs.randint(0, 20, 300)).astype(np.int32)

    with_lib = {
        "topk": native.group_top_k(groups, values, 15, 2),
        "indptr": native.build_indptr(rows, 20),
    }
    saved_lib, saved_flag = native._lib, native._build_failed
    native._lib, native._build_failed = None, True
    try:
        fallback_topk = native.group_top_k(groups, values, 15, 2)
        fallback_indptr = native.build_indptr(rows, 20)
        assert native.pack_seen_bits(rows, rows, 20, 64) is None
    finally:
        native._lib, native._build_failed = saved_lib, saved_flag

    assert set(with_lib["topk"][0].tolist()) \
        == set(fallback_topk[0].tolist())
    np.testing.assert_array_equal(with_lib["topk"][1], fallback_topk[1])
    np.testing.assert_array_equal(with_lib["indptr"], fallback_indptr)


def test_group_top_k_zero_k():
    groups = np.array([0, 1, 1], dtype=np.int32)
    values = np.array([1.0, 2.0, 3.0])
    idx, counts = native.group_top_k(groups, values, 2, 0)
    assert len(idx) == 0
    np.testing.assert_array_equal(counts, [0, 0])
