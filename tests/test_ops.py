import numpy as np
import pytest
import scipy.sparse as sp
from scipy.sparse.linalg import svds

import jax.numpy as jnp

from polara_tpu.ops.sparse import (CooMatrix, chunked_coo_operator,
                                   dense_operator, inner_product_at,
                                   pad_rows, split_coo_operator,
                                   tiled_coo_operator)
from polara_tpu.ops.rsvd import randomized_svd, principal_angles_max_sin
from polara_tpu.ops.topk import mask_and_topk, top_k_indices, downvote_items


def random_rating_matrix(m=120, n=80, density=0.2, seed=0):
    rs = np.random.RandomState(seed)
    mat = sp.random(m, n, density=density, random_state=rs,
                    data_rvs=lambda k: rs.randint(1, 6, k).astype(float))
    return mat.tocsr()


class TestCooMatrix:
    def test_dense_roundtrip(self):
        csr = random_rating_matrix()
        coo = csr.tocoo()
        device = CooMatrix.from_numpy(coo.row, coo.col, coo.data, coo.shape,
                                      dtype=jnp.float64)
        np.testing.assert_allclose(np.asarray(device.to_dense()),
                                   csr.toarray())

    def test_matmul_matches_scipy(self):
        csr = random_rating_matrix()
        coo = csr.tocoo()
        device = CooMatrix.from_numpy(coo.row, coo.col, coo.data, coo.shape,
                                      dtype=jnp.float64)
        x = np.random.RandomState(1).randn(csr.shape[1], 7)
        np.testing.assert_allclose(np.asarray(device.matmul(jnp.asarray(x))),
                                   csr @ x, rtol=1e-10)
        y = np.random.RandomState(2).randn(csr.shape[0], 5)
        np.testing.assert_allclose(
            np.asarray(device.rmatmul(jnp.asarray(y))), csr.T @ y,
            rtol=1e-10)

    def test_nnz_counts(self):
        csr = random_rating_matrix()
        coo = csr.tocoo()
        device = CooMatrix.from_numpy(coo.row, coo.col, coo.data, coo.shape)
        np.testing.assert_array_equal(np.asarray(device.row_nnz()),
                                      csr.getnnz(axis=1))
        np.testing.assert_array_equal(np.asarray(device.col_nnz()),
                                      csr.getnnz(axis=0))


class TestChunkedCooOperator:
    """Streaming operator == dense operator at small scale; the chunk
    machinery (padding, boundary-crossing rows, clamped starts) must be
    invisible."""

    def _coo(self, m=230, n=97, density=0.15, seed=4):
        csr = random_rating_matrix(m, n, density=density, seed=seed)
        coo = csr.tocoo()
        return csr, coo

    @pytest.mark.parametrize("event_chunk", [37, 256, 10 ** 9])
    def test_matmul_parity(self, event_chunk):
        csr, coo = self._coo()
        op = chunked_coo_operator(coo.row, coo.col, coo.data, coo.shape,
                                  event_chunk=event_chunk,
                                  dtype=jnp.float64)
        x = np.random.RandomState(1).randn(csr.shape[1], 9)
        np.testing.assert_allclose(np.asarray(op.mm(jnp.asarray(x))),
                                   csr @ x, rtol=1e-10)
        y = np.random.RandomState(2).randn(csr.shape[0], 6)
        np.testing.assert_allclose(np.asarray(op.rmm(jnp.asarray(y))),
                                   csr.T @ y, rtol=1e-10)

    def test_unsorted_input_is_sorted(self):
        csr, coo = self._coo()
        perm = np.random.RandomState(3).permutation(coo.nnz)
        op = chunked_coo_operator(coo.row[perm], coo.col[perm],
                                  coo.data[perm], coo.shape,
                                  event_chunk=64, dtype=jnp.float64)
        x = np.random.RandomState(1).randn(csr.shape[1], 5)
        np.testing.assert_allclose(np.asarray(op.mm(jnp.asarray(x))),
                                   csr @ x, rtol=1e-10)

    def test_single_row_and_empty_guard(self):
        with pytest.raises(ValueError):
            chunked_coo_operator(np.array([], np.int32),
                                 np.array([], np.int32),
                                 np.array([], np.float64), (3, 4))
        # all events on one row, chunk smaller than nnz
        rows = np.zeros(10, np.int32)
        cols = np.arange(10, dtype=np.int32)
        vals = np.arange(1.0, 11.0)
        op = chunked_coo_operator(rows, cols, vals, (5, 12), event_chunk=3,
                                  dtype=jnp.float64)
        x = np.random.RandomState(0).randn(12, 4)
        expect = np.zeros((5, 4))
        expect[0] = (vals[:, None] * x[cols]).sum(axis=0)
        np.testing.assert_allclose(np.asarray(op.mm(jnp.asarray(x))),
                                   expect, rtol=1e-10)

    def test_unsigned_unsorted_rows_still_sorted(self):
        """np.diff wraps under unsigned dtypes, which would 'prove' any
        stream sorted and skip the device sort (and mis-encode the
        uint8 deltas); the int64-diff guard must hold for uint rows."""
        csr, coo = self._coo()
        perm = np.random.RandomState(8).permutation(coo.nnz)
        op = chunked_coo_operator(coo.row[perm].astype(np.uint32),
                                  coo.col[perm].astype(np.uint32),
                                  coo.data[perm], coo.shape,
                                  event_chunk=64, dtype=jnp.float64)
        x = np.random.RandomState(1).randn(csr.shape[1], 5)
        np.testing.assert_allclose(np.asarray(op.mm(jnp.asarray(x))),
                                   csr @ x, rtol=1e-10)

    def test_upload_compression_fallbacks(self):
        """Non-integer values and large sorted-row gaps must fall back
        to the raw wire format, bit-exactly."""
        from polara_tpu.ops.sparse import _upload_event_stream
        rs = np.random.RandomState(2)
        # gaps > 255 defeat the uint8 delta encoding; fractional values
        # defeat the int8 code path; m > 2**15 defeats int16 rows
        rows = np.sort(rs.randint(0, 10 ** 6, 400)).astype(np.int32)
        cols = rs.randint(0, 70_000, 400).astype(np.int32)
        vals = rs.rand(400).astype(np.float64) + 0.25
        r, c, v, srt = _upload_event_stream(rows, cols, vals,
                                            (10 ** 6, 70_000),
                                            jnp.float64, False)
        assert srt
        np.testing.assert_array_equal(np.asarray(r), rows)
        np.testing.assert_array_equal(np.asarray(c), cols)
        np.testing.assert_array_equal(np.asarray(v), vals)

    def test_upload_compression_applies(self):
        """Sorted small-delta rows, small catalog, integer ratings: all
        three codecs engage and decode exactly."""
        from polara_tpu.ops.sparse import _upload_event_stream
        rs = np.random.RandomState(3)
        rows = np.repeat(np.arange(50, dtype=np.int32),
                         rs.randint(1, 9, 50))
        cols = rs.randint(0, 300, rows.size).astype(np.int64)
        vals = rs.randint(1, 6, rows.size).astype(np.float32)
        r, c, v, srt = _upload_event_stream(rows, cols, vals, (50, 300),
                                            jnp.float32, False)
        assert srt
        np.testing.assert_array_equal(np.asarray(r), rows)
        np.testing.assert_array_equal(np.asarray(c), cols)
        np.testing.assert_array_equal(np.asarray(v), vals)

    def test_device_staged_chunked_operator(self):
        """CooMatrix.chunked_operator (device prep) == host-staged
        chunked_coo_operator == dense."""
        csr, coo = self._coo(m=150, n=88, seed=9)
        device = CooMatrix.from_numpy(coo.row, coo.col, coo.data,
                                      coo.shape, dtype=jnp.float64)
        op = device.chunked_operator(event_chunk=93)
        x = np.random.RandomState(1).randn(csr.shape[1], 7)
        np.testing.assert_allclose(np.asarray(op.mm(jnp.asarray(x))),
                                   csr @ x, rtol=1e-10)
        y = np.random.RandomState(2).randn(csr.shape[0], 4)
        np.testing.assert_allclose(np.asarray(op.rmm(jnp.asarray(y))),
                                   csr.T @ y, rtol=1e-10)

    def test_svd_build_routes_past_budget_to_chunked(self):
        """With a budget too small even for the plain COO intermediate,
        SVDModel.build must route to the streaming operator and still
        produce the same recommendations."""
        from polara_tpu import config as defaults
        from polara_tpu.data import RecommenderData
        from polara_tpu.datasets import make_synthetic_interactions
        from polara_tpu.models import SVDModel

        df = make_synthetic_interactions(n_users=220, n_items=140,
                                         n_events=5000, seed=13)
        data = RecommenderData(df, "userid", "movieid", "rating")
        data.prepare()
        base = SVDModel(data)
        base.rank = 10
        recs_dense = np.asarray(base.recommendations)

        old = defaults.get_default("hbm_score_budget_gb")
        defaults.set_default("hbm_score_budget_gb", 1e-6)
        try:
            tiny = SVDModel(data)
            tiny.rank = 10
            tiny.build()
            # the budget also gates a smaller scoring chunk plan; compare
            # factors' spectra and the recommendations themselves
            recs_chunked = np.asarray(tiny.recommendations)
        finally:
            defaults.set_default("hbm_score_budget_gb", old)
        assert (recs_dense == recs_chunked).mean() > 0.98

    def test_rsvd_through_chunked_operator(self):
        csr, coo = self._coo(m=180, n=120, density=0.25, seed=7)
        op = chunked_coo_operator(coo.row, coo.col, coo.data, coo.shape,
                                  event_chunk=501, dtype=jnp.float64)
        dense = jnp.asarray(csr.toarray(), jnp.float64)
        res_chunk = randomized_svd(op, 8, tol=1e-12, max_iter=300, seed=5,
                                   dtype=jnp.float64)
        res_dense = randomized_svd(dense, 8, tol=1e-12, max_iter=300,
                                   seed=5, dtype=jnp.float64)
        np.testing.assert_allclose(np.asarray(res_chunk.s),
                                   np.asarray(res_dense.s), rtol=1e-9)
        assert principal_angles_max_sin(res_chunk.v, res_dense.v) < 1e-7


class TestTiledCooOperator:
    """Tile-aligned streaming operator == dense at small scale.  The
    tile machinery (per-entity padding, chunk-boundary-crossing
    entities, chunk-alignment tiles owned by the last entity, clamped
    spans) must be invisible."""

    def _coo(self, m=230, n=97, density=0.15, seed=4):
        csr = random_rating_matrix(m, n, density=density, seed=seed)
        return csr, csr.tocoo()

    @pytest.mark.parametrize("tile,event_chunk",
                             [(4, 16), (8, 56), (16, 10 ** 9), (128, 256)])
    def test_matmul_parity(self, tile, event_chunk):
        csr, coo = self._coo()
        op = tiled_coo_operator(coo.row, coo.col, coo.data, coo.shape,
                                event_chunk=event_chunk, tile=tile,
                                dtype=jnp.float64)
        x = np.random.RandomState(1).randn(csr.shape[1], 9)
        np.testing.assert_allclose(np.asarray(op.mm(jnp.asarray(x))),
                                   csr @ x, rtol=1e-10)
        y = np.random.RandomState(2).randn(csr.shape[0], 6)
        np.testing.assert_allclose(np.asarray(op.rmm(jnp.asarray(y))),
                                   csr.T @ y, rtol=1e-10)

    def test_unsorted_input_and_empty_entities(self):
        """Unsorted events sort on staging; rows/cols with no events
        (incl. the trailing ones) produce zero output rows."""
        rs = np.random.RandomState(3)
        m, n, nnz = 41, 29, 150
        rows = rs.randint(0, m - 5, nnz).astype(np.int32)   # last 5 empty
        cols = rs.randint(0, n - 3, nnz).astype(np.int32)
        vals = rs.randn(nnz)
        dense = np.zeros((m, n))
        np.add.at(dense, (rows, cols), vals)
        op = tiled_coo_operator(rows, cols, vals, (m, n), event_chunk=40,
                                tile=8, dtype=jnp.float64)
        x = rs.randn(n, 5)
        np.testing.assert_allclose(np.asarray(op.mm(jnp.asarray(x))),
                                   dense @ x, rtol=1e-10, atol=1e-12)
        y = rs.randn(m, 4)
        np.testing.assert_allclose(np.asarray(op.rmm(jnp.asarray(y))),
                                   dense.T @ y, rtol=1e-10, atol=1e-12)

    def test_hot_entity_spanning_many_chunks(self):
        """One entity with more events than a whole chunk accumulates
        across chunk boundaries."""
        rs = np.random.RandomState(5)
        rows = np.zeros(100, np.int32)
        cols = rs.randint(0, 12, 100).astype(np.int32)
        vals = rs.randn(100)
        dense = np.zeros((7, 12))
        np.add.at(dense, (rows, cols), vals)
        op = tiled_coo_operator(rows, cols, vals, (7, 12), event_chunk=16,
                                tile=4, dtype=jnp.float64)
        x = rs.randn(12, 3)
        np.testing.assert_allclose(np.asarray(op.mm(jnp.asarray(x))),
                                   dense @ x, rtol=1e-10)

    def test_empty_guard(self):
        with pytest.raises(ValueError):
            tiled_coo_operator(np.array([], np.int32),
                               np.array([], np.int32),
                               np.array([], np.float64), (3, 4))

    def test_rsvd_through_tiled_operator(self):
        csr, coo = self._coo(m=180, n=120, density=0.25, seed=7)
        op = tiled_coo_operator(coo.row, coo.col, coo.data, coo.shape,
                                event_chunk=512, tile=8,
                                dtype=jnp.float64)
        dense = jnp.asarray(csr.toarray(), jnp.float64)
        res_tiled = randomized_svd(op, 8, tol=1e-12, max_iter=300, seed=5,
                                   dtype=jnp.float64)
        res_dense = randomized_svd(dense, 8, tol=1e-12, max_iter=300,
                                   seed=5, dtype=jnp.float64)
        np.testing.assert_allclose(np.asarray(res_tiled.s),
                                   np.asarray(res_dense.s), rtol=1e-9)
        assert principal_angles_max_sin(res_tiled.v, res_dense.v) < 1e-7


class TestSplitCooOperator:
    """Head/tail split streaming operator == dense at small scale.  The
    head block is a lossless storage format (int8 for integer ratings),
    so parity bars are the same 1e-10 as the plain tiled operator."""

    def _skewed_coo(self, m=160, n=60, seed=11, n_events=900):
        """Zipf-ish item margins so a small head captures real mass."""
        rs = np.random.RandomState(seed)
        w = 1.0 / np.arange(1, n + 1) ** 0.9
        cols = rs.choice(n, size=n_events, p=w / w.sum())
        rows = rs.randint(0, m, n_events)
        vals = rs.randint(1, 6, n_events).astype(float)
        dense = np.zeros((m, n))
        np.add.at(dense, (rows, cols), vals)   # duplicate pairs add
        return rows.astype(np.int32), cols.astype(np.int32), vals, dense

    @pytest.mark.parametrize("head_items", [8, 31, 60])
    def test_matmul_parity_int8_head(self, head_items):
        rows, cols, vals, dense = self._skewed_coo()
        op = split_coo_operator(rows, cols, vals, dense.shape,
                                head_items=head_items, event_chunk=64,
                                tile=8, dtype=jnp.float64)
        rs = np.random.RandomState(1)
        x = rs.randn(dense.shape[1], 7)
        np.testing.assert_allclose(np.asarray(op.mm(jnp.asarray(x))),
                                   dense @ x, rtol=1e-10, atol=1e-12)
        y = rs.randn(dense.shape[0], 5)
        np.testing.assert_allclose(np.asarray(op.rmm(jnp.asarray(y))),
                                   dense.T @ y, rtol=1e-10, atol=1e-12)

    def test_int8_storage_engaged_for_integer_ratings(self):
        rows, cols, vals, dense = self._skewed_coo()
        op = split_coo_operator(rows, cols, vals, dense.shape,
                                head_items=16, dtype=jnp.float64)
        head = op.operands[0][0]
        assert head.dtype == jnp.int8
        assert head.ndim == 3

    def test_duplicate_sums_past_int8_demote_head(self):
        """Per-cell sums of duplicate (row, col) events can exceed 127
        even when every individual value fits int8 — the head must
        demote to the float dtype instead of wrapping (ADVICE r04)."""
        rows, cols, vals, dense = self._skewed_coo()
        # hammer one head cell with 40 duplicate 5-star events: sum 200
        rows = np.concatenate([rows, np.full(40, 3, np.int32)])
        cols = np.concatenate([cols, np.full(40, cols[0], np.int32)])
        vals = np.concatenate([vals, np.full(40, 5.0)])
        dense = np.zeros(dense.shape)
        np.add.at(dense, (rows, cols), vals)
        op = split_coo_operator(rows, cols, vals, dense.shape,
                                head_items=16, event_chunk=128, tile=8,
                                dtype=jnp.float64)
        assert op.operands[0][0].dtype == jnp.float64
        rs = np.random.RandomState(7)
        x = rs.randn(dense.shape[1], 4)
        np.testing.assert_allclose(np.asarray(op.mm(jnp.asarray(x))),
                                   dense @ x, rtol=1e-10, atol=1e-12)
        y = rs.randn(dense.shape[0], 3)
        np.testing.assert_allclose(np.asarray(op.rmm(jnp.asarray(y))),
                                   dense.T @ y, rtol=1e-10, atol=1e-12)

    def test_float_values_keep_float_head(self):
        rows, cols, vals, dense = self._skewed_coo(seed=3)
        rs = np.random.RandomState(9)
        vals = vals + rs.rand(len(vals))     # non-integer values
        dense = np.zeros(dense.shape)
        np.add.at(dense, (rows, cols), vals)
        op = split_coo_operator(rows, cols, vals, dense.shape,
                                head_items=16, event_chunk=128, tile=8,
                                dtype=jnp.float64)
        assert op.operands[0][0].dtype == jnp.float64
        x = rs.randn(dense.shape[1], 4)
        np.testing.assert_allclose(np.asarray(op.mm(jnp.asarray(x))),
                                   dense @ x, rtol=1e-10, atol=1e-12)
        y = rs.randn(dense.shape[0], 3)
        np.testing.assert_allclose(np.asarray(op.rmm(jnp.asarray(y))),
                                   dense.T @ y, rtol=1e-10, atol=1e-12)

    def test_full_head_has_no_tail(self):
        """head covering every item == pure dense block, no tail sides."""
        rows, cols, vals, dense = self._skewed_coo(n=24)
        op = split_coo_operator(rows, cols, vals, dense.shape,
                                head_items=24, dtype=jnp.float64)
        assert op.operands[1] is None and op.operands[2] is None
        rs = np.random.RandomState(2)
        x = rs.randn(24, 6)
        np.testing.assert_allclose(np.asarray(op.mm(jnp.asarray(x))),
                                   dense @ x, rtol=1e-10, atol=1e-12)
        y = rs.randn(dense.shape[0], 3)
        np.testing.assert_allclose(np.asarray(op.rmm(jnp.asarray(y))),
                                   dense.T @ y, rtol=1e-10, atol=1e-12)

    def test_flat_margins_fall_back_to_tiled(self):
        """Near-uniform item margins can't pay for a head block — the
        staging declines and returns the plain tiled operator."""
        rs = np.random.RandomState(5)
        m, n, nnz = 80, 200, 600
        rows = np.sort(rs.randint(0, m, nnz)).astype(np.int32)
        cols = rs.randint(0, n, nnz).astype(np.int32)
        vals = rs.randint(1, 6, nnz).astype(float)
        op = split_coo_operator(rows, cols, vals, (m, n), head_items=4,
                                min_coverage=0.5, dtype=jnp.float64)
        from polara_tpu.ops.sparse import _tiled_mm
        assert op.mm_fn is _tiled_mm

    def test_blocked_head_rows(self):
        """Row count not divisible by the head block size: pad rows are
        zero and sliced back off."""
        rows, cols, vals, dense = self._skewed_coo(m=150)
        op = split_coo_operator(rows, cols, vals, dense.shape,
                                head_items=16, head_block_rows=64,
                                event_chunk=128, tile=8,
                                dtype=jnp.float64)
        assert op.operands[0][0].shape[:2] == (3, 64)
        rs = np.random.RandomState(4)
        x = rs.randn(dense.shape[1], 5)
        np.testing.assert_allclose(np.asarray(op.mm(jnp.asarray(x))),
                                   dense @ x, rtol=1e-10, atol=1e-12)
        y = rs.randn(dense.shape[0], 4)
        np.testing.assert_allclose(np.asarray(op.rmm(jnp.asarray(y))),
                                   dense.T @ y, rtol=1e-10, atol=1e-12)

    def test_empty_guard(self):
        with pytest.raises(ValueError):
            split_coo_operator(np.array([], np.int32),
                               np.array([], np.int32),
                               np.array([], np.float64), (3, 4))

    def test_column_grouped_head_build(self):
        """Wide heads build in int32-bounded column groups (the flat
        scatter path taken at Netflix scale) — forcing tiny groups must
        not change any result."""
        rows, cols, vals, dense = self._skewed_coo()
        one = split_coo_operator(rows, cols, vals, dense.shape,
                                 head_items=24, event_chunk=128, tile=8,
                                 dtype=jnp.float64)
        grouped = split_coo_operator(rows, cols, vals, dense.shape,
                                     head_items=24, event_chunk=128,
                                     tile=8, dtype=jnp.float64,
                                     _max_flat_cells=dense.shape[0] * 7)
        np.testing.assert_array_equal(np.asarray(one.operands[0][0]),
                                      np.asarray(grouped.operands[0][0]))
        rs = np.random.RandomState(8)
        x = rs.randn(dense.shape[1], 5)
        np.testing.assert_allclose(np.asarray(grouped.mm(jnp.asarray(x))),
                                   dense @ x, rtol=1e-10, atol=1e-12)
        y = rs.randn(dense.shape[0], 4)
        np.testing.assert_allclose(np.asarray(grouped.rmm(jnp.asarray(y))),
                                   dense.T @ y, rtol=1e-10, atol=1e-12)

    def test_rsvd_through_split_operator(self):
        csr = random_rating_matrix(m=180, n=120, density=0.25, seed=7)
        coo = csr.tocoo()
        op = split_coo_operator(coo.row, coo.col, coo.data, coo.shape,
                                head_items=32, event_chunk=512, tile=8,
                                dtype=jnp.float64)
        dense = jnp.asarray(csr.toarray(), jnp.float64)
        res_split = randomized_svd(op, 8, tol=1e-12, max_iter=300, seed=5,
                                   dtype=jnp.float64)
        res_dense = randomized_svd(dense, 8, tol=1e-12, max_iter=300,
                                   seed=5, dtype=jnp.float64)
        np.testing.assert_allclose(np.asarray(res_split.s),
                                   np.asarray(res_dense.s), rtol=1e-9)
        assert principal_angles_max_sin(res_split.v, res_dense.v) < 1e-7


class TestRandomizedSvd:
    def test_matches_scipy_svds_subspace(self):
        csr = random_rating_matrix(200, 150, density=0.3)
        k = 12
        u_ref, s_ref, vt_ref = svds(csr.astype(np.float64), k=k)
        dense = jnp.asarray(csr.toarray(), dtype=jnp.float64)
        res = randomized_svd(dense, k, tol=1e-12, max_iter=300, seed=3,
                             dtype=jnp.float64)
        # singular values to high precision
        np.testing.assert_allclose(np.asarray(res.s), s_ref[::-1],
                                   rtol=1e-9)
        # subspace agreement to 1e-6 (BASELINE.json requirement)
        assert principal_angles_max_sin(res.v,
                                        jnp.asarray(vt_ref[::-1].T)) < 1e-6
        assert principal_angles_max_sin(res.u,
                                        jnp.asarray(u_ref[:, ::-1])) < 1e-6

    def test_operator_path_matches_dense(self):
        csr = random_rating_matrix(90, 60)
        coo = csr.tocoo()
        device = CooMatrix.from_numpy(coo.row, coo.col, coo.data, coo.shape,
                                      dtype=jnp.float64)
        res_coo = randomized_svd(device.operator(), 8, tol=1e-12,
                                 max_iter=200, seed=0, dtype=jnp.float64)
        res_dense = randomized_svd(jnp.asarray(csr.toarray()), 8,
                                   tol=1e-12, max_iter=200, seed=0,
                                   dtype=jnp.float64)
        np.testing.assert_allclose(np.asarray(res_coo.s),
                                   np.asarray(res_dense.s), rtol=1e-10)

    def test_descending_order(self):
        dense = jnp.asarray(np.random.RandomState(0).randn(50, 40))
        res = randomized_svd(dense, 10, n_iter=4)
        s = np.asarray(res.s)
        assert (np.diff(s) <= 1e-12).all()

    def test_fused_fixed_build_matches_composed_stages(self):
        """The fixed-count path runs as ONE compiled program
        (``_build_fixed``); pin it bit-for-bit against the same math
        composed from the separately jitted stages it replaced."""
        from polara_tpu.ops.rsvd import (_finalize, _panel_qr_jit,
                                         _power_fixed)
        from polara_tpu.ops.sparse import dense_operator
        import jax

        rs = np.random.RandomState(7)
        dense = jnp.asarray(rs.rand(90, 60), jnp.float64)
        op = dense_operator(dense)
        k, block, n_iter, refine = 8, 18, 5, 2

        res = randomized_svd(op, k, oversample=block - k, n_iter=n_iter,
                             seed=3, qr_method="cholesky2",
                             power_operator=op, refine_iters=refine,
                             dtype=jnp.float64)

        key = jax.random.key(3)
        omega = jax.random.normal(key, (60, block), dtype=jnp.float64)
        q, _ = _panel_qr_jit(op.mm(omega), "cholesky2")
        q = _power_fixed(op, q, n_iter, "cholesky2")
        q = _power_fixed(op, q, refine, "cholesky2")
        u, s, vt = _finalize(op, q)

        np.testing.assert_allclose(np.asarray(res.s), np.asarray(s[:k]),
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(res.u), np.asarray(u[:, :k]),
                                   rtol=0, atol=1e-10)
        np.testing.assert_allclose(np.asarray(res.v),
                                   np.asarray(vt[:k, :].T),
                                   rtol=0, atol=1e-10)

    def test_reconstruction_low_rank(self):
        rs = np.random.RandomState(5)
        a = rs.randn(60, 8) @ rs.randn(8, 40)  # exactly rank 8
        res = randomized_svd(jnp.asarray(a), 8, n_iter=4, dtype=jnp.float64)
        approx = np.asarray(res.u) * np.asarray(res.s) @ np.asarray(res.v).T
        np.testing.assert_allclose(approx, a, atol=1e-8)


class TestTopk:
    def test_downvote_pushes_seen_below_min(self):
        rs = np.random.RandomState(0)
        scores = jnp.asarray(rs.randn(4, 10))
        rows = jnp.asarray([0, 0, 2, 3], dtype=jnp.int32)
        cols = jnp.asarray([1, 5, 9, 0], dtype=jnp.int32)
        valid = jnp.asarray([True, True, True, False])
        out = np.asarray(downvote_items(scores, rows, cols, valid))
        base_min = np.asarray(scores).min()
        assert out[0, 1] < base_min and out[0, 5] < base_min
        assert out[2, 9] < base_min
        assert out[3, 0] == np.asarray(scores)[3, 0]  # masked entry intact
        # relative order among seen items preserved
        s = np.asarray(scores)
        assert (out[0, 1] < out[0, 5]) == (s[0, 1] < s[0, 5])

    def test_padding_collision_is_noop(self):
        scores = jnp.asarray(np.arange(12, dtype=float).reshape(3, 4))
        rows = jnp.asarray([0, 0], dtype=jnp.int32)
        cols = jnp.asarray([0, 0], dtype=jnp.int32)
        valid = jnp.asarray([True, False])  # pad collides with real (0,0)
        out = np.asarray(downvote_items(scores, rows, cols, valid))
        assert out[0, 0] < 0  # still downvoted by the valid entry

    def test_topk_matches_numpy(self):
        rs = np.random.RandomState(1)
        scores = rs.randn(6, 30)
        idx = np.asarray(top_k_indices(jnp.asarray(scores), 5))
        expect = np.argsort(-scores, axis=1)[:, :5]
        np.testing.assert_array_equal(idx, expect)

    def test_topk_pads_beyond_catalog(self):
        scores = jnp.asarray(np.random.randn(2, 3))
        idx = np.asarray(top_k_indices(scores, 5))
        assert idx.shape == (2, 5)
        assert (idx[:, 3:] == -1).all()

    def test_mask_and_topk_excludes_seen(self):
        rs = np.random.RandomState(2)
        scores = jnp.asarray(rs.randn(3, 20))
        rows = jnp.asarray([0, 1, 1], dtype=jnp.int32)
        cols = jnp.asarray([4, 2, 7], dtype=jnp.int32)
        valid = jnp.asarray([True, True, True])
        recs = np.asarray(mask_and_topk(scores, rows, cols, valid, 10))
        assert 4 not in recs[0]
        assert 2 not in recs[1] and 7 not in recs[1]


class TestPaddedRows:
    def test_pack(self):
        rows = np.array([0, 0, 2, 2, 2])
        cols = np.array([5, 3, 1, 2, 4])
        vals = np.array([1., 2., 3., 4., 5.])
        packed = pad_rows(rows, cols, vals, n_rows=4)
        assert packed.shape == (4, 3)
        np.testing.assert_array_equal(packed.indices[0, :2], [5, 3])
        np.testing.assert_array_equal(packed.mask.sum(axis=1), [2, 0, 3, 0])
        np.testing.assert_array_equal(packed.values[2], [3., 4., 5.])


def test_inner_product_at():
    rs = np.random.RandomState(0)
    u = rs.randn(10, 4)
    v = rs.randn(8, 4)
    ui = rs.randint(0, 10, (3, 5))
    vi = rs.randint(0, 8, (3, 5))
    got = np.asarray(inner_product_at(jnp.asarray(u), jnp.asarray(v),
                                      jnp.asarray(ui), jnp.asarray(vi)))
    expect = np.einsum("btk,btk->bt", u[ui], v[vi])
    np.testing.assert_allclose(got, expect, rtol=1e-6)


class TestCholeskyQr2:
    def test_cholesky_qr2_orthogonal(self):
        from polara_tpu.ops.rsvd import cholesky_qr2
        rs = np.random.RandomState(0)
        a = jnp.asarray(rs.randn(300, 24), jnp.float64)
        q, r = cholesky_qr2(a)
        np.testing.assert_allclose(np.asarray(q.T @ q), np.eye(24),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(q @ r), np.asarray(a),
                                   rtol=1e-10)
        # r upper triangular
        assert np.allclose(np.tril(np.asarray(r), -1), 0)

    def test_rsvd_cholesky2_matches_scipy(self):
        """The TPU-default QR method meets the same 1e-6 subspace target."""
        csr = random_rating_matrix(200, 150, density=0.3)
        k = 12
        u_ref, s_ref, vt_ref = svds(csr.astype(np.float64), k=k)
        dense = jnp.asarray(csr.toarray(), dtype=jnp.float64)
        res = randomized_svd(dense, k, tol=1e-12, max_iter=300, seed=3,
                             dtype=jnp.float64, qr_method="cholesky2")
        np.testing.assert_allclose(np.asarray(res.s), s_ref[::-1],
                                   rtol=1e-9)
        assert principal_angles_max_sin(res.v,
                                        jnp.asarray(vt_ref[::-1].T)) < 1e-6
