"""Similarity kernels over feature matrices.

Reference: ``polara/lib/similarity.py:24-235``.  The reference keeps
sparse CSR similarity with Numba inner loops; on TPU the similarity of an
n-entity catalog is an (n, n) dense block computed by MXU matmuls:

* cosine — row-normalize then one gram matmul;
* jaccard — binary gram (intersections) + nnz counts;
* weighted jaccard — the O(n^2 f) triangular Numba loop
  (``similarity.py:149-196``) collapses via
  ``min(a,b)+max(a,b) = a+b`` into ``(f_i+f_j-L1)/(f_i+f_j+L1)`` —
  one chunked L1-distance matrix, same closed form the reference uses in
  its dense variant (``similarity.py:221-235``);
* tf-idf — idf reweighting then cosine.

Inputs may be scipy.sparse or arrays; outputs are dense jax arrays.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Union

import numpy as np
import jax
import jax.numpy as jnp

try:
    import scipy.sparse as _sp
except ImportError:  # pragma: no cover
    _sp = None


def _as_dense(f) -> jnp.ndarray:
    if _sp is not None and _sp.issparse(f):
        f = f.toarray()
    return jnp.asarray(f)


def safe_inverse_root(d: jax.Array) -> jax.Array:
    return jnp.where(d > 0, jax.lax.rsqrt(jnp.maximum(d, 1e-30)), 0.0)


@jax.jit
def _normalize_rows(f: jax.Array) -> jax.Array:
    sqsum = jnp.sum(f * f, axis=1)
    return f * safe_inverse_root(sqsum)[:, None]


def normalize_features(f) -> jax.Array:
    """Row-wise L2 normalization (zero rows stay zero)."""
    return _normalize_rows(_as_dense(f))


def normalize_binary_features(f) -> jax.Array:
    f = _as_dense(f)
    nnz = jnp.sum(f != 0, axis=1).astype(f.dtype)
    return f * safe_inverse_root(nnz)[:, None]


def tfidf_transform(f) -> jax.Array:
    f = _as_dense(f)
    binary = (f != 0).astype(f.dtype)
    df = 1.0 + jnp.sum(binary, axis=0)
    idf = jnp.log((1.0 + f.shape[0]) / df)
    return binary * idf[None, :]


def _fill_diag(s: jax.Array, value: float = 1.0) -> jax.Array:
    eye = jnp.eye(s.shape[0], dtype=bool)
    return jnp.where(eye, jnp.asarray(value, s.dtype), s)


def cosine_similarity(f, fill_diagonal: bool = True,
                      assume_binary: bool = False) -> jax.Array:
    normalize = (normalize_binary_features if assume_binary
                 else normalize_features)
    fn = normalize(f)
    s = fn @ fn.T
    return _fill_diag(s) if fill_diagonal else s


def cosine_tfidf_similarity(f, fill_diagonal: bool = True) -> jax.Array:
    return cosine_similarity(tfidf_transform(f),
                             fill_diagonal=fill_diagonal)


def jaccard_similarity(f, fill_diagonal: bool = True) -> jax.Array:
    f = (_as_dense(f) != 0).astype(jnp.float32)
    nf = jnp.sum(f, axis=1)
    inter = f @ f.T
    union = nf[:, None] + nf[None, :] - inter
    s = jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)
    return _fill_diag(s) if fill_diagonal else s


@partial(jax.jit, static_argnames=("block", "feature_block"))
def _l1_distance_matrix(f: jax.Array, block: int = 64,
                        feature_block: int = 256) -> jax.Array:
    """Pairwise L1 distances with both the row axis AND the feature axis
    blocked — the broadcasted |rows - all|, at (block, n, feature_block),
    stays bounded regardless of catalog/feature-space size."""
    n, n_feat = f.shape
    padded = -(-n // block) * block
    feat_padded = -(-n_feat // feature_block) * feature_block
    fp = jnp.pad(f, ((0, padded - n), (0, feat_padded - n_feat)))

    def one_block(i, acc):
        rows = jax.lax.dynamic_slice_in_dim(fp, i * block, block)

        def one_feature_chunk(j, partial_l1):
            rc = jax.lax.dynamic_slice_in_dim(rows, j * feature_block,
                                              feature_block, axis=1)
            fc = jax.lax.dynamic_slice_in_dim(fp, j * feature_block,
                                              feature_block, axis=1)
            return partial_l1 + jnp.sum(
                jnp.abs(rc[:, None, :] - fc[None, :, :]), axis=-1)

        d = jax.lax.fori_loop(0, feat_padded // feature_block,
                              one_feature_chunk,
                              jnp.zeros((block, padded), fp.dtype))
        return jax.lax.dynamic_update_slice_in_dim(acc, d, i * block, 0)

    acc = jnp.zeros((padded, padded), f.dtype)
    acc = jax.lax.fori_loop(0, padded // block, one_block, acc)
    return acc[:n, :n]


def jaccard_similarity_weighted(f, fill_diagonal: bool = True) -> jax.Array:
    f = _as_dense(f).astype(jnp.float32)
    if bool(jnp.any(f < 0)):
        raise ValueError("weighted jaccard requires non-negative features")
    sums = jnp.sum(f, axis=1)
    fplus = sums[:, None] + sums[None, :]
    l1 = _l1_distance_matrix(f)
    denom = fplus + l1
    s = jnp.where(denom > 0, (fplus - l1) / jnp.where(denom > 0, denom,
                                                      1.0), 0.0)
    return _fill_diag(s) if fill_diagonal else s


# the reference's dense variant shares this closed form
jaccard_similarity_weighted_dense = jaccard_similarity_weighted


def similarity_function(kind: str):
    table = {
        "jaccard": jaccard_similarity,
        "cosine": cosine_similarity,
        "tfidf-cosine": cosine_tfidf_similarity,
        "jaccard-weighted": jaccard_similarity_weighted,
    }
    try:
        return table[kind.lower()]
    except KeyError:
        raise ValueError(f"Unknown similarity type {kind!r}; expected one "
                         f"of {sorted(table)}") from None
