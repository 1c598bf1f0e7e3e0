"""Dense device Cholesky factors for similarity-regularized models.

Replaces the reference's CHOLMOD wrapper (``polara/lib/cholesky.py`` +
``hybrid/models.py:228-332``).  The reference needs a sparse
fill-reducing-permutation factorization on CPU; on TPU the similarity
matrix of an item catalog is a dense HBM block and ``jnp.linalg.cholesky``
runs on the MXU, so no permutation bookkeeping exists: ``A + beta I =
L L^T`` exactly (CHOLMOD's ``beta`` convention preserved).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from polara_tpu.ops.sparse import MatmulOperator


@jax.jit
def _factorize(matrix: jax.Array, beta: jax.Array) -> jax.Array:
    a = matrix + beta * jnp.eye(matrix.shape[0], dtype=matrix.dtype)
    return jnp.linalg.cholesky(a)


@dataclasses.dataclass
class CholeskyFactor:
    """Lower-triangular factor with the reference's access pattern:
    ``dot`` = L @ v, ``T.dot`` = L^T @ v, ``T.solve`` = L^-T @ v."""
    L: jax.Array
    _transposed: bool = False

    @classmethod
    def factorize(cls, matrix: jax.Array, beta: float = 0.0
                  ) -> "CholeskyFactor":
        L = _factorize(matrix, jnp.asarray(beta, matrix.dtype))
        if bool(jnp.any(jnp.isnan(L))):
            raise ValueError(
                "Cholesky factorization failed: similarity + beta*I is "
                "not positive definite; raise features_weight")
        return cls(L=L)

    @property
    def T(self) -> "CholeskyFactor":
        return CholeskyFactor(L=self.L, _transposed=True)

    def dot(self, v: jax.Array) -> jax.Array:
        if self._transposed:
            return self.L.T @ v
        return self.L @ v

    def solve(self, y: jax.Array) -> jax.Array:
        if self._transposed:
            return jax.scipy.linalg.solve_triangular(self.L.T, y,
                                                     lower=False)
        return jax.scipy.linalg.solve_triangular(self.L, y, lower=True)

    def update_inplace(self, matrix: jax.Array, beta: float) -> None:
        self.L = _factorize(matrix, jnp.asarray(beta, matrix.dtype))


# --- implicit operator  L_u^T R L_i  for HybridSVD ------------------------
# (reference builds the same chain as a scipy LinearOperator,
#  hybrid/models.py:368-384)

def _hyb_mm(operands, x, out_dim):
    rows, cols, vals, dense_r, l_user, l_item = operands
    v = l_item @ x if l_item is not None else x
    if dense_r is not None:
        y = dense_r @ v
    else:
        y = jax.ops.segment_sum(vals[:, None] * v[cols], rows,
                                num_segments=out_dim)
    if l_user is not None:
        y = l_user.T @ y
    return y


def _hyb_rmm(operands, x, out_dim):
    rows, cols, vals, dense_r, l_user, l_item = operands
    v = l_user @ x if l_user is not None else x
    if dense_r is not None:
        y = dense_r.T @ v
    else:
        y = jax.ops.segment_sum(vals[:, None] * v[rows], cols,
                                num_segments=out_dim)
    if l_item is not None:
        y = l_item.T @ y
    return y


def hybrid_operator(coo_matrix, l_user: Optional[jax.Array],
                    l_item: Optional[jax.Array],
                    dense_budget_bytes: Optional[int] = None
                    ) -> MatmulOperator:
    """Operator for ``L_u^T R L_i`` with either factor optional.

    ``None`` factors are genuinely absent (no wasted identity matmuls);
    they ride in the pytree as static ``None`` leaves.  When the ratings
    block fits ``dense_budget_bytes`` it is densified once so the inner
    matmuls run on the MXU instead of the scatter-bound segment path.
    """
    n_rows, n_cols = coo_matrix.shape
    itemsize = jnp.dtype(coo_matrix.vals.dtype).itemsize
    dense_r = None
    if dense_budget_bytes is not None \
            and n_rows * n_cols * itemsize <= dense_budget_bytes:
        dense_r = coo_matrix.to_dense()
        operands = (None, None, None, dense_r, l_user, l_item)
    else:
        operands = (coo_matrix.rows, coo_matrix.cols, coo_matrix.vals,
                    dense_r, l_user, l_item)
    return MatmulOperator(
        shape=coo_matrix.shape,
        mm_fn=_hyb_mm, rmm_fn=_hyb_rmm,
        operands=operands,
        dtype=coo_matrix.vals.dtype)
