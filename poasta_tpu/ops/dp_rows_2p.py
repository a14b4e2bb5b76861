"""Two-piece (convex) affine row update for the wavefront fill.

Five state layers (M, D1, D2, I1, I2); piece-2 states are entered from
piece-1 states at ``extend2`` cost and extend at ``extend2``
(the reference's transition structure, ``gap_affine_2piece.rs:292-430``).

Dense recurrences per rank row (min-cost):

    D1[j] = min_p min(M[p][j] + o1 + e1,  D1[p][j] + e1)
    D2[j] = min_p min(D1[p][j], D2[p][j]) + e2
    A[j]  = min(diag[j], D1[j], D2[j])
    I1[j] = min(A[j-1] + o1 + e1, I1[j-1] + e1, I2[j-1] + o1 + e1)
    I2[j] = min(I1[j-1], I2[j-1]) + e2
    M[j]  = min(A[j], I1[j], I2[j])

The I1/I2 pair is a coupled linear min-plus recurrence along the offset
axis; it is evaluated in O(log L) depth with ``lax.associative_scan`` over
affine min-plus maps ((2x2 matrix, 2-vector) pairs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .dp_rows import INF


def _minplus_compose(second, first):
    """Compose affine min-plus maps: (T2,b2) o (T1,b1) = (T2@T1, T2@b1 (+) b2).

    Matrices are (..., 2, 2), vectors (..., 2); "@" is min-plus product.
    """
    T2, b2 = second
    T1, b1 = first
    # min-plus matmul: T[i,k] = min_j T2[i,j] + T1[j,k]
    T = jnp.min(T2[..., :, :, None] + T1[..., None, :, :], axis=-2)
    b = jnp.minimum(jnp.min(T2 + b1[..., None, :], axis=-1), b2)
    T = jnp.minimum(T, INF)
    b = jnp.minimum(b, INF)
    return (T, b)


def insertion_rows_2p(A: jnp.ndarray, o1: int, e1: int, o2_unused: int, e2: int):
    """Coupled (I1, I2) rows from the A = min(diag, D1, D2) row.

    A: (..., L). Returns (I1, I2) with column 0 = INF.
    """
    L = A.shape[-1]
    lead = A.shape[:-1]

    # map j (for j>=1): x_j = T (x) x_{j-1} (+) b_j
    T_row = jnp.broadcast_to(
        jnp.asarray([[e1, o1 + e1], [e2, e2]], dtype=A.dtype), lead + (L, 2, 2)
    )
    b1 = jnp.concatenate(
        [jnp.full(lead + (1,), INF, A.dtype), A[..., :-1] + (o1 + e1)], axis=-1
    )
    b1 = jnp.minimum(b1, INF)
    b2 = jnp.full(lead + (L,), INF, A.dtype)
    b = jnp.stack([b1, b2], axis=-1)  # (..., L, 2)

    # position 0 is the identity-with-INF map (no insertions before offset 1)
    T0 = jnp.full(lead + (1, 2, 2), INF, A.dtype)
    T_all = jnp.concatenate([T0, T_row[..., 1:, :, :]], axis=-3)

    # associative_scan combines (earlier, later); composition applies the
    # earlier map first, i.e. compose(second=later, first=earlier)
    Tp, bp = jax.lax.associative_scan(
        lambda a, b_: _minplus_compose(b_, a), (T_all, b), axis=A.ndim - 1
    )
    # initial state (INF, INF): result = b-part of the prefix map
    I1 = bp[..., 0]
    I2 = bp[..., 1]
    return I1, I2


def row_update_2p(
    pred_M, pred_D1, pred_D2, pred_mask, match_cost,
    o1: int, e1: int, e2: int,
    is_start_row, free_start,
):
    """One rank-row update for the two-piece model.

    pred_* are (..., P, L); returns (M, I1, I2, D1, D2) rows (..., L).
    """
    mask = pred_mask.reshape((1,) * (pred_M.ndim - 2) + (-1, 1))
    pm = jnp.where(mask, pred_M, INF)
    pd1 = jnp.where(mask, pred_D1, INF)
    pd2 = jnp.where(mask, pred_D2, INF)

    min_pm = jnp.min(pm, axis=-2)
    min_pd1 = jnp.min(pd1, axis=-2)
    min_pd2 = jnp.min(pd2, axis=-2)

    D1 = jnp.minimum(jnp.minimum(min_pm + o1 + e1, min_pd1 + e1), INF)
    D2 = jnp.minimum(jnp.minimum(min_pd1, min_pd2) + e2, INF)

    diag_src = jnp.concatenate(
        [jnp.full(min_pm.shape[:-1] + (1,), INF, pm.dtype), min_pm[..., :-1]],
        axis=-1,
    )
    diag = jnp.minimum(diag_src + match_cost, INF)

    A = jnp.minimum(diag, jnp.minimum(D1, D2))

    L = A.shape[-1]
    origin = jnp.logical_or(is_start_row, free_start)
    zero_at_0 = jnp.where(
        jnp.logical_and(origin, jnp.arange(L) == 0), jnp.int32(0), INF
    )
    A = jnp.minimum(A, zero_at_0)

    I1, I2 = insertion_rows_2p(A, o1, e1, 0, e2)
    M = jnp.minimum(A, jnp.minimum(I1, I2))
    return M, I1, I2, D1, D2
