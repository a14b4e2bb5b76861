"""Pallas TPU kernel for the gap-affine POA wavefront fill (scores path).

Why a kernel: under ``lax.scan`` the (B, W, L) M/D ring buffers are scan
carries that round-trip HBM every rank step (~2·B·W·L·4 bytes/step); the
fill is memory-bound at ~2.5 Gcells/s.  This kernel keeps both rings in
VMEM scratch for the *entire* rank scan, so per-step traffic is zero and
the fill runs at VPU compute speed.

Layout:

* grid = (batch blocks,); each program owns a (B_BLK, L) slab of reads.
* per-rank metadata (symbol, predecessor ring slots, valid mask) rides in
  scalar-prefetch SMEM arrays indexed by the rank loop counter.
* rings are (W, B_BLK, L) int32 VMEM scratch; predecessor row gathers are
  dynamic indexes on the leading (slot) axis.
* the affine insertion chain's prefix-min runs as a Hillis–Steele scan:
  log2(L) rounds of shift+min using ``pltpu.roll`` with an iota mask.

Equivalent math to :func:`poasta_tpu.ops.dp_rows.row_update`; validated
against the XLA path and the exact engine in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dp_rows import INF as _INF_ARR

INF = 1 << 28  # python int: pallas kernels cannot capture traced constants

B_BLK = 64  # default batch block; callers may pick larger when VMEM allows

VMEM_BUDGET = 12 * 1024 * 1024


def pick_b_blk(W: int, row_lanes: int, L: int) -> int:
    """Largest batch block whose rings (+ qshift block) fit the VMEM budget."""
    for cand in (256, 128, 64):
        need = 2 * W * cand * row_lanes * 4 + cand * L * 4 * 2
        if need <= VMEM_BUDGET:
            return cand
    return 64


def _prefix_min_rows(t: jnp.ndarray, L: int) -> jnp.ndarray:
    """Inclusive prefix-min along the last (lane) axis via shift+min."""
    col = jax.lax.broadcasted_iota(jnp.int32, t.shape, dimension=1)
    k = 1
    while k < L:
        shifted = pltpu.roll(t, k, 1)
        shifted = jnp.where(col >= k, shifted, INF)
        t = jnp.minimum(t, shifted)
        k <<= 1
    return t


def _fill_kernel(
    # scalar prefetch
    symbols_ref,      # (Np,) int32
    pred_slots_ref,   # (Np*P,) int32 — flattened: 2D SMEM pads to 128 lanes
    pred_valid_ref,   # (Np*P,) int32 (0/1)
    meta_ref,         # (4,) int32: [Np, end_rank, o_plus_e? no: o, e] see below
    # inputs
    qshift_ref,       # (B_BLK, L) int32 VMEM
    # outputs
    end_row_ref,      # (B_BLK, L) int32 VMEM
    # scratch
    m_ring, d_ring,   # (W, B_BLK, L) int32 VMEM
    *, W: int, P: int, L: int, o: int, e: int, x: int, B_BLK: int,
):
    n_nodes = meta_ref[0]
    end_rank = meta_ref[1]

    for w in range(W):
        m_ring[w] = jnp.full((B_BLK, L), INF, dtype=jnp.int32)
        d_ring[w] = jnp.full((B_BLK, L), INF, dtype=jnp.int32)

    qshift = qshift_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (B_BLK, L), dimension=1)
    ej = e * col

    def body(r, _):
        sym = symbols_ref[r]

        min_pm = jnp.full((B_BLK, L), INF, dtype=jnp.int32)
        min_pd = jnp.full((B_BLK, L), INF, dtype=jnp.int32)
        for p in range(P):
            slot = pred_slots_ref[r * P + p]
            valid = pred_valid_ref[r * P + p]
            rm = m_ring[slot]
            rd = d_ring[slot]
            keep = valid == 1
            min_pm = jnp.minimum(min_pm, jnp.where(keep, rm, INF))
            min_pd = jnp.minimum(min_pd, jnp.where(keep, rd, INF))

        D = jnp.minimum(min_pm + (o + e), min_pd + e)

        # diagonal: shift pred-M right by one offset lane
        diag_src = pltpu.roll(min_pm, 1, 1)
        diag_src = jnp.where(col >= 1, diag_src, INF)
        match_cost = jnp.where(qshift == sym, jnp.int32(0), jnp.int32(x))
        diag = diag_src + match_cost

        A = jnp.minimum(diag, D)
        # global-alignment origin: (rank 0, offset 0)
        A = jnp.where(jnp.logical_and(r == 0, col == 0), jnp.int32(0), A)

        # affine insertion chain: I[j] = o + e*j + min_{k<j}(A[k] - e*k)
        t = A - ej
        pref = _prefix_min_rows(t, L)
        pref_m1 = pltpu.roll(pref, 1, 1)
        pref_m1 = jnp.where(col >= 1, pref_m1, INF)
        I = jnp.minimum(pref_m1 + (o + e * 0) + ej, INF)
        # clamp to avoid overflow artifacts from INF + linear terms
        I = jnp.minimum(I, INF)

        M = jnp.minimum(A, I)
        # virtual end node: zero-cost same-offset hop
        is_end = r == end_rank
        M = jnp.where(is_end, min_pm, M)
        D_out = jnp.where(is_end, INF, jnp.minimum(D, INF))

        @pl.when(is_end)
        def _():
            end_row_ref[:] = min_pm

        slot = jax.lax.rem(r, W)
        m_ring[slot] = M
        d_ring[slot] = D_out
        return 0

    jax.lax.fori_loop(0, n_nodes, body, 0)


@functools.lru_cache(maxsize=None)
def _pallas_exec(nblocks: int, W: int, P: int, L: int, o: int, e: int, x: int,
                 B_BLK: int = 64):
    kernel = functools.partial(_fill_kernel, W=W, P=P, L=L, o=o, e=e, x=x,
                               B_BLK=B_BLK)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((B_BLK, L), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (B_BLK, L), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((W, B_BLK, L), jnp.int32),
            pltpu.VMEM((W, B_BLK, L), jnp.int32),
        ],
    )

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nblocks * B_BLK, L), jnp.int32),
        grid_spec=grid_spec,
    )

    @jax.jit
    def fn(symbols, pred_slots, pred_valid, meta, qshift, lengths):
        end_row = call(symbols, pred_slots, pred_valid, meta, qshift)
        idx = lengths.astype(jnp.int32)[:, None]
        return jnp.take_along_axis(end_row, idx, axis=1)[:, 0]

    return fn


def _banded_kernel(
    # scalar prefetch
    symbols_ref,      # (Np,)
    pred_slots_ref,   # (Np*P,) ring slots
    pred_valid_ref,   # (Np*P,)
    pred_wstart_ref,  # (Np*P,) window start of each predecessor's rank
    wstart_ref,       # (Np,) this rank's window start (multiples of 128)
    meta_ref,         # (4,): [Np, end_rank, _, _]
    # inputs
    qshift_ref,       # (B_BLK, L) VMEM
    # outputs
    end_row_ref,      # (B_BLK, Wb) VMEM
    # scratch — rows carry MARGIN lanes of permanent INF on both sides so
    # predecessor windows at different starts are read as dynamic-slice
    # ref loads (Pallas cannot dynamic-slice register arrays)
    m_ring, d_ring,   # (W, B_BLK, 2*MARGIN + Wb) VMEM
    *, W: int, P: int, Wb: int, MARGIN: int, o: int, e: int, x: int,
    B_BLK: int,
):
    n_nodes = meta_ref[0]
    end_rank = meta_ref[1]
    TOT = 2 * MARGIN + Wb

    for w in range(W):
        m_ring[w] = jnp.full((B_BLK, TOT), INF, dtype=jnp.int32)
        d_ring[w] = jnp.full((B_BLK, TOT), INF, dtype=jnp.int32)

    col = jax.lax.broadcasted_iota(jnp.int32, (B_BLK, Wb), dimension=1)

    def body(r, _):
        sym = symbols_ref[r]
        w_r = wstart_ref[r]
        j_global = col + w_r

        min_pm = jnp.full((B_BLK, Wb), INF, dtype=jnp.int32)
        min_pd = jnp.full((B_BLK, Wb), INF, dtype=jnp.int32)
        for p in range(P):
            slot = pred_slots_ref[r * P + p]
            valid = pred_valid_ref[r * P + p]
            w_p = pred_wstart_ref[r * P + p]
            # delta in [-MARGIN, MARGIN], multiple of 128 by construction
            delta = jnp.clip(w_r - w_p, -MARGIN, MARGIN)
            start = pl.multiple_of(MARGIN + delta, 128)
            am = m_ring[slot, :, pl.ds(start, Wb)]
            ad = d_ring[slot, :, pl.ds(start, Wb)]
            keep = valid == 1
            min_pm = jnp.minimum(min_pm, jnp.where(keep, am, INF))
            min_pd = jnp.minimum(min_pd, jnp.where(keep, ad, INF))

        D = jnp.minimum(min_pm + (o + e), min_pd + e)

        diag_src = pltpu.roll(min_pm, 1, 1)
        diag_src = jnp.where(col >= 1, diag_src, INF)
        qstart = pl.multiple_of(w_r, 128)
        qwin = qshift_ref[:, pl.ds(qstart, Wb)]
        match_cost = jnp.where(qwin == sym, jnp.int32(0), jnp.int32(x))
        diag = diag_src + match_cost

        A = jnp.minimum(diag, D)
        A = jnp.where(jnp.logical_and(r == 0, j_global == 0), jnp.int32(0), A)

        t = A - e * j_global
        pref = _prefix_min_rows(t, Wb)
        pref_m1 = pltpu.roll(pref, 1, 1)
        pref_m1 = jnp.where(col >= 1, pref_m1, INF)
        I = jnp.minimum(pref_m1 + o + e * j_global, INF)

        M = jnp.minimum(A, I)
        is_end = r == end_rank
        M = jnp.where(is_end, min_pm, M)

        @pl.when(is_end)
        def _():
            end_row_ref[:] = min_pm

        slot = jax.lax.rem(r, W)
        m_ring[slot, :, MARGIN:MARGIN + Wb] = M
        d_ring[slot, :, MARGIN:MARGIN + Wb] = jnp.where(
            is_end, INF, jnp.minimum(D, INF))
        return 0

    jax.lax.fori_loop(0, n_nodes, body, 0)


@functools.lru_cache(maxsize=None)
def _banded_exec(nblocks: int, W: int, P: int, Wb: int, MARGIN: int, L: int,
                 o: int, e: int, x: int, B_BLK: int = 64):
    kernel = functools.partial(_banded_kernel, W=W, P=P, Wb=Wb, MARGIN=MARGIN,
                               o=o, e=e, x=x, B_BLK=B_BLK)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((B_BLK, L), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (B_BLK, Wb), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((W, B_BLK, 2 * MARGIN + Wb), jnp.int32),
            pltpu.VMEM((W, B_BLK, 2 * MARGIN + Wb), jnp.int32),
        ],
    )

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nblocks * B_BLK, Wb), jnp.int32),
        grid_spec=grid_spec,
    )

    @jax.jit
    def fn(symbols, pred_slots, pred_valid, pred_wstarts, wstarts, meta,
           qshift, lengths, w_end):
        end_row = call(symbols, pred_slots, pred_valid, pred_wstarts,
                       wstarts, meta, qshift)
        idx_loc = lengths.astype(jnp.int32) - w_end
        in_range = jnp.logical_and(idx_loc >= 0, idx_loc < Wb)
        idx_c = jnp.clip(idx_loc, 0, Wb - 1)[:, None]
        at = jnp.take_along_axis(end_row, idx_c, axis=1)[:, 0]
        return jnp.where(in_range, at, jnp.int32(INF))

    return fn


def pallas_banded_scores(dg, qshift, lengths, costs, wstarts_np, width: int):
    """Banded global-alignment scores via the Pallas kernel.

    ``wstarts_np``: (n_nodes,) per-rank window starts, multiples of 128;
    ``width``: window width, a multiple of 128.  Caller guarantees band
    coverage (see :class:`poasta_tpu.aligner.banded.BandedScorer`).
    """
    import numpy as np

    B, L = qshift.shape
    assert B % B_BLK == 0
    P = int(dg.pred_slots.shape[1])
    Np = dg.n_nodes_padded

    ws = np.zeros(Np, dtype=np.int32)
    ws[: wstarts_np.shape[0]] = wstarts_np
    pw = np.take(ws, dg.pred_ranks_np, axis=0).astype(np.int32)

    # margin covers the largest window shift between adjacent ranks
    deltas = []
    n = min(wstarts_np.shape[0], dg.pred_ranks_np.shape[0])
    pr = dg.pred_ranks_np[:n]
    valid = np.asarray(dg.pred_valid)[:n]
    for i in range(pr.shape[1]):
        d = np.abs(ws[:n] - ws[pr[:, i]])
        deltas.append(np.where(valid[:, i], d, 0).max() if n else 0)
    margin = int(max(deltas)) if deltas else 0
    margin = ((margin + 127) // 128) * 128
    margin = max(margin, 128)

    blk = pick_b_blk(dg.window, 2 * margin + width, L)
    while B % blk:
        blk //= 2
    meta = jnp.asarray([Np, int(dg.end_rank), 0, 0], dtype=jnp.int32)
    fn = _banded_exec(B // blk, dg.window, P, width, margin, L,
                      costs.gap_open, costs.gap_extend, costs.mismatch,
                      B_BLK=blk)
    w_end = jnp.asarray(int(ws[int(dg.end_rank)]), dtype=jnp.int32)
    return fn(dg.symbols.astype(jnp.int32), dg.pred_slots.reshape(-1),
              dg.pred_valid.astype(jnp.int32).reshape(-1),
              jnp.asarray(pw.reshape(-1)), jnp.asarray(ws), meta,
              qshift, lengths, w_end)


def pallas_fill_scores(dg, qshift, lengths, costs):
    """(B,) global-alignment scores via the Pallas kernel.

    Requires B to be a multiple of B_BLK (callers pad batches).
    """
    B, L = qshift.shape
    blk = pick_b_blk(dg.window, L, L)
    blk = min(blk, B) if B % 64 == 0 else blk
    while B % blk:
        blk //= 2
    assert blk >= 64 and B % blk == 0, f"batch {B} must be a multiple of 64"
    P = int(dg.pred_slots.shape[1])
    meta = jnp.asarray(
        [dg.n_nodes_padded, int(dg.end_rank), 0, 0], dtype=jnp.int32
    )
    fn = _pallas_exec(B // blk, dg.window, P, L,
                      costs.gap_open, costs.gap_extend, costs.mismatch,
                      B_BLK=blk)
    return fn(dg.symbols.astype(jnp.int32), dg.pred_slots.reshape(-1),
              dg.pred_valid.astype(jnp.int32).reshape(-1), meta, qshift, lengths)
