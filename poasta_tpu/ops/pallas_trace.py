"""Device-side traceback: pointer-emitting corridor fill + batched decode.

Removes the host from the alignment path (VERDICT r3 #1).  The previous
serving design computed exact scores on the device and rebuilt each
alignment with a per-read native corridor fill + backtrace on the host —
which serializes on one core here (98 pangenome reads/s, 18.5 hybrid).
This module keeps the whole per-read reconstruction on the chip:

1. :func:`build_trace_schedule` (host, vectorized numpy) derives sound
   per-(read, rank) query windows from the certified score/anchor and
   the precomputed rank potentials: for any path of cost <= ub through
   rank r, the consumed-offset j at r is bounded by
   ``min/max_dist_from_start`` differences +/- the gap budget
   K = (ub - open)/extend (each edge advances min_dist_from_start by
   <= 1 and max_dist_from_start by >= 1, so edge-distance between two
   path nodes is bracketed by the potential differences).  The window
   start per rank is a monotone 128-quantized step schedule, encoded as
   one bit per (read, rank).
2. :func:`_trace_kernel` (Pallas) refills the banded corridor exactly
   like the scoring kernels (tilted coordinates, affine prefix-min
   insertion closure) and *additionally* emits one int32 pointer word
   per cell to HBM, double-buffered DMA per rank.  Pointer selection
   reproduces the native backtrace's priority rules
   (``native/engine.cpp align_banded_impl``, mirroring the reference's
   score-difference backtrace ``gap_affine.rs:550-657``): Match checks
   diagonal first (predecessor ties resolve oldest-edge-first =
   highest flat-CSR column), then Deletion, then Insertion; Deletion
   checks gap-open before extend; Insertion likewise.  The fill also
   extracts the anchor cell's value: anchor == certified score proves
   the corridor contains an optimal path, so the decoded pointer chain
   IS an optimal alignment (the windows can only raise scores — DP
   monotonicity, same certificate as the native corridor ladder).
3. :func:`trace_decode` (jitted XLA fori_loop) walks the pointer chain
   for the whole batch in lockstep — one gather per read per step — and
   emits ``rank<<4 | op`` step words.
4. :func:`replay_steps` (host, vectorized numpy) turns step words into
   the framework's ``ArrayAlignment`` (identical pair semantics to the
   native engine's output).

Reference parity: the emitted alignments match the native engine's
byte-for-byte on every fuzz case (tests/test_trace.py) because both
follow the same priority rules over the same DP values; the cost==score
invariant is re-checked by tests, and any unverified read (anchor !=
score at the widest tier) falls back to the native path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dp_rows import INF
from .pallas_fill import (
    BIG_CHUNK,
    SMEM_PREFETCH_BUDGET,
    _ge_masks,
    _pallas_call,
    _prefix_min_rows,
    _roll_lanes,
)

# pointer-word layout (int32):
#   bits 0-1  msrc: 0 diag / 1 from-D / 2 from-I / 3 origin (stop)
#   bits 2-6  diagonal predecessor column (same-j column at the end rank)
#   bit  7    isrc: 0 gap-open / 1 extend
#   bit  8    dsrc: 0 gap-open / 1 extend
#   bits 9-13 deletion predecessor column (pm-argmin when open, pd- when
#             extend — both same-j)
MSRC_DIAG, MSRC_D, MSRC_I, MSRC_ORIGIN = 0, 1, 2, 3
_PMAX = 32  # pointer pred fields are 5 bits

# decode step words: rank<<4 | op
OP_STOP, OP_DIAG, OP_DEL, OP_INS, OP_HOP = 0, 1, 2, 3, 4


def trace_enabled(dg=None) -> bool:
    """Whether the device traceback path should be attempted.

    POASTA_DEVICE_TRACE: ``0`` off; ``all`` every graph size; default
    auto — small graphs only (prefetch-table kernel).  Auto rationale,
    measured on one v5e (scripts/trace_onchip.py): small graphs the
    device trace wins 2.7-4x end-to-end; past the SMEM budget the
    HBM-streamed big-trace kernel works (byte-equal) but the score fill
    dominates the batch wall and one host core backtraces the anchored
    corridors faster than the extra trace pass + decode (0.12 s vs
    0.67 s at 64 x 5 kb on a 50k-rank pangenome) — ``all`` is for hosts
    whose cores are the bottleneck, where trading chip time to free the
    host pays."""
    import os

    from .pallas_fill import _interpret_mode

    mode = os.environ.get("POASTA_DEVICE_TRACE", "")
    if mode == "0":
        return False
    if not _interpret_mode() and jax.default_backend() == "cpu":
        return False
    if dg is not None and not _prefetch_fits(dg, 2) and mode != "all":
        return False
    return True


def _stage_ranks(B_BLK: int, Wb: int) -> int:
    """Pointer rows staged per DMA: per-rank row DMAs cost ~latency each
    (measured 0.8 Gcells/s on the 50k-rank pangenome trace — 40x below
    the fill kernels), so S ranks batch into one transfer under a ~4 MiB
    double-buffered staging budget.  Power of two so BIG_CHUNK stays a
    multiple."""
    cap = (4 << 20) // (2 * B_BLK * Wb * 4)
    S = 1
    while S * 2 <= min(cap, 64):
        S *= 2
    return S


def _trace_kernel(
    # scalar prefetch
    symbols_ref,      # (Np,)
    pred_slots_ref,   # (Np*P,)
    pred_valid_ref,   # (Np*P,)
    wslot_ref,        # (Np,)
    any_step_ref,     # (Np,) int32: 1 if any read's window steps at r
    meta_ref,         # (4,): [n_real_ranks, end_rank, _, _]
    # inputs
    qshift_ref,       # (B_BLK, LQ) VMEM — pack_queries layout
    stepbits_ref,     # (B_BLK, SW) VMEM — bit r of read b: window steps
    anchor_r_ref,     # (B_BLK, 128) VMEM int32
    anchor_j_ref,     # (B_BLK, 128) VMEM int32
    # outputs
    aval_ref,         # (B_BLK, Wb) VMEM — anchor-value accumulation tile
    ptr_hbm,          # (Np, Btot, Wb) int32 ANY — pointer planes
    # scratch
    m_ring, d_ring,   # (W, B_BLK, Wb)
    q_cur,            # (B_BLK, LQ)
    words_tile,       # (B_BLK, 128) int32 — rolling step-word tile
    stage,            # (2*S, B_BLK, Wb) int32 — grouped DMA staging
    sems,             # (2,) DMA semaphores
    *, W: int, P: int, Wb: int, o: int, e: int, x: int, B_BLK: int,
    free_start: bool, S: int,
):
    """Tilted banded fill (see _banded_kernel_drift) with per-read step
    schedules, pointer emission, and anchor extraction.  int32 only —
    this pass runs once per batch; exotic dtypes buy nothing here."""
    n_nodes = meta_ref[0]
    end_rank = meta_ref[1]
    i_blk = pl.program_id(0)
    inf = INF

    for w in range(W):
        m_ring[w] = jnp.full((B_BLK, Wb), inf, dtype=jnp.int32)
        d_ring[w] = jnp.full((B_BLK, Wb), inf, dtype=jnp.int32)
    q_cur[:] = qshift_ref[:]
    aval_ref[:] = jnp.full((B_BLK, Wb), inf, dtype=jnp.int32)

    LQ = q_cur.shape[1]
    col32 = jax.lax.broadcasted_iota(jnp.int32, (B_BLK, Wb), dimension=1)
    masks = _ge_masks(col32, Wb)
    ar_col = anchor_r_ref[:][:, :1]
    aj_col = anchor_j_ref[:][:, :1]

    # pointer rows for S consecutive ranks stage in VMEM and leave as ONE
    # DMA per group (per-rank row copies are latency-bound)
    def _group_copy(g):
        buf = jax.lax.rem(g, 2)
        return pltpu.make_async_copy(
            stage.at[pl.ds(buf * S, S)],
            ptr_hbm.at[pl.ds(pl.multiple_of(g * S, S), S),
                       pl.ds(i_blk * B_BLK, B_BLK)],
            sems.at[buf],
        )

    def body(r, sig):
        sym = symbols_ref[r]

        # per-read step bit.  Mosaic only allows 128-aligned dynamic
        # lane slices, so the current step word rides in a rolling
        # (B, 128) tile: an aligned 128-word load every 4096 ranks, a
        # static 1-lane left roll every 32 — lane 0 is always rank r's
        # word.
        at_word = jax.lax.rem(r, 32) == 0
        at_tile = jax.lax.rem(r, 4096) == 0

        @pl.when(at_tile)
        def _():
            base = pl.multiple_of((r // 4096) * 128, 128)
            words_tile[:] = stepbits_ref[:, pl.ds(base, 128)]

        @pl.when(jnp.logical_and(at_word, jnp.logical_not(at_tile)))
        def _():
            words_tile[:] = _roll_lanes(words_tile[:], 127)

        stepw = words_tile[:, :1]  # (B, 1)
        stepped = jnp.logical_and(
            any_step_ref[r] == 1, ((stepw >> (r % 32)) & 1) == 1)
        sig = sig + jnp.where(stepped, 128, 0)

        @pl.when(any_step_ref[r] == 1)
        def _():
            qroll = jnp.concatenate(
                [q_cur[:, 128:], jnp.zeros((B_BLK, 128), jnp.int32)],
                axis=1)
            q_cur[:] = jnp.where(stepped, qroll, q_cur[:])

            def _ring_roll(row):
                # Wb == 128: the roll discards the whole row (Mosaic
                # rejects zero-width slices, so no concatenate)
                if Wb == 128:
                    return jnp.full((B_BLK, Wb), inf, jnp.int32)
                return jnp.concatenate(
                    [row[:, 128:],
                     jnp.full((B_BLK, 128), inf, jnp.int32)], axis=1)

            for w in range(W):
                mw = m_ring[w]
                dw = d_ring[w]
                m_ring[w] = jnp.where(stepped, _ring_roll(mw), mw)
                d_ring[w] = jnp.where(stepped, _ring_roll(dw), dw)

        j32 = col32 + sig  # (B, Wb) global query offsets

        # predecessor min + argmin (ties -> highest column = the native
        # backtrace's oldest-edge-first scan order)
        slot0 = pred_slots_ref[r * P]
        min_pm = m_ring[slot0]
        min_pd = d_ring[slot0]
        pmidx = jnp.zeros((B_BLK, Wb), jnp.int32)
        pdidx = jnp.zeros((B_BLK, Wb), jnp.int32)
        for p in range(1, P):
            slot = pred_slots_ref[r * P + p]
            valid = pred_valid_ref[r * P + p]
            keep = valid == 1
            am = jnp.where(keep, m_ring[slot], inf)
            ad = jnp.where(keep, d_ring[slot], inf)
            pmidx = jnp.where(am <= min_pm, p, pmidx)
            pdidx = jnp.where(ad <= min_pd, p, pdidx)
            min_pm = jnp.minimum(min_pm, am)
            min_pd = jnp.minimum(min_pd, ad)

        d_open = min_pm + (o + e)
        D = jnp.minimum(d_open, min_pd + e)
        dsrc = jnp.where(D == d_open, 0, 1)
        dpidx = jnp.where(D == d_open, pmidx, pdidx)

        diag_src = _roll_lanes(min_pm, 1)
        diag_src = jnp.where(masks[1], diag_src, inf)
        diag_idx = _roll_lanes(pmidx, 1)
        qwin = q_cur[:, :Wb]
        match_cost = jnp.where(qwin == sym, jnp.int32(-e),
                               jnp.int32(x - e))
        diag = diag_src + match_cost

        A = jnp.minimum(diag, D)
        if free_start:
            org = r != end_rank
        else:
            org = r == 0
        zero_at_origin = jnp.where(j32 == 0, jnp.int32(0), jnp.int32(inf))
        A = jnp.where(org, jnp.minimum(A, zero_at_origin), A)

        pref = _prefix_min_rows(A, Wb, jnp.int32(inf), col32, masks)
        pref_m1 = _roll_lanes(pref, 1)
        pref_m1 = jnp.where(masks[1], pref_m1, inf)
        I = jnp.minimum(pref_m1 + o, inf)

        M = jnp.minimum(A, I)
        is_end = r == end_rank

        # pointer word — native backtrace priority: diag, D, I; origin
        # only where the forced 0 is the value (j==0; no finite source
        # can also be 0 there: any real move costs > 0)
        msrc = jnp.where(M == diag, MSRC_DIAG,
                         jnp.where(M == D, MSRC_D, MSRC_I))
        at_origin = jnp.logical_and(j32 == 0, M == 0)
        msrc = jnp.where(jnp.logical_and(org, at_origin),
                         MSRC_ORIGIN, msrc)
        isrc = jnp.where(I == _roll_lanes(M, 1) + o, 0, 1)
        # virtual end rank: zero-cost same-offset hop from the best pred
        msrc = jnp.where(is_end, MSRC_DIAG, msrc)
        didx_eff = jnp.where(is_end, pmidx, diag_idx)
        word = (msrc | (didx_eff << 2) | (isrc << 7) | (dsrc << 8)
                | (dpidx << 9))

        M_final = jnp.where(is_end, min_pm, M)

        # anchor extraction (untilted: stored rows carry X(j) - e*j)
        matched = jnp.logical_and(ar_col == r, j32 == aj_col)
        aval_ref[:] = jnp.minimum(
            aval_ref[:], jnp.where(matched, M_final + e * j32, inf))

        # pointer row out: grouped double-buffered DMA
        g = r // S
        i_in = r - g * S

        @pl.when(jnp.logical_and(i_in == 0, g >= 2))
        def _():
            _group_copy(g - 2).wait()

        stage[jax.lax.rem(g, 2) * S + i_in] = word

        @pl.when(jnp.logical_or(i_in == S - 1, r == n_nodes - 1))
        def _():
            _group_copy(g).start()

        m_ring[wslot_ref[r]] = M_final
        d_ring[wslot_ref[r]] = jnp.where(is_end, inf, D)
        return sig

    sig0 = jnp.zeros((B_BLK, 1), jnp.int32)
    jax.lax.fori_loop(0, n_nodes, body, sig0)

    g_last = (n_nodes - 1) // S

    @pl.when(jnp.logical_and(n_nodes >= 1, g_last >= 1))
    def _():
        _group_copy(g_last - 1).wait()

    @pl.when(n_nodes >= 1)
    def _():
        _group_copy(g_last).wait()


@functools.lru_cache(maxsize=None)
def _trace_exec(nblocks: int, Np: int, W: int, P: int, Wb: int, SW: int,
                LQ: int, o: int, e: int, x: int, B_BLK: int,
                free_start: bool):
    S = _stage_ranks(B_BLK, Wb)
    Np_s = -(-Np // S) * S
    kernel = functools.partial(_trace_kernel, W=W, P=P, Wb=Wb, o=o, e=e,
                               x=x, B_BLK=B_BLK, free_start=free_start,
                               S=S)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((B_BLK, LQ), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_BLK, SW), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_BLK, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_BLK, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B_BLK, Wb), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, B_BLK, Wb), jnp.int32),
            pltpu.VMEM((W, B_BLK, Wb), jnp.int32),
            pltpu.VMEM((B_BLK, LQ), jnp.int32),
            pltpu.VMEM((B_BLK, 128), jnp.int32),
            pltpu.VMEM((2 * S, B_BLK, Wb), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    call = _pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((nblocks * B_BLK, Wb), jnp.int32),
            jax.ShapeDtypeStruct((Np_s, nblocks * B_BLK, Wb), jnp.int32),
        ],
        grid_spec=grid_spec,
    )

    @jax.jit
    def fn(symbols, pred_slots, pred_valid, wslots, any_step, meta,
           qshift, stepbits, anchor_r, anchor_j):
        def tile(v):
            return jnp.broadcast_to(
                v[:, None], (v.shape[0], 128)).astype(jnp.int32)

        aval, ptr = call(symbols, pred_slots, pred_valid, wslots,
                         any_step, meta, qshift, stepbits,
                         tile(anchor_r), tile(anchor_j))
        return jnp.min(aval, axis=1), ptr

    return fn


def _trace_kernel_big(
    # scalar prefetch
    meta_ref,         # (4,): [n_real_ranks, end_rank, R, _]
    # inputs
    tab_hbm,          # (Np_pad*R,) int32 HBM: [sym, wslot, slots*P, valid*P]
    anystep_hbm,      # (Np_pad,) int32 HBM: 1 if any read steps at r
    qshift_ref,       # (B_BLK, LQ) VMEM
    stepbits_ref,     # (B_BLK, SW) VMEM
    anchor_r_ref,     # (B_BLK, 128) VMEM int32
    anchor_j_ref,     # (B_BLK, 128) VMEM int32
    # outputs
    aval_ref,         # (B_BLK, Wb) VMEM
    ptr_hbm,          # (Np, Btot, Wb) int32 ANY
    # scratch
    m_ring, d_ring,   # (W, B_BLK, Wb)
    q_cur,            # (B_BLK, LQ)
    words_tile,       # (B_BLK, 128)
    stage,            # (2*S, B_BLK, Wb)
    tab_s,            # (2 * C * R,) SMEM
    any_s,            # (2 * C,) SMEM
    sems,             # (2,) pointer-group DMA semaphores
    tsem,             # (2,) table-chunk DMA semaphores
    *, W: int, P: int, Wb: int, o: int, e: int, x: int, B_BLK: int,
    free_start: bool, S: int,
):
    """Trace kernel for graphs past the scalar-prefetch SMEM budget:
    per-rank records [sym, wslot, pred_slot*P, pred_valid*P] plus the
    per-tier any-step flags stream HBM -> SMEM in double-buffered
    BIG_CHUNK chunks (the ``_fill_kernel_bounded_big`` pattern,
    ``pallas_fill.py``), while pointer rows DMA out per rank exactly
    like :func:`_trace_kernel`."""
    n_nodes = meta_ref[0]
    end_rank = meta_ref[1]
    R = 2 + 2 * P
    i_blk = pl.program_id(0)
    inf = INF
    C = BIG_CHUNK
    CW = C * R

    for w in range(W):
        m_ring[w] = jnp.full((B_BLK, Wb), inf, dtype=jnp.int32)
        d_ring[w] = jnp.full((B_BLK, Wb), inf, dtype=jnp.int32)
    q_cur[:] = qshift_ref[:]
    aval_ref[:] = jnp.full((B_BLK, Wb), inf, dtype=jnp.int32)

    col32 = jax.lax.broadcasted_iota(jnp.int32, (B_BLK, Wb), dimension=1)
    masks = _ge_masks(col32, Wb)
    ar_col = anchor_r_ref[:][:, :1]
    aj_col = anchor_j_ref[:][:, :1]

    n_chunks = (n_nodes + C - 1) // C

    def tab_dma(k, buf):
        return pltpu.make_async_copy(
            tab_hbm.at[pl.ds(k * CW, CW)],
            tab_s.at[pl.ds(buf * CW, CW)],
            tsem.at[buf])

    def any_dma(k, buf):
        return pltpu.make_async_copy(
            anystep_hbm.at[pl.ds(k * C, C)],
            any_s.at[pl.ds(buf * C, C)],
            tsem.at[buf])

    tab_dma(0, 0).start()
    any_dma(0, 0).start()

    def _group_copy(g):
        buf = jax.lax.rem(g, 2)
        return pltpu.make_async_copy(
            stage.at[pl.ds(buf * S, S)],
            ptr_hbm.at[pl.ds(pl.multiple_of(g * S, S), S),
                       pl.ds(i_blk * B_BLK, B_BLK)],
            sems.at[buf],
        )

    def chunk_body(k, sig):
        buf = jax.lax.rem(k, 2)
        # two half-waits: tab + anystep signalled the same semaphore
        tab_dma(k, buf).wait()
        any_dma(k, buf).wait()

        @pl.when(k + 1 < n_chunks)
        def _():
            nbuf = jax.lax.rem(k + 1, 2)
            tab_dma(k + 1, nbuf).start()
            any_dma(k + 1, nbuf).start()

        base0 = buf * CW
        abase = buf * C

        def body(i, sig):
            r = k * C + i
            rec = base0 + i * R
            sym = tab_s[rec]
            wslot = tab_s[rec + 1]
            any_step_r = any_s[abase + i]

            at_word = jax.lax.rem(r, 32) == 0
            at_tile = jax.lax.rem(r, 4096) == 0

            @pl.when(at_tile)
            def _():
                base = pl.multiple_of((r // 4096) * 128, 128)
                words_tile[:] = stepbits_ref[:, pl.ds(base, 128)]

            @pl.when(jnp.logical_and(at_word, jnp.logical_not(at_tile)))
            def _():
                words_tile[:] = _roll_lanes(words_tile[:], 127)

            stepw = words_tile[:, :1]
            stepped = jnp.logical_and(
                any_step_r == 1, ((stepw >> (r % 32)) & 1) == 1)
            sig = sig + jnp.where(stepped, 128, 0)

            @pl.when(any_step_r == 1)
            def _():
                qroll = jnp.concatenate(
                    [q_cur[:, 128:], jnp.zeros((B_BLK, 128), jnp.int32)],
                    axis=1)
                q_cur[:] = jnp.where(stepped, qroll, q_cur[:])

                def _ring_roll(row):
                    if Wb == 128:
                        return jnp.full((B_BLK, Wb), inf, jnp.int32)
                    return jnp.concatenate(
                        [row[:, 128:],
                         jnp.full((B_BLK, 128), inf, jnp.int32)], axis=1)

                for w in range(W):
                    mw = m_ring[w]
                    dw = d_ring[w]
                    m_ring[w] = jnp.where(stepped, _ring_roll(mw), mw)
                    d_ring[w] = jnp.where(stepped, _ring_roll(dw), dw)

            j32 = col32 + sig

            slot0 = tab_s[rec + 2]
            min_pm = m_ring[slot0]
            min_pd = d_ring[slot0]
            pmidx = jnp.zeros((B_BLK, Wb), jnp.int32)
            pdidx = jnp.zeros((B_BLK, Wb), jnp.int32)
            for p in range(1, P):
                slot = tab_s[rec + 2 + p]
                valid = tab_s[rec + 2 + P + p]
                keep = valid == 1
                am = jnp.where(keep, m_ring[slot], inf)
                ad = jnp.where(keep, d_ring[slot], inf)
                pmidx = jnp.where(am <= min_pm, p, pmidx)
                pdidx = jnp.where(ad <= min_pd, p, pdidx)
                min_pm = jnp.minimum(min_pm, am)
                min_pd = jnp.minimum(min_pd, ad)

            d_open = min_pm + (o + e)
            D = jnp.minimum(d_open, min_pd + e)
            dsrc = jnp.where(D == d_open, 0, 1)
            dpidx = jnp.where(D == d_open, pmidx, pdidx)

            diag_src = _roll_lanes(min_pm, 1)
            diag_src = jnp.where(masks[1], diag_src, inf)
            diag_idx = _roll_lanes(pmidx, 1)
            qwin = q_cur[:, :Wb]
            match_cost = jnp.where(qwin == sym, jnp.int32(-e),
                                   jnp.int32(x - e))
            diag = diag_src + match_cost

            A = jnp.minimum(diag, D)
            if free_start:
                org = r != end_rank
            else:
                org = r == 0
            zero_at_origin = jnp.where(j32 == 0, jnp.int32(0),
                                       jnp.int32(inf))
            A = jnp.where(org, jnp.minimum(A, zero_at_origin), A)

            pref = _prefix_min_rows(A, Wb, jnp.int32(inf), col32, masks)
            pref_m1 = _roll_lanes(pref, 1)
            pref_m1 = jnp.where(masks[1], pref_m1, inf)
            I = jnp.minimum(pref_m1 + o, inf)

            M = jnp.minimum(A, I)
            is_end = r == end_rank

            msrc = jnp.where(M == diag, MSRC_DIAG,
                             jnp.where(M == D, MSRC_D, MSRC_I))
            at_origin = jnp.logical_and(j32 == 0, M == 0)
            msrc = jnp.where(jnp.logical_and(org, at_origin),
                             MSRC_ORIGIN, msrc)
            isrc = jnp.where(I == _roll_lanes(M, 1) + o, 0, 1)
            msrc = jnp.where(is_end, MSRC_DIAG, msrc)
            didx_eff = jnp.where(is_end, pmidx, diag_idx)
            word = (msrc | (didx_eff << 2) | (isrc << 7) | (dsrc << 8)
                    | (dpidx << 9))

            M_final = jnp.where(is_end, min_pm, M)

            matched = jnp.logical_and(ar_col == r, j32 == aj_col)
            aval_ref[:] = jnp.minimum(
                aval_ref[:], jnp.where(matched, M_final + e * j32, inf))

            g = r // S
            i_in = r - g * S

            @pl.when(jnp.logical_and(i_in == 0, g >= 2))
            def _():
                _group_copy(g - 2).wait()

            stage[jax.lax.rem(g, 2) * S + i_in] = word

            @pl.when(jnp.logical_or(i_in == S - 1, r == n_nodes - 1))
            def _():
                _group_copy(g).start()

            m_ring[wslot] = M_final
            d_ring[wslot] = jnp.where(is_end, inf, D)
            return sig

        n_here = jnp.minimum(C, n_nodes - k * C)
        return jax.lax.fori_loop(0, n_here, body, sig)

    sig0 = jnp.zeros((B_BLK, 1), jnp.int32)
    jax.lax.fori_loop(0, n_chunks, chunk_body, sig0)

    g_last = (n_nodes - 1) // S

    @pl.when(jnp.logical_and(n_nodes >= 1, g_last >= 1))
    def _():
        _group_copy(g_last - 1).wait()

    @pl.when(n_nodes >= 1)
    def _():
        _group_copy(g_last).wait()


@functools.lru_cache(maxsize=None)
def _trace_exec_big(nblocks: int, Np: int, W: int, P: int, Wb: int,
                    SW: int, LQ: int, o: int, e: int, x: int, B_BLK: int,
                    free_start: bool):
    S = _stage_ranks(B_BLK, Wb)
    Np_s = -(-Np // S) * S
    kernel = functools.partial(_trace_kernel_big, W=W, P=P, Wb=Wb, o=o,
                               e=e, x=x, B_BLK=B_BLK,
                               free_start=free_start, S=S)
    R = 2 + 2 * P
    CW = BIG_CHUNK * R
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # rank table stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # anystep stays in HBM
            pl.BlockSpec((B_BLK, LQ), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_BLK, SW), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_BLK, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_BLK, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B_BLK, Wb), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, B_BLK, Wb), jnp.int32),
            pltpu.VMEM((W, B_BLK, Wb), jnp.int32),
            pltpu.VMEM((B_BLK, LQ), jnp.int32),
            pltpu.VMEM((B_BLK, 128), jnp.int32),
            pltpu.VMEM((2 * S, B_BLK, Wb), jnp.int32),
            pltpu.SMEM((2 * CW,), jnp.int32),
            pltpu.SMEM((2 * BIG_CHUNK,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    call = _pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((nblocks * B_BLK, Wb), jnp.int32),
            jax.ShapeDtypeStruct((Np_s, nblocks * B_BLK, Wb), jnp.int32),
        ],
        grid_spec=grid_spec,
    )

    @jax.jit
    def fn(tab, anystep, meta, qshift, stepbits, anchor_r, anchor_j):
        def tile(v):
            return jnp.broadcast_to(
                v[:, None], (v.shape[0], 128)).astype(jnp.int32)

        aval, ptr = call(meta, tab, anystep, qshift, stepbits,
                         tile(anchor_r), tile(anchor_j))
        return jnp.min(aval, axis=1), ptr

    return fn


# (dg id -> (dg, tab, meta)) static per-rank records for the big trace
# kernel (any-step flags stream separately, they change per tier)
_TRACE_TABLES: dict = {}


def _trace_big_table(dg):
    key = id(dg)
    ent = _TRACE_TABLES.get(key)
    if ent is not None and ent[0] is dg:
        return ent[1], ent[2]
    P = int(dg.pred_slots.shape[1])
    R = 2 + 2 * P
    Np = dg.n_nodes_padded
    Np_pad = ((Np + BIG_CHUNK - 1) // BIG_CHUNK) * BIG_CHUNK
    tab = np.zeros((Np_pad, R), dtype=np.int32)
    tab[:Np, 0] = np.asarray(dg.symbols)
    tab[:Np, 1] = np.asarray(dg.write_slots)
    tab[:Np, 2:2 + P] = np.asarray(dg.pred_slots)
    tab[:Np, 2 + P:2 + 2 * P] = np.asarray(dg.pred_valid).astype(np.int32)
    tab_dev = jnp.asarray(tab.reshape(-1))
    ent = (dg, tab_dev, Np_pad)
    _TRACE_TABLES[key] = ent
    while len(_TRACE_TABLES) > 8:
        _TRACE_TABLES.pop(next(iter(_TRACE_TABLES)))
    return tab_dev, Np_pad


def _prefetch_fits(dg, extra_per_rank_words: int) -> bool:
    P = int(dg.pred_slots.shape[1])
    words = dg.n_nodes_padded * (2 + 2 * P + extra_per_rank_words) + 8
    return words * 4 <= SMEM_PREFETCH_BUDGET


@functools.lru_cache(maxsize=None)
def _decode_exec(T_MAX: int, Np: int, B: int, Wb: int, P: int):
    """Batched pointer-chain walk: one fused gather round per step."""

    @jax.jit
    def fn(ptr, pred_ranks_flat, starts_flat, anchor_r, anchor_j,
           end_rank, active):
        ptr_flat = ptr.reshape(-1)
        bidx = jnp.arange(B, dtype=jnp.int32)

        def body(t, carry):
            r, j, st, done, ops = carry
            lane = jnp.clip(j - starts_flat[bidx * Np + r], 0, Wb - 1)
            word = ptr_flat[(r * B + bidx) * Wb + lane]
            msrc = word & 3
            mp = (word >> 2) & 31
            isrc = (word >> 7) & 1
            dsrc = (word >> 8) & 1
            dp = (word >> 9) & 31

            is_hop = jnp.logical_and(r == end_rank, t == 0)
            act = jnp.where(st == 0, msrc, jnp.where(st == 1, MSRC_D,
                                                     MSRC_I))
            op = jnp.where(
                is_hop, OP_HOP,
                jnp.where(act == MSRC_DIAG, OP_DIAG,
                          jnp.where(act == MSRC_D, OP_DEL,
                                    jnp.where(act == MSRC_I, OP_INS,
                                              OP_STOP))))
            pred_diag = pred_ranks_flat[r * P + mp]
            pred_del = pred_ranks_flat[r * P + dp]
            new_r = jnp.where(
                jnp.logical_or(is_hop, act == MSRC_DIAG), pred_diag,
                jnp.where(act == MSRC_D, pred_del, r))
            consumes = jnp.logical_and(
                jnp.logical_not(is_hop),
                jnp.logical_or(act == MSRC_DIAG, act == MSRC_I))
            new_j = jnp.where(consumes, j - 1, j)
            new_st = jnp.where(
                jnp.logical_or(is_hop, act == MSRC_DIAG), 0,
                jnp.where(act == MSRC_D, dsrc, 2 * isrc))
            step_word = jnp.where(done, 0, (r << 4) | op)
            ops = jax.lax.dynamic_update_slice(
                ops, step_word[:, None], (0, t))
            new_done = jnp.logical_or(
                done, jnp.logical_or(act == MSRC_ORIGIN, new_r == 0))
            r = jnp.where(done, r, new_r)
            j = jnp.where(done, j, new_j)
            st = jnp.where(done, st, new_st)
            return r, j, st, new_done, ops

        ops0 = jnp.zeros((B, T_MAX), jnp.int32)
        st0 = jnp.zeros((B,), jnp.int32)
        done0 = jnp.logical_not(active)
        r_f, j_f, st_f, done_f, ops = jax.lax.fori_loop(
            0, T_MAX, body, (anchor_r.astype(jnp.int32),
                             anchor_j.astype(jnp.int32), st0, done0, ops0))
        return ops, done_f

    return fn


def _schedule_body(dmin, dmax, lengths, k, aj, a_dmin, a_dmax, n_real,
                   *, Wb: int, Np: int, SW: int):
    """Traced schedule construction (shared by :func:`_schedule_exec`
    and the fused seed-corridor executor): per-read slope-limited
    128-quantized window starts, packed step bits, plus the corridor
    rank range (first/last rank whose window intersects [0, n_b])."""
    i64 = jnp.int64 if jax.config.read("jax_enable_x64") else jnp.int32
    K = jnp.maximum(k, 0).astype(i64)[:, None]
    nb = lengths.astype(i64)[:, None]
    ajc = aj.astype(i64)[:, None]
    lo = ajc - (a_dmax.astype(i64)[:, None] - dmax[None, :]) - K
    hi = jnp.minimum(
        ajc - (a_dmin.astype(i64)[:, None] - dmin[None, :]) + K, nb)
    ridx = jnp.arange(Np, dtype=i64)[None, :]
    nonempty = jnp.logical_and(ridx < n_real,
                               jnp.logical_and(lo <= hi, hi >= 0))
    need = jnp.where(nonempty, hi - (Wb - 1), 0)
    A = -(-jnp.maximum(need, 0) // 128)
    t = A - ridx
    req = jnp.flip(jax.lax.cummax(jnp.flip(t, 1), axis=1), 1) + ridx
    s = jax.lax.cummax(jnp.maximum(req, 0), axis=1)
    start = (s * 128).astype(jnp.int32)
    start = jnp.where(ridx < n_real, start, 0).astype(jnp.int32)
    viol = jnp.logical_and(
        nonempty,
        jnp.logical_or(start.astype(i64) > jnp.maximum(lo, 0),
                       start.astype(i64) + Wb - 1 < hi))
    ok = jnp.logical_not(viol.any(axis=1))
    prev = jnp.concatenate(
        [jnp.zeros((start.shape[0], 1), jnp.int32), start[:, :-1]],
        axis=1)
    bits = (start - prev) > 0
    any_step = bits.any(axis=0).astype(jnp.int32)
    pad = SW * 32 - Np
    bits_p = jnp.pad(bits, ((0, 0), (0, pad))).astype(jnp.uint32)
    lane = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    words = (bits_p.reshape(bits_p.shape[0], SW, 32) << lane).sum(
        axis=-1, dtype=jnp.uint32)
    packed = jax.lax.bitcast_convert_type(words, jnp.int32)
    has = nonempty.any(axis=1)
    r_lo = jnp.argmax(nonempty, axis=1).astype(jnp.int32)
    r_hi = (Np - 1
            - jnp.argmax(nonempty[:, ::-1], axis=1)).astype(jnp.int32)
    return packed, any_step, start, ok, r_lo, r_hi, has


@functools.lru_cache(maxsize=None)
def _schedule_exec(Wb: int, Np: int, SW: int):
    """Device-side schedule construction (jitted): the (B, Np) bound
    arrays never touch the host — at pangenome scale the numpy version
    spent 1.5 s/call on them plus a 12.8 MB starts upload (measured
    on-chip), vs ~ms of XLA elementwise + cummax scans.  The fourth
    output stacks (ok, r_lo, r_hi, has) so callers pay ONE
    device->host transfer — each np.asarray costs ~25 ms of RPC
    latency on tethered chips."""

    @jax.jit
    def fn(dmin, dmax, lengths, k, aj, a_dmin, a_dmax, n_real):
        packed, any_step, start, ok, r_lo, r_hi, has = _schedule_body(
            dmin, dmax, lengths, k, aj, a_dmin, a_dmax, n_real,
            Wb=Wb, Np=Np, SW=SW)
        meta4 = jnp.stack([ok.astype(jnp.int32), r_lo, r_hi,
                           has.astype(jnp.int32)])
        return packed, any_step, start, meta4

    return fn


# (flat id -> (flat, dmin_dev, dmax_dev)) padded distance potentials
_SCHED_POTS: dict = {}


def _sched_potentials(flat, Np: int):
    key = (id(flat), Np)
    ent = _SCHED_POTS.get(key)
    if ent is not None and ent[0] is flat:
        return ent[1], ent[2]
    n = flat.n_nodes
    dmin = np.zeros((Np,), np.int32)
    dmax = np.zeros((Np,), np.int32)
    dmin[:n] = flat.min_dist_from_start[:n]
    dmax[:n] = flat.max_dist_from_start[:n]
    ent = (flat, jnp.asarray(dmin), jnp.asarray(dmax))
    _SCHED_POTS[key] = ent
    while len(_SCHED_POTS) > 8:
        _SCHED_POTS.pop(next(iter(_SCHED_POTS)))
    return ent[1], ent[2]


def build_trace_schedule(flat, lengths_np, k_np, Wb: int, Np: int,
                         anchor_r_np=None, anchor_j_np=None):
    """Per-read monotone 128-quantized window-start schedule.

    Sound coverage bounds for any path of cost <= ub_b ending at the
    anchor: with dmin/dmax = min/max_dist_from_start (per-edge deltas
    are <=1 / >=1 respectively), a path cell at rank r satisfies
      aj - (dmax[ar] - dmax[r]) - K <= j <= aj - (dmin[ar] - dmin[r]) + K
    (consumed chars bracketed by edge counts +/- the total gap budget
    K = (ub - o) / e).  For the global case (anchor = virtual end at
    j = n) this reduces to the native align_banded window formula.

    The kernel can roll the window at most one 128-lane step per rank,
    so the start schedule must have slope <= 128/rank.  hi is NOT
    monotone in rank order (a short bubble branch ranked after a long
    one drops dmin), so stepping lazily at the rank that needs it can
    leave the schedule permanently behind a >128 jump.  Step EARLY
    instead: in 128-lane units, the minimal slope-limited schedule
    covering every future need is req[r] = max_{r2>=r}(A[r2]-(r2-r)),
    a reverse running max of A[r]-r (then monotonized forward).

    Returns DEVICE arrays (stepbits (B, SW) int32, any_step (Np,) int32,
    starts (B, Np) int32) + host ok (B,) bool — ok[b] False when width
    Wb provably cannot cover read b's bounds (caller widens or falls
    back).  The (B, Np)-sized intermediates live on the device only.
    """
    n = flat.n_nodes
    B = lengths_np.shape[0]
    dmin_d, dmax_d = _sched_potentials(flat, Np)
    dmin = flat.min_dist_from_start
    dmax = flat.max_dist_from_start
    if anchor_r_np is None:
        # global: anchor = virtual end rank at j = n_b
        aj = lengths_np.astype(np.int32)
        a_dmin = np.full((B,), dmin[n - 1], np.int32)
        a_dmax = np.full((B,), dmax[n - 1], np.int32)
    else:
        ar = anchor_r_np.astype(np.int64)
        aj = anchor_j_np.astype(np.int32)
        a_dmin = dmin[ar].astype(np.int32)
        a_dmax = dmax[ar].astype(np.int32)

    SW = ((Np + 31) // 32 + 127) // 128 * 128
    fn = _schedule_exec(Wb, Np, SW)
    packed, any_step, starts, meta4 = fn(
        dmin_d, dmax_d, jnp.asarray(lengths_np.astype(np.int32)),
        jnp.asarray(k_np.astype(np.int32)), jnp.asarray(aj),
        jnp.asarray(a_dmin), jnp.asarray(a_dmax), np.int32(n))
    return packed, any_step, starts, np.asarray(meta4)[0].astype(bool)


def replay_steps(ops_row, anchor_j, node_of_rank):
    """One read's decode step words -> (rpos, qpos) int32 arrays
    (ArrayAlignment layout: -1 encodes None).  Vectorized numpy."""
    opcode = ops_row & 15
    nz = np.nonzero(opcode == 0)[0]
    end = int(nz[0]) if nz.size else len(ops_row)
    opcode = opcode[:end]
    rank = (ops_row[:end] >> 4).astype(np.int64)
    consumes = (opcode == OP_DIAG) | (opcode == OP_INS)
    # j BEFORE each step: anchor_j minus chars consumed by prior steps
    j_before = anchor_j - np.concatenate(
        ([0], np.cumsum(consumes)[:-1]))
    emit = opcode != OP_HOP
    rpos = np.where(opcode == OP_INS, -1,
                    node_of_rank[rank]).astype(np.int32)
    qpos = np.where(opcode == OP_DEL, -1, j_before - 1).astype(np.int32)
    # decode walks end -> start; pairs are emitted forward
    return rpos[emit][::-1].copy(), qpos[emit][::-1].copy()


# transient HBM budget for the pointer planes (Np x B x Wb x 4 bytes);
# v5e carries 16 GB — leave room for the graph tables and fill buffers
PLANE_BYTES_BUDGET = 8 << 30


def pallas_trace_align(dg, flat, qshift, lengths, costs, scores,
                       anchor_r=None, anchor_j=None, free_start=False):
    """Batched device alignments inside score-certified corridors.

    ``scores`` are the batch's verified-exact scores (device scoring
    ladder); ``anchor_r/j`` the per-read end states for ends-free spans
    (None = global: virtual end rank at j = n_b).  Returns a list of
    ``(rpos, qpos) | None`` — None marks reads the widest tier could not
    verify (anchor value != score); the caller backtraces those on the
    host.  Exactness: a verified read's pointer chain has total cost ==
    its exact score by construction.

    Tiering mirrors the native corridor ladder
    (``engine.cpp align_anchored_impl``): a read's PROVEN-sufficient gap
    budget is K_full = (score - open)/extend, but its true diagonal
    drift is usually far smaller, so each width tier uses the largest
    budget that fits, K = (Wb - rank-potential-spread - slack)/2, capped
    at K_full — narrow tiers verify the bulk, and the anchor==score
    certificate keeps every tier exact regardless of the budget chosen.
    """
    from ..aligner.alignment import ArrayAlignment

    B, L = int(qshift.shape[0]), int(qshift.shape[1])
    n = flat.n_nodes
    Np = dg.n_nodes_padded
    P = int(dg.pred_slots.shape[1])
    if P > _PMAX:
        return [None] * B
    big = not _prefetch_fits(dg, 2)
    lengths_np = np.asarray(lengths)
    scores_np = np.asarray(scores).astype(np.int64)
    qshift_np = np.asarray(qshift)
    o, e, x = costs.gap_open, costs.gap_extend, costs.mismatch
    k_full = np.maximum(scores_np - o, 0) // max(e, 1) + 1
    anchor_r_np = None if anchor_r is None else np.asarray(anchor_r)
    anchor_j_np = None if anchor_j is None else np.asarray(anchor_j)

    out = [None] * B
    pending = np.arange(B)
    # INF scores (unalignable) and empty reads stay on the host path
    # (the native engine returns zero pairs for n == 0; the decode's
    # first step would instead chase deletions from the anchor)
    pending = pending[np.logical_and(scores_np < INF, lengths_np > 0)]
    ar_full = (np.full((B,), dg.end_rank_i, np.int32)
               if anchor_r_np is None else anchor_r_np.astype(np.int32))
    aj_full = (lengths_np.astype(np.int32)
               if anchor_j_np is None else anchor_j_np.astype(np.int32))

    spread = int((flat.max_dist_from_start[:n].astype(np.int64)
                  - flat.min_dist_from_start[:n]).max()) if n else 0
    pr_flat = np.zeros((Np, P), np.int32)
    pr_flat[:dg.pred_ranks_np.shape[0]] = dg.pred_ranks_np
    pr_dev = None  # uploaded once, on first decode

    for Wb in (256, 512, 1024, 2048, 4096):
        if pending.size == 0:
            break
        # pending reads compact into their own padded sub-batch: wider
        # tiers only pay for the reads that still need them, and the
        # HBM pointer-plane budget is spent on the sub-batch, not B
        sub = pending
        nsub = sub.size
        blk = 64 if nsub % 64 == 0 else 32
        Bp = -(-nsub // blk) * blk
        if Np * Bp * Wb * 4 > PLANE_BYTES_BUDGET:
            break  # planes over budget; remaining reads -> host path
        k_tier = np.minimum(k_full,
                            np.maximum((Wb - spread - 160) // 2, 16))
        at_k_full = bool((k_tier[sub] >= k_full[sub]).all())
        stepbits, any_step, starts, ok = build_trace_schedule(
            flat, lengths_np[sub], k_tier[sub], Wb, Np,
            None if anchor_r_np is None else anchor_r_np[sub],
            None if anchor_j_np is None else anchor_j_np[sub])
        if not ok.any():
            if at_k_full:
                break  # coverage can't improve: budgets already proven
            continue  # this width covers nobody; try wider
        LQ = max(L, Wb + 128)
        qpad = np.zeros((Bp, LQ), np.int32)
        qpad[:nsub, :L] = qshift_np[sub]
        sb = jnp.pad(stepbits, ((0, Bp - nsub), (0, 0)))
        arp = np.zeros((Bp,), np.int32)
        arp[:nsub] = ar_full[sub]
        ajp = np.zeros((Bp,), np.int32)
        ajp[:nsub] = aj_full[sub]
        SW = int(sb.shape[1])
        if big:
            tab_dev, Np_pad = _trace_big_table(dg)
            anyp = jnp.pad(any_step, (0, Np_pad - Np))
            fn = _trace_exec_big(Bp // blk, Np, dg.window, P, Wb, SW, LQ,
                                 o, e, x, blk, bool(free_start))
            aval, ptr = fn(tab_dev, anyp, dg.meta,
                           jnp.asarray(qpad), sb,
                           jnp.asarray(arp), jnp.asarray(ajp))
        else:
            fn = _trace_exec(Bp // blk, Np, dg.window, P, Wb, SW, LQ,
                             o, e, x, blk, bool(free_start))
            aval, ptr = fn(dg.symbols, dg.pred_slots_flat,
                           dg.pred_valid_flat, dg.write_slots,
                           any_step, dg.meta,
                           jnp.asarray(qpad), sb,
                           jnp.asarray(arp), jnp.asarray(ajp))
        aval_np = np.asarray(aval)[:nsub]
        verified = np.logical_and(aval_np == scores_np[sub], ok)
        if not verified.any():
            if at_k_full:
                break  # proven budgets already; wider tiers can't help
            continue
        T_MAX = int(-(-(int(lengths_np[sub].max())
                        + int(k_full[sub].max()) + 8) // 512) * 512)
        dec = _decode_exec(T_MAX, Np, Bp, Wb, P)
        stp = jnp.pad(starts, ((0, Bp - nsub), (0, 0))).reshape(-1)
        vp = np.zeros((Bp,), bool)
        vp[:nsub] = verified
        if pr_dev is None:
            pr_dev = jnp.asarray(pr_flat.reshape(-1))
        ops, done = dec(ptr, pr_dev, stp,
                        jnp.asarray(arp), jnp.asarray(ajp),
                        jnp.asarray(np.int32(dg.end_rank_i)),
                        jnp.asarray(vp))
        ops_np = np.asarray(ops)
        done_np = np.asarray(done)
        still = []
        for i, b in enumerate(sub):
            if verified[i] and done_np[i]:
                rpos, qpos = replay_steps(ops_np[i], int(aj_full[b]),
                                          flat.node_of_rank)
                out[b] = ArrayAlignment(rpos, qpos)
            else:
                still.append(b)
        pending = np.asarray(still, dtype=np.int64)
        if at_k_full:
            break  # anything still pending won't improve with width
    return out
