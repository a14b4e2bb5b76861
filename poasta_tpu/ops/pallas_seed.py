"""Seeded corridor scorer: per-read windowed with-ends fill (Pallas).

The third fill family, combining the other two:

* from the with-ends bounded kernels (:mod:`pallas_fill`,
  ``_fill_kernel_bounded_ends``): per-(read, offset) best-end tracking
  with the reference's tie-breaks (largest offset, then lowest rank);
* from the trace kernels (:mod:`pallas_trace`): per-read 128-quantized
  window step schedules, the tilted coordinates, and the HBM->SMEM
  table streaming that serves graphs past the scalar-prefetch budget.

Purpose: free-graph-begin (mapping) fills where a k-mer seed pass
(:mod:`poasta_tpu.aligner.seeds`) has bracketed each read's locus — the
fill then pays ``n_ranks x corridor_width`` cells instead of
``n_ranks x L``.  Exactness rides the seeds.py certificate: every cell
of any cost<=ub alignment lies inside the corridor, windows only raise
DP values, so a returned score that verifies (<= ub) is the full fill's
score with the identical optimal end state.

Unlike the score-certified trace corridors (which re-fill around a
*known* anchor), these corridors are built from hit diagonals BEFORE
any score exists — the schedule bound is the same potential bracketing,
anchored at the hits instead of the end state.
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
    VMEM_BUDGET,
    _ge_masks,
    _pallas_call,
    _prefix_min_rows,
    _roll_lanes,
)
from .pallas_trace import _sched_potentials


def _seed_kernel(
    # scalar prefetch
    meta_ref,         # (4,): [n_real_ranks, end_rank, _, _]
    c0_ref,           # (nblocks,): first table chunk per batch block
    cn_ref,           # (nblocks,): chunk count per batch block (0: skip)
    # inputs
    tab_hbm,          # (Np_pad*R,) int32 HBM: [sym, wslot, end_ok,
    #                   slots*P, valid*P] per rank
    anystep_hbm,      # (Np_pad,) int32 HBM
    qshift_ref,       # (B_BLK, LQ) VMEM — pack_queries layout,
    #                   pre-shifted left by the read's sig0 lanes
    stepbits_ref,     # (B_BLK, SW) VMEM
    nb_ref,           # (B_BLK, 128) int32 — read lengths
    jlo_ref,          # (B_BLK, 128) int32 — lowest permitted end offset
    sig0_ref,         # (B_BLK, 128) int32 — window start entering the
    #                   block's first rank (multiple of 128)
    # outputs
    val_ref,          # (B_BLK, Wb) int32 — best end value per lane
    jout_ref,         # (B_BLK, Wb) int32 — its global offset
    rout_ref,         # (B_BLK, Wb) int32 — its rank
    # scratch
    m_ring, d_ring,   # (W, B_BLK, Wb)
    q_cur,            # (B_BLK, LQ)
    words_tile,       # (B_BLK, 128)
    tab_s,            # (2 * C * R,) SMEM
    any_s,            # (2 * C,) SMEM
    tsem,             # (2,) table DMA semaphores
    *, W: int, P: int, Wb: int, o: int, e: int, x: int, B_BLK: int,
    free_start: bool, max_run: int = 0,
):
    """Tilted corridor fill with per-read step schedules and end-state
    extraction.  Output lanes are BUCKETS, not offsets: when the window
    rolls, a lane's recorded best (value, offset, rank) simply stays —
    offsets are stored explicitly, so no eviction fold is needed and the
    final cross-lane reduce recovers the batch end states.

    Batch blocks are locus-sorted by the caller and each carries its own
    rank range [c0*C, (c0+cn)*C): ranks outside it have empty windows
    for every read in the block (their in-corridor rows are all-INF, so
    skipping them computes the identical result) — per-block work is
    locus-span x Wb instead of n_ranks x Wb.  c0*C is 4096-aligned so
    the stepbits tile loads hit their r%4096==0 trigger; the window
    enters the block at sig0 (the schedule's start at the previous
    rank), with the query row pre-shifted to match."""
    n_nodes = meta_ref[0]
    end_rank = meta_ref[1]
    blk = pl.program_id(0)
    c0 = c0_ref[blk]
    ncn = cn_ref[blk]
    R = 3 + 2 * P
    inf = INF
    C = BIG_CHUNK
    CW = C * R

    for w in range(W):
        m_ring[w] = jnp.full((B_BLK, Wb), inf, dtype=jnp.int32)
        d_ring[w] = jnp.full((B_BLK, Wb), inf, dtype=jnp.int32)
    q_cur[:] = qshift_ref[:]
    val_ref[:] = jnp.full((B_BLK, Wb), inf, dtype=jnp.int32)
    jout_ref[:] = jnp.full((B_BLK, Wb), -1, dtype=jnp.int32)
    rout_ref[:] = jnp.full((B_BLK, Wb), jnp.int32(2**30), dtype=jnp.int32)

    col32 = jax.lax.broadcasted_iota(jnp.int32, (B_BLK, Wb), dimension=1)
    masks = _ge_masks(col32, Wb)
    nb_col = nb_ref[:][:, :1]
    jlo_col = jlo_ref[:][:, :1]

    def tab_dma(k_abs, buf):
        return pltpu.make_async_copy(
            tab_hbm.at[pl.ds(k_abs * CW, CW)],
            tab_s.at[pl.ds(buf * CW, CW)],
            tsem.at[buf])

    def any_dma(k_abs, buf):
        return pltpu.make_async_copy(
            anystep_hbm.at[pl.ds(k_abs * C, C)],
            any_s.at[pl.ds(buf * C, C)],
            tsem.at[buf])

    @pl.when(ncn > 0)
    def _():
        tab_dma(c0, 0).start()
        any_dma(c0, 0).start()

    def chunk_body(kk, sig):
        k = c0 + kk
        buf = jax.lax.rem(kk, 2)
        tab_dma(k, buf).wait()
        any_dma(k, buf).wait()

        @pl.when(kk + 1 < ncn)
        def _():
            nbuf = jax.lax.rem(kk + 1, 2)
            tab_dma(k + 1, nbuf).start()
            any_dma(k + 1, nbuf).start()

        base0 = buf * CW
        abase = buf * C

        def body(i, sig):
            r = k * C + i
            rec = base0 + i * R
            sym = tab_s[rec]
            wslot = tab_s[rec + 1]
            endok_r = tab_s[rec + 2]
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

            slot0 = tab_s[rec + 3]
            min_pm = m_ring[slot0]
            min_pd = d_ring[slot0]
            for p in range(1, P):
                slot = tab_s[rec + 3 + p]
                valid = tab_s[rec + 3 + P + p]
                keep = valid == 1
                min_pm = jnp.minimum(
                    min_pm, jnp.where(keep, m_ring[slot], inf))
                min_pd = jnp.minimum(
                    min_pd, jnp.where(keep, d_ring[slot], inf))

            D = jnp.minimum(min_pm + (o + e), min_pd + e)

            diag_src = _roll_lanes(min_pm, 1)
            diag_src = jnp.where(masks[1], diag_src, inf)
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

            pref = _prefix_min_rows(A, Wb, jnp.int32(inf), col32, masks,
                                    max_shift=max_run)
            pref_m1 = _roll_lanes(pref, 1)
            pref_m1 = jnp.where(masks[1], pref_m1, inf)
            I = jnp.minimum(pref_m1 + o, inf)

            M = jnp.minimum(A, I)
            is_end = r == end_rank
            M_final = jnp.where(is_end, min_pm, M)

            # end-state extraction (untilted value = stored + e*j); the
            # virtual end rank always qualifies, like end_ok in
            # ends_free_device_params
            elig = jnp.logical_and(
                jnp.logical_or(endok_r == 1, is_end),
                jnp.logical_and(j32 >= jlo_col, j32 <= nb_col))
            cand = jnp.where(elig, jnp.minimum(M_final + e * j32, inf),
                             inf)
            better = jnp.logical_or(
                cand < val_ref[:],
                jnp.logical_and(cand == val_ref[:], j32 > jout_ref[:]))
            val_ref[:] = jnp.where(better, cand, val_ref[:])
            jout_ref[:] = jnp.where(better, j32, jout_ref[:])
            rout_ref[:] = jnp.where(better, r, rout_ref[:])

            m_ring[wslot] = M_final
            d_ring[wslot] = jnp.where(is_end, inf, D)
            return sig

        n_here = jnp.minimum(C, n_nodes - k * C)
        return jax.lax.fori_loop(0, n_here, body, sig)

    sig0 = sig0_ref[:][:, :1]
    jax.lax.fori_loop(0, ncn, chunk_body, sig0)


@functools.lru_cache(maxsize=None)
def _seed_exec(nblocks: int, Np: int, W: int, P: int, Wb: int, SW: int,
               LQ: int, LRAW: int, o: int, e: int, x: int, B_BLK: int,
               free_start: bool, max_run: int = 0):
    kernel = functools.partial(_seed_kernel, W=W, P=P, Wb=Wb, o=o, e=e,
                               x=x, B_BLK=B_BLK, free_start=free_start,
                               max_run=max_run)
    R = 3 + 2 * P
    CW = BIG_CHUNK * R
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
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
            pl.BlockSpec((B_BLK, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B_BLK, Wb), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_BLK, Wb), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_BLK, Wb), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, B_BLK, Wb), jnp.int32),
            pltpu.VMEM((W, B_BLK, Wb), jnp.int32),
            pltpu.VMEM((B_BLK, LQ), jnp.int32),
            pltpu.VMEM((B_BLK, 128), jnp.int32),
            pltpu.SMEM((2 * CW,), jnp.int32),
            pltpu.SMEM((2 * BIG_CHUNK,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    call = _pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((nblocks * B_BLK, Wb), jnp.int32),
            jax.ShapeDtypeStruct((nblocks * B_BLK, Wb), jnp.int32),
            jax.ShapeDtypeStruct((nblocks * B_BLK, Wb), jnp.int32),
        ],
        grid_spec=grid_spec,
    )

    Np_pad = ((Np + BIG_CHUNK - 1) // BIG_CHUNK) * BIG_CHUNK
    SW_local = SW

    @jax.jit
    def fn(tab, meta, dmin, dmax, qshift_raw, perm, nb, k, a_min, b_max,
           jlo, n_real):
        """Fused pipeline: schedule -> block rank ranges -> sig0/query
        prep -> corridor kernel -> end-state reduce, ONE dispatch and
        ONE (4, B) device->host transfer per call.  The eager version
        paid ~25 ms of tether RPC latency for the schedule meta fetch
        plus ~10 ms per extra XLA dispatch."""
        from .pallas_trace import _schedule_body

        def tile(v):
            return jnp.broadcast_to(
                v[:, None], (v.shape[0], 128)).astype(jnp.int32)

        B = nb.shape[0]
        aj0 = jnp.zeros((B,), jnp.int32)
        stepbits, any_step, starts, ok, r_lo, r_hi, has = _schedule_body(
            dmin, dmax, nb, k, aj0, (-b_max).astype(jnp.int32),
            (-a_min).astype(jnp.int32), n_real,
            Wb=Wb, Np=Np, SW=SW_local)
        anyp = jnp.pad(any_step, (0, Np_pad - Np))

        # per-block chunk ranges (4096-aligned entry so the stepbits
        # tile trigger fires on the block's first rank)
        C = BIG_CHUNK
        n_chunks = (n_real + C - 1) // C
        r_lo_b = jnp.min(jnp.where(has, r_lo, Np).reshape(nblocks, B_BLK),
                         axis=1)
        r_hi_b = jnp.max(jnp.where(has, r_hi, -1).reshape(nblocks, B_BLK),
                         axis=1)
        has_b = has.reshape(nblocks, B_BLK).any(axis=1)
        lo4 = (r_lo_b // 4096) * 4096
        c0 = jnp.where(has_b, lo4 // C, 0).astype(jnp.int32)
        cend = jnp.minimum(n_chunks, -(-(r_hi_b + 1) // C))
        cn = jnp.where(has_b, cend - c0, 0).astype(jnp.int32)
        blk_lo = jnp.repeat(lo4, B_BLK)

        prev_idx = jnp.maximum(blk_lo - 1, 0)
        sig0 = jnp.take_along_axis(starts, prev_idx[:, None],
                                   axis=1)[:, 0]
        sig0 = jnp.where(blk_lo == 0, jnp.int32(0), sig0)
        q = jnp.take(qshift_raw, perm, axis=0)
        if LQ > LRAW:
            q = jnp.pad(q, ((0, 0), (0, LQ - LRAW)))
        lane = jnp.arange(LQ, dtype=jnp.int32)[None, :] + sig0[:, None]
        q = jnp.where(lane < LQ,
                      jnp.take_along_axis(q, jnp.minimum(lane, LQ - 1),
                                          axis=1), 0)
        val, jout, rout = call(meta, c0, cn, tab, anyp, q,
                               stepbits, tile(nb), tile(jlo),
                               tile(sig0))
        score = jnp.min(val, axis=1)
        tie = val == score[:, None]
        ej = jnp.max(jnp.where(tie, jout, jnp.int32(-1)), axis=1)
        at_j = jnp.logical_and(tie, jout == ej[:, None])
        er = jnp.min(jnp.where(at_j, rout, jnp.int32(2**30)), axis=1)
        score = jnp.where(score >= INF, jnp.int32(INF), score)
        # one stacked block: a single device->host transfer
        return jnp.stack([score, er, ej, ok.astype(jnp.int32)])

    return fn


# (dg id, end_ok id) -> (dg, end_ok, tab, Np_pad) — static per-rank
# records; end_ok varies with the graph_free_end bound so it keys too
_SEED_TABLES: dict = {}


def _seed_big_table(dg, end_ok):
    key = (id(dg), id(end_ok))
    ent = _SEED_TABLES.get(key)
    if ent is not None and ent[0] is dg and ent[1] is end_ok:
        return ent[2], ent[3]
    P = int(dg.pred_slots.shape[1])
    R = 3 + 2 * P
    Np = dg.n_nodes_padded
    Np_pad = ((Np + BIG_CHUNK - 1) // BIG_CHUNK) * BIG_CHUNK
    tab = np.zeros((Np_pad, R), dtype=np.int32)
    tab[:Np, 0] = np.asarray(dg.symbols)
    tab[:Np, 1] = np.asarray(dg.write_slots)
    eo = np.asarray(end_ok)
    tab[:min(Np, eo.shape[0]), 2] = eo[:Np]
    tab[:Np, 3:3 + P] = np.asarray(dg.pred_slots)
    tab[:Np, 3 + P:3 + 2 * P] = np.asarray(dg.pred_valid).astype(np.int32)
    tab_dev = jnp.asarray(tab.reshape(-1))
    ent = (dg, end_ok, tab_dev, Np_pad)
    _SEED_TABLES[key] = ent
    while len(_SEED_TABLES) > 8:
        _SEED_TABLES.pop(next(iter(_SEED_TABLES)))
    return tab_dev, Np_pad


WB_MAX = 4096  # corridor width budget; wider reads use the full fill

# batch-block cap: smaller blocks localize rank ranges (each block scans
# only its own reads' locus span), at the cost of more per-rank scalar
# iterations when loci overlap.  Three-point A/B on the 50k-node
# pangenome config (64 x 5 kb, POASTA_SEED_BLK override): blk=8
# 0.145 s, blk=16 0.120 s, blk=32 0.162 s per corridor fill — 16 wins
SEED_B_BLK = 16


def pallas_seed_scores(dg, flat, qshift, lengths, costs, free_start,
                       end_ok, jlo, alpha_min, beta_max, ub_np):
    """(scores, end_ranks, end_offsets, ok) via the seeded corridor fill.

    ``alpha_min/beta_max``: per-read hit-diagonal cluster bounds from
    :func:`poasta_tpu.aligner.seeds.propose_clusters`; ``ub_np``:
    per-read score upper bounds the corridor margin is sized for
    (callers verify ``score <= ub`` and the post-hoc certificate
    afterwards).  ``ok[b]`` False marks reads whose corridor did not fit
    the width budget (fall back to the full fill); their score lanes
    are INF.

    The batch is locus-sorted internally so consecutive reads share
    rank ranges; each kernel block processes only its own chunk span.
    Outputs are returned in the caller's order.
    """
    B, L = int(qshift.shape[0]), int(qshift.shape[1])
    Np = dg.n_nodes_padded
    P = int(dg.pred_slots.shape[1])
    o, e, x = costs.gap_open, costs.gap_extend, costs.mismatch
    lengths_np = np.asarray(lengths)
    k_np = ub_np // max(e, 1) + 1

    # requested width: hit-diagonal spread + both gap margins + roll
    # quantization slack
    spread = np.maximum(beta_max - alpha_min, 0)
    need = int((spread + 2 * k_np).max()) + 1 if B else 0
    # 512-quantized so batch-to-batch cluster-width jitter doesn't
    # recompile the kernel (ub's run cap is pow2-quantized for the same
    # reason)
    Wb = max(256, -(-(need + 160) // 512) * 512)
    if Wb > WB_MAX:
        return None

    from .pallas_fill import pick_b_blk

    import os

    LQ = -(-max(L, Wb + 128) // 128) * 128
    blk_cap = int(os.environ.get("POASTA_SEED_BLK", "0")) or SEED_B_BLK
    blk = min(pick_b_blk(dg.window, Wb, LQ, 4, n_rings=4), blk_cap)
    while B % blk:
        blk //= 2
    if blk < 8:
        return None

    import time as _time

    prof = os.environ.get("POASTA_SEED_PROFILE")
    t_start = _time.perf_counter()

    # locus sort: consecutive (sorted) reads fall into the same block,
    # so block rank ranges stay narrow
    perm = np.argsort(alpha_min + beta_max, kind="stable")
    inv = np.empty_like(perm)
    inv[perm] = np.arange(B)
    a_p = alpha_min[perm]
    b_p = beta_max[perm]
    k_p = k_np[perm]
    l_p = lengths_np[perm]
    jlo_p = np.asarray(jlo).astype(np.int64)[perm]

    tab_dev, _Np_pad = _seed_big_table(dg, end_ok)
    dmin_d, dmax_d = _sched_potentials(flat, Np)

    from ..aligner.banded import ins_run_cap

    max_run = ins_run_cap(costs, int(ub_np.max()), Wb)
    SW = ((Np + 31) // 32 + 127) // 128 * 128
    nblocks = B // blk
    fn = _seed_exec(nblocks, Np, dg.window, P, Wb, SW, LQ, L,
                    o, e, x, blk, bool(free_start), max_run)
    i32 = np.int32
    packed4 = fn(tab_dev, dg.meta, dmin_d, dmax_d, jnp.asarray(qshift),
                 jnp.asarray(perm.astype(i32)),
                 jnp.asarray(l_p.astype(i32)),
                 jnp.asarray(k_p.astype(i32)),
                 jnp.asarray(a_p.astype(i32)),
                 jnp.asarray(b_p.astype(i32)),
                 jnp.asarray(jlo_p.astype(i32)), i32(flat.n_nodes))
    out4 = np.asarray(packed4)
    ok = out4[3][inv].astype(bool)
    sc = np.where(ok, out4[0][inv], INF).astype(np.int64)
    out = sc, out4[1][inv].astype(np.int64), out4[2][inv].astype(np.int64), ok
    if prof:
        print(f"[seed-profile] Wb={Wb} blk={blk} fused "
              f"{round(_time.perf_counter() - t_start, 4)}s", flush=True)
    return out


# VMEM_BUDGET re-exported check keeps pick_b_blk honest about the four
# ring-sized buffers this kernel carries (2 rings + 3 outputs ~ 4 rings)
_ = VMEM_BUDGET
