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
    _check_prefetch_fits,
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


def trace_enabled() -> bool:
    """Whether the device traceback path should be attempted: a live
    accelerator backend (or interpret mode, for CPU tests), not disabled
    via POASTA_DEVICE_TRACE=0."""
    import os

    from .pallas_fill import _interpret_mode

    if os.environ.get("POASTA_DEVICE_TRACE", "1") == "0":
        return False
    return _interpret_mode() or jax.default_backend() != "cpu"


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
    stage,            # (2, B_BLK, Wb) int32 — DMA staging
    sems,             # (2,) DMA semaphores
    *, W: int, P: int, Wb: int, o: int, e: int, x: int, B_BLK: int,
    free_start: bool,
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

    def wait_dma(r):
        # matches the copy started at rank r (descriptor shapes only
        # matter for bookkeeping; the semaphore is the sync object)
        buf = jax.lax.rem(r, 2)
        pltpu.make_async_copy(
            stage.at[buf],
            ptr_hbm.at[r, pl.ds(i_blk * B_BLK, B_BLK)],
            sems.at[buf],
        ).wait()

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

        # pointer row out: double-buffered rank DMA
        buf = jax.lax.rem(r, 2)

        @pl.when(r >= 2)
        def _():
            wait_dma(r - 2)

        stage[buf] = word
        pltpu.make_async_copy(
            stage.at[buf],
            ptr_hbm.at[r, pl.ds(i_blk * B_BLK, B_BLK)],
            sems.at[buf],
        ).start()

        m_ring[wslot_ref[r]] = M_final
        d_ring[wslot_ref[r]] = jnp.where(is_end, inf, D)
        return sig

    sig0 = jnp.zeros((B_BLK, 1), jnp.int32)
    jax.lax.fori_loop(0, n_nodes, body, sig0)

    @pl.when(n_nodes >= 2)
    def _():
        wait_dma(n_nodes - 2)

    @pl.when(n_nodes >= 1)
    def _():
        wait_dma(n_nodes - 1)


@functools.lru_cache(maxsize=None)
def _trace_exec(nblocks: int, Np: int, W: int, P: int, Wb: int, SW: int,
                LQ: int, o: int, e: int, x: int, B_BLK: int,
                free_start: bool):
    kernel = functools.partial(_trace_kernel, W=W, P=P, Wb=Wb, o=o, e=e,
                               x=x, B_BLK=B_BLK, free_start=free_start)
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
            pltpu.VMEM((2, B_BLK, Wb), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    call = _pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((nblocks * B_BLK, Wb), jnp.int32),
            jax.ShapeDtypeStruct((Np, nblocks * B_BLK, Wb), jnp.int32),
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


def build_trace_schedule(flat, lengths_np, k_np, Wb: int, Np: int,
                         anchor_r_np=None, anchor_j_np=None):
    """Per-read monotone 128-quantized window-start schedule (host).

    Sound coverage bounds for any path of cost <= ub_b ending at the
    anchor: with dmin/dmax = min/max_dist_from_start (per-edge deltas
    are <=1 / >=1 respectively), a path cell at rank r satisfies
      aj - (dmax[ar] - dmax[r]) - K <= j <= aj - (dmin[ar] - dmin[r]) + K
    (consumed chars bracketed by edge counts +/- the total gap budget
    K = (ub - o) / e).  For the global case (anchor = virtual end at
    j = n) this reduces to the native align_banded window formula.

    Returns (stepbits (B, SW) uint32-as-int32, any_step (Np,), starts
    (B, Np) int32, ok (B,) bool) — ok[b] False when width Wb provably
    cannot cover read b's bounds (caller widens or falls back).
    """
    n = flat.n_nodes
    B = lengths_np.shape[0]
    dmin = flat.min_dist_from_start.astype(np.int64)[:n]
    dmax = flat.max_dist_from_start.astype(np.int64)[:n]
    K = np.maximum(k_np.astype(np.int64), 0)[:, None]  # (B,1) gap budget
    nb = lengths_np.astype(np.int64)[:, None]
    if anchor_r_np is None:
        # global: anchor = virtual end rank at j = n_b
        aj = nb
        a_dmin = np.full((B, 1), dmin[n - 1])
        a_dmax = np.full((B, 1), dmax[n - 1])
    else:
        aj = anchor_j_np.astype(np.int64)[:, None]
        a_dmin = dmin[anchor_r_np.astype(np.int64)][:, None]
        a_dmax = dmax[anchor_r_np.astype(np.int64)][:, None]

    lo = aj - (a_dmax - dmax[None, :]) - K  # (B, Np_real)
    hi = aj - (a_dmin - dmin[None, :]) + K
    hi = np.minimum(hi, nb)
    # The kernel can roll the window at most one 128-lane step per rank,
    # so the start schedule must have slope <= 128/rank.  hi is NOT
    # monotone in rank order (a short bubble branch ranked after a long
    # one drops dmin), so stepping lazily at the rank that needs it can
    # leave the schedule permanently behind a >128 jump.  Step EARLY
    # instead: in 128-lane units, the minimal slope-limited schedule
    # covering every future need is req[r] = max_{r2>=r}(A[r2]-(r2-r)),
    # a reverse running max of A[r]-r (then monotonized forward).
    nonempty = np.logical_and(lo <= hi, hi >= 0)
    need = np.where(nonempty, hi - (Wb - 1), 0)  # empty ranks: no bound
    A = -(-np.maximum(need, 0) // 128)  # ceil to 128-lane units
    ridx = np.arange(A.shape[1], dtype=np.int64)[None, :]
    t = A - ridx
    req = (np.flip(np.maximum.accumulate(np.flip(t, axis=1), axis=1),
                   axis=1) + ridx)
    s = np.maximum.accumulate(np.maximum(req, 0), axis=1)
    start = s * 128
    # coverage check: window [start, start+Wb) must contain [lo, hi]
    # wherever the bounds are non-empty (stepping early can overshoot
    # max(lo, 0) when the corridor is wider than Wb allows)
    viol = np.logical_and(
        nonempty,
        np.logical_or(start > np.maximum(lo, 0), start + Wb - 1 < hi))
    ok = ~viol.any(axis=1)

    bits = (np.diff(start, axis=1, prepend=0) > 0)
    any_step_real = bits.any(axis=0)
    SW = ((Np + 31) // 32 + 127) // 128 * 128
    packed = np.zeros((B, SW), dtype=np.uint32)
    rr = np.nonzero(bits)
    packed[rr[0], rr[1] // 32] |= np.uint32(1) << (rr[1] % 32).astype(
        np.uint32)
    any_step = np.zeros((Np,), dtype=np.int32)
    any_step[:n] = any_step_real.astype(np.int32)
    starts_full = np.zeros((B, Np), dtype=np.int32)
    starts_full[:, :n] = start.astype(np.int32)
    return packed.view(np.int32), any_step, starts_full, ok


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
    _check_prefetch_fits(dg, 2)
    lengths_np = np.asarray(lengths)
    scores_np = np.asarray(scores).astype(np.int64)
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
    blk0 = 64 if B % 64 == 0 else 32
    Bp0 = -(-B // blk0) * blk0
    wb_max = min(4096, PLANE_BYTES_BUDGET // (Np * Bp0 * 4) // 128 * 128)

    for Wb in (256, 512, 1024, 2048, 4096):
        if pending.size == 0 or Wb > wb_max:
            break
        k_tier = np.minimum(k_full,
                            np.maximum((Wb - spread - 160) // 2, 16))
        at_k_full = bool((k_tier[pending] >= k_full[pending]).all())
        stepbits, any_step, starts, ok = build_trace_schedule(
            flat, lengths_np, k_tier, Wb, Np, anchor_r_np, anchor_j_np)
        LQ = max(L, Wb + 128)
        blk = 64 if B % 64 == 0 else 32
        Bp = -(-B // blk) * blk  # pad the batch to a whole block
        qpad = np.zeros((Bp, LQ), np.int32)
        qpad[:B, :L] = np.asarray(qshift)
        sb = np.zeros((Bp, stepbits.shape[1]), stepbits.dtype)
        sb[:B] = stepbits
        arp = np.zeros((Bp,), np.int32)
        arp[:B] = ar_full
        ajp = np.zeros((Bp,), np.int32)
        ajp[:B] = aj_full
        SW = sb.shape[1]
        fn = _trace_exec(Bp // blk, Np, dg.window, P, Wb, SW, LQ, o, e, x,
                         blk, bool(free_start))
        aval, ptr = fn(dg.symbols, dg.pred_slots_flat, dg.pred_valid_flat,
                       dg.write_slots, jnp.asarray(any_step), dg.meta,
                       jnp.asarray(qpad), jnp.asarray(sb),
                       jnp.asarray(arp), jnp.asarray(ajp))
        aval_np = np.asarray(aval)[:B]
        verified = np.zeros((B,), bool)
        verified[pending] = np.logical_and(
            aval_np[pending] == scores_np[pending], ok[pending])
        if not verified.any():
            if at_k_full:
                break  # proven budgets already; wider tiers can't help
            continue
        T_MAX = int(-(-(int(lengths_np.max()) + int(k_full.max()) + 8)
                      // 512) * 512)
        dec = _decode_exec(T_MAX, Np, Bp, Wb, P)
        pr_flat = np.zeros((Np, P), np.int32)
        pr_flat[:dg.pred_ranks_np.shape[0]] = dg.pred_ranks_np
        stp = np.zeros((Bp, Np), np.int32)
        stp[:B] = starts
        vp = np.zeros((Bp,), bool)
        vp[:B] = verified
        ops, done = dec(ptr, jnp.asarray(pr_flat.reshape(-1)),
                        jnp.asarray(stp.reshape(-1)),
                        jnp.asarray(arp), jnp.asarray(ajp),
                        jnp.asarray(np.int32(dg.end_rank_i)),
                        jnp.asarray(vp))
        ops_np = np.asarray(ops)
        done_np = np.asarray(done)
        still = []
        for b in pending:
            if verified[b] and done_np[b]:
                rpos, qpos = replay_steps(ops_np[b], int(aj_full[b]),
                                          flat.node_of_rank)
                out[b] = ArrayAlignment(rpos, qpos)
            else:
                still.append(b)
        pending = np.asarray(still, dtype=np.int64)
        if at_k_full:
            break  # anything still pending won't improve with width
    return out
