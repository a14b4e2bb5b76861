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
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 1 << 28  # python int: pallas kernels cannot capture traced constants

# int16 variant: every stored ring value is clamped to <= INF16 by the
# kernel's min(..., INF) structure, and intermediates reach at most
# INF16 + e*(L-1) + open + mismatch, which must stay < 32767.  Callers use
# the int16 path only when the worst finite DP cell (<= 2*open +
# extend*(N+L) + mismatch) stays strictly below INF16 (see score_dtype).
INF16 = 1 << 14

B_BLK = 64  # default batch block; callers may pick larger when VMEM allows

# Scalar-prefetch tables (symbols, predecessor slots/valid, write slots,
# window starts...) live in SMEM, which holds ~1 MiB on v5e: graphs past
# ~50-100k nodes (P-dependent) fail remote compilation.  Guarded up
# front so giant graphs fall back to the XLA body cleanly instead of
# paying a failed compile round trip.
SMEM_PREFETCH_BUDGET = 1024 * 1024


def _check_prefetch_fits(dg, extra_per_rank_words: int = 0) -> None:
    P = int(dg.pred_slots.shape[1])
    words = dg.n_nodes_padded * (2 + 2 * P + extra_per_rank_words) + 8
    if words * 4 > SMEM_PREFETCH_BUDGET:
        raise ValueError(
            f"graph too large for the Pallas kernels' scalar-prefetch "
            f"SMEM ({dg.n_nodes_padded} ranks x P={P}); the XLA body "
            "serves graphs of this size"
        )

# Scoped VMEM is 16 MiB; the kernel's live temporaries (prefix-min
# rounds, gather operands) need ~4 MiB on top of rings + I/O blocks, so
# the ring budget stops at 10 MiB (measured: 12 MiB OOMs at B_BLK=256).
VMEM_BUDGET = 10 * 1024 * 1024


_INT16_PROBE: list = []  # [] = not probed; [True/False] = probe result


def _int16_supported() -> bool:
    """One-shot probe: can the current Mosaic toolchain compile AND
    correctly run the int16 fill kernel?

    The 2026-08 v5e toolchain cannot (no 16-bit lane rotate; i1 relayout
    between the (8,128)/(16,128) layouts fails; ``arith.minsi`` is not
    legalized on the packed layout from bitcast+roll).  The kernel bodies
    are dtype-generic, so this probe auto-enables int16 — halving ring
    VMEM and bandwidth — the moment a toolchain update lands.
    """
    if _interpret_mode():
        # interpret mode executes any dtype as plain JAX — a probe here
        # would record a toolchain verdict no toolchain produced
        return False
    if _INT16_PROBE:
        return _INT16_PROBE[0]
    # failed compiles aren't covered by jax's persistent cache, so a fresh
    # process would re-pay the probe every run — persist the verdict on
    # disk, keyed by the jax version
    import os

    probe_file = None
    try:
        # key by everything the verdict depends on: the Mosaic toolchain
        # (libtpu) ships separately from jax, and the correctness check
        # is per device generation
        try:
            import importlib.metadata as _ilm

            toolchain = _ilm.version("libtpu")
        except Exception:
            toolchain = "unknown"
        devkind = jax.devices()[0].device_kind.replace(" ", "_")
        probe_file = os.path.join(
            os.path.expanduser("~"), ".cache", "poasta_tpu",
            f"int16_probe_{jax.__version__}_{toolchain}_{devkind}"
        )
        if os.path.exists(probe_file):
            ok = open(probe_file).read().strip() == "1"
            _INT16_PROBE.append(ok)
            return ok
    except Exception:
        probe_file = None
    ok = False
    try:
        if jax.default_backend() != "cpu":
            sym = np.array([-1, 65, 65, -1], dtype=np.int32)
            sym = np.resize(sym, 64)
            symbols = jnp.asarray(sym)
            pred_slots = jnp.zeros((64 * 1,), jnp.int32)
            pred_valid = jnp.asarray(
                np.resize(np.array([0, 1, 1, 1], np.int32), 64))
            wslots = jnp.asarray(np.arange(64, dtype=np.int32) % 2)
            meta = jnp.asarray([3, 2, 0, 0], jnp.int32)
            q = jnp.zeros((64, 128), jnp.int32).at[:, 1].set(65)
            lengths = jnp.ones((64,), jnp.int32)
            fn16 = _pallas_exec(1, 2, 1, 128, 6, 2, 4, B_BLK=64,
                                use_int16=True)
            out16 = np.asarray(fn16(symbols, pred_slots, pred_valid, wslots,
                                    meta, q, lengths))
            fn32 = _pallas_exec(1, 2, 1, 128, 6, 2, 4, B_BLK=64,
                                use_int16=False)
            out32 = np.asarray(fn32(symbols, pred_slots, pred_valid, wslots,
                                    meta, q, lengths))
            ok = bool((out16 == out32).all())
    except Exception:
        ok = False
    _INT16_PROBE.append(ok)
    if probe_file is not None:
        try:
            os.makedirs(os.path.dirname(probe_file), exist_ok=True)
            with open(probe_file, "w") as fh:
                fh.write("1" if ok else "0")
        except Exception:
            pass
    return ok


def int16_probe_report() -> dict:
    """The int16-kernel toolchain verdict + the toolchain it was probed
    against, for bench artifacts (VERDICT r3 #9): the blocked 2x ring
    lever stays visible in driver JSON instead of only in BACKLOG prose.
    Forces the probe if it hasn't run this process."""
    try:
        import importlib.metadata as _ilm

        toolchain = _ilm.version("libtpu")
    except Exception:
        toolchain = "unknown"
    return {
        "int16_kernel_supported": _int16_supported(),
        "int16_probe_toolchain": f"jax {jax.__version__} / libtpu {toolchain}",
    }


def score_dtype(n_nodes: int, L: int, o: int, e: int, x: int):
    """int16 when the worst finite DP value provably fits and the
    toolchain can compile the int16 kernel (see :func:`_int16_supported`),
    else int32.

    The tilted banded kernels need the tighter INF16//2 bound: INF
    erodes by at most e per rank through tilted diag chains, and the
    extraction separates eroded-INF from genuine values at INF16//2 —
    sound iff worst-genuine < INF16//2 < INF16 - e*n_nodes, both implied
    by worst < INF16//2 - 64 (worst >= e*n_nodes).
    """
    worst = 2 * o + e * (n_nodes + L) + x
    if worst < INF16 // 2 - 64 and e * (L - 1) + o + x + INF16 < 32767 \
            and _int16_supported():
        return jnp.int16
    return jnp.int32


def pick_b_blk(W: int, row_lanes: int, L: int, itemsize: int = 4,
               n_rings: int = 2) -> int:
    """Largest batch block whose rings (+ qshift block) fit the VMEM
    budget.  Goes down to 32 rows so long-L configurations (e.g. the
    bounded full fill at 5 kb reads, 3 L-wide rows) still compile
    instead of falling back to the XLA body."""
    for cand in (512, 256, 128, 64, 32):
        need = n_rings * W * cand * row_lanes * itemsize + cand * L * 4 * 2
        if need <= VMEM_BUDGET:
            return cand
    return 32


def _interpret_mode() -> bool:
    """``POASTA_PALLAS_INTERPRET=1`` runs every kernel in Pallas
    interpret mode — plain JAX ops, CPU-executable — so the kernel
    *code* (tilt math, run caps, flag-driven branches) is testable
    without an accelerator.  Mosaic compilation/legalization is NOT
    covered; on-chip runs stay authoritative for that."""
    import os

    return os.environ.get("POASTA_PALLAS_INTERPRET", "") not in ("", "0")


def _pallas_call(*args, **kw):
    """pl.pallas_call with the module-wide interpret gate.

    The flag is read when an exec builder constructs its call, and the
    builders are lru_cached by shape params only — flip the mode via
    :func:`set_interpret_mode` (which clears the caches), not by
    mutating the env mid-process."""
    kw.setdefault("interpret", _interpret_mode())
    return pl.pallas_call(*args, **kw)


def set_interpret_mode(on: bool) -> None:
    """Flip interpret mode and clear every cached exec builder plus the
    pallas failure memo, so kernels built under the previous mode (or
    real-compile failures recorded on a CPU backend) don't leak in."""
    import os
    import sys

    if on:
        os.environ["POASTA_PALLAS_INTERPRET"] = "1"
    else:
        os.environ.pop("POASTA_PALLAS_INTERPRET", None)
    mods = [sys.modules[__name__]]
    try:
        from . import pallas_trace as _pt

        mods.append(_pt)
    except Exception:
        pass
    for mod in mods:
        for name in dir(mod):
            fn = getattr(mod, name)
            if callable(fn) and hasattr(fn, "cache_clear"):
                fn.cache_clear()
    _INT16_PROBE.clear()  # a verdict memoized under the other mode is stale
    from ..aligner import wavefront as _wf

    _wf._PALLAS_FAILED.clear()


def _roll_lanes(t: jnp.ndarray, k: int) -> jnp.ndarray:
    """Roll along the lane (last) axis; works for int16 and int32.

    Mosaic (v5e) has no 16-bit lane rotate, but int16 packs pairs along
    *sublanes*, so bitcasting to int32 halves the sublane count and leaves
    the lane axis untouched — an int32 lane roll is then bit-identical to
    the int16 one (validated on hardware).
    """
    if t.dtype == jnp.int16:
        y = pltpu.bitcast(t, jnp.int32)
        y = pltpu.roll(y, k, 1)
        return pltpu.bitcast(y, jnp.int16)
    return pltpu.roll(t, k, 1)


def _ge_masks(col32, L: int):
    """The lane masks used by the prefix-min rounds (and the 1-shift).

    They are rank-invariant, so kernels compute them once before the rank
    loop instead of re-deriving ~log2(L) iota compares per rank.
    """
    masks = {}
    k = 1
    while k < L:
        masks[k] = col32 >= k
        k <<= 1
    return masks


def _prefix_min_rows(t: jnp.ndarray, L: int, inf, col32,
                     masks=None, max_shift: int = 0) -> jnp.ndarray:
    """Inclusive prefix-min along the last (lane) axis via shift+min.

    ``col32`` is an int32 lane iota; ``masks`` an optional precomputed
    :func:`_ge_masks` dict.  ``max_shift`` (power of two) truncates the
    look-back window to that many lanes — banded fills use it to skip
    Hillis–Steele rounds past the ≤ub insertion-run bound (see
    ``aligner.banded.ins_run_cap``; truncation only over-estimates, so
    verify-and-retry exactness is preserved).  Mosaic (v5e) constraints
    for the int16 path, established empirically: comparisons must be
    int32 (int16 compares fail i1 relayout), int32-compare masks may
    select int16 *arrays* (not scalar/scalar pairs), and scalar
    conditions must not be logical_and-ed with vector masks.
    """
    k = 1
    cap = min(L, max_shift) if max_shift else L
    while k < cap:
        shifted = _roll_lanes(t, k)
        mask = masks[k] if masks is not None else col32 >= k
        shifted = jnp.where(mask, shifted, inf)
        t = jnp.minimum(t, shifted)
        k <<= 1
    return t


def _fill_kernel(
    # scalar prefetch
    symbols_ref,      # (Np,) int32
    pred_slots_ref,   # (Np*P,) int32 — flattened: 2D SMEM pads to 128 lanes
    pred_valid_ref,   # (Np*P,) int32 (0/1)
    wslot_ref,        # (Np,) int32 — liveness-colored ring slot per rank
    meta_ref,         # (4,) int32: [n_real_ranks, end_rank, 0, 0]
    # inputs
    qshift_ref,       # (B_BLK, L) int32 VMEM
    # outputs
    end_row_ref,      # (B_BLK, L) int32 VMEM
    # scratch (best_ref only present when free_end)
    *refs,
    W: int, P: int, L: int, o: int, e: int, x: int, B_BLK: int, dtype,
    free_start: bool = False, free_end: bool = False,
):
    if free_end:
        m_ring, d_ring, best_ref = refs
    else:
        m_ring, d_ring = refs
        best_ref = None
    n_nodes = meta_ref[0]
    end_rank = meta_ref[1]
    inf = INF16 if dtype == jnp.int16 else INF

    for w in range(W):
        m_ring[w] = jnp.full((B_BLK, L), inf, dtype=dtype)
        d_ring[w] = jnp.full((B_BLK, L), inf, dtype=dtype)
    if free_end:
        best_ref[:] = jnp.full((B_BLK, L), inf, dtype=dtype)

    qshift = qshift_ref[:]
    col32 = jax.lax.broadcasted_iota(jnp.int32, (B_BLK, L), dimension=1)
    ej = (e * col32).astype(dtype)
    # (rank 0, offset 0) origin row: 0 at lane 0, inf elsewhere
    zero_at_0 = jnp.where(col32 == 0, jnp.int32(0), jnp.int32(inf)).astype(dtype)
    masks = _ge_masks(col32, L)

    def body(r, _):
        sym = symbols_ref[r]

        # p=0 is unconditional: every real rank > 0 has at least one
        # predecessor (stored first), and rank 0's slot-0 row is still
        # all-INF when it executes — the correct neutral either way.
        slot0 = pred_slots_ref[r * P]
        min_pm = m_ring[slot0]
        min_pd = d_ring[slot0]
        for p in range(1, P):
            slot = pred_slots_ref[r * P + p]
            valid = pred_valid_ref[r * P + p]
            rm = m_ring[slot]
            rd = d_ring[slot]
            keep = valid == 1
            min_pm = jnp.minimum(min_pm, jnp.where(keep, rm, inf))
            min_pd = jnp.minimum(min_pd, jnp.where(keep, rd, inf))

        D = jnp.minimum(min_pm + dtype(o + e), min_pd + dtype(e))

        # diagonal: shift pred-M right by one offset lane
        diag_src = _roll_lanes(min_pm, 1)
        diag_src = jnp.where(masks[1], diag_src, dtype(inf))
        match_cost = jnp.where(qshift == sym, jnp.int32(0),
                               jnp.int32(x)).astype(dtype)
        diag = diag_src + match_cost

        A = jnp.minimum(diag, D)
        if free_start:
            # free graph begin: every real rank can start at offset 0
            A = jnp.where(r == end_rank, A, jnp.minimum(A, zero_at_0))
        else:
            # global-alignment origin: (rank 0, offset 0)
            A = jnp.where(r == 0, jnp.minimum(A, zero_at_0), A)

        # affine insertion chain: I[j] = o + e*j + min_{k<j}(A[k] - e*k)
        t = A - ej
        pref = _prefix_min_rows(t, L, dtype(inf), col32, masks)
        pref_m1 = _roll_lanes(pref, 1)
        pref_m1 = jnp.where(masks[1], pref_m1, dtype(inf))
        I = jnp.minimum(pref_m1 + dtype(o) + ej, dtype(inf))

        M = jnp.minimum(A, I)
        # virtual end node: zero-cost same-offset hop
        is_end = r == end_rank
        M = jnp.where(is_end, min_pm, M)
        D_out = jnp.where(is_end, dtype(inf), jnp.minimum(D, dtype(inf)))

        if free_end:
            # free graph end: any real rank's Match row can finish the
            # alignment — keep a running min across real rank rows
            is_real = jnp.logical_and(r > 0, jnp.logical_not(is_end))

            @pl.when(is_real)
            def _():
                best_ref[:] = jnp.minimum(best_ref[:], M)

            @pl.when(is_end)
            def _():
                end_row_ref[:] = jnp.minimum(best_ref[:], min_pm)
        else:
            @pl.when(is_end)
            def _():
                end_row_ref[:] = min_pm

        slot = wslot_ref[r]
        m_ring[slot] = M
        d_ring[slot] = D_out
        return 0

    jax.lax.fori_loop(0, n_nodes, body, 0)


@functools.lru_cache(maxsize=None)
def _pallas_exec(nblocks: int, W: int, P: int, L: int, o: int, e: int, x: int,
                 B_BLK: int = 64, use_int16: bool = False,
                 free_start: bool = False, free_end: bool = False):
    dtype = jnp.int16 if use_int16 else jnp.int32
    kernel = functools.partial(_fill_kernel, W=W, P=P, L=L, o=o, e=e, x=x,
                               B_BLK=B_BLK, dtype=dtype,
                               free_start=free_start, free_end=free_end)

    scratch = [
        pltpu.VMEM((W, B_BLK, L), dtype),
        pltpu.VMEM((W, B_BLK, L), dtype),
    ]
    if free_end:
        scratch.append(pltpu.VMEM((B_BLK, L), dtype))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((B_BLK, L), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (B_BLK, L), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
    )

    call = _pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nblocks * B_BLK, L), dtype),
        grid_spec=grid_spec,
    )

    @jax.jit
    def fn(symbols, pred_slots, pred_valid, wslots, meta, qshift, lengths):
        end_row = call(symbols, pred_slots, pred_valid, wslots, meta, qshift)
        idx = lengths.astype(jnp.int32)[:, None]
        out = jnp.take_along_axis(end_row, idx, axis=1)[:, 0].astype(jnp.int32)
        if use_int16:
            out = jnp.where(out >= INF16, jnp.int32(INF), out)
        return out

    return fn


def _fill_kernel_bounded(
    # scalar prefetch
    symbols_ref,      # (Np,)
    pred_slots_ref,   # (Np*P,)
    pred_valid_ref,   # (Np*P,)
    wslot_ref,        # (Np,)
    end_ok_ref,       # (Np,) int32 0/1 — graph-end bound per rank
    meta_ref,         # (4,)
    # inputs
    qshift_ref,       # (B_BLK, L) VMEM
    # outputs
    end_row_ref,      # (B_BLK, L) VMEM — min M over permitted ranks
    # scratch
    m_ring, d_ring, best_ref,
    *, W: int, P: int, L: int, o: int, e: int, x: int, B_BLK: int, dtype,
    free_start: bool, max_run: int = 0,
):
    """Bounded ends-free fill: like :func:`_fill_kernel` with free_end,
    but the running-min accumulation is gated by the per-rank
    ``end_ok`` mask (Included/Excluded graph_free_end bounds lowered
    host-side; see aligner/wavefront.py ends_free_device_params).  The
    query-end bound is applied outside the kernel as a windowed min over
    the output row."""
    n_nodes = meta_ref[0]
    end_rank = meta_ref[1]
    inf = INF16 if dtype == jnp.int16 else INF

    for w in range(W):
        m_ring[w] = jnp.full((B_BLK, L), inf, dtype=dtype)
        d_ring[w] = jnp.full((B_BLK, L), inf, dtype=dtype)
    best_ref[:] = jnp.full((B_BLK, L), inf, dtype=dtype)

    qshift = qshift_ref[:]
    col32 = jax.lax.broadcasted_iota(jnp.int32, (B_BLK, L), dimension=1)
    ej = (e * col32).astype(dtype)
    zero_at_0 = jnp.where(col32 == 0, jnp.int32(0), jnp.int32(inf)).astype(dtype)
    masks = _ge_masks(col32, L)

    def body(r, _):
        sym = symbols_ref[r]
        slot0 = pred_slots_ref[r * P]
        min_pm = m_ring[slot0]
        min_pd = d_ring[slot0]
        for p in range(1, P):
            slot = pred_slots_ref[r * P + p]
            valid = pred_valid_ref[r * P + p]
            rm = m_ring[slot]
            rd = d_ring[slot]
            keep = valid == 1
            min_pm = jnp.minimum(min_pm, jnp.where(keep, rm, inf))
            min_pd = jnp.minimum(min_pd, jnp.where(keep, rd, inf))

        D = jnp.minimum(min_pm + dtype(o + e), min_pd + dtype(e))
        diag_src = _roll_lanes(min_pm, 1)
        diag_src = jnp.where(masks[1], diag_src, dtype(inf))
        match_cost = jnp.where(qshift == sym, jnp.int32(0),
                               jnp.int32(x)).astype(dtype)
        diag = diag_src + match_cost

        A = jnp.minimum(diag, D)
        if free_start:
            A = jnp.where(r == end_rank, A, jnp.minimum(A, zero_at_0))
        else:
            A = jnp.where(r == 0, jnp.minimum(A, zero_at_0), A)

        t = A - ej
        pref = _prefix_min_rows(t, L, dtype(inf), col32, masks,
                                max_shift=max_run)
        pref_m1 = _roll_lanes(pref, 1)
        pref_m1 = jnp.where(masks[1], pref_m1, dtype(inf))
        I = jnp.minimum(pref_m1 + dtype(o) + ej, dtype(inf))

        M = jnp.minimum(A, I)
        is_end = r == end_rank
        M = jnp.where(is_end, min_pm, M)
        D_out = jnp.where(is_end, dtype(inf), jnp.minimum(D, dtype(inf)))

        permitted = end_ok_ref[r] == 1

        @pl.when(permitted)
        def _():
            best_ref[:] = jnp.minimum(best_ref[:], M)

        @pl.when(is_end)
        def _():
            end_row_ref[:] = best_ref[:]

        slot = wslot_ref[r]
        m_ring[slot] = M
        d_ring[slot] = D_out
        return 0

    jax.lax.fori_loop(0, n_nodes, body, 0)


@functools.lru_cache(maxsize=None)
def _pallas_exec_bounded(nblocks: int, W: int, P: int, L: int, o: int,
                         e: int, x: int, B_BLK: int = 64,
                         use_int16: bool = False, free_start: bool = False,
                         max_run: int = 0):
    dtype = jnp.int16 if use_int16 else jnp.int32
    kernel = functools.partial(_fill_kernel_bounded, W=W, P=P, L=L, o=o,
                               e=e, x=x, B_BLK=B_BLK, dtype=dtype,
                               free_start=free_start,
                               max_run=max_run)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((B_BLK, L), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (B_BLK, L), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((W, B_BLK, L), dtype),
            pltpu.VMEM((W, B_BLK, L), dtype),
            pltpu.VMEM((B_BLK, L), dtype),
        ],
    )

    call = _pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nblocks * B_BLK, L), dtype),
        grid_spec=grid_spec,
    )

    @jax.jit
    def fn(symbols, pred_slots, pred_valid, wslots, end_ok, meta, qshift,
           lengths, jlo):
        end_row = call(symbols, pred_slots, pred_valid, wslots, end_ok,
                       meta, qshift).astype(jnp.int32)
        if use_int16:
            end_row = jnp.where(end_row >= INF16, jnp.int32(INF), end_row)
        L_ = end_row.shape[1]
        col = jnp.arange(L_, dtype=jnp.int32)[None, :]
        li = lengths.astype(jnp.int32)[:, None]
        win = jnp.logical_and(col >= jlo.astype(jnp.int32)[:, None],
                              col <= li)
        return jnp.min(jnp.where(win, end_row, INF), axis=1)

    return fn


def pallas_fill_scores_bounded(dg, qshift, lengths, costs,
                               free_start: bool, end_ok, jlo,
                               max_run: int = 0):
    """(B,) bounded ends-free scores via the Pallas kernel.

    ``end_ok``: (Np,) int32 per-rank graph-end mask; ``jlo``: (B,) lowest
    valid end offset per read (see ends_free_device_params).  Requires B
    to be a multiple of B_BLK.
    """
    _check_prefetch_fits(dg, 1)
    B, L = qshift.shape
    assert B % B_BLK == 0
    dtype = score_dtype(dg.n_nodes_padded, L, costs.gap_open,
                        costs.gap_extend, costs.mismatch)
    use_int16 = dtype == jnp.int16
    blk = pick_b_blk(dg.window, L, L, 2 if use_int16 else 4, n_rings=3)
    blk = min(blk, B) if B % 64 == 0 else blk
    while B % blk:
        blk //= 2
    assert blk >= 32 and B % blk == 0
    P = int(dg.pred_slots.shape[1])
    fn = _pallas_exec_bounded(B // blk, dg.window, P, L,
                              costs.gap_open, costs.gap_extend,
                              costs.mismatch, B_BLK=blk,
                              use_int16=use_int16, free_start=free_start,
                              max_run=max_run)
    return fn(dg.symbols, dg.pred_slots_flat, dg.pred_valid_flat,
              dg.write_slots, end_ok, dg.meta, qshift, lengths, jlo)


def _fill_kernel_bounded_ends(
    # scalar prefetch
    symbols_ref, pred_slots_ref, pred_valid_ref, wslot_ref, end_ok_ref,
    meta_ref,
    # inputs
    qshift_ref,       # (B_BLK, L) VMEM
    # outputs
    end_row_ref,      # (B_BLK, L) — min M over permitted ranks
    rank_row_ref,     # (B_BLK, L) int32 — first rank achieving it
    # scratch
    m_ring, d_ring, best_ref,
    *, W: int, P: int, L: int, o: int, e: int, x: int, B_BLK: int, dtype,
    free_start: bool, max_run: int = 0,
):
    """:func:`_fill_kernel_bounded` + per-(read, offset) best-end-rank
    tracking (the anchor for the native corridor backtrace)."""
    n_nodes = meta_ref[0]
    end_rank = meta_ref[1]
    inf = INF16 if dtype == jnp.int16 else INF

    for w in range(W):
        m_ring[w] = jnp.full((B_BLK, L), inf, dtype=dtype)
        d_ring[w] = jnp.full((B_BLK, L), inf, dtype=dtype)
    best_ref[:] = jnp.full((B_BLK, L), inf, dtype=dtype)
    rank_row_ref[:] = jnp.zeros((B_BLK, L), jnp.int32)

    qshift = qshift_ref[:]
    col32 = jax.lax.broadcasted_iota(jnp.int32, (B_BLK, L), dimension=1)
    ej = (e * col32).astype(dtype)
    zero_at_0 = jnp.where(col32 == 0, jnp.int32(0),
                          jnp.int32(inf)).astype(dtype)
    masks = _ge_masks(col32, L)

    def body(r, _):
        sym = symbols_ref[r]
        slot0 = pred_slots_ref[r * P]
        min_pm = m_ring[slot0]
        min_pd = d_ring[slot0]
        for p in range(1, P):
            slot = pred_slots_ref[r * P + p]
            valid = pred_valid_ref[r * P + p]
            rm = m_ring[slot]
            rd = d_ring[slot]
            keep = valid == 1
            min_pm = jnp.minimum(min_pm, jnp.where(keep, rm, inf))
            min_pd = jnp.minimum(min_pd, jnp.where(keep, rd, inf))

        D = jnp.minimum(min_pm + dtype(o + e), min_pd + dtype(e))
        diag_src = _roll_lanes(min_pm, 1)
        diag_src = jnp.where(masks[1], diag_src, dtype(inf))
        match_cost = jnp.where(qshift == sym, jnp.int32(0),
                               jnp.int32(x)).astype(dtype)
        diag = diag_src + match_cost

        A = jnp.minimum(diag, D)
        if free_start:
            A = jnp.where(r == end_rank, A, jnp.minimum(A, zero_at_0))
        else:
            A = jnp.where(r == 0, jnp.minimum(A, zero_at_0), A)

        t = A - ej
        pref = _prefix_min_rows(t, L, dtype(inf), col32, masks,
                                max_shift=max_run)
        pref_m1 = _roll_lanes(pref, 1)
        pref_m1 = jnp.where(masks[1], pref_m1, dtype(inf))
        I = jnp.minimum(pref_m1 + dtype(o) + ej, dtype(inf))

        M = jnp.minimum(A, I)
        is_end = r == end_rank
        M = jnp.where(is_end, min_pm, M)
        D_out = jnp.where(is_end, dtype(inf), jnp.minimum(D, dtype(inf)))

        @pl.when(end_ok_ref[r] == 1)
        def _():
            improved = M < best_ref[:]
            best_ref[:] = jnp.where(improved, M, best_ref[:])
            rank_row_ref[:] = jnp.where(improved, r, rank_row_ref[:])

        @pl.when(is_end)
        def _():
            end_row_ref[:] = best_ref[:]

        slot = wslot_ref[r]
        m_ring[slot] = M
        d_ring[slot] = D_out
        return 0

    jax.lax.fori_loop(0, n_nodes, body, 0)


@functools.lru_cache(maxsize=None)
def _pallas_exec_bounded_ends(nblocks: int, W: int, P: int, L: int, o: int,
                              e: int, x: int, B_BLK: int = 64,
                              use_int16: bool = False,
                              free_start: bool = False, max_run: int = 0):
    dtype = jnp.int16 if use_int16 else jnp.int32
    kernel = functools.partial(_fill_kernel_bounded_ends, W=W, P=P, L=L,
                               o=o, e=e, x=x, B_BLK=B_BLK, dtype=dtype,
                               free_start=free_start,
                               max_run=max_run)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((B_BLK, L), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((B_BLK, L), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_BLK, L), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, B_BLK, L), dtype),
            pltpu.VMEM((W, B_BLK, L), dtype),
            pltpu.VMEM((B_BLK, L), dtype),
        ],
    )
    call = _pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nblocks * B_BLK, L), dtype),
            jax.ShapeDtypeStruct((nblocks * B_BLK, L), jnp.int32),
        ),
        grid_spec=grid_spec,
    )

    @jax.jit
    def fn(symbols, pred_slots, pred_valid, wslots, end_ok, meta, qshift,
           lengths, jlo):
        end_row, rank_row = call(symbols, pred_slots, pred_valid, wslots,
                                 end_ok, meta, qshift)
        end_row = end_row.astype(jnp.int32)
        if use_int16:
            end_row = jnp.where(end_row >= INF16, jnp.int32(INF), end_row)
        col = jnp.arange(end_row.shape[1], dtype=jnp.int32)[None, :]
        li = lengths.astype(jnp.int32)[:, None]
        win = jnp.logical_and(col >= jlo.astype(jnp.int32)[:, None],
                              col <= li)
        masked = jnp.where(win, end_row, INF)
        score = jnp.min(masked, axis=1)
        # ties resolve to the LARGEST offset, then the lowest rank —
        # the dense backtrace's convention (wavefront.py with-ends body)
        Lw = masked.shape[1]
        end_j = (Lw - 1 - jnp.argmin(masked[:, ::-1], axis=1)).astype(
            jnp.int32)
        end_r = jnp.take_along_axis(rank_row, end_j[:, None], axis=1)[:, 0]
        return score, end_r, end_j

    return fn


def pallas_bounded_with_ends(dg, qshift, lengths, costs, free_start,
                             end_ok, jlo, max_run: int = 0):
    """(scores, end_ranks, end_offsets) via the Pallas bounded kernel."""
    _check_prefetch_fits(dg, 1)
    B, L = qshift.shape
    assert B % B_BLK == 0
    dtype = score_dtype(dg.n_nodes_padded, L, costs.gap_open,
                        costs.gap_extend, costs.mismatch)
    use_int16 = dtype == jnp.int16
    # rings + io + best + rank row
    blk = pick_b_blk(dg.window, L, L, 2 if use_int16 else 4, n_rings=4)
    while B % blk:
        blk //= 2
    P = int(dg.pred_slots.shape[1])
    fn = _pallas_exec_bounded_ends(B // blk, dg.window, P, L,
                                   costs.gap_open, costs.gap_extend,
                                   costs.mismatch, B_BLK=blk,
                                   use_int16=use_int16,
                                   free_start=free_start, max_run=max_run)
    return fn(dg.symbols, dg.pred_slots_flat, dg.pred_valid_flat,
              dg.write_slots, end_ok, dg.meta, qshift, lengths, jlo)


BIG_CHUNK = 1024  # ranks per SMEM chunk; chunk slices must be 1024-aligned


def _fill_kernel_bounded_big(
    # scalar prefetch
    meta_ref,         # (4,): [n_real_ranks, end_rank, R(record words), _]
    # inputs
    tab_hbm,          # (Np*R,) int32 in HBM: per-rank interleaved records
    qshift_ref,       # (B_BLK, L) VMEM
    # outputs
    end_row_ref,      # (B_BLK, L) VMEM
    # scratch
    m_ring, d_ring, best_ref, tab_s, sems,
    *, W: int, P: int, L: int, o: int, e: int, x: int, B_BLK: int, dtype,
    free_start: bool, max_run: int = 0,
):
    """Bounded ends-free fill for graphs past the scalar-prefetch SMEM
    budget: per-rank records [sym, wslot, end_ok, pred_slot*P,
    pred_valid*P] stream from HBM into a double-buffered SMEM scratch,
    BIG_CHUNK ranks per DMA (slices must be 1024-aligned), overlapping
    the next chunk's transfer with the current chunk's fill.  Covers the
    global full fill too (end_ok = end rank only, jlo = n)."""
    n_nodes = meta_ref[0]
    end_rank = meta_ref[1]
    R = meta_ref[2]
    inf = INF16 if dtype == jnp.int16 else INF
    C = BIG_CHUNK
    CW = C * (3 + 2 * P)  # words per chunk (R is static via P)

    for w in range(W):
        m_ring[w] = jnp.full((B_BLK, L), inf, dtype=dtype)
        d_ring[w] = jnp.full((B_BLK, L), inf, dtype=dtype)
    best_ref[:] = jnp.full((B_BLK, L), inf, dtype=dtype)

    qshift = qshift_ref[:]
    col32 = jax.lax.broadcasted_iota(jnp.int32, (B_BLK, L), dimension=1)
    ej = (e * col32).astype(dtype)
    zero_at_0 = jnp.where(col32 == 0, jnp.int32(0),
                          jnp.int32(inf)).astype(dtype)
    masks = _ge_masks(col32, L)

    n_chunks = (n_nodes + C - 1) // C

    def dma(k, buf):
        return pltpu.make_async_copy(
            tab_hbm.at[pl.ds(k * CW, CW)],
            tab_s.at[pl.ds(buf * CW, CW)],
            sems.at[buf])

    dma(0, 0).start()

    def chunk_body(k, _):
        buf = jax.lax.rem(k, 2)
        dma(k, buf).wait()

        @pl.when(k + 1 < n_chunks)
        def _():
            dma(k + 1, jax.lax.rem(k + 1, 2)).start()

        base0 = buf * CW

        def body(i, _):
            r = k * C + i
            rec = base0 + i * R
            sym = tab_s[rec]
            wslot = tab_s[rec + 1]
            endok = tab_s[rec + 2]

            slot0 = tab_s[rec + 3]
            min_pm = m_ring[slot0]
            min_pd = d_ring[slot0]
            for p in range(1, P):
                slot = tab_s[rec + 3 + p]
                valid = tab_s[rec + 3 + P + p]
                rm = m_ring[slot]
                rd = d_ring[slot]
                keep = valid == 1
                min_pm = jnp.minimum(min_pm, jnp.where(keep, rm, inf))
                min_pd = jnp.minimum(min_pd, jnp.where(keep, rd, inf))

            D = jnp.minimum(min_pm + dtype(o + e), min_pd + dtype(e))
            diag_src = _roll_lanes(min_pm, 1)
            diag_src = jnp.where(masks[1], diag_src, dtype(inf))
            match_cost = jnp.where(qshift == sym, jnp.int32(0),
                                   jnp.int32(x)).astype(dtype)
            diag = diag_src + match_cost

            A = jnp.minimum(diag, D)
            if free_start:
                A = jnp.where(r == end_rank, A, jnp.minimum(A, zero_at_0))
            else:
                A = jnp.where(r == 0, jnp.minimum(A, zero_at_0), A)

            t = A - ej
            pref = _prefix_min_rows(t, L, dtype(inf), col32, masks,
                                max_shift=max_run)
            pref_m1 = _roll_lanes(pref, 1)
            pref_m1 = jnp.where(masks[1], pref_m1, dtype(inf))
            I = jnp.minimum(pref_m1 + dtype(o) + ej, dtype(inf))

            M = jnp.minimum(A, I)
            is_end = r == end_rank
            M = jnp.where(is_end, min_pm, M)
            D_out = jnp.where(is_end, dtype(inf),
                              jnp.minimum(D, dtype(inf)))

            @pl.when(endok == 1)
            def _():
                best_ref[:] = jnp.minimum(best_ref[:], M)

            @pl.when(is_end)
            def _():
                end_row_ref[:] = best_ref[:]

            m_ring[wslot] = M
            d_ring[wslot] = D_out
            return 0

        n_here = jnp.minimum(C, n_nodes - k * C)
        jax.lax.fori_loop(0, n_here, body, 0)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


@functools.lru_cache(maxsize=None)
def _pallas_exec_bounded_big(nblocks: int, W: int, P: int, L: int, o: int,
                             e: int, x: int, B_BLK: int = 64,
                             use_int16: bool = False,
                             free_start: bool = False, max_run: int = 0):
    dtype = jnp.int16 if use_int16 else jnp.int32
    kernel = functools.partial(_fill_kernel_bounded_big, W=W, P=P, L=L, o=o,
                               e=e, x=x, B_BLK=B_BLK, dtype=dtype,
                               free_start=free_start,
                               max_run=max_run)
    R = 3 + 2 * P
    CW = BIG_CHUNK * R

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # rank table stays in HBM
            pl.BlockSpec((B_BLK, L), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (B_BLK, L), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((W, B_BLK, L), dtype),
            pltpu.VMEM((W, B_BLK, L), dtype),
            pltpu.VMEM((B_BLK, L), dtype),
            pltpu.SMEM((2 * CW,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    call = _pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nblocks * B_BLK, L), dtype),
        grid_spec=grid_spec,
    )

    @jax.jit
    def fn(tab, meta, qshift, lengths, jlo):
        end_row = call(meta, tab, qshift).astype(jnp.int32)
        if use_int16:
            end_row = jnp.where(end_row >= INF16, jnp.int32(INF), end_row)
        col = jnp.arange(end_row.shape[1], dtype=jnp.int32)[None, :]
        li = lengths.astype(jnp.int32)[:, None]
        win = jnp.logical_and(col >= jlo.astype(jnp.int32)[:, None],
                              col <= li)
        return jnp.min(jnp.where(win, end_row, INF), axis=1)

    return fn


# (dg id -> (dg ref, tab, meta)) interleaved rank tables for the big
# kernel; the dg reference pins the id against recycling, LRU-bounded
_BIG_TABLES: dict = {}


def _big_rank_table(dg, end_ok):
    import numpy as np

    key = (id(dg), id(end_ok))
    ent = _BIG_TABLES.get(key)
    if ent is not None and ent[0] is dg and ent[1] is end_ok:
        return ent[2], ent[3]
    P = int(dg.pred_slots.shape[1])
    R = 3 + 2 * P
    Np = dg.n_nodes_padded
    Np_pad = ((Np + BIG_CHUNK - 1) // BIG_CHUNK) * BIG_CHUNK
    tab = np.zeros((Np_pad, R), dtype=np.int32)
    n = dg.n_nodes
    tab[:Np, 0] = np.asarray(dg.symbols)
    tab[:Np, 1] = np.asarray(dg.write_slots)
    tab[:Np, 2] = np.asarray(end_ok)[:Np]
    tab[:Np, 3:3 + P] = np.asarray(dg.pred_slots)
    tab[:Np, 3 + P:3 + 2 * P] = np.asarray(dg.pred_valid).astype(np.int32)
    tab_dev = jnp.asarray(tab.reshape(-1))
    meta = jnp.asarray([n, n - 1, R, 0], dtype=jnp.int32)
    ent = (dg, end_ok, tab_dev, meta)
    _BIG_TABLES[key] = ent
    while len(_BIG_TABLES) > 8:
        _BIG_TABLES.pop(next(iter(_BIG_TABLES)))
    return tab_dev, meta


def pallas_fill_scores_bounded_big(dg, qshift, lengths, costs,
                                   free_start: bool, end_ok, jlo,
                                   max_run: int = 0):
    """Bounded ends-free scores for graphs past the scalar-prefetch SMEM
    budget: rank tables stream HBM->SMEM in double-buffered chunks."""
    B, L = qshift.shape
    assert B % B_BLK == 0
    P = int(dg.pred_slots.shape[1])
    dtype = score_dtype(dg.n_nodes_padded, L, costs.gap_open,
                        costs.gap_extend, costs.mismatch)
    use_int16 = dtype == jnp.int16
    blk = pick_b_blk(dg.window, L, L, 2 if use_int16 else 4, n_rings=3)
    while B % blk:
        blk //= 2
    tab, meta = _big_rank_table(dg, end_ok)
    fn = _pallas_exec_bounded_big(B // blk, dg.window, P, L,
                                  costs.gap_open, costs.gap_extend,
                                  costs.mismatch, B_BLK=blk,
                                  use_int16=use_int16,
                                  free_start=free_start, max_run=max_run)
    return fn(tab, meta, qshift, lengths, jlo)


def _fill_kernel_bounded_big_ends(
    meta_ref,
    tab_hbm, qshift_ref,
    end_row_ref, rank_row_ref,
    m_ring, d_ring, best_ref, tab_s, sems,
    *, W: int, P: int, L: int, o: int, e: int, x: int, B_BLK: int, dtype,
    free_start: bool, max_run: int = 0,
):
    """:func:`_fill_kernel_bounded_big` + best-end-rank tracking."""
    n_nodes = meta_ref[0]
    end_rank = meta_ref[1]
    R = 3 + 2 * P
    inf = INF16 if dtype == jnp.int16 else INF
    C = BIG_CHUNK
    CW = C * R

    for w in range(W):
        m_ring[w] = jnp.full((B_BLK, L), inf, dtype=dtype)
        d_ring[w] = jnp.full((B_BLK, L), inf, dtype=dtype)
    best_ref[:] = jnp.full((B_BLK, L), inf, dtype=dtype)
    rank_row_ref[:] = jnp.zeros((B_BLK, L), jnp.int32)

    qshift = qshift_ref[:]
    col32 = jax.lax.broadcasted_iota(jnp.int32, (B_BLK, L), dimension=1)
    ej = (e * col32).astype(dtype)
    zero_at_0 = jnp.where(col32 == 0, jnp.int32(0),
                          jnp.int32(inf)).astype(dtype)
    masks = _ge_masks(col32, L)

    n_chunks = (n_nodes + C - 1) // C

    def dma(k, buf):
        return pltpu.make_async_copy(
            tab_hbm.at[pl.ds(k * CW, CW)],
            tab_s.at[pl.ds(buf * CW, CW)],
            sems.at[buf])

    dma(0, 0).start()

    def chunk_body(k, _):
        buf = jax.lax.rem(k, 2)
        dma(k, buf).wait()

        @pl.when(k + 1 < n_chunks)
        def _():
            dma(k + 1, jax.lax.rem(k + 1, 2)).start()

        base0 = buf * CW

        def body(i, _):
            r = k * C + i
            rec = base0 + i * R
            sym = tab_s[rec]
            wslot = tab_s[rec + 1]
            endok = tab_s[rec + 2]

            slot0 = tab_s[rec + 3]
            min_pm = m_ring[slot0]
            min_pd = d_ring[slot0]
            for p in range(1, P):
                slot = tab_s[rec + 3 + p]
                valid = tab_s[rec + 3 + P + p]
                rm = m_ring[slot]
                rd = d_ring[slot]
                keep = valid == 1
                min_pm = jnp.minimum(min_pm, jnp.where(keep, rm, inf))
                min_pd = jnp.minimum(min_pd, jnp.where(keep, rd, inf))

            D = jnp.minimum(min_pm + dtype(o + e), min_pd + dtype(e))
            diag_src = _roll_lanes(min_pm, 1)
            diag_src = jnp.where(masks[1], diag_src, dtype(inf))
            match_cost = jnp.where(qshift == sym, jnp.int32(0),
                                   jnp.int32(x)).astype(dtype)
            diag = diag_src + match_cost

            A = jnp.minimum(diag, D)
            if free_start:
                A = jnp.where(r == end_rank, A, jnp.minimum(A, zero_at_0))
            else:
                A = jnp.where(r == 0, jnp.minimum(A, zero_at_0), A)

            t = A - ej
            pref = _prefix_min_rows(t, L, dtype(inf), col32, masks,
                                max_shift=max_run)
            pref_m1 = _roll_lanes(pref, 1)
            pref_m1 = jnp.where(masks[1], pref_m1, dtype(inf))
            I = jnp.minimum(pref_m1 + dtype(o) + ej, dtype(inf))

            M = jnp.minimum(A, I)
            is_end = r == end_rank
            M = jnp.where(is_end, min_pm, M)
            D_out = jnp.where(is_end, dtype(inf),
                              jnp.minimum(D, dtype(inf)))

            @pl.when(endok == 1)
            def _():
                improved = M < best_ref[:]
                best_ref[:] = jnp.where(improved, M, best_ref[:])
                rank_row_ref[:] = jnp.where(improved, r, rank_row_ref[:])

            @pl.when(is_end)
            def _():
                end_row_ref[:] = best_ref[:]

            m_ring[wslot] = M
            d_ring[wslot] = D_out
            return 0

        n_here = jnp.minimum(C, n_nodes - k * C)
        jax.lax.fori_loop(0, n_here, body, 0)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


@functools.lru_cache(maxsize=None)
def _pallas_exec_bounded_big_ends(nblocks: int, W: int, P: int, L: int,
                                  o: int, e: int, x: int, B_BLK: int = 64,
                                  use_int16: bool = False,
                                  free_start: bool = False, max_run: int = 0):
    dtype = jnp.int16 if use_int16 else jnp.int32
    kernel = functools.partial(_fill_kernel_bounded_big_ends, W=W, P=P,
                               L=L, o=o, e=e, x=x, B_BLK=B_BLK,
                               dtype=dtype, free_start=free_start,
                               max_run=max_run)
    R = 3 + 2 * P
    CW = BIG_CHUNK * R
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((B_BLK, L), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B_BLK, L), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_BLK, L), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, B_BLK, L), dtype),
            pltpu.VMEM((W, B_BLK, L), dtype),
            pltpu.VMEM((B_BLK, L), dtype),
            pltpu.SMEM((2 * CW,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    call = _pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nblocks * B_BLK, L), dtype),
            jax.ShapeDtypeStruct((nblocks * B_BLK, L), jnp.int32),
        ),
        grid_spec=grid_spec,
    )

    @jax.jit
    def fn(tab, meta, qshift, lengths, jlo):
        end_row, rank_row = call(meta, tab, qshift)
        end_row = end_row.astype(jnp.int32)
        if use_int16:
            end_row = jnp.where(end_row >= INF16, jnp.int32(INF), end_row)
        col = jnp.arange(end_row.shape[1], dtype=jnp.int32)[None, :]
        li = lengths.astype(jnp.int32)[:, None]
        win = jnp.logical_and(col >= jlo.astype(jnp.int32)[:, None],
                              col <= li)
        masked = jnp.where(win, end_row, INF)
        score = jnp.min(masked, axis=1)
        # ties: LARGEST offset, then lowest rank (dense-backtrace parity)
        Lw = masked.shape[1]
        end_j = (Lw - 1 - jnp.argmin(masked[:, ::-1], axis=1)).astype(
            jnp.int32)
        end_r = jnp.take_along_axis(rank_row, end_j[:, None], axis=1)[:, 0]
        return score, end_r, end_j

    return fn


def pallas_bounded_with_ends_big(dg, qshift, lengths, costs, free_start,
                                 end_ok, jlo, max_run: int = 0):
    """(scores, end_ranks, end_offsets) via the big-graph kernel."""
    B, L = qshift.shape
    assert B % B_BLK == 0
    P = int(dg.pred_slots.shape[1])
    dtype = score_dtype(dg.n_nodes_padded, L, costs.gap_open,
                        costs.gap_extend, costs.mismatch)
    use_int16 = dtype == jnp.int16
    blk = pick_b_blk(dg.window, L, L, 2 if use_int16 else 4, n_rings=4)
    while B % blk:
        blk //= 2
    tab, meta = _big_rank_table(dg, end_ok)
    fn = _pallas_exec_bounded_big_ends(B // blk, dg.window, P, L,
                                       costs.gap_open, costs.gap_extend,
                                       costs.mismatch, B_BLK=blk,
                                       use_int16=use_int16,
                                       free_start=free_start,
                                       max_run=max_run)
    return fn(tab, meta, qshift, lengths, jlo)


def _coupled_insertion_rows(A, L: int, inf, masks, o1: int, e1: int, e2: int,
                            dtype, max_shift: int = 0):
    """(I1, I2) rows for the two-piece model, in-kernel.

    The coupled recurrence (``ops/dp_rows_2p.py`` docstring)

        I1[j] = min(A[j-1]+o1+e1, I1[j-1]+e1, I2[j-1]+o1+e1)
        I2[j] = min(I1[j-1], I2[j-1]) + e2

    is a linear min-plus system over 2-vectors; evaluate its prefix
    composition with a Hillis–Steele doubling scan over affine min-plus
    maps (T: 2x2, b: 2), lane-shifted with pltpu.roll.  Out-of-range
    shifts compose with the identity map (T=[[0,inf],[inf,0]], b=inf).
    Every entry is re-clamped to inf each round so int32 never overflows
    (inf = 2^28; one compose can reach 2^29).
    """
    zero = dtype(0)
    infv = dtype(inf)
    m1 = masks[1]
    # lane j >= 1 carries the step map; lane 0 the all-inf map
    t11 = jnp.where(m1, dtype(e1), infv)
    t12 = jnp.where(m1, dtype(o1 + e1), infv)
    t21 = jnp.where(m1, dtype(e2), infv)
    t22 = jnp.where(m1, dtype(e2), infv)
    b1 = jnp.minimum(_roll_lanes(A, 1) + dtype(o1 + e1), infv)
    b1 = jnp.where(m1, b1, infv)
    b2 = jnp.full_like(A, infv)

    k = 1
    cap = min(L, max_shift) if max_shift else L
    while k < cap:
        mk = masks[k]
        s11 = jnp.where(mk, _roll_lanes(t11, k), zero)
        s12 = jnp.where(mk, _roll_lanes(t12, k), infv)
        s21 = jnp.where(mk, _roll_lanes(t21, k), infv)
        s22 = jnp.where(mk, _roll_lanes(t22, k), zero)
        c1 = jnp.where(mk, _roll_lanes(b1, k), infv)
        c2 = jnp.where(mk, _roll_lanes(b2, k), infv)
        # F_j <- F_j ∘ F_{j-k}: T' = T (x) S (min-plus), b' = min(T (x) c, b)
        n11 = jnp.minimum(jnp.minimum(t11 + s11, t12 + s21), infv)
        n12 = jnp.minimum(jnp.minimum(t11 + s12, t12 + s22), infv)
        n21 = jnp.minimum(jnp.minimum(t21 + s11, t22 + s21), infv)
        n22 = jnp.minimum(jnp.minimum(t21 + s12, t22 + s22), infv)
        b1 = jnp.minimum(jnp.minimum(t11 + c1, t12 + c2), b1)
        b2 = jnp.minimum(jnp.minimum(t21 + c1, t22 + c2), b2)
        b1 = jnp.minimum(b1, infv)
        b2 = jnp.minimum(b2, infv)
        t11, t12, t21, t22 = n11, n12, n21, n22
        k <<= 1
    return b1, b2


def _fill_kernel_bounded_2p(
    # scalar prefetch
    symbols_ref, pred_slots_ref, pred_valid_ref, wslot_ref, end_ok_ref,
    meta_ref,
    # inputs
    qshift_ref,
    # outputs
    end_row_ref,
    # scratch
    m_ring, d1_ring, d2_ring, best_ref,
    *, W: int, P: int, L: int, o1: int, e1: int, e2: int, x: int,
    B_BLK: int, dtype, free_start: bool, max_run: int = 0,
):
    """Two-piece bounded ends-free fill: :func:`_fill_kernel_2p` with the
    running-min best row gated by the per-rank ``end_ok`` mask; the
    query-end bound applies outside as a windowed min."""
    n_nodes = meta_ref[0]
    end_rank = meta_ref[1]
    inf = INF16 if dtype == jnp.int16 else INF

    for w in range(W):
        m_ring[w] = jnp.full((B_BLK, L), inf, dtype=dtype)
        d1_ring[w] = jnp.full((B_BLK, L), inf, dtype=dtype)
        d2_ring[w] = jnp.full((B_BLK, L), inf, dtype=dtype)
    best_ref[:] = jnp.full((B_BLK, L), inf, dtype=dtype)

    qshift = qshift_ref[:]
    col32 = jax.lax.broadcasted_iota(jnp.int32, (B_BLK, L), dimension=1)
    zero_at_0 = jnp.where(col32 == 0, jnp.int32(0),
                          jnp.int32(inf)).astype(dtype)
    masks = _ge_masks(col32, L)

    def body(r, _):
        sym = symbols_ref[r]
        slot0 = pred_slots_ref[r * P]
        min_pm = m_ring[slot0]
        min_pd1 = d1_ring[slot0]
        min_pd2 = d2_ring[slot0]
        for p in range(1, P):
            slot = pred_slots_ref[r * P + p]
            valid = pred_valid_ref[r * P + p]
            keep = valid == 1
            min_pm = jnp.minimum(min_pm, jnp.where(keep, m_ring[slot], inf))
            min_pd1 = jnp.minimum(min_pd1,
                                  jnp.where(keep, d1_ring[slot], inf))
            min_pd2 = jnp.minimum(min_pd2,
                                  jnp.where(keep, d2_ring[slot], inf))

        D1 = jnp.minimum(jnp.minimum(min_pm + dtype(o1 + e1),
                                     min_pd1 + dtype(e1)), dtype(inf))
        D2 = jnp.minimum(jnp.minimum(min_pd1, min_pd2) + dtype(e2),
                         dtype(inf))

        diag_src = _roll_lanes(min_pm, 1)
        diag_src = jnp.where(masks[1], diag_src, dtype(inf))
        match_cost = jnp.where(qshift == sym, jnp.int32(0),
                               jnp.int32(x)).astype(dtype)
        diag = diag_src + match_cost

        A = jnp.minimum(diag, jnp.minimum(D1, D2))
        if free_start:
            A = jnp.where(r == end_rank, A, jnp.minimum(A, zero_at_0))
        else:
            A = jnp.where(r == 0, jnp.minimum(A, zero_at_0), A)

        I1, I2 = _coupled_insertion_rows(A, L, inf, masks, o1, e1, e2,
                                         dtype, max_shift=max_run)
        M = jnp.minimum(A, jnp.minimum(I1, I2))

        is_end = r == end_rank
        M = jnp.where(is_end, min_pm, M)
        D1_out = jnp.where(is_end, dtype(inf), D1)
        D2_out = jnp.where(is_end, dtype(inf), D2)

        @pl.when(end_ok_ref[r] == 1)
        def _():
            best_ref[:] = jnp.minimum(best_ref[:], M)

        @pl.when(is_end)
        def _():
            end_row_ref[:] = best_ref[:]

        slot = wslot_ref[r]
        m_ring[slot] = M
        d1_ring[slot] = D1_out
        d2_ring[slot] = D2_out
        return 0

    jax.lax.fori_loop(0, n_nodes, body, 0)


@functools.lru_cache(maxsize=None)
def _pallas_exec_bounded_2p(nblocks: int, W: int, P: int, L: int, o1: int,
                            e1: int, e2: int, x: int, B_BLK: int = 64,
                            free_start: bool = False, max_run: int = 0):
    dtype = jnp.int32
    kernel = functools.partial(_fill_kernel_bounded_2p, W=W, P=P, L=L,
                               o1=o1, e1=e1, e2=e2, x=x, B_BLK=B_BLK,
                               dtype=dtype, free_start=free_start,
                               max_run=max_run)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((B_BLK, L), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (B_BLK, L), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((W, B_BLK, L), dtype),
            pltpu.VMEM((W, B_BLK, L), dtype),
            pltpu.VMEM((W, B_BLK, L), dtype),
            pltpu.VMEM((B_BLK, L), dtype),
        ],
    )
    call = _pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nblocks * B_BLK, L), dtype),
        grid_spec=grid_spec,
    )

    @jax.jit
    def fn(symbols, pred_slots, pred_valid, wslots, end_ok, meta, qshift,
           lengths, jlo):
        end_row = call(symbols, pred_slots, pred_valid, wslots, end_ok,
                       meta, qshift)
        col = jnp.arange(end_row.shape[1], dtype=jnp.int32)[None, :]
        li = lengths.astype(jnp.int32)[:, None]
        win = jnp.logical_and(col >= jlo.astype(jnp.int32)[:, None],
                              col <= li)
        return jnp.min(jnp.where(win, end_row, INF), axis=1)

    return fn


def pallas_fill_scores_bounded_2p(dg, qshift, lengths, costs,
                                  free_start: bool, end_ok, jlo,
                                  max_run: int = 0):
    """Two-piece bounded ends-free scores via the Pallas kernel."""
    _check_prefetch_fits(dg, 1)
    B, L = qshift.shape
    assert B % B_BLK == 0
    blk = pick_b_blk(dg.window, L, L, 4, n_rings=4)
    while B % blk:
        blk //= 2
    P = int(dg.pred_slots.shape[1])
    fn = _pallas_exec_bounded_2p(B // blk, dg.window, P, L,
                                 costs.gap_open, costs.gap_extend,
                                 costs.gap_extend2, costs.mismatch,
                                 B_BLK=blk, free_start=free_start,
                                 max_run=max_run)
    return fn(dg.symbols, dg.pred_slots_flat, dg.pred_valid_flat,
              dg.write_slots, end_ok, dg.meta, qshift, lengths, jlo)


def _fill_kernel_bounded_2p_ends(
    # scalar prefetch
    symbols_ref, pred_slots_ref, pred_valid_ref, wslot_ref, end_ok_ref,
    meta_ref,
    # inputs
    qshift_ref,
    # outputs
    end_row_ref, rank_row_ref,
    # scratch
    m_ring, d1_ring, d2_ring, best_ref,
    *, W: int, P: int, L: int, o1: int, e1: int, e2: int, x: int,
    B_BLK: int, dtype, free_start: bool, max_run: int = 0,
):
    """:func:`_fill_kernel_bounded_2p` + per-(read, offset) best-end-rank
    tracking (the anchor for the 2p native corridor backtrace,
    ``native/engine.cpp poasta_align_anchored``)."""
    n_nodes = meta_ref[0]
    end_rank = meta_ref[1]
    inf = INF16 if dtype == jnp.int16 else INF

    for w in range(W):
        m_ring[w] = jnp.full((B_BLK, L), inf, dtype=dtype)
        d1_ring[w] = jnp.full((B_BLK, L), inf, dtype=dtype)
        d2_ring[w] = jnp.full((B_BLK, L), inf, dtype=dtype)
    best_ref[:] = jnp.full((B_BLK, L), inf, dtype=dtype)
    rank_row_ref[:] = jnp.zeros((B_BLK, L), jnp.int32)

    qshift = qshift_ref[:]
    col32 = jax.lax.broadcasted_iota(jnp.int32, (B_BLK, L), dimension=1)
    zero_at_0 = jnp.where(col32 == 0, jnp.int32(0),
                          jnp.int32(inf)).astype(dtype)
    masks = _ge_masks(col32, L)

    def body(r, _):
        sym = symbols_ref[r]
        slot0 = pred_slots_ref[r * P]
        min_pm = m_ring[slot0]
        min_pd1 = d1_ring[slot0]
        min_pd2 = d2_ring[slot0]
        for p in range(1, P):
            slot = pred_slots_ref[r * P + p]
            valid = pred_valid_ref[r * P + p]
            keep = valid == 1
            min_pm = jnp.minimum(min_pm, jnp.where(keep, m_ring[slot], inf))
            min_pd1 = jnp.minimum(min_pd1,
                                  jnp.where(keep, d1_ring[slot], inf))
            min_pd2 = jnp.minimum(min_pd2,
                                  jnp.where(keep, d2_ring[slot], inf))

        D1 = jnp.minimum(jnp.minimum(min_pm + dtype(o1 + e1),
                                     min_pd1 + dtype(e1)), dtype(inf))
        D2 = jnp.minimum(jnp.minimum(min_pd1, min_pd2) + dtype(e2),
                         dtype(inf))

        diag_src = _roll_lanes(min_pm, 1)
        diag_src = jnp.where(masks[1], diag_src, dtype(inf))
        match_cost = jnp.where(qshift == sym, jnp.int32(0),
                               jnp.int32(x)).astype(dtype)
        diag = diag_src + match_cost

        A = jnp.minimum(diag, jnp.minimum(D1, D2))
        if free_start:
            A = jnp.where(r == end_rank, A, jnp.minimum(A, zero_at_0))
        else:
            A = jnp.where(r == 0, jnp.minimum(A, zero_at_0), A)

        I1, I2 = _coupled_insertion_rows(A, L, inf, masks, o1, e1, e2,
                                         dtype, max_shift=max_run)
        M = jnp.minimum(A, jnp.minimum(I1, I2))

        is_end = r == end_rank
        M = jnp.where(is_end, min_pm, M)
        D1_out = jnp.where(is_end, dtype(inf), D1)
        D2_out = jnp.where(is_end, dtype(inf), D2)

        @pl.when(end_ok_ref[r] == 1)
        def _():
            improved = M < best_ref[:]
            best_ref[:] = jnp.where(improved, M, best_ref[:])
            rank_row_ref[:] = jnp.where(improved, r, rank_row_ref[:])

        @pl.when(is_end)
        def _():
            end_row_ref[:] = best_ref[:]

        slot = wslot_ref[r]
        m_ring[slot] = M
        d1_ring[slot] = D1_out
        d2_ring[slot] = D2_out
        return 0

    jax.lax.fori_loop(0, n_nodes, body, 0)


@functools.lru_cache(maxsize=None)
def _pallas_exec_bounded_2p_ends(nblocks: int, W: int, P: int, L: int,
                                 o1: int, e1: int, e2: int, x: int,
                                 B_BLK: int = 64, free_start: bool = False,
                                 max_run: int = 0):
    dtype = jnp.int32
    kernel = functools.partial(_fill_kernel_bounded_2p_ends, W=W, P=P, L=L,
                               o1=o1, e1=e1, e2=e2, x=x, B_BLK=B_BLK,
                               dtype=dtype, free_start=free_start,
                               max_run=max_run)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((B_BLK, L), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((B_BLK, L), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_BLK, L), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, B_BLK, L), dtype),
            pltpu.VMEM((W, B_BLK, L), dtype),
            pltpu.VMEM((W, B_BLK, L), dtype),
            pltpu.VMEM((B_BLK, L), dtype),
        ],
    )
    call = _pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nblocks * B_BLK, L), dtype),
            jax.ShapeDtypeStruct((nblocks * B_BLK, L), jnp.int32),
        ),
        grid_spec=grid_spec,
    )

    @jax.jit
    def fn(symbols, pred_slots, pred_valid, wslots, end_ok, meta, qshift,
           lengths, jlo):
        end_row, rank_row = call(symbols, pred_slots, pred_valid, wslots,
                                 end_ok, meta, qshift)
        end_row = end_row.astype(jnp.int32)
        col = jnp.arange(end_row.shape[1], dtype=jnp.int32)[None, :]
        li = lengths.astype(jnp.int32)[:, None]
        win = jnp.logical_and(col >= jlo.astype(jnp.int32)[:, None],
                              col <= li)
        masked = jnp.where(win, end_row, INF)
        score = jnp.min(masked, axis=1)
        # ties: LARGEST offset, then lowest rank (dense-backtrace parity)
        Lw = masked.shape[1]
        end_j = (Lw - 1 - jnp.argmin(masked[:, ::-1], axis=1)).astype(
            jnp.int32)
        end_r = jnp.take_along_axis(rank_row, end_j[:, None], axis=1)[:, 0]
        return score, end_r, end_j

    return fn


def pallas_bounded_with_ends_2p(dg, qshift, lengths, costs, free_start,
                                end_ok, jlo, max_run: int = 0):
    """(scores, end_ranks, end_offsets) via the 2p bounded kernel."""
    _check_prefetch_fits(dg, 1)
    B, L = qshift.shape
    assert B % B_BLK == 0
    # three rings + io + best + rank row
    blk = pick_b_blk(dg.window, L, L, 4, n_rings=5)
    while B % blk:
        blk //= 2
    P = int(dg.pred_slots.shape[1])
    fn = _pallas_exec_bounded_2p_ends(B // blk, dg.window, P, L,
                                      costs.gap_open, costs.gap_extend,
                                      costs.gap_extend2, costs.mismatch,
                                      B_BLK=blk, free_start=free_start,
                                      max_run=max_run)
    return fn(dg.symbols, dg.pred_slots_flat, dg.pred_valid_flat,
              dg.write_slots, end_ok, dg.meta, qshift, lengths, jlo)


def _fill_kernel_bounded_big_2p_ends(
    meta_ref,
    tab_hbm, qshift_ref,
    end_row_ref, rank_row_ref,
    m_ring, d1_ring, d2_ring, best_ref, tab_s, sems,
    *, W: int, P: int, L: int, o1: int, e1: int, e2: int, x: int,
    B_BLK: int, dtype, free_start: bool, max_run: int = 0,
):
    """Two-piece :func:`_fill_kernel_bounded_big_ends`: the 5-state
    recurrence with HBM->SMEM streamed rank records + best-end-rank
    tracking, for graphs past the scalar-prefetch budget."""
    n_nodes = meta_ref[0]
    end_rank = meta_ref[1]
    R = 3 + 2 * P
    inf = INF16 if dtype == jnp.int16 else INF
    C = BIG_CHUNK
    CW = C * R

    for w in range(W):
        m_ring[w] = jnp.full((B_BLK, L), inf, dtype=dtype)
        d1_ring[w] = jnp.full((B_BLK, L), inf, dtype=dtype)
        d2_ring[w] = jnp.full((B_BLK, L), inf, dtype=dtype)
    best_ref[:] = jnp.full((B_BLK, L), inf, dtype=dtype)
    rank_row_ref[:] = jnp.zeros((B_BLK, L), jnp.int32)

    qshift = qshift_ref[:]
    col32 = jax.lax.broadcasted_iota(jnp.int32, (B_BLK, L), dimension=1)
    zero_at_0 = jnp.where(col32 == 0, jnp.int32(0),
                          jnp.int32(inf)).astype(dtype)
    masks = _ge_masks(col32, L)

    n_chunks = (n_nodes + C - 1) // C

    def dma(k, buf):
        return pltpu.make_async_copy(
            tab_hbm.at[pl.ds(k * CW, CW)],
            tab_s.at[pl.ds(buf * CW, CW)],
            sems.at[buf])

    dma(0, 0).start()

    def chunk_body(k, _):
        buf = jax.lax.rem(k, 2)
        dma(k, buf).wait()

        @pl.when(k + 1 < n_chunks)
        def _():
            dma(k + 1, jax.lax.rem(k + 1, 2)).start()

        base0 = buf * CW

        def body(i, _):
            r = k * C + i
            rec = base0 + i * R
            sym = tab_s[rec]
            wslot = tab_s[rec + 1]
            endok = tab_s[rec + 2]

            slot0 = tab_s[rec + 3]
            min_pm = m_ring[slot0]
            min_pd1 = d1_ring[slot0]
            min_pd2 = d2_ring[slot0]
            for p in range(1, P):
                slot = tab_s[rec + 3 + p]
                valid = tab_s[rec + 3 + P + p]
                keep = valid == 1
                min_pm = jnp.minimum(min_pm,
                                     jnp.where(keep, m_ring[slot], inf))
                min_pd1 = jnp.minimum(min_pd1,
                                      jnp.where(keep, d1_ring[slot], inf))
                min_pd2 = jnp.minimum(min_pd2,
                                      jnp.where(keep, d2_ring[slot], inf))

            D1 = jnp.minimum(jnp.minimum(min_pm + dtype(o1 + e1),
                                         min_pd1 + dtype(e1)), dtype(inf))
            D2 = jnp.minimum(jnp.minimum(min_pd1, min_pd2) + dtype(e2),
                             dtype(inf))

            diag_src = _roll_lanes(min_pm, 1)
            diag_src = jnp.where(masks[1], diag_src, dtype(inf))
            match_cost = jnp.where(qshift == sym, jnp.int32(0),
                                   jnp.int32(x)).astype(dtype)
            diag = diag_src + match_cost

            A = jnp.minimum(diag, jnp.minimum(D1, D2))
            if free_start:
                A = jnp.where(r == end_rank, A, jnp.minimum(A, zero_at_0))
            else:
                A = jnp.where(r == 0, jnp.minimum(A, zero_at_0), A)

            I1, I2 = _coupled_insertion_rows(A, L, inf, masks, o1, e1, e2,
                                             dtype, max_shift=max_run)
            M = jnp.minimum(A, jnp.minimum(I1, I2))

            is_end = r == end_rank
            M = jnp.where(is_end, min_pm, M)
            D1_out = jnp.where(is_end, dtype(inf), D1)
            D2_out = jnp.where(is_end, dtype(inf), D2)

            @pl.when(endok == 1)
            def _():
                improved = M < best_ref[:]
                best_ref[:] = jnp.where(improved, M, best_ref[:])
                rank_row_ref[:] = jnp.where(improved, r, rank_row_ref[:])

            @pl.when(is_end)
            def _():
                end_row_ref[:] = best_ref[:]

            m_ring[wslot] = M
            d1_ring[wslot] = D1_out
            d2_ring[wslot] = D2_out
            return 0

        n_here = jnp.minimum(C, n_nodes - k * C)
        jax.lax.fori_loop(0, n_here, body, 0)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


@functools.lru_cache(maxsize=None)
def _pallas_exec_bounded_big_2p_ends(nblocks: int, W: int, P: int, L: int,
                                     o1: int, e1: int, e2: int, x: int,
                                     B_BLK: int = 64,
                                     free_start: bool = False,
                                     max_run: int = 0):
    dtype = jnp.int32
    kernel = functools.partial(_fill_kernel_bounded_big_2p_ends, W=W, P=P,
                               L=L, o1=o1, e1=e1, e2=e2, x=x, B_BLK=B_BLK,
                               dtype=dtype, free_start=free_start,
                               max_run=max_run)
    R = 3 + 2 * P
    CW = BIG_CHUNK * R
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((B_BLK, L), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B_BLK, L), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_BLK, L), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, B_BLK, L), dtype),
            pltpu.VMEM((W, B_BLK, L), dtype),
            pltpu.VMEM((W, B_BLK, L), dtype),
            pltpu.VMEM((B_BLK, L), dtype),
            pltpu.SMEM((2 * CW,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    call = _pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nblocks * B_BLK, L), dtype),
            jax.ShapeDtypeStruct((nblocks * B_BLK, L), jnp.int32),
        ),
        grid_spec=grid_spec,
    )

    @jax.jit
    def fn(tab, meta, qshift, lengths, jlo):
        end_row, rank_row = call(meta, tab, qshift)
        end_row = end_row.astype(jnp.int32)
        col = jnp.arange(end_row.shape[1], dtype=jnp.int32)[None, :]
        li = lengths.astype(jnp.int32)[:, None]
        win = jnp.logical_and(col >= jlo.astype(jnp.int32)[:, None],
                              col <= li)
        masked = jnp.where(win, end_row, INF)
        score = jnp.min(masked, axis=1)
        # ties: LARGEST offset, then lowest rank (dense-backtrace parity)
        Lw = masked.shape[1]
        end_j = (Lw - 1 - jnp.argmin(masked[:, ::-1], axis=1)).astype(
            jnp.int32)
        end_r = jnp.take_along_axis(rank_row, end_j[:, None], axis=1)[:, 0]
        return score, end_r, end_j

    return fn


def pallas_bounded_with_ends_big_2p(dg, qshift, lengths, costs, free_start,
                                    end_ok, jlo, max_run: int = 0):
    """(scores, end_ranks, end_offsets) via the big-graph 2p kernel."""
    B, L = qshift.shape
    assert B % B_BLK == 0
    P = int(dg.pred_slots.shape[1])
    # three rings + io + best + rank row
    blk = pick_b_blk(dg.window, L, L, 4, n_rings=5)
    while B % blk:
        blk //= 2
    tab, meta = _big_rank_table(dg, end_ok)
    fn = _pallas_exec_bounded_big_2p_ends(B // blk, dg.window, P, L,
                                          costs.gap_open, costs.gap_extend,
                                          costs.gap_extend2, costs.mismatch,
                                          B_BLK=blk, free_start=free_start,
                                          max_run=max_run)
    return fn(tab, meta, qshift, lengths, jlo)


def _fill_kernel_2p(
    # scalar prefetch
    symbols_ref,      # (Np,) int32
    pred_slots_ref,   # (Np*P,) int32
    pred_valid_ref,   # (Np*P,) int32 (0/1)
    wslot_ref,        # (Np,) int32
    meta_ref,         # (4,) int32: [n_real_ranks, end_rank, 0, 0]
    # inputs
    qshift_ref,       # (B_BLK, L) int32 VMEM
    # outputs
    end_row_ref,      # (B_BLK, L) VMEM
    # scratch: three rings (M, D1, D2) + best row when free_end
    *refs,
    W: int, P: int, L: int, o1: int, e1: int, e2: int, x: int,
    B_BLK: int, dtype, free_start: bool = False, free_end: bool = False,
):
    """Two-piece (convex) affine fill; math mirrors ops/dp_rows_2p.py
    (reference transition structure: ``gap_affine_2piece.rs:292-430``).
    """
    if free_end:
        m_ring, d1_ring, d2_ring, best_ref = refs
    else:
        m_ring, d1_ring, d2_ring = refs
        best_ref = None
    n_nodes = meta_ref[0]
    end_rank = meta_ref[1]
    inf = INF16 if dtype == jnp.int16 else INF

    for w in range(W):
        m_ring[w] = jnp.full((B_BLK, L), inf, dtype=dtype)
        d1_ring[w] = jnp.full((B_BLK, L), inf, dtype=dtype)
        d2_ring[w] = jnp.full((B_BLK, L), inf, dtype=dtype)
    if free_end:
        best_ref[:] = jnp.full((B_BLK, L), inf, dtype=dtype)

    qshift = qshift_ref[:]
    col32 = jax.lax.broadcasted_iota(jnp.int32, (B_BLK, L), dimension=1)
    zero_at_0 = jnp.where(col32 == 0, jnp.int32(0), jnp.int32(inf)).astype(dtype)
    masks = _ge_masks(col32, L)

    def body(r, _):
        sym = symbols_ref[r]

        slot0 = pred_slots_ref[r * P]
        min_pm = m_ring[slot0]
        min_pd1 = d1_ring[slot0]
        min_pd2 = d2_ring[slot0]
        for p in range(1, P):
            slot = pred_slots_ref[r * P + p]
            valid = pred_valid_ref[r * P + p]
            keep = valid == 1
            min_pm = jnp.minimum(min_pm, jnp.where(keep, m_ring[slot], inf))
            min_pd1 = jnp.minimum(min_pd1, jnp.where(keep, d1_ring[slot], inf))
            min_pd2 = jnp.minimum(min_pd2, jnp.where(keep, d2_ring[slot], inf))

        D1 = jnp.minimum(jnp.minimum(min_pm + dtype(o1 + e1),
                                     min_pd1 + dtype(e1)), dtype(inf))
        D2 = jnp.minimum(jnp.minimum(min_pd1, min_pd2) + dtype(e2), dtype(inf))

        diag_src = _roll_lanes(min_pm, 1)
        diag_src = jnp.where(masks[1], diag_src, dtype(inf))
        match_cost = jnp.where(qshift == sym, jnp.int32(0),
                               jnp.int32(x)).astype(dtype)
        diag = diag_src + match_cost

        A = jnp.minimum(diag, jnp.minimum(D1, D2))
        if free_start:
            A = jnp.where(r == end_rank, A, jnp.minimum(A, zero_at_0))
        else:
            A = jnp.where(r == 0, jnp.minimum(A, zero_at_0), A)

        I1, I2 = _coupled_insertion_rows(A, L, inf, masks, o1, e1, e2, dtype)
        M = jnp.minimum(A, jnp.minimum(I1, I2))

        is_end = r == end_rank
        M = jnp.where(is_end, min_pm, M)
        D1_out = jnp.where(is_end, dtype(inf), D1)
        D2_out = jnp.where(is_end, dtype(inf), D2)

        if free_end:
            is_real = jnp.logical_and(r > 0, jnp.logical_not(is_end))

            @pl.when(is_real)
            def _():
                best_ref[:] = jnp.minimum(best_ref[:], M)

            @pl.when(is_end)
            def _():
                end_row_ref[:] = jnp.minimum(best_ref[:], min_pm)
        else:
            @pl.when(is_end)
            def _():
                end_row_ref[:] = min_pm

        slot = wslot_ref[r]
        m_ring[slot] = M
        d1_ring[slot] = D1_out
        d2_ring[slot] = D2_out
        return 0

    jax.lax.fori_loop(0, n_nodes, body, 0)


@functools.lru_cache(maxsize=None)
def _pallas_exec_2p(nblocks: int, W: int, P: int, L: int, o1: int, e1: int,
                    e2: int, x: int, B_BLK: int = 64,
                    free_start: bool = False, free_end: bool = False):
    dtype = jnp.int32
    kernel = functools.partial(_fill_kernel_2p, W=W, P=P, L=L, o1=o1, e1=e1,
                               e2=e2, x=x, B_BLK=B_BLK, dtype=dtype,
                               free_start=free_start, free_end=free_end)

    scratch = [
        pltpu.VMEM((W, B_BLK, L), dtype),
        pltpu.VMEM((W, B_BLK, L), dtype),
        pltpu.VMEM((W, B_BLK, L), dtype),
    ]
    if free_end:
        scratch.append(pltpu.VMEM((B_BLK, L), dtype))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((B_BLK, L), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (B_BLK, L), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
    )

    call = _pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nblocks * B_BLK, L), dtype),
        grid_spec=grid_spec,
    )

    @jax.jit
    def fn(symbols, pred_slots, pred_valid, wslots, meta, qshift, lengths):
        end_row = call(symbols, pred_slots, pred_valid, wslots, meta, qshift)
        idx = lengths.astype(jnp.int32)[:, None]
        return jnp.take_along_axis(end_row, idx, axis=1)[:, 0].astype(jnp.int32)

    return fn


def pallas_fill_scores_2p(dg, qshift, lengths, costs,
                          free_start: bool = False, free_end: bool = False):
    """(B,) alignment scores, two-piece model, via the Pallas kernel
    (global by default; ``free_start``/``free_end`` for semi-global).

    Requires B to be a multiple of B_BLK (callers pad batches).
    """
    _check_prefetch_fits(dg, 0)
    B, L = qshift.shape
    blk = pick_b_blk(dg.window, L, L, 4, n_rings=4 if free_end else 3)
    blk = min(blk, B) if B % 64 == 0 else blk
    while B % blk:
        blk //= 2
    assert blk >= 32 and B % blk == 0, f"batch {B} must divide into kernel blocks"
    P = int(dg.pred_slots.shape[1])
    fn = _pallas_exec_2p(B // blk, dg.window, P, L,
                         costs.gap_open, costs.gap_extend, costs.gap_extend2,
                         costs.mismatch, B_BLK=blk,
                         free_start=free_start, free_end=free_end)
    return fn(dg.symbols, dg.pred_slots_flat, dg.pred_valid_flat,
              dg.write_slots, dg.meta, qshift, lengths)


def _banded_kernel(
    # scalar prefetch
    symbols_ref,      # (Np,)
    pred_slots_ref,   # (Np*P,) ring slots
    pred_valid_ref,   # (Np*P,)
    pred_wstart_ref,  # (Np*P,) window start of each predecessor's rank
    wstart_ref,       # (Np,) this rank's window start (multiples of 128)
    wslot_ref,        # (Np,) liveness-colored ring slot per rank
    *rest,            # [chain_ref, store_ref,] meta_ref, qshift, out, scratch
    W: int, P: int, Wb: int, MARGIN: int, o: int, e: int, x: int,
    B_BLK: int, dtype, max_run: int = 0, chain_skip: bool = False,
):
    """Banded fill in TILTED coordinates: rings store X'(j) = X(j) - e*j.

    The tilt makes the insertion closure shift-invariant —
    I' = prefix_min(A')_{j-1} + o — eliminating the per-rank e*j
    subtract/add pair; the -e on the diagonal folds into the match-cost
    constants (match: -e, mismatch: x - e) and D' keeps the untilted
    constants (same j).  Predecessor window reads stay consistent because
    values are tilted by *global* j, which window alignment preserves.
    The caller un-tilts by adding e*length at score extraction.
    ``max_run``: ≤ub insertion-run cap (see _prefix_min_rows).

    ``chain_skip`` (experimental, env ``POASTA_CHAIN_SKIP``): fused POA /
    pangenome graphs are mostly *chains* — ranks whose only predecessor
    is the previous rank at the same window start (~72% of ranks on the
    uniform bench graph).  Two scratch rows (``pm_buf``/``pd_buf``) always
    hold the previous rank's stored M/D, so chain ranks skip the whole
    predecessor gather (2 dynamic-slice ring reads + (P-1) masked
    min-reads) behind a scalar-prefetch-driven branch, and ranks whose
    rows no ring consumer will ever read skip the ring stores too
    (``store_ref``; see :func:`prepare_banded` for the flag derivation
    and why masked reads of stale slots stay harmless).
    """
    if chain_skip:
        (chain_ref, store_ref, meta_ref, qshift_ref, end_row_ref,
         m_ring, d_ring, pm_buf, pd_buf) = rest
    else:
        meta_ref, qshift_ref, end_row_ref, m_ring, d_ring = rest
        chain_ref = store_ref = pm_buf = pd_buf = None
    n_nodes = meta_ref[0]
    end_rank = meta_ref[1]
    TOT = 2 * MARGIN + Wb
    inf = INF16 if dtype == jnp.int16 else INF

    for w in range(W):
        m_ring[w] = jnp.full((B_BLK, TOT), inf, dtype=dtype)
        d_ring[w] = jnp.full((B_BLK, TOT), inf, dtype=dtype)

    col32 = jax.lax.broadcasted_iota(jnp.int32, (B_BLK, Wb), dimension=1)
    masks = _ge_masks(col32, Wb)

    def body(r, _):
        sym = symbols_ref[r]
        w_r = wstart_ref[r]
        j32 = col32 + w_r

        def gather():
            # p=0 is unconditional: every real rank > 0 has at least one
            # predecessor (stored first), and rank 0's slot-0 row is still
            # all-INF when it executes — the correct neutral either way.
            slot0 = pred_slots_ref[r * P]
            delta0 = jnp.clip(w_r - pred_wstart_ref[r * P], -MARGIN, MARGIN)
            start0 = pl.multiple_of(MARGIN + delta0, 128)
            min_pm = m_ring[slot0, :, pl.ds(start0, Wb)]
            min_pd = d_ring[slot0, :, pl.ds(start0, Wb)]
            for p in range(1, P):
                slot = pred_slots_ref[r * P + p]
                valid = pred_valid_ref[r * P + p]
                w_p = pred_wstart_ref[r * P + p]
                # delta in [-MARGIN, MARGIN], multiple of 128 by construction
                delta = jnp.clip(w_r - w_p, -MARGIN, MARGIN)
                start = pl.multiple_of(MARGIN + delta, 128)
                am = m_ring[slot, :, pl.ds(start, Wb)]
                ad = d_ring[slot, :, pl.ds(start, Wb)]
                keep = valid == 1
                min_pm = jnp.minimum(min_pm, jnp.where(keep, am, inf))
                min_pd = jnp.minimum(min_pd, jnp.where(keep, ad, inf))
            return min_pm, min_pd

        if chain_skip:
            @pl.when(chain_ref[r] == 0)
            def _():
                mm, dd = gather()
                pm_buf[:] = mm
                pd_buf[:] = dd
            min_pm = pm_buf[:]
            min_pd = pd_buf[:]
        else:
            min_pm, min_pd = gather()

        D = jnp.minimum(min_pm + dtype(o + e), min_pd + dtype(e))

        diag_src = _roll_lanes(min_pm, 1)
        diag_src = jnp.where(masks[1], diag_src, dtype(inf))
        qstart = pl.multiple_of(w_r, 128)
        qwin = qshift_ref[:, pl.ds(qstart, Wb)]
        # tilted: diag'(j) = M'(j-1) + (match_cost - e)
        match_cost = jnp.where(qwin == sym, jnp.int32(-e),
                               jnp.int32(x - e)).astype(dtype)
        diag = diag_src + match_cost

        A = jnp.minimum(diag, D)
        zero_at_origin = jnp.where(j32 == 0, jnp.int32(0),
                                   jnp.int32(inf)).astype(dtype)
        A = jnp.where(r == 0, jnp.minimum(A, zero_at_origin), A)

        # int16 note: |X - e*j| can exceed int16 for long reads; the
        # int16 path is only selected when e*(L-1) fits (see score_dtype).
        pref = _prefix_min_rows(A, Wb, dtype(inf), col32, masks,
                                max_shift=max_run)
        pref_m1 = _roll_lanes(pref, 1)
        pref_m1 = jnp.where(masks[1], pref_m1, dtype(inf))
        I = jnp.minimum(pref_m1 + dtype(o), dtype(inf))

        M = jnp.minimum(A, I)
        is_end = r == end_rank
        M = jnp.where(is_end, min_pm, M)

        @pl.when(is_end)
        def _():
            end_row_ref[:] = min_pm

        slot = wslot_ref[r]
        D_st = jnp.where(is_end, dtype(inf), jnp.minimum(D, dtype(inf)))
        if chain_skip:
            @pl.when(store_ref[r] == 1)
            def _():
                m_ring[slot, :, MARGIN:MARGIN + Wb] = M
                d_ring[slot, :, MARGIN:MARGIN + Wb] = D_st
            pm_buf[:] = M
            pd_buf[:] = D_st
        else:
            m_ring[slot, :, MARGIN:MARGIN + Wb] = M
            d_ring[slot, :, MARGIN:MARGIN + Wb] = D_st
        return 0

    jax.lax.fori_loop(0, n_nodes, body, 0)


@functools.lru_cache(maxsize=None)
def _banded_exec(nblocks: int, W: int, P: int, Wb: int, MARGIN: int, L: int,
                 o: int, e: int, x: int, B_BLK: int = 64,
                 use_int16: bool = False, max_run: int = 0,
                 chain_skip: bool = False, interpret: bool = False):
    dtype = jnp.int16 if use_int16 else jnp.int32
    kernel = functools.partial(_banded_kernel, W=W, P=P, Wb=Wb, MARGIN=MARGIN,
                               o=o, e=e, x=x, B_BLK=B_BLK, dtype=dtype,
                               max_run=max_run, chain_skip=chain_skip)

    scratch = [
        pltpu.VMEM((W, B_BLK, 2 * MARGIN + Wb), dtype),
        pltpu.VMEM((W, B_BLK, 2 * MARGIN + Wb), dtype),
    ]
    if chain_skip:
        scratch += [pltpu.VMEM((B_BLK, Wb), dtype),
                    pltpu.VMEM((B_BLK, Wb), dtype)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9 if chain_skip else 7,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((B_BLK, L), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (B_BLK, Wb), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
    )

    call = _pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nblocks * B_BLK, Wb), dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )

    @jax.jit
    def fn(symbols, pred_slots, pred_valid, pred_wstarts, wstarts, wslots,
           meta, qshift, lengths, w_end, *chain_store):
        end_row = call(symbols, pred_slots, pred_valid, pred_wstarts,
                       wstarts, wslots, *chain_store, meta, qshift)
        lengths_i = lengths.astype(jnp.int32)
        idx_loc = lengths_i - w_end
        in_range = jnp.logical_and(idx_loc >= 0, idx_loc < Wb)
        idx_c = jnp.clip(idx_loc, 0, Wb - 1)[:, None]
        at = jnp.take_along_axis(end_row, idx_c, axis=1)[:, 0].astype(jnp.int32)
        # un-tilt (+e*j at j=length); eroded-INF lanes (INF walked down by
        # at most e per rank through tilted diag chains) map back to INF
        thresh = (INF16 if use_int16 else INF) // 2
        at = jnp.where(at >= thresh, jnp.int32(INF), at + e * lengths_i)
        return jnp.where(in_range, at, jnp.int32(INF))

    return fn


def _banded_kernel_big(
    # scalar prefetch
    meta_ref,         # (4,): [n_real_ranks, end_rank, _, _]
    qbase_ref,        # (n_chunks,) int32: per-chunk q-segment base lane
    # inputs
    tab_hbm,          # (Np*R,) int32 HBM: [sym, wslot, wstart,
                      #  pred_slot*P, pred_valid*P, pred_wstart*P]
    qshift_hbm,       # (nblocks*B_BLK, L) int32 HBM
    # outputs
    end_row_ref,      # (B_BLK, Wb) VMEM
    # scratch
    m_ring, d_ring, tab_s, q_seg, sems,
    *, W: int, P: int, Wb: int, MARGIN: int, QSEG: int, o: int, e: int,
    x: int, B_BLK: int, dtype, max_run: int = 0,
):
    """Banded fill for graphs past the scalar-prefetch SMEM budget:
    per-rank records (incl. the window tables) stream HBM->SMEM in
    double-buffered BIG_CHUNK slices, like :func:`_fill_kernel_bounded_big`
    but with the banded ring/window mechanics of :func:`_banded_kernel`.

    The query also streams: only a sliding (B_BLK, QSEG) segment is
    VMEM-resident, double-buffered per rank chunk from a host-computed
    per-chunk base lane (qbase).  At long L the full (B_BLK, L) q block
    was the VMEM hog (e.g. 5.2 MiB at 40 kb reads and B_BLK=32, forcing
    tiny blocks + spills); the segment bounds VMEM by the band's span
    per BIG_CHUNK ranks instead of the read length."""
    n_nodes = meta_ref[0]
    end_rank = meta_ref[1]
    R = 3 + 3 * P
    TOT = 2 * MARGIN + Wb
    inf = INF16 if dtype == jnp.int16 else INF
    C = BIG_CHUNK
    CW = C * R
    i_blk = pl.program_id(0)

    for w in range(W):
        m_ring[w] = jnp.full((B_BLK, TOT), inf, dtype=dtype)
        d_ring[w] = jnp.full((B_BLK, TOT), inf, dtype=dtype)

    col32 = jax.lax.broadcasted_iota(jnp.int32, (B_BLK, Wb), dimension=1)
    masks = _ge_masks(col32, Wb)

    n_chunks = (n_nodes + C - 1) // C

    def dma(k, buf):
        return pltpu.make_async_copy(
            tab_hbm.at[pl.ds(k * CW, CW)],
            tab_s.at[pl.ds(buf * CW, CW)],
            sems.at[buf])

    def qdma(k, buf):
        qb = pl.multiple_of(qbase_ref[k], 128)
        return pltpu.make_async_copy(
            qshift_hbm.at[pl.ds(i_blk * B_BLK, B_BLK), pl.ds(qb, QSEG)],
            q_seg.at[buf],
            sems.at[2 + buf])

    dma(0, 0).start()
    qdma(0, 0).start()

    def chunk_body(k, _):
        buf = jax.lax.rem(k, 2)
        dma(k, buf).wait()
        qdma(k, buf).wait()

        @pl.when(k + 1 < n_chunks)
        def _():
            dma(k + 1, jax.lax.rem(k + 1, 2)).start()
            qdma(k + 1, jax.lax.rem(k + 1, 2)).start()

        qb_k = pl.multiple_of(qbase_ref[k], 128)
        base0 = buf * CW

        def body(i, _):
            r = k * C + i
            rec = base0 + i * R
            sym = tab_s[rec]
            wslot = tab_s[rec + 1]
            w_r = tab_s[rec + 2]
            j32 = col32 + w_r

            slot0 = tab_s[rec + 3]
            delta0 = jnp.clip(w_r - tab_s[rec + 3 + 2 * P], -MARGIN,
                              MARGIN)
            start0 = pl.multiple_of(MARGIN + delta0, 128)
            min_pm = m_ring[slot0, :, pl.ds(start0, Wb)]
            min_pd = d_ring[slot0, :, pl.ds(start0, Wb)]
            for p in range(1, P):
                slot = tab_s[rec + 3 + p]
                valid = tab_s[rec + 3 + P + p]
                w_p = tab_s[rec + 3 + 2 * P + p]
                delta = jnp.clip(w_r - w_p, -MARGIN, MARGIN)
                start = pl.multiple_of(MARGIN + delta, 128)
                am = m_ring[slot, :, pl.ds(start, Wb)]
                ad = d_ring[slot, :, pl.ds(start, Wb)]
                keep = valid == 1
                min_pm = jnp.minimum(min_pm, jnp.where(keep, am, inf))
                min_pd = jnp.minimum(min_pd, jnp.where(keep, ad, inf))

            D = jnp.minimum(min_pm + dtype(o + e), min_pd + dtype(e))

            diag_src = _roll_lanes(min_pm, 1)
            diag_src = jnp.where(masks[1], diag_src, dtype(inf))
            qstart = pl.multiple_of(w_r - qb_k, 128)
            qwin = q_seg[buf, :, pl.ds(qstart, Wb)]
            match_cost = jnp.where(qwin == sym, jnp.int32(-e),
                                   jnp.int32(x - e)).astype(dtype)
            diag = diag_src + match_cost

            A = jnp.minimum(diag, D)
            zero_at_origin = jnp.where(j32 == 0, jnp.int32(0),
                                       jnp.int32(inf)).astype(dtype)
            A = jnp.where(r == 0, jnp.minimum(A, zero_at_origin), A)

            pref = _prefix_min_rows(A, Wb, dtype(inf), col32, masks,
                                    max_shift=max_run)
            pref_m1 = _roll_lanes(pref, 1)
            pref_m1 = jnp.where(masks[1], pref_m1, dtype(inf))
            I = jnp.minimum(pref_m1 + dtype(o), dtype(inf))

            M = jnp.minimum(A, I)
            is_end = r == end_rank
            M = jnp.where(is_end, min_pm, M)

            @pl.when(is_end)
            def _():
                end_row_ref[:] = min_pm

            m_ring[wslot, :, MARGIN:MARGIN + Wb] = M
            d_ring[wslot, :, MARGIN:MARGIN + Wb] = jnp.where(
                is_end, dtype(inf), jnp.minimum(D, dtype(inf)))
            return 0

        n_here = jnp.minimum(C, n_nodes - k * C)
        jax.lax.fori_loop(0, n_here, body, 0)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


@functools.lru_cache(maxsize=None)
def _banded_exec_big(nblocks: int, W: int, P: int, Wb: int, MARGIN: int,
                     L: int, QSEG: int, o: int, e: int, x: int,
                     B_BLK: int = 64, use_int16: bool = False,
                     max_run: int = 0):
    dtype = jnp.int16 if use_int16 else jnp.int32
    kernel = functools.partial(_banded_kernel_big, W=W, P=P, Wb=Wb,
                               MARGIN=MARGIN, QSEG=QSEG, o=o, e=e, x=x,
                               B_BLK=B_BLK, dtype=dtype, max_run=max_run)
    R = 3 + 3 * P
    CW = BIG_CHUNK * R
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (B_BLK, Wb), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((W, B_BLK, 2 * MARGIN + Wb), dtype),
            pltpu.VMEM((W, B_BLK, 2 * MARGIN + Wb), dtype),
            pltpu.SMEM((2 * CW,), jnp.int32),
            pltpu.VMEM((2, B_BLK, QSEG), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    call = _pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nblocks * B_BLK, Wb), dtype),
        grid_spec=grid_spec,
    )

    @jax.jit
    def fn(tab, meta, qbase, qshift, lengths, w_end):
        end_row = call(meta, qbase, tab, qshift)
        lengths_i = lengths.astype(jnp.int32)
        idx_loc = lengths_i - w_end
        in_range = jnp.logical_and(idx_loc >= 0, idx_loc < Wb)
        idx_c = jnp.clip(idx_loc, 0, Wb - 1)[:, None]
        at = jnp.take_along_axis(end_row, idx_c,
                                 axis=1)[:, 0].astype(jnp.int32)
        # un-tilt (+e*j at j=length); eroded-INF lanes map back to INF
        thresh = (INF16 if use_int16 else INF) // 2
        at = jnp.where(at >= thresh, jnp.int32(INF), at + e * lengths_i)
        return jnp.where(in_range, at, jnp.int32(INF))

    return fn


def _clamp_windows_to_row(wstarts_np, width: int, L: int):
    """Clamp a window layout to the packed query row.

    Wide ladder tiers (or direct callers) can request width > L; lanes
    past L hold no real offsets, and a window whose span crosses L makes
    the kernels' q slices run past the block (Mosaic clamps the load —
    at best a failed compile, at worst duplicated lanes feeding the
    prefix-min — and interpret mode rejects it outright).  Shrinking the
    width to the row and shifting starts left keeps every real cell the
    original window covered, so exactness guarantees are unchanged.
    """
    width = min(width, (L // 128) * 128)
    clamp = max(((L - width) // 128) * 128, 0)
    return width, np.minimum(wstarts_np, clamp).astype(np.int32)


def prepare_banded_big(dg, costs, wstarts_np, width: int, L: int):
    """Banded prep for the big-graph kernel: the per-rank records
    (symbols, ring slots, window starts, predecessor data) pack into one
    interleaved HBM table streamed by the kernel.  Cached by the caller
    like :func:`prepare_banded`."""
    import numpy as np

    width, wstarts_np = _clamp_windows_to_row(wstarts_np, width, L)
    Np = dg.n_nodes_padded
    P = int(dg.pred_slots.shape[1])
    R = 3 + 3 * P
    ws = np.zeros(Np, dtype=np.int32)
    ws[: wstarts_np.shape[0]] = wstarts_np
    pw = np.take(ws, dg.pred_ranks_np, axis=0).astype(np.int32)

    n = min(wstarts_np.shape[0], dg.pred_ranks_np.shape[0])
    pr = dg.pred_ranks_np[:n]
    valid = dg.pred_valid_np[:n]
    deltas = [0]
    for i in range(pr.shape[1]):
        d = np.abs(ws[:n] - ws[pr[:, i]])
        deltas.append(int(np.where(valid[:, i], d, 0).max()) if n else 0)
    margin = ((max(deltas) + 127) // 128) * 128
    margin = max(margin, 128)

    Np_pad = ((Np + BIG_CHUNK - 1) // BIG_CHUNK) * BIG_CHUNK
    tab = np.zeros((Np_pad, R), dtype=np.int32)
    tab[:Np, 0] = np.asarray(dg.symbols)
    tab[:Np, 1] = np.asarray(dg.write_slots)
    tab[:Np, 2] = ws
    tab[:Np, 3:3 + P] = np.asarray(dg.pred_slots)
    tab[:Np, 3 + P:3 + 2 * P] = np.asarray(dg.pred_valid).astype(np.int32)
    tab[:Np, 3 + 2 * P:3 + 3 * P] = pw

    # sliding q segment: per-chunk base lane + one static segment size
    # covering every chunk's window span (the kernel DMAs (B_BLK, QSEG)
    # instead of holding the whole (B_BLK, L) q block in VMEM)
    n_chunks = max((int(dg.n_nodes) + BIG_CHUNK - 1) // BIG_CHUNK, 1)
    qb = np.zeros(n_chunks, dtype=np.int32)
    span = width
    for k in range(n_chunks):
        wchunk = ws[k * BIG_CHUNK: min((k + 1) * BIG_CHUNK,
                                       int(dg.n_nodes))]
        if wchunk.size == 0:
            continue
        lo = int(wchunk.min()) // 128 * 128
        qb[k] = lo
        span = max(span, int(wchunk.max()) + width - lo)
    qseg = min(((span + 127) // 128) * 128, L)
    qb = np.minimum(qb, max(L - qseg, 0)).astype(np.int32)

    return {
        "margin": margin,
        "width": width,
        "L": L,
        "big_tab": jnp.asarray(tab.reshape(-1)),
        "meta": jnp.asarray([dg.n_nodes, dg.n_nodes - 1, R, 0],
                            dtype=jnp.int32),
        "qbase": jnp.asarray(qb),
        "qseg": qseg,
        "w_end": jnp.asarray(int(ws[dg.end_rank_i]), dtype=jnp.int32),
    }


def pallas_banded_scores_big(dg, qshift, lengths, costs, prep,
                             max_run: int = 0):
    """Banded global scores for graphs past the scalar-prefetch budget."""
    B, L = qshift.shape
    assert B % B_BLK == 0
    P = int(dg.pred_slots.shape[1])
    margin, width = prep["margin"], prep["width"]
    dtype = score_dtype(dg.n_nodes_padded, L, costs.gap_open,
                        costs.gap_extend, costs.mismatch)
    use_int16 = dtype == jnp.int16
    qseg = prep["qseg"]
    # VMEM: rings + the double-buffered (B_BLK, QSEG) sliding q segment
    # (the segment replaced the full (B_BLK, L) q block round 3 — at
    # 40 kb reads that block alone forced B_BLK down to 32)
    blk = pick_b_blk(dg.window, 2 * margin + width, qseg,
                     2 if use_int16 else 4)
    while B % blk:
        blk //= 2
    fn = _banded_exec_big(B // blk, dg.window, P, width, margin, L, qseg,
                          costs.gap_open, costs.gap_extend, costs.mismatch,
                          B_BLK=blk, use_int16=use_int16, max_run=max_run)
    return fn(prep["big_tab"], prep["meta"], prep["qbase"], qshift,
              lengths, prep["w_end"])


def prepare_banded(dg, costs, wstarts_np, width: int, L: int):
    """Precompute the banded kernel's device arrays + margin for a window
    layout.  Callers cache the result: uploading the window tables per
    call would cost a host->device round trip on the dispatch path.

    Also derives the ``chain_skip`` flags (see :func:`_banded_kernel`):

    * ``chain[r]`` — rank r's only used predecessor is rank r-1 at the
      same window start, so the kernel may take min_pm/min_pd from the
      previous iteration's scratch buffers instead of the ring.
    * ``store[r]`` — some rank will *use* rank r's row from the ring:
      either as the unconditional p=0 read of a non-chain rank, or as a
      valid p≥1 read of a non-chain rank.  When no such consumer exists
      the ring stores are skipped.  Skipping is sound because (a) chain
      consumers read the scratch carry, not the ring, and (b) the only
      other reads that can land on a stale slot are p≥1 reads with
      valid==0, whose values the kernel masks away before use.
    """
    import numpy as np

    width, wstarts_np = _clamp_windows_to_row(wstarts_np, width, L)
    Np = dg.n_nodes_padded
    ws = np.zeros(Np, dtype=np.int32)
    ws[: wstarts_np.shape[0]] = wstarts_np
    pw = np.take(ws, dg.pred_ranks_np, axis=0).astype(np.int32)

    # margin covers the largest window shift between adjacent ranks
    deltas = []
    n = min(wstarts_np.shape[0], dg.pred_ranks_np.shape[0])
    pr = dg.pred_ranks_np[:n]
    valid = dg.pred_valid_np[:n]
    for i in range(pr.shape[1]):
        d = np.abs(ws[:n] - ws[pr[:, i]])
        deltas.append(np.where(valid[:, i], d, 0).max() if n else 0)
    margin = int(max(deltas)) if deltas else 0
    margin = ((margin + 127) // 128) * 128
    margin = max(margin, 128)

    chain = np.zeros(Np, dtype=np.int32)
    store = np.zeros(Np, dtype=np.int32)
    if n > 1:
        P = pr.shape[1]
        ranks = np.arange(n)
        single = valid[:, 1:].sum(axis=1) == 0 if P > 1 else np.ones(
            n, dtype=bool)
        chain[1:n] = (single[1:] & (pr[1:, 0] == ranks[1:] - 1)
                      & (ws[1:n] == ws[:n - 1])).astype(np.int32)
        nonchain = ranks[1:][chain[1:n] == 0]
        used = np.zeros(Np, dtype=bool)
        used[pr[nonchain, 0]] = True  # p=0 reads are unconditional
        for p in range(1, P):
            sel = nonchain[valid[nonchain, p].astype(bool)]
            used[pr[sel, p]] = True
        store[:n] = used[:n].astype(np.int32)
    else:
        store[:n] = 1

    return {
        "margin": margin,
        "width": width,
        "L": L,
        "pred_wstarts": jnp.asarray(pw.reshape(-1)),
        "wstarts": jnp.asarray(ws),
        "w_end": jnp.asarray(int(ws[dg.end_rank_i]), dtype=jnp.int32),
        "chain": jnp.asarray(chain),
        "store": jnp.asarray(store),
        "chain_frac": float(chain[:n].mean()) if n else 0.0,
    }


def _chain_skip_enabled() -> bool:
    """Experimental banded chain-run ring-skip (see :func:`_banded_kernel`).

    Opt-in via ``POASTA_CHAIN_SKIP=1`` until the on-chip A/B
    (``scripts/chainskip_ab.py``) proves it; read per call so tests and
    the A/B harness can toggle without re-importing."""
    import os

    return os.environ.get("POASTA_CHAIN_SKIP", "") not in ("", "0")


def pallas_banded_scores(dg, qshift, lengths, costs, wstarts_np=None,
                         width: int = 0, prep=None, max_run: int = 0,
                         chain_skip: Optional[bool] = None,
                         interpret: bool = False):
    """Banded global-alignment scores via the Pallas kernel.

    Either pass ``prep`` from :func:`prepare_banded` (cached, zero upload)
    or ``wstarts_np`` (+``width``) to build it ad hoc.  ``wstarts_np``:
    (n_nodes,) per-rank window starts, multiples of 128; ``width``: window
    width, a multiple of 128.  Caller guarantees band coverage (see
    :class:`poasta_tpu.aligner.banded.BandedScorer`).  ``chain_skip``
    defaults to the ``POASTA_CHAIN_SKIP`` env gate; ``interpret`` runs the
    kernel in Pallas interpret mode (CPU exactness tests).
    """
    if chain_skip is None:
        chain_skip = _chain_skip_enabled()
    interpret = interpret or _interpret_mode()
    _check_prefetch_fits(dg, 4 if chain_skip else 2)
    B, L = qshift.shape
    assert B % B_BLK == 0
    P = int(dg.pred_slots.shape[1])
    Np = dg.n_nodes_padded
    if prep is None:
        prep = prepare_banded(dg, costs, wstarts_np, width, L)
    margin, width = prep["margin"], prep["width"]

    dtype = score_dtype(Np, L, costs.gap_open, costs.gap_extend, costs.mismatch)
    use_int16 = dtype == jnp.int16
    itemsize = 2 if use_int16 else 4
    # the chain-skip scratch rows cost 2 * blk * width * itemsize on top
    # of the rings: account for them as extra row lanes
    row_lanes = 2 * margin + width + (width // dg.window if chain_skip else 0)
    blk = pick_b_blk(dg.window, row_lanes, L, itemsize)
    while B % blk:
        blk //= 2
    fn = _banded_exec(B // blk, dg.window, P, width, margin, L,
                      costs.gap_open, costs.gap_extend, costs.mismatch,
                      B_BLK=blk, use_int16=use_int16, max_run=max_run,
                      chain_skip=chain_skip, interpret=interpret)
    extra = (prep["chain"], prep["store"]) if chain_skip else ()
    return fn(dg.symbols, dg.pred_slots_flat, dg.pred_valid_flat,
              prep["pred_wstarts"], prep["wstarts"], dg.write_slots,
              dg.meta, qshift, lengths, prep["w_end"], *extra)


def _banded_kernel_ef(
    # scalar prefetch
    symbols_ref,      # (Np,)
    pred_slots_ref,   # (Np*P,) ring slots
    pred_valid_ref,   # (Np*P,)
    pred_wstart_ref,  # (Np*P,)
    wstart_ref,       # (Np,)
    wslot_ref,        # (Np,)
    end_ok_ref,       # (Np,) int32 0/1 — graph-end bound per rank
    meta_ref,         # (4,)
    # inputs
    qshift_ref,       # (B_BLK, L) VMEM
    # outputs
    end_row_ref,      # (B_BLK, L) VMEM — min M over permitted ranks, global j
    # scratch
    m_ring, d_ring,   # (W, B_BLK, 2*MARGIN + Wb)
    best_ref,         # (B_BLK, L)
    *, W: int, P: int, Wb: int, MARGIN: int, o: int, e: int, x: int,
    B_BLK: int, dtype, free_start: bool, max_run: int = 0,
):
    """Ends-free banded fill: :func:`_banded_kernel` plus a free graph
    begin (j=0 seed at every real rank) and a global-width best row
    accumulating windows of ranks whose graph-end bound passes.  The
    query-end bound applies outside as a windowed min over [jlo, n].

    Tilted coordinates like :func:`_banded_kernel`; the best row stays
    tilted (it is positional in global j, so min commutes with the -e*j
    column constant) and the caller un-tilts with one +e*col add."""
    n_nodes = meta_ref[0]
    end_rank = meta_ref[1]
    inf = INF16 if dtype == jnp.int16 else INF
    L = best_ref.shape[1]

    for w in range(W):
        m_ring[w] = jnp.full((B_BLK, 2 * MARGIN + Wb), inf, dtype=dtype)
        d_ring[w] = jnp.full((B_BLK, 2 * MARGIN + Wb), inf, dtype=dtype)
    best_ref[:] = jnp.full((B_BLK, L), inf, dtype=dtype)

    col32 = jax.lax.broadcasted_iota(jnp.int32, (B_BLK, Wb), dimension=1)
    masks = _ge_masks(col32, Wb)

    def body(r, _):
        sym = symbols_ref[r]
        w_r = wstart_ref[r]
        j32 = col32 + w_r

        slot0 = pred_slots_ref[r * P]
        delta0 = jnp.clip(w_r - pred_wstart_ref[r * P], -MARGIN, MARGIN)
        start0 = pl.multiple_of(MARGIN + delta0, 128)
        min_pm = m_ring[slot0, :, pl.ds(start0, Wb)]
        min_pd = d_ring[slot0, :, pl.ds(start0, Wb)]
        for p in range(1, P):
            slot = pred_slots_ref[r * P + p]
            valid = pred_valid_ref[r * P + p]
            w_p = pred_wstart_ref[r * P + p]
            delta = jnp.clip(w_r - w_p, -MARGIN, MARGIN)
            start = pl.multiple_of(MARGIN + delta, 128)
            am = m_ring[slot, :, pl.ds(start, Wb)]
            ad = d_ring[slot, :, pl.ds(start, Wb)]
            keep = valid == 1
            min_pm = jnp.minimum(min_pm, jnp.where(keep, am, inf))
            min_pd = jnp.minimum(min_pd, jnp.where(keep, ad, inf))

        D = jnp.minimum(min_pm + dtype(o + e), min_pd + dtype(e))

        diag_src = _roll_lanes(min_pm, 1)
        diag_src = jnp.where(masks[1], diag_src, dtype(inf))
        qstart = pl.multiple_of(w_r, 128)
        qwin = qshift_ref[:, pl.ds(qstart, Wb)]
        match_cost = jnp.where(qwin == sym, jnp.int32(-e),
                               jnp.int32(x - e)).astype(dtype)
        diag = diag_src + match_cost

        A = jnp.minimum(diag, D)
        is_end = r == end_rank
        zero_at_origin = jnp.where(j32 == 0, jnp.int32(0),
                                   jnp.int32(inf)).astype(dtype)
        if free_start:
            A = jnp.where(is_end, A, jnp.minimum(A, zero_at_origin))
        else:
            A = jnp.where(r == 0, jnp.minimum(A, zero_at_origin), A)

        pref = _prefix_min_rows(A, Wb, dtype(inf), col32, masks,
                                max_shift=max_run)
        pref_m1 = _roll_lanes(pref, 1)
        pref_m1 = jnp.where(masks[1], pref_m1, dtype(inf))
        I = jnp.minimum(pref_m1 + dtype(o), dtype(inf))

        M = jnp.minimum(A, I)
        M = jnp.where(is_end, min_pm, M)

        permitted = end_ok_ref[r] == 1

        @pl.when(permitted)
        def _():
            cur = best_ref[:, pl.ds(qstart, Wb)]
            best_ref[:, pl.ds(qstart, Wb)] = jnp.minimum(cur, M)

        @pl.when(is_end)
        def _():
            end_row_ref[:] = best_ref[:]

        slot = wslot_ref[r]
        m_ring[slot, :, MARGIN:MARGIN + Wb] = M
        d_ring[slot, :, MARGIN:MARGIN + Wb] = jnp.where(
            is_end, dtype(inf), jnp.minimum(D, dtype(inf)))
        return 0

    jax.lax.fori_loop(0, n_nodes, body, 0)


@functools.lru_cache(maxsize=None)
def _banded_exec_ef(nblocks: int, W: int, P: int, Wb: int, MARGIN: int,
                    L: int, o: int, e: int, x: int, free_start: bool,
                    B_BLK: int = 64, use_int16: bool = False,
                    max_run: int = 0):
    dtype = jnp.int16 if use_int16 else jnp.int32
    kernel = functools.partial(_banded_kernel_ef, W=W, P=P, Wb=Wb,
                               MARGIN=MARGIN, o=o, e=e, x=x, B_BLK=B_BLK,
                               dtype=dtype, free_start=free_start,
                               max_run=max_run)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((B_BLK, L), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (B_BLK, L), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((W, B_BLK, 2 * MARGIN + Wb), dtype),
            pltpu.VMEM((W, B_BLK, 2 * MARGIN + Wb), dtype),
            pltpu.VMEM((B_BLK, L), dtype),
        ],
    )

    call = _pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nblocks * B_BLK, L), dtype),
        grid_spec=grid_spec,
    )

    @jax.jit
    def fn(symbols, pred_slots, pred_valid, pred_wstarts, wstarts, wslots,
           end_ok, meta, qshift, lengths, jlo):
        end_row = call(symbols, pred_slots, pred_valid, pred_wstarts,
                       wstarts, wslots, end_ok, meta,
                       qshift).astype(jnp.int32)
        col = jnp.arange(end_row.shape[1], dtype=jnp.int32)[None, :]
        # un-tilt the positional best row (+e*col); eroded-INF lanes map
        # back to INF
        thresh = (INF16 if use_int16 else INF) // 2
        end_row = jnp.where(end_row >= thresh, jnp.int32(INF),
                            end_row + e * col)
        li = lengths.astype(jnp.int32)[:, None]
        win = jnp.logical_and(col >= jlo.astype(jnp.int32)[:, None],
                              col <= li)
        return jnp.min(jnp.where(win, end_row, INF), axis=1)

    return fn


def pallas_banded_scores_ef(dg, qshift, lengths, costs, prep, free_start,
                            end_ok, jlo, max_run: int = 0):
    """Ends-free banded scores via the Pallas kernel."""
    _check_prefetch_fits(dg, 3)
    B, L = qshift.shape
    assert B % B_BLK == 0
    P = int(dg.pred_slots.shape[1])
    margin, width = prep["margin"], prep["width"]

    dtype = score_dtype(dg.n_nodes_padded, L, costs.gap_open,
                        costs.gap_extend, costs.mismatch)
    use_int16 = dtype == jnp.int16
    itemsize = 2 if use_int16 else 4
    # rings + qshift input + end_row output + best scratch must fit VMEM
    blk = 64
    for cand in (512, 256, 128, 64):
        need = (2 * dg.window * cand * (2 * margin + width) * itemsize
                + cand * L * (4 + 2 * itemsize))
        if need <= VMEM_BUDGET:
            blk = cand
            break
    while B % blk:
        blk //= 2
    fn = _banded_exec_ef(B // blk, dg.window, P, width, margin, L,
                         costs.gap_open, costs.gap_extend, costs.mismatch,
                         free_start, B_BLK=blk, use_int16=use_int16,
                         max_run=max_run)
    return fn(dg.symbols, dg.pred_slots_flat, dg.pred_valid_flat,
              prep["pred_wstarts"], prep["wstarts"], dg.write_slots,
              end_ok, dg.meta, qshift, lengths, jlo)


def _banded_kernel_drift(
    # scalar prefetch
    symbols_ref,      # (Np,)
    pred_slots_ref,   # (Np*P,) ring slots
    pred_valid_ref,   # (Np*P,)
    pred_wstart_ref,  # (Np*P,) window start of each predecessor's rank
    wstart_ref,       # (Np,) shared FRAME window start (may be negative)
    wslot_ref,        # (Np,) liveness-colored ring slot per rank
    s_ref,            # (Np,) cumulative drift-step count per rank
    s_prev_ref,       # (Np,) previous rank's step count
    meta_ref,         # (4,): [n_real_ranks, end_rank, _, _]
    # inputs
    qshift_ref,       # (B_BLK, MQ+L) VMEM — query, MQ zero lanes left
    nbs_ref,          # (B_BLK, 128) VMEM — per-read drift units
    # outputs
    end_row_ref,      # (B_BLK, Wb) VMEM
    # scratch
    m_ring, d_ring,   # (W, B_BLK, 2*MARGIN + Wb) VMEM
    q_cur,            # (B_BLK, MQ+L) VMEM — query in each read's frame
    *, W: int, P: int, Wb: int, MARGIN: int, MQ: int, S: int, o: int,
    e: int, x: int, B_BLK: int, dtype, max_run: int = 0,
):
    """Banded fill with per-read drifting windows.

    Shared layout + per-read shift sigma_b(r) = 128*floor(nbs_b*s_r/S).
    At ranks where s increments, stepping reads re-frame: their query row
    and live ring rows roll left 128 lanes, so predecessor reads remain
    shared slices (see aligner/banded.py band_windows_drift).  S is a
    power of two, so the in-kernel division is a shift.

    Tilted coordinates like :func:`_banded_kernel` (tilt by global j,
    which frame rolls preserve); caller un-tilts with +e*length.
    """
    n_nodes = meta_ref[0]
    end_rank = meta_ref[1]
    TOT = 2 * MARGIN + Wb
    LQ = q_cur.shape[1]
    inf = INF16 if dtype == jnp.int16 else INF

    for w in range(W):
        m_ring[w] = jnp.full((B_BLK, TOT), inf, dtype=dtype)
        d_ring[w] = jnp.full((B_BLK, TOT), inf, dtype=dtype)
    q_cur[:] = qshift_ref[:]

    col32 = jax.lax.broadcasted_iota(jnp.int32, (B_BLK, Wb), dimension=1)
    masks = _ge_masks(col32, Wb)
    nbs_col = nbs_ref[:][:, :1]  # (B_BLK, 1) int32 (full-tile load + slice)

    def body(r, _):
        sym = symbols_ref[r]
        w_r = wstart_ref[r]
        s_r = s_ref[r]
        s_p = s_prev_ref[r]
        sig_now_col = ((nbs_col * s_r) // S) * 128  # (B, 1)
        sig_prev_col = ((nbs_col * s_p) // S) * 128

        @pl.when(s_r > s_p)
        def _():
            stepped = sig_now_col > sig_prev_col  # (B, 1)
            qroll = jnp.concatenate(
                [q_cur[:, 128:],
                 jnp.zeros((B_BLK, 128), q_cur.dtype)], axis=1)
            q_cur[:] = jnp.where(stepped, qroll, q_cur[:])
            for w in range(W):
                mw = m_ring[w]
                dw = d_ring[w]
                m_ring[w] = jnp.where(
                    stepped,
                    jnp.concatenate(
                        [mw[:, 128:],
                         jnp.full((B_BLK, 128), inf, dtype)], axis=1),
                    mw)
                d_ring[w] = jnp.where(
                    stepped,
                    jnp.concatenate(
                        [dw[:, 128:],
                         jnp.full((B_BLK, 128), inf, dtype)], axis=1),
                    dw)

        j32 = col32 + w_r + sig_now_col  # (B, Wb) global offsets

        slot0 = pred_slots_ref[r * P]
        delta0 = jnp.clip(w_r - pred_wstart_ref[r * P], -MARGIN, MARGIN)
        start0 = pl.multiple_of(MARGIN + delta0, 128)
        min_pm = m_ring[slot0, :, pl.ds(start0, Wb)]
        min_pd = d_ring[slot0, :, pl.ds(start0, Wb)]
        for p in range(1, P):
            slot = pred_slots_ref[r * P + p]
            valid = pred_valid_ref[r * P + p]
            w_p = pred_wstart_ref[r * P + p]
            delta = jnp.clip(w_r - w_p, -MARGIN, MARGIN)
            start = pl.multiple_of(MARGIN + delta, 128)
            am = m_ring[slot, :, pl.ds(start, Wb)]
            ad = d_ring[slot, :, pl.ds(start, Wb)]
            keep = valid == 1
            min_pm = jnp.minimum(min_pm, jnp.where(keep, am, inf))
            min_pd = jnp.minimum(min_pd, jnp.where(keep, ad, inf))

        D = jnp.minimum(min_pm + dtype(o + e), min_pd + dtype(e))

        diag_src = _roll_lanes(min_pm, 1)
        diag_src = jnp.where(masks[1], diag_src, dtype(inf))
        qstart = pl.multiple_of(w_r + MQ, 128)
        qwin = q_cur[:, pl.ds(qstart, Wb)]
        match_cost = jnp.where(qwin == sym, jnp.int32(-e),
                               jnp.int32(x - e)).astype(dtype)
        diag = diag_src + match_cost

        A = jnp.minimum(diag, D)
        zero_at_origin = jnp.where(j32 == 0, jnp.int32(0),
                                   jnp.int32(inf)).astype(dtype)
        A = jnp.where(r == 0, jnp.minimum(A, zero_at_origin), A)

        pref = _prefix_min_rows(A, Wb, dtype(inf), col32, masks,
                                max_shift=max_run)
        pref_m1 = _roll_lanes(pref, 1)
        pref_m1 = jnp.where(masks[1], pref_m1, dtype(inf))
        I = jnp.minimum(pref_m1 + dtype(o), dtype(inf))

        M = jnp.minimum(A, I)
        is_end = r == end_rank
        M = jnp.where(is_end, min_pm, M)

        @pl.when(is_end)
        def _():
            end_row_ref[:] = min_pm

        slot = wslot_ref[r]
        m_ring[slot, :, MARGIN:MARGIN + Wb] = M
        d_ring[slot, :, MARGIN:MARGIN + Wb] = jnp.where(
            is_end, dtype(inf), jnp.minimum(D, dtype(inf)))
        return 0

    jax.lax.fori_loop(0, n_nodes, body, 0)


@functools.lru_cache(maxsize=None)
def _banded_exec_drift(nblocks: int, W: int, P: int, Wb: int, MARGIN: int,
                       MQ: int, S: int, L: int, o: int, e: int, x: int,
                       B_BLK: int = 64, use_int16: bool = False,
                       max_run: int = 0):
    dtype = jnp.int16 if use_int16 else jnp.int32
    kernel = functools.partial(_banded_kernel_drift, W=W, P=P, Wb=Wb,
                               MARGIN=MARGIN, MQ=MQ, S=S, o=o, e=e, x=x,
                               B_BLK=B_BLK, dtype=dtype, max_run=max_run)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((B_BLK, MQ + L), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_BLK, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (B_BLK, Wb), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((W, B_BLK, 2 * MARGIN + Wb), dtype),
            pltpu.VMEM((W, B_BLK, 2 * MARGIN + Wb), dtype),
            pltpu.VMEM((B_BLK, MQ + L), jnp.int32),
        ],
    )

    call = _pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nblocks * B_BLK, Wb), dtype),
        grid_spec=grid_spec,
    )

    @jax.jit
    def fn(symbols, pred_slots, pred_valid, pred_wstarts, wstarts, wslots,
           s_ranks, s_prev, meta, qpad, lengths, n_min_s, w_end):
        lengths_i = lengths.astype(jnp.int32)
        nbs = jnp.maximum(lengths_i - n_min_s + 64, 0) // 128
        nbs2d = jnp.broadcast_to(nbs[:, None], (nbs.shape[0], 128))
        end_row = call(symbols, pred_slots, pred_valid, pred_wstarts,
                       wstarts, wslots, s_ranks, s_prev, meta, qpad,
                       nbs2d.astype(jnp.int32))
        idx_loc = lengths_i - w_end - 128 * nbs
        in_range = jnp.logical_and(idx_loc >= 0, idx_loc < Wb)
        idx_c = jnp.clip(idx_loc, 0, Wb - 1)[:, None]
        at = jnp.take_along_axis(end_row, idx_c, axis=1)[:, 0].astype(jnp.int32)
        # un-tilt (+e*j at j=length); eroded-INF lanes map back to INF
        thresh = (INF16 if use_int16 else INF) // 2
        at = jnp.where(at >= thresh, jnp.int32(INF), at + e * lengths_i)
        return jnp.where(in_range, at, jnp.int32(INF))

    return fn


def prepare_banded_drift(dg, costs, wstarts_np, width: int, s_ranks_np,
                         S: int, L: int):
    """Drift-variant of :func:`prepare_banded`: adds the step schedule and
    the query's static left pad MQ (covers negative frame starts)."""
    import numpy as np

    Np = dg.n_nodes_padded
    ws = np.zeros(Np, dtype=np.int32)
    ws[: wstarts_np.shape[0]] = wstarts_np
    pw = np.take(ws, dg.pred_ranks_np, axis=0).astype(np.int32)
    sr = np.zeros(Np, dtype=np.int32)
    sr[: s_ranks_np.shape[0]] = s_ranks_np
    sp = np.zeros(Np, dtype=np.int32)
    sp[1: s_ranks_np.shape[0]] = s_ranks_np[:-1]
    sp[s_ranks_np.shape[0]:] = 0

    n = min(wstarts_np.shape[0], dg.pred_ranks_np.shape[0])
    pr = dg.pred_ranks_np[:n]
    valid = dg.pred_valid_np[:n]
    deltas = [0]
    for i in range(pr.shape[1]):
        d = np.abs(ws[:n] - ws[pr[:, i]])
        deltas.append(int(np.where(valid[:, i], d, 0).max()) if n else 0)
    margin = ((max(deltas) + 127) // 128) * 128
    margin = max(margin, 128)
    mq = ((max(0, -int(wstarts_np.min())) + 127) // 128) * 128

    return {
        "margin": margin,
        "width": width,
        "mq": mq,
        "S": S,
        "L": L,
        "pred_wstarts": jnp.asarray(pw.reshape(-1)),
        "wstarts": jnp.asarray(ws),
        "s_ranks": jnp.asarray(sr),
        "s_prev": jnp.asarray(sp),
        "w_end": jnp.asarray(int(ws[dg.end_rank_i]), dtype=jnp.int32),
    }


def pallas_banded_scores_drift(dg, qpad, lengths, costs, prep, n_min: int,
                               max_run: int = 0):
    """Drifting-window banded scores via the Pallas kernel.

    ``qpad`` must carry ``prep['mq']`` zero lanes on the left (and enough
    on the right for every window); see BandedScorer._fill_once_drift.
    """
    _check_prefetch_fits(dg, 4)
    B, LQ = qpad.shape
    assert B % B_BLK == 0
    P = int(dg.pred_slots.shape[1])
    Np = dg.n_nodes_padded
    margin, width, mq, S = (prep["margin"], prep["width"], prep["mq"],
                            prep["S"])
    L = LQ - mq

    dtype = score_dtype(Np, LQ, costs.gap_open, costs.gap_extend,
                        costs.mismatch)
    use_int16 = dtype == jnp.int16
    blk = pick_b_blk(dg.window, 2 * margin + width, LQ,
                     2 if use_int16 else 4)
    while B % blk:
        blk //= 2
    fn = _banded_exec_drift(B // blk, dg.window, P, width, margin, mq, S, L,
                            costs.gap_open, costs.gap_extend, costs.mismatch,
                            B_BLK=blk, use_int16=use_int16, max_run=max_run)
    return fn(dg.symbols, dg.pred_slots_flat, dg.pred_valid_flat,
              prep["pred_wstarts"], prep["wstarts"], dg.write_slots,
              prep["s_ranks"], prep["s_prev"], dg.meta, qpad, lengths,
              jnp.asarray(n_min, dtype=jnp.int32), prep["w_end"])


def _banded_kernel_drift_ef(
    # scalar prefetch
    symbols_ref,      # (Np,)
    pred_slots_ref,   # (Np*P,) ring slots
    pred_valid_ref,   # (Np*P,)
    pred_wstart_ref,  # (Np*P,)
    wstart_ref,       # (Np,) shared FRAME window start (may be negative)
    wslot_ref,        # (Np,)
    s_ref,            # (Np,) cumulative drift-step count per rank
    s_prev_ref,       # (Np,)
    end_ok_ref,       # (Np,) int32 0/1 — graph-end bound per rank
    meta_ref,         # (4,)
    # inputs
    qshift_ref,       # (B_BLK, MQ+L) VMEM
    nbs_ref,          # (B_BLK, 128) VMEM — per-read drift units
    jlo_ref,          # (B_BLK, 128) VMEM — query-end window low bound
    len_ref,          # (B_BLK, 128) VMEM — query lengths
    # outputs
    best_ref,         # (B_BLK, Wb) VMEM — running windowed min (lanes
    #                   lose positional meaning; caller min-reduces)
    # scratch
    m_ring, d_ring,   # (W, B_BLK, 2*MARGIN + Wb)
    q_cur,            # (B_BLK, MQ+L)
    *, W: int, P: int, Wb: int, MARGIN: int, MQ: int, S: int, o: int,
    e: int, x: int, B_BLK: int, dtype, max_run: int = 0,
):
    """Drifting-window banded fill for *bounded* ends-free spans.

    Frame mechanics of :func:`_banded_kernel_drift` plus the bounded-span
    end rules of :func:`_banded_kernel_ef`.  Because each read's global
    offset ``j = w_r + jloc + sigma_b(r)`` is read-dependent, the
    permitted end window ``[jlo_b, n_b]`` folds into the scan as an
    elementwise running min over a (B_BLK, Wb) best tile — no per-rank
    lane reduction (measured to stall the pipeline) and no (B, L) best
    row (the frame roll would discard still-valid lanes).  Free graph
    begin is unsupported by design: those corridors are corner-anchored
    and drift cannot narrow them (scripts/drift_endsfree_probe.py).
    """
    n_nodes = meta_ref[0]
    end_rank = meta_ref[1]
    TOT = 2 * MARGIN + Wb
    inf = INF16 if dtype == jnp.int16 else INF

    for w in range(W):
        m_ring[w] = jnp.full((B_BLK, TOT), inf, dtype=dtype)
        d_ring[w] = jnp.full((B_BLK, TOT), inf, dtype=dtype)
    q_cur[:] = qshift_ref[:]
    best_ref[:] = jnp.full((B_BLK, Wb), inf, dtype=dtype)

    col32 = jax.lax.broadcasted_iota(jnp.int32, (B_BLK, Wb), dimension=1)
    masks = _ge_masks(col32, Wb)
    nbs_col = nbs_ref[:][:, :1]  # (B_BLK, 1) int32
    jlo_col = jlo_ref[:][:, :1]
    len_col = len_ref[:][:, :1]

    def body(r, _):
        sym = symbols_ref[r]
        w_r = wstart_ref[r]
        s_r = s_ref[r]
        s_p = s_prev_ref[r]
        sig_now_col = ((nbs_col * s_r) // S) * 128  # (B, 1)
        sig_prev_col = ((nbs_col * s_p) // S) * 128

        @pl.when(s_r > s_p)
        def _():
            stepped = sig_now_col > sig_prev_col  # (B, 1)
            qroll = jnp.concatenate(
                [q_cur[:, 128:],
                 jnp.zeros((B_BLK, 128), q_cur.dtype)], axis=1)
            q_cur[:] = jnp.where(stepped, qroll, q_cur[:])
            for w in range(W):
                mw = m_ring[w]
                dw = d_ring[w]
                m_ring[w] = jnp.where(
                    stepped,
                    jnp.concatenate(
                        [mw[:, 128:],
                         jnp.full((B_BLK, 128), inf, dtype)], axis=1),
                    mw)
                d_ring[w] = jnp.where(
                    stepped,
                    jnp.concatenate(
                        [dw[:, 128:],
                         jnp.full((B_BLK, 128), inf, dtype)], axis=1),
                    dw)

        j32 = col32 + w_r + sig_now_col  # (B, Wb) global offsets

        slot0 = pred_slots_ref[r * P]
        delta0 = jnp.clip(w_r - pred_wstart_ref[r * P], -MARGIN, MARGIN)
        start0 = pl.multiple_of(MARGIN + delta0, 128)
        min_pm = m_ring[slot0, :, pl.ds(start0, Wb)]
        min_pd = d_ring[slot0, :, pl.ds(start0, Wb)]
        for p in range(1, P):
            slot = pred_slots_ref[r * P + p]
            valid = pred_valid_ref[r * P + p]
            w_p = pred_wstart_ref[r * P + p]
            delta = jnp.clip(w_r - w_p, -MARGIN, MARGIN)
            start = pl.multiple_of(MARGIN + delta, 128)
            am = m_ring[slot, :, pl.ds(start, Wb)]
            ad = d_ring[slot, :, pl.ds(start, Wb)]
            keep = valid == 1
            min_pm = jnp.minimum(min_pm, jnp.where(keep, am, inf))
            min_pd = jnp.minimum(min_pd, jnp.where(keep, ad, inf))

        D = jnp.minimum(min_pm + dtype(o + e), min_pd + dtype(e))

        diag_src = _roll_lanes(min_pm, 1)
        diag_src = jnp.where(masks[1], diag_src, dtype(inf))
        qstart = pl.multiple_of(w_r + MQ, 128)
        qwin = q_cur[:, pl.ds(qstart, Wb)]
        match_cost = jnp.where(qwin == sym, jnp.int32(-e),
                               jnp.int32(x - e)).astype(dtype)
        diag = diag_src + match_cost

        A = jnp.minimum(diag, D)
        # bounded graph begin degenerates to the start node (reference
        # initial_states, gap_affine.rs:150-168): global origin only
        zero_at_origin = jnp.where(j32 == 0, jnp.int32(0),
                                   jnp.int32(inf)).astype(dtype)
        A = jnp.where(r == 0, jnp.minimum(A, zero_at_origin), A)

        pref = _prefix_min_rows(A, Wb, dtype(inf), col32, masks,
                                max_shift=max_run)
        pref_m1 = _roll_lanes(pref, 1)
        pref_m1 = jnp.where(masks[1], pref_m1, dtype(inf))
        I = jnp.minimum(pref_m1 + dtype(o), dtype(inf))

        M = jnp.minimum(A, I)
        is_end = r == end_rank
        M = jnp.where(is_end, min_pm, M)

        @pl.when(end_ok_ref[r] == 1)
        def _():
            # un-tilt before accumulating: best-tile lanes have no fixed
            # global j, so the -e*j tilt cannot be deferred to the caller
            allowed = jnp.logical_and(j32 >= jlo_col, j32 <= len_col)
            M_untilted = M + (e * j32).astype(dtype)
            best_ref[:] = jnp.minimum(
                best_ref[:], jnp.where(allowed, M_untilted, dtype(inf)))

        slot = wslot_ref[r]
        m_ring[slot, :, MARGIN:MARGIN + Wb] = M
        d_ring[slot, :, MARGIN:MARGIN + Wb] = jnp.where(
            is_end, dtype(inf), jnp.minimum(D, dtype(inf)))
        return 0

    jax.lax.fori_loop(0, n_nodes, body, 0)


@functools.lru_cache(maxsize=None)
def _banded_exec_drift_ef(nblocks: int, W: int, P: int, Wb: int,
                          MARGIN: int, MQ: int, S: int, L: int, o: int,
                          e: int, x: int, B_BLK: int = 64,
                          use_int16: bool = False, max_run: int = 0):
    dtype = jnp.int16 if use_int16 else jnp.int32
    kernel = functools.partial(_banded_kernel_drift_ef, W=W, P=P, Wb=Wb,
                               MARGIN=MARGIN, MQ=MQ, S=S, o=o, e=e, x=x,
                               B_BLK=B_BLK, dtype=dtype, max_run=max_run)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=10,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((B_BLK, MQ + L), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_BLK, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_BLK, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_BLK, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (B_BLK, Wb), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((W, B_BLK, 2 * MARGIN + Wb), dtype),
            pltpu.VMEM((W, B_BLK, 2 * MARGIN + Wb), dtype),
            pltpu.VMEM((B_BLK, MQ + L), jnp.int32),
        ],
    )

    call = _pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nblocks * B_BLK, Wb), dtype),
        grid_spec=grid_spec,
    )

    @jax.jit
    def fn(symbols, pred_slots, pred_valid, pred_wstarts, wstarts, wslots,
           s_ranks, s_prev, end_ok, meta, qpad, lengths, jlo, n_min_s):
        lengths_i = lengths.astype(jnp.int32)
        nbs = jnp.maximum(lengths_i - n_min_s + 64, 0) // 128

        def tile(v):
            return jnp.broadcast_to(
                v[:, None], (v.shape[0], 128)).astype(jnp.int32)

        best = call(symbols, pred_slots, pred_valid, pred_wstarts,
                    wstarts, wslots, s_ranks, s_prev, end_ok, meta, qpad,
                    tile(nbs), tile(jlo.astype(jnp.int32)),
                    tile(lengths_i)).astype(jnp.int32)
        out = jnp.min(best, axis=1)
        # the kernel un-tilts at accumulation; eroded-INF values map back
        thresh = (INF16 if use_int16 else INF) // 2
        return jnp.where(out >= thresh, jnp.int32(INF), out)

    return fn


def pallas_banded_scores_drift_ef(dg, qpad, lengths, costs, prep,
                                  n_min: int, end_ok, jlo,
                                  max_run: int = 0):
    """Drifting-window banded scores for bounded ends-free spans via the
    Pallas kernel.  ``qpad`` as in :func:`pallas_banded_scores_drift`;
    ``end_ok``/``jlo`` from ``ends_free_device_params``."""
    _check_prefetch_fits(dg, 5)
    B, LQ = qpad.shape
    assert B % B_BLK == 0
    P = int(dg.pred_slots.shape[1])
    Np = dg.n_nodes_padded
    margin, width, mq, S = (prep["margin"], prep["width"], prep["mq"],
                            prep["S"])
    L = LQ - mq

    dtype = score_dtype(Np, LQ, costs.gap_open, costs.gap_extend,
                        costs.mismatch)
    use_int16 = dtype == jnp.int16
    blk = pick_b_blk(dg.window, 2 * margin + width, LQ,
                     2 if use_int16 else 4)
    while B % blk:
        blk //= 2
    fn = _banded_exec_drift_ef(B // blk, dg.window, P, width, margin, mq,
                               S, L, costs.gap_open, costs.gap_extend,
                               costs.mismatch, B_BLK=blk,
                               use_int16=use_int16, max_run=max_run)
    return fn(dg.symbols, dg.pred_slots_flat, dg.pred_valid_flat,
              prep["pred_wstarts"], prep["wstarts"], dg.write_slots,
              prep["s_ranks"], prep["s_prev"], end_ok, dg.meta, qpad,
              lengths, jlo, jnp.asarray(n_min, dtype=jnp.int32))


def _banded_kernel_drift_2p(
    # scalar prefetch
    symbols_ref, pred_slots_ref, pred_valid_ref, pred_wstart_ref,
    wstart_ref, wslot_ref, s_ref, s_prev_ref, meta_ref,
    # inputs
    qshift_ref,       # (B_BLK, MQ+L) VMEM
    nbs_ref,          # (B_BLK, 128) VMEM
    # outputs
    end_row_ref,      # (B_BLK, Wb) VMEM
    # scratch
    m_ring, d1_ring, d2_ring, q_cur,
    *, W: int, P: int, Wb: int, MARGIN: int, MQ: int, S: int, o1: int,
    e1: int, e2: int, x: int, B_BLK: int, dtype, max_run: int = 0,
):
    """Two-piece drifting-window banded fill (Pallas twin of
    :func:`poasta_tpu.aligner.banded._banded_exec_drift_2p`)."""
    n_nodes = meta_ref[0]
    end_rank = meta_ref[1]
    TOT = 2 * MARGIN + Wb
    inf = INF16 if dtype == jnp.int16 else INF

    for w in range(W):
        m_ring[w] = jnp.full((B_BLK, TOT), inf, dtype=dtype)
        d1_ring[w] = jnp.full((B_BLK, TOT), inf, dtype=dtype)
        d2_ring[w] = jnp.full((B_BLK, TOT), inf, dtype=dtype)
    q_cur[:] = qshift_ref[:]

    col32 = jax.lax.broadcasted_iota(jnp.int32, (B_BLK, Wb), dimension=1)
    masks = _ge_masks(col32, Wb)
    nbs_col = nbs_ref[:][:, :1]

    def body(r, _):
        sym = symbols_ref[r]
        w_r = wstart_ref[r]
        s_r = s_ref[r]
        s_p = s_prev_ref[r]
        sig_now_col = ((nbs_col * s_r) // S) * 128
        sig_prev_col = ((nbs_col * s_p) // S) * 128

        @pl.when(s_r > s_p)
        def _():
            stepped = sig_now_col > sig_prev_col
            qroll = jnp.concatenate(
                [q_cur[:, 128:],
                 jnp.zeros((B_BLK, 128), q_cur.dtype)], axis=1)
            q_cur[:] = jnp.where(stepped, qroll, q_cur[:])
            for ring in (m_ring, d1_ring, d2_ring):
                for w in range(W):
                    rw = ring[w]
                    ring[w] = jnp.where(
                        stepped,
                        jnp.concatenate(
                            [rw[:, 128:],
                             jnp.full((B_BLK, 128), inf, dtype)], axis=1),
                        rw)

        j32 = col32 + w_r + sig_now_col

        def pred_window(ring, p):
            slot = pred_slots_ref[r * P + p]
            w_p = pred_wstart_ref[r * P + p]
            delta = jnp.clip(w_r - w_p, -MARGIN, MARGIN)
            start = pl.multiple_of(MARGIN + delta, 128)
            return ring[slot, :, pl.ds(start, Wb)]

        min_pm = pred_window(m_ring, 0)
        min_pd1 = pred_window(d1_ring, 0)
        min_pd2 = pred_window(d2_ring, 0)
        for p in range(1, P):
            valid = pred_valid_ref[r * P + p]
            keep = valid == 1
            min_pm = jnp.minimum(min_pm,
                                 jnp.where(keep, pred_window(m_ring, p),
                                           inf))
            min_pd1 = jnp.minimum(min_pd1,
                                  jnp.where(keep, pred_window(d1_ring, p),
                                            inf))
            min_pd2 = jnp.minimum(min_pd2,
                                  jnp.where(keep, pred_window(d2_ring, p),
                                            inf))

        D1 = jnp.minimum(jnp.minimum(min_pm + dtype(o1 + e1),
                                     min_pd1 + dtype(e1)), dtype(inf))
        D2 = jnp.minimum(jnp.minimum(min_pd1, min_pd2) + dtype(e2),
                         dtype(inf))

        diag_src = _roll_lanes(min_pm, 1)
        diag_src = jnp.where(masks[1], diag_src, dtype(inf))
        qstart = pl.multiple_of(w_r + MQ, 128)
        qwin = q_cur[:, pl.ds(qstart, Wb)]
        match_cost = jnp.where(qwin == sym, jnp.int32(0),
                               jnp.int32(x)).astype(dtype)
        diag = diag_src + match_cost

        A = jnp.minimum(diag, jnp.minimum(D1, D2))
        zero_at_origin = jnp.where(j32 == 0, jnp.int32(0),
                                   jnp.int32(inf)).astype(dtype)
        A = jnp.where(r == 0, jnp.minimum(A, zero_at_origin), A)

        I1, I2 = _coupled_insertion_rows(A, Wb, inf, masks, o1, e1, e2,
                                         dtype, max_shift=max_run)
        M = jnp.minimum(A, jnp.minimum(I1, I2))
        is_end = r == end_rank
        M = jnp.where(is_end, min_pm, M)

        @pl.when(is_end)
        def _():
            end_row_ref[:] = min_pm

        slot = wslot_ref[r]
        m_ring[slot, :, MARGIN:MARGIN + Wb] = M
        d1_ring[slot, :, MARGIN:MARGIN + Wb] = jnp.where(
            is_end, dtype(inf), D1)
        d2_ring[slot, :, MARGIN:MARGIN + Wb] = jnp.where(
            is_end, dtype(inf), D2)
        return 0

    jax.lax.fori_loop(0, n_nodes, body, 0)


@functools.lru_cache(maxsize=None)
def _banded_exec_drift_2p(nblocks: int, W: int, P: int, Wb: int,
                          MARGIN: int, MQ: int, S: int, L: int, o1: int,
                          e1: int, e2: int, x: int, B_BLK: int = 64,
                          max_run: int = 0):
    dtype = jnp.int32
    kernel = functools.partial(_banded_kernel_drift_2p, W=W, P=P, Wb=Wb,
                               MARGIN=MARGIN, MQ=MQ, S=S, o1=o1, e1=e1,
                               e2=e2, x=x, B_BLK=B_BLK, dtype=dtype,
                               max_run=max_run)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((B_BLK, MQ + L), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_BLK, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (B_BLK, Wb), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((W, B_BLK, 2 * MARGIN + Wb), dtype),
            pltpu.VMEM((W, B_BLK, 2 * MARGIN + Wb), dtype),
            pltpu.VMEM((W, B_BLK, 2 * MARGIN + Wb), dtype),
            pltpu.VMEM((B_BLK, MQ + L), jnp.int32),
        ],
    )
    call = _pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nblocks * B_BLK, Wb), dtype),
        grid_spec=grid_spec,
    )

    @jax.jit
    def fn(symbols, pred_slots, pred_valid, pred_wstarts, wstarts, wslots,
           s_ranks, s_prev, meta, qpad, lengths, n_min_s, w_end):
        lengths_i = lengths.astype(jnp.int32)
        nbs = jnp.maximum(lengths_i - n_min_s + 64, 0) // 128
        nbs2d = jnp.broadcast_to(nbs[:, None], (nbs.shape[0], 128))
        end_row = call(symbols, pred_slots, pred_valid, pred_wstarts,
                       wstarts, wslots, s_ranks, s_prev, meta, qpad,
                       nbs2d.astype(jnp.int32))
        idx_loc = lengths_i - w_end - 128 * nbs
        in_range = jnp.logical_and(idx_loc >= 0, idx_loc < Wb)
        idx_c = jnp.clip(idx_loc, 0, Wb - 1)[:, None]
        at = jnp.take_along_axis(end_row, idx_c,
                                 axis=1)[:, 0].astype(jnp.int32)
        return jnp.where(in_range, at, jnp.int32(INF))

    return fn


def pallas_banded_scores_drift_2p(dg, qpad, lengths, costs, prep,
                                  n_min: int, max_run: int = 0):
    """Two-piece drifting-window banded scores via the Pallas kernel."""
    _check_prefetch_fits(dg, 4)
    B, LQ = qpad.shape
    assert B % B_BLK == 0
    P = int(dg.pred_slots.shape[1])
    margin, width, mq, S = (prep["margin"], prep["width"], prep["mq"],
                            prep["S"])
    L = LQ - mq
    blk = pick_b_blk(dg.window, 2 * margin + width, LQ, 4, n_rings=3)
    while B % blk:
        blk //= 2
    fn = _banded_exec_drift_2p(B // blk, dg.window, P, width, margin, mq,
                               S, L, costs.gap_open, costs.gap_extend,
                               costs.gap_extend2, costs.mismatch,
                               B_BLK=blk, max_run=max_run)
    return fn(dg.symbols, dg.pred_slots_flat, dg.pred_valid_flat,
              prep["pred_wstarts"], prep["wstarts"], dg.write_slots,
              prep["s_ranks"], prep["s_prev"], dg.meta, qpad, lengths,
              jnp.asarray(n_min, dtype=jnp.int32), prep["w_end"])


def _banded_kernel_2p(
    # scalar prefetch
    symbols_ref, pred_slots_ref, pred_valid_ref, pred_wstart_ref,
    wstart_ref, wslot_ref, meta_ref,
    # inputs
    qshift_ref,       # (B_BLK, L) VMEM
    # outputs
    end_row_ref,      # (B_BLK, Wb) VMEM
    # scratch: three margin-padded rings (M, D1, D2)
    m_ring, d1_ring, d2_ring,
    *, W: int, P: int, Wb: int, MARGIN: int, o1: int, e1: int, e2: int,
    x: int, B_BLK: int, dtype, max_run: int = 0,
):
    """Two-piece banded fill.  The coupled (I1, I2) doubling scan's maps
    carry no absolute-offset term, so it runs on the local window
    directly; chains truncate at the window's left edge (exact in-band).
    """
    n_nodes = meta_ref[0]
    end_rank = meta_ref[1]
    TOT = 2 * MARGIN + Wb
    inf = INF16 if dtype == jnp.int16 else INF

    for w in range(W):
        m_ring[w] = jnp.full((B_BLK, TOT), inf, dtype=dtype)
        d1_ring[w] = jnp.full((B_BLK, TOT), inf, dtype=dtype)
        d2_ring[w] = jnp.full((B_BLK, TOT), inf, dtype=dtype)

    col32 = jax.lax.broadcasted_iota(jnp.int32, (B_BLK, Wb), dimension=1)
    masks = _ge_masks(col32, Wb)

    def body(r, _):
        sym = symbols_ref[r]
        w_r = wstart_ref[r]
        j32 = col32 + w_r

        slot0 = pred_slots_ref[r * P]
        delta0 = jnp.clip(w_r - pred_wstart_ref[r * P], -MARGIN, MARGIN)
        start0 = pl.multiple_of(MARGIN + delta0, 128)
        min_pm = m_ring[slot0, :, pl.ds(start0, Wb)]
        min_pd1 = d1_ring[slot0, :, pl.ds(start0, Wb)]
        min_pd2 = d2_ring[slot0, :, pl.ds(start0, Wb)]
        for p in range(1, P):
            slot = pred_slots_ref[r * P + p]
            valid = pred_valid_ref[r * P + p]
            w_p = pred_wstart_ref[r * P + p]
            delta = jnp.clip(w_r - w_p, -MARGIN, MARGIN)
            start = pl.multiple_of(MARGIN + delta, 128)
            keep = valid == 1
            min_pm = jnp.minimum(
                min_pm, jnp.where(keep, m_ring[slot, :, pl.ds(start, Wb)], inf))
            min_pd1 = jnp.minimum(
                min_pd1, jnp.where(keep, d1_ring[slot, :, pl.ds(start, Wb)], inf))
            min_pd2 = jnp.minimum(
                min_pd2, jnp.where(keep, d2_ring[slot, :, pl.ds(start, Wb)], inf))

        D1 = jnp.minimum(jnp.minimum(min_pm + dtype(o1 + e1),
                                     min_pd1 + dtype(e1)), dtype(inf))
        D2 = jnp.minimum(jnp.minimum(min_pd1, min_pd2) + dtype(e2), dtype(inf))

        diag_src = _roll_lanes(min_pm, 1)
        diag_src = jnp.where(masks[1], diag_src, dtype(inf))
        qstart = pl.multiple_of(w_r, 128)
        qwin = qshift_ref[:, pl.ds(qstart, Wb)]
        match_cost = jnp.where(qwin == sym, jnp.int32(0),
                               jnp.int32(x)).astype(dtype)
        diag = diag_src + match_cost

        A = jnp.minimum(diag, jnp.minimum(D1, D2))
        zero_at_origin = jnp.where(j32 == 0, jnp.int32(0),
                                   jnp.int32(inf)).astype(dtype)
        A = jnp.where(r == 0, jnp.minimum(A, zero_at_origin), A)

        I1, I2 = _coupled_insertion_rows(A, Wb, inf, masks, o1, e1,
                                         e2, dtype, max_shift=max_run)
        M = jnp.minimum(A, jnp.minimum(I1, I2))

        is_end = r == end_rank
        M = jnp.where(is_end, min_pm, M)

        @pl.when(is_end)
        def _():
            end_row_ref[:] = min_pm

        slot = wslot_ref[r]
        m_ring[slot, :, MARGIN:MARGIN + Wb] = M
        d1_ring[slot, :, MARGIN:MARGIN + Wb] = jnp.where(
            is_end, dtype(inf), D1)
        d2_ring[slot, :, MARGIN:MARGIN + Wb] = jnp.where(
            is_end, dtype(inf), D2)
        return 0

    jax.lax.fori_loop(0, n_nodes, body, 0)


@functools.lru_cache(maxsize=None)
def _banded_exec_2p(nblocks: int, W: int, P: int, Wb: int, MARGIN: int,
                    L: int, o1: int, e1: int, e2: int, x: int,
                    B_BLK: int = 64, max_run: int = 0):
    dtype = jnp.int32
    kernel = functools.partial(_banded_kernel_2p, W=W, P=P, Wb=Wb,
                               MARGIN=MARGIN, o1=o1, e1=e1, e2=e2, x=x,
                               B_BLK=B_BLK, dtype=dtype, max_run=max_run)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((B_BLK, L), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (B_BLK, Wb), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((W, B_BLK, 2 * MARGIN + Wb), dtype),
            pltpu.VMEM((W, B_BLK, 2 * MARGIN + Wb), dtype),
            pltpu.VMEM((W, B_BLK, 2 * MARGIN + Wb), dtype),
        ],
    )

    call = _pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nblocks * B_BLK, Wb), dtype),
        grid_spec=grid_spec,
    )

    @jax.jit
    def fn(symbols, pred_slots, pred_valid, pred_wstarts, wstarts, wslots,
           meta, qshift, lengths, w_end):
        end_row = call(symbols, pred_slots, pred_valid, pred_wstarts,
                       wstarts, wslots, meta, qshift)
        idx_loc = lengths.astype(jnp.int32) - w_end
        in_range = jnp.logical_and(idx_loc >= 0, idx_loc < Wb)
        idx_c = jnp.clip(idx_loc, 0, Wb - 1)[:, None]
        at = jnp.take_along_axis(end_row, idx_c, axis=1)[:, 0].astype(jnp.int32)
        return jnp.where(in_range, at, jnp.int32(INF))

    return fn


def pallas_banded_scores_2p(dg, qshift, lengths, costs, prep,
                            max_run: int = 0):
    """Two-piece banded global-alignment scores via the Pallas kernel."""
    _check_prefetch_fits(dg, 2)
    B, L = qshift.shape
    assert B % B_BLK == 0
    P = int(dg.pred_slots.shape[1])
    margin, width = prep["margin"], prep["width"]
    blk = pick_b_blk(dg.window, 2 * margin + width, L, 4, n_rings=3)
    while B % blk:
        blk //= 2
    fn = _banded_exec_2p(B // blk, dg.window, P, width, margin, L,
                         costs.gap_open, costs.gap_extend, costs.gap_extend2,
                         costs.mismatch, B_BLK=blk, max_run=max_run)
    return fn(dg.symbols, dg.pred_slots_flat, dg.pred_valid_flat,
              prep["pred_wstarts"], prep["wstarts"], dg.write_slots,
              dg.meta, qshift, lengths, prep["w_end"])


def pallas_fill_scores(dg, qshift, lengths, costs, free_start: bool = False,
                       free_end: bool = False):
    """(B,) alignment scores via the Pallas kernel (global by default;
    ``free_start``/``free_end`` give the semi-global variants).

    Requires B to be a multiple of B_BLK (callers pad batches).
    """
    _check_prefetch_fits(dg, 0)
    B, L = qshift.shape
    dtype = score_dtype(dg.n_nodes_padded, L, costs.gap_open,
                        costs.gap_extend, costs.mismatch)
    use_int16 = dtype == jnp.int16
    n_rings = 3 if free_end else 2  # best-row scratch counts as ring VMEM
    blk = pick_b_blk(dg.window, L, L, 2 if use_int16 else 4, n_rings=n_rings)
    blk = min(blk, B) if B % 64 == 0 else blk
    while B % blk:
        blk //= 2
    assert blk >= 32 and B % blk == 0, f"batch {B} must divide into kernel blocks"
    P = int(dg.pred_slots.shape[1])
    fn = _pallas_exec(B // blk, dg.window, P, L,
                      costs.gap_open, costs.gap_extend, costs.mismatch,
                      B_BLK=blk, use_int16=use_int16,
                      free_start=free_start, free_end=free_end)
    # all graph-side args are prebuilt device arrays (DeviceGraph.build):
    # zero per-call host<->device transfers on the dispatch path.
    return fn(dg.symbols, dg.pred_slots_flat, dg.pred_valid_flat,
              dg.write_slots, dg.meta, qshift, lengths)
