"""Exact k-mer seeding for free-graph-begin (mapping) device fills.

The free-begin bounded fill pays ``n_ranks x L`` cells per read because
every rank can start an alignment — on a 50k-rank pangenome each 5 kb
read fills the *whole graph* even though it maps to one ~5 kb locus
(the round-3 long pole: the fill kernel is at its measured VPU roofline,
so the only lever left is filling fewer cells).  The reference has no
analogue — its A* explores near the best path by heuristic
(``/root/reference/src/aligner/astar.rs``); this module is the batch
equivalent: locate each read's locus first, then fill only a
score-certified corridor around it.

Exactness (the certificate the corridor fill rides on):

1. :class:`KmerIndex` enumerates EVERY k-length path in the graph
   (vectorized frontier expansion over the rank-space successor CSR,
   with a budget guard for pathologically bubbly graphs).  A k-mer hit
   for read b is a cell ``(r, j)``: query chars ``j-k+1..j`` equal the
   symbols of a graph path ending at rank r.
2. Any alignment of read b with cost <= ub has at most
   ``E = ub // min(mismatch, extend)`` edited characters (every
   mismatched / inserted / deleted char costs at least that), so its
   aligned span of length n' contains an exact run of
   ``>= (n' - E) / (E + 1)`` query chars matching a graph path.  When
   that bound is >= k, the alignment CONTAINS a k-mer hit.
3. Every cell ``(r', j')`` of such an alignment is bracketed around any
   of its hit cells ``(r, j)`` by the rank potentials (the
   :mod:`pallas_trace` schedule argument): consumed chars between two
   path ranks differ from the edge count by at most the gap budget
   ``K = ub // extend``, and the edge count between ranks r and r' is
   bracketed by ``min/max_dist_from_start`` differences.  Hence the
   whole alignment lies inside
   ``alpha_min + dmax[r'] - K  <=  j'  <=  beta_max + dmin[r'] + K``
   where ``alpha = j - dmax[r]``, ``beta = j - dmin[r]`` range over the
   read's hits.
4. The corridor fill (ops/pallas_seed.py) computes every in-corridor
   cell exactly (windows only *raise* DP values), so if its returned
   score verifies (``score <= ub``) it equals the full fill's score and
   carries the same optimal end state — any as-good-or-better end has
   cost <= ub, therefore lives inside the corridor and was compared.
   Reads that do not verify (score > ub, no hits, or corridor wider
   than the width budget) fall back to the full bounded fill; a read
   with NO hits and a satisfiable k-condition is *proven* to score
   > ub, so sending it to the fallback is exactness, not leniency.

Reference behavioral parity: the corridor path returns bit-identical
(score, end_rank, end_offset) to ``dp_fill_ends_free_with_ends``
(ties resolve to the largest offset, then the lowest rank — the
reference's end-state convention, ``gap_affine.rs:219-241``).
"""

from __future__ import annotations

import numpy as np

# byte -> 2-bit code; 255 marks non-ACGT (virtual '#'/'$' ranks, padding,
# ambiguity codes) — any k-window touching one never produces a hit
CODE = np.full(256, 255, dtype=np.uint8)
for _i, _ch in enumerate(b"ACGT"):
    CODE[_ch] = _i

SEED_K = 14  # 4^14 = 2.7e8 >> graph sizes: ~0 spurious hits, and the
#              k-condition still holds at mapping-grade divergence


class KmerIndex:
    """All k-length graph paths, as a sorted (kmer -> end-rank) table.

    ``ok`` is False when the graph is unsupported (non-ACGT symbols are
    fine — windows through them simply never match — but a path-count
    blowup past ``budget_factor * n_nodes`` aborts the build: seeding
    then stays disabled for this graph and callers use the full fill).
    """

    def __init__(self, flat, k: int = SEED_K, budget_factor: int = 64):
        self.k = k
        self.ok = False
        n = flat.n_nodes
        if n < k + 2:
            return
        codes = CODE[flat.symbols]
        real = np.nonzero(codes != 255)[0].astype(np.int64)
        if real.size == 0:
            return
        succ_ptr = flat.succ_ptr.astype(np.int64)
        succ_idx = flat.succ_idx.astype(np.int64)
        budget = budget_factor * n
        cur = real
        km = codes[cur].astype(np.int64)
        for _ in range(k - 1):
            cnt = succ_ptr[cur + 1] - succ_ptr[cur]
            total = int(cnt.sum())
            if total > budget:
                return  # bubbly blowup: leave ok=False
            rep = np.repeat(np.arange(cur.size, dtype=np.int64), cnt)
            off = (np.arange(total, dtype=np.int64)
                   - np.repeat(np.cumsum(cnt) - cnt, cnt))
            nxt = succ_idx[succ_ptr[cur][rep] + off]
            c2 = codes[nxt].astype(np.int64)
            keep = c2 != 255
            cur = nxt[keep]
            km = (km[rep][keep] << 2) | c2[keep]
            if cur.size == 0:
                return
        order = np.argsort(km, kind="stable")
        self.kmers = km[order]
        dmin = flat.min_dist_from_start.astype(np.int64)
        dmax = flat.max_dist_from_start.astype(np.int64)
        self.post_dmin = dmin[cur[order]]
        self.post_dmax = dmax[cur[order]]
        self.n_paths = int(cur.size)
        self.ok = True

    def seed_bounds(self, q_np: np.ndarray, lengths_np: np.ndarray,
                    max_hits: int = 8_000_000):
        """Per-read hit-diagonal bounds over ALL exact k-mer hits.

        ``q_np`` is the ``pack_queries`` layout (column j holds
        ``q[j-1]``; column 0 and padding are 0 -> code 255, so windows
        into padding never match).  Returns int64 arrays
        ``(alpha_min, beta_max, nhits)``; reads with ``nhits == 0`` have
        undefined bounds.  Returns None when the batch's total hit count
        exceeds ``max_hits`` (repeat blowup — caller falls back).
        """
        k = self.k
        B, L = q_np.shape
        codes = CODE[np.asarray(q_np, dtype=np.uint8)
                     if q_np.dtype == np.uint8
                     else np.clip(q_np, 0, 255).astype(np.uint8)]
        from numpy.lib.stride_tricks import sliding_window_view

        win = sliding_window_view(codes, k, axis=1)  # (B, L-k+1, k)
        good = ~(win == 255).any(axis=2)
        shifts = (2 * (k - 1 - np.arange(k))).astype(np.int64)
        qk = (win.astype(np.int64) << shifts).sum(axis=2)
        rid, s = np.nonzero(good)
        flat_q = qk[rid, s]
        j_end = (s + k - 1).astype(np.int64)  # consumed chars at the hit

        lo = np.searchsorted(self.kmers, flat_q, "left")
        hi = np.searchsorted(self.kmers, flat_q, "right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total > max_hits:
            return None
        rep = np.repeat(np.arange(flat_q.size, dtype=np.int64), cnt)
        off = (np.arange(total, dtype=np.int64)
               - np.repeat(np.cumsum(cnt) - cnt, cnt))
        pidx = lo[rep] + off
        alpha = j_end[rep] - self.post_dmax[pidx]
        beta = j_end[rep] - self.post_dmin[pidx]
        hit_rid = rid[rep]  # nondecreasing: rows scanned in order

        alpha_min = np.full(B, np.iinfo(np.int64).max, dtype=np.int64)
        beta_max = np.full(B, np.iinfo(np.int64).min, dtype=np.int64)
        nhits = np.zeros(B, dtype=np.int64)
        if total:
            # hit_rid is sorted; reduceat over read boundaries
            uniq, first = np.unique(hit_rid, return_index=True)
            alpha_min[uniq] = np.minimum.reduceat(alpha, first)
            beta_max[uniq] = np.maximum.reduceat(beta, first)
            np.add.at(nhits, rid, cnt)
        return alpha_min, beta_max, nhits


def k_condition_holds(n_aligned_min: int, ub: int, costs, k: int) -> bool:
    """Whether every cost<=ub alignment of >= ``n_aligned_min`` aligned
    query chars must contain an exact k-mer hit (step 2 above)."""
    c_min = min(costs.mismatch, costs.gap_extend)
    if c_min <= 0:
        return False
    E = ub // c_min
    return n_aligned_min - E >= k * (E + 1)
