"""Soak the native fills' int16 saturating-table gate.

The row-pass fills dispatch to int16 DP tables whenever ub (banded) or
the certified score (anchored) is <= 30000 (engine.cpp
``poasta_align_banded``/``poasta_align_anchored`` dispatchers).  These
tests hammer that path with randomized costs, graphs, and reads, and
pin scores AND alignment costs against the exact engine — saturated
cells may only behave like INF, never leak into results.
"""

import random

import pytest

from poasta_tpu.aligner import GapAffine, GapAffine2Piece
from poasta_tpu.graphs import POAGraph
from poasta_tpu.native import NativeAligner


def _mutate(rng, s, d):
    out = []
    for ch in s:
        r = rng.random()
        if r < d:
            continue
        out.append(rng.choice("ACGT") if r < 2.5 * d else ch)
        if rng.random() < d:
            out.append(rng.choice("ACGT"))
    return "".join(out) or "A"


def _alignment_cost(g, q, aln, costs):
    """alignment_cost + the leading-insertion convention: a query prefix
    aligned as a leading insertion run is not emitted as pairs (PARITY
    'Alignment-pair convention'); its cost is recovered from the first
    emitted qpos (run of L: open + extend, then L-1 of the cheaper
    extend under two-piece)."""
    from poasta_tpu.aligner.wavefront import alignment_cost

    cost = alignment_cost(g, q, aln, costs)
    lead = next((p.qpos for p in aln if p.qpos is not None), 0)
    if lead:
        e2 = getattr(costs, "gap_extend2", None)
        step = min(costs.gap_extend, e2) if e2 else costs.gap_extend
        cost += costs.gap_open + costs.gap_extend + (lead - 1) * step
    return cost


@pytest.mark.parametrize("seed", range(12))
def test_int16_banded_soak(seed):
    rng = random.Random(1000 + seed)
    x = rng.randrange(1, 9)
    e = rng.randrange(1, 5)
    o = rng.randrange(0, 12)
    costs = GapAffine(x, e, o)
    glen = rng.randrange(150, 500)
    base = "".join(rng.choice("ACGT") for _ in range(glen))
    g = POAGraph()
    g.add_alignment_with_weights("s0", base.encode(), None, [1] * glen)
    na = NativeAligner(g)
    s1 = _mutate(rng, base, 0.08).encode()
    _, aln1, _ = na.align(s1, costs)
    g.add_alignment_with_weights("s1", s1, aln1, [1] * len(s1))
    na = NativeAligner(g)
    for _ in range(4):
        div = rng.choice([0.01, 0.05, 0.15, 0.4])
        q = _mutate(rng, base, div).encode()
        s_exact, _, _ = na.align(q, costs)
        # cold ladder (ub guess), seeded, and a deliberately tiny ub
        # that forces -4 retries through the saturated-score path
        for ub in (None, s_exact, max(o + e, 1)):
            s_b, aln = na.align_banded(q, costs, ub=ub)
            assert s_b == s_exact, (seed, div, ub, s_b, s_exact)
            assert _alignment_cost(g, q, aln, costs) == s_exact


def test_int16_banded_two_piece_soak():
    rng = random.Random(77)
    costs = GapAffine2Piece(4, 2, 6, 1, 24)
    glen = 300
    base = "".join(rng.choice("ACGT") for _ in range(glen))
    g = POAGraph()
    g.add_alignment_with_weights("s0", base.encode(), None, [1] * glen)
    na = NativeAligner(g)
    for _ in range(6):
        # long insertions make the second piece bind
        q = base[:150] + "".join(rng.choice("ACGT") for _ in range(60)) \
            + base[150:]
        q = _mutate(rng, q, 0.03).encode()
        # dijkstra: the 2p mingap heuristic is inadmissible (reference
        # quirk, PARITY) and can report a higher-than-optimal score
        s_exact, _, _ = na.align(q, costs, heuristic="dijkstra")
        s_b, aln = na.align_banded(q, costs)
        assert s_b == s_exact
        assert _alignment_cost(g, q, aln, costs) == s_exact
