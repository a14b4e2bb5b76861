"""Banded fill: exactness via verify-and-retry."""

import random

import numpy as np

from poasta_tpu.aligner import GapAffine, Global, PoastaAligner
from poasta_tpu.aligner.banded import BandedScorer, band_windows
from poasta_tpu.aligner.wavefront import DeviceGraph, dp_fill_scores, pack_queries
from poasta_tpu.graphs import POAGraph

COSTS = GapAffine(4, 2, 6)


def _case(seed, glen=80, nreads=8, rate=0.05):
    rng = random.Random(seed)
    base = "".join(rng.choice("ACGT") for _ in range(glen))

    def mutate(s):
        out = []
        for ch in s:
            r = rng.random()
            if r < rate / 3:
                continue
            out.append(rng.choice("ACGT") if r < rate else ch)
            if rng.random() < rate / 3:
                out.append(rng.choice("ACGT"))
        return "".join(out) or "A"

    g = POAGraph()
    py = PoastaAligner(COSTS, Global(), heuristic="mingap")
    g.add_alignment_with_weights("s0", base.encode(), None, [1] * glen)
    for i in range(1, 3):
        s = mutate(base).encode()
        r = py.align(g, s)
        g.add_alignment_with_weights(f"s{i}", s, r.alignment, [1] * len(s))
    return g, [mutate(base).encode() for _ in range(nreads)]


def test_banded_matches_full():
    g, reads = _case(3)
    flat = g.flatten()
    dg = DeviceGraph.build(flat)
    qshift, lengths = pack_queries(reads)
    ref = np.asarray(dp_fill_scores(dg, qshift, lengths, COSTS, engine="xla"))
    out = BandedScorer(flat, COSTS).scores(qshift, lengths)
    assert (out == ref).all()


def test_banded_tiny_ub_still_exact():
    """Deliberately bad initial UB must trigger retries, not wrong answers."""
    g, reads = _case(7, rate=0.15)
    flat = g.flatten()
    dg = DeviceGraph.build(flat)
    qshift, lengths = pack_queries(reads)
    ref = np.asarray(dp_fill_scores(dg, qshift, lengths, COSTS, engine="xla"))
    out = BandedScorer(flat, COSTS).scores(qshift, lengths, ub=4)
    assert (out == ref).all()


def test_band_windows_cover_feasible_cells():
    g, reads = _case(9)
    flat = g.flatten()
    n = max(len(r) for r in reads)
    ws, width, lo, hi = band_windows(flat, min(len(r) for r in reads), n, COSTS, 64)
    assert (lo >= ws).all()
    assert (hi <= ws + width - 1).all()
    # the global end state (end rank, offset n) is always inside
    end = flat.n_nodes - 1
    assert ws[end] <= n <= ws[end] + width - 1
