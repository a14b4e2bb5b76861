"""Pallas fill kernel vs the XLA scan path (accelerator only)."""

import random

import jax
import numpy as np
import pytest

from poasta_tpu.aligner import GapAffine, Global, PoastaAligner
from poasta_tpu.aligner.wavefront import DeviceGraph, dp_fill_scores, pack_queries
from poasta_tpu.graphs import POAGraph

COSTS = GapAffine(4, 2, 6)

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="pallas TPU kernel requires an accelerator backend",
)


def test_pallas_matches_xla_scores():
    rng = random.Random(3)
    base = "".join(rng.choice("ACGT") for _ in range(60))

    def mutate(s):
        out = []
        for ch in s:
            r = rng.random()
            if r < 0.06:
                continue
            out.append(rng.choice("ACGT") if r < 0.12 else ch)
        return "".join(out) or "A"

    g = POAGraph()
    py = PoastaAligner(COSTS, Global(), heuristic="mingap")
    g.add_alignment_with_weights("s0", base.encode(), None, [1] * 60)
    for i in range(1, 3):
        s = mutate(base).encode()
        r = py.align(g, s)
        g.add_alignment_with_weights(f"s{i}", s, r.alignment, [1] * len(s))

    dg = DeviceGraph.build(g.flatten())
    queries = [mutate(base).encode() for _ in range(64)]
    qshift, lengths = pack_queries(queries)
    ref = np.asarray(dp_fill_scores(dg, qshift, lengths, COSTS, engine="xla"))
    out = np.asarray(dp_fill_scores(dg, qshift, lengths, COSTS, engine="pallas"))
    assert (out == ref).all()


def test_pallas_2piece_matches_xla_scores():
    from poasta_tpu.aligner import GapAffine2Piece
    from poasta_tpu.ops.pallas_fill import pallas_fill_scores_2p
    from poasta_tpu.aligner.wavefront import _scores_exec_2p

    costs2 = GapAffine2Piece(mismatch=4, gap_extend=2, gap_open=8,
                             gap_extend2=1, gap_open2=24)
    rng = random.Random(9)
    base = "".join(rng.choice("ACGT") for _ in range(80))

    def mutate(s):
        out = []
        for ch in s:
            r = rng.random()
            if r < 0.05:
                continue
            out.append(rng.choice("ACGT") if r < 0.10 else ch)
            if rng.random() < 0.04:
                out.append(rng.choice("ACGT"))
        return "".join(out) or "A"

    g = POAGraph()
    py = PoastaAligner(costs2, Global(), heuristic="dijkstra")
    g.add_alignment_with_weights("s0", base.encode(), None, [1] * 80)
    for i in range(1, 3):
        s = mutate(base).encode()
        r = py.align(g, s)
        g.add_alignment_with_weights(f"s{i}", s, r.alignment, [1] * len(s))

    dg = DeviceGraph.build(g.flatten())
    # include a long-insertion query to exercise the piece-2 switch
    queries = [mutate(base).encode() for _ in range(63)]
    queries.append(base[:40].encode() + b"T" * 30 + base[40:].encode())
    qshift, lengths = pack_queries(queries)
    out = np.asarray(pallas_fill_scores_2p(dg, qshift, lengths, costs2))
    fn = _scores_exec_2p(dg.window, costs2.gap_open, costs2.gap_extend,
                         costs2.gap_extend2, costs2.mismatch, False, False)
    ref = np.asarray(fn(dg.symbols, dg.pred_slots, dg.pred_valid,
                        dg.write_slots, dg.end_rank, qshift, lengths))
    assert (out == ref).all()
    # spot-check the exact engine on a few queries
    oracle = [py.align(g, q).score for q in queries[:3]] + \
        [py.align(g, queries[-1]).score]
    assert list(out[:3]) + [int(out[-1])] == oracle


@pytest.mark.parametrize("fs,fe", [(True, True), (True, False), (False, True)])
def test_pallas_free_ends_matches_xla(fs, fe):
    rng = random.Random(11)
    base = "".join(rng.choice("ACGT") for _ in range(120))

    def mutate(s):
        out = []
        for ch in s:
            r = rng.random()
            if r < 0.06:
                continue
            out.append(rng.choice("ACGT") if r < 0.12 else ch)
        return "".join(out) or "A"

    g = POAGraph()
    py = PoastaAligner(COSTS, Global(), heuristic="mingap")
    g.add_alignment_with_weights("s0", base.encode(), None, [1] * 120)
    for i in range(1, 3):
        s = mutate(base).encode()
        r = py.align(g, s)
        g.add_alignment_with_weights(f"s{i}", s, r.alignment, [1] * len(s))
    dg = DeviceGraph.build(g.flatten())
    queries = [base[rng.randrange(0, 40):][:60].encode() for _ in range(64)]
    qshift, lengths = pack_queries(queries)
    ref = np.asarray(dp_fill_scores(dg, qshift, lengths, COSTS,
                                    free_start=fs, free_end=fe, engine="xla"))
    out = np.asarray(dp_fill_scores(dg, qshift, lengths, COSTS,
                                    free_start=fs, free_end=fe,
                                    engine="pallas"))
    assert (out == ref).all()


@pytest.mark.parametrize("fs,fe", [(True, True), (False, True), (True, False)])
def test_pallas_2p_free_ends_matches_xla(fs, fe):
    from poasta_tpu.aligner import GapAffine2Piece

    costs2 = GapAffine2Piece(mismatch=4, gap_extend=2, gap_open=8,
                             gap_extend2=1, gap_open2=24)
    rng = random.Random(13)
    base = "".join(rng.choice("ACGT") for _ in range(100))

    def mutate(s):
        out = []
        for ch in s:
            r = rng.random()
            if r < 0.06:
                continue
            out.append(rng.choice("ACGT") if r < 0.12 else ch)
        return "".join(out) or "A"

    g = POAGraph()
    py = PoastaAligner(COSTS, Global(), heuristic="mingap")
    g.add_alignment_with_weights("s0", base.encode(), None, [1] * 100)
    for i in range(1, 3):
        s = mutate(base).encode()
        r = py.align(g, s)
        g.add_alignment_with_weights(f"s{i}", s, r.alignment, [1] * len(s))
    dg = DeviceGraph.build(g.flatten())
    queries = [base[rng.randrange(0, 30):][:50].encode() for _ in range(64)]
    qshift, lengths = pack_queries(queries)
    ref = np.asarray(dp_fill_scores(dg, qshift, lengths, costs2,
                                    free_start=fs, free_end=fe, engine="xla"))
    out = np.asarray(dp_fill_scores(dg, qshift, lengths, costs2,
                                    free_start=fs, free_end=fe,
                                    engine="pallas"))
    assert (out == ref).all()
