"""Edge cases (reference test shape: tests/edge_cases.rs)."""

import pytest

from poasta_tpu.aligner import GapAffine, GapAffine2Piece, Global, PoastaAligner
from poasta_tpu.aligner.wavefront import alignment_cost
from poasta_tpu.graphs import POAGraph

COSTS = GapAffine(4, 2, 6)


def _graph(seq=b"ACGTACGT"):
    g = POAGraph()
    g.add_alignment_with_weights("s0", seq, None, [1] * len(seq))
    return g


def _check(g, q, costs=COSTS, heuristic="mingap"):
    a = PoastaAligner(costs, Global(), heuristic=heuristic)
    r = a.align(g, q)
    # emitted pairs may omit leading/trailing deletion runs (the MSA/GAF
    # emitters don't need them), so their cost only lower-bounds the score
    assert alignment_cost(g, q, r.alignment, costs) <= r.score
    return r


def test_empty_query():
    g = _graph()
    a = PoastaAligner(COSTS, Global(), heuristic="mingap")
    r = a.align(g, b"")
    assert r.alignment == []
    g.add_alignment_with_weights("empty", b"", r.alignment, [])


def test_single_char_query():
    g = _graph()
    r = _check(g, b"A")
    # match the A, delete the other 7 graph symbols
    assert r.score == COSTS.gap_open + COSTS.gap_extend * 7


def test_identical_query_zero_score():
    g = _graph()
    r = _check(g, b"ACGTACGT")
    assert r.score == 0
    assert all(p.is_aligned() for p in r.alignment)


def test_query_much_longer_than_graph():
    g = _graph(b"ACG")
    q = b"ACG" + b"T" * 40
    r = _check(g, q)
    assert r.score == COSTS.gap_open + COSTS.gap_extend * 40


def test_graph_much_longer_than_query():
    g = _graph(b"ACGT" * 20)
    r = _check(g, b"ACGT")
    assert r.score == COSTS.gap_open + COSTS.gap_extend * 76


def test_repetitive_sequence():
    g = _graph(b"ATATATATATATATAT")
    r = _check(g, b"ATATATATAT")
    assert r.score == COSTS.gap_open + COSTS.gap_extend * 6


def test_extreme_penalties():
    costs = GapAffine(mismatch=100, gap_extend=1, gap_open=1)
    g = _graph(b"AAAA")
    r = _check(g, b"TTTT", costs)
    # delete all 4 graph symbols + insert all 4 query symbols: 2*(1+4)
    assert r.score == 10


def test_all_mismatches():
    costs = GapAffine(mismatch=1, gap_extend=50, gap_open=50)
    g = _graph(b"AAAA")
    r = _check(g, b"TTTT", costs)
    assert r.score == 4


def test_two_piece_long_gap_prefers_piece2():
    costs2 = GapAffine2Piece(mismatch=4, gap_extend=2, gap_open=8,
                             gap_extend2=1, gap_open2=24)
    g = _graph(b"ACGTACGTACGTACGTACGTACGTACGTACGT")
    q = b"ACGTACGTACGTACGT" + b"T" * 20 + b"ACGTACGTACGTACGT"
    a = PoastaAligner(costs2, Global(), heuristic="dijkstra")
    r = a.align(g, q)
    # switch-to-piece-2 cost: o1+e1 for the first char, e2 afterwards
    assert r.score == 8 + 2 + 1 * 19


def test_heuristics_agree_on_optimal_score():
    g = _graph(b"ACGGTGTCAACGT")
    q = b"ACGTTGTCACGTT"
    scores = {}
    visits = {}
    for h in ("dijkstra", "mingap", "path"):
        a = PoastaAligner(COSTS, Global(), heuristic=h)
        r = a.align(g, q)
        scores[h] = r.score
        visits[h] = r.num_visited
    assert len(set(scores.values())) == 1
    # informed heuristics visit no more states than Dijkstra
    assert visits["mingap"] <= visits["dijkstra"]
    assert visits["path"] <= visits["dijkstra"]


def test_one_char_sequence_never_anchors_at_virtual_end():
    """Regression: the backtrace's old 1-char shortcut anchored the pair at
    the virtual end node (which "matches" every symbol), leaking it into
    graph fusion and corrupting the MSA."""
    import io

    from poasta_tpu.io import poa_graph_to_fasta
    from poasta_tpu.native import NativeAligner

    g = _graph(b"CAC")
    a = PoastaAligner(COSTS, Global(), heuristic="mingap")
    r = a.align(g, b"C")
    for p in r.alignment:
        if p.rpos is not None:
            assert p.rpos != g.end_node
            assert p.rpos != g.start_node
    s, aln, _ = NativeAligner(g).align(b"C", COSTS)
    assert s == r.score
    assert [(p.rpos, p.qpos) for p in aln] == [
        (p.rpos, p.qpos) for p in r.alignment
    ]
    g.add_alignment_with_weights("one", b"C", r.alignment, [1])
    buf = io.StringIO()
    poa_graph_to_fasta(g, buf)
    rows = [l for l in buf.getvalue().splitlines() if not l.startswith(">")]
    assert rows[1].replace("-", "") == "C"
    assert len({len(row) for row in rows}) == 1


def test_ends_free_bound_validation():
    """Malformed bound kinds are rejected at construction; a legal but
    unsatisfiable bound (excluded 0) raises cleanly instead of walking
    past the query end in the backtrace."""
    from poasta_tpu.aligner import EndsFree, PoastaAligner
    from poasta_tpu.aligner.costs import excluded, included

    with pytest.raises(ValueError):
        EndsFree(qry_free_end=("bounded", 0))
    with pytest.raises(ValueError):
        EndsFree(graph_free_end=("included", -1))
    with pytest.raises(ValueError):
        EndsFree(qry_free_begin=("unbounded", 3))

    g = _graph(b"ACGTACGT")
    # excluded(0) demands a free span of length < 0: no end state exists
    ef = EndsFree(qry_free_end=excluded(0), qry_free_begin=included(0))
    a = PoastaAligner(COSTS, ef, heuristic="mingap")
    with pytest.raises(RuntimeError):
        a.align(g, b"ACGT")
    # included(0) == exact query end: behaves like a query-global bound
    ef2 = EndsFree(qry_free_begin=included(0), qry_free_end=included(0))
    r = PoastaAligner(COSTS, ef2, heuristic="mingap").align(g, b"ACGTACGT")
    assert r.score == 0
