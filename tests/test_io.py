"""I/O roundtrips and emitters (reference test shape: tests/io_*.rs,
src/io unit tests)."""

import io

import pytest

from poasta_tpu.aligner import GapAffine, Global, PoastaAligner
from poasta_tpu.graphs import POAGraph
from poasta_tpu.io import (
    GraphSegments,
    NodeSegmentResolver,
    alignment_to_gaf,
    graph_to_gfa,
    graph_to_gfav1,
    load_graph,
    load_graph_from_fasta_msa,
    load_graph_from_gfa,
    poa_graph_to_fasta,
    read_fasta,
    save_graph,
)

COSTS = GapAffine(4, 2, 6)


def _build_graph(path):
    g = POAGraph()
    a = PoastaAligner(COSTS, Global(), heuristic="mingap")
    for name, seq in read_fasta(path):
        w = [1] * len(seq)
        if g.is_empty():
            g.add_alignment_with_weights(name, seq, None, w)
        else:
            r = a.align(g, seq)
            g.add_alignment_with_weights(name, seq, r.alignment, w)
    return g


def test_save_load_roundtrip(tmp_path, reference_tests_dir):
    g = _build_graph(f"{reference_tests_dir}/small_test.fa")
    p = tmp_path / "g.poasta"
    with open(p, "wb") as fh:
        save_graph(g, fh)
    with open(p, "rb") as fh:
        g2 = load_graph(fh)
    assert g2.node_count_with_start_and_end() == g.node_count_with_start_and_end()
    assert g2.edge_count() == g.edge_count()
    # emitters produce identical output from the roundtripped graph
    b1, b2 = io.StringIO(), io.StringIO()
    poa_graph_to_fasta(g, b1)
    poa_graph_to_fasta(g2, b2)
    assert b1.getvalue() == b2.getvalue()


def test_msa_import_matches_fused_graph(reference_tests_dir):
    # import the half-MSA then emit it back: column structure preserved
    g = load_graph_from_fasta_msa(f"{reference_tests_dir}/test2_half.msa.fa")
    buf = io.StringIO()
    poa_graph_to_fasta(g, buf)
    out = buf.getvalue()
    names = [ln[1:].strip() for ln in out.splitlines() if ln.startswith(">")]
    rows = [ln for ln in out.splitlines() if not ln.startswith(">")]
    src = list(read_fasta(f"{reference_tests_dir}/test2_half.msa.fa"))
    assert names == [n for n, _ in src]
    # ungapped sequences survive the import/emit roundtrip
    for (_, seq), row in zip(src, rows):
        assert row.replace("-", "") == seq.decode().replace("-", "")


def test_gfa_roundtrip(tmp_path, reference_tests_dir):
    g = _build_graph(f"{reference_tests_dir}/small_test.fa")
    buf = io.StringIO()
    graph_to_gfa(g, buf)
    gfa = buf.getvalue()
    assert gfa.startswith("H\t")
    assert "W\t" in gfa  # v1.1 walk lines, one per sequence
    p = tmp_path / "g.gfa"
    p.write_text(gfa)
    g2, segments = load_graph_from_gfa(str(p))
    # every walk path reconstructs its original ungapped sequence
    fa = io.StringIO()
    poa_graph_to_fasta(g, fa)
    originals = {}
    name = None
    for ln in fa.getvalue().splitlines():
        if ln.startswith(">"):
            name = ln[1:].strip()
        else:
            originals[name] = ln.replace("-", "")
    walk_names = {w.split("\t")[3] for w in gfa.splitlines()
                  if w.startswith("W\t")}
    assert walk_names == set(originals)


def test_gfav1_has_paths(reference_tests_dir):
    g = _build_graph(f"{reference_tests_dir}/small_test.fa")
    buf = io.StringIO()
    graph_to_gfav1(g, buf)
    gfa = buf.getvalue()
    assert "P\t" in gfa  # v1 path lines
    assert "W\t" not in gfa


def test_gaf_record_fields(reference_tests_dir):
    graph, segments = load_graph_from_gfa(f"{reference_tests_dir}/test.gfa")
    resolver = NodeSegmentResolver(graph, segments)
    a = PoastaAligner(COSTS, Global(), heuristic="mingap")
    q = b"ACGT"
    res = a.align(graph, q)
    rec = alignment_to_gaf(graph, segments, "read1", q, res.alignment, resolver)
    assert rec is not None
    line = str(rec)
    fields = line.split("\t")
    assert fields[0] == "read1"
    assert int(fields[1]) == len(q)
    assert fields[4] == "+"
    assert fields[5].startswith(">")
    assert any(f.startswith("cg:Z:") for f in fields[11:])


def test_empty_sequence_msa_row(reference_tests_dir):
    # the reference's io_fasta.rs covers an all-gap row for empty sequences
    g = POAGraph()
    g.add_alignment_with_weights("a", b"ACGT", None, [1] * 4)
    g.add_alignment_with_weights("empty", b"", None, [])
    buf = io.StringIO()
    poa_graph_to_fasta(g, buf)
    out = buf.getvalue().splitlines()
    row = out[out.index(">empty") + 1]
    assert set(row) <= {"-"}


def test_msa_import_all_gap_row_keeps_sequence_ids(tmp_path):
    # regression: an all-gap row shifted every later sequence's id so
    # re-export walked the wrong edges (the reference has the same bug;
    # our own emitter writes all-gap rows for empty sequences, so the
    # importer must handle them)
    p = tmp_path / "msa.fa"
    p.write_text(">s1\n----\n>s2\nACGT\n>s3\nACGT\n")
    g = load_graph_from_fasta_msa(str(p))
    assert [s.name for s in g.sequences] == ["s1", "s2", "s3"]
    buf = io.StringIO()
    poa_graph_to_fasta(g, buf)
    rows = {}
    name = None
    for ln in buf.getvalue().splitlines():
        if ln.startswith(">"):
            name = ln[1:]
        else:
            rows[name] = ln
    assert rows["s2"].replace("-", "") == "ACGT"
    assert rows["s3"].replace("-", "") == "ACGT"
    assert set(rows["s1"]) <= {"-"}


def test_gaf_returns_none_without_aligned_pair(reference_tests_dir):
    from poasta_tpu.aligner.alignment import AlignedPair
    from poasta_tpu.io import load_graph_from_gfa

    graph, segments = load_graph_from_gfa(f"{reference_tests_dir}/test.gfa")
    resolver = NodeSegmentResolver(graph, segments)
    aln = [AlignedPair(2, None), AlignedPair(None, 0)]
    assert alignment_to_gaf(graph, segments, "r", b"A", aln, resolver) is None


def test_fasta_whitespace_only_header(tmp_path):
    p = tmp_path / "x.fa"
    p.write_text(">   \nACGT\n")
    recs = list(read_fasta(str(p)))
    assert recs == [("", b"ACGT")]


def test_gfa_rejects_link_to_undefined_segment(tmp_path):
    from poasta_tpu.utils.errors import PoastaError

    p = tmp_path / "x.gfa"
    p.write_text("S\ts1\tACGT\nL\ts1\t+\tmissing\t+\t0M\n")
    with pytest.raises(PoastaError):
        load_graph_from_gfa(str(p))


def test_gfa_reverse_links_reject_by_default(tmp_path):
    from poasta_tpu.utils.errors import GraphError

    p = tmp_path / "rev.gfa"
    p.write_text("S\tA\tACGTAC\nS\tB\tGGTTGG\nL\tA\t+\tB\t-\t0M\n")
    with pytest.raises(GraphError, match="reverse-strand"):
        load_graph_from_gfa(str(p))


def test_gfa_reverse_links_double_builds_both_strands(tmp_path):
    """EXTENSION beyond the reference (which errors,
    src/io/graph.rs:176-180): reverse_links='double' materializes
    reverse-complement segment copies + the strand-complement link
    closure, so reads from either strand align linearly and GAF paths
    carry <name entries."""
    from poasta_tpu.aligner import GapAffine
    from poasta_tpu.aligner.costs import EndsFree, UNBOUNDED, included
    from poasta_tpu.io.gaf import NodeSegmentResolver, alignment_to_gaf
    from poasta_tpu.io.gfa import reverse_complement
    from poasta_tpu.parallel import BatchMapper

    import random

    rng = random.Random(31)
    a = "".join(rng.choice("ACGT") for _ in range(120))
    b = "".join(rng.choice("ACGT") for _ in range(80))
    c = "".join(rng.choice("ACGT") for _ in range(120))
    p_str = (f"S\tA\t{a}\nS\tB\t{b}\nS\tC\t{c}\n"
             "L\tA\t+\tB\t+\t0M\nL\tB\t+\tC\t+\t0M\n"
             "L\tA\t+\tB\t-\t0M\nL\tB\t-\tC\t+\t0M\n")
    import pathlib

    p = pathlib.Path(str(tmp_path)) / "inv.gfa"
    p.write_text(p_str)
    graph, segments = load_graph_from_gfa(str(p), reverse_links="double")
    assert segments.orientations.count("-") == 3
    # every forward chain and its rc twin carry complementary sequence
    for i in range(0, len(segments.names), 2):
        assert segments.names[i] == segments.names[i + 1]
        assert segments.orientations[i:i + 2] == ["+", "-"]

    costs = GapAffine(4, 2, 6)
    span = EndsFree(UNBOUNDED, included(0), UNBOUNDED, UNBOUNDED)
    bm = BatchMapper(graph, costs, aln_type=span)
    resolver = NodeSegmentResolver(graph, segments)
    rc = reverse_complement

    fwd_read = (a + b + c).encode()          # reference allele
    inv_read = (a + rc(b.encode()).decode() + c).encode()  # inversion
    out = bm.align_batch([fwd_read, inv_read])
    for (score, aln), read, want_b in zip(
            out, [fwd_read, inv_read], [">B", "<B"]):
        assert score == 0, (score, want_b)
        rec = alignment_to_gaf(graph, segments, "q", read, aln, resolver)
        assert rec.graph_path == f">A{want_b}>C", (want_b, rec.graph_path)
        assert rec.num_matches == len(read)


def test_gfa_double_palindromic_self_link_dedups(tmp_path):
    """A link equal to its own strand-complement must not add a
    duplicate edge under the closure."""
    p = tmp_path / "pal.gfa"
    p.write_text("S\tA\tACGT\nS\tB\tTTAA\nL\tA\t+\tB\t-\t0M\n")
    graph, segments = load_graph_from_gfa(str(p), reverse_links="double")
    # the closure of (A+, B-) is (B+, A-): exactly two link edges
    starts = set(segments.start_nodes)
    ends = set(segments.end_nodes)
    n_link_edges = sum(
        1 for e in graph.edge_references()
        if e.source in ends and e.target in starts)
    assert n_link_edges == 2
