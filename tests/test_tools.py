"""Offline viz tools: DP heatmaps + region extraction from debug dumps."""

import io
import subprocess
import sys

import pytest

from poasta_tpu.aligner import GapAffine, Global, PoastaAligner
from poasta_tpu.graphs import POAGraph
from poasta_tpu.io import read_fasta, graph_to_dot
from poasta_tpu.utils.debug import DebugOutputWriter


@pytest.fixture
def debug_dump(tmp_path, reference_tests_dir):
    g = POAGraph()
    sink = DebugOutputWriter(str(tmp_path / "dbg"))
    a = PoastaAligner(GapAffine(4, 2, 6), Global(), heuristic="mingap",
                      debug_sink=sink)
    for name, seq in read_fasta(f"{reference_tests_dir}/small_test.fa"):
        w = [1] * len(seq)
        if g.is_empty():
            g.add_alignment_with_weights(name, seq, None, w)
        else:
            sink.new_sequence(name, seq, g)
            r = a.align(g, seq)
            g.add_alignment_with_weights(name, seq, r.alignment, w)
    sink.close()
    dot = tmp_path / "annot.dot"
    with open(dot, "w") as fh:
        graph_to_dot(g, fh)
    return tmp_path


def test_plot_dp_writes_heatmaps(debug_dump):
    from poasta_tpu.tools.plot_dp import main

    out = debug_dump / "viz"
    main([str(debug_dump / "dbg" / "graph_for_seq3.dot"),
          str(debug_dump / "dbg" / "astar_iterations" / "seq3.iter0.tsv"),
          "-o", str(out)])
    pngs = sorted(p.name for p in out.glob("*.png"))
    assert pngs == ["seq3.iter0.deletion.png", "seq3.iter0.insertion.png",
                    "seq3.iter0.match.png"]
    assert all((out / p).stat().st_size > 1000 for p in pngs)


def test_graphviz_region_extracts_subgraph(debug_dump, capsys):
    from poasta_tpu.tools.graphviz_region import main

    main([str(debug_dump / "annot.dot"), "seq1:3-9", "-H", "seq2:red"])
    out = capsys.readouterr().out
    assert out.startswith("digraph {")
    assert "rank=same" in out
    assert 'color="red"' in out
    # region nodes carry symbol labels
    assert '[label="' in out


def test_graphviz_region_stop_inclusive(debug_dump, capsys):
    """Region coordinates are 1-based with an INCLUSIVE stop (reference
    poasta_graphviz_region.py:113-151): a single-position region keeps
    that node, not the empty set."""
    from poasta_tpu.tools.graphviz_region import (
        main,
        parse_annotated_dot,
        sequence_path,
    )

    dot = str(debug_dump / "annot.dot")
    sequences, nodes, edges, aligned = parse_annotated_dot(dot)
    name = next(iter(sequences))
    path = sequence_path(sequences, edges, name)
    main([dot, f"{name}:3-3"])
    out = capsys.readouterr().out
    assert f"{path[2]} [label=" in out


def test_plot_dp_two_piece_matrices(tmp_path):
    """The two-piece debug dumps name the first gap layers insertion1/
    deletion1 — plot_dp must render those too."""
    from poasta_tpu.tools.plot_dp import main

    dot = tmp_path / "g.dot"
    dot.write_text(
        "digraph {\n"
        '0 [label="\'#\' (0)"]\n'
        '1 [label="\'A\' (1)"]\n'
        '2 [label="\'$\' (2)"]\n'
        "0 -> 1\n"
        "1 -> 2\n"
        "}\n"
    )
    tsv = tmp_path / "x.iter0.tsv"
    tsv.write_text(
        "node_id\toffset\tmatrix\tscore\n"
        "1\t0\tmatch\t0\n"
        "1\t1\tinsertion1\t8\n"
        "1\t1\tdeletion1\t8\n"
        "1\t1\tinsertion2\t9\n"
    )
    out = tmp_path / "viz"
    main([str(dot), str(tsv), "-o", str(out)])
    names = sorted(p.name for p in out.glob("*.png"))
    assert names == ["x.iter0.deletion1.png", "x.iter0.insertion1.png",
                     "x.iter0.insertion2.png", "x.iter0.match.png"]


def test_graphviz_region_unknown_sequence(debug_dump):
    from poasta_tpu.tools.graphviz_region import main

    with pytest.raises(SystemExit):
        main([str(debug_dump / "annot.dot"), "nope:1-5"])


def test_wavefront_dump_renders(tmp_path, reference_tests_dir):
    import numpy as np

    from poasta_tpu.aligner import GapAffine, Global, PoastaAligner
    from poasta_tpu.aligner.wavefront import (
        DeviceGraph,
        dp_fill_full,
        pack_queries,
    )
    from poasta_tpu.utils.debug import dump_wavefront_tsv
    from poasta_tpu.tools.plot_dp import main as plot_main

    g = POAGraph()
    a = PoastaAligner(GapAffine(4, 2, 6), Global(), heuristic="mingap")
    for name, seq in read_fasta(f"{reference_tests_dir}/small_test.fa"):
        w = [1] * len(seq)
        if g.is_empty():
            g.add_alignment_with_weights(name, seq, None, w)
        else:
            r = a.align(g, seq)
            g.add_alignment_with_weights(name, seq, r.alignment, w)
    flat = g.flatten()
    dg = DeviceGraph.build(flat)
    q = b"AATGGTTGTCACGTCAGT"
    qshift, lengths = pack_queries([q])
    _, M, I, D = dp_fill_full(dg, qshift, lengths, GapAffine(4, 2, 6))
    tsv = tmp_path / "wave.iter0.tsv"
    dump_wavefront_tsv(flat, np.asarray(M)[:, 0, :], np.asarray(I)[:, 0, :],
                       np.asarray(D)[:, 0, :], tsv)
    # renders with the same plot tooling as the exact engine's dumps
    import io as _io
    from poasta_tpu.io import format_as_dot

    dot = tmp_path / "g.dot"
    buf = _io.StringIO()
    format_as_dot(g, buf)
    dot.write_text(buf.getvalue())
    out = tmp_path / "viz"
    plot_main([str(dot), str(tsv), "-o", str(out)])
    assert len(list(out.glob("*.png"))) == 3
