"""The REFERENCE's contrib scripts run unchanged on THIS framework's dumps.

PARITY §27 claims the reference's Python visualization tools
(``/root/reference/contrib/poasta_tools/``) work against our debug-dump
and DOT output.  These tests import the reference's actual scripts and
feed them dumps produced by this framework's debug sink
(``poasta_tpu/utils/debug.py``) and DOT emitters
(``poasta_tpu/io/graph_io.py``):

* ``poasta_plot.load_astar_data`` parses our ``astar_iterations`` TSV
  (header comment ``debug.rs:103``; schema ``gap_affine.rs:659-698``).
* ``poasta_plot.load_graph`` parses our ``graph_for_<seq>.dot``
  (``format_as_dot``, petgraph-Dot label shape ``graph.rs:229-243``) —
  pygraphviz isn't installed here, so ``nx_agraph.read_dot`` is stubbed
  with a minimal DOT reader over a REAL networkx graph (the same
  dependency-stubbing trick the reference's own tests use,
  ``contrib/poasta_tools/tests/test_poasta_tools.py:20-46``); the
  reference's label regex / rank logic runs unmodified.
* ``poasta_graphviz_region.parse_poasta_graphviz`` parses our
  ``view -O dot`` output (``# seq:`` header line, ``graph.rs:515``).

numpy / pandas / matplotlib / seaborn / networkx are real here; only
pygraphviz is stubbed.
"""

import io
import re
import sys
import types
from pathlib import Path

import pytest

CONTRIB = Path("/root/reference/contrib")

pytestmark = pytest.mark.skipif(
    not CONTRIB.is_dir(), reason="reference contrib not available"
)


@pytest.fixture(scope="module")
def dumps(tmp_path_factory):
    """Debug dumps + view-DOT from aligning small_test.fa, via the same
    code paths the CLI drives (``poasta align -d DIR`` / ``view -O dot``)."""
    from poasta_tpu.aligner import GapAffine, Global, PoastaAligner
    from poasta_tpu.graphs import POAGraph
    from poasta_tpu.io import read_fasta
    from poasta_tpu.io.graph_io import graph_to_dot
    from poasta_tpu.utils.debug import DebugOutputWriter

    d = tmp_path_factory.mktemp("contrib_dumps")
    writer = DebugOutputWriter(str(d))
    g = POAGraph()
    aligner = PoastaAligner(GapAffine(4, 2, 6), Global(),
                            heuristic="mingap", debug_sink=writer)
    names = []
    for name, seq in read_fasta("/root/reference/tests/small_test.fa"):
        names.append(name)
        w = [1] * len(seq)
        if g.is_empty():
            g.add_alignment_with_weights(name, seq, None, w)
            continue
        writer.new_sequence(name, seq, g)
        res = aligner.align(g, seq)
        g.add_alignment_with_weights(name, seq, res.alignment, w)
    writer.close()
    view_dot = io.StringIO()
    graph_to_dot(g, view_dot)
    return d, names, view_dot.getvalue(), g


@pytest.fixture()
def ref_tools(monkeypatch):
    """Import the reference's contrib package with pygraphviz stubbed."""
    if "pygraphviz" not in sys.modules:
        stub = types.ModuleType("pygraphviz")

        class AGraph:
            def __init__(self, dot_str=None, **kw):
                self.dot = dot_str

            def to_string(self):
                return self.dot

        stub.AGraph = AGraph
        monkeypatch.setitem(sys.modules, "pygraphviz", stub)
    monkeypatch.syspath_prepend(str(CONTRIB))
    import poasta_tools.poasta_graphviz_region as region
    import poasta_tools.poasta_plot as plot

    return plot, region


def test_reference_plot_parses_our_astar_tsv(dumps, ref_tools):
    d, names, _, _ = dumps
    plot, _ = ref_tools
    tsvs = sorted((d / "astar_iterations").glob("*.tsv"))
    assert tsvs, "debug sink produced no astar TSVs"
    for tsv in tsvs:
        df, kv = plot.load_astar_data(tsv)
        # the reference keys create_animation on kv['seq'] and the
        # matrix-indexed frame; both must come through our dump
        assert isinstance(kv["seq"], str) and len(kv["seq"]) > 0
        assert kv["seq_name"] in names
        assert isinstance(kv["max_rank"], int)
        assert set(df.index.unique()) <= {
            "match", "insertion", "deletion",
            "insertion1", "deletion1", "insertion2", "deletion2",
        }
        assert {"node_id", "offset", "score"} <= set(df.columns)
        assert (df["score"] >= 0).all()
        # origin state present: match matrix has the (0, 0) cell
        m = df.loc["match"]
        assert ((m["node_id"] == 0) & (m["offset"] == 0)).any()


def _read_dot_minimal(fname):
    """Tiny read_dot stand-in for the petgraph Dot shape our debug sink
    emits (pygraphviz isn't installed); returns a REAL networkx graph so
    the reference's rank/label logic runs unmodified."""
    import networkx as nx

    g = nx.MultiDiGraph()
    node_re = re.compile(r'^\s*(\d+)\s*\[\s*label\s*=\s*"((?:[^"\\]|\\.)*)"')
    edge_re = re.compile(r"^\s*(\d+)\s*->\s*(\d+)")
    with open(fname) as fh:
        for line in fh:
            em = edge_re.match(line)
            if em:
                g.add_edge(em.group(1), em.group(2))
                continue
            nm = node_re.match(line)
            if nm:
                g.add_node(nm.group(1),
                           label=nm.group(2).replace('\\"', '"'))
    g.graph["graph"] = {}
    return g


def test_reference_plot_parses_our_debug_dot(dumps, ref_tools, monkeypatch,
                                             capsys):
    d, _, _, graph = dumps
    plot, _ = ref_tools
    monkeypatch.setattr(plot.nx.nx_agraph, "read_dot", _read_dot_minimal,
                        raising=False)
    dots = sorted(d.glob("graph_for_*.dot"))
    assert dots, "debug sink produced no DOT files"
    g, node_ix_to_rank = plot.load_graph(dots[-1])
    err = capsys.readouterr().err
    # the reference prints a warning per node label its regex can't parse
    assert "Could not parse node label" not in err
    # every node of the final-dump graph resolves to a rank, and the TSV
    # join the reference performs (node_id -> rank) is total
    assert len(node_ix_to_rank) == len(g)
    df, _ = plot.load_astar_data(
        sorted((d / "astar_iterations").glob("*.tsv"))[-1])
    mapped = df["node_id"].map(node_ix_to_rank)
    assert not mapped.isna().any()
    # downstream layout helper consumes the parsed graph unmodified
    hlines = plot.poa_matrix_discontinuieties(g)
    assert hlines == sorted(hlines)


def test_reference_region_tool_parses_our_view_dot(dumps, ref_tools):
    _, names, view_dot, _ = dumps
    _, region = ref_tools
    g, seq_meta = region.parse_poasta_graphviz(
        io.BytesIO(view_dot.encode()))
    assert set(seq_meta) == set(names)
    for i, name in enumerate(names):
        idx, start_node = seq_meta[name]
        assert idx == i
        assert start_node.strip().isdigit()
    # the DOT body the tool hands to AGraph must still start at digraph
    assert g.to_string().startswith("digraph")
    # edge class attributes (the seq-path walk's join key,
    # poasta_graphviz_region.py:160) are present in our emit
    assert re.search(r'class="s\d', view_dot)
