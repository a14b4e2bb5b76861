"""Rust-poasta bincode ``.poasta`` interop (reference: ``src/io/graph.rs:24-34``,
``src/graphs/poa.rs:482-489``).

No Rust toolchain exists in this environment, so true cross-binary bytes
cannot be pinned; these tests pin (a) the documented layout field-by-field
on a hand-computed fixture, (b) emission-identical round trips through the
importer, and (c) resume (``align -I``) from a bincode graph.
"""

import io
import pathlib
import struct
import subprocess
import sys

import pytest

from poasta_tpu.aligner import GapAffine, Global, PoastaAligner
from poasta_tpu.graphs import POAGraph
from poasta_tpu.io import (
    graph_to_gfa,
    load_graph,
    poa_graph_to_fasta,
    read_fasta,
    save_graph,
)
from poasta_tpu.io.bincode import (
    dumps_rust_poasta,
    load_rust_poasta,
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


def _emissions(g):
    fa, gfa = io.StringIO(), io.StringIO()
    poa_graph_to_fasta(g, fa)
    graph_to_gfa(g, gfa)
    return fa.getvalue(), gfa.getvalue()


def test_layout_hand_computed():
    """Byte-for-byte check of the writer against the documented layout."""
    g = POAGraph()  # start '#'=0, end '$'=1
    from poasta_tpu.graphs.poa import SequenceInfo

    n = g.add_node(ord("A"))
    g.add_edge(g.start_node, n, 0, 1)
    g.sequences = [SequenceInfo("s0", n)]
    g.topological_sorted = [0, 2, 1]

    blob = dumps_rust_poasta(g, ix_bytes=4)
    expect = b"".join(
        [
            struct.pack("<I", 2),  # POAGraphWithIx::U32
            struct.pack("<Q", 3),  # 3 nodes
            bytes([ord("#")]), struct.pack("<Q", 0),
            bytes([ord("$")]), struct.pack("<Q", 0),
            bytes([ord("A")]), struct.pack("<Q", 0),
            struct.pack("<Q", 0),  # node_holes
            struct.pack("<I", 1),  # EdgeProperty::Directed
            struct.pack("<Q", 1),  # 1 edge slot
            b"\x01", struct.pack("<I", 0), struct.pack("<I", 2),  # 0 -> 2
            struct.pack("<Q", 1),  # weight
            struct.pack("<Q", 1), struct.pack("<Q", 0),  # sequence_ids [0]
            struct.pack("<Q", 1),  # 1 sequence
            struct.pack("<Q", 2), b"s0", struct.pack("<I", 2),
            struct.pack("<Q", 3),  # topo order
            struct.pack("<I", 0), struct.pack("<I", 2), struct.pack("<I", 1),
            struct.pack("<I", 0), struct.pack("<I", 1),  # start, end
        ]
    )
    assert blob == expect


@pytest.mark.parametrize("ix_bytes", [2, 4, 8])
def test_roundtrip_emissions(reference_tests_dir, ix_bytes):
    g = _build_graph(pathlib.Path(reference_tests_dir) / "small_test.fa")
    # Fusion rewires start/end edges; make sure the fixture exercises
    # vacant edge slots if any exist, and adjacency orders survive.
    blob = dumps_rust_poasta(g, ix_bytes=ix_bytes)
    g2 = load_rust_poasta(blob)
    assert g2.symbols == g.symbols
    assert g2.aligned_nodes == g.aligned_nodes
    assert g2.topological_sorted == g.topological_sorted
    assert [
        (e.source, e.target, e.weight, e.sequence_ids) if e else None
        for e in g2._edges
    ] == [
        (e.source, e.target, e.weight, e.sequence_ids) if e else None
        for e in g._edges
    ]
    assert _emissions(g2) == _emissions(g)


def test_load_graph_autodetects_bincode(tmp_path, reference_tests_dir):
    g = _build_graph(pathlib.Path(reference_tests_dir) / "small_test.fa")
    p = tmp_path / "rust.poasta"
    p.write_bytes(dumps_rust_poasta(g))
    with open(p, "rb") as fh:
        g2 = load_graph(fh)
    assert _emissions(g2) == _emissions(g)


def test_align_resume_from_bincode(tmp_path, reference_tests_dir):
    """``align -I rust.poasta`` resumes identically to the native container."""
    inp = pathlib.Path(reference_tests_dir) / "small_test.input.fa"
    query = pathlib.Path(reference_tests_dir) / "small_test.query.fa"
    g = _build_graph(inp)

    native = tmp_path / "native.poasta"
    with open(native, "wb") as fh:
        save_graph(g, fh)
    rust = tmp_path / "rust.poasta"
    rust.write_bytes(dumps_rust_poasta(g))

    outs = {}
    for tag, graph_file in [("native", native), ("rust", rust)]:
        out = tmp_path / f"{tag}.fa"
        r = subprocess.run(
            [sys.executable, "-m", "poasta_tpu.cli.poasta", "align",
             "-I", str(graph_file), "-O", "fasta", "-o", str(out), str(query)],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr
        outs[tag] = out.read_text()
    assert outs["rust"] == outs["native"]
    assert len(outs["rust"]) > 0


def test_view_export_poasta_rs(tmp_path, reference_tests_dir):
    """view -O poasta-rs emits the bincode layout; importer reads it back."""
    msa = pathlib.Path(reference_tests_dir) / "small_test.truth.fa"
    out = tmp_path / "export.poasta"
    r = subprocess.run(
        [sys.executable, "-m", "poasta_tpu.cli.poasta", "view",
         str(msa), "-O", "poasta-rs", "-o", str(out)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    blob = out.read_bytes()
    assert struct.unpack("<I", blob[:4])[0] == 2  # U32 arm
    g2 = load_rust_poasta(blob)
    fa = io.StringIO()
    poa_graph_to_fasta(g2, fa)
    assert fa.getvalue() == msa.read_text()


def test_malformed_streams_rejected():
    g = POAGraph()
    g.add_node(ord("A"))
    blob = dumps_rust_poasta(g)
    with pytest.raises(ValueError, match="truncated"):
        load_rust_poasta(blob[:-3])
    with pytest.raises(ValueError, match="variant"):
        load_rust_poasta(struct.pack("<I", 9) + blob[4:])
    with pytest.raises(ValueError, match="trailing"):
        load_rust_poasta(blob + b"\x00")
    # implausible length field
    bad = blob[:4] + struct.pack("<Q", 1 << 40) + blob[12:]
    with pytest.raises(ValueError, match="implausible|truncated"):
        load_rust_poasta(bad)
