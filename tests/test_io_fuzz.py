"""Randomized I/O roundtrip invariants.

The MSA emit -> import -> emit cycle must be a fixed point, binary graph
save/load must preserve emitter output, and GFA emit must reload.  This
net caught the 1-char backtrace bug that leaked the virtual end node
into fused graphs.
"""

import io
import random

import pytest

from poasta_tpu.aligner import GapAffine, Global, PoastaAligner
from poasta_tpu.graphs import POAGraph
from poasta_tpu.io import (
    format_as_dot,
    graph_to_dot,
    graph_to_gfa,
    load_graph,
    load_graph_from_fasta_msa,
    load_graph_from_gfa,
    poa_graph_to_fasta,
    save_graph,
)

COSTS = GapAffine(4, 2, 6)


@pytest.mark.parametrize("seed", [5000, 5005, 5008, 5012, 5018, 5019, 5023])
def test_io_roundtrips(seed, tmp_path):
    rng = random.Random(seed)
    length = rng.choice([1, 3, 15, 50, 120])
    base = "".join(rng.choice("ACGT") for _ in range(length))

    def mutate(s):
        out = []
        for ch in s:
            r = rng.random()
            if r < 0.1:
                continue
            out.append(rng.choice("ACGT") if r < 0.2 else ch)
            if rng.random() < 0.08:
                out.append(rng.choice("ACGT"))
        return "".join(out) or "A"

    g = POAGraph()
    a = PoastaAligner(COSTS, Global(), heuristic="mingap")
    g.add_alignment_with_weights("s0", base.encode(), None, [1] * length)
    for i in range(1, rng.choice([2, 4])):
        s = mutate(base).encode()
        r = a.align(g, s)
        g.add_alignment_with_weights(f"s{i}", s, r.alignment, [1] * len(s))

    # MSA emit -> import -> emit is a fixed point
    b1 = io.StringIO()
    poa_graph_to_fasta(g, b1)
    p = tmp_path / "msa.fa"
    p.write_text(b1.getvalue())
    g2 = load_graph_from_fasta_msa(str(p))
    b2 = io.StringIO()
    poa_graph_to_fasta(g2, b2)
    assert b1.getvalue() == b2.getvalue()

    # binary save/load preserves emitter output
    bb = io.BytesIO()
    save_graph(g, bb)
    bb.seek(0)
    g3 = load_graph(bb)
    b3 = io.StringIO()
    poa_graph_to_fasta(g3, b3)
    assert b1.getvalue() == b3.getvalue()

    # GFA emit reloads; DOT emitters don't crash
    bg = io.StringIO()
    graph_to_gfa(g, bg)
    pg = tmp_path / "g.gfa"
    pg.write_text(bg.getvalue())
    g4, _segments = load_graph_from_gfa(str(pg))
    assert g4.node_count_with_start_and_end() >= 2
    graph_to_dot(g, io.StringIO())
    format_as_dot(g, io.StringIO())
