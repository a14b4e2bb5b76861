"""The vectorized GAF fast path is bit-identical to the scalar emitter.

The serving path hands the GAF emitter :class:`ArrayAlignment`s; the
numpy fast path (``io/gaf.py::_alignment_to_gaf_arrays``) must reproduce
the scalar per-pair loop — including the reference's quirks (leading
is_insertion() pairs advancing query_start, single trailing-indel-run
trim, consecutive-segment dedup; ``gaf.rs:152-304``).
"""

import random

import numpy as np
import pytest

from poasta_tpu.aligner.alignment import AlignedPair, ArrayAlignment
from poasta_tpu.io import NodeSegmentResolver, alignment_to_gaf
from poasta_tpu.io.gfa import load_graph_from_gfa

GFA = """H\tVN:Z:1.0
S\ts1\tACGTAC
S\ts2\tGGG
S\ts3\tTTACG
S\ts4\tCAAT
L\ts1\t+\ts2\t+\t0M
L\ts1\t+\ts3\t+\t0M
L\ts2\t+\ts4\t+\t0M
L\ts3\t+\ts4\t+\t0M
"""


@pytest.fixture(scope="module")
def gfa_graph(tmp_path_factory):
    p = tmp_path_factory.mktemp("gaf") / "t.gfa"
    p.write_text(GFA)
    return load_graph_from_gfa(str(p))


def _to_arrays(aln):
    rp = np.array([-1 if p.rpos is None else p.rpos for p in aln],
                  dtype=np.int32)
    qp = np.array([-1 if p.qpos is None else p.qpos for p in aln],
                  dtype=np.int32)
    return ArrayAlignment(rp, qp)


def _random_alignment(graph, resolver, rng):
    """A random plausible alignment: leading junk, a walk over graph
    nodes with match/mismatch/D ops interleaved with I ops, optional
    trailing indels; returns (pairs, query_bytes)."""
    in_seg = [n for n in range(len(resolver.seg_ix_arr))
              if resolver.seg_ix_arr[n] >= 0]
    node = rng.choice(in_seg)
    pairs = []
    q = []
    # leading unaligned pairs (both flavors)
    for _ in range(rng.randrange(3)):
        if rng.random() < 0.5:
            pairs.append(AlignedPair(node, None))  # "insertion" quirk
        else:
            q.append(rng.choice(b"ACGT"))
            pairs.append(AlignedPair(None, len(q) - 1))
    steps = rng.randrange(1, 12)
    for _ in range(steps):
        r = rng.random()
        if r < 0.6:  # aligned (match or mismatch)
            sym = graph.get_symbol(node)
            q.append(sym if rng.random() < 0.8 else rng.choice(b"ACGT"))
            pairs.append(AlignedPair(node, len(q) - 1))
        elif r < 0.8:  # deletion: graph node, no query
            pairs.append(AlignedPair(node, None))
        else:  # insertion: query only, stay on node
            q.append(rng.choice(b"ACGT"))
            pairs.append(AlignedPair(None, len(q) - 1))
            continue
        succs = [s for s in graph.successors(node)
                 if resolver.seg_ix_arr[s] >= 0]
        if not succs:
            break
        node = rng.choice(succs)
    # trailing indel run (tests the single-run trim)
    for _ in range(rng.randrange(3)):
        if rng.random() < 0.5:
            pairs.append(AlignedPair(node, None))
        else:
            q.append(rng.choice(b"ACGT"))
            pairs.append(AlignedPair(None, len(q) - 1))
    return pairs, bytes(q)


@pytest.mark.parametrize("seed", range(40))
def test_vectorized_gaf_matches_scalar_fuzz(gfa_graph, seed):
    graph, segments = gfa_graph
    resolver = NodeSegmentResolver(graph, segments)
    rng = random.Random(seed)
    for _ in range(25):
        pairs, q = _random_alignment(graph, resolver, rng)
        scalar = alignment_to_gaf(graph, segments, "r", q, pairs, resolver)
        vec = alignment_to_gaf(graph, segments, "r", q, _to_arrays(pairs),
                               resolver)
        if scalar is None:
            assert vec is None
        else:
            assert str(vec) == str(scalar), (pairs, q)


def test_vectorized_gaf_no_aligned_pair(gfa_graph):
    graph, segments = gfa_graph
    resolver = NodeSegmentResolver(graph, segments)
    aln = _to_arrays([AlignedPair(2, None), AlignedPair(None, 0)])
    assert alignment_to_gaf(graph, segments, "r", b"A", aln, resolver) is None


def test_vectorized_gaf_empty(gfa_graph):
    graph, segments = gfa_graph
    resolver = NodeSegmentResolver(graph, segments)
    aln = _to_arrays([])
    assert alignment_to_gaf(graph, segments, "r", b"", aln, resolver) is None
