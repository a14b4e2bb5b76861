"""Device-side traceback (ops/pallas_trace.py) vs the native engine.

The pointer-emitting corridor fill + device decode must reproduce the
native backtrace's alignments BYTE-IDENTICALLY (same priority rules
over the same DP values: ``native/engine.cpp align_banded_impl``,
mirroring the reference's score-difference backtrace
``gap_affine.rs:550-657``), in both the global and the end-anchored
ends-free modes.  Runs the kernels in Pallas interpret mode (CPU).
"""

import random

import numpy as np
import pytest

from poasta_tpu.aligner import GapAffine, Global, PoastaAligner
from poasta_tpu.aligner.costs import UNBOUNDED, EndsFree, included
from poasta_tpu.aligner.wavefront import (
    DeviceGraph,
    dp_fill_ends_free_with_ends,
    dp_fill_scores,
    pack_queries,
)
from poasta_tpu.graphs import POAGraph
from poasta_tpu.ops.pallas_fill import set_interpret_mode
from poasta_tpu.ops.pallas_trace import pallas_trace_align

pytest.importorskip("poasta_tpu.native")
from poasta_tpu.native import NativeAligner  # noqa: E402


@pytest.fixture(autouse=True)
def _interpret():
    set_interpret_mode(True)
    try:
        yield
    finally:
        set_interpret_mode(False)


def _mutate(rng, s, d):
    out = []
    for ch in s:
        r = rng.random()
        if r < d:
            continue
        out.append(rng.choice("ACGT") if r < 2 * d else ch)
        if rng.random() < d:
            out.append(rng.choice("ACGT"))
    return "".join(out) or "A"


def _fused_graph(rng, costs, length=160, nseq=3, d=0.08):
    base = "".join(rng.choice("ACGT") for _ in range(length))
    g = POAGraph()
    al = PoastaAligner(costs, Global(), heuristic="mingap")
    g.add_alignment_with_weights("s0", base.encode(), None, [1] * length)
    for i in range(1, nseq):
        s = _mutate(rng, base, d).encode()
        r = al.align(g, s)
        g.add_alignment_with_weights(f"s{i}", s, r.alignment, [1] * len(s))
    return g, base


def _check_identical(dev, naln, b):
    assert dev is not None, f"read {b} not verified by any tier"
    got = list(zip(dev.rpos_arr.tolist(), dev.qpos_arr.tolist()))
    want = list(zip(
        np.where(naln.rpos_arr < 0, -1, naln.rpos_arr).tolist(),
        np.where(naln.qpos_arr < 0, -1, naln.qpos_arr).tolist()))
    assert got == want, (b, got[:5], want[:5])


@pytest.mark.parametrize("seed,costs", [
    (5, GapAffine(4, 2, 6)),
    (17, GapAffine(4, 2, 6)),
    (29, GapAffine(3, 1, 9)),  # randomized-cost shape
])
def test_global_trace_matches_native(seed, costs):
    rng = random.Random(seed)
    g, base = _fused_graph(rng, costs)
    flat = g.flatten()
    dg = DeviceGraph.build(flat)
    queries = [_mutate(rng, base, 0.08).encode() for _ in range(5)]
    # a big-indel read exercises wide corridors / tier retry
    queries.append((base[:40] + base[120:]).encode())
    qshift, lengths = pack_queries(queries)
    scores = np.asarray(dp_fill_scores(dg, qshift, lengths, costs))
    na = NativeAligner(g)
    outs = pallas_trace_align(dg, flat, qshift, lengths, costs, scores)
    for b, q in enumerate(queries):
        ns, naln = na.align_banded(q, costs, ub=int(scores[b]))
        assert ns == int(scores[b])
        _check_identical(outs[b], naln, b)


def test_anchored_ends_free_trace_matches_native():
    costs = GapAffine(4, 2, 6)
    rng = random.Random(9)
    base = "".join(rng.choice("ACGT") for _ in range(600))
    g = POAGraph()
    g.add_alignment_with_weights("s0", base.encode(), None, [1] * 600)
    flat = g.flatten()
    dg = DeviceGraph.build(flat)
    queries = []
    for _ in range(5):
        a = rng.randrange(0, 400)
        queries.append(_mutate(rng, base[a:a + 150], 0.05).encode())
    qshift, lengths = pack_queries(queries)
    cfg = EndsFree(UNBOUNDED, included(0), UNBOUNDED, UNBOUNDED)
    sc, er, ej = (np.asarray(v) for v in dp_fill_ends_free_with_ends(
        dg, flat, qshift, lengths, costs, cfg))
    na = NativeAligner(g)
    outs = pallas_trace_align(dg, flat, qshift, lengths, costs, sc,
                              anchor_r=er, anchor_j=ej, free_start=True)
    node_of_rank = flat.node_of_rank
    for b, q in enumerate(queries):
        ns, naln = na.align_anchored(q, costs, int(node_of_rank[er[b]]),
                                     int(ej[b]), int(sc[b]),
                                     free_start=True)
        assert ns == int(sc[b])
        _check_identical(outs[b], naln, b)


def test_trace_edge_cases():
    costs = GapAffine(4, 2, 6)
    rng = random.Random(41)
    g, base = _fused_graph(rng, costs, length=80, nseq=2)
    flat = g.flatten()
    dg = DeviceGraph.build(flat)
    queries = [
        base.encode(),            # perfect match
        b"A",                     # single symbol
        (base * 2).encode(),      # query >> graph (long insertion)
        base[:20].encode(),       # query << graph (long deletion)
    ]
    qshift, lengths = pack_queries(queries)
    scores = np.asarray(dp_fill_scores(dg, qshift, lengths, costs))
    na = NativeAligner(g)
    outs = pallas_trace_align(dg, flat, qshift, lengths, costs, scores)
    for b, q in enumerate(queries):
        ns, naln = na.align_banded(q, costs, ub=int(scores[b]))
        assert ns == int(scores[b])
        _check_identical(outs[b], naln, b)


def test_trace_cost_equals_score():
    """Independent invariant: the decoded pairs re-cost to the exact
    score (not just equality with the native path)."""
    from poasta_tpu.aligner.wavefront import alignment_cost

    costs = GapAffine(4, 2, 6)
    rng = random.Random(53)
    g, base = _fused_graph(rng, costs, length=120, nseq=3)
    flat = g.flatten()
    dg = DeviceGraph.build(flat)
    queries = [_mutate(rng, base, 0.1).encode() for _ in range(4)]
    qshift, lengths = pack_queries(queries)
    scores = np.asarray(dp_fill_scores(dg, qshift, lengths, costs))
    outs = pallas_trace_align(dg, flat, qshift, lengths, costs, scores)
    for b, q in enumerate(queries):
        assert outs[b] is not None
        assert alignment_cost(g, q, outs[b], costs) == int(scores[b])


def test_big_trace_matches_native(monkeypatch):
    """The HBM-streamed big trace kernel (chunked rank-record DMA, the
    pallas_fill big-kernel pattern) must emit the same pointer chains as
    the prefetch-table kernel — forced on by stubbing the SMEM fit check,
    global + anchored ends-free."""
    import poasta_tpu.ops.pallas_trace as pt

    monkeypatch.setattr(pt, "_prefetch_fits", lambda dg, extra: False)
    costs = GapAffine(4, 2, 6)
    rng = random.Random(71)
    g, base = _fused_graph(rng, costs, length=150, nseq=3)
    flat = g.flatten()
    dg = DeviceGraph.build(flat)
    queries = [_mutate(rng, base, 0.08).encode() for _ in range(4)]
    queries.append((base[:30] + base[110:]).encode())  # tier-retry read
    qshift, lengths = pack_queries(queries)
    scores = np.asarray(dp_fill_scores(dg, qshift, lengths, costs))
    na = NativeAligner(g)
    outs = pt.pallas_trace_align(dg, flat, qshift, lengths, costs, scores)
    for b, q in enumerate(queries):
        ns, naln = na.align_banded(q, costs, ub=int(scores[b]))
        assert ns == int(scores[b])
        _check_identical(outs[b], naln, b)

    # anchored ends-free through the big kernel
    base2 = "".join(rng.choice("ACGT") for _ in range(500))
    g2 = POAGraph()
    g2.add_alignment_with_weights("s0", base2.encode(), None, [1] * 500)
    flat2 = g2.flatten()
    dg2 = DeviceGraph.build(flat2)
    subs = [_mutate(rng, base2[100:300], 0.05).encode() for _ in range(3)]
    qshift2, lengths2 = pack_queries(subs)
    cfg = EndsFree(UNBOUNDED, included(0), UNBOUNDED, UNBOUNDED)
    sc, er, ej = (np.asarray(v) for v in dp_fill_ends_free_with_ends(
        dg2, flat2, qshift2, lengths2, costs, cfg))
    na2 = NativeAligner(g2)
    outs2 = pt.pallas_trace_align(dg2, flat2, qshift2, lengths2, costs,
                                  sc, anchor_r=er, anchor_j=ej,
                                  free_start=True)
    node_of_rank = flat2.node_of_rank
    for b, q in enumerate(subs):
        ns, naln = na2.align_anchored(q, costs, int(node_of_rank[er[b]]),
                                      int(ej[b]), int(sc[b]),
                                      free_start=True)
        assert ns == int(sc[b])
        _check_identical(outs2[b], naln, b)


def test_mapper_routes_through_device_trace():
    """BatchMapper wiring: with the trace path enabled (interpret mode
    here), the banded global path and the anchored ends-free path must
    serve reads from the device decode — and emit the same pairs the
    host path produces."""
    from poasta_tpu.parallel import BatchMapper

    costs = GapAffine(4, 2, 6)
    rng = random.Random(77)
    g, base = _fused_graph(rng, costs, length=140, nseq=2)
    queries = [_mutate(rng, base, 0.08).encode() for _ in range(4)]

    bm = BatchMapper(g, costs)
    if not bm._init_banded(False):
        pytest.skip("native engine unavailable")
    qshift, lengths = pack_queries(queries)
    dev_out = bm._align_batch_banded(queries, qshift, lengths)
    assert bm.last_banded_stats["device_traced"] == len(queries)

    import os

    os.environ["POASTA_DEVICE_TRACE"] = "0"
    try:
        host_out = bm._align_batch_banded(queries, qshift, lengths)
        assert bm.last_banded_stats["device_traced"] == 0
    finally:
        os.environ.pop("POASTA_DEVICE_TRACE", None)
    for (ds, da), (hs, ha) in zip(dev_out, host_out):
        assert ds == hs
        assert list(da) == list(ha)

    # ends-free anchored wiring
    cfg = EndsFree(UNBOUNDED, included(0), UNBOUNDED, UNBOUNDED)
    sub = [base[20:120].encode(), _mutate(rng, base[10:100], 0.05).encode()]
    bm2 = BatchMapper(g, costs, aln_type=cfg)
    ef_dev = bm2.align_batch(sub)
    assert bm2.last_ends_free_stats["device_traced"] == len(sub)
    os.environ["POASTA_DEVICE_TRACE"] = "0"
    try:
        ef_host = bm2.align_batch(sub)
        assert bm2.last_ends_free_stats["device_traced"] == 0
    finally:
        os.environ.pop("POASTA_DEVICE_TRACE", None)
    for (ds, da), (hs, ha) in zip(ef_dev, ef_host):
        assert ds == hs
        assert list(da) == list(ha)
