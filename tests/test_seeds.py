"""k-mer seeded corridor fills (aligner/seeds.py + ops/pallas_seed.py).

The seeded path must return BIT-IDENTICAL (score, end_rank, end_offset)
to the full bounded fill (``dp_fill_ends_free_with_ends``) — same
values, same largest-offset/lowest-rank tie-breaks (the reference's
end-state convention, ``gap_affine.rs:219-241``) — whenever it reports
a read as resolved, and must route every other read (no hits, failed
k-condition, unverified score) through the exact fallback.  Kernels run
in Pallas interpret mode (CPU); on-chip validation: run_tpu_tests.py.
"""

import random

import numpy as np
import pytest

from poasta_tpu.aligner import GapAffine
from poasta_tpu.aligner.costs import UNBOUNDED, EndsFree, included
from poasta_tpu.aligner.seeds import (
    CODE,
    SEED_K,
    KmerIndex,
    k_condition_holds,
)
from poasta_tpu.aligner.wavefront import pack_queries
from poasta_tpu.graphs import POAGraph
from poasta_tpu.ops.pallas_fill import set_interpret_mode
from poasta_tpu.parallel import BatchMapper

pytest.importorskip("poasta_tpu.native")

COSTS = GapAffine(4, 2, 6)
SEMI = EndsFree(UNBOUNDED, included(0), UNBOUNDED, UNBOUNDED)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("POASTA_SEED", "all")
    monkeypatch.setenv("POASTA_SEED_DEBUG", "1")
    set_interpret_mode(True)
    try:
        yield
    finally:
        set_interpret_mode(False)


def _mutate(rng, s, d):
    out = []
    for ch in s:
        r = rng.random()
        if r < d / 3:
            continue
        if r < 2 * d / 3:
            out.append(rng.choice("ACGT"))
            out.append(ch)
        elif r < d:
            out.append(rng.choice("ACGT"))
        else:
            out.append(ch)
    return "".join(out) or "A"


def _backbone_graph(rng, n, skip_every=97):
    base = "".join(rng.choice("ACGT") for _ in range(n))
    g = POAGraph()
    g.add_alignment_with_weights("s0", base.encode(), None, [1] * n)
    for v in range(0, n - 3, skip_every):
        g.add_edge(v, v + 3, 0, 1)
    g.post_process()
    return g, base


def _brute_kpaths(flat, k):
    """All k-length path strings + end ranks, by explicit DFS."""
    codes = CODE[flat.symbols]
    out = set()

    def walk(r, s):
        if codes[r] == 255:
            return
        s = s + (int(codes[r]),)
        if len(s) == k:
            km = 0
            for c in s:
                km = (km << 2) | c
            out.add((km, r))
            return
        for t in flat.succ_idx[flat.succ_ptr[r]:flat.succ_ptr[r + 1]]:
            walk(int(t), s)

    for r in range(flat.n_nodes):
        walk(r, ())
    return out


def test_kmer_index_matches_bruteforce():
    rng = random.Random(3)
    g, _ = _backbone_graph(rng, 120, skip_every=17)
    flat = g.flatten()
    idx = KmerIndex(flat, k=6)
    assert idx.ok
    # the index stores end-rank POTENTIALS (all seed_bounds consumes);
    # distinct k-paths may repeat a (kmer, end rank) pair, so compare
    # as sets of (kmer, dmin, dmax)
    brute = _brute_kpaths(flat, 6)
    dmin = flat.min_dist_from_start
    dmax = flat.max_dist_from_start
    brute_pots = {(km, int(dmin[r]), int(dmax[r])) for km, r in brute}
    got_pots = set(zip(idx.kmers.tolist(), idx.post_dmin.tolist(),
                       idx.post_dmax.tolist()))
    assert got_pots == brute_pots


def test_kmer_index_budget_guard():
    # a dense bubble lattice blows the path budget -> ok stays False
    rng = random.Random(5)
    g = POAGraph()
    base = "".join(rng.choice("ACGT") for _ in range(64))
    g.add_alignment_with_weights("s0", base.encode(), None, [1] * 64)
    # node 0/1 are the virtual start/end; sequence chars start at 2
    for a in range(2, 60):
        for b in range(a + 2, min(a + 6, 63)):
            g.add_edge(a, b, 0, 1)
    g.post_process()
    idx = KmerIndex(g.flatten(), k=12, budget_factor=2)
    assert not idx.ok


def test_seed_bounds_cover_planted_locus():
    rng = random.Random(7)
    g, base = _backbone_graph(rng, 400)
    flat = g.flatten()
    idx = KmerIndex(flat, k=8)
    assert idx.ok
    a = 123
    read = base[a:a + 80].encode()
    q_np, l_np = pack_queries([read], place_on_device=False)
    alpha_min, beta_max, nhits = idx.seed_bounds(q_np, l_np)
    assert nhits[0] > 0
    # the exact locus diagonal must lie inside [alpha_min, beta_max]:
    # cell (rank of node a+j-1, j) for consumed chars j
    dmin = flat.min_dist_from_start
    dmax = flat.max_dist_from_start
    # char i of the backbone is node i+2 (0/1 are virtual start/end)
    r_end = int(flat.rank_of_node[a + 79 + 2])
    assert alpha_min[0] <= 80 - int(dmax[r_end])
    assert beta_max[0] >= 80 - int(dmin[r_end])


def test_k_condition():
    assert k_condition_holds(5000, 400, COSTS, 14)
    assert not k_condition_holds(200, 400, COSTS, 14)
    assert not k_condition_holds(5000, 400, GapAffine(0, 0, 6), 14)


def _seeded_case(rng, n_nodes, n_reads, read_len, div):
    g, base = _backbone_graph(rng, n_nodes)
    reads = []
    for _ in range(n_reads):
        a = rng.randrange(0, n_nodes - read_len)
        reads.append(_mutate(rng, base[a:a + read_len], div).encode())
    return g, base, reads


def test_seeded_fill_matches_full_fill():
    rng = random.Random(11)
    g, base, reads = _seeded_case(rng, 1400, 64, 700, 0.01)
    # a garbage read must take the proven fallback tail
    reads[7] = bytes("".join(rng.choice("ACGT") for _ in range(700)),
                     "ascii")
    m = BatchMapper(g, COSTS, aln_type=SEMI)
    qshift, lengths = pack_queries(reads)
    sc0, er0, ej0 = m._ends_free_scores(reads, qshift, lengths, False)
    assert m._seed_ub_hint  # hint learned from the first (full) fill
    sc1, er1, ej1 = m._ends_free_scores(reads, qshift, lengths, False)
    st = m.last_seed_stats
    assert st["seeded"] >= 56, st
    assert st["seed_tail"] >= 1, st  # the garbage read
    ref_sc, ref_er, ref_ej = m._fill_ends_free_capped(qshift, lengths,
                                                      False)
    np.testing.assert_array_equal(np.asarray(sc1), np.asarray(ref_sc))
    np.testing.assert_array_equal(np.asarray(er1), np.asarray(ref_er))
    np.testing.assert_array_equal(np.asarray(ej1), np.asarray(ref_ej))
    np.testing.assert_array_equal(np.asarray(sc0), np.asarray(sc1))


def test_seeded_alignments_end_to_end():
    """align_batch through the seeded path: cost == score, same output
    as with seeding disabled."""
    import os

    rng = random.Random(13)
    g, base, reads = _seeded_case(rng, 1200, 8, 600, 0.01)
    m = BatchMapper(g, COSTS, aln_type=SEMI)
    out0 = m.align_batch(reads)  # learns the hint
    out1 = m.align_batch(reads)  # seeded
    assert getattr(m, "last_seed_stats", {}).get("seeded", 0) >= 6
    os.environ["POASTA_SEED"] = "0"
    try:
        m2 = BatchMapper(g, COSTS, aln_type=SEMI)
        ref = m2.align_batch(reads)
    finally:
        os.environ["POASTA_SEED"] = "all"
    for (s1, a1), (s0, a0), (sr, ar) in zip(out1, out0, ref):
        assert s1 == s0 == sr
        assert list(a1) == list(a0) == list(ar)


def test_unbounded_qry_end_never_seeds():
    """Unbounded qry_free_end -> jlo ~ 1 -> the k-condition can never
    hold, so the exact fallback serves (correctness gate, not a skip)."""
    rng = random.Random(17)
    g, base, reads = _seeded_case(rng, 1200, 8, 600, 0.01)
    cfg = EndsFree(UNBOUNDED, UNBOUNDED, UNBOUNDED, UNBOUNDED)
    m = BatchMapper(g, COSTS, aln_type=cfg)
    qshift, lengths = pack_queries(reads)
    m._ends_free_scores(reads, qshift, lengths, False)
    sc, er, ej = m._ends_free_scores(reads, qshift, lengths, False)
    assert getattr(m, "last_seed_stats", None) is None
    ref = m._fill_ends_free_capped(qshift, lengths, False)
    np.testing.assert_array_equal(np.asarray(sc), np.asarray(ref[0]))
