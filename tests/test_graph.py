"""POA graph structure tests (mirrors reference poa.rs / tools.rs suites)."""

from poasta_tpu.graphs import POAGraph, rev_postorder_nodes
from poasta_tpu.aligner.alignment import AlignedPair


def test_empty_graph_invariants():
    g = POAGraph()
    assert g.node_count() == 0
    assert g.node_count_with_start_and_end() == 2
    assert g.is_empty()


def test_add_sequence_chain():
    g = POAGraph()
    g.add_alignment_with_weights("s1", b"ACGT", None, [1] * 4)
    assert g.node_count() == 4
    assert g.get_symbol_char(2) == "A"
    assert g.get_symbol_char(5) == "T"
    # start wired to first node, last node to end
    assert list(g.successors(g.start_node)) == [2]
    assert list(g.predecessors(g.end_node)) == [5]


def test_fusion_reuses_matching_nodes():
    g = POAGraph()
    g.add_alignment_with_weights("s1", b"ACG", None, [1] * 3)
    aln = [AlignedPair(2, 0), AlignedPair(3, 1), AlignedPair(4, 2)]
    g.add_alignment_with_weights("s2", b"ACG", aln, [1] * 3)
    # identical sequence: no new nodes
    assert g.node_count() == 3


def test_mismatch_creates_aligned_clique():
    g = POAGraph()
    g.add_alignment_with_weights("s1", b"ACG", None, [1] * 3)
    aln = [AlignedPair(2, 0), AlignedPair(3, 1), AlignedPair(4, 2)]
    g.add_alignment_with_weights("s2", b"ATG", aln, [1] * 3)
    assert g.node_count() == 4
    new_node = 5
    assert g.get_symbol_char(new_node) == "T"
    assert new_node in g.aligned_nodes[3]
    assert 3 in g.aligned_nodes[new_node]


def test_rev_postorder_small_branching():
    g = POAGraph()
    n1 = g.add_node(ord("A"))
    n2 = g.add_node(ord("B"))
    n3 = g.add_node(ord("C"))
    n4 = g.add_node(ord("D"))
    g.add_edge(n1, n2, 0, 1)
    g.add_edge(n1, n3, 0, 1)
    g.add_edge(n2, n4, 0, 1)
    g.add_edge(n3, n4, 0, 1)
    g.post_process()
    order = rev_postorder_nodes(g)
    assert order[0] == g.start_node
    pos = {n: i for i, n in enumerate(order)}
    assert pos[n1] < pos[n2] and pos[n1] < pos[n3]
    assert pos[n4] > pos[n2] and pos[n4] > pos[n3]


def test_toposort_respects_edges():
    g = POAGraph()
    g.add_alignment_with_weights("s1", b"ACGTACGT", None, [1] * 8)
    ranks = g.get_node_ranks()
    for e in g.edge_references():
        assert ranks[e.source] < ranks[e.target]


def test_flatten_csr():
    g = POAGraph()
    g.add_alignment_with_weights("s1", b"ACGT", None, [1] * 4)
    flat = g.flatten()
    assert flat.n_nodes == 6
    assert flat.symbols[0] == ord("#")
    assert flat.symbols[-1] == ord("$")
    # chain: each rank's predecessor is rank-1
    for r in range(1, flat.n_nodes):
        preds = flat.pred_idx[flat.pred_ptr[r] : flat.pred_ptr[r + 1]]
        assert list(preds) == [r - 1]
    assert flat.min_dist_to_end[0] == flat.n_nodes - 1


def test_lowering_scales_to_100k_nodes():
    """Graph lowering is numpy-vectorized: a 100k-node graph (BASELINE
    config #5 scale) must flatten + lower in about a second, not the
    O(n*P) Python-loop minutes it would otherwise take."""
    import random
    import time

    import numpy as np

    from poasta_tpu.aligner.wavefront import DeviceGraph
    from poasta_tpu.graphs import POAGraph

    rng = random.Random(3)
    N = 100_000
    seq = "".join(rng.choice("ACGT") for _ in range(N)).encode()
    g = POAGraph()
    g.add_alignment_with_weights("s0", seq, None, [1] * N)
    for v in range(0, N - 3, 100):
        g.add_edge(v, v + 3, 0, 1)
    g.post_process()

    import jax.numpy as jnp

    jnp.zeros(1)  # absorb one-time backend init
    t0 = time.perf_counter()
    flat = g.flatten()
    dg = DeviceGraph.build(flat)
    dt = time.perf_counter() - t0
    assert dg.n_nodes == N + 2
    assert dg.window <= 4
    # generous bound (CI machines vary); the old path took >1.5s hot
    assert dt < 4.0, f"lowering took {dt:.2f}s"

    # spot-check the vectorized dist sweeps against per-node recomputation
    idx = np.asarray([0, 1, 5, 99, 100, 101, N // 2, N, N + 1])
    for r in idx:
        succs = flat.succ_idx[flat.succ_ptr[r]: flat.succ_ptr[r + 1]]
        if len(succs):
            assert flat.min_dist_to_end[r] == min(
                flat.min_dist_to_end[s] for s in succs) + 1
            assert flat.max_dist_to_end[r] == max(
                flat.max_dist_to_end[s] for s in succs) + 1
        preds = flat.pred_idx[flat.pred_ptr[r]: flat.pred_ptr[r + 1]]
        if len(preds):
            assert flat.min_dist_from_start[r] == min(
                flat.min_dist_from_start[p] for p in preds) + 1
            assert flat.max_dist_from_start[r] == max(
                flat.max_dist_from_start[p] for p in preds) + 1


def test_dist_sweeps_match_naive_on_random_dags():
    """Vectorized chain-run dist sweeps == per-node recurrence, fuzzed over
    random DAGs and chain-heavy graphs (the vectorized fast path)."""
    import numpy as np

    from poasta_tpu.graphs.flat import (
        _dist_sweep_backward,
        _dist_sweep_forward,
    )

    def build_csr(pred_lists, n):
        ptr = np.zeros(n + 1, np.int32)
        for i, l in enumerate(pred_lists):
            ptr[i + 1] = ptr[i] + len(l)
        idx = (np.concatenate([np.asarray(l, np.int32)
                               for l in pred_lists if l])
               if ptr[-1] else np.zeros(0, np.int32))
        succ_lists = [[] for _ in range(n)]
        for r, l in enumerate(pred_lists):
            for p in l:
                succ_lists[p].append(r)
        sptr = np.zeros(n + 1, np.int32)
        for i, l in enumerate(succ_lists):
            sptr[i + 1] = sptr[i] + len(l)
        sidx = (np.concatenate([np.asarray(l, np.int32)
                                for l in succ_lists if l])
                if sptr[-1] else np.zeros(0, np.int32))
        return ptr, idx, sptr, sidx, succ_lists

    def naive(pred_lists, succ_lists, n):
        min_d = np.zeros(n, np.int64)
        max_d = np.zeros(n, np.int64)
        for r in range(n - 2, -1, -1):
            s = succ_lists[r]
            if s:
                min_d[r] = min(min_d[x] for x in s) + 1
                max_d[r] = max(max_d[x] for x in s) + 1
        ds_min = np.zeros(n, np.int64)
        ds_max = np.zeros(n, np.int64)
        for r in range(1, n):
            p = pred_lists[r]
            if p:
                ds_min[r] = min(ds_min[x] for x in p) + 1
                ds_max[r] = max(ds_max[x] for x in p) + 1
        return min_d, max_d, ds_min, ds_max

    rng = np.random.default_rng(1)
    for trial in range(120):
        n = int(rng.integers(2, 120))
        if trial % 2:  # random DAG
            pred_lists = [[]]
            for r in range(1, n):
                k = int(rng.integers(1, min(4, r + 1)))
                pred_lists.append(list(rng.choice(r, size=k, replace=False)))
        else:  # chain + a few skip edges (the vectorized fast path)
            pred_lists = [[]] + [[r - 1] for r in range(1, n)]
            for _ in range(int(rng.integers(0, 5))):
                if n < 3:
                    break
                r = int(rng.integers(2, n))
                pred_lists[r].append(int(rng.integers(0, r - 1)))
        ptr, idx, sptr, sidx, succ_lists = build_csr(pred_lists, n)
        min_d, max_d, ds_min, ds_max = naive(pred_lists, succ_lists, n)
        a, b = _dist_sweep_backward(n, sptr, sidx)
        c, d = _dist_sweep_forward(n, ptr, idx)
        assert (a == min_d).all() and (b == max_d).all(), trial
        assert (c == ds_min).all() and (d == ds_max).all(), trial
