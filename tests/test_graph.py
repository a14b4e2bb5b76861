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
