"""Flat SoA lowering of a POA graph for device kernels.

The TPU wavefront engine never touches the mutable host graph: it consumes a
rank-ordered structure-of-arrays view.  Nodes are laid out by topological
rank; adjacency is CSR over ranks.  POA graphs are overwhelmingly unbranched
chains, so the common-case predecessor of rank ``r`` is rank ``r-1``; the CSR
gather only pays for branch nodes.

This replaces the reference's petgraph object + per-node hash storage
(reference: ``src/graphs/poa.rs:85-95``, ``src/aligner/scoring/gap_affine.rs:442-466``)
with dense arrays ready for ``lax.scan``/Pallas consumption.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING, List

import numpy as np

if TYPE_CHECKING:
    from .poa import POAGraph

MAX_PREDS_DENSE = 4  # padded predecessor table width for the kernel fast path


@dataclass(frozen=True)
class FlatGraph:
    """Rank-ordered SoA view of a POA graph.

    Attributes
    ----------
    symbols:
        uint8 symbol per rank (rank 0 is the virtual start ``#``; the last
        rank is the virtual end ``$``).
    node_of_rank / rank_of_node:
        mappings between mutable-graph node indices and ranks.
    pred_ptr / pred_idx:
        CSR predecessor lists *in rank space*, predecessors listed in the
        graph's iteration order (newest edge first).
    succ_ptr / succ_idx:
        CSR successor lists in rank space.
    preds_dense / npreds:
        ``(n, MAX_PREDS_DENSE)`` padded predecessor ranks (pad = 0) plus the
        per-rank predecessor count; kernels use this when
        ``max(npreds) <= MAX_PREDS_DENSE`` to avoid ragged gathers.
    min_dist_to_end / max_dist_to_end:
        per-rank shortest/longest path length (in nodes) to the end node;
        host-precomputed heuristic bounds (reference:
        ``src/bubbles/index.rs:133-148``) shipped as dense arrays.
    """

    symbols: np.ndarray
    node_of_rank: np.ndarray
    rank_of_node: np.ndarray
    pred_ptr: np.ndarray
    pred_idx: np.ndarray
    succ_ptr: np.ndarray
    succ_idx: np.ndarray
    preds_dense: np.ndarray
    npreds: np.ndarray
    min_dist_to_end: np.ndarray
    max_dist_to_end: np.ndarray
    min_dist_from_start: np.ndarray
    max_dist_from_start: np.ndarray

    @property
    def n_nodes(self) -> int:
        return int(self.symbols.shape[0])

    @property
    def start_rank(self) -> int:
        return 0

    @property
    def end_rank(self) -> int:
        return self.n_nodes - 1

    @property
    def max_in_degree(self) -> int:
        return int(self.npreds.max()) if self.n_nodes else 0

    @staticmethod
    def from_poa_graph(graph: "POAGraph") -> "FlatGraph":
        order = graph.topological_sorted
        if not order:
            graph.post_process()
            order = graph.topological_sorted
        n = len(order)
        node_of_rank = np.asarray(order, dtype=np.int32)
        rank_of_node = np.zeros(n, dtype=np.int32)
        for r, node in enumerate(order):
            rank_of_node[node] = r

        symbols = np.asarray([graph.symbols[v] for v in order], dtype=np.uint8)

        pred_lists: List[List[int]] = []
        succ_lists: List[List[int]] = []
        for v in order:
            pred_lists.append([int(rank_of_node[p]) for p in graph.predecessors(v)])
            succ_lists.append([int(rank_of_node[s]) for s in graph.successors(v)])

        def csr(lists: List[List[int]]):
            ptr = np.zeros(n + 1, dtype=np.int32)
            for i, l in enumerate(lists):
                ptr[i + 1] = ptr[i] + len(l)
            idx = np.zeros(int(ptr[-1]), dtype=np.int32)
            for i, l in enumerate(lists):
                idx[ptr[i] : ptr[i + 1]] = l
            return ptr, idx

        pred_ptr, pred_idx = csr(pred_lists)
        succ_ptr, succ_idx = csr(succ_lists)

        npreds = np.asarray([len(l) for l in pred_lists], dtype=np.int32)
        width = max(MAX_PREDS_DENSE, int(npreds.max()) if n else 1)
        preds_dense = np.zeros((n, width), dtype=np.int32)
        for i, l in enumerate(pred_lists):
            preds_dense[i, : len(l)] = l

        # Shortest/longest distance (edge count) to the end node, by reverse
        # topological sweep.  End node distance is 0; the start node's value
        # covers the whole graph.
        BIG = np.iinfo(np.int32).max // 4
        min_d = np.full(n, BIG, dtype=np.int64)
        max_d = np.zeros(n, dtype=np.int64)
        end_rank = n - 1
        min_d[end_rank] = 0
        for r in range(n - 2, -1, -1):
            succs = succ_lists[r]
            if succs:
                min_d[r] = min(min_d[s] for s in succs) + 1
                max_d[r] = max(max_d[s] for s in succs) + 1
            else:
                # isolated (shouldn't happen post-process); treat as sink
                min_d[r] = 0
                max_d[r] = 0

        # min/max distance (edge count) from the start node, forward sweep;
        # used by the banded fill's per-rank feasible offset windows.
        ds_min = np.full(n, BIG, dtype=np.int64)
        ds_max = np.zeros(n, dtype=np.int64)
        ds_min[0] = 0
        for r in range(1, n):
            preds = pred_lists[r]
            if preds:
                ds_min[r] = min(ds_min[p] for p in preds) + 1
                ds_max[r] = max(ds_max[p] for p in preds) + 1
            else:
                ds_min[r] = 0
                ds_max[r] = 0

        return FlatGraph(
            symbols=symbols,
            node_of_rank=node_of_rank,
            rank_of_node=rank_of_node,
            pred_ptr=pred_ptr,
            pred_idx=pred_idx,
            succ_ptr=succ_ptr,
            succ_idx=succ_idx,
            preds_dense=preds_dense,
            npreds=npreds,
            min_dist_to_end=min_d.astype(np.int32),
            max_dist_to_end=max_d.astype(np.int32),
            min_dist_from_start=ds_min.astype(np.int32),
            max_dist_from_start=ds_max.astype(np.int32),
        )
