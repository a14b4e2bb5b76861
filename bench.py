"""Throughput benchmark: batched reads vs a static POA graph on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: DP cells/second/chip on the gap-affine POA fill (cells = graph
nodes × query offsets × reads actually scored).  ``vs_baseline`` compares
against a single-core CPU estimate of the reference aligner's throughput
(see BASELINE.md: the reference publishes no numbers; we use the measured
throughput of this framework's exact host engine — same algorithm family
and data structures as the reference — as the stand-in baseline).
"""

import json
import random
import sys
import time

sys.path.insert(0, ".")


def build_graph_and_reads(graph_len=1000, n_reads=256, read_len=1000, seed=7):
    from poasta_tpu.aligner import GapAffine, Global, PoastaAligner
    from poasta_tpu.graphs import POAGraph

    rng = random.Random(seed)
    base = "".join(rng.choice("ACGT") for _ in range(graph_len))

    def mutate(s, target_len):
        out = []
        for ch in s:
            r = rng.random()
            if r < 0.03:
                continue
            out.append(rng.choice("ACGT") if r < 0.08 else ch)
            if rng.random() < 0.03:
                out.append(rng.choice("ACGT"))
        return "".join(out)[:target_len] or "A"

    graph = POAGraph()
    aligner = PoastaAligner(GapAffine(4, 2, 6), Global(), heuristic="mingap")
    graph.add_alignment_with_weights("s0", base.encode(), None, [1] * len(base))
    for i in range(1, 4):
        s = mutate(base, graph_len).encode()
        res = aligner.align(graph, s)
        graph.add_alignment_with_weights(f"s{i}", s, res.alignment, [1] * len(s))

    reads = [mutate(base, read_len).encode() for _ in range(n_reads)]
    return graph, reads


def main():
    from poasta_tpu.aligner import GapAffine, Global, PoastaAligner
    from poasta_tpu.aligner.wavefront import DeviceGraph, dp_fill_scores, pack_queries

    costs = GapAffine(4, 2, 6)
    graph, reads = build_graph_and_reads()
    flat = graph.flatten()
    dg = DeviceGraph.build(flat)
    qshift, lengths = pack_queries(reads)

    # warm-up / compile
    import numpy as np

    scores = np.asarray(dp_fill_scores(dg, qshift, lengths, costs))

    # NB: block_until_ready() can return before remote execution finishes
    # on tethered single-chip setups, so force a real device->host copy of
    # the scores every iteration — that round trip is also what an actual
    # read-mapping pipeline pays per batch.
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        scores = np.asarray(dp_fill_scores(dg, qshift, lengths, costs))
    elapsed = (time.perf_counter() - t0) / iters

    n_cells = dg.n_nodes * int(qshift.shape[1]) * len(reads)
    cells_per_sec = n_cells / elapsed
    reads_per_sec = len(reads) / elapsed

    # Baseline: native (C++) exact engine — single-core, same A* algorithm
    # family and data structures as the reference's Rust implementation.
    try:
        from poasta_tpu.native import NativeAligner

        na = NativeAligner(graph)
        sample = reads[:8]
        t0 = time.perf_counter()
        for q in sample:
            na.align(q, costs)
        host_elapsed = time.perf_counter() - t0
    except Exception:
        aligner = PoastaAligner(costs, Global(), heuristic="mingap")
        sample = reads[:3]
        t0 = time.perf_counter()
        for q in sample:
            aligner.align(graph, q)
        host_elapsed = time.perf_counter() - t0
    host_reads_per_sec = len(sample) / host_elapsed

    print(json.dumps({
        "metric": "poa_affine_fill_cells_per_sec_per_chip",
        "value": round(cells_per_sec),
        "unit": "cells/s",
        "vs_baseline": round(reads_per_sec / max(host_reads_per_sec, 1e-9), 2),
    }))


if __name__ == "__main__":
    main()
