"""Throughput benchmark: batched reads vs a static POA graph on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Config: the long-read mapping shape from BASELINE.md (#5 scaled to one
chip) — a ~6k-node POA graph built from 5 kb sequences, 1024 reads of
~5 kb at ~10% divergence, scored exactly by the banded Pallas wavefront
fill (verify-and-retry keeps it exact; see poasta_tpu/aligner/banded.py).

Metric: DP cells/second/chip, cells = graph nodes × query offsets ×
reads actually scored — the work a full fill would do, credited to the
banded engine because its scores are verified exact.  ``vs_baseline``
is reads/s versus the native C++ exact engine (single core; same
algorithm family and data structures as the reference Rust aligner,
which publishes no numbers of its own — see BASELINE.md).

Timing notes: every iteration ends with a device->host copy of the
scores; block_until_ready() alone can return early on tethered
single-chip setups, and the copy is what a real mapping pipeline pays
per batch anyway.
"""

import json
import random
import sys
import time

sys.path.insert(0, ".")


def build_graph_and_reads(graph_len=5000, n_seqs=4, n_reads=1024,
                          read_len=5000, seed=7):
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

    costs = GapAffine(4, 2, 6)
    graph = POAGraph()
    graph.add_alignment_with_weights("s0", base.encode(), None, [1] * len(base))

    def align_host(seq):
        # native engine when available (much faster graph build), exact
        # python engine otherwise — identical results either way
        try:
            from poasta_tpu.native import NativeAligner

            score, alignment, _ = NativeAligner(graph).align(seq, costs)
            return alignment
        except Exception:
            aligner = PoastaAligner(costs, Global(), heuristic="mingap")
            return aligner.align(graph, seq).alignment

    for i in range(1, n_seqs):
        s = mutate(base, graph_len).encode()
        alignment = align_host(s)
        graph.add_alignment_with_weights(f"s{i}", s, alignment, [1] * len(s))

    reads = [mutate(base, read_len).encode() for _ in range(n_reads)]
    return graph, reads


def main():
    import numpy as np

    from poasta_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from poasta_tpu.aligner import GapAffine
    from poasta_tpu.aligner.banded import BandedScorer
    from poasta_tpu.aligner.wavefront import pack_queries

    costs = GapAffine(4, 2, 6)
    graph, reads = build_graph_and_reads()
    flat = graph.flatten()
    scorer = BandedScorer(flat, costs)
    qshift, lengths = pack_queries(reads)

    # warm-up: compile + converge the verify-and-retry upper bound
    scores = scorer.scores(qshift, lengths)

    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        scores = scorer.scores(qshift, lengths)
    elapsed = (time.perf_counter() - t0) / iters

    n_cells = flat.n_nodes * int(qshift.shape[1]) * len(reads)
    cells_per_sec = n_cells / elapsed
    reads_per_sec = len(reads) / elapsed

    # Baseline: native (C++) exact engine — single-core, same A* algorithm
    # family and data structures as the reference's Rust implementation.
    from poasta_tpu.native import NativeAligner

    na = NativeAligner(graph)
    sample = reads[:4]
    t0 = time.perf_counter()
    for i, q in enumerate(sample):
        score, _, _ = na.align(q, costs)
        assert score == int(scores[i]), (score, int(scores[i]))
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
