"""Native banded-fill A/B harness (host-only; no accelerator needed).

Times ``NativeAligner.align_banded`` on the two serving shapes it owns:

* fusion  — 20 kb sequences vs a ~20k-node fused graph with a seeded ub
            (the ``poasta align --engine banded`` inner loop)
* hybrid  — 5 kb reads vs a ~6k-node graph with a device-score-exact ub
            (the lasagna hybrid backtrace path)

Contention on this box swings single runs 2-3x (recorded round-2
measurement note), so the reported number is the MEDIAN of ``reps``
runs per sequence.  Prints one JSON line per shape.
"""

import json
import random
import statistics
import sys
import time

sys.path.insert(0, ".")

from bench import _mutate  # noqa: E402


def _build(rng, glen, n_seqs, div, costs):
    from poasta_tpu.graphs import POAGraph
    from poasta_tpu.native import NativeAligner

    base = "".join(rng.choice("ACGT") for _ in range(glen))
    g = POAGraph()
    g.add_alignment_with_weights("s0", base.encode(), None, [1] * glen)
    for i in range(1, n_seqs):
        s = _mutate(rng, base, div, glen).encode()
        _, aln = NativeAligner(g).align_banded(s, costs)
        g.add_alignment_with_weights(f"s{i}", s, aln, [1] * len(s))
    return g, base


def _shape(name, glen, div, reps, costs):
    import numpy as np

    from poasta_tpu.native import NativeAligner

    rng = random.Random(11)
    g, base = _build(rng, glen, 3, div, costs)
    na = NativeAligner(g)
    queries = [_mutate(rng, base, div, glen).encode() for _ in range(4)]
    # seeded ub: the exact score (what the device/assist seed provides),
    # so every run is one fill at the production band width
    seeds = []
    for q in queries:
        s, _ = na.align_banded(q, costs)
        seeds.append(s)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for q, ub in zip(queries, seeds):
            s, _ = na.align_banded(q, costs, ub=ub, max_retries=1)
            assert s == ub  # seeded attempt is tight and final
        ts.append((time.perf_counter() - t0) / len(queries))
    med = statistics.median(ts)
    print(json.dumps({
        "shape": name, "graph_len": glen, "seq_len": glen,
        "median_s_per_seq": round(med, 4),
        "min_s_per_seq": round(min(ts), 4),
        "reps": reps,
    }))
    return med


def main():
    from poasta_tpu.aligner import GapAffine

    costs = GapAffine(4, 2, 6)
    _shape("hybrid_5kb", 5000, 0.10, 9, costs)
    _shape("fusion_20kb", 20000, 0.03, 5, costs)


if __name__ == "__main__":
    main()
