"""On-chip validation + A/B for the seeded corridor fill (VERDICT r3 #1).

1. Correctness on real-compiled kernels: seeded (scores, end_rank,
   end_offset) byte-equal the full bounded fill on the pangenome bench
   config, garbage reads routed through the exact fallback tail.
2. Perf: bench.py's pangenome semi-global config, seeded vs full fill,
   median of N; end-to-end align_batch both ways.

Run on the real chip: python scripts/seed_onchip.py
"""

import json
import os
import random
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _mutate  # noqa: E402


def median_of(fn, iters=5):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 4)


def main():
    from poasta_tpu.aligner import GapAffine
    from poasta_tpu.aligner.costs import EndsFree, UNBOUNDED, included
    from poasta_tpu.aligner.wavefront import pack_queries
    from poasta_tpu.graphs import POAGraph
    from poasta_tpu.parallel import BatchMapper

    costs = GapAffine(4, 2, 6)
    out = {}

    # bench.py's pangenome config, verbatim
    rng = random.Random(17)
    N = 50_000
    pbase = "".join(rng.choice("ACGT") for _ in range(N))
    gp = POAGraph()
    gp.add_alignment_with_weights("s0", pbase.encode(), None, [1] * N)
    for v in range(0, N - 3, 500):
        gp.add_edge(v, v + 3, 0, 1)
    gp.post_process()
    preads = []
    for _ in range(64):
        a = rng.randrange(0, N - 5000)
        preads.append(_mutate(rng, pbase[a:a + 5000], 0.015).encode())
    cfgp = EndsFree(UNBOUNDED, included(0), UNBOUNDED, UNBOUNDED)

    # --- correctness: seeded vs full fill on the real kernel ----------
    os.environ["POASTA_SEED_DEBUG"] = "1"
    pm = BatchMapper(gp, costs, aln_type=cfgp)
    qshift, lengths = pack_queries(preads)
    t0 = time.perf_counter()
    sc0, er0, ej0 = pm._ends_free_scores(preads, qshift, lengths, False)
    out["first_full_fill_s"] = round(time.perf_counter() - t0, 3)
    out["seed_rate"] = (list(pm._seed_rate)
                        if getattr(pm, "_seed_rate", None) else None)
    t0 = time.perf_counter()
    sc1, er1, ej1 = pm._ends_free_scores(preads, qshift, lengths, False)
    out["seeded_fill_s_cold"] = round(time.perf_counter() - t0, 3)
    out["seed_stats"] = dict(getattr(pm, "last_seed_stats", {}))
    ref = pm._fill_ends_free_capped(qshift, lengths, False)
    assert (np.asarray(sc1) == np.asarray(ref[0])).all(), "score mismatch"
    assert (np.asarray(er1) == np.asarray(ref[1])).all(), "rank mismatch"
    assert (np.asarray(ej1) == np.asarray(ref[2])).all(), "offset mismatch"
    out["scores_anchors_equal"] = True

    # garbage read -> proven fallback
    greads = list(preads)
    greads[5] = bytes("".join(rng.choice("ACGT") for _ in range(5000)),
                      "ascii")
    gq, gl = pack_queries(greads)
    gs, gr, gj = pm._ends_free_scores(greads, gq, gl, False)
    gref = pm._fill_ends_free_capped(gq, gl, False)
    assert (np.asarray(gs) == np.asarray(gref[0])).all()
    out["garbage_read_tail"] = dict(pm.last_seed_stats)

    # --- A/B: seeded vs full fill wall (median of 5, warm) ------------
    out["seeded_fill_s"] = median_of(
        lambda: pm._ends_free_scores(preads, qshift, lengths, False))
    out["full_fill_s"] = median_of(
        lambda: pm._fill_ends_free_capped(qshift, lengths, False))
    out["fill_speedup"] = round(out["full_fill_s"]
                                / max(out["seeded_fill_s"], 1e-9), 2)

    # --- end-to-end align_batch A/B ------------------------------------
    pm.align_batch(preads)  # warm natives
    el = median_of(lambda: pm.align_batch(preads), iters=5)
    out["seeded_align_s"] = el
    out["seeded_reads_per_sec"] = round(64 / el, 2)
    os.environ["POASTA_SEED"] = "0"
    try:
        pm0 = BatchMapper(gp, costs, aln_type=cfgp)
        pm0.align_batch(preads)
        el0 = median_of(lambda: pm0.align_batch(preads), iters=3)
    finally:
        del os.environ["POASTA_SEED"]
    out["unseeded_align_s"] = el0
    out["unseeded_reads_per_sec"] = round(64 / el0, 2)
    out["align_speedup"] = round(el0 / el, 2)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
