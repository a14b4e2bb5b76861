"""On-chip validation + A/B for the device traceback (VERDICT r4 item 1).

1. Correctness: trace-path alignments byte-equal the native backtrace on
   real-compiled kernels (global + anchored ends-free).
2. Perf: bench.py's hybrid and pangenome configs, device trace vs the
   round-3 host-backtrace path (median of N).

Run on the real chip: python scripts/trace_onchip.py
"""

import json
import os
import random
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _mutate, build_uniform  # noqa: E402


def median_batches(fn, iters=5):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    from poasta_tpu.aligner import GapAffine
    from poasta_tpu.aligner.costs import EndsFree, UNBOUNDED, included
    from poasta_tpu.graphs import POAGraph
    from poasta_tpu.parallel import BatchMapper

    costs = GapAffine(4, 2, 6)
    out = {}

    # --- correctness on real kernels (small enough to cross-check) ----
    rng = random.Random(23)
    base = "".join(rng.choice("ACGT") for _ in range(1500))
    g = POAGraph()
    g.add_alignment_with_weights("s0", base.encode(), None, [1] * 1500)
    from poasta_tpu.native import NativeAligner

    na = NativeAligner(g)
    reads = [_mutate(rng, base, 0.05).encode() for _ in range(8)]
    bm = BatchMapper(g, costs)
    res = bm.align_batch(reads)
    mism = 0
    for (s, a), q in zip(res, reads):
        ns, naln = na.align_banded(q, costs, ub=s)
        assert ns == s
        if list(a) != list(naln):
            mism += 1
    out["global_byte_equal"] = {"reads": len(reads), "mismatches": mism,
                                "device_traced":
                                bm.last_banded_stats["device_traced"]}

    sub = [_mutate(rng, base[200:1200], 0.03).encode() for _ in range(8)]
    cfg = EndsFree(UNBOUNDED, included(0), UNBOUNDED, UNBOUNDED)
    bm2 = BatchMapper(g, costs, aln_type=cfg)
    res2 = bm2.align_batch(sub)
    stats2 = dict(bm2.last_ends_free_stats)
    os.environ["POASTA_DEVICE_TRACE"] = "0"
    res2h = bm2.align_batch(sub)
    os.environ.pop("POASTA_DEVICE_TRACE", None)
    mism2 = sum(1 for (ds, da), (hs, ha) in zip(res2, res2h)
                if ds != hs or list(da) != list(ha))
    out["ends_free_byte_equal"] = {
        "reads": len(sub), "mismatches": mism2,
        "device_traced": stats2["device_traced"]}

    # --- hybrid A/B (bench config: uniform graph, 32 reads global) -----
    graph, reads = build_uniform(costs)
    hmap = BatchMapper(graph, costs)
    hs = reads[:32]
    hmap.align_batch(hs)  # warm
    el_dev = median_batches(lambda: hmap.align_batch(hs))
    traced = hmap.last_banded_stats["device_traced"]
    os.environ["POASTA_DEVICE_TRACE"] = "0"
    hmap.align_batch(hs)
    el_host = median_batches(lambda: hmap.align_batch(hs), iters=3)
    os.environ.pop("POASTA_DEVICE_TRACE", None)
    out["hybrid"] = {
        "reads_per_sec_device_trace": round(32 / el_dev, 2),
        "reads_per_sec_host": round(32 / el_host, 2),
        "speedup": round(el_host / el_dev, 2),
        "device_traced": traced,
    }

    # --- pangenome A/B (bench config) ----------------------------------
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
    pmap = BatchMapper(gp, costs, aln_type=cfgp)
    # the 50k-rank graph is past the prefetch budget: auto mode declines
    # the trace there (the score fill dominates and the host corridor is
    # cheaper) — force the big-trace kernel so its A/B stays recorded
    os.environ["POASTA_DEVICE_TRACE"] = "all"
    pmap.align_batch(preads)  # warm
    el_pdev = median_batches(lambda: pmap.align_batch(preads), iters=3)
    pstats = dict(pmap.last_ends_free_stats)
    os.environ["POASTA_DEVICE_TRACE"] = "0"
    pmap.align_batch(preads)
    el_phost = median_batches(lambda: pmap.align_batch(preads), iters=3)
    os.environ.pop("POASTA_DEVICE_TRACE", None)
    out["pangenome"] = {
        "reads_per_sec_device_trace": round(64 / el_pdev, 2),
        "reads_per_sec_host": round(64 / el_phost, 2),
        "speedup": round(el_phost / el_pdev, 2),
        "stats": {k: (round(v, 4) if isinstance(v, float) else v)
                  for k, v in pstats.items()},
    }

    print(json.dumps(out, indent=1))
    assert mism == 0 and mism2 == 0, "byte-equality failed"


if __name__ == "__main__":
    main()
