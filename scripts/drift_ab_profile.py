"""Reconcile mixed_len_drift_speedup (VERDICT r4 #7): spy-wrap both the
drift arm and the shared-window reference arm of bench.py's mixed_len_sv
config, logging every fill (path, ub, width, rows, wall) so the wall
ratio's cause is in the record next to the cells ratio.

Run on the real chip: python scripts/drift_ab_profile.py
"""

import json
import os
import random
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _fuse, _mutate  # noqa: E402


def run_arm(name, scorer, qs, ls):
    fills = []

    def wrap(path, fn):
        def inner(q_in_key, qshift, lengths, ub, n_min, n_max, *a, **kw):
            t0 = time.perf_counter()
            out = fn(q_in_key, qshift, lengths, ub, n_min, n_max, *a, **kw)
            fills.append(dict(
                path=path, ub=int(ub), rows=int(qshift.shape[0]),
                n_min=n_min, n_max=n_max,
                width=getattr(scorer, "_last_fill_width", -1),
                wall_s=round(time.perf_counter() - t0, 4),
                skipped=out is None))
            return out
        return inner

    scorer._fill_once = wrap("shared", scorer._fill_once)
    scorer._fill_once_drift = wrap("drift", scorer._fill_once_drift)
    full0 = scorer._full_scores

    def full_spy(qshift, lengths):
        t0 = time.perf_counter()
        out = full0(qshift, lengths)
        fills.append(dict(path="fullfill", rows=int(qshift.shape[0]),
                          wall_s=round(time.perf_counter() - t0, 4)))
        return out

    scorer._full_scores = full_spy

    scorer.scores(qs, ls)  # warm
    out = {"arm": name, "warm_fills": list(fills)}
    ts = []
    for it in range(5):
        fills.clear()
        scorer.reset_stats()
        t0 = time.perf_counter()
        scores = scorer.scores(qs, ls)
        el = time.perf_counter() - t0
        ts.append(el)
        if it == 0:
            out["iter0"] = {
                "wall_s": round(el, 4), "fills": list(fills),
                "fill_wall_s": round(sum(f["wall_s"] for f in fills), 4),
                "stats": {k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in scorer.stats.items()},
            }
    out["walls"] = [round(t, 4) for t in ts]
    out["median_wall_s"] = round(statistics.median(ts), 4)
    out["cells"] = scorer.stats["cells_filled"]
    out["scores_sum"] = int(np.asarray(scores).astype(np.int64).sum())
    return out


def main():
    from poasta_tpu.aligner import GapAffine
    from poasta_tpu.aligner.banded import BandedScorer
    from poasta_tpu.aligner.wavefront import pack_queries
    from poasta_tpu.graphs import POAGraph
    from poasta_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    costs = GapAffine(4, 2, 6)
    rng = random.Random(13)
    base = "".join(rng.choice("ACGT") for _ in range(5000))
    variant = base[:500] + base[4500:]
    gsv = POAGraph()
    gsv.add_alignment_with_weights("s0", base.encode(), None, [1] * 5000)
    _fuse(gsv, variant.encode(), costs, "s1")
    sv_reads = [
        _mutate(rng, base if i % 2 else variant, 0.015).encode()
        for i in range(1024)
    ]
    fsv = gsv.flatten()
    qs, ls = pack_queries(sv_reads)

    aln_type = None
    if os.environ.get("DRIFT_AB_EF"):
        from poasta_tpu.aligner.costs import EndsFree, included

        aln_type = EndsFree(("unbounded", None), included(50),
                            included(0), included(50))

    def mk():
        return (BandedScorer(fsv, costs, aln_type=aln_type)
                if aln_type is not None else BandedScorer(fsv, costs))

    drift = run_arm("drift", mk(), qs, ls)
    shared_s = mk()
    shared_s.DRIFT_MIN_SPREAD = 1 << 30
    shared = run_arm("shared", shared_s, qs, ls)
    assert drift["scores_sum"] == shared["scores_sum"]
    print(json.dumps(drift, indent=1))
    print(json.dumps(shared, indent=1))
    print(json.dumps({
        "wall_ratio": round(shared["median_wall_s"]
                            / drift["median_wall_s"], 2),
        "cells_ratio": round(shared["cells"] / max(drift["cells"], 1), 2),
    }))


if __name__ == "__main__":
    main()
