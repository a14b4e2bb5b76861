"""Profile the drift x bounded-ends-free path vs shared windows on-chip.

bench.py's ef config measured drift at 0.43x the shared-window wall
despite 2.22x fewer cells filled.  This probe separates the phases:
per-iteration host prep (window relaxation, prep tables) vs device
kernel wall, and reports per-cell rates for both paths so the loss can
be located (kernel per-cell cost vs host overhead vs batch-splitting).

Run on the real chip: python scripts/ef_drift_profile.py
"""

import json
import os
import random
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# the probe must generate bench.py's exact read set (same error model,
# same rng stream) or the band widths / retry tiers it profiles won't be
# the ones the benchmark pays for
from bench import _mutate  # noqa: E402


def main():
    from poasta_tpu.aligner.banded import BandedScorer
    from poasta_tpu.aligner.wavefront import pack_queries
    from poasta_tpu.aligner.costs import EndsFree, GapAffine, included
    from poasta_tpu.graphs.poa import POAGraph
    from poasta_tpu.native import NativeAligner

    costs = GapAffine(4, 2, 6)  # bench.py's cost model (mismatch, e, o)

    rng = random.Random(13)
    base = "".join(rng.choice("ACGT") for _ in range(5000))
    variant = base[:500] + base[4500:]
    gsv = POAGraph()
    gsv.add_alignment_with_weights("s0", base.encode(), None, [1] * 5000)
    _, alignment, _ = NativeAligner(gsv).align(variant.encode(), costs)
    gsv.add_alignment_with_weights("s1", variant.encode(), alignment,
                                   [1] * len(variant))
    sv_reads = [
        _mutate(rng, base if i % 2 else variant, 0.015).encode()
        for i in range(1024)
    ]
    fsv = gsv.flatten()
    qs, ls = pack_queries(sv_reads)

    cfg_ef = EndsFree(("unbounded", None), included(50), included(0),
                      included(50))

    out = {}
    if os.environ.get("EF_PROFILE_BENCH_ORDER"):
        # reproduce bench.py's process state: the global mixed-length
        # configs (drift then shared) run before the ef pair
        for name, spread in (("g_drift", None), ("g_shared", 1 << 30)):
            s = BandedScorer(fsv, costs)
            if spread is not None:
                s.DRIFT_MIN_SPREAD = spread
            s.scores(qs, ls)
            s.reset_stats()
            t0 = time.perf_counter()
            for _ in range(2):
                s.scores(qs, ls)
            el = (time.perf_counter() - t0) / 2
            cells = s.stats["cells_filled"] / 2
            out[name] = {"s_per_iter": round(el, 4),
                         "gcells_per_s": round(cells / el / 1e9, 2)}
    for name, spread in (("drift", None), ("shared", 1 << 30)):
        s = BandedScorer(fsv, costs, aln_type=cfg_ef)
        if spread is not None:
            s.DRIFT_MIN_SPREAD = spread
        s.scores(qs, ls)  # warm
        s.reset_stats()
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            sc = s.scores(qs, ls)
        el = (time.perf_counter() - t0) / iters
        cells = s.stats["cells_filled"] / iters
        out[name] = {
            "s_per_iter": round(el, 4),
            "cells": int(cells),
            "gcells_per_s": round(cells / el / 1e9, 2),
            "stats": {k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in s.stats.items()},
        }
        out[name]["scores_sum"] = int(np.asarray(sc).sum())

    # print first: a parity failure must not discard minutes of on-chip
    # timing data collected above
    print(json.dumps(out, indent=1))
    assert out["drift"]["scores_sum"] == out["shared"]["scores_sum"]


if __name__ == "__main__":
    main()
