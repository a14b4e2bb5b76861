"""Profile the mixed-divergence config's tier ladder (VERDICT r3 #5).

bench.py's mixed_div config (95% of reads at ~2% divergence, 5% at
~15%) ran at 789 reads/s in round 3 vs 1849.7 on the uniform config —
a ~35% refill tax attributed to heterogeneous batches.  This probe
wraps the scorer's fill entry points and logs every fill: tier index,
ub, band width, (padded) batch rows, and wall seconds — so the tax can
be located (starting-tier choice vs retry-tail width vs per-fill
dispatch overhead) instead of guessed at.

Run on the real chip: python scripts/mixed_div_profile.py
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


def main():
    from poasta_tpu.aligner import GapAffine
    from poasta_tpu.aligner.banded import BandedScorer
    from poasta_tpu.aligner.wavefront import pack_queries
    from poasta_tpu.graphs import POAGraph

    costs = GapAffine(4, 2, 6)
    rng = random.Random(11)
    base = "".join(rng.choice("ACGT") for _ in range(5000))
    gmix = POAGraph()
    gmix.add_alignment_with_weights("s0", base.encode(), None, [1] * 5000)
    _fuse(gmix, _mutate(rng, base, 0.02).encode(), costs, "s1")
    mixed = [
        _mutate(rng, base, 0.15 if i % 20 == 0 else 0.02).encode()
        for i in range(1024)
    ]
    fmix = gmix.flatten()
    smix = BandedScorer(fmix, costs)
    qm, lm = pack_queries(mixed)

    fills = []

    def wrap(name, fn):
        def inner(q_in_key, qshift, lengths, ub, n_min, n_max, *a, **kw):
            t0 = time.perf_counter()
            out = fn(q_in_key, qshift, lengths, ub, n_min, n_max, *a, **kw)
            fills.append(dict(
                path=name, ub=int(ub), rows=int(qshift.shape[0]),
                n_min=n_min, n_max=n_max,
                width=getattr(smix, "_last_fill_width", -1),
                wall_s=round(time.perf_counter() - t0, 4),
                skipped=out is None))
            return out
        return inner

    smix._fill_once = wrap("shared", smix._fill_once)
    smix._fill_once_drift = wrap("drift", smix._fill_once_drift)
    full0 = smix._full_scores

    def full_spy(qshift, lengths):
        t0 = time.perf_counter()
        out = full0(qshift, lengths)
        fills.append(dict(path="fullfill", rows=int(qshift.shape[0]),
                          width=int(qshift.shape[1]),
                          wall_s=round(time.perf_counter() - t0, 4),
                          skipped=False))
        return out

    smix._full_scores = full_spy

    smix.scores(qm, lm)  # warm: compile + converge ub hint
    out = {"warm_fills": list(fills)}
    ts = []
    for it in range(3):
        fills.clear()
        smix.reset_stats()
        t0 = time.perf_counter()
        scores = smix.scores(qm, lm)
        el = time.perf_counter() - t0
        ts.append(el)
        out[f"iter{it}"] = {
            "wall_s": round(el, 4),
            "fills": list(fills),
            "fill_wall_s": round(sum(f["wall_s"] for f in fills), 4),
            "stats": {k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in smix.stats.items()},
        }
    out["median_wall_s"] = round(statistics.median(ts), 4)
    out["reads_per_sec"] = round(1024 / statistics.median(ts), 2)
    out["scores_sum"] = int(np.asarray(scores).astype(np.int64).sum())
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
