"""Big-banded kernel at its target regime: 40k-node graph x 40 kb reads
(round-2 VERDICT weak #2: 2.8 Gcells/s raw; round-3 fix = sliding q
segment instead of a VMEM-resident (B_BLK, L) q block).

Validates exactness vs the standard banded kernel on identical windows
(where the standard kernel still compiles) and vs the XLA full fill,
then times the raw fill.  Run on the real chip.
"""

import random
import sys
import time

sys.path.insert(0, ".")

from poasta_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np


def _mutate(rng, s, d):
    out = []
    for ch in s:
        r = rng.random()
        if r < d:
            continue
        out.append(rng.choice("ACGT") if r < 2.5 * d else ch)
        if rng.random() < d:
            out.append(rng.choice("ACGT"))
    return "".join(out) or "A"


def main():
    from poasta_tpu.aligner.banded import band_windows
    from poasta_tpu.aligner.costs import GapAffine
    from poasta_tpu.aligner.wavefront import DeviceGraph, pack_queries
    from poasta_tpu.graphs import POAGraph
    from poasta_tpu.ops.pallas_fill import (
        pallas_banded_scores_big,
        prepare_banded_big,
    )

    costs = GapAffine(4, 2, 6)
    rng = random.Random(23)
    N = 40_000
    base = "".join(rng.choice("ACGT") for _ in range(N))
    g = POAGraph()
    g.add_alignment_with_weights("s0", base.encode(), None, [1] * N)
    for v in range(0, N - 3, 977):
        g.add_edge(v, v + 3, 0, 1)
    g.post_process()
    flat = g.flatten()
    dg = DeviceGraph.build(flat)
    B = 64
    reads = [_mutate(rng, base, 0.01).encode() for _ in range(B)]
    qshift, lengths = pack_queries(reads)
    L = int(qshift.shape[1])
    lmin, lmax = int(np.asarray(lengths).min()), int(np.asarray(lengths).max())
    ws, wd, _, _ = band_windows(flat, lmin, lmax, costs, 3200)
    ws = (ws // 128) * 128
    wd += 128
    print(f"N={N} L={L} B={B} width={wd}")

    prep = prepare_banded_big(dg, costs, ws, wd, L)
    print(f"qseg={prep['qseg']} (vs full L={L}); margin={prep['margin']}")
    t0 = time.perf_counter()
    s_big = np.asarray(pallas_banded_scores_big(dg, qshift, lengths, costs,
                                                prep))
    print(f"compile+first {time.perf_counter() - t0:.1f} s")

    # exactness vs the XLA full fill on reads the band resolves
    from poasta_tpu.aligner.wavefront import dp_fill_scores

    oracle = np.asarray(dp_fill_scores(dg, qshift, lengths, costs,
                                       engine="xla"))
    over_only = bool((s_big >= oracle).all())
    exact = (s_big == oracle).mean()
    assert over_only, "banded under-estimated: broken kernel"
    print(f"exact on {exact * 100:.0f}% of reads (rest need wider bands; "
          f"over-estimates only: {over_only})")

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        s2 = np.asarray(pallas_banded_scores_big(dg, qshift, lengths,
                                                 costs, prep))
    el = (time.perf_counter() - t0) / iters
    assert (s2 == s_big).all()
    cells = flat.n_nodes * int(wd) * B
    print(f"{el:.3f} s/iter, raw {cells / el / 1e9:.2f} Gcells/s "
          f"(round-2 record: 2.8)")


if __name__ == "__main__":
    main()
