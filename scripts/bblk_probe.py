"""A/B the banded kernel's B_BLK on the uniform bench config (BACKLOG
"Banded VMEM budget"): does forcing 256-row blocks past the static
10 MiB ring budget compile, and is it faster?

Run on the real chip: python scripts/bblk_probe.py
"""

import random
import sys
import time

sys.path.insert(0, ".")

from poasta_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np


def main():
    import bench
    from poasta_tpu.aligner.banded import BandedScorer
    from poasta_tpu.aligner.costs import GapAffine
    from poasta_tpu.aligner.wavefront import pack_queries
    from poasta_tpu.ops import pallas_fill as pf

    costs = GapAffine(4, 2, 6)
    graph, reads = bench.build_uniform(costs)
    flat = graph.flatten()
    qshift, lengths = pack_queries(reads)

    def timed(scorer, label):
        s = np.asarray(scorer.scores(qshift, lengths))  # warm/compile
        t0 = time.perf_counter()
        for _ in range(2):
            s2 = np.asarray(scorer.scores(qshift, lengths))
        el = (time.perf_counter() - t0) / 2
        assert (s == s2).all()
        st = scorer.stats
        print(f"{label}: {el:.3f} s/iter, cells={st['cells_filled']}")
        return s, el

    base = BandedScorer(flat, costs)
    s0, el0 = timed(base, "picked B_BLK (static budget)")

    orig = pf.pick_b_blk

    def forced(W, row_lanes, L, itemsize=4, n_rings=2):
        return 256

    pf.pick_b_blk = forced
    try:
        probe = BandedScorer(flat, costs)
        s1, el1 = timed(probe, "forced B_BLK=256")
        assert (s0 == s1).all()
        print(f"speedup: {el0 / el1:.3f}x")
    except Exception as exc:
        print(f"B_BLK=256 failed: {type(exc).__name__}: {str(exc)[:300]}")
    finally:
        pf.pick_b_blk = orig


if __name__ == "__main__":
    main()
