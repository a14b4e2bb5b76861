"""Hybrid config ladder probe: per-fill log of the 32-read hybrid batch."""
import os, random, sys, time
sys.path.insert(0, ".")
from poasta_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_uniform
from poasta_tpu.aligner import GapAffine
from poasta_tpu.parallel import BatchMapper

costs = GapAffine(4, 2, 6)
graph, reads = build_uniform(costs)
hmap = BatchMapper(graph, costs)
hsample = reads[:32]
hmap.align_batch(hsample)  # warm
sc = hmap._banded_scorer
fills = []
def wrap(name, fn):
    def inner(q_in_key, qshift, lengths, ub, n_min, n_max, *a, **kw):
        t0 = time.perf_counter()
        out = fn(q_in_key, qshift, lengths, ub, n_min, n_max, *a, **kw)
        fills.append((name, int(ub), int(qshift.shape[0]),
                      getattr(sc, "_last_fill_width", -1),
                      round(time.perf_counter() - t0, 4), out is None))
        return out
    return inner
sc._fill_once = wrap("shared", sc._fill_once)
sc._fill_once_drift = wrap("drift", sc._fill_once_drift)
full0 = sc._full_scores
def full_spy(qshift, lengths):
    t0 = time.perf_counter()
    out = full0(qshift, lengths)
    fills.append(("fullfill", -1, int(qshift.shape[0]),
                  int(qshift.shape[1]), round(time.perf_counter()-t0, 4),
                  False))
    return out
sc._full_scores = full_spy
for it in range(3):
    fills.clear()
    t0 = time.perf_counter()
    out = hmap.align_batch(hsample)
    el = time.perf_counter() - t0
    print(f"iter{it} el={el:.4f} r/s={32/el:.1f} fills={fills} "
          f"banded_stats={hmap.last_banded_stats}", flush=True)
