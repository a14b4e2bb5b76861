"""200k-node pangenome seeded serving probe: 4x the bench graph.

Validates the seeded corridor path at big-kernel scale (k_for_graph
picks k=11 here), pins equality against the full bounded fill on the
same batch, and measures the serving rate."""
import os, random, sys, time
sys.path.insert(0, ".")
from poasta_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
import numpy as np
from poasta_tpu.aligner import GapAffine
from poasta_tpu.aligner.costs import EndsFree, UNBOUNDED, included
from poasta_tpu.graphs import POAGraph
from poasta_tpu.parallel import BatchMapper
from poasta_tpu.aligner.wavefront import pack_queries

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _mutate  # noqa: E402

costs = GapAffine(4, 2, 6)
rng = random.Random(37)
N = 200_000
t0 = time.time()
base = "".join(rng.choice("ACGT") for _ in range(N))
g = POAGraph()
g.add_alignment_with_weights("s0", base.encode(), None, [1] * N)
for v in range(0, N - 3, 500):
    g.add_edge(v, v + 3, 0, 1)
g.post_process()
print(f"graph {time.time()-t0:.1f}s", flush=True)
reads = []
for _ in range(64):
    a = rng.randrange(0, N - 5000)
    reads.append(_mutate(rng, base[a:a + 5000], 0.015).encode())
cfg = EndsFree(UNBOUNDED, included(0), UNBOUNDED, UNBOUNDED)
m = BatchMapper(g, costs, aln_type=cfg)
qshift, lengths = pack_queries(reads)
m._seed_len_cache(reads, lengths)
t0 = time.time()
ref = m._fill_ends_free_capped(qshift, lengths, False)  # full fill
t_full = time.time() - t0
m._learn_seed_ub(lengths, ref[0])
sc, er, ej = m._ends_free_scores(reads, qshift, lengths, False)  # warm seeded
for it in range(3):
    t0 = time.time()
    sc, er, ej = m._ends_free_scores(reads, qshift, lengths, False)
    el = time.time() - t0
    print(f"iter{it} seeded={el:.3f}s (full fill: {t_full:.3f}s) "
          f"stats={m.last_seed_stats}", flush=True)
np.testing.assert_array_equal(np.asarray(sc), np.asarray(ref[0]))
np.testing.assert_array_equal(np.asarray(er), np.asarray(ref[1]))
np.testing.assert_array_equal(np.asarray(ej), np.asarray(ref[2]))
print("EQUAL vs full fill (scores, end ranks, end offsets)")
