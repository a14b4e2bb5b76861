"""Phase breakdown of the seeded corridor path on the pangenome config."""
import os, random, sys, time
sys.path.insert(0, ".")
from poasta_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
import numpy as np
import jax
from poasta_tpu.aligner import GapAffine
from poasta_tpu.aligner.costs import EndsFree, UNBOUNDED, included
from poasta_tpu.graphs import POAGraph
from poasta_tpu.parallel import BatchMapper
from poasta_tpu.aligner.wavefront import pack_queries, ends_free_device_params
from poasta_tpu.aligner.seeds import KmerIndex, propose_clusters, certify_reads
from poasta_tpu.ops import pallas_seed as ps
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _mutate

costs = GapAffine(4, 2, 6)
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
m = BatchMapper(gp, costs, aln_type=cfgp)
qshift, lengths = pack_queries(preads)
lengths_np = np.asarray(lengths)
free_start, end_ok, jlo = ends_free_device_params(m.flat, cfgp, lengths, m.dg.n_nodes_padded)

t0=time.perf_counter(); idx = KmerIndex(m.flat); t_idx=time.perf_counter()-t0
q_np, _ = pack_queries(preads, pad_to=int(qshift.shape[1]) - 1, place_on_device=False)
for rep in range(2):
    t0=time.perf_counter(); hits = idx.seed_hits(q_np, lengths_np); t_hits=time.perf_counter()-t0
ub = 1928
ub_np = np.full(64, ub, dtype=np.int64)
K_u = ub_np // 2
for rep in range(2):
    t0=time.perf_counter(); a_star, b_star, ncl = propose_clusters(hits, K_u); t_prop=time.perf_counter()-t0
print(f"index {t_idx:.3f}s (k={idx.k}, paths={idx.n_paths})  hits {t_hits:.3f}s ({hits.alpha.shape[0]} hits)  propose {t_prop:.3f}s")
for rep in range(3):
    t0=time.perf_counter()
    res = ps.pallas_seed_scores(m.dg, m.flat, qshift, lengths, costs, free_start, end_ok, jlo, a_star, b_star, ub_np)
    sc, er, ej, ok = res
    t_fill=time.perf_counter()-t0
    print(f"corridor fill+schedule {t_fill:.3f}s  ok={ok.sum()}")
t0=time.perf_counter(); cert, T = certify_reads(hits, a_star, b_star, sc, K_u, idx.k, np.asarray(jlo), costs, idx.all_acgt); t_cert=time.perf_counter()-t0
print(f"certify {t_cert:.4f}s  certified={cert.sum()}  T[:4]={T[:4]}  spread={int((b_star-a_star).max())}")
