"""Profile the pangenome semi-global serving path (bench.py's config):
device score+anchor phase vs per-read native anchored corridor, with the
native engine's phase counters (corridor BFS / fill / backtrace).

Run on the real chip: python scripts/profile_anchor.py [n_reads]
"""

import random
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from poasta_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


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
    from poasta_tpu.aligner.costs import EndsFree, GapAffine, UNBOUNDED, included
    from poasta_tpu.aligner.wavefront import (
        DeviceGraph,
        dp_fill_ends_free_with_ends,
        pack_queries,
    )
    from poasta_tpu.graphs import POAGraph
    from poasta_tpu.native import NativeAligner

    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    costs = GapAffine(4, 2, 6)
    rng = random.Random(17)
    N = 50_000
    pbase = "".join(rng.choice("ACGT") for _ in range(N))
    gp = POAGraph()
    gp.add_alignment_with_weights("s0", pbase.encode(), None, [1] * N)
    for v in range(0, N - 3, 500):
        gp.add_edge(v, v + 3, 0, 1)
    gp.post_process()
    reads = []
    for _ in range(n_reads):
        a = rng.randrange(0, N - 5000)
        reads.append(_mutate(rng, pbase[a:a + 5000], 0.015).encode())
    cfg = EndsFree(UNBOUNDED, included(0), UNBOUNDED, UNBOUNDED)

    flat = gp.flatten()
    dg = DeviceGraph.build(flat)
    na = NativeAligner(gp)
    qshift, lengths = pack_queries(reads)

    t0 = time.perf_counter()
    sc, er, ej = (np.asarray(a) for a in dp_fill_ends_free_with_ends(
        dg, flat, qshift, lengths, costs, cfg))
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    sc, er, ej = (np.asarray(a) for a in dp_fill_ends_free_with_ends(
        dg, flat, qshift, lengths, costs, cfg))
    t_dev = time.perf_counter() - t0
    print(f"device fill: {t_dev*1e3:.0f} ms for {n_reads} reads "
          f"(compile+first {t_compile:.1f} s)")

    node_of_rank = flat.node_of_rank
    agg = {}
    t_host = 0.0
    for b, q in enumerate(reads):
        t0 = time.perf_counter()
        score, aln = na.align_anchored(
            q, costs, int(node_of_rank[er[b]]), int(ej[b]), int(sc[b]))
        t_host += time.perf_counter() - t0
        st = na.last_anchored_stats()
        for k, v in st.items():
            agg[k] = agg.get(k, 0) + v
        if b < 4:
            print(f"  read {b}: score={score} pairs={len(aln)} {st}")
    nsr = {k: v / n_reads for k, v in agg.items()}
    print(f"host anchored: {t_host*1e3/n_reads:.1f} ms/read "
          f"({n_reads/t_host:.1f} reads/s host-only)")
    print(f"  per-read avg: corridor={nsr['corridor_ns']/1e6:.1f}ms "
          f"fill={nsr['fill_ns']/1e6:.1f}ms "
          f"backtrace={nsr['backtrace_ns']/1e6:.1f}ms "
          f"nodes={nsr['corridor_nodes']:.0f} "
          f"cells={nsr['corridor_cells']:.0f} "
          f"attempts={nsr['attempts']:.2f}")
    fill_ns = agg["fill_ns"]
    cells = agg["corridor_cells"]
    if fill_ns:
        print(f"  fill rate: {cells/fill_ns:.2f} cells/ns "
              f"({cells/(fill_ns/1e9)/1e9:.2f} Gcells/s)")
    e2e = t_dev + t_host
    print(f"e2e: {n_reads/e2e:.1f} reads/s")


if __name__ == "__main__":
    main()
