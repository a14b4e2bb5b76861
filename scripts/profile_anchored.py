"""Profile the pangenome semi-global anchored-alignment path.

Reproduces bench.py's pangenome config (50k-node graph, 64 x 5 kb reads,
semi-global = EndsFree(UNBOUNDED, included(0), UNBOUNDED, UNBOUNDED)) and
breaks end-to-end time into: device score+anchor phase, then per-read
native corridor/fill/backtrace phases (poasta_last_anchored_stats).

This is the measurement behind VERDICT round-2 item 1 (7.02 reads/s
end-to-end vs 41.7 Gcells/s scoring).
"""

import json
import random
import sys
import time

sys.path.insert(0, ".")

from bench import _mutate  # noqa: E402


def main():
    import numpy as np

    from poasta_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from poasta_tpu.aligner import GapAffine
    from poasta_tpu.aligner.costs import EndsFree, UNBOUNDED, included
    from poasta_tpu.aligner.wavefront import (
        dp_fill_ends_free_with_ends, pack_queries)
    from poasta_tpu.graphs import POAGraph
    from poasta_tpu.native import NativeAligner
    from poasta_tpu.parallel import BatchMapper

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
    pmap = BatchMapper(gp, costs, aln_type=cfgp)

    qshift, lengths = pack_queries(preads)
    # warm the device fill (compile)
    sc, er, ej = dp_fill_ends_free_with_ends(
        pmap.dg, pmap.flat, qshift, lengths, costs, cfgp, mesh=None)
    sc = np.asarray(sc); er = np.asarray(er); ej = np.asarray(ej)

    t0 = time.perf_counter()
    sc2, er2, ej2 = dp_fill_ends_free_with_ends(
        pmap.dg, pmap.flat, qshift, lengths, costs, cfgp, mesh=None)
    sc2 = np.asarray(sc2); er2 = np.asarray(er2); ej2 = np.asarray(ej2)
    t_dev = time.perf_counter() - t0

    native = NativeAligner(gp)
    node_of_rank = pmap.flat.node_of_rank
    np.savez("/tmp/anchors.npz", sc=sc, er=er, ej=ej,
             node_of_rank=node_of_rank,
             reads=np.array([r.decode() for r in preads]))
    agg = {"corridor_ns": 0, "fill_ns": 0, "backtrace_ns": 0,
           "corridor_nodes": 0, "corridor_cells": 0, "attempts": 0}
    per_read = []
    t0 = time.perf_counter()
    for b, q in enumerate(preads):
        t1 = time.perf_counter()
        s, aln = native.align_anchored(
            q, costs, int(node_of_rank[er[b]]), int(ej[b]), int(sc[b]),
            free_start=True)
        dt = time.perf_counter() - t1
        st = native.last_anchored_stats()
        for k in agg:
            agg[k] += st[k]
        per_read.append((dt, st))
    t_host = time.perf_counter() - t0

    n = len(preads)
    print(json.dumps({
        "device_phase_s": round(t_dev, 3),
        "host_phase_s": round(t_host, 3),
        "end_to_end_reads_per_sec": round(n / (t_dev + t_host), 2),
        "host_only_reads_per_sec": round(n / t_host, 2),
        "mean_corridor_ms": round(agg["corridor_ns"] / n / 1e6, 2),
        "mean_fill_ms": round(agg["fill_ns"] / n / 1e6, 2),
        "mean_backtrace_ms": round(agg["backtrace_ns"] / n / 1e6, 2),
        "mean_corridor_nodes": agg["corridor_nodes"] // n,
        "mean_corridor_cells": agg["corridor_cells"] // n,
        "mean_attempts": round(agg["attempts"] / n, 2),
        "fill_gcells_per_s": round(
            agg["corridor_cells"] / max(agg["fill_ns"], 1), 3),
    }))
    worst = sorted(per_read, key=lambda x: -x[0])[:3]
    for dt, st in worst:
        print("worst:", round(dt * 1e3, 1), "ms", st)

    # production path with phase stats (the bench's exact call sequence)
    pmap.align_batch(preads)  # warm
    t0 = time.perf_counter()
    pmap.align_batch(preads)
    el_p = time.perf_counter() - t0
    print(json.dumps({
        "batchmapper_reads_per_sec": round(n / el_p, 2),
        **{k: round(v, 3) if isinstance(v, float) else v
           for k, v in pmap.last_ends_free_stats.items()},
    }))


if __name__ == "__main__":
    main()
