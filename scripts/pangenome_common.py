"""Shared pangenome profile fixture: build (or unpickle) the 50k-node
bench graph + reads, so repeated profiling runs skip the host-side
build.  Same construction as bench.py's pangenome config."""
import os
import pickle
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = "/tmp/poasta_pangenome_fixture.pkl"


def load(n=50_000, n_reads=64, div=0.015):
    from bench import _mutate

    key = (n, n_reads, div)
    if os.path.exists(CACHE):
        try:
            with open(CACHE, "rb") as f:
                k2, gp, preads = pickle.load(f)
            if k2 == key:
                return gp, preads
        except Exception:
            pass
    from poasta_tpu.graphs import POAGraph

    t0 = time.time()
    rng = random.Random(17)
    pbase = "".join(rng.choice("ACGT") for _ in range(n))
    gp = POAGraph()
    gp.add_alignment_with_weights("s0", pbase.encode(), None, [1] * n)
    for v in range(0, n - 3, 500):
        gp.add_edge(v, v + 3, 0, 1)
    gp.post_process()
    preads = []
    for _ in range(n_reads):
        a = rng.randrange(0, n - 5000)
        preads.append(_mutate(rng, pbase[a:a + 5000], div).encode())
    print(f"[fixture] built in {time.time()-t0:.1f}s", flush=True)
    try:
        with open(CACHE, "wb") as f:
            pickle.dump((key, gp, preads), f)
    except Exception:
        pass
    return gp, preads
