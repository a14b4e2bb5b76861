"""Adversarial on-chip fuzz of the seeded-corridor certificate.

Random (graph, costs, divergence) cases with planted repeats (two-locus
ties the certificate must refuse), garbage reads, and N-containing
reads; every case pins the seeded path byte-identical to the full
bounded fill.  Usage: python scripts/seed_fuzz.py [n_seeds]
"""
import os
import random
import sys

sys.path.insert(0, ".")
from poasta_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()
import numpy as np

from poasta_tpu.aligner import GapAffine
from poasta_tpu.aligner.costs import EndsFree, UNBOUNDED, included
from poasta_tpu.aligner.wavefront import pack_queries
from poasta_tpu.graphs import POAGraph
from poasta_tpu.parallel import BatchMapper

os.environ["POASTA_SEED"] = "all"
os.environ["POASTA_SEED_DEBUG"] = "1"


def mutate(rng, s, d):
    out = []
    for ch in s:
        r = rng.random()
        if r < d:
            continue
        out.append(rng.choice("ACGT") if r < 2.5 * d else ch)
        if rng.random() < d:
            out.append(rng.choice("ACGT"))
    return "".join(out) or "A"


def one_case(seed):
    rng = random.Random(seed)
    n = rng.choice([1200, 2500, 4800, 6100])
    costs = GapAffine(rng.randrange(1, 7), rng.randrange(1, 4),
                      rng.randrange(2, 13))
    # keep divergence inside the engagement envelope for this model
    div = rng.choice([0.002, 0.005, 0.01])
    rl = rng.choice([400, 700, 1000])
    seg = "".join(rng.choice("ACGT") for _ in range(rl // 2))
    left = "".join(rng.choice("ACGT") for _ in range(n // 3))
    mid = "".join(rng.choice("ACGT") for _ in range(n // 3))
    base = left + seg + mid + seg  # planted two-locus repeat
    g = POAGraph()
    g.add_alignment_with_weights("s0", base.encode(), None,
                                 [1] * len(base))
    for v in range(0, len(base) - 3, rng.choice([83, 131, 977])):
        g.add_edge(v, v + 3, 0, 1)
    g.post_process()
    reads = []
    for i in range(32):
        if i == 5:
            reads.append(seg.encode())  # exact two-locus tie
        elif i == 11:
            reads.append("".join(rng.choice("ACGT")
                                 for _ in range(rl)).encode())  # garbage
        elif i == 17:
            r = bytearray(mutate(rng, base[50:50 + rl], div).encode())
            r[rl // 2:rl // 2 + 5] = b"N" * 5
            reads.append(bytes(r))  # ambiguity codes: must refuse
        else:
            a = rng.randrange(0, len(base) - rl)
            reads.append(mutate(rng, base[a:a + rl], div).encode())
    cfg = EndsFree(UNBOUNDED, included(0), UNBOUNDED, UNBOUNDED)
    m = BatchMapper(g, costs, aln_type=cfg)
    qshift, lengths = pack_queries(reads)
    m._seed_len_cache(reads, lengths)
    m._ends_free_scores(reads, qshift, lengths, False)  # learn ub
    sc, er, ej = m._ends_free_scores(reads, qshift, lengths, False)
    st = getattr(m, "last_seed_stats", None)
    ref = m._fill_ends_free_capped(qshift, lengths, False)
    assert (np.asarray(sc) == np.asarray(ref[0])).all(), seed
    assert (np.asarray(er) == np.asarray(ref[1])).all(), seed
    assert (np.asarray(ej) == np.asarray(ref[2])).all(), seed
    return st


def main():
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    ok = 0
    for k in range(n_seeds):
        seed = 1000 + k
        try:
            st = one_case(seed)
            ok += 1
            s = (f"seeded {st['seeded']}/32 tail {st['seed_tail']} "
                 f"k={st['seed_k']}" if st else "seed path inert")
            print(f"seed {seed}: OK ({s})", flush=True)
        except AssertionError as exc:
            print(f"seed {seed}: FAILED {exc!r}", flush=True)
    print(f"{ok}/{n_seeds} clean")
    return 0 if ok == n_seeds else 1


if __name__ == "__main__":
    sys.exit(main())
