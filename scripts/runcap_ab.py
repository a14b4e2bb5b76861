"""A/B the insertion-run cap on the real chip (VERDICT r2 item 5).

Measures the banded uniform config (bench.py headline shape) and the
pangenome bounded ends-free fill with the cap enabled vs disabled
(POASTA_NO_RUN_CAP=1 re-exec).  The tilt cannot be toggled — its delta
rides in the bench.py trend vs BENCH_r02 — but the cap's rounds are the
bigger lever and this isolates them.

    python scripts/runcap_ab.py            # both arms, prints the ratio
    python scripts/runcap_ab.py --one-arm  # current env only (internal)
"""

import json
import os
import random
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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


def one_arm():
    import numpy as np

    from poasta_tpu.aligner import GapAffine
    from poasta_tpu.aligner.banded import BandedScorer
    from poasta_tpu.aligner.costs import EndsFree, UNBOUNDED, included
    from poasta_tpu.aligner.wavefront import pack_queries
    from poasta_tpu.graphs import POAGraph
    from poasta_tpu.native import NativeAligner
    from poasta_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    costs = GapAffine(4, 2, 6)
    rng = random.Random(7)

    # --- banded uniform (bench headline shape) ---
    base = "".join(rng.choice("ACGT") for _ in range(5000))
    g = POAGraph()
    g.add_alignment_with_weights("s0", base.encode(), None, [1] * 5000)
    for i in range(1, 4):
        s = _mutate(rng, base, 0.03).encode()
        _, aln, _ = NativeAligner(g).align(s, costs)
        g.add_alignment_with_weights(f"s{i}", s, aln, [1] * len(s))
    reads = [_mutate(rng, base, 0.03).encode() for _ in range(1024)]
    flat = g.flatten()
    scorer = BandedScorer(flat, costs)
    qshift, lengths = pack_queries(reads)
    scorer.scores(qshift, lengths)  # warm
    scorer.reset_stats()
    t0 = time.perf_counter()
    for _ in range(6):
        sc = scorer.scores(qshift, lengths)
    el_banded = (time.perf_counter() - t0) / 6
    raw = scorer.stats["cells_filled"] / 6 / el_banded

    # --- pangenome bounded ends-free scores (capped ladder) ---
    N = 50_000
    rng2 = random.Random(17)
    pbase = "".join(rng2.choice("ACGT") for _ in range(N))
    gp = POAGraph()
    gp.add_alignment_with_weights("s0", pbase.encode(), None, [1] * N)
    for v in range(0, N - 3, 500):
        gp.add_edge(v, v + 3, 0, 1)
    gp.post_process()
    preads = []
    for _ in range(64):
        a = rng2.randrange(0, N - 5000)
        preads.append(_mutate(rng2, pbase[a:a + 5000], 0.015).encode())
    cfgp = EndsFree(UNBOUNDED, included(0), UNBOUNDED, UNBOUNDED)
    sef = BandedScorer(gp.flatten(), costs, aln_type=cfgp)
    qp, lp = pack_queries(preads)
    sef.scores(qp, lp)  # warm (ladder converges its hint)
    t0 = time.perf_counter()
    for _ in range(4):
        sp = sef.scores(qp, lp)
    el_ef = (time.perf_counter() - t0) / 4

    return {
        "cap_disabled": bool(os.environ.get("POASTA_NO_RUN_CAP")),
        "banded_s_per_iter": round(el_banded, 4),
        "banded_raw_gcells": round(raw / 1e9, 2),
        "ef_s_per_iter": round(el_ef, 4),
        "banded_check": int(np.asarray(sc).sum()),
        "ef_check": int(np.asarray(sp).sum()),
    }


def main():
    if "--one-arm" in sys.argv:
        print("ARM " + json.dumps(one_arm()))
        return
    env_on = dict(os.environ)
    env_on.pop("POASTA_NO_RUN_CAP", None)
    env_off = dict(os.environ, POASTA_NO_RUN_CAP="1")
    arms = {}
    for name, env in (("cap_on", env_on), ("cap_off", env_off)):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one-arm"],
            env=env, capture_output=True, text=True, timeout=3600)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("ARM ")]
        if not line:
            print(out.stdout, out.stderr)
            raise SystemExit(f"{name} arm failed")
        arms[name] = json.loads(line[0][4:])
        print(name, arms[name])
    assert arms["cap_on"]["banded_check"] == arms["cap_off"]["banded_check"]
    assert arms["cap_on"]["ef_check"] == arms["cap_off"]["ef_check"]
    print(json.dumps({
        "banded_speedup": round(arms["cap_off"]["banded_s_per_iter"]
                                / arms["cap_on"]["banded_s_per_iter"], 3),
        "ef_speedup": round(arms["cap_off"]["ef_s_per_iter"]
                            / arms["cap_on"]["ef_s_per_iter"], 3),
    }))


if __name__ == "__main__":
    main()
