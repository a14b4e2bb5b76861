"""A/B the banded chain-run ring-skip on the real chip (BACKLOG item).

The uniform bench graph is ~72% chain ranks (single pred = previous
rank, same window start); ``POASTA_CHAIN_SKIP=1`` makes the banded
kernel take those ranks' predecessor rows from a scratch carry instead
of the ring gather, and skip ring stores nobody reads (~58% of them).
Exactness is pinned CPU-side in tests/test_chain_skip.py (interpret
mode); this script measures whether the branchy fori body pays for the
skipped work on real Mosaic-compiled code.

    python scripts/chainskip_ab.py            # both arms + ratio
    python scripts/chainskip_ab.py --one-arm  # current env only (internal)
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
    from poasta_tpu.aligner.wavefront import pack_queries
    from poasta_tpu.graphs import POAGraph
    from poasta_tpu.native import NativeAligner
    from poasta_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    costs = GapAffine(4, 2, 6)
    rng = random.Random(7)

    # banded uniform: the bench.py headline shape
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
    scorer.scores(qshift, lengths)  # warm: compile + converge ub hint
    scorer.reset_stats()
    t0 = time.perf_counter()
    for _ in range(6):
        sc = scorer.scores(qshift, lengths)
    el = (time.perf_counter() - t0) / 6
    raw = scorer.stats["cells_filled"] / 6 / el

    return {
        "chain_skip": os.environ.get("POASTA_CHAIN_SKIP", "") not in ("", "0"),
        "banded_s_per_iter": round(el, 4),
        "banded_raw_gcells": round(raw / 1e9, 2),
        "banded_check": int(np.asarray(sc).sum()),
    }


def main():
    if "--one-arm" in sys.argv:
        print("ARM " + json.dumps(one_arm()))
        return
    env_off = dict(os.environ)
    env_off.pop("POASTA_CHAIN_SKIP", None)
    env_on = dict(os.environ, POASTA_CHAIN_SKIP="1")
    arms = {}
    for name, env in (("skip_off", env_off), ("skip_on", env_on)):
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
    assert arms["skip_on"]["banded_check"] == arms["skip_off"]["banded_check"]
    print(json.dumps({
        "chain_skip_speedup": round(arms["skip_off"]["banded_s_per_iter"]
                                    / arms["skip_on"]["banded_s_per_iter"], 3),
        "raw_gcells_off": arms["skip_off"]["banded_raw_gcells"],
        "raw_gcells_on": arms["skip_on"]["banded_raw_gcells"],
    }))


if __name__ == "__main__":
    main()
