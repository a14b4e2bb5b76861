"""Pangenome semi-global serving profile: device fill vs host backtrace
split, with and without the seeded corridor path (POASTA_SEED)."""
import json
import os
import sys
import time

sys.path.insert(0, ".")

from poasta_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from poasta_tpu.aligner import GapAffine
from poasta_tpu.aligner.costs import EndsFree, UNBOUNDED, included

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pangenome_common import load  # noqa: E402

costs = GapAffine(4, 2, 6)
gp, preads = load()
print("[fixture] ready", flush=True)
cfgp = EndsFree(UNBOUNDED, included(0), UNBOUNDED, UNBOUNDED)

from poasta_tpu.parallel import BatchMapper  # noqa: E402

mode = os.environ.get("POASTA_SEED", "")
pmap = BatchMapper(gp, costs, aln_type=cfgp)
t0 = time.perf_counter()
pmap.align_batch(preads)  # warm + learn ub
print(f"[warm1] {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
pmap.align_batch(preads)  # seeded-path compile
print(f"[warm2] {time.perf_counter()-t0:.1f}s", flush=True)
for it in range(int(os.environ.get("ITERS", "3"))):
    t0 = time.perf_counter()
    out = pmap.align_batch(preads)
    el = time.perf_counter() - t0
    st = dict(pmap.last_ends_free_stats)
    st["seed"] = getattr(pmap, "last_seed_stats", None)
    print(json.dumps({"iter": it, "mode": mode or "auto",
                      "reads_per_sec": round(64 / el, 2),
                      "el": round(el, 4), **{k: (round(v, 4) if isinstance(v, float) else v) for k, v in st.items()}}), flush=True)
scores = [s for s, _ in out]
print("score head:", scores[:8])
