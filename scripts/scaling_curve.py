"""dp weak-scaling curve on the virtual 8-device CPU mesh.

Multi-chip hardware is not reachable from this container, so this is the
stand-in evidence for BASELINE's >=80% N-host efficiency target: dp has
no intra-fill communication (each shard fills independently; multi-host
dp spans DCN with zero collectives), so the only thing that can erode
scaling is mesh/dispatch overhead — which is exactly what a virtual
mesh on one physical core measures.  Weak scaling: per-shard work fixed
(64 reads/shard), wall time ideally grows linearly with dp on ONE core;
efficiency = dp * wall(dp=1) / wall(dp).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     JAX_PLATFORMS=cpu python scripts/scaling_curve.py
"""

import random
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


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
    from poasta_tpu.aligner.costs import GapAffine
    from poasta_tpu.aligner.wavefront import pack_queries
    from poasta_tpu.graphs import POAGraph
    from poasta_tpu.parallel import BatchMapper, make_mesh

    assert len(jax.devices()) >= 8, (
        "run with XLA_FLAGS=--xla_force_host_platform_device_count=8"
    )
    costs = GapAffine(4, 2, 6)
    rng = random.Random(7)
    glen = 600
    base = "".join(rng.choice("ACGT") for _ in range(glen))
    graph = POAGraph()
    graph.add_alignment_with_weights("s0", base.encode(), None, [1] * glen)

    per_shard = 64
    results = {}
    for dp in (1, 2, 4, 8):
        reads = [
            _mutate(rng, base, 0.03).encode() for _ in range(per_shard * dp)
        ]
        mesh = make_mesh(devices=jax.devices()[:dp], dp=dp, sp=1) \
            if dp > 1 else None
        mapper = BatchMapper(graph, costs, mesh=mesh)
        mapper.score_batch(reads)  # compile + warm
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            s = mapper.score_batch(reads)
        el = (time.perf_counter() - t0) / iters
        np.asarray(s)
        results[dp] = el
        eff = results[1] * dp / el if 1 in results else 1.0
        print(f"dp={dp}: {per_shard * dp} reads/step, {el * 1e3:.0f} ms/step, "
              f"weak-scaling efficiency {eff * 100:.0f}%")


if __name__ == "__main__":
    main()
