"""Pallas fill kernel vs the XLA scan path (accelerator only)."""

import random

import jax
import numpy as np
import pytest

from poasta_tpu.aligner import GapAffine, Global, PoastaAligner
from poasta_tpu.aligner.wavefront import DeviceGraph, dp_fill_scores, pack_queries
from poasta_tpu.graphs import POAGraph

COSTS = GapAffine(4, 2, 6)

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="pallas TPU kernel requires an accelerator backend",
)


def test_pallas_matches_xla_scores():
    rng = random.Random(3)
    base = "".join(rng.choice("ACGT") for _ in range(60))

    def mutate(s):
        out = []
        for ch in s:
            r = rng.random()
            if r < 0.06:
                continue
            out.append(rng.choice("ACGT") if r < 0.12 else ch)
        return "".join(out) or "A"

    g = POAGraph()
    py = PoastaAligner(COSTS, Global(), heuristic="mingap")
    g.add_alignment_with_weights("s0", base.encode(), None, [1] * 60)
    for i in range(1, 3):
        s = mutate(base).encode()
        r = py.align(g, s)
        g.add_alignment_with_weights(f"s{i}", s, r.alignment, [1] * len(s))

    dg = DeviceGraph.build(g.flatten())
    queries = [mutate(base).encode() for _ in range(64)]
    qshift, lengths = pack_queries(queries)
    ref = np.asarray(dp_fill_scores(dg, qshift, lengths, COSTS, engine="xla"))
    out = np.asarray(dp_fill_scores(dg, qshift, lengths, COSTS, engine="pallas"))
    assert (out == ref).all()
